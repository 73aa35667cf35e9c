"""Approximate quantile binning — the extreme-scale alternative to the
exact ``ntile()`` global-order window.

``ntile(n) OVER (ORDER BY score)`` is an exact global rank: Spark plans
it as ``Exchange SinglePartition`` + one ``WindowExec`` sort, i.e. every
row funnels through ONE task. That is acceptable for a narrow scored
relation at benchmark scale (the documented posture of the exact
curriculum / RFM / decile-lift queries) and fatal at 10^11 rows.

``approx_quantile_bins`` replaces the global sort with the mergeable
sketch Spark already ships: ``percentile_approx`` computes the n-1 bin
edges as map-side partial sketches plus one tiny final merge (no global
sort, no single-partition exchange anywhere), the 1-row edge array is
broadcast, and each row's bin is a pure JVM ``filter``/``size``
expression over that array. Bin populations are equal only up to sketch
accuracy — the right trade for curriculum ordering and decile scoring,
whose semantics tolerate edge wobble but not a single-task sort.

Reference parity note: the reference has no binning operator at all
(its gold layer is plain grouped aggregation, `03_gold_layer:31`); this
is part of the training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EDGES = "_approx_bin_edges"


def approx_quantile_bins(
    df: DataFrame,
    score_col: str,
    n_bins: int,
    *,
    descending: bool = False,
    accuracy: int = 10000,
    bin_col: str = "qbin",
) -> DataFrame:
    """Assign every row to one of ``n_bins`` approximate quantile bins
    of ``score_col``.

    ``descending=True`` gives bin 1 = highest scores (the curriculum
    convention, matching ``ntile`` over ``ORDER BY score DESC``);
    ``descending=False`` gives bin 1 = lowest (plain ``ntile`` over
    ``ORDER BY score ASC``). Boundary ties go to the later bin in both
    orientations, so the assignment is deterministic.

    Plan shape (pinned by tests/test_scale_posture.py): one
    ObjectHashAggregate pair for the sketch, one broadcast of the 1-row
    edge relation — NO ``Exchange SinglePartition`` and no ``ntile``.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    # The operator consumes df TWICE (the edge sketch, then the
    # assignment scan). An eager localCheckpoint materializes the
    # upstream lineage — often an expensive scoring pipeline — exactly
    # ONCE, and both consumers read the checkpointed blocks. Unlike
    # `persist()` (whose CacheManager entry lives until an explicit
    # unpersist, so repeated invocations from registry sweeps or bench
    # loops leak cached relations for the session lifetime), local
    # checkpoint blocks are released by the ContextCleaner as soon as
    # the plan becomes unreachable. Callers should pass the NARROW
    # (id, score) projection, which is what keeps the materialization
    # cheap at any scale (~16 bytes/row). Without any materialization
    # the approx path measured SLOWER than the exact-ntile window at
    # 10× volume (6.2× vs 5.3× wall ratio), because ntile's single
    # sort reads the scoring lineage once while the sketch+assign pair
    # read it twice.
    #
    # Fault-tolerance tradeoff (applies to every eager localCheckpoint
    # in this repo — analytics_ext7, dedup_fuzzy, streaming/documents):
    # localCheckpoint blocks are NON-replicated and NON-recomputable
    # (lineage is truncated), so on a real cluster the loss of an
    # executor — including a dynamic-allocation decommission — fails
    # the query instead of recomputing the lost partitions. Two
    # consequences for the 100 TB posture: (1) disable executor
    # decommissioning for jobs on this path, or swap to reliable
    # `checkpoint()` + an explicit unpersist-on-completion when
    # running under dynamic allocation; (2) `eager=True` runs a job at
    # PLAN-BUILD time — constructing the DataFrame triggers execution,
    # which is deliberate here (both consumers need the blocks) but
    # surprising if you expected lazy composition.
    df = df.localCheckpoint(eager=True)
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = df.agg(
        F.percentile_approx(
            df[score_col].cast("double"), qs, accuracy
        ).alias(_EDGES)
    )
    joined = df.crossJoin(F.broadcast(edges))
    # Column-API comparison (not an interpolated SQL string) so score
    # columns needing backticks — e.g. the reference's own
    # 'watch_time(min)' — resolve correctly.
    s = joined[score_col].cast("double")
    in_earlier_bin = (
        (lambda e: e >= s) if descending else (lambda e: e < s)
    )
    bin_expr: Column = (
        F.size(F.filter(F.col(_EDGES), in_earlier_bin)) + F.lit(1)
    )
    return (
        joined.withColumn(bin_col, bin_expr.cast("long"))
        .drop(_EDGES)
    )
