"""Exact deduplication operators.

Reference D1: ``withWatermark("timestamp","2 hours").dropDuplicates(["log_id"])``
(02_silver_layer_processing.py:19-23) — global keyed dedup with a bounded
state horizon. The streaming form lives in streaming/silver.py (identical
API in OSS Spark). This module holds the batch forms used by the oracle
harness and by ``foreachBatch`` recomputes.

Scale notes:
* ``dedup_keep_first`` is a window argmin — one shuffle on the key, sort
  within partitions, no driver-side state. At 100 TB the key space is the
  only sizing concern; AQE skew-join/partition-coalescing handles moderate
  skew, and the key shuffle can be avoided entirely when upstream data is
  already bucketed by the key.
* ``dropDuplicates`` (dedup_any) lets Catalyst plan a partial+final
  aggregate (map-side combine) — cheaper than a window when *which* row
  survives doesn't matter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_any(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keep an arbitrary row per key (Spark's native dropDuplicates).

    Nondeterministic across runs — use only where the surviving row's
    non-key columns don't matter, or the rows are exact duplicates.
    """
    return df.dropDuplicates(list(keys))


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    ascending: bool = True,
) -> DataFrame:
    """Deterministic keyed dedup: keep the first row per key under a total
    order (reference D1 with the rebuild's determinism fix, SURVEY §7.4).

    ``order_by`` must make the order total within each key group (include a
    unique column last) or the result is still nondeterministic on ties.
    """
    ordering = [
        F.col(c).asc() if ascending else F.col(c).desc() for c in order_by
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
