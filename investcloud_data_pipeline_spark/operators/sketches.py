"""Mergeable cardinality sketches (Datasketches HLL).

`approx_count_distinct` (used by `profile_orders`) answers one query and
throws the state away. At 100 TB the production pattern is different:
each shard/partition/day materializes a tiny BINARY sketch column once,
and any later question — distinct users per type, per month, across any
UNION of shards — is answered by merging sketches, never rescanning the
facts. Spark 4 ships the Apache DataSketches HLL family
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) that makes
the sketch a first-class column.

The algebraic law that makes this safe — estimate(union of per-shard
sketches) == estimate(one global sketch) for fixed lgK — is pinned by
tests, as is a relative-error tolerance against the exact distinct.

Scale shape: the per-shard aggregate is map-side combinable (sketches
merge associatively), the merged layer shuffles ONE sketch (≤ ~2^lgK
bytes) per (group, shard) instead of one row per distinct value, and
the final union is a tiny grouped fold. The fact table is read once,
ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # 4 KB sketches, ~1.6% relative standard error


def shard_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    shard_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per (group, shard) — the
    materialization layer a 100 TB pipeline writes next to each shard
    so distinct-count questions never rescan the shard."""
    return df.groupBy(*group_cols, shard_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll"),
        F.count("*").alias("n_rows"),
    )


def merged_estimate(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold per-shard sketches into a per-group distinct estimate.
    Input is the ``shard_sketches`` output (or any union of such
    outputs — merge is associative and order-free)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("distinct_est"),
        F.sum("n_rows").alias("n_rows"),
        F.count("*").alias("n_shards"),
    )


def distinct_via_sketch_merge(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    shard_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """End-to-end: shard-level sketches → union-merge → per-group
    estimate. Equivalent (same lgK ⇒ bit-identical estimate, tested) to
    sketching the whole table at once, but structured the way the
    production path is: sketch once per shard, merge forever."""
    return merged_estimate(
        shard_sketches(df, value_col, group_cols, shard_col, lgk=lgk),
        group_cols,
    )


def mg_merge(
    counters: dict[int, int],
    pairs,
    k: int,
) -> dict[int, int]:
    """Fold (key, count) pairs into a Misra-Gries summary of at most
    ``k`` counters, batch-amortized: inserting a key when the summary
    is full decrements ALL counters by the overflow (dropping zeros)
    before the remainder is installed — the standard MG step, applied
    count-at-a-time instead of one-at-a-time.

    Guarantee (what both the batch heavy-hitter pass and the streaming
    sketch rely on): after folding n total occurrences, every counter
    undercounts its key by at most n/(k+1), so any key with true
    frequency > n/(k+1) is present. Shared by
    ``plans/analytics_ext4.event_heavy_hitters_mg`` (per-partition
    kernel) and ``streaming/stateful.streaming_heavy_hitters``
    (per-shard state)."""
    for key, cnt in pairs:
        key, cnt = int(key), int(cnt)
        if key in counters:
            counters[key] += cnt
        elif len(counters) < k:
            counters[key] = cnt
        else:
            dec = cnt
            while dec > 0 and len(counters) >= k:
                m = min(counters.values())
                step = min(dec, m)
                counters = {
                    c: v - step
                    for c, v in counters.items()
                    if v - step > 0
                }
                dec -= step
            if dec > 0:
                counters[key] = dec
    return counters
