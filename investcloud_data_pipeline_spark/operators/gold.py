"""Gold-layer aggregation: per-user totals + argmax region.

Reference plan (03_gold_layer_aggregation.py:21-31):
  A1  groupBy(user_id, geo_region).sum(watch_time)        -> watch_time_by_region
  W1  rank() over (partition user_id order by sum desc)
  F3  rank == 1
  A2  groupBy(user_id).agg(sum(watch_time_by_region), first(geo_region))

Two deliberate fixes (SURVEY §4.3 / §7.4):
* ``first()`` on rank ties is nondeterministic → ``row_number`` with a full
  tie-break ordering (value desc, then region asc).
* The reference's "total_watch_time" actually sums only rank-1 (tied)
  regions. We expose both semantics explicitly:
  - ``user_top_region``: the reference's plan shape with deterministic
    ties — top region + that region's watch time.
  - ``user_argmax_totals`` (flagship): top region + the user's TRUE total
    across all regions, computed with a second window over the same
    user-partitioning (Catalyst reuses one exchange + sort for both window
    functions — one shuffle on (user, region) for A1, one on user for the
    windows; no third shuffle).

Shuffle profile at scale: exchange hash(user, region) → partial+final
HashAggregate → exchange hash(user) → single sort serving both window
functions. Both keys are high-cardinality user-derived keys, so skew is
bounded by the hottest user; AQE skew handling splits oversized partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def region_totals(
    df: DataFrame,
    user_col: str = "user_id",
    region_col: str = "geo_region",
    value_col: str = "watch_time",
) -> DataFrame:
    """A1: two-key grouped sum."""
    return df.groupBy(user_col, region_col).agg(
        F.sum(value_col).alias("watch_time_by_region")
    )


def user_top_region(
    df: DataFrame,
    user_col: str = "user_id",
    region_col: str = "geo_region",
    value_col: str = "watch_time",
) -> DataFrame:
    """Reference plan shape (A1→W1→F3→A2) with deterministic tie-break."""
    totals = region_totals(df, user_col, region_col, value_col)
    w = Window.partitionBy(user_col).orderBy(
        F.col("watch_time_by_region").desc(), F.col(region_col).asc()
    )
    return (
        totals.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(user_col),
            F.col("watch_time_by_region").alias("top_region_watch_time"),
            F.col(region_col).alias("geo_region"),
        )
    )


def user_argmax_totals(
    df: DataFrame,
    user_col: str = "user_id",
    region_col: str = "geo_region",
    value_col: str = "watch_time",
) -> DataFrame:
    """Flagship Gold: one row per user — true total across regions + argmax
    region. Both windows share one partitioning/sort on ``user_col``."""
    totals = region_totals(df, user_col, region_col, value_col)
    w_rank = Window.partitionBy(user_col).orderBy(
        F.col("watch_time_by_region").desc(), F.col(region_col).asc()
    )
    w_all = Window.partitionBy(user_col)
    return (
        totals.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("total_watch_time", F.sum("watch_time_by_region").over(w_all))
        .filter(F.col("rn") == 1)
        .select(
            F.col(user_col),
            F.col("total_watch_time"),
            F.col(region_col).alias("geo_region"),
        )
    )
