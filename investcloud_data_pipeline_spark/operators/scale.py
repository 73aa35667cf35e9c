"""Scale-posture operators: skew-resistant aggregation and bucketed
co-located joins.

These exist because at 100 TB the two failure modes of the naive plan are
(1) one hot key melting a single reducer, and (2) re-shuffling a huge
fact table for every join on the same key. Neither changes query
RESULTS — both are covered by oracle-equivalence to their naive forms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-resistant grouped sum: stage 1 aggregates on
    (keys..., salt) spreading a hot key over ``salt_buckets`` reducers;
    stage 2 combines the partials on the true keys (tiny input).

    The salt is derived from a uniform hash of the whole row's unique
    content proxy (here: spark_partition_id + a per-partition counter is
    unnecessary — a random-free deterministic spread comes from hashing
    the value column too, which distributes identical keys across buckets
    whenever values vary). Results are identical to a plain
    groupBy().sum() — only the shuffle profile changes.

    NOTE: Spark's own partial aggregation (map-side combine) already
    handles *moderate* skew; explicit salting is for the pathological
    case (one key ≫ one executor's memory/cpu) and for aggregates
    without map-side combine (e.g. collect_list).
    """
    salt = (F.abs(F.xxhash64(*[F.col(k) for k in keys], F.col(value_col)))
            % salt_buckets).alias("__salt")
    partial = (
        df.select(*keys, F.col(value_col), salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum(value_col).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(out_col))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table so
    subsequent equi-joins/aggregations on ``bucket_cols`` skip the
    shuffle entirely (SortMergeJoin reads co-located buckets directly).

    This is the local-metastore equivalent of pre-partitioned lake
    layout; at 100 TB bucketing the fact tables on their join key is the
    single biggest shuffle saving available to a recurring workload.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def hot_keys(df: DataFrame, keys: Sequence[str], top_n: int = 10) -> DataFrame:
    """Skew diagnostic: per-key row counts, heaviest first — the thing to
    check before choosing salting / AQE skew hints for a production key."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_n)
    )
