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
    # pmod for the same reason as salted_join below: under ANSI,
    # abs(Long.MIN_VALUE) THROWS; with ANSI off it stays negative and
    # quietly creates a junk salt bucket
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.col(value_col)),
        F.lit(salt_buckets),
    ).alias("__salt")
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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the fact side gets a deterministic salt
    in [0, salt_buckets) and the dim side is EXPLODED across all salt
    values, so one hot key's rows spread over ``salt_buckets`` reducers
    instead of melting one.

    This is the manual form of what AQE's skew-join split does at
    runtime — needed when AQE can't act: streaming joins (no runtime
    re-plan), full-outer shapes AQE won't split, or a key so hot a
    single post-split partition still exceeds one task. The cost is
    deliberate: the dim side is replicated ``salt_buckets``× (only ever
    use it with a dim ≪ fact), and results are row-identical to the
    plain join (tested) — only the shuffle profile changes.

    The salt must be deterministic (task retries must re-salt a row
    identically) but must SPREAD identical keys: hashing the whole fact
    row does both — duplicate rows co-salt, which is harmless, while
    distinct rows of a hot key fan out uniformly.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (fact-preserving) joins")
    # pmod, not abs+%: abs(Long.MIN_VALUE) stays negative in Spark, so a
    # row hashing to exactly Long.MIN_VALUE would get salt -8 and match
    # no exploded dim salt (silently dropped from an inner join).
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)
    ).alias("__salt")
    f = fact.select("*", salt)
    d = dim.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>")
        ).alias("__salt"),
    )
    joined = f.join(d, [key, "__salt"], how)
    return joined.drop("__salt")
