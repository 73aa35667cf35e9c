"""Data layout for scan pruning: Z-order (Morton) clustering.

Parquet readers skip row groups whose column min/max stats exclude the
predicate. A table sorted by ONE column prunes only on that column;
interleaving the bits of several columns' rank positions (the Z-order /
Morton curve) gives every interleaved column locality, so min/max
pruning works for predicates on ANY of them — the same layout dial as
Delta's `OPTIMIZE ZORDER BY` or Iceberg's sort orders.

Everything stays JVM-side: per-column equi-depth bucket ids come from
sampled quantile boundaries (``approxQuantile`` — driver-side metadata,
≤2^bits doubles) applied with ``Bucketizer`` (JVM binary search), then
bitwise interleave via shiftleft/or — no UDF, and NO global-order
window (an ntile/percent_rank formulation would collapse the table to
one partition; boundary sampling is how Spark's own RangePartitioner
and Delta's OPTIMIZE ZORDER scale this).

Scale: one sampling pass for boundaries + one narrow projection for
the key; the final repartitionByRange(z) + sortWithinPartitions writes
size-balanced, z-clustered files. For 100 TB run it per partition
(e.g. per event_date) so each layout job is bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton code: bit j of column i lands at position j*len(cols)+i.
    Inputs must already be integers in [0, 2^bits)."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        spread = F.lit(0).cast("long")
        for j in range(bits):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            spread = spread.bitwiseOR(F.shiftleft(bit, j * n + i))
        out = out.bitwiseOR(spread)
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    relative_error: float = 0.001,
) -> DataFrame:
    """Append a ``_zorder`` column: Morton code over equi-depth bucket
    ids of ``cols`` (quantile bucketing makes the curve
    distribution-proof — skewed value domains still spread evenly
    across up to 2^bits cells per dimension)."""
    from pyspark.ml.feature import Bucketizer

    dbl_cols = {c: f"_zdbl_{c}" for c in cols}
    work = df
    for c, dc in dbl_cols.items():
        work = work.withColumn(dc, F.col(c).cast("double"))

    n_buckets = 2**bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    rank_cols = []
    for c, dc in dbl_cols.items():
        qs = work.stat.approxQuantile(dc, probs, relative_error)
        splits = [float("-inf")] + sorted(set(qs)) + [float("inf")]
        rc = f"_zrank_{c}"
        work = Bucketizer(
            splits=splits, inputCol=dc, outputCol=rc, handleInvalid="keep"
        ).transform(work)
        rank_cols.append(rc)
    out = work.withColumn(
        "_zorder",
        interleave_bits([F.col(rc).cast("long") for rc in rank_cols], bits),
    )
    return out.drop(*rank_cols, *dbl_cols.values())


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = 8,
) -> None:
    """Rewrite ``df`` clustered on the Z-curve of ``cols``: range-
    partitioned by the Morton key (size-balanced files) and sorted by it
    within each file, so every listed column's min/max row-group stats
    are tight."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )
