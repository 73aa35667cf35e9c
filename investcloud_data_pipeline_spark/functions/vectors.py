"""Vector math over ``array<float>`` embedding columns — pure Catalyst
higher-order functions (zip_with / aggregate / transform), no UDFs.

Everything computes in double with strict left-to-right accumulation, so
results are deterministic and bit-identical to a sequential-loop oracle
(verified exact against DuckDB's list_cosine_similarity).

Scale: these run inside whole-stage codegen per row; a 64-dim cosine is
~130 fused multiply-adds with zero serialization overhead — the fastest
Spark-native path short of dropping to a vectorized Arrow kernel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> → array<double> so accumulation is full-precision
    (and engine-portable: float32 math differs across SIMD strategies)."""
    return F.transform(F.col(col) if isinstance(col, str) else col,
                       lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                    lambda acc, x: acc + x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two double arrays (pre-cast with to_double_array)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def collect_vectors_guarded(
    df,
    id_col: str,
    vec_col: str,
    max_bytes: int = 1 << 30,
    what: str = "vector set",
):
    """Driver-side collect of (id, vector) rows behind an explicit size
    precondition.

    The blocked-matmul kernels (near-dup, vectorized top-k) broadcast one
    side of the comparison as a dense numpy matrix; that side must be
    driver-memory-sized. Collecting without checking would OOM the driver
    on a full-corpus input (the 1000-executor/100 TB posture) before any
    job runs — so count first (a cheap columnar metadata pass) and raise
    a clear error instead. At larger scale, loop the kernel over
    right-side blocks or use the LSH-bucketed operators.
    """
    n = df.count()
    if n == 0:
        return []
    first_vec = df.select(vec_col).first()[0]
    dim = len(first_vec) if first_vec is not None else 0
    est = n * (dim * 8 + 32)
    if est > max_bytes:
        raise ValueError(
            f"refusing to collect {what} to the driver: ~{n} rows × "
            f"{dim} dims ≈ {est / 1e9:.1f} GB exceeds the "
            f"{max_bytes / 1e9:.1f} GB broadcast precondition. Use the "
            "LSH/IVF-bucketed operators, or block the kernel over the "
            "right side."
        )
    return df.select(id_col, vec_col).collect()
