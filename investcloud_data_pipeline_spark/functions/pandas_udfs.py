"""Vectorized Python function surface: scalar / grouped-aggregate pandas
UDFs and grouped-map ``applyInPandas``.

The reference's only UDF is a row-at-a-time dict lookup
(00_utils.py:55-57), replaced in this engine by a broadcast join
(operators/enrich.py). This module carries the surface a user actually
needs when Python IS required: Arrow-batched kernels (one
(de)serialization per batch, not per row — the 10-100× rule from the
PySpark guide), with semantics chosen to stay deterministic under
partition reordering so every entry is oracle-checkable:

- scalar: pure per-element math (order-free by construction);
- grouped agg: median — computed from the SORTED group, so the result
  is independent of row arrival order, unlike a float sum;
- grouped map: per-row offset against that exact median.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..sources.batch import load_table


# Return types are DataType objects, not DDL strings: string return
# types are parsed through the active SparkSession, which would make
# importing this module require a running session.
@pandas_udf(DoubleType())
def engagement_score(value: pd.Series) -> pd.Series:
    """Scalar pandas UDF: bounded engagement score in (0, 1) — a
    logistic squash, spelled exp-composed (not a libm sigmoid/tanh) and
    rounded, so the value is reproducible on any engine with exp()."""
    e = np.exp(value / 100.0)
    return np.round(e / (e + 1.0), 6)


@pandas_udf(DoubleType())
def median_agg(v: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-aggregate pandas UDF: exact median (order-insensitive —
    safe for value-hash oracles where a float sum would not be)."""
    return float(np.median(v))


def pandas_udf_scalar_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event engagement score via the scalar UDF (one Arrow batch per
    partition chunk; the expression pipelines inside the project node)."""
    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", engagement_score(F.col("value")).alias("score"))


PANDAS_UDF_SCALAR_SCORES_SQL = """
SELECT event_id,
       round(exp(value / 100.0) / (exp(value / 100.0) + 1.0), 6) AS score
FROM events
"""


def pandas_udf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: the whole group's column arrives as one
    Series per group (no partial aggregation — Spark disallows mixing
    with non-pandas aggregates in the same groupBy, so counts etc. live
    in a separate plain aggregation)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        median_agg(F.col("l_quantity")).alias("median_qty"),
    )


PANDAS_UDF_GROUPED_MEDIAN_SQL = """
SELECT l_returnflag, l_linestatus, median(l_quantity) AS median_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def grouped_map_demedian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-type median-centering — each
    group materializes as ONE pandas frame on an executor (the operator
    to reach for when the kernel needs the whole group, e.g. per-group
    normalization of training features). Scale: one shuffle on the group
    key; a group must fit in executor memory — for value-skewed keys
    pre-split with a salt and re-merge."""
    e = load_table(spark, sf_dir, "events")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        med = float(np.median(pdf["value"]))
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "dm_value": np.round(pdf["value"] - med, 6),
            }
        )

    return (
        e.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(kernel, schema="event_id long, event_type string, dm_value double")
    )


GROUPED_MAP_DEMEDIAN_SQL = """
SELECT event_id, event_type,
       round(value - median(value) OVER (PARTITION BY event_type), 6) AS dm_value
FROM events
"""


QUERIES = {
    "pandas_udf_scalar_scores": (pandas_udf_scalar_scores, PANDAS_UDF_SCALAR_SCORES_SQL),
    "pandas_udf_grouped_median": (pandas_udf_grouped_median, PANDAS_UDF_GROUPED_MEDIAN_SQL),
    "grouped_map_demedian": (grouped_map_demedian, GROUPED_MAP_DEMEDIAN_SQL),
}
