"""Batch sources (S3 csv contract + parquet) and sinks.

Reference S3: the upstream contract is CSV-with-header from the generator
(data_generator.py:52), landed as parquet by capture (01:14). Both formats
are supported here with the schema *enforced* (the reference declares
RAW_SCHEMA but never passes it to a reader — SURVEY §1.3).

Corrupt handling (reference T6, cloudFiles.badRecordsPath 01:19): CSV/JSON
reads use PERMISSIVE mode with a ``_corrupt_record`` column so unparseable
rows route to the quarantine sink instead of failing the job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CORRUPT_COL, RAW_SCHEMA_WITH_CORRUPT

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Scan-parallelism widening (round-12, guide §2.5 "input skew: one huge
# unsplittable file"): parquet splits at ROW-GROUP granularity, and the
# committed fixtures are single-row-group files — so every scan-side
# stage (filter, project, partial aggregation, per-row expression work)
# runs on ONE task regardless of core count. Widening = repartition
# right after the read when the file's row groups cannot feed the
# session's cores. It is OPT-IN per query (``load_table(...,
# scan_wide=True)``), not blanket: an interleaved same-session A/B over
# 20 scan-bound queries at sf0.1 measured the blanket gate as a wash
# overall and sharply bimodal per query — heavy per-row-compute
# pipelines win (lineitem_ols_price 2.12→1.28s, sql_udf_disc_revenue
# 2.46→1.57s, try_functions_safety 2.14→1.38s) while selective-filter /
# cheap-aggregate pipelines lose the shuffle cost (q17 0.87→2.25s,
# q21 1.52→2.48s, statistical_aggregates 0.65→1.17s). Only the query
# author knows which side of that line the post-scan work falls on, so
# the widening is requested at the consumer. Filter/projection pushdown
# is unaffected (Catalyst pushes both through Repartition), round-robin
# repartition is retry-deterministic (sortBeforeRepartition), and the
# width derives from the ROW COUNT — at production scale files carry
# many row groups, the gate never fires, and no shuffle is added.
# SPARK_GRAFT_SCAN_REPARTITION=off disables even the opt-in sites.
_SCAN_MIN_ROWS = 50_000
_SCAN_ROWS_PER_TASK = 20_000
_SCAN_META: dict[str, tuple[int, int]] = {}


def _parquet_layout(path: str) -> tuple[int, int]:
    """(num_rows, num_row_groups) from the parquet footer — one cheap
    driver-side metadata read per path per process."""
    got = _SCAN_META.get(path)
    if got is None:
        try:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(path).metadata
            got = (md.num_rows, md.num_row_groups)
        except Exception:
            got = (0, 1 << 30)  # unknown layout: leave the scan alone
        _SCAN_META[path] = got
    return got


def _with_scan_parallelism(
    spark: SparkSession, df: DataFrame, path: str
) -> DataFrame:
    if os.environ.get("SPARK_GRAFT_SCAN_REPARTITION", "auto") == "off":
        return df
    rows, row_groups = _parquet_layout(path)
    cpus = spark.sparkContext.defaultParallelism
    if rows >= _SCAN_MIN_ROWS and row_groups < max(2, cpus // 2):
        width = min(cpus, max(2, rows // _SCAN_ROWS_PER_TASK))
        if width > row_groups:
            return df.repartition(width)
    return df


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    scan_wide: bool = False,
) -> DataFrame:
    """Read one driver testdata table (columnar parquet scan — filters and
    projections placed on top are pushed into the scan by Catalyst).

    ``scan_wide=True`` applies the opt-in scan-parallelism widening for
    consumers whose post-scan per-row work dominates (see the module
    comment above ``_with_scan_parallelism`` for the measured A/B).

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    reader rejects; read it as long (legacy conf) and truncate to
    microseconds — the same ns→µs truncation DuckDB applies, so oracle
    comparisons see identical instants.
    """
    # Defensive: queries may run under a caller-provided session (the
    # driver's); event-time semantics and DuckDB-oracle comparisons
    # assume UTC, so pin it here rather than trusting the caller's conf.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # Parquet logical-type drift: some generator runs write
            # isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ.
            # The whole registry (and every time function: unix_micros,
            # window(), watermarks) assumes TIMESTAMP; with the session
            # pinned to UTC above, this cast is instant-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return _with_scan_parallelism(spark, df, path) if scan_wide else df
    df = spark.read.parquet(path)
    return _with_scan_parallelism(spark, df, path) if scan_wide else df


def read_raw_csv(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read raw activity CSV with the enforced schema.

    Returns ``(records, corrupt)``: parseable rows (corrupt column dropped)
    and rows that failed schema parsing (raw line preserved), mirroring the
    badRecordsPath split.
    """
    df = (
        spark.read.schema(RAW_SCHEMA_WITH_CORRUPT)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    ).cache()
    records = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return records, corrupt


def read_raw_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read raw activity parquet (the pipeline's production ingest format)."""
    return spark.read.parquet(path)
