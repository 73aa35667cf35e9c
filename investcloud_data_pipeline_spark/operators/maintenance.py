"""Table maintenance: small-file compaction for streaming parquet sinks.

Streaming append sinks (one file per partition per micro-batch) fragment
into thousands of small files — at 100 TB that turns every downstream
scan into a metadata storm and defeats parquet row-group pruning. This
operator rewrites a directory into size-targeted files and atomically
swaps it in (write-to-temp + rename), so readers never observe a
half-compacted table. The reference never addresses this (its sinks are
Delta, where OPTIMIZE would do it); for plain parquet layers it is the
missing operational piece.

Scale notes: the rewrite is one distributed job — a round-robin
``repartition(n)`` sized from the actual on-disk bytes (coalesce would
skip the shuffle but inherits upstream skew; for a sorted layout pass
``zorder_cols`` to get ``repartitionByRange`` + in-file sort, which
keeps min/max pruning effective after compaction).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    fs, hpath = _fs(spark, path)
    n, total = 0, 0
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if status.isFile() and not name.startswith(("_", ".")):
            n += 1
            total += status.getLen()
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    zorder_cols: list[str] | None = None,
) -> int:
    """Rewrite ``path`` into ≈``target_file_mb`` files; returns the new
    file count. Atomic from a reader's perspective: the rewrite lands in
    a temp sibling, then a directory rename swaps it in."""
    n_files, total_bytes = dir_stats(spark, path)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if zorder_cols:
        df = df.repartitionByRange(n_out, *zorder_cols).sortWithinPartitions(
            *zorder_cols
        )
    else:
        df = df.repartition(n_out)
    tmp = path.rstrip("/") + "__compacting"
    df.write.mode("overwrite").parquet(tmp)

    fs, hpath = _fs(spark, path)
    _, htmp = _fs(spark, tmp)
    old = path.rstrip("/") + "__old"
    _, hold = _fs(spark, old)
    if not fs.rename(hpath, hold):
        raise IOError(f"compaction swap failed renaming {path} -> {old}")
    if not fs.rename(htmp, hpath):
        fs.rename(hold, hpath)  # roll back
        raise IOError(f"compaction swap failed renaming {tmp} -> {path}")
    fs.delete(hold, True)
    return dir_stats(spark, path)[0]
