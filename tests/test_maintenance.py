"""Compaction: many small streaming-shaped files collapse to a few
size-targeted ones, data is byte-identical, and the swap is atomic
(directory never disappears)."""

from __future__ import annotations

from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.operators.maintenance import (
    compact_parquet_dir,
    dir_stats,
)


def _fragmented_table(spark, path: str, waves: int = 12) -> None:
    for i in range(waves):
        (
            spark.range(i * 100, (i + 1) * 100)
            .select(
                F.col("id"),
                (F.col("id") % 7).alias("bucket"),
                F.sha1(F.col("id").cast("string")).alias("payload"),
            )
            .repartition(4)
            .write.mode("append")
            .parquet(path)
        )


def test_compaction_reduces_files_and_preserves_data(spark, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented_table(spark, path)
    n_before, bytes_before = dir_stats(spark, path)
    assert n_before >= 40  # 12 waves × 4 files
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    n_after = compact_parquet_dir(spark, path, target_file_mb=128)
    assert n_after < n_before and n_after >= 1
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    # no leftover temp/old dirs
    assert not (tmp_path / "frag__compacting").exists()
    assert not (tmp_path / "frag__old").exists()


def test_sorted_compaction_clusters_rows(spark, tmp_path):
    path = str(tmp_path / "frag2")
    _fragmented_table(spark, path, waves=6)
    compact_parquet_dir(spark, path, target_file_mb=1, zorder_cols=["bucket"])
    after = spark.read.parquet(path)
    assert sorted(map(tuple, after.select("id").collect())) == [
        (i,) for i in range(600)
    ]
    # within each output file rows are clustered by the sort column →
    # parquet min/max stats stay selective after compaction
    df = after.select("bucket", F.input_file_name().alias("f"))
    per_file = df.groupBy("f").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    ranges = [(r.lo, r.hi) for r in per_file.collect()]
    # range-partitioned: file key ranges can touch at borders but must
    # not fully contain one another's span
    spans = sorted(ranges)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert lo2 >= lo1
