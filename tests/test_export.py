"""Sharded corpus export: deterministic assignment, file layout,
manifest integrity and corruption detection."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.operators.export import (
    export_shards,
    shard_key,
    verify_shards,
)


def _corpus(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body number "), F.col("id")).alias("text"),
    )


def test_export_layout_and_manifest_roundtrip(spark, tmp_path):
    path = str(tmp_path / "corpus")
    df = _corpus(spark)
    manifest = export_shards(df, path, n_shards=8, max_records_per_file=10)
    rows = manifest.collect()
    assert {r.shard for r in rows} == set(range(8))
    assert sum(r.n_docs for r in rows) == 200

    # hive layout: one directory per shard; maxRecordsPerFile bounds rows/file
    for r in rows:
        files = glob.glob(f"{path}/shard={r.shard}/*.parquet")
        assert files, f"shard {r.shard} has no files"
        assert len(files) >= r.n_docs / 10  # ceil(rows/10) files at least

    # read-back equals input exactly (no doc lost/duplicated across shards)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert back.select("doc_id").distinct().count() == 200

    # recomputed manifest matches the stored one
    assert verify_shards(spark, path, n_shards=8).count() == 0


def test_manifest_describes_written_files_not_reevaluated_input(spark, tmp_path):
    """ADVICE r5 (low): the manifest used to re-evaluate the input df
    after writing the shards — a nondeterministic upstream would seal a
    manifest describing data that was never written. It now folds over
    spark.read.parquet(written shards), so even a rand()-salted corpus
    verifies clean: the manifest matches the files, by construction."""
    path = str(tmp_path / "corpus")
    df = _corpus(spark, 100).withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" nonce="), F.rand().cast("string")),
    )
    export_shards(df, path, n_shards=4)
    assert verify_shards(spark, path, n_shards=4).count() == 0


def test_export_assignment_is_retry_stable(spark):
    """Shard membership is a pure function of doc_id — identical across
    independent evaluations and repartitionings."""
    df = _corpus(spark, 100)
    a = {r.doc_id: r.s for r in df.select(
        "doc_id", shard_key("doc_id", 8).alias("s")).collect()}
    b = {r.doc_id: r.s for r in df.repartition(13).select(
        "doc_id", shard_key("doc_id", 8).alias("s")).collect()}
    assert a == b
    assert set(a.values()) == set(range(8))  # uniform enough to hit all


def test_verify_shards_detects_tampering(spark, tmp_path):
    path = str(tmp_path / "corpus")
    export_shards(_corpus(spark), path, n_shards=4)

    # simulate bit-rot: rewrite one shard with a doc dropped
    victim = spark.read.parquet(f"{path}/shard=0")
    pruned = victim.orderBy("doc_id").limit(victim.count() - 1)
    pruned.write.mode("overwrite").parquet(str(tmp_path / "evil"))
    spark.read.parquet(str(tmp_path / "evil")).write.mode(
        "overwrite"
    ).parquet(f"{path}/shard=0")

    bad = [r.shard for r in verify_shards(spark, path, n_shards=4).collect()]
    assert bad == [0]


def test_with_provenance_traces_rows_to_files(spark, tmp_path):
    from investcloud_data_pipeline_spark.operators.export import with_provenance

    p = str(tmp_path / "src")
    _corpus(spark, 50).repartition(4).write.parquet(p)
    out = with_provenance(spark.read.parquet(p)).collect()
    assert len(out) == 50
    files = {r.src_file for r in out}
    assert 1 < len(files) <= 4
    assert all(r.src_file.endswith(".parquet") for r in out)
    assert all(r.src_file_size > 0 for r in out)
    # provenance is consistent: re-reading one named file yields exactly
    # the rows attributed to it
    one = next(iter(files))
    direct = {r.doc_id for r in spark.read.parquet(one.replace("file://", "")).collect()}
    attributed = {r.doc_id for r in out if r.src_file == one}
    assert direct == attributed


def test_export_sorted_files_have_disjoint_ordered_ranges(spark, tmp_path):
    import glob

    from investcloud_data_pipeline_spark.operators.export import export_sorted

    p = str(tmp_path / "sorted")
    export_sorted(_corpus(spark, 500).repartition(13), p, "doc_id", n_files=5)
    ranges = []
    for f in glob.glob(p + "/*.parquet"):
        ids = [r.doc_id for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids), "file not internally sorted"
        if ids:
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    assert len(ranges) > 1
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "file ranges overlap"
    # nothing lost
    assert spark.read.parquet(p).count() == 500
