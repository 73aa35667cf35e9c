"""Deterministic sharded corpus export with an integrity manifest.

The last stage of a training-data pipeline writes the curated corpus as
N fixed shards a downstream dataloader can address individually. Two
properties matter at 100 TB:

* **Determinism** — shard membership must survive re-runs, task
  retries, and incremental recomputation, so assignment is a pure hash
  of the stable document id (never ``rand()``, never
  ``monotonically_increasing_id``, never zipWithIndex — all three
  change under retry or repartitioning).
* **Verifiability** — every shard ships a manifest row (row count,
  byte count, order-insensitive content checksum) so a reader can
  detect truncated / duplicated / bit-rotted shards without re-reading
  the corpus.

Assignment here uses the repo's portable md5 scheme so the DuckDB
oracle restates the identical math; a production variant on
``xxhash64`` halves the hash cost (swap ``shard_key``) — membership
changes but every property above is preserved.

The manifest checksum is md5 over the shard's per-doc digests sorted
lexicographically — order-insensitive (parquet task output order is
nondeterministic) yet collision-resistant. The per-shard
``collect_list`` is bounded by shard size; at corpus scale prefer the
constant-space ``bit_xor(xxhash64(digest))`` fold (one long per shard)
— same plan shape, not oracle-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_key(id_col: str, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards): mod over the first 8
    md5 hex chars of the id (uniform by construction; md5 keys can't
    skew, so shards stay balanced no matter how ids were allocated)."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(n_shards))


def shard_manifest(df: DataFrame, n_shards: int = 16,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """One manifest row per shard: docs, bytes, id-sum, and the
    order-insensitive md5-of-sorted-digests content checksum."""
    digests = df.select(
        shard_key(id_col, n_shards).alias("shard"),
        F.col(id_col).alias("id"),
        F.length(text_col).cast("long").alias("n_bytes"),
        F.md5(
            F.concat_ws("\x01", F.col(id_col).cast("string"), F.col(text_col))
        ).alias("digest"),
    )
    return (
        digests.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("id").alias("id_sum"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("digest")), "")
            ).alias("content_md5"),
        )
    )


def export_shards(df: DataFrame, path: str, n_shards: int = 16,
                  id_col: str = "doc_id", text_col: str = "text",
                  max_records_per_file: int = 1_000_000) -> DataFrame:
    """Write the corpus as ``path/shard=K/*.parquet`` plus
    ``path/_manifest`` and return the manifest DataFrame.

    Plan: one projection adds the shard column; ``repartition(shard)``
    aligns task boundaries with shard boundaries so each shard's files
    are written by tasks that own the whole shard (no tiny-file spray:
    files per shard = ceil(rows / max_records_per_file), not
    tasks x shards). ``maxRecordsPerFile`` bounds file size so a
    dataloader can stream shards without 10 GB parquet row groups.
    """
    with_shard = df.withColumn("shard", shard_key(id_col, n_shards))
    (
        with_shard.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
    # Manifest from the WRITTEN shards, not from re-evaluating ``df``:
    # if the upstream source changed (or any nondeterminism exists)
    # between the shard write and a second evaluation, a df-derived
    # manifest would seal a description of data that was never written.
    written = df.sparkSession.read.parquet(path).drop("shard")
    manifest = shard_manifest(written, n_shards, id_col, text_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(path + "/_manifest")
    return manifest


def verify_shards(spark, path: str, n_shards: int = 16,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Recompute the manifest from the written shards and diff it
    against the stored one. Returns the mismatching shard rows (empty =
    intact). The read recomputes only (id, text) per shard — column
    pruning keeps verification cheap relative to the write."""
    stored = spark.read.parquet(path + "/_manifest")
    actual = shard_manifest(
        spark.read.parquet(path).drop("shard"), n_shards, id_col, text_col
    )
    return (
        stored.alias("s")
        .join(actual.alias("a"), "shard", "full")
        .filter(
            (F.col("s.n_docs") != F.col("a.n_docs"))
            | (F.col("s.total_bytes") != F.col("a.total_bytes"))
            | (F.col("s.content_md5") != F.col("a.content_md5"))
            | F.col("s.n_docs").isNull()
            | F.col("a.n_docs").isNull()
        )
        .select("shard")
    )


def with_provenance(df: DataFrame) -> DataFrame:
    """Attach the hidden file-source ``_metadata`` provenance columns
    (file path, size, modification time, row-group offsets are pruned
    away unless selected) — the lineage record a curation pipeline
    stores so any training example can be traced back to the exact
    input file that produced it. Zero-cost when unused: ``_metadata``
    is a metadata-only struct populated by the scan, not a join."""
    return df.select(
        "*",
        F.col("_metadata.file_path").alias("src_file"),
        F.col("_metadata.file_size").alias("src_file_size"),
        F.col("_metadata.file_modification_time").alias("src_file_mtime"),
    )


def export_sorted(df: DataFrame, path: str, order_col: str,
                  n_files: int = 8) -> None:
    """Globally-sorted parquet export: ``repartitionByRange`` (sampled
    range boundaries) + ``sortWithinPartitions`` yields files whose
    [min, max] ranges are disjoint and ordered, so a reader can binary-
    search files from footer statistics alone — the layout for id-keyed
    point lookups over an exported corpus. One range shuffle, no global
    single-task sort."""
    (
        df.repartitionByRange(n_files, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )
