"""Streaming document-corpus ingest: the training-data pipeline's front
door, composing the batch operators into a Structured Streaming flow.

Per micro-batch: compute the content digest (md5 of normalized text),
drop exact duplicates globally across batches, gate on a minimum quality
bar (token count), and append the survivors with their digest +
token stats.

Scale notes: exact-dedup state is the digest key set — unbounded by
design (a global corpus dedup has no event-time horizon). At 100 TB use
the RocksDB state store; or, for bounded state, the batch route:
periodic exact_dedup over the bucketed digest column. Fuzzy dedup
(MinHash) stays a batch job over the deduped corpus — candidate
generation needs corpus-wide banding, which is not a per-batch
operation.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup_fuzzy import content_digest
from ..functions.text import tokens

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def start_document_ingest(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_tokens: int = 3,
    available_now: bool = True,
) -> StreamingQuery:
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src_dir)
    deduped = (
        stream.withColumn("digest", content_digest("text"))
        .dropDuplicates(["digest"])  # global exact dedup (unbounded state)
        .withColumn("n_tokens", F.size(tokens("text")).cast("long"))
        .filter(F.col("n_tokens") >= min_tokens)
    )
    writer = (
        deduped.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("document_ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
