"""Silver layer: streaming global dedup + geo enrichment (S2, D1/T1, J1, K3).

Reference: 02_silver_layer_processing.py. The table-as-stream scan
(02:11-15, Delta ``ignoreChanges``) becomes a parquet file-source stream
over the bronze sink directory — appends-only, so the changefeed
semantics are identical.

Dedup: the reference's ``withWatermark(...).dropDuplicates([key])``
(02:19-23) relies on Databricks to bound state. OSS Spark's contract for
watermark-bounded key state is ``dropDuplicatesWithinWatermark``:
duplicates within the 2-hour horizon are dropped (02:21 /
docs/architecture_design.md:101), and records older than the advanced
watermark — duplicate or new — are filtered as late data before the
dedup operator (empirically identical for both dedup APIs). State
store backend is configurable; at 100 TB-scale key cardinality switch to
RocksDB via spark.sql.streaming.stateStore.providerClass (config, not
code).

Enrichment: stream-static broadcast left join (the reference's own stated
production design, 00_utils.py:39-40) instead of the per-row Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..config import BRONZE_SCHEMA, WATERMARK_DELAY, PipelinePaths
from ..operators.enrich import geo_enrich

BRONZE_SINK_SCHEMA = T.StructType(
    list(BRONZE_SCHEMA.fields) + [T.StructField("event_date", T.DateType(), True)]
)

SILVER_OBSERVATION = "silver_in"


def start_silver(
    spark: SparkSession,
    paths: PipelinePaths,
    ip_regions: DataFrame,
    available_now: bool = False,
    trigger_seconds: int = 60,
    watermark_delay: str = WATERMARK_DELAY,
) -> StreamingQuery:
    bronze_stream = (
        spark.readStream.format("parquet")
        .schema(BRONZE_SINK_SCHEMA)
        .load(paths.bronze)
    )
    # Free per-trigger telemetry on the pre-dedup stream: input rows and
    # the event-time range, riding the same job (no extra scan). Paired
    # with the state store's numRowsDroppedByWatermark counter, this
    # makes the watermark's silent late-row drops observable — see
    # late_drop_stats() and SURVEY §2.5 (the reference's dedup drops
    # late rows with no signal at all).
    observed = bronze_stream.observe(
        SILVER_OBSERVATION,
        F.count(F.lit(1)).alias("rows_in"),
        F.min("timestamp").alias("min_event_time"),
        F.max("timestamp").alias("max_event_time"),
    )
    deduped = observed.withWatermark(
        "timestamp", watermark_delay
    ).dropDuplicatesWithinWatermark(["log_id"])
    enriched = geo_enrich(deduped, ip_regions)
    writer = (
        enriched.writeStream.format("parquet")
        .outputMode("append")
        .option("path", paths.silver)
        .option("checkpointLocation", paths.checkpoint("silver"))
        .partitionBy("event_date")
        .queryName("silver_dedup_enrich")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def late_drop_stats(progresses) -> dict:
    """Aggregate the silver stage's late-data observability counters from
    ``StreamingQuery.recentProgress`` (or any iterable of progress
    dicts), in the same surfaced-counter style as the bronze DQ
    metrics.

    ``rows_in`` comes from the ``silver_in`` observation;
    ``rows_dropped_late`` is the state store's own
    ``numRowsDroppedByWatermark`` (rows older than the advanced
    watermark that the dedup operator discarded BEFORE consideration —
    the drop the reference's pipeline performs silently, SURVEY §2.5);
    ``rows_deduped`` is what actually entered/updated dedup state.
    A monitoring hook alerts on ``rows_dropped_late`` exactly like it
    alerts on quarantine volume.
    """
    import json

    out = {"rows_in": 0, "rows_dropped_late": 0, "rows_deduped": 0}
    for p in progresses:
        if not isinstance(p, dict):  # StreamingQueryProgress object
            p = json.loads(p.json)
        obs = (p.get("observedMetrics") or {}).get(SILVER_OBSERVATION)
        if obs is not None:
            if hasattr(obs, "asDict"):  # Row in the progress dict
                obs = obs.asDict()
            out["rows_in"] += obs.get("rows_in") or 0
        for op in p.get("stateOperators") or []:
            if op.get("operatorName") == "dedupeWithinWatermark":
                out["rows_dropped_late"] += (
                    op.get("numRowsDroppedByWatermark") or 0
                )
                out["rows_deduped"] += op.get("numRowsUpdated") or 0
    return out
