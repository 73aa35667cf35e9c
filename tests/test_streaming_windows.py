"""Streaming time-window coverage (extension beyond the reference, which
has no tumbling/sliding windows — SURVEY §2.11): watermarked tumbling
window aggregation driven to completion with availableNow, checked
against the batch computation of the same input."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_tumbling_window_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    rows = [
        (i, pd.Timestamp("2024-02-01") + pd.Timedelta(minutes=7 * i),
         "click" if i % 3 else "view", float(i))
        for i in range(100)
    ]
    pd.DataFrame(rows, columns=["event_id", "ts", "event_type", "value"]).astype(
        {"ts": "datetime64[us]"}
    ).to_parquet(f"{src}/p1.parquet", index=False)

    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n",
            "total",
        )
    )
    q = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.hour, r.event_type): (r.n, r.total)
        for r in spark.read.parquet(out).collect()
    }
    batch = (
        spark.read.schema(SCHEMA)
        .parquet(src)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("window.start").alias("hour"), "event_type", "n", "total")
    )
    want_all = {
        (r.hour, r.event_type): (r.n, r.total) for r in batch.collect()
    }
    # Append mode only emits windows CLOSED by the final watermark
    # (max ts − 30 min); the tail windows stay open and unemitted.
    max_ts = max(r[1] for r in rows)
    closed = {
        k: v for k, v in want_all.items()
        if k[0] + pd.Timedelta(hours=1) <= max_ts - pd.Timedelta(minutes=30)
    }
    assert got == closed
    assert len(got) > 0
