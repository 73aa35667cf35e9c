"""State timeout eviction: sessions close and emit only after the key
goes idle past the processing-time timeout."""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import types as T

from investcloud_data_pipeline_spark.streaming.stateful import (
    expiring_user_sessions,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_sessions_close_on_idle_timeout(spark, tmp_path):
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    os.makedirs(src)
    # Make timeout firing deterministic: without no-data maintenance
    # batches, processing-time timeouts fire only in data-triggered
    # batches, so slow-machine batch durations can't close sessions
    # inside a single availableNow drain.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        _run_session_scenario(spark, src, out, ck)
    finally:
        spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")


def _run_session_scenario(spark, src, out, ck):
    def drain():
        q = (
            expiring_user_sessions(
                spark.readStream.schema(SCHEMA).parquet(src), timeout_ms=500
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    pd.DataFrame(
        [(1, 4.0), (1, 6.0), (2, 1.0)], columns=["user_id", "value"]
    ).to_parquet(f"{src}/a.parquet", index=False)
    drain()
    # nothing closed yet — sessions are open (timeouts only fire in
    # data-triggered batches, and the only data batch just set the deadlines)
    open_rows = spark.read.parquet(out).collect() if os.path.isdir(out) else []
    assert all(r.closed != 1 for r in open_rows)

    # let the idle timeout elapse, then trigger another batch —
    # user 2 gets more data (stays open / re-accumulates), user 1 idle → closed
    time.sleep(1.5)
    pd.DataFrame([(2, 9.0)], columns=["user_id", "value"]).to_parquet(
        f"{src}/b.parquet", index=False
    )
    drain()

    rows = spark.read.parquet(out).collect()
    closed = {r.user_id: (r.n_events, r.total_value) for r in rows if r.closed == 1}
    assert closed.get(1) == (2, 10.0), f"user 1 session must close: {rows}"
    assert 2 not in closed  # user 2 had fresh data → still open
