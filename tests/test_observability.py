"""df.observe DQ telemetry: metrics ride along with the action that
executes the plan (no second scan), in batch and in streaming progress."""

from __future__ import annotations

from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.operators.quality import (
    observe_quality,
    parse_raw,
    split_quality,
)

RAW = [
    ("a", "u1", "2024-01-01T10:00:00", "1.2.3.4", 10),
    ("b", "u2", "not-a-time", "1.2.3.4", 20),      # invalid ts
    ("c", None, "2024-01-01T11:00:00", "1.2.3.4", 30),  # null user
    ("d", "u3", "2024-01-01T12:00:00", "1.2.3.4", -5),  # negative
    ("e", "u4", "2024-01-01T13:00:00", "1.2.3.4", 40),
]
DDL = "log_id string, user_id string, timestamp string, ip_address string, `watch_time(min)` long"


def test_batch_observation_matches_split(spark):
    parsed = parse_raw(spark.createDataFrame(RAW, DDL))
    observed, obs = observe_quality(parsed)
    valid, quarantine = split_quality(observed)
    n_valid, n_quar = valid.count(), quarantine.count()
    m = obs.get
    assert m["rows"] == 5
    assert m["invalid_rows"] == 3 == n_quar
    assert n_valid == 2
    assert m["valid_watch_time"] == 50.0  # 10 + 40


def test_streaming_observation_in_progress(spark, tmp_path):
    import pandas as pd

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    import os

    os.makedirs(src)
    pd.DataFrame(
        RAW, columns=["log_id", "user_id", "timestamp", "ip_address", "watch_time(min)"]
    ).to_parquet(f"{src}/a.parquet", index=False)

    parsed = parse_raw(spark.readStream.schema(DDL).parquet(src))
    cond = F.col("timestamp_parsed").isNotNull() & (
        F.col("watch_time_parsed") >= 0
    ) & F.col("user_id").isNotNull()
    observed = parsed.observe(
        "dq_stream",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(cond, 0).otherwise(1)).alias("invalid_rows"),
    )
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    metrics = [
        p["observedMetrics"]["dq_stream"]
        for p in q.recentProgress
        if p["observedMetrics"].get("dq_stream")
    ]
    assert metrics, "no observed metrics surfaced in streaming progress"
    assert sum(m["rows"] for m in metrics) == 5
    assert sum(m["invalid_rows"] for m in metrics) == 3


def test_streaming_query_listener_lifecycle(spark, tmp_path):
    """StreamingQueryListener receives start/progress/termination events —
    the hook a production pipeline uses to ship per-trigger metrics
    (rows/sec, batch duration, state size) to a metrics backend."""
    import os
    import time

    from pyspark.sql.streaming import StreamingQueryListener

    events: dict[str, list] = {"started": [], "progress": [], "terminated": []}

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, e):
            events["started"].append(e.id)

        def onQueryProgress(self, e):
            events["progress"].append(e.progress.numInputRows)

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events["terminated"].append(e.id)

    import pandas as pd

    src = str(tmp_path / "lsrc")
    os.makedirs(src)
    pd.DataFrame({"user_id": [1, 2, 3], "value": [1.0, 2.0, 3.0]}).to_parquet(
        f"{src}/a.parquet", index=False
    )

    spark.streams.addListener(listener := Capture())
    try:
        q = (
            spark.readStream.schema("user_id long, value double")
            .parquet(src)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "lck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously after termination
        deadline = time.time() + 30
        while time.time() < deadline and not events["terminated"]:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    assert events["started"], "no start event delivered"
    assert events["terminated"], "no termination event delivered"
    assert sum(events["progress"]) == 3  # all input rows observed
