"""Custom stateful streaming operator test: running totals must
accumulate across micro-batches (state survives) and match the batch
computation at every checkpoint."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import types as T

from investcloud_data_pipeline_spark.streaming.stateful import running_user_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(src: str, name: str, rows: list[tuple[int, float]]) -> None:
    os.makedirs(src, exist_ok=True)
    pd.DataFrame(rows, columns=["user_id", "value"]).to_parquet(
        f"{src}/{name}", index=False
    )


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))

    def drain() -> None:
        stream = running_user_totals(spark.readStream.schema(SCHEMA).parquet(src))
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write(src, "b1.parquet", [(1, 10.0), (1, 5.0), (2, 1.0)])
    drain()
    _write(src, "b2.parquet", [(1, 2.5), (3, 7.0)])
    drain()

    rows = spark.read.parquet(out).collect()
    # latest emission per user = lifetime running totals
    latest: dict[int, tuple[int, float]] = {}
    for r in rows:
        cur = latest.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[1] == (3, 17.5)  # state carried over batch boundary
    assert latest[2] == (1, 1.0)
    assert latest[3] == (1, 7.0)
    # user 1 emitted in both drains (2 then 3 events)
    u1 = sorted(r.n_events for r in rows if r.user_id == 1)
    assert u1 == [2, 3]
