"""transformWithStateInPandas (Spark 4 arbitrary-state API, RocksDB
provider): running totals accumulate across micro-batches and agree with
the applyInPandasWithState implementation; the state-store data source
can read the operator's state back out of the checkpoint."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from investcloud_data_pipeline_spark.streaming.stateful import (
    running_user_totals_tws,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _write(src: str, name: str, rows: list[tuple[int, float]]) -> None:
    os.makedirs(src, exist_ok=True)
    pd.DataFrame(rows, columns=["user_id", "value"]).to_parquet(
        f"{src}/{name}", index=False
    )


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_protobuf(), reason="protobuf present; gate moot")
def test_tws_unavailable_without_protobuf_degrades_clearly(spark):
    with pytest.raises(NotImplementedError, match="protobuf"):
        running_user_totals_tws(spark.readStream.format("rate").load())


def test_tws_totals_accumulate_and_state_is_readable(
    spark, tmp_path, rocksdb_state
):
    """Equivalence across the two stateful implementations: the same
    drain sequence must produce the same running totals whether the
    operator runs as transformWithStateInPandas (protobuf present) or
    as its applyInPandasWithState twin (allow_fallback on this image) —
    every assertion below holds for BOTH paths; the state-store
    stateVarName read is TWS-specific and gated accordingly."""
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))

    def drain() -> None:
        stream = running_user_totals_tws(
            spark.readStream.schema(SCHEMA).parquet(src),
            allow_fallback=not _has_protobuf(),
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

    _write(src, "b1.parquet", [(1, 10.0), (1, 5.0), (2, 1.0)])
    drain()
    _write(src, "b2.parquet", [(1, 2.5), (3, 7.0)])
    drain()

    rows = spark.read.parquet(out).collect()
    latest: dict[int, tuple[int, float]] = {}
    for r in rows:
        cur = latest.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            latest[r.user_id] = (r.n_events, r.total_value)
    assert latest[1] == (3, 17.5)  # state survived the batch boundary
    assert latest[2] == (1, 1.0)
    assert latest[3] == (1, 7.0)

    # state-store reader: inspect the operator's live state offline —
    # the ops story for debugging a 1000-executor streaming job's state.
    # (The named stateVarName is a TWS concept; the fallback's
    # applyInPandasWithState state is read without it.)
    reader = spark.read.format("statestore")
    if _has_protobuf():
        reader = reader.option("stateVarName", "totals")
    state = reader.load(ck)
    keys = {r["key"]["user_id"] for r in state.select("key").collect()}
    assert keys == {1, 2, 3}
    if _has_protobuf():
        per_key = {
            r["key"]["user_id"]: (
                r["value"]["n_events"],
                r["value"]["total_value"],
            )
            for r in state.select("key", "value").collect()
        }
        assert per_key[1] == (3, 17.5)


def test_statestore_reader_exposes_dedup_state(spark, tmp_path):
    """The state-store data source reads streaming operator state
    offline from the checkpoint — here the keys retained by a
    dropDuplicates, the ops story for inspecting a production job's
    state without touching the job."""
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    _write(src, "b1.parquet", [(1, 10.0), (1, 5.0), (2, 1.0)])
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .dropDuplicates(["user_id"])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = spark.read.format("statestore").load(ck)
    keys = {r["key"]["user_id"] for r in state.select("key").collect()}
    assert keys == {1, 2}
