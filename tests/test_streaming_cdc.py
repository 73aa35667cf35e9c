"""Streaming CDC apply: the change-stream MERGE sink converges to the
batch apply_cdc result, survives multi-wave ingestion, and skips
replayed epochs."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from investcloud_data_pipeline_spark.operators.merge import apply_cdc
from investcloud_data_pipeline_spark.streaming.atomic import read_committed
from investcloud_data_pipeline_spark.streaming.cdc import (
    apply_cdc_batch,
    read_snapshot,
    start_cdc_apply,
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)
BASE_SCHEMA = T.StructType(CHANGE_SCHEMA.fields[:2])


def _write_wave(spark, changes_dir, rows, wave):
    df = spark.createDataFrame(rows, CHANGE_SCHEMA)
    # file-stream sources track files BY NAME: every wave needs new ones
    df.coalesce(1).write.mode("append").parquet(
        os.path.join(changes_dir, f"wave_{wave}")
    )


def _run_available_now(spark, changes_dir, snap_root, ckpt):
    q = start_cdc_apply(
        spark,
        changes_dir=changes_dir + "/*",
        change_schema=CHANGE_SCHEMA,
        snapshot_root=snap_root,
        checkpoint_dir=ckpt,
        key_cols=["k"],
        available_now=True,
    )
    q.awaitTermination(120)


def test_stream_converges_to_batch_merge(spark, tmp_path):
    changes_dir = str(tmp_path / "changes")
    snap_root = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(snap_root, exist_ok=True)

    wave1 = [(1, "a", "U", 1), (2, "b", "U", 2), (3, "c", "U", 3)]
    _write_wave(spark, changes_dir, wave1, 1)
    _run_available_now(spark, changes_dir, snap_root, ckpt)
    got = {r.k: r.v for r in read_snapshot(spark, snap_root, BASE_SCHEMA).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}

    # wave 2: update 1, delete 2, insert 9, delete-then-reinsert 3
    wave2 = [
        (1, "a2", "U", 10),
        (2, None, "D", 11),
        (9, "new", "U", 12),
        (3, None, "D", 13),
        (3, "c2", "U", 14),
    ]
    _write_wave(spark, changes_dir, wave2, 2)
    _run_available_now(spark, changes_dir, snap_root, ckpt)
    got = {r.k: r.v for r in read_snapshot(spark, snap_root, BASE_SCHEMA).collect()}
    assert got == {1: "a2", 3: "c2", 9: "new"}

    # equivalence with one-shot batch MERGE over the union of all changes
    base = spark.createDataFrame([], BASE_SCHEMA)
    all_changes = spark.createDataFrame(wave1 + wave2, CHANGE_SCHEMA)
    batch = {
        r.k: r.v
        for r in apply_cdc(base, all_changes, ["k"], "seq").collect()
    }
    assert got == batch


def test_replayed_epoch_is_skipped(spark, tmp_path):
    snap_root = str(tmp_path / "snap")
    os.makedirs(snap_root, exist_ok=True)
    b1 = spark.createDataFrame([(1, "a", "U", 1)], CHANGE_SCHEMA)
    apply_cdc_batch(spark, snap_root, BASE_SCHEMA, ["k"], "seq", b1, epoch_id=0)
    epoch0, dir0 = read_committed(snap_root)

    # replay epoch 0 with DIFFERENT data: must be ignored entirely
    b1_replay = spark.createDataFrame([(1, "corrupt", "U", 99)], CHANGE_SCHEMA)
    apply_cdc_batch(
        spark, snap_root, BASE_SCHEMA, ["k"], "seq", b1_replay, epoch_id=0
    )
    assert read_committed(snap_root) == (epoch0, dir0)
    got = {r.k: r.v for r in read_snapshot(spark, snap_root, BASE_SCHEMA).collect()}
    assert got == {1: "a"}

    # next epoch applies normally
    b2 = spark.createDataFrame([(2, "b", "U", 2)], CHANGE_SCHEMA)
    apply_cdc_batch(spark, snap_root, BASE_SCHEMA, ["k"], "seq", b2, epoch_id=1)
    got = {r.k: r.v for r in read_snapshot(spark, snap_root, BASE_SCHEMA).collect()}
    assert got == {1: "a", 2: "b"}
