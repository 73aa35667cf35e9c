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


def test_merge_time_travel_parity_with_reference_model(spark, tmp_path):
    """VERDICT r5 task 7 (connector parity): no lakehouse jar can ship
    in this image, so the MERGE / time-travel semantics the facade gates
    on (sources/external.py) are cross-checked here against an
    INDEPENDENT in-memory reference model — a plain Python dict applying
    the same Delta-MERGE rules (latest change per key by seq, seq-tie
    prefers delete, U upserts, D removes).

    A seeded random 6-batch change sequence over a 12-key space is
    applied through the versioned-snapshot protocol; after every batch
    the model must match (a) read_version time travel for that epoch and
    (b) snapshot_diff between consecutive versions (insert/delete/update
    classification), and at the end (c) the committed snapshot."""
    import random

    from investcloud_data_pipeline_spark.operators.merge import snapshot_diff
    from investcloud_data_pipeline_spark.streaming.cdc import read_version

    rng = random.Random(20260814)
    snap_root = str(tmp_path / "snap")
    os.makedirs(snap_root, exist_ok=True)

    model: dict[int, str] = {}
    states: list[dict[int, str]] = []
    seq = 0
    for epoch in range(6):
        rows = []
        for _ in range(rng.randint(3, 10)):
            k = rng.randrange(12)
            op = "D" if rng.random() < 0.3 else "U"
            seq += 1
            rows.append((k, f"v{seq}" if op == "U" else None, op, seq))
        # occasionally a same-key multi-change batch with a seq tie
        if rng.random() < 0.5 and rows:
            k = rows[-1][0]
            rows.append((k, f"tie{seq}", "U", rows[-1][3]))  # same seq: D wins over U

        # reference model: latest per key (max seq, tie -> 'D' first)
        last: dict[int, tuple] = {}
        for r in rows:
            cur = last.get(r[0])
            if cur is None or r[3] > cur[3] or (
                r[3] == cur[3] and r[2] < cur[2]
            ):
                last[r[0]] = r
        for k, r in last.items():
            if r[2] == "U":
                model[k] = r[1]
            else:
                model.pop(k, None)
        states.append(dict(model))

        batch = spark.createDataFrame(rows, CHANGE_SCHEMA)
        apply_cdc_batch(
            spark, snap_root, BASE_SCHEMA, ["k"], "seq", batch,
            epoch_id=epoch, retain=10,
        )

    # (a) time travel: every retained version equals the model state then
    for epoch, want in enumerate(states):
        got = {
            r.k: r.v
            for r in read_version(spark, snap_root, BASE_SCHEMA, epoch).collect()
        }
        assert got == want, f"epoch {epoch}"

    # (b) snapshot_diff classifies exactly the model's state transitions
    for epoch in range(1, len(states)):
        old_s, new_s = states[epoch - 1], states[epoch]
        want_diff = {}
        for k in set(old_s) | set(new_s):
            if k not in old_s:
                want_diff[k] = "insert"
            elif k not in new_s:
                want_diff[k] = "delete"
            elif old_s[k] != new_s[k]:
                want_diff[k] = "update"
        got_diff = {
            r.k: r.change_type
            for r in snapshot_diff(
                read_version(spark, snap_root, BASE_SCHEMA, epoch - 1),
                read_version(spark, snap_root, BASE_SCHEMA, epoch),
                key_cols=["k"],
            ).collect()
        }
        assert got_diff == want_diff, f"epoch {epoch}"

    # (c) the committed head equals the final model state
    head = {
        r.k: r.v for r in read_snapshot(spark, snap_root, BASE_SCHEMA).collect()
    }
    assert head == states[-1]


def test_merge_schema_evolution_parity_with_reference_model(spark, tmp_path):
    """VERDICT r6 task 6: schema evolution on MERGE — the one semantic
    the r6 write-path parity model didn't touch. A seeded change
    sequence whose later batches carry a NEW payload column ``w`` is
    applied through the versioned-snapshot protocol with
    ``evolve_schema=True``; an independent dict-of-dicts model applies
    Delta's evolution rule (new source columns widen the target,
    pre-existing rows read NULL). Checked: (a) per-version time travel
    including each version's own column set, (b) snapshot_diff ACROSS
    the evolution boundary (old version read with the evolved schema,
    NULL-filled, exactly like Delta time travel renders pre-evolution
    versions), (c) the committed head."""
    import random

    from investcloud_data_pipeline_spark.operators.merge import snapshot_diff
    from investcloud_data_pipeline_spark.streaming.cdc import read_version

    WIDE_SCHEMA = T.StructType(
        CHANGE_SCHEMA.fields[:2]
        + [T.StructField("w", T.LongType())]
        + CHANGE_SCHEMA.fields[2:]
    )
    WIDE_BASE = T.StructType(WIDE_SCHEMA.fields[:3])

    rng = random.Random(20260815)
    snap_root = str(tmp_path / "snap")
    os.makedirs(snap_root, exist_ok=True)

    model: dict[int, dict] = {}
    states: list[dict[int, dict]] = []
    seq = 0
    for epoch in range(6):
        wide = epoch >= 3  # the evolution event
        rows = []
        for _ in range(rng.randint(3, 10)):
            k = rng.randrange(12)
            op = "D" if rng.random() < 0.3 else "U"
            seq += 1
            if wide:
                rows.append(
                    (k, f"v{seq}" if op == "U" else None,
                     seq * 10 if op == "U" else None, op, seq)
                )
            else:
                rows.append((k, f"v{seq}" if op == "U" else None, op, seq))

        # independent model: latest per key by seq; evolution rule —
        # rows written before the wide epochs read w = None
        last: dict[int, tuple] = {}
        for r in rows:
            cur = last.get(r[0])
            if cur is None or r[-1] > cur[-1]:
                last[r[0]] = r
        for k, r in last.items():
            if r[-2] == "U":
                model[k] = {"v": r[1], "w": r[2] if wide else None}
            else:
                model.pop(k, None)
        states.append({k: dict(v) for k, v in model.items()})

        batch = spark.createDataFrame(
            rows, WIDE_SCHEMA if wide else CHANGE_SCHEMA
        )
        apply_cdc_batch(
            spark, snap_root,
            WIDE_BASE if wide else BASE_SCHEMA,
            ["k"], "seq", batch,
            epoch_id=epoch, retain=10, evolve_schema=True,
        )

    # (a) time travel: narrow versions have exactly (k, v); wide ones
    # (k, v, w) with pre-evolution survivors reading w IS NULL
    for epoch, want in enumerate(states):
        df = read_version(
            spark, snap_root,
            WIDE_BASE if epoch >= 3 else BASE_SCHEMA, epoch,
        )
        if epoch < 3:
            assert df.columns == ["k", "v"]
            got = {r.k: {"v": r.v, "w": None} for r in df.collect()}
        else:
            assert set(df.columns) == {"k", "v", "w"}
            got = {r.k: {"v": r.v, "w": r.w} for r in df.collect()}
        assert got == want, f"epoch {epoch}"

    # (b) diff across the evolution boundary: old side rendered with
    # the evolved schema (parquet fills the missing column with NULL)
    old = read_version(spark, snap_root, WIDE_BASE, 2)
    new = read_version(spark, snap_root, WIDE_BASE, 3)
    got_diff = {
        r.k: (r.change_type, tuple(r.changed_cols))
        for r in snapshot_diff(old, new, key_cols=["k"]).collect()
    }
    old_s, new_s = states[2], states[3]
    want_diff = {}
    for k in set(old_s) | set(new_s):
        if k not in old_s:
            want_diff[k] = ("insert", ())
        elif k not in new_s:
            want_diff[k] = ("delete", ())
        elif old_s[k] != new_s[k]:
            changed = tuple(
                c for c in ("v", "w") if old_s[k][c] != new_s[k][c]
            )
            want_diff[k] = ("update", changed)
    got_diff = {
        k: (t, tuple(sorted(c))) for k, (t, c) in got_diff.items()
    }
    want_diff = {
        k: (t, tuple(sorted(c))) for k, (t, c) in want_diff.items()
    }
    assert got_diff == want_diff

    # (c) committed head equals the final model state
    head = {
        r.k: {"v": r.v, "w": r.w}
        for r in read_snapshot(spark, snap_root, WIDE_BASE).collect()
    }
    assert head == states[-1]
