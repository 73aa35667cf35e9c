"""E2e for the per-user running top-k stage (streaming/stateful.py::
start_user_topk) — the VALUE-DEPENDENT-EVICTION state class: whether an
arriving event enters the state and which row it evicts depends on its
value relative to the rows already held, which neither the dedup nor
the window stages can express.

The batch contract is plans/analytics_ext8.user_topk_events (strict
DuckDB oracle), so the batch-equivalence assertions here transitively
put the streaming emission under the oracle gate. Mirrors the session
stage's test battery: cross-batch state evolution, restart recovery,
replay idempotence, HDFS/RocksDB state-store parity.
"""

from __future__ import annotations

import os

import pandas as pd

from investcloud_data_pipeline_spark.plans.analytics_ext8 import (
    user_topk_events,
)
from investcloud_data_pipeline_spark.streaming.stateful import (
    TOPK_K,
    start_user_topk,
)

COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _pdf(rows):
    return pd.DataFrame(rows, columns=COLS).astype({"ts": "datetime64[us]"})


def _write(tmp_path, pdfs):
    """Write one parquet file per pdf under src/ (one availableNow
    micro-batch each, default admission) and the union under sf/ for
    the registry twin."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for i, pdf in enumerate(pdfs):
        pdf.to_parquet(f"{src}/p{i}.parquet", index=False)
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    pd.concat(pdfs).assign(props="{}").to_parquet(
        f"{sf_dir}/events.parquet", index=False
    )
    return src, sf_dir


def _final_rowset(df):
    """The stage's final ranking: the max-n_seen emission per user."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id")
    return {
        tuple(r)
        for r in (
            df.withColumn("mx", F.max("n_seen").over(w))
            .filter(F.col("n_seen") == F.col("mx"))
            .select("user_id", "rank", "event_id", "value", "n_seen")
            .collect()
        )
    }


def _twin_rowset(spark, sf_dir):
    return {
        tuple(r)
        for r in user_topk_events(spark, sf_dir)
        .select("user_id", "rank", "event_id", "value", "n_seen")
        .collect()
    }


def _bulk_rows(n=400, start_id=0, value_of=None):
    value_of = value_of or (lambda i: float(i % 89) + 0.25)
    return [
        (
            start_id + i,
            pd.Timestamp("2024-03-01") + pd.Timedelta(minutes=i),
            i % 23,
            ["click", "view", "purchase"][i % 3],
            value_of(i),
        )
        for i in range(n)
    ]


def test_topk_stage_matches_registry_twin(spark, tmp_path):
    # two micro-batches; the second carries values that DISPLACE
    # batch-1 top-k members for every user (value formula shifted up)
    b1 = _pdf(_bulk_rows(300))
    b2 = _pdf(
        _bulk_rows(
            300, start_id=1000, value_of=lambda i: float(i % 89) + 50.25
        )
    )
    src, sf = _write(tmp_path, [b1, b2])
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = start_user_topk(spark, src, out, ck, max_files_per_trigger=1)
    q.awaitTermination(120)
    got = _final_rowset(spark.read.parquet(out))
    want = _twin_rowset(spark, sf)
    assert got == want and want
    # the displacement is real: every user's final top-k holds batch-2
    # events (value >= 50) in rank 1 — state evicted by VALUE
    rank1 = {u: v for (u, rk, _e, v, _n) in got if rk == 1}
    assert rank1 and all(v >= 50 for v in rank1.values())
    # and n_seen proves the counter survived both batches
    n_by_user = {u: n for (u, _rk, _e, _v, n) in got}
    # 300 = 13*23 + 1 per batch: user 0 sees 14+14, the rest 13+13
    assert set(n_by_user.values()) == {26, 28}
    # replay idempotence: a second drain appends nothing
    q2 = start_user_topk(spark, src, out, ck, max_files_per_trigger=1)
    q2.awaitTermination(120)
    assert _final_rowset(spark.read.parquet(out)) == want


def test_topk_cross_batch_eviction_hand_computed(spark, tmp_path):
    """User 1: batch 1 brings values 1..6 (top-5 = 6,5,4,3,2), batch 2
    brings a single 100.0 — it must enter at rank 1 and evict value 2,
    with state recovered from batch 1 (batch 2 alone cannot rank 6
    events)."""
    t = pd.Timestamp("2024-03-01")
    b1 = _pdf(
        [(i, t + pd.Timedelta(minutes=i), 1, "click", float(i + 1))
         for i in range(6)]
    )
    b2 = _pdf([(99, t + pd.Timedelta(hours=1), 1, "click", 100.0)])
    src, sf = _write(tmp_path, [b1, b2])
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = start_user_topk(spark, src, out, ck, max_files_per_trigger=1)
    q.awaitTermination(120)
    got = sorted(
        _final_rowset(spark.read.parquet(out)), key=lambda r: r[1]
    )
    assert [(r[1], r[2], r[3]) for r in got] == [
        (1, 99, 100.0),
        (2, 5, 6.0),
        (3, 4, 5.0),
        (4, 3, 4.0),
        (5, 2, 3.0),
    ]
    assert all(r[4] == 7 for r in got)  # n_seen counts all 7 events
    assert _final_rowset(spark.read.parquet(out)) == _twin_rowset(
        spark, sf
    )


def test_topk_stage_recovers_across_restart(spark, tmp_path):
    """Drain 1 checkpoints the per-user heaps; new events arrive while
    the query is DOWN; the restarted drain reads ONLY the new file, so
    a correct final ranking (== batch twin over ALL input) proves the
    heap state was recovered from the checkpoint, not recomputed."""
    b1 = _pdf(_bulk_rows(300))
    src, sf_ignored = _write(tmp_path, [b1])
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = start_user_topk(spark, src, out, ck)
    q.awaitTermination(120)

    # batch 2: tiny constant values — none can enter any top-k (every
    # user holds 13 batch-1 events, almost all > 0.5), so the restarted
    # drain reads ONLY p1.parquet yet must emit batch-1 event ids it
    # never saw: recovered heap state is the only possible source
    b2 = _pdf(_bulk_rows(300, start_id=1000, value_of=lambda i: 0.5))
    src, sf = _write(tmp_path, [b1, b2])  # adds p1.parquet, rebuilds sf
    q2 = start_user_topk(spark, src, out, ck)
    q2.awaitTermination(120)

    got = _final_rowset(spark.read.parquet(out))
    want = _twin_rowset(spark, sf)
    assert got == want and want
    # every final top-k row is a batch-1 event...
    assert all(e < 1000 for (_u, _rk, e, _v, _n) in got)
    # ...while n_seen proves batch 2 WAS processed and counted
    assert {n for (_u, _rk, _e, _v, n) in got} == {26, 28}


def test_topk_state_store_providers_agree(spark, tmp_path):
    """The stage runs on BOTH state store providers — default HDFS and
    RocksDB (the 100 TB posture) — with identical final rankings; each
    run proves its provider engaged via the state checkpoint's file
    shapes (same discipline as the silver-dedup parity test)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    b1 = _pdf(_bulk_rows(200))
    b2 = _pdf(_bulk_rows(200, start_id=1000))
    prev = spark.conf.get(key, None)
    results = {}
    try:
        for label, provider in (("hdfs", None), ("rocksdb", rocksdb)):
            if provider is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, provider)
            base = tmp_path / label
            src, sf = _write(base, [b1, b2])
            out, ck = str(base / "out"), str(base / "ck")
            q = start_user_topk(
                spark, src, out, ck, max_files_per_trigger=1
            )
            q.awaitTermination(120)
            results[label] = _final_rowset(spark.read.parquet(out))
            state_files = [
                os.path.join(dp, f)
                for dp, _, fs in os.walk(os.path.join(ck, "state"))
                for f in fs
            ]
            assert state_files, f"{label}: no state files written"
            has_rocks = any(
                f.endswith((".zip", ".changelog")) for f in state_files
            )
            has_delta = any(f.endswith(".delta") for f in state_files)
            if label == "rocksdb":
                assert has_rocks, state_files[:5]
            else:
                assert has_delta and not has_rocks, state_files[:5]
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert results["hdfs"] == results["rocksdb"] and results["hdfs"]
    assert all(
        rk <= TOPK_K for (_u, rk, _e, _v, _n) in results["hdfs"]
    )
