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


def test_streaming_heavy_hitters_bounded_state_guarantee(spark, tmp_path):
    """The MG-in-state sketch must (a) carry state across batches,
    (b) keep every reported count a lower bound of the true count, and
    (c) retain every key whose shard frequency beats the n/(K+1) bar —
    checked against exact counts computed batch-side."""
    import pyspark.sql.functions as F

    from investcloud_data_pipeline_spark.streaming import stateful as SF

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    schema = T.StructType([T.StructField("user_id", T.LongType())])

    def drain() -> None:
        stream = SF.streaming_heavy_hitters(
            spark.readStream.schema(schema).parquet(src)
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

    # batch 1: user 7 dominates; batch 2: user 7 keeps dominating and a
    # long tail churns the small summaries
    os.makedirs(src, exist_ok=True)
    rows1 = [(7,)] * 400 + [(i,) for i in range(100, 400)]
    rows2 = [(7,)] * 300 + [(i,) for i in range(400, 900)]
    pd.DataFrame(rows1, columns=["user_id"]).to_parquet(
        f"{src}/b1.parquet", index=False
    )
    drain()
    pd.DataFrame(rows2, columns=["user_id"]).to_parquet(
        f"{src}/b2.parquet", index=False
    )
    drain()

    emitted = spark.read.parquet(out)
    # keep each shard's LATEST emission (max lifetime rows)
    latest_n = emitted.groupBy("shard").agg(
        F.max("n_shard_rows").alias("n_shard_rows")
    )
    final = emitted.join(latest_n, ["shard", "n_shard_rows"]).collect()

    # exact truth, sharded the same way
    all_rows = pd.DataFrame(rows1 + rows2, columns=["user_id"])
    truth = spark.createDataFrame(all_rows).select(
        F.pmod(F.xxhash64("user_id"), F.lit(SF.HH_STREAM_SHARDS))
        .cast("long")
        .alias("shard"),
        "user_id",
    )
    exact = {
        (r.shard, r.user_id): r.c
        for r in truth.groupBy("shard", "user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    shard_totals: dict[int, int] = {}
    for (sh, _u), c in exact.items():
        shard_totals[sh] = shard_totals.get(sh, 0) + c

    got = {(r.shard, r.user_id): r.lb_count for r in final}
    # (a) state carried: user 7's lower bound reflects BOTH batches
    u7 = [v for (sh, u), v in got.items() if u == 7]
    assert u7 and u7[0] > 400  # more than batch 1 alone
    # (b) every report is a true lower bound
    for k, lb in got.items():
        assert lb <= exact[k]
    # (c) the MG retention bar, per shard
    for (sh, u), c in exact.items():
        if c > shard_totals[sh] / (SF.HH_STREAM_K + 1):
            assert (sh, u) in got, (sh, u, c, shard_totals[sh])
    # per-shard summaries respect the K bound
    sizes: dict[int, int] = {}
    for (sh, _u) in got:
        sizes[sh] = sizes.get(sh, 0) + 1
    assert all(v <= SF.HH_STREAM_K for v in sizes.values())


def test_user_quota_gate_across_batches(spark, tmp_path):
    """Admission control: at most `quota` events admitted per user
    ACROSS micro-batches (state carries), every input event emitted
    with a verdict (conservation), and the admitted set deterministic
    by (ts, event_id) order — earliest events win, not arrival order."""
    from investcloud_data_pipeline_spark.streaming.stateful import (
        user_quota_gate,
    )

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.LongType()),
    ])
    src, out, ck = (str(tmp_path / d) for d in ("qsrc", "qout", "qck"))

    def write(name, rows):
        os.makedirs(src, exist_ok=True)
        pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts"]
        ).to_parquet(f"{src}/{name}", index=False)

    def drain():
        stream = user_quota_gate(
            spark.readStream.schema(schema).parquet(src), quota=3
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

    # batch 1: user 1 sends 2 (both admitted), user 2 sends 4 (3 in)
    write("b1.parquet", [(10, 1, 100), (11, 1, 101),
                         (20, 2, 100), (21, 2, 101), (22, 2, 102), (23, 2, 103)])
    drain()
    # batch 2: user 1 sends 3 more — only ONE more fits (state carried);
    # the earliest-by-ts event must be the admitted one
    write("b2.parquet", [(13, 1, 300), (12, 1, 200), (14, 1, 400)])
    drain()

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 9  # conservation: every event has a verdict
    admitted = {r.event_id for r in rows if r.admitted}
    rejected = {r.event_id for r in rows if not r.admitted}
    assert admitted == {10, 11, 12, 20, 21, 22}  # 12: earliest ts wins
    assert rejected == {13, 14, 23}
    # per-user admitted counts never exceed the quota
    for u in (1, 2):
        assert sum(1 for r in rows if r.user_id == u and r.admitted) == 3


def test_event_time_sessions_close_at_watermark(spark, tmp_path):
    """EventTimeTimeout timer class: a session closes exactly when the
    WATERMARK (driven by later events, not wall clock) passes
    last_event + gap; its emitted row equals the batch F.session_window
    aggregate over the same events; a session still inside the horizon
    stays open (no emission). Cross-batch: batch 2 extends user 1's
    open session before a batch-3 far-future event closes everything
    closable."""
    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.streaming.stateful import (
        event_time_user_sessions,
    )

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))

    def write(name, rows):
        os.makedirs(src, exist_ok=True)
        pd.DataFrame(rows, columns=["ts", "user_id", "value"]).astype(
            {"ts": "datetime64[us]"}
        ).to_parquet(f"{src}/{name}", index=False)

    def drain():
        stream = event_time_user_sessions(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
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

    t = pd.Timestamp("2024-03-01")
    m = pd.Timedelta(minutes=1)
    write("b1.parquet", [(t, 1, 1.25), (t + 5 * m, 1, 2.5)])
    # batch 2 EXTENDS the open session (within the 30-min gap) — the
    # timer must move, not fire
    write("b2.parquet", [(t + 20 * m, 1, 4.0)])
    # batch 3: a far-future event pushes the watermark past user 1's
    # last_event + gap, closing the session; user 2's own session
    # stays OPEN (inside the horizon relative to the new watermark)
    write("b3.parquet", [(t + pd.Timedelta(hours=6), 2, 8.0)])
    drain()

    rows = spark.read.parquet(out).collect()
    got = {r.user_id: r for r in rows}
    # exactly ONE closed session: user 1's, spanning all three events
    assert set(got) == {1}
    r = got[1]
    assert r.n_events == 3
    assert r.total_micros == int((1.25 + 2.5 + 4.0) * 1_000_000)
    assert r.session_start == t.to_pydatetime()
    assert r.session_end == (
        t + 20 * m + pd.Timedelta(minutes=30)
    ).to_pydatetime()
    # replay idempotence: another drain over the same checkpoint
    # appends nothing and leaves user 2's session open
    drain()
    assert spark.read.parquet(out).count() == 1


def test_interval_ms_single_source_of_gap_truth():
    """Round-11 ADVICE: gap_ms is DERIVED from the gap string (the old
    twin defaults could silently drift), and the micros fold uses
    np.floor to match the batch plans' F.floor for negative values."""
    import numpy as np
    import pytest

    from investcloud_data_pipeline_spark.streaming.stateful import (
        _interval_ms,
    )

    assert _interval_ms("30 minutes") == 30 * 60 * 1000
    assert _interval_ms("1 minute") == 60 * 1000
    assert _interval_ms("2 hours") == 2 * 3600 * 1000
    assert _interval_ms("45 seconds") == 45 * 1000
    assert _interval_ms("500 milliseconds") == 500
    assert _interval_ms("1 day") == 86_400_000
    with pytest.raises(ValueError):
        _interval_ms("3 fortnights")
    # floor-vs-truncate: -0.3 value -> F.floor gives -300001 micros for
    # -0.300001; plain astype('int64') truncation would give -300000
    vals = np.floor(np.array([-0.3000015]) * 1_000_000).astype("int64")
    assert int(vals[0]) == -300002


def test_interval_ms_compound_and_week_grammar():
    """Round-11 review follow-up: the parser must cover the compound /
    week forms withWatermark itself accepts for the same string."""
    import pytest

    from investcloud_data_pipeline_spark.streaming.stateful import (
        _interval_ms,
    )

    assert _interval_ms("1 hour 30 minutes") == 90 * 60 * 1000
    assert _interval_ms("1 week") == 7 * 86_400_000
    assert _interval_ms("2 days 3 hours 4 seconds") == (
        2 * 86_400_000 + 3 * 3_600_000 + 4000
    )
    with pytest.raises(ValueError):
        _interval_ms("5 minutes and a bit")
    with pytest.raises(ValueError):
        _interval_ms("")
    # round-12 ADVICE: Spark's interval parser is case-insensitive and
    # takes abbreviations for the same string — parity required
    assert _interval_ms("30 Minutes") == 30 * 60 * 1000
    assert _interval_ms("30 min") == 30 * 60 * 1000
    assert _interval_ms("30m") == 30 * 60 * 1000
    assert _interval_ms("500 ms") == 500  # 'ms' is not plural of 'm'
    assert _interval_ms("10 s") == 10_000
    assert _interval_ms("2 H") == 2 * 3_600_000
    assert _interval_ms("1 SEC") == 1000
    with pytest.raises(ValueError):
        _interval_ms("3 fortnights")
