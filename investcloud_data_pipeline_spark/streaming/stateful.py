"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no custom state (SURVEY §2.11: "no
applyInPandasWithState / flatMapGroupsWithState"); this extends the
engine with the canonical example a training-data/analytics pipeline
needs: per-key running aggregates that survive across micro-batches with
explicit, bounded state.

Scale notes: state lives in the state store partitioned by the group key
(one shuffle per batch on user_id); state size is O(|keys| × state row),
independent of event volume. A processing-time timeout evicts idle keys,
which is the knob that keeps 100 TB-scale key churn bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum) across micro-batches; emits the
    updated running values once per batch the key appears in."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def _make_expiring_session(timeout_ms: int):
    def _expiring_session(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Session accumulator with idle-timeout eviction: while events keep
        arriving the session stays open (state updated, nothing emitted); when
        the key goes idle past the timeout, the final session row is emitted
        and the state removed — the canonical bounded-state pattern."""
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n],
                 "total_value": [round(total, 6)], "closed": [1]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_ms)  # ms of idleness before eviction
        yield pd.DataFrame(
            {"user_id": [], "n_events": [], "total_value": [], "closed": []}
        ).astype({"user_id": "int64", "n_events": "int64",
                  "total_value": "float64", "closed": "int64"})

    return _expiring_session


def expiring_user_sessions(
    events_stream: DataFrame, timeout_ms: int = 30_000
) -> DataFrame:
    """Streaming sessions that close (emit + evict state) after
    ``timeout_ms`` of processing-time idleness — state size stays
    O(active keys), the 100 TB requirement.

    The timeout is relative to the micro-batch that last saw the key;
    eviction fires in the first batch that runs after the deadline
    (including Spark's no-data maintenance batches), so the timeout must
    exceed the expected batch cadence or sessions close between triggers.
    """
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_expiring_session(timeout_ms),
            outputStructType="user_id long, n_events long, total_value double, closed long",
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def running_user_totals_tws(
    events_stream: DataFrame, allow_fallback: bool = False
) -> DataFrame:
    """Same semantics as :func:`running_user_totals`, expressed with
    ``transformWithStateInPandas``. Requires the RocksDB state store
    provider (``spark.sql.streaming.stateStore.providerClass``) — which
    is also the right provider for 100 TB-scale key cardinality: state
    lives off-heap/on-disk with changelog checkpointing instead of a
    JVM-heap HashMap.

    ``allow_fallback=True`` degrades to :func:`running_user_totals`
    (the ``applyInPandasWithState`` twin — same output rows per batch,
    different state wire format) on environments without protobuf; the
    default raises so deployments notice the missing capability instead
    of silently checkpointing an incompatible state layout."""
    try:  # the TWS runner speaks protobuf to the JVM — not a Spark dep
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        if allow_fallback:
            return running_user_totals(events_stream)
        raise NotImplementedError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pip install protobuf); use running_user_totals (applyInPandasWithState) "
            "on environments without it, or pass allow_fallback=True"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )

        def close(self) -> None:
            pass

    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Proc(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running totals with custom state.

    Input: a streaming DataFrame with (user_id long, value double).
    Output: one row per user per batch-with-activity, carrying the
    lifetime running count/total so far. Declared in append output mode
    (emissions are the function's explicit yields, one per batch) so the
    stream composes with append-only file sinks; update mode would
    require an update-capable sink (memory/kafka/foreach).
    """
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------- streaming heavy hitters: an MG sketch in the state store ----------
#
# The streaming twin of the batch two-pass heavy-hitter query
# (plans/analytics_ext4.py): keys are sharded with pmod(xxhash64) into
# HH_STREAM_SHARDS groups, and each shard's STATE is a Misra-Gries
# summary of at most HH_STREAM_K counters (stored as parallel
# keys/counts arrays plus the shard's lifetime row total) — bounded
# state for an UNBOUNDED key space, which per-key exact counting
# cannot give. Every key lives in exactly one shard, so the MG
# guarantee applies per shard: after n_shard rows, any key with shard
# frequency > n_shard/(K+1) is present in that shard's summary, and
# each reported count is a LOWER bound undercounting by at most
# n_shard/(K+1).
#
# Each batch the shard re-emits its full current summary (<= K rows per
# shard per batch, append mode): downstream picks the latest emission
# per shard via max(n_shard_rows) and applies the exact-verify pass if
# exact counts are needed (the batch query shows that join).

HH_STREAM_SHARDS = 16
HH_STREAM_K = 64

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("user_id", LongType()),
        StructField("lb_count", LongType()),
        StructField("n_shard_rows", LongType()),
    ]
)
HH_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_rows", LongType()),
    ]
)


def _update_hh_sketch(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from ..operators.sketches import mg_merge

    if state.exists:
        keys, counts, n_rows = state.get
        counters = dict(zip(keys, counts))
    else:
        counters, n_rows = {}, 0
    for pdf in batches:
        n_rows += len(pdf)
        counters = mg_merge(
            counters,
            pdf.groupby("user_id").size().items(),
            HH_STREAM_K,
        )
    state.update(
        (list(counters.keys()), list(counters.values()), n_rows)
    )
    yield pd.DataFrame(
        {
            "shard": [int(key[0])] * len(counters),
            "user_id": list(counters.keys()),
            "lb_count": list(counters.values()),
            "n_shard_rows": [n_rows] * len(counters),
        }
    )


def streaming_heavy_hitters(events_stream: DataFrame) -> DataFrame:
    """Streaming heavy-hitter candidates with bounded per-shard state.

    Input: a streaming DataFrame with (user_id long). Output: per batch
    and shard, the shard's full current MG summary — (shard, user_id,
    lb_count lower bound, n_shard_rows lifetime total). Append mode."""
    from pyspark.sql import functions as F

    sharded = events_stream.select(
        F.pmod(F.xxhash64("user_id"), F.lit(HH_STREAM_SHARDS))
        .cast("long")
        .alias("shard"),
        "user_id",
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _update_hh_sketch,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------- per-user quota gate (admission control) ----------
#
# The ingestion rate-limiter: each user may contribute at most
# ``quota`` events across the stream's lifetime (a crawler cap, an
# abuse throttle, a per-source contribution ceiling in a training-data
# intake). Events beyond the quota are EMITTED but flagged — the
# quarantine-not-drop convention of the bronze DQ split, so admitted +
# rejected always reconciles with the input. State per key is ONE long
# (events admitted so far): bounded, timeout-free, O(|keys|).
#
# Determinism: within a batch the group's rows are sorted by
# (ts, event_id) before the quota line is drawn, so which events get
# admitted does not depend on shuffle arrival order — replays and
# reruns admit the identical set.

QUOTA_OUTPUT_SCHEMA = (
    "user_id long, event_id long, admitted boolean, n_admitted_after long"
)
QUOTA_STATE_SCHEMA = StructType([StructField("n_admitted", LongType())])


def _make_quota_gate(quota: int):
    def _quota_gate(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (n_admitted,) = state.get if state.exists else (0,)
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            state.update((n_admitted,))
            return
        pdf = pd.concat(pdfs).sort_values(["ts", "event_id"])
        room = max(0, quota - n_admitted)
        admitted_mask = [i < room for i in range(len(pdf))]
        n_admitted += min(room, len(pdf))
        state.update((int(n_admitted),))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(pdf),
                "event_id": pdf["event_id"].to_list(),
                "admitted": admitted_mask,
                "n_admitted_after": [int(n_admitted)] * len(pdf),
            }
        )

    return _quota_gate


def user_quota_gate(
    events_stream: DataFrame, quota: int = 100
) -> DataFrame:
    """Admission-control gate: at most ``quota`` admitted events per
    user across the stream, every event emitted with its verdict."""
    return (
        events_stream.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_quota_gate(quota),
            outputStructType=QUOTA_OUTPUT_SCHEMA,
            stateStructType=QUOTA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------- per-user running top-k (value-dependent eviction) ----------
#
# The arbitrary-state class the window/dedup stages cannot express:
# whether an arriving event ENTERS the state and which state row it
# EVICTS depends on the event's VALUE relative to the rows already
# held — not on time, keys, or uniqueness. Per user the state is the
# running top-K events by (value DESC, event_id ASC) plus a lifetime
# event counter; an arriving event displaces the current minimum iff
# it outranks it. State is exactly K (value, event_id) pairs + one
# counter per user — bounded for unbounded input, O(|users| · K).
#
# Emission contract (append mode): each batch a user appears in emits
# the user's FULL current top-k tagged with the lifetime counter
# n_seen; n_seen strictly increases per emission, so the FINAL ranking
# is the emission with max(n_seen) per user — the same latest-pick
# convention as the MG heavy-hitter stage. The batch contract is
# plans/analytics_ext8.user_topk_events (strict DuckDB oracle):
# final streamed rows == row_number()-top-K over the complete input,
# INCLUDING the n_seen counter (== the user's total event count).
#
# Reference lineage: the gold layer's rank-within-user window
# (`03_gold_layer_aggregation.py:25-28`) is this shape's batch
# ancestor; the streaming form keeps the heap in the state store
# instead of re-scanning history each trigger.

# Defined in the lightweight constants module so batch plan registries
# can interpolate it without importing this (pandas-heavy) module;
# re-exported here because the streaming stage is its primary user.
from ..constants import TOPK_K  # noqa: E402
TOPK_OUTPUT_SCHEMA = (
    "user_id long, rank long, event_id long, value double, n_seen long"
)
TOPK_STATE_SCHEMA = StructType(
    [
        StructField("event_ids", ArrayType(LongType())),
        StructField("values", ArrayType(DoubleType())),
        StructField("n_seen", LongType()),
    ]
)


def _make_topk_update(k: int):
    def _update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, vals, n_seen = state.get
            cur = list(zip(vals, ids))
        else:
            cur, n_seen = [], 0
        for pdf in batches:
            n_seen += len(pdf)
            cur.extend(
                zip(
                    (float(v) for v in pdf["value"]),
                    (int(i) for i in pdf["event_id"]),
                )
            )
        # total order (value DESC, event_id ASC): ties cannot depend on
        # arrival order, so replays emit identical rankings
        cur.sort(key=lambda t: (-t[0], t[1]))
        cur = cur[:k]
        state.update(
            (
                [i for _, i in cur],
                [v for v, _ in cur],
                int(n_seen),
            )
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(cur),
                "rank": list(range(1, len(cur) + 1)),
                "event_id": [i for _, i in cur],
                "value": [v for v, _ in cur],
                "n_seen": [int(n_seen)] * len(cur),
            }
        )

    return _update


def user_running_topk(
    events_stream: DataFrame, k: int = TOPK_K
) -> DataFrame:
    """Streaming per-user running top-k events by value — see the
    section comment above for the state class and emission contract."""
    return (
        events_stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_topk_update(k),
            outputStructType=TOPK_OUTPUT_SCHEMA,
            stateStructType=TOPK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_user_topk(
    spark,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = TOPK_K,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Production stage wrapper: file-stream source → running top-k →
    append parquet sink with exactly-once checkpointing (same harness
    as the window stages in streaming/windows.py)."""
    from .windows import EVENTS_SCHEMA, _start

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)
    return _start(
        user_running_topk(stream, k),
        out_dir,
        checkpoint_dir,
        "user_topk",
        available_now,
    )


# ---------- event-time-expiring sessions (EventTimeTimeout timers) ----------
#
# Completes the custom-state timer matrix: NoTimeout (running totals /
# top-k), ProcessingTimeTimeout (expiring_user_sessions), and — here —
# EventTimeTimeout: the session closes when the WATERMARK passes
# last_event_time + gap, i.e. deterministically in event time (replays
# and re-runs close sessions at identical points, which the wall-clock
# variant cannot promise). This is the custom-state generalization of
# F.session_window — the built-in emits fixed aggregates, while the
# timer form can emit ARBITRARY per-session state (here count + exact
# micros sum + first/last event time). State: one row per OPEN session,
# evicted by its timer — bounded by active users per watermark horizon.

ET_SESSION_OUTPUT = (
    "user_id long, n_events long, total_micros long, "
    "session_start timestamp, session_end timestamp"
)
ET_SESSION_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_micros", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _make_event_time_session(gap_ms: int):
    def _session(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, micros, start_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_micros": [micros],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [
                        pd.Timestamp(last_us, unit="us")
                        + pd.Timedelta(milliseconds=gap_ms)
                    ],
                }
            )
            return
        n, micros, start_us, last_us = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in batches:
            if not len(pdf):
                continue
            n += len(pdf)
            # integer-micros sum: exact, replay-identical. np.floor
            # before the cast — astype('int64') truncates toward zero,
            # which diverges from the batch plans' F.floor convention
            # for negative values (round-11 ADVICE).
            micros += int(
                np.floor(pdf["value"] * 1_000_000).astype("int64").sum()
            )
            ts_us = pdf["ts"].astype("int64") // 1000
            lo, hi = int(ts_us.min()), int(ts_us.max())
            start_us = lo if start_us is None else min(start_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, micros, start_us, last_us))
        # event-time timer: fires when the watermark passes this point
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
        yield pd.DataFrame(
            {
                "user_id": [],
                "n_events": [],
                "total_micros": [],
                "session_start": [],
                "session_end": [],
            }
        ).astype(
            {
                "user_id": "int64",
                "n_events": "int64",
                "total_micros": "int64",
                "session_start": "datetime64[us]",
                "session_end": "datetime64[us]",
            }
        )

    return _session


def _interval_ms(interval: str) -> int:
    """Milliseconds in a Spark-style interval string — single units
    ('30 minutes') and compounds ('1 hour 30 minutes'), matching the
    grammar ``withWatermark`` accepts for the same string: parsing is
    CASE-INSENSITIVE ('30 Minutes') like Spark's interval parser
    (round-12 ADVICE). Additionally accepts common abbreviations (ms,
    sec/s, min/m, h, d, w) as a convenience SUPERSET — note
    ``withWatermark`` itself rejects those (verified on Spark 4.1.2),
    so the sole caller passes the same string to both and an
    abbreviation will fail there with Spark's own parse error. Single
    source of truth for the session gap: the old twin defaults
    (gap='30 minutes' AND gap_ms=1800000) could silently drift
    (round-11 ADVICE)."""
    import re

    unit_ms = {
        "millisecond": 1,
        "msec": 1,
        "ms": 1,
        "second": 1000,
        "sec": 1000,
        "s": 1000,
        "minute": 60_000,
        "min": 60_000,
        "m": 60_000,
        "hour": 3_600_000,
        "h": 3_600_000,
        "day": 86_400_000,
        "d": 86_400_000,
        "week": 604_800_000,
        "w": 604_800_000,
    }
    # longest spellings first so 'ms' doesn't eat the 'm' of 'minute'
    unit_re = (
        "milliseconds?|msecs?|ms|seconds?|secs?|minutes?|mins?|"
        "hours?|days?|weeks?|[smhdw]"
    )
    pairs = re.findall(rf"(\d+)\s*({unit_re})", interval, re.IGNORECASE)
    # every character must belong to a recognized pair — reject
    # partial matches like '3 fortnights' (which contains no pair) or
    # '5 minutes and a bit' (trailing junk)
    consumed = re.fullmatch(
        rf"\s*(?:(?:\d+)\s*(?:{unit_re})\s*)+", interval, re.IGNORECASE
    )
    if not pairs or not consumed:
        raise ValueError(f"unsupported interval string: {interval!r}")
    def _ms(u: str) -> int:
        # exact spelling first so 'ms'/'s' don't lose their trailing
        # 's' to plural-stripping ('ms' is NOT the plural of 'm')
        lu = u.lower()
        return unit_ms[lu] if lu in unit_ms else unit_ms[lu[:-1]]

    return sum(int(n) * _ms(u) for n, u in pairs)


def event_time_user_sessions(
    events_stream: DataFrame,
    gap: str = "30 minutes",
) -> DataFrame:
    """Watermark-closed per-user sessions with arbitrary state — the
    EventTimeTimeout timer class. ``events_stream`` needs (ts, user_id,
    value); the watermark on ``ts`` drives both late-row admission and
    the session-closing timers. The timer offset is DERIVED from
    ``gap`` so watermark delay and session gap cannot drift apart."""
    gap_ms = _interval_ms(gap)
    return (
        events_stream.withWatermark("ts", gap)
        .select("ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_event_time_session(gap_ms),
            outputStructType=ET_SESSION_OUTPUT,
            stateStructType=ET_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
