"""Join-strategy hints: the engine can force each physical join
implementation when the optimizer's default is not the right call at a
given scale (broadcast a dim AQE under-estimates, shuffle-hash to avoid
a sort on huge uniform keys, merge for sorted bucketed inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def sides(spark):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), F.sha1(F.col("id").cast("string")).alias("w")
    )
    return left, right


def test_broadcast_hint(spark, sides):
    left, right = sides
    plan = _physical(left.join(right.hint("broadcast"), "k"))
    assert "BroadcastHashJoin" in plan


def test_shuffle_hash_hint(spark, sides):
    left, right = sides
    plan = _physical(left.join(right.hint("shuffle_hash"), "k"))
    assert "ShuffledHashJoin" in plan


def test_merge_hint(spark, sides):
    left, right = sides
    plan = _physical(left.join(right.hint("merge"), "k"))
    assert "SortMergeJoin" in plan


def test_hints_do_not_change_results(spark, sides):
    left, right = sides
    base = sorted(map(tuple, left.join(right, "k").collect()))
    for h in ("broadcast", "shuffle_hash", "merge"):
        assert sorted(map(tuple, left.join(right.hint(h), "k").collect())) == base
