"""Unit tests for operators/binning.approx_quantile_bins — the
percentile_approx-edge alternative to exact ntile's single-partition
sort (round-7 verdict task #2)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.operators.binning import (
    approx_quantile_bins,
)


def _scores(spark, n=1000, parts=8):
    # distinct, shuffled-order scores so bin edges are unambiguous
    return spark.range(n).select(
        F.col("id").alias("rid"),
        ((F.col("id") * 611) % n).cast("double").alias("score"),
    ).repartition(parts)


def test_bin_populations_near_equal_and_order_consistent(spark):
    df = approx_quantile_bins(_scores(spark), "score", 10, bin_col="b")
    rows = df.select("score", "b").collect()
    pops: dict[int, int] = {}
    for r in rows:
        pops[r.b] = pops.get(r.b, 0) + 1
    assert set(pops) == set(range(1, 11))
    for b, n in pops.items():
        assert 80 <= n <= 120, pops  # 1000/10 ± 20%
    # ascending orientation: higher score -> same or later bin
    by_score = sorted(rows, key=lambda r: r.score)
    bins = [r.b for r in by_score]
    assert bins == sorted(bins)


def test_descending_is_mirror_of_ascending(spark):
    base = _scores(spark, n=500)
    asc = approx_quantile_bins(base, "score", 10, bin_col="a")
    desc = approx_quantile_bins(
        base, "score", 10, descending=True, bin_col="d"
    )
    j = asc.join(desc, "rid").select("a", "d").collect()
    # same edges, mirrored orientation: a + d == n_bins + 1 everywhere
    assert all(r.a + r.d == 11 for r in j)


def test_partitioning_invariance(spark):
    a = {
        (r.rid, r.b)
        for r in approx_quantile_bins(
            _scores(spark, parts=3), "score", 7, bin_col="b"
        ).collect()
    }
    b = {
        (r.rid, r.b)
        for r in approx_quantile_bins(
            _scores(spark, parts=17), "score", 7, bin_col="b"
        ).collect()
    }
    assert a == b


def test_tracks_exact_ntile_within_one_bin(spark):
    # with distinct values and accuracy >> n the sketch is near-exact;
    # every row's approx bin may differ from exact ntile only at a
    # boundary (off by at most 1)
    base = _scores(spark, n=800)
    approx = approx_quantile_bins(base, "score", 10, bin_col="ab")
    exact = base.withColumn(
        "eb", F.ntile(10).over(Window.orderBy("score", "rid"))
    )
    j = approx.join(exact, "rid").select("ab", "eb").collect()
    assert all(abs(r.ab - r.eb) <= 1 for r in j)
    agree = sum(1 for r in j if r.ab == r.eb)
    assert agree >= 0.95 * len(j)


def test_rejects_degenerate_bins(spark):
    with pytest.raises(ValueError):
        approx_quantile_bins(_scores(spark), "score", 1)
