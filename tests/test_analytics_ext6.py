"""Unit tests for the wave-6 analytics extensions: cohort LTV,
seasonality profile, and interarrival burstiness."""

from __future__ import annotations

from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.plans import analytics_ext6 as AX6


def _patched(monkeypatch, tables):
    monkeypatch.setattr(
        AX6, "load_table", lambda spark, d, name: tables[name]
    )


def _orders(spark, rows):
    return spark.createDataFrame(
        [
            (i + 1, ck, "O", float(rev), d, "1-URGENT")
            for i, (ck, d, rev) in enumerate(rows)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string,"
        " o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))


# ---------- cohort LTV ----------

def test_cohort_ltv_crafted_matrix(spark, monkeypatch):
    # two customers cohorted in Jan-1995 (one also buys in Feb), one
    # cohorted in Feb-1995
    rows = [
        (1, "1995-01-10", 100.0),
        (2, "1995-01-20", 50.0),
        (1, "1995-02-05", 30.0),
        (3, "1995-02-11", 70.0),
    ]
    _patched(monkeypatch, {"orders": _orders(spark, rows)})
    out = {
        (r.cohort_mo, r.month_offset): (
            r.n_cohort,
            r.period_revenue,
            r.cum_revenue,
            r.ltv_per_customer,
        )
        for r in AX6.customer_cohort_ltv(spark, "x").collect()
    }
    jan = 1995 * 12 + 0
    feb = jan + 1
    assert out[(jan, 0)] == (2, 150.0, 150.0, 75.0)
    assert out[(jan, 1)] == (2, 30.0, 180.0, 90.0)
    assert out[(feb, 0)] == (1, 70.0, 70.0, 70.0)


def test_cohort_ltv_cumulative_is_monotone(spark, sf_dir):
    out = AX6.customer_cohort_ltv(spark, sf_dir)
    w_bad = out.filter(
        F.col("cum_revenue") < F.col("period_revenue")
    ).count()
    assert w_bad == 0
    # offset-0 rows exist for every cohort and cum == period there
    z = out.filter(F.col("month_offset") == 0)
    assert z.filter(F.col("cum_revenue") != F.col("period_revenue")).count() == 0


# ---------- seasonality ----------

def test_seasonality_shares_and_iso_dow(spark, monkeypatch):
    # 1995-01-02 is a Monday; 1995-01-08 a Sunday
    e = spark.createDataFrame(
        [
            (1, "1995-01-02 09:00:00", 1, "view", 2.0, "{}"),
            (2, "1995-01-02 09:30:00", 1, "view", 4.0, "{}"),
            (3, "1995-01-08 23:10:00", 2, "view", 6.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    _patched(monkeypatch, {"events": e})
    out = {
        (r.iso_dow, r.hour): (r.n_events, r.mean_value, r.share)
        for r in AX6.event_hourly_seasonality(spark, "x").collect()
    }
    assert out[(1, 9)] == (2, 3.0, 0.666667)
    assert out[(7, 23)] == (1, 6.0, 0.333333)


def test_seasonality_shares_sum_to_one(spark, sf_dir):
    out = AX6.event_hourly_seasonality(spark, sf_dir)
    s = out.agg(F.round(F.sum("share"), 3)).collect()[0][0]
    assert s == 1.0
    n = out.agg(F.sum("n_events")).collect()[0][0]
    from investcloud_data_pipeline_spark.sources.batch import load_table

    assert n == load_table(spark, sf_dir, "events").count()


# ---------- interarrival ----------

def test_interarrival_crafted_moments(spark, monkeypatch):
    # gaps 10, 20, 30 seconds: mean 20, sample sd 10, cv 0.5
    e = spark.createDataFrame(
        [
            (1, "1995-01-01 00:00:00", 1, "a", 0.0, "{}"),
            (2, "1995-01-01 00:00:10", 1, "a", 0.0, "{}"),
            (3, "1995-01-01 00:00:30", 1, "a", 0.0, "{}"),
            (4, "1995-01-01 00:01:00", 1, "a", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    _patched(monkeypatch, {"events": e})
    r = AX6.event_interarrival_stats(spark, "x").collect()[0]
    assert (r.n_gaps, r.mean_gap_s, r.sd_gap_s, r.cv) == (3, 20.0, 10.0, 0.5)


def test_interarrival_nulls_below_min_gaps(spark, monkeypatch):
    e = spark.createDataFrame(
        [
            (1, "1995-01-01 00:00:00", 1, "a", 0.0, "{}"),
            (2, "1995-01-01 00:00:10", 1, "a", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    _patched(monkeypatch, {"events": e})
    r = AX6.event_interarrival_stats(spark, "x").collect()[0]
    assert r.n_gaps == 1 and r.sd_gap_s is None and r.cv is None


def test_interarrival_cv_nonnegative_on_real_data(spark, sf_dir):
    out = AX6.event_interarrival_stats(spark, sf_dir)
    assert out.filter(F.col("cv") < 0).count() == 0
    assert out.filter(F.col("mean_gap_s") < 0).count() == 0
