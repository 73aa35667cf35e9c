"""Unit tests for the wave-4 analytics extensions: Misra-Gries heavy
hitters (the no-miss guarantee under adversarial partitioning), the
inverted-index builder, aggregate-view IVM, and the chi-square
independence statistic."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.plans import analytics_ext4 as AX4


def _patched(monkeypatch, tables):
    monkeypatch.setattr(
        AX4, "load_table", lambda spark, d, name: tables[name]
    )


# ---------- Misra-Gries heavy hitters ----------

def test_mg_partition_kernel_keeps_heavy_key():
    # force a tiny sketch so the decrement path actually runs
    batches = [
        pd.DataFrame({"user_id": [1] * 60 + [2] * 5 + [3] * 5}),
        pd.DataFrame({"user_id": [1] * 40 + [4] * 3 + [5] * 2}),
    ]
    out = list(AX4._mg_partition_fn(2)(iter(batches)))[0]
    # key 1 holds 100 of 115 rows; MG with K=2 must retain it
    assert 1 in set(out["user_id"])
    assert len(out) <= 2


def test_heavy_hitters_match_exact_counts(spark, monkeypatch):
    # One user owns ~50% of rows, 400 cold users share the rest, and the
    # sketch is forced small enough that the decrement path FIRES inside
    # real partitions (per-partition distinct keys ~200 > K=120) while
    # still honoring the guarantee (K+1 = 121 >= 1/phi = 100). This is
    # the end-to-end eviction proof: exactness must survive evictions,
    # not just the no-eviction uniform driver data.
    monkeypatch.setattr(AX4, "HH_PHI", 0.01)
    monkeypatch.setattr(AX4, "HH_SKETCH_K", 120)
    rows = [(i, 1) for i in range(500)] + [
        (500 + i, 2 + (i % 400)) for i in range(500)
    ]
    e = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", u, "view", 1.0, "{}")
         for i, u in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).repartition(2)
    _patched(monkeypatch, {"events": e})
    # prove evictions actually happened: the candidate union is smaller
    # than the 401 distinct keys (2 partitions x K=120 caps it at 240)
    n_candidates = (
        e.select("user_id")
        .mapInPandas(AX4._mg_partition_fn(120), "user_id long")
        .distinct()
        .count()
    )
    assert n_candidates < 401, "sketch never evicted; test lost its point"
    out = {
        r.user_id: r.n_events
        for r in AX4.event_heavy_hitters_mg(spark, "x").collect()
    }
    assert out[1] == 500
    # every reported count is the true exact count
    exact = {
        r.user_id: r.c
        for r in e.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    for u, n in out.items():
        assert exact[u] == n and n > 10  # 1% of 1000


def test_heavy_hitters_emit_rows_on_driver_data(spark, sf_dir):
    # Regression for the round-6 vacuous-oracle finding: at the shipped
    # HH_PHI the query must emit rows on the uniform driver data so the
    # strict oracle compares real thresholds/shares, not empty sets.
    out = AX4.event_heavy_hitters_mg(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 < r.share <= 1.0


def test_heavy_hitters_partitioning_invariant(spark, sf_dir):
    base = {
        (r.user_id, r.n_events)
        for r in AX4.event_heavy_hitters_mg(spark, sf_dir).collect()
    }
    from investcloud_data_pipeline_spark.sources.batch import load_table

    orig = AX4.load_table
    try:
        AX4.load_table = lambda s, d, n: load_table(s, d, n).repartition(7)
        skewed = {
            (r.user_id, r.n_events)
            for r in AX4.event_heavy_hitters_mg(spark, sf_dir).collect()
        }
    finally:
        AX4.load_table = orig
    assert base == skewed


# ---------- inverted index ----------

def test_inverted_index_crafted_postings(spark, monkeypatch):
    monkeypatch.setattr(AX4, "MIN_DF", 2)
    monkeypatch.setattr(AX4, "POSTINGS_CAP", 2)
    d = spark.createDataFrame(
        [
            (1, "Apple banana! apple", "en", "web", 10),
            (2, "banana cherry", "en", "web", 10),
            (3, "apple DATE date", "en", "web", 10),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    _patched(monkeypatch, {"documents": d})
    out = {
        r.term: (r.df, r.postings)
        for r in AX4.documents_inverted_index(spark, "x").collect()
    }
    # 'apple' in docs 1 and 3 (dedup within doc 1); 'banana' in 1, 2;
    # 'cherry'/'date' fall under MIN_DF=2
    assert out == {"apple": (2, "1,3"), "banana": (2, "1,2")}


def test_inverted_index_cap_and_order(spark, monkeypatch):
    monkeypatch.setattr(AX4, "MIN_DF", 3)
    monkeypatch.setattr(AX4, "POSTINGS_CAP", 2)
    d = spark.createDataFrame(
        [(i, "zebra", "en", "web", 5) for i in (9, 3, 7)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    _patched(monkeypatch, {"documents": d})
    r = AX4.documents_inverted_index(spark, "x").collect()[0]
    assert r.df == 3
    assert r.postings == "3,7"  # sorted ascending, capped at 2


def test_inverted_index_df_matches_postings_floor(spark, sf_dir):
    out = AX4.documents_inverted_index(spark, sf_dir)
    bad = out.filter(
        F.size(F.split("postings", ",")) !=
        F.least(F.col("df"), F.lit(AX4.POSTINGS_CAP))
    ).count()
    assert bad == 0


# ---------- aggregate IVM ----------

def test_ivm_agg_equals_full_recompute(spark, sf_dir):
    merged = AX4.ivm_agg_delta(spark, sf_dir)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    full = (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("balance"),
        )
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


# ---------- chi-square ----------

def _cust(spark, rows):
    return spark.createDataFrame(
        [(i + 1, f"c{i}", nk, 0.0, seg) for i, (nk, seg) in enumerate(rows)],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )


def test_chisq_zero_under_exact_independence(spark, monkeypatch):
    # perfectly proportional 2x2 table -> expected == observed
    rows = (
        [(0, "A")] * 20 + [(0, "B")] * 10
        + [(1, "A")] * 40 + [(1, "B")] * 20
    )
    _patched(monkeypatch, {"customer": _cust(spark, rows)})
    r = AX4.customer_segment_nation_chisq(spark, "x").collect()[0]
    assert r.chi_square == 0.0
    assert r.dof == 1
    assert r.cramers_v == 0.0


def test_chisq_hand_computed_2x2(spark, monkeypatch):
    # table [[10, 20], [20, 10]]: n=60, all expected = 15,
    # X^2 = 4 * 25/15 = 6.666667; V = sqrt(6.666667/60) = 0.333333
    rows = (
        [(0, "A")] * 10 + [(0, "B")] * 20
        + [(1, "A")] * 20 + [(1, "B")] * 10
    )
    _patched(monkeypatch, {"customer": _cust(spark, rows)})
    r = AX4.customer_segment_nation_chisq(spark, "x").collect()[0]
    assert r.chi_square == 6.666667
    assert r.dof == 1
    assert r.cramers_v == 0.333333
