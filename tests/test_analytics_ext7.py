"""Unit tests for the wave-7 analytics extensions: daily growth
accounting (classification identities on a crafted timeline), the
naive-Bayes language classifier (perfect separation on a crafted
corpus, deterministic tie-break), and the dimension-truncation
retrieval evaluation (degenerate-truncation law)."""

from __future__ import annotations

from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.plans import analytics_ext7 as AX7


def _patched(monkeypatch, tables):
    monkeypatch.setattr(
        AX7, "load_table", lambda spark, d, name: tables[name]
    )


# ---------- growth accounting ----------

def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, f"2024-01-{d:02d} 12:00:00", u, "view", 1.0, "{}")
            for i, (u, d) in enumerate(rows)
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_growth_accounting_crafted_timeline(spark, monkeypatch):
    # u1: days 1,2,3 (new, retained, retained)
    # u2: days 1,3   (new, resurrected; churned on day 2)
    # u3: day 2 only (new on 2; churned on 3)
    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 3), (3, 2)]
    _patched(monkeypatch, {"events": _events(spark, rows)})
    out = {
        str(r.day): r.asDict()
        for r in AX7.user_growth_accounting(spark, "x").collect()
    }
    d1, d2, d3 = (
        out["2024-01-01"],
        out["2024-01-02"],
        out["2024-01-03"],
    )
    assert (d1["dau"], d1["n_new"], d1["n_churned"]) == (2, 2, 0)
    assert (
        d2["dau"], d2["n_new"], d2["n_retained"], d2["n_resurrected"],
        d2["n_churned"],
    ) == (2, 1, 1, 0, 1)  # u2 churned from day 1
    assert (
        d3["dau"], d3["n_new"], d3["n_retained"], d3["n_resurrected"],
        d3["n_churned"],
    ) == (2, 0, 1, 1, 1)  # u3 churned from day 2
    # the accounting identities hold on every day
    for d in out.values():
        assert d["dau"] == d["n_new"] + d["n_retained"] + d["n_resurrected"]


def test_growth_accounting_identities_on_driver_data(spark, sf_dir):
    rows = sorted(
        AX7.user_growth_accounting(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert len(rows) > 1  # non-degenerate: multiple periods
    assert sum(r.n_churned for r in rows) > 0  # real churn dynamics
    prev = None
    for r in rows:
        assert r.dau == r.n_new + r.n_retained + r.n_resurrected
        if prev is not None and (r.day - prev.day).days == 1:
            assert r.n_churned == prev.dau - r.n_retained
        prev = r


# ---------- naive Bayes ----------

def test_naive_bayes_separable_corpus(spark, monkeypatch):
    docs = []
    for i in range(10):
        docs.append((i, "alpha beta alpha gamma", "en", "web", 10))
    for i in range(10, 20):
        docs.append((i, "zeta eta zeta theta", "fr", "web", 10))
    d = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    _patched(monkeypatch, {"documents": d})
    out = {
        (r.labeled_lang, r.predicted_lang): r.n_docs
        for r in AX7.text_naive_bayes_langid(spark, "x").collect()
    }
    # perfectly separable vocabularies -> perfect diagonal
    assert out == {("en", "en"): 10, ("fr", "fr"): 10}


def test_naive_bayes_tie_breaks_to_first_lang(spark, monkeypatch):
    # identical class-conditional distributions -> every class scores
    # equally on every doc; the argmax must deterministically pick the
    # lexicographically first language
    docs = [
        (1, "same same words", "b_lang", "web", 10),
        (2, "same same words", "a_lang", "web", 10),
    ]
    d = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    _patched(monkeypatch, {"documents": d})
    out = {
        (r.labeled_lang, r.predicted_lang)
        for r in AX7.text_naive_bayes_langid(spark, "x").collect()
    }
    assert out == {("a_lang", "a_lang"), ("b_lang", "a_lang")}


# ---------- dimension truncation ----------

def test_dim_truncation_full_width_is_perfect(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(AX7, "TRUNC_DIMS", 64)
    out = AX7.ann_dim_truncation_recall(spark, sf_dir).collect()
    assert len(out) == 10
    assert all(r.recall_at_k == 1.0 for r in out)


def test_dim_truncation_recall_bounds(spark, sf_dir):
    out = AX7.ann_dim_truncation_recall(spark, sf_dir).collect()
    assert len(out) == 10
    for r in out:
        assert 0 <= r.n_overlap <= AX7.TRUNC_K
        assert abs(r.recall_at_k - r.n_overlap / AX7.TRUNC_K) < 1e-9


# ---------- Wilson ranking ----------

def test_wilson_small_sample_does_not_outrank(spark, monkeypatch):
    # 3/3 raw share 1.0 vs 95/100 raw share 0.95: Wilson LB must put
    # the large sample first
    cust = spark.createDataFrame(
        [(i, f"c{i}", 1, 9000.0 if i < 95 else 100.0, "B", "x", "y", "z")
         for i in range(100)]
        + [(100 + i, f"d{i}", 2, 9000.0, "B", "x", "y", "z")
           for i in range(3)],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string, c_address string,"
        " c_phone string, c_comment string",
    )
    nat = spark.createDataFrame(
        [(1, "BIG", 0, ""), (2, "TINY", 0, "")],
        "n_nationkey long, n_name string, n_regionkey long,"
        " n_comment string",
    )
    _patched(monkeypatch, {"customer": cust, "nation": nat})
    out = {r.n_name: r for r in AX7.nation_wilson_ranking(spark, "x").collect()}
    assert out["TINY"].raw_share == 1.0 and out["BIG"].raw_share == 0.95
    assert out["BIG"].rank == 1 and out["TINY"].rank == 2
    for r in out.values():
        assert 0.0 <= r.wilson_lb <= r.raw_share


# ---------- ANOVA ----------

def test_anova_identical_groups_f_zero(spark, monkeypatch):
    rows = [(i, 1, 1, 1, 2.0, 100.0, 0.0, 0.0, flag, "O", "1995-01-01")
            for i in range(60) for flag in ("A", "N", "R")]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    )
    _patched(monkeypatch, {"lineitem": li})
    r = AX7.lineitem_returnflag_anova(spark, "x").collect()[0]
    assert r.k == 3 and r.n_total == 180
    assert r.grand_mean == 100.0
    assert r.f_stat is None and r.eta_squared is None  # 0/0: NULL-guarded


def test_anova_hand_computed(spark, monkeypatch):
    # groups: A -> [10, 20], N -> [30, 40]; grand mean 25
    # SSB = 2*(15-25)^2 + 2*(35-25)^2 = 400; SSW = 50+50 = 100
    # F = (400/1) / (100/2) = 8.0
    rows = [
        (1, "A", 10.0), (2, "A", 20.0), (3, "N", 30.0), (4, "N", 40.0),
    ]
    li = spark.createDataFrame(
        [(i, 1, 1, 1, 2.0, p, 0.0, 0.0, f, "O", "1995-01-01")
         for i, f, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    )
    _patched(monkeypatch, {"lineitem": li})
    r = AX7.lineitem_returnflag_anova(spark, "x").collect()[0]
    assert (r.k, r.n_total) == (2, 4)
    assert r.grand_mean == 25.0
    assert r.f_stat == 8.0
    assert r.eta_squared == 0.8  # 400 / (400 + 100)


# ---------- Mahalanobis outliers ----------

def test_mahalanobis_planted_outlier_ranks_first(spark, monkeypatch):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-0.1, 0.1) for _ in range(64)])
        for i in range(50)
    ]
    rows.append((99, [5.0] * 64))  # the planted outlier
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    _patched(monkeypatch, {"embeddings": emb})
    out = AX7.embedding_mahalanobis_outliers(spark, "x").collect()
    assert out[0].rank == 1 and out[0].vec_id == 99
    assert all(r.mahalanobis_sq >= 0 for r in out)
    assert out[0].mahalanobis_sq > 10 * out[1].mahalanobis_sq


def test_mahalanobis_constant_dim_does_not_throw(spark, monkeypatch):
    # one dimension constant across the corpus: variance 0 -> the 1e-9
    # floor must prevent an ANSI divide-by-zero
    emb = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    _patched(monkeypatch, {"embeddings": emb})
    out = AX7.embedding_mahalanobis_outliers(spark, "x").collect()
    assert len(out) == 10


# ---------- seasonal-naive backtest ----------

def _orders(spark, rows):
    return spark.createDataFrame(
        [(i, ck, "O", p, d, "1-URGENT", "c", 0, "x")
         for i, (ck, d, p) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string,"
        " o_orderpriority string, o_clerk string, o_shippriority int,"
        " o_comment string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))


def test_seasonal_naive_perfect_repeat_gives_zero_mape(spark, monkeypatch):
    rows = [
        (1, "1995-03-15", 100.0), (1, "1996-03-15", 100.0),
        (1, "1995-07-01", 40.0), (1, "1996-07-01", 40.0),
    ]
    cust = spark.createDataFrame(
        [(1, "c1", 5, 0.0, "B", "a", "p", "c")],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string, c_address string,"
        " c_phone string, c_comment string",
    )
    nat = spark.createDataFrame(
        [(5, "ETHIOPIA", 0, "")],
        "n_nationkey long, n_name string, n_regionkey long,"
        " n_comment string",
    )
    _patched(monkeypatch, {
        "orders": _orders(spark, rows), "customer": cust, "nation": nat,
    })
    out = AX7.nation_seasonal_naive_backtest(spark, "x").collect()
    assert len(out) == 1
    assert out[0].n_backtests == 2 and out[0].mape == 0.0


def test_seasonal_naive_hand_computed_mape(spark, monkeypatch):
    # 1995-03: 100 -> 1996-03: 125 (APE 0.2); 1995-07: 50 -> 1996-07: 40
    # (APE 0.25); MAPE = 0.225
    rows = [
        (1, "1995-03-15", 100.0), (1, "1996-03-20", 125.0),
        (1, "1995-07-01", 50.0), (1, "1996-07-09", 40.0),
    ]
    cust = spark.createDataFrame(
        [(1, "c1", 5, 0.0, "B", "a", "p", "c")],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string, c_address string,"
        " c_phone string, c_comment string",
    )
    nat = spark.createDataFrame(
        [(5, "KENYA", 0, "")],
        "n_nationkey long, n_name string, n_regionkey long,"
        " n_comment string",
    )
    _patched(monkeypatch, {
        "orders": _orders(spark, rows), "customer": cust, "nation": nat,
    })
    out = AX7.nation_seasonal_naive_backtest(spark, "x").collect()
    assert out[0].n_backtests == 2
    assert out[0].mape == 0.225


# ---------- KS test ----------

def _cust(spark, rows):
    return spark.createDataFrame(
        [(i, f"c{i}", 1, bal, seg, "a", "p", "c")
         for i, (seg, bal) in enumerate(rows)],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string, c_address string,"
        " c_phone string, c_comment string",
    )


def test_ks_identical_distributions_d_zero(spark, monkeypatch):
    rows = [("BUILDING", float(v)) for v in (1, 2, 3, 4)] + [
        ("MACHINERY", float(v)) for v in (1, 2, 3, 4)
    ]
    _patched(monkeypatch, {"customer": _cust(spark, rows)})
    r = AX7.customer_balance_ks_test(spark, "x").collect()[0]
    assert (r.n1, r.n2, r.d_num, r.d_stat) == (4, 4, 0, 0.0)


def test_ks_disjoint_supports_d_one(spark, monkeypatch):
    rows = [("BUILDING", float(v)) for v in (1, 2, 3)] + [
        ("MACHINERY", float(v)) for v in (10, 11)
    ]
    _patched(monkeypatch, {"customer": _cust(spark, rows)})
    r = AX7.customer_balance_ks_test(spark, "x").collect()[0]
    assert r.d_stat == 1.0  # all of A is below all of B


def test_ks_hand_computed(spark, monkeypatch):
    # A = {1, 3}, B = {2, 4}: at v=1 |1/2-0|=.5; v=2 |1/2-1/2|=0;
    # v=3 |1-1/2|=.5; v=4 0 -> D = 0.5
    rows = [("BUILDING", 1.0), ("BUILDING", 3.0),
            ("MACHINERY", 2.0), ("MACHINERY", 4.0)]
    _patched(monkeypatch, {"customer": _cust(spark, rows)})
    r = AX7.customer_balance_ks_test(spark, "x").collect()[0]
    assert (r.n1, r.n2) == (2, 2)
    assert r.d_num == 2 and r.d_stat == 0.5


# ---------- Jensen–Shannon divergence ----------

def test_jsd_uniform_source_is_zero_and_disjoint_is_ln2_bounded(
    spark, monkeypatch
):
    import math

    # source A and the corpus share one distribution -> JSD(A) small;
    # source B uses a disjoint vocabulary -> JSD(B) large (<= ln 2)
    docs = (
        [(i, "alpha beta gamma", "ell", "srcA", 10) for i in range(20)]
        + [(100 + i, "zeta eta theta", "ell", "srcB", 10)
           for i in range(2)]
    )
    d = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    _patched(monkeypatch, {"documents": d})
    out = {r.source: r.jsd for r in
           AX7.text_source_js_divergence(spark, "x").collect()}
    assert 0.0 <= out["srcA"] < 0.05  # dominates the corpus -> near 0
    assert out["srcB"] > out["srcA"]
    assert out["srcB"] <= math.log(2) + 1e-9


def test_jsd_single_source_exactly_zero(spark, monkeypatch):
    d = spark.createDataFrame(
        [(1, "one two three", "ell", "only", 10),
         (2, "one two two", "ell", "only", 10)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    _patched(monkeypatch, {"documents": d})
    out = AX7.text_source_js_divergence(spark, "x").collect()
    assert len(out) == 1 and out[0].jsd == 0.0
