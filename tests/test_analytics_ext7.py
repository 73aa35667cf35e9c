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
