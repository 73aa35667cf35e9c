"""Unit tests for the round-5 analytics additions: RFM segmentation,
association-rule lift, per-group OLS regression, OHLC resampling,
containment dedup, and weighted sampling — crafted inputs with
hand-computed expected values."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.operators.dedup_fuzzy import (
    ngram_containment_pairs,
)
from investcloud_data_pipeline_spark.plans.mining import (
    copurchase_rules_lift,
    customer_rfm_segments,
    regression_value_by_hour,
)
from investcloud_data_pipeline_spark.plans.temporal import event_ohlc_hourly
from investcloud_data_pipeline_spark.plans.training_data import (
    corpus_weighted_sample,
)


def test_containment_catches_quote_inside_long_doc(spark):
    quote = "the five boxing wizards jump quickly over the frozen lake"
    long_doc = (
        "in a completely unrelated preamble about weather patterns "
        + quote
        + " followed by a long discussion of agricultural policy and "
        "irrigation schedules in the northern provinces"
    )
    df = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "nothing in common here at all")],
        "doc_id long, text string",
    )
    rows = ngram_containment_pairs(df, threshold=0.9).collect()
    # Every shingle of the quote appears in the long doc -> containment 1.0;
    # Jaccard for the same pair is far below any dedup threshold.
    assert [(r.id1, r.id2, r.containment) for r in rows] == [(1, 2, 1.0)]
    from investcloud_data_pipeline_spark.operators.dedup_fuzzy import (
        ngram_jaccard_pairs,
    )
    jac = ngram_jaccard_pairs(df, threshold=0.0).collect()
    j12 = [r.jaccard for r in jac if (r.id1, r.id2) == (1, 2)]
    assert j12 and j12[0] < 0.5  # jaccard-only dedup would miss this pair


def test_containment_symmetric_sizes_use_smaller_side(spark):
    # identical docs: containment exactly 1.0 regardless of direction
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    rows = ngram_containment_pairs(df, threshold=0.9).collect()
    assert [(r.id1, r.id2, r.containment) for r in rows] == [(1, 2, 1.0)]


def test_weighted_sample_deterministic_and_bounded(spark, sf_dir):
    a = corpus_weighted_sample(spark, sf_dir).collect()
    b = corpus_weighted_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # retry-stable
    per_source: dict[str, int] = {}
    for r in a:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert per_source and all(n <= 15 for n in per_source.values())


def test_weighted_sample_prefers_heavier_docs(spark):
    # One source, extreme weight spread: the heavy docs should dominate
    # the k=15 sample (P[tiny doc beats huge doc] ~ w_small/w_total).
    rows = [(i, "x", "s", 1_000_000 if i < 20 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    df.createOrReplaceTempView("documents")
    # call the df-level math directly via the plan on a temp dir is not
    # possible (plan reads parquet), so restate the A-ES key here — this
    # pins the formula's bias direction, not the plan wiring (the plan
    # wiring is pinned by the oracle).
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key = -F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    top = df.select("doc_id", key.alias("k")).orderBy("k").limit(15).collect()
    heavy = sum(1 for r in top if r.doc_id < 20)
    assert heavy >= 14  # heavy docs ~10^6 more likely per draw


def test_rfm_quartiles_deterministic_semantics(spark, sf_dir):
    out = customer_rfm_segments(spark, sf_dir)
    rows = out.collect()
    assert rows
    for c in ("r_score", "f_score", "m_score"):
        vals = {getattr(r, c) for r in rows}
        assert vals <= {1, 2, 3, 4}
    # r_score=4 must hold the most recent customers: every r4 recency
    # <= every r1 recency
    r4 = [r.recency_days for r in rows if r.r_score == 4]
    r1 = [r.recency_days for r in rows if r.r_score == 1]
    assert max(r4) <= min(r1)
    # m_score=4 holds the biggest spenders
    m4 = min(r.monetary for r in rows if r.m_score == 4)
    m1 = max(r.monetary for r in rows if r.m_score == 1)
    assert m4 >= m1


def test_rules_lift_hand_computed(spark, tmp_path):
    # 4 baskets: {A,B}, {A,B}, {A,C}, {B}
    lines = [
        (1, 101), (1, 102),
        (2, 101), (2, 102),
        (3, 101), (3, 103),
        (4, 102),
    ]
    df = spark.createDataFrame(lines, "l_orderkey long, l_partkey long")
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    # satisfy load_table's fixed schema surface by writing only lineitem
    out = {
        (r.antecedent, r.consequent): (r.pair_supp, r.confidence, r.lift)
        for r in copurchase_rules_lift_on(spark, str(tmp_path)).collect()
    }
    # A->B: supp(AB)=2, supp(A)=3, supp(B)=3, N=4
    assert out[(101, 102)] == (2, round(2 / 3, 6), round(2 / 3 * 4 / 3, 6))
    assert out[(102, 101)] == (2, round(2 / 3, 6), round(2 / 3 * 4 / 3, 6))
    # A->C infrequent (pair_supp 1 < 3? threshold filters it)
    assert (101, 103) not in out


def copurchase_rules_lift_on(spark, sf_dir):
    """The rules plan restated with min-support 2 (the production
    literal is 3, too strict for a 4-basket fixture; re-filtering after
    the fact cannot recover dropped rows, so the fixture rebinds the
    literal on the same plan shape)."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    op = l.select("l_orderkey", "l_partkey").distinct()
    n_baskets = op.agg(F.count_distinct("l_orderkey").alias("n_baskets"))
    item = op.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count("*").alias("supp")
    )
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("antecedent"),
            F.col("b.l_partkey").alias("consequent"),
        )
        .agg(F.count("*").alias("pair_supp"))
        .filter(F.col("pair_supp") >= 2)
    )
    sa = item.select(F.col("item").alias("antecedent"), F.col("supp").alias("supp_a"))
    sb = item.select(F.col("item").alias("consequent"), F.col("supp").alias("supp_b"))
    conf = F.col("pair_supp") / F.col("supp_a")
    lift = conf * F.col("n_baskets") / F.col("supp_b")
    return (
        pairs.join(sa, "antecedent")
        .join(sb, "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "pair_supp",
            F.round(conf, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )


def test_regression_recovers_exact_line(spark):
    # y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
    rows = [
        (i, dt.datetime(2024, 1, 1 + (i // 24), i % 24, 0, 0), 2.0 * (i % 24) + 1.0)
        for i in range(96)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    x = F.hour("ts").cast("double")
    out = df.agg(
        F.round(F.regr_slope("value", x), 6).alias("slope"),
        F.round(F.regr_intercept("value", x), 6).alias("intercept"),
        F.round(F.regr_r2("value", x), 6).alias("r2"),
    ).collect()[0]
    assert (out.slope, out.intercept, out.r2) == (2.0, 1.0, 1.0)


def test_regression_registry_matches_numpy(spark, sf_dir):
    import numpy as np

    out = {r.event_type: r for r in regression_value_by_hour(spark, sf_dir).collect()}
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.hour("ts").cast("double").alias("x"), "value"
    )
    pdf = e.toPandas()
    for et, g in pdf.groupby("event_type"):
        slope, intercept = np.polyfit(g.x.to_numpy(), g.value.to_numpy(), 1)
        assert math.isclose(out[et].slope, slope, abs_tol=1e-4)
        assert math.isclose(out[et].intercept, intercept, abs_tol=1e-4)


def test_ohlc_deterministic_open_close_on_ties(spark, tmp_path):
    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        # same microsecond: event_id breaks the tie -> open=1.0 (id 1)
        (1, t0, "u", "tick", 1.0, None),
        (2, t0, "u", "tick", 9.0, None),
        (3, t0 + dt.timedelta(minutes=30), "u", "tick", 5.0, None),
        # last microsecond of the hour -> close
        (4, t0 + dt.timedelta(minutes=59, seconds=59), "u", "tick", 7.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = event_ohlc_hourly(spark, str(tmp_path)).collect()
    assert len(out) == 1
    bar = out[0]
    assert (bar.open, bar.high, bar.low, bar.close, bar.volume) == (
        1.0,
        9.0,
        1.0,
        7.0,
        4,
    )


def test_bpe_first_merges_hand_counted(spark, tmp_path):
    import pandas as pd

    # corpus: "abab abab cd" -> word counts {abab:2, cd:1}
    # pairs: abab -> ab(×2... positions: ab, ba, ab) weighted 2
    #   => ab: 2*2=4, ba: 1*2=2, cd: 1
    pd.DataFrame(
        [(1, "abab ABAB cd", "en", "s", 12)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    from investcloud_data_pipeline_spark.plans.training_data import (
        text_bpe_first_merges,
    )

    out = {
        r.pair: (r.n_occurrences, r.rank)
        for r in text_bpe_first_merges(spark, str(tmp_path)).collect()
    }
    assert out == {"ab": (4, 1), "ba": (2, 2), "cd": (1, 3)}


def test_psi_drift_properties(spark, sf_dir):
    """PSI is a symmetrized KL: always >= 0; the drifted flag matches
    the 0.1 threshold; bucket edges assign correctly."""
    from investcloud_data_pipeline_spark.plans.mining import (
        PSI_EDGES,
        _psi_bucket,
        event_value_drift_psi,
    )
    from pyspark.sql import functions as F

    out = event_value_drift_psi(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.psi >= 0.0, r
        assert r.drifted == (r.psi > 0.1)
        assert r.n_ref > 0 and r.n_cur > 0

    probe = spark.createDataFrame(
        [(5.0,), (10.0,), (99.0,), (5000.0,)], "v double"
    ).select(_psi_bucket("v").alias("b")).collect()
    assert [r.b for r in probe] == [0, 1, 3, len(PSI_EDGES)]


def test_hll_sketch_merge_laws(spark, sf_dir):
    """Mergeable-HLL laws (operators/sketches.py): (1) shard-merge ≡
    whole-table sketch at fixed lgK regardless of HOW the data is
    sharded; (2) small cardinalities are exact (sparse mode); (3) the
    estimate stays within 3% of exact on the real events table."""
    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.operators.sketches import (
        distinct_via_sketch_merge,
    )
    from investcloud_data_pipeline_spark.sources.batch import load_table

    e = load_table(spark, sf_dir, "events")

    def est(shard_expr):
        out = distinct_via_sketch_merge(
            e.withColumn("shard", shard_expr), "user_id", ["event_type"],
            "shard", lgk=14,
        )
        return {r.event_type: r.distinct_est for r in out.collect()}

    by_month = est(F.date_trunc("month", F.col("ts")))
    by_day = est(F.to_date("ts"))
    by_hash = est(F.pmod(F.xxhash64("event_id"), F.lit(7)))
    assert by_month == by_day == by_hash  # merge is shard-agnostic

    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(by_month[t] - n) <= 0.03 * n, (t, by_month[t], n)

    # sparse mode: tiny distinct sets estimate EXACTLY
    small = spark.range(1000).select(
        (F.col("id") % 37).alias("v"), F.lit("g").alias("g"),
        (F.col("id") % 4).alias("shard"),
    )
    out = distinct_via_sketch_merge(small, "v", ["g"], "shard").collect()
    assert out[0].distinct_est == 37 and out[0].n_shards == 4


def test_event_transitions_hand_computed(spark, tmp_path):
    from investcloud_data_pipeline_spark.plans.mining import (
        event_type_transitions,
    )

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: view -> click -> purchase
        (1, t, 1, "view"),
        (2, t + s, 1, "click"),
        (3, t + 2 * s, 1, "purchase"),
        # user 2: view -> view
        (4, t, 2, "view"),
        (5, t + s, 2, "view"),
        # user 3: two events at the SAME instant — the unique event_id
        # breaks the tie (a before b), then b -> c
        (10, t, 3, "a"),
        (11, t, 3, "b"),
        (12, t + s, 3, "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.src_type, r.dst_type): (r.n, r.p)
        for r in event_type_transitions(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "purchase"): (1, 1.0),
        ("a", "b"): (1, 1.0),
        ("b", "c"): (1, 1.0),
    }


def test_user_event_paths_hand_computed(spark, tmp_path):
    from investcloud_data_pipeline_spark.plans.mining import (
        user_event_paths,
    )

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1, session 1: view > click > purchase
        (1, t, 1, "view"),
        (2, t + s, 1, "click"),
        (3, t + 2 * s, 1, "purchase"),
        # user 1, session 2 (90 min later): view > click > purchase again
        (4, t + h + h, 1, "view"),
        (5, t + h + h + s, 1, "click"),
        (6, t + h + h + 2 * s, 1, "purchase"),
        # user 2: single-event session
        (7, t, 2, "view"),
        # user 3: 7-event session — path truncates at 5 steps, and two
        # same-instant events order by event_id (10 before 11)
        (10, t, 3, "a"),
        (11, t, 3, "b"),
        (12, t + s, 3, "c"),
        (13, t + 2 * s, 3, "d"),
        (14, t + 3 * s, 3, "e"),
        (15, t + 4 * s, 3, "f"),
        (16, t + 5 * s, 3, "g"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.path: (r.path_len, r.n_sessions)
        for r in user_event_paths(spark, str(tmp_path)).collect()
    }
    assert got == {
        "view>click>purchase": (3, 2),
        "view": (1, 1),
        "a>b>c>d>e": (5, 1),
    }


def test_user_event_paths_conservation(spark, sf_dir):
    """Every session contributes exactly one path: sum(n_sessions) ==
    number of sessions from the shared 30-min-gap sessionizer, and no
    path exceeds PATH_MAX_STEPS."""
    from investcloud_data_pipeline_spark.plans.mining import (
        PATH_MAX_STEPS,
        user_event_paths,
    )
    from investcloud_data_pipeline_spark.plans.relational import (
        sessionize_events,
    )

    out = user_event_paths(spark, sf_dir)
    rows = out.collect()
    assert rows
    n_paths = sum(r.n_sessions for r in rows)
    n_sessions = sessionize_events(spark, sf_dir).count()
    assert n_paths == n_sessions
    for r in rows:
        assert 1 <= r.path_len <= PATH_MAX_STEPS
        assert r.path.count(">") == r.path_len - 1


def test_event_transitions_probabilities_sum_to_one(spark, sf_dir):
    from investcloud_data_pipeline_spark.plans.mining import (
        event_type_transitions,
    )

    out = event_type_transitions(spark, sf_dir)
    sums = (
        out.groupBy("src_type").agg(F.sum("p").alias("s")).collect()
    )
    assert sums
    # per-row rounding to 6dp can drift the sum by at most 0.5e-6 per row
    assert all(abs(r.s - 1.0) < 1e-4 for r in sums)


def test_item_cosine_hand_computed(spark, tmp_path):
    from investcloud_data_pipeline_spark.plans.mining import (
        copurchase_item_cosine,
    )

    # baskets: {A,B}, {A,B}, {A,C}, {B,C} -> n_A=3, n_B=3, n_C=2
    # cooc(A,B)=2, cooc(A,C)=1 (dropped by >=2), cooc(B,C)=1 (dropped)
    lines = [
        (1, 101), (1, 102),
        (2, 101), (2, 102),
        (3, 101), (3, 103),
        (4, 102), (4, 103),
    ]
    spark.createDataFrame(
        lines, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        (r.part, r.neighbor): (r.rnk, r.cooc, r.cosine)
        for r in copurchase_item_cosine(spark, str(tmp_path)).collect()
    }
    cos = round(2 / (3 * 3) ** 0.5, 6)
    assert got == {
        (101, 102): (1, 2, cos),
        (102, 101): (1, 2, cos),
    }


def test_rolling_zscore_flags_local_spike(spark, tmp_path):
    from investcloud_data_pipeline_spark.plans.temporal import (
        event_value_rolling_zscore,
    )

    t = dt.datetime(2024, 3, 1)
    s = dt.timedelta(minutes=1)
    rows = []
    # user 1: ten near-constant values then a huge spike -> flagged
    vals = [10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.0, 10.1, 9.9, 10.0, 500.0]
    for i, v in enumerate(vals):
        rows.append((i, t + i * s, 1, "view", v))
    # user 2: same spike but only 3 prior events -> below n_prev floor
    for i, v in enumerate([10.0, 10.1, 9.9, 500.0]):
        rows.append((100 + i, t + i * s, 2, "view", v))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = event_value_rolling_zscore(spark, str(tmp_path)).collect()
    assert [(r.event_id, r.user_id) for r in got] == [(10, 1)]
    assert got[0].zscore > 100


def test_supplier_hhi_known_concentrations(spark, tmp_path):
    from investcloud_data_pipeline_spark.plans.temporal import (
        supplier_part_hhi,
    )

    rows = [
        # part 1: single supplier -> hhi 1.0
        (1, 1, 11, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", dt.date(2024, 1, 1)),
        # part 2: two equal suppliers -> hhi 0.5
        (2, 2, 21, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", dt.date(2024, 1, 1)),
        (3, 2, 22, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", dt.date(2024, 1, 1)),
        # part 3: 80/20 split -> 0.64 + 0.04
        (4, 3, 31, 1, 1.0, 80.0, 0.0, 0.0, "N", "O", dt.date(2024, 1, 1)),
        (5, 3, 32, 1, 1.0, 20.0, 0.0, 0.0, "N", "O", dt.date(2024, 1, 1)),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r.l_partkey: (r.n_suppliers, r.revenue, r.hhi)
        for r in supplier_part_hhi(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (1, 100.0, 1.0),
        2: (2, 100.0, 0.5),
        3: (2, 100.0, 0.68),
    }


def test_pmi_separates_collocated_from_independent(spark, tmp_path):
    import math

    from investcloud_data_pipeline_spark.plans.training_data import (
        text_term_cooccurrence_pmi,
    )

    # 'aa bb' always together (5 docs); 'cc' with each of them only via
    # the 5 shared docs plus 5 solo docs each -> lower-than-predicted
    docs = []
    for i in range(5):
        docs.append((i, "aa bb cc"))
    for i in range(5, 10):
        docs.append((i, "cc dd"))
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.term1, r.term2): (r.n_ab, r.pmi)
        for r in text_term_cooccurrence_pmi(spark, str(tmp_path)).collect()
    }
    n = 10.0
    # aa,bb: df 5 each, together 5 -> pmi = ln(5*10/25) = ln 2
    assert got[("aa", "bb")] == (5, round(math.log(2), 6))
    # aa,cc / bb,cc: df_a 5, df_cc 10, n_ab 5 -> ln(50/50) = 0
    assert got[("aa", "cc")] == (5, 0.0)
    assert got[("bb", "cc")] == (5, 0.0)
    # cc,dd pairs: n_ab 5 -> ln(5*10/(10*5)) = 0; below-threshold pairs absent
    assert got[("cc", "dd")] == (5, 0.0)
    assert len(got) == 4


def test_active_shipments_sweep_line(spark, tmp_path):
    from investcloud_data_pipeline_spark.plans.temporal import (
        lineitem_active_shipments,
    )

    d0 = dt.date(2024, 1, 1)
    rows = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0),
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0 + dt.timedelta(days=3)),
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0 + dt.timedelta(days=3)),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        str(r.day): (r.net_change, r.active)
        for r in lineitem_active_shipments(spark, str(tmp_path)).collect()
    }
    # day0: +1 -> 1 active; day3: +2 -> 3; day7: first expires -> 2;
    # day10: remaining two expire -> 0
    assert got == {
        "2024-01-01": (1, 1),
        "2024-01-04": (2, 3),
        "2024-01-08": (-1, 2),
        "2024-01-11": (-2, 0),
    }


def test_abc_classes_partition_revenue(spark, sf_dir):
    from investcloud_data_pipeline_spark.plans.temporal import (
        part_revenue_abc,
    )

    rows = part_revenue_abc(spark, sf_dir).collect()
    assert rows
    by_share = sorted(rows, key=lambda r: r.cum_share)
    # cumulative share is monotone and ends at 1.0
    assert abs(by_share[-1].cum_share - 1.0) < 1e-6
    # class boundaries respect the 80/95 cuts
    for r in rows:
        if r.cum_share <= 0.80:
            assert r.abc_class == "A"
        elif r.cum_share <= 0.95:
            assert r.abc_class == "B"
        else:
            assert r.abc_class == "C"
    # revenue within class A rows dominates: every A row's revenue >=
    # every C row's revenue (rank order by construction)
    a_min = min((r.revenue for r in rows if r.abc_class == "A"), default=None)
    c_max = max((r.revenue for r in rows if r.abc_class == "C"), default=None)
    if a_min is not None and c_max is not None:
        assert a_min >= c_max


def test_ewma_hand_computed(spark, tmp_path):
    from investcloud_data_pipeline_spark.plans.temporal import (
        event_value_ewma,
    )

    t = dt.datetime(2024, 5, 1)
    s = dt.timedelta(minutes=1)
    rows = [(i, t + i * s, 1, "view", v) for i, v in enumerate([10.0, 20.0, 30.0])]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_id: r.ewma
        for r in event_value_ewma(spark, str(tmp_path)).collect()
    }

    def ewma(vals, a=0.5):
        n = len(vals)
        terms = [
            round(a * (1 - a) ** (n - k) * x / (1 - (1 - a) ** n), 9)
            for k, x in enumerate(vals, start=1)
        ]
        return round(sum(terms), 6)

    # truncated-renormalized EWMA: first row is the value itself
    assert got[0] == 10.0
    assert got[1] == ewma([10.0, 20.0])
    assert got[2] == ewma([10.0, 20.0, 30.0])


def test_order_parts_caps_hot_order(spark, tmp_path):
    """Skew guard for the basket self-joins: one pathological order
    with 200 distinct parts (TPC-H max is 7) must truncate to the
    ORDER_LINE_CAP smallest partkeys — deterministically — while
    under-cap orders pass through exactly (so the committed-fixture
    oracles are unchanged), and the downstream pair expansion is
    bounded at cap^2 instead of 200^2."""
    from investcloud_data_pipeline_spark.plans.mining import (
        ORDER_LINE_CAP,
        _order_parts,
        copurchase_part_pairs,
    )

    hot = [(1, 1000 + k) for k in range(200)]
    # duplicate lines in the hot order: the cap must dedup first
    hot += [(1, 1000 + k) for k in range(10)]
    normal = [(2, 7), (2, 8), (2, 9), (3, 7), (3, 8), (4, 7), (4, 8)]
    df = spark.createDataFrame(
        hot + normal, "l_orderkey long, l_partkey long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    op = _order_parts(spark, str(tmp_path))
    got = {}
    for r in op.collect():
        got.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    # hot order: exactly cap rows, the cap SMALLEST partkeys
    assert len(got[1]) == ORDER_LINE_CAP
    assert got[1] == {1000 + k for k in range(ORDER_LINE_CAP)}
    # under-cap orders: identical to the uncapped distinct projection
    assert got[2] == {7, 8, 9} and got[3] == {7, 8} and got[4] == {7, 8}
    # bounded expansion end-to-end: the pair plan's within-order blowup
    # is cap*(cap-1)/2 for the hot order, not 200*199/2
    n_hot_pairs = ORDER_LINE_CAP * (ORDER_LINE_CAP - 1) // 2
    pairs = copurchase_part_pairs(spark, str(tmp_path))
    # support threshold 3 kills the hot order's singleton pairs; (7,8)
    # appears in orders 2,3,4 -> survives
    rows = {(r.part1, r.part2): r.n_orders for r in pairs.collect()}
    assert rows == {(7, 8): 3}
    # and the raw (pre-threshold) expansion is bounded
    from pyspark.sql import functions as F

    a, b = op.alias("a"), op.alias("b")
    raw = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .count()
    )
    assert raw == n_hot_pairs + 3 + 1 + 1
