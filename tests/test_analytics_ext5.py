"""Unit tests for the wave-5 analytics extensions: curriculum order,
lang-id confusion matrix, and reorder-gap survival."""

from __future__ import annotations

from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.plans import analytics_ext5 as AX5


def _patched(monkeypatch, tables):
    monkeypatch.setattr(
        AX5, "load_table", lambda spark, d, name: tables[name]
    )


# ---------- curriculum order ----------

def test_curriculum_bins_balanced_and_positions_dense(spark, sf_dir):
    out = AX5.corpus_curriculum_order(spark, sf_dir).persist()
    n = out.count()
    sizes = {
        r.curriculum_bin: r.c
        for r in out.groupBy("curriculum_bin")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert set(sizes) == set(range(1, AX5.CURRICULUM_BINS + 1))
    # ntile balance: sizes differ by at most 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # positions within each bin are dense 1..size
    maxpos = {
        r.curriculum_bin: r.m
        for r in out.groupBy("curriculum_bin")
        .agg(F.max("pos_in_bin").alias("m"))
        .collect()
    }
    assert maxpos == sizes
    assert n == sum(sizes.values())
    out.unpersist()


def test_curriculum_better_bins_have_better_quality(spark, sf_dir):
    from investcloud_data_pipeline_spark.operators.text import quality_score
    from investcloud_data_pipeline_spark.sources.batch import load_table

    out = AX5.corpus_curriculum_order(spark, sf_dir)
    q = quality_score(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "quality_score"
    )
    per_bin = (
        out.join(q, "doc_id")
        .groupBy("curriculum_bin")
        .agg(
            F.min("quality_score").alias("lo"),
            F.max("quality_score").alias("hi"),
        )
        .orderBy("curriculum_bin")
        .collect()
    )
    # bin k's worst doc is at least as good as bin k+1's best doc
    for a, b in zip(per_bin, per_bin[1:]):
        assert a.lo >= b.hi


def test_curriculum_seed_changes_within_bin_order_only(spark, sf_dir, monkeypatch):
    base = AX5.corpus_curriculum_order(spark, sf_dir)
    bins0 = {r.doc_id: r.curriculum_bin for r in base.collect()}
    monkeypatch.setattr(AX5, "CURRICULUM_SEED", "epoch1")
    swapped = AX5.corpus_curriculum_order(spark, sf_dir)
    bins1 = {r.doc_id: r.curriculum_bin for r in swapped.collect()}
    assert bins0 == bins1  # bins are seed-independent
    pos0 = {r.doc_id: r.pos_in_bin for r in base.collect()}
    pos1 = {r.doc_id: r.pos_in_bin for r in swapped.collect()}
    assert pos0 != pos1  # the within-bin order reshuffled


# ---------- lang-id confusion ----------

def test_confusion_shares_sum_to_one(spark, sf_dir):
    out = AX5.text_langid_confusion(spark, sf_dir).persist()
    rec = (
        out.groupBy("labeled_lang")
        .agg(F.round(F.sum("recall_share"), 4).alias("s"))
        .filter(F.col("s") != 1.0)
        .count()
    )
    prec = (
        out.groupBy("guessed_lang")
        .agg(F.round(F.sum("precision_share"), 4).alias("s"))
        .filter(F.col("s") != 1.0)
        .count()
    )
    assert rec == 0 and prec == 0
    out.unpersist()


def test_confusion_counts_match_prediction_pass(spark, sf_dir):
    from investcloud_data_pipeline_spark.operators.text import language_id
    from investcloud_data_pipeline_spark.sources.batch import load_table

    out = AX5.text_langid_confusion(spark, sf_dir)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert total == n_docs
    # spot-check one cell against a direct count
    pred = language_id(load_table(spark, sf_dir, "documents"))
    cell = pred.filter(
        (F.col("labeled_lang") == "en") & (F.col("guessed_lang") == "en")
    ).count()
    got = out.filter(
        (F.col("labeled_lang") == "en") & (F.col("guessed_lang") == "en")
    ).collect()
    assert got and got[0].n_docs == cell


# ---------- reorder survival ----------

def test_survival_crafted_gaps(spark, monkeypatch):
    # one customer, orders at days 0, 10, 50: gaps 10 and 40.
    # t=7 -> 2/2 survive; t=14 -> 1/2; t=30 -> 1/2; t=60/90 -> 0/2
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 1.0, "1995-01-01", "1-URGENT"),
            (2, 1, "O", 1.0, "1995-01-11", "1-URGENT"),
            (3, 1, "O", 1.0, "1995-02-20", "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string,"
        " o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    _patched(monkeypatch, {"orders": orders})
    out = {
        r.threshold_days: (r.n_gaps, r.n_surviving, r.survival_share)
        for r in AX5.customer_reorder_survival(spark, "x").collect()
    }
    assert out[7] == (2, 2, 1.0)
    assert out[14] == (2, 1, 0.5)
    assert out[30] == (2, 1, 0.5)
    assert out[60] == (2, 0, 0.0)
    assert out[90] == (2, 0, 0.0)


def test_survival_monotone_nonincreasing(spark, sf_dir):
    rows = sorted(
        AX5.customer_reorder_survival(spark, sf_dir).collect(),
        key=lambda r: r.threshold_days,
    )
    assert len(rows) == len(AX5.SURVIVAL_DAYS)
    for a, b in zip(rows, rows[1:]):
        assert a.survival_share >= b.survival_share
        assert a.n_gaps == b.n_gaps


# ---------- product quantization ----------

def test_pq_codes_shape_and_range(spark, sf_dir):
    out = AX5.embedding_pq_codes(spark, sf_dir).persist()
    n_emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    assert out.count() == n_emb
    bad = out.filter(
        (F.size(F.split("pq_codes", ",")) != AX5.PQ_SUBSPACES)
        | (F.col("recon_err") < 0)
    ).count()
    assert bad == 0
    # every emitted code is a valid codebook index
    codes = out.select(
        F.explode(F.split("pq_codes", ",")).alias("c0")
    ).select(F.col("c0").cast("int").alias("c"))
    assert codes.filter(
        (F.col("c") < 0) | (F.col("c") >= AX5.PQ_CODEBOOK)
    ).count() == 0
    out.unpersist()


def test_pq_codebook_members_reconstruct_exactly(spark, sf_dir):
    # a vector that IS a codebook entry is its own nearest center in
    # every subspace -> reconstruction error exactly 0
    from investcloud_data_pipeline_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    key = F.md5(
        F.concat(F.lit(AX5.PQ_SEED + ":"), F.col("vec_id").cast("string"))
    )
    member_ids = [
        r.vec_id
        for r in emb.select("vec_id", key.alias("k"))
        .orderBy("k", "vec_id")
        .limit(AX5.PQ_CODEBOOK)
        .collect()
    ]
    out = AX5.embedding_pq_codes(spark, sf_dir)
    errs = {
        r.vec_id: r.recon_err
        for r in out.filter(F.col("vec_id").isin(member_ids)).collect()
    }
    assert len(errs) == AX5.PQ_CODEBOOK
    assert all(e == 0.0 for e in errs.values())


def test_pq_partitioning_invariant(spark, sf_dir):
    from investcloud_data_pipeline_spark.sources.batch import load_table

    base = {
        (r.vec_id, r.pq_codes, r.recon_err)
        for r in AX5.embedding_pq_codes(spark, sf_dir).collect()
    }
    orig = AX5.load_table
    try:
        AX5.load_table = lambda s, d, n: load_table(s, d, n).repartition(11)
        rep = {
            (r.vec_id, r.pq_codes, r.recon_err)
            for r in AX5.embedding_pq_codes(spark, sf_dir).collect()
        }
    finally:
        AX5.load_table = orig
    assert base == rep


def test_pq_adc_topk_shape_and_monotone(spark, sf_dir):
    out = AX5.ann_pq_adc_topk(spark, sf_dir).persist()
    rows = out.collect()
    by_q = {}
    for r in rows:
        assert r.vec_id != r.qid  # never returns the query itself
        assert r.adc_dist >= 0
        by_q.setdefault(r.qid, []).append((r.rank, r.adc_dist, r.vec_id))
    assert set(by_q) == set(range(10))
    for q, lst in by_q.items():
        lst.sort()
        assert [r for r, _, _ in lst] == list(range(1, AX5.PQ_ADC_K + 1))
        dists = [d for _, d, _ in lst]
        assert dists == sorted(dists)  # ADC nondecreasing with rank
    out.unpersist()


def test_pq_adc_identical_codes_distance_symmetry(spark, sf_dir):
    # a query vector's ADC distance to ANY vector sharing all 8 codes
    # equals the sum of the query's lookup entries for those codes —
    # i.e., same codes => same ADC distance. Check: rows with equal
    # adc_dist within a query are adjacent ranks (tie block intact).
    out = AX5.ann_pq_adc_topk(spark, sf_dir)
    from collections import defaultdict

    by_q = defaultdict(list)
    for r in out.collect():
        by_q[r.qid].append((r.rank, r.adc_dist))
    for q, lst in by_q.items():
        lst.sort()
        for (r1, d1), (r2, d2) in zip(lst, lst[1:]):
            assert d2 >= d1


def test_pq_adc_recall_sanity_and_kmeans_upgrade(spark, sf_dir):
    """PQ-ADC is structurally low-recall with a 16-entry sampled
    codebook on near-orthogonal random vectors (measured 0.127 @ sf0.1
    in ANN_RECALL_r6.json) — the floor here is a breakage detector
    (> 0), plus the ordering law the recall ledger demonstrates: the
    k-means codebook must not be WORSE than the sampled one."""
    import numpy as np

    from investcloud_data_pipeline_spark.functions.vectors import (
        seeded_kmeans_centers,
    )
    from investcloud_data_pipeline_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).persist()
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )
    pairs = emb.crossJoin(F.broadcast(qs)).filter(
        F.col("vec_id") != F.col("qid")
    )
    l2 = F.expr(
        "aggregate(zip_with(embedding, qemb,"
        " (x,y)->(CAST(x AS DOUBLE)-CAST(y AS DOUBLE))"
        "*(CAST(x AS DOUBLE)-CAST(y AS DOUBLE))),"
        " CAST(0 AS DOUBLE), (a,e)->a+e)"
    )
    from pyspark.sql import Window as W

    wq = W.partitionBy("qid").orderBy(F.col("l2").asc(), "vec_id")
    exact = {}
    for r in (
        pairs.select("qid", "vec_id", l2.alias("l2"))
        .withColumn("r", F.row_number().over(wq))
        .filter("r <= 5")
        .collect()
    ):
        exact.setdefault(r.qid, set()).add(r.vec_id)

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.qid, set()).add(r.vec_id)
        return sum(
            len(got.get(q, set()) & s) / 5 for q, s in exact.items()
        ) / len(exact)

    r_sampled = recall(AX5.ann_pq_adc_topk(spark, sf_dir))
    assert r_sampled > 0.0, r_sampled

    slices = []
    for s in range(AX5.PQ_SUBSPACES):
        sl = emb.select(
            F.slice(
                "embedding", s * AX5.PQ_SUBDIM + 1, AX5.PQ_SUBDIM
            ).alias("v")
        )
        c = seeded_kmeans_centers(sl, "v", AX5.PQ_CODEBOOK, seed=42 + s)
        assert c is not None
        slices.append(c)
    full = np.hstack(slices)
    km_centers = spark.createDataFrame(
        [
            (i + 1, [float(x) for x in full[i]])
            for i in range(AX5.PQ_CODEBOOK)
        ],
        "crank int, cemb array<float>",
    )
    r_kmeans = recall(AX5.pq_adc_topk(emb, qs, k=5, centers=km_centers))
    assert r_kmeans >= r_sampled - 0.05, (r_kmeans, r_sampled)

    # The REGISTRY kmeans-codebook query (K=64, round-7 verdict task
    # #5): the fitted codebook must beat the sampled-16 floor outright —
    # a banding/codebook regression that guts its recall fails here.
    r_km64 = recall(AX5.ann_pq_adc_kmeans_topk(spark, sf_dir))
    assert r_km64 >= r_sampled, (r_km64, r_sampled)
    assert r_km64 > 0.0

    # The IVF-PQ + exact-refine registry query (round-12 operating
    # point: nprobe=14 widening adaptively to 16 on a small coarse
    # margin, refine=200 — recall@10 0.983 / min-query 0.80 at sf0.1,
    # up from fixed-14's 0.970 / 0.70 for ~+9% ADC candidates; see
    # IVFPQ_MARGIN_TAU): residual coding + shortlist re-rank must
    # clearly beat the codes-only kmeans path — pin a floor above it
    # so a regression in the coarse probe, the adaptive widening, the
    # residual codebook, or the refine join fails here. (sf0.01
    # measures ~0.98 at this operating point; 0.9 is the conservative
    # cross-sf floor, raised from 0.8 with the r11 retune.)
    r_ivfpq = recall(AX5.ann_ivf_pq_topk(spark, sf_dir))
    emb.unpersist()
    assert r_ivfpq >= max(0.9, r_km64), (r_ivfpq, r_km64)


def test_pq_codes_arrow_matches_expression_path(spark, sf_dir):
    """The Arrow-matmul code assignment must emit the IDENTICAL
    (vec_id, s, crank) relation as the strict expression path for the
    same codebook — the kernel is a physical-plan swap, not a
    semantics change (both round to 9dp before a smallest-crank
    argmin)."""
    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.plans import analytics_ext5 as AX5
    from investcloud_data_pipeline_spark.sources.batch import load_table

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 200)
    )
    centers = AX5._pq_centers(emb)
    best = AX5._pq_best(emb, centers)
    expr_codes = {
        (r.vec_id, s, r[f"b{s}"].crank)
        for r in best.collect()
        for s in range(AX5.PQ_SUBSPACES)
    }
    arrow_codes = {
        (r.vec_id, r.s, r.crank)
        for r in AX5._pq_codes_arrow(emb, centers).collect()
    }
    assert arrow_codes == expr_codes


def test_pq_dist_shared_diff2_bit_identical(spark, sf_dir):
    """The shared-diff² restructure (one zip_with + per-subspace slice
    folds) must reproduce the per-subspace _pq_dist_s expressions
    BIT-identically — same (x−y)² doubles, same left-fold order, so
    this asserts exact float equality, not approximate."""
    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.plans import analytics_ext5 as AX5
    from investcloud_data_pipeline_spark.sources.batch import load_table

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 100)
    )
    centers = AX5._pq_centers(emb)
    pairs = emb.crossJoin(F.broadcast(centers))
    direct = pairs.select(
        "vec_id",
        "crank",
        *[
            AX5._pq_dist_s(s).alias(f"d{s}")
            for s in range(AX5.PQ_SUBSPACES)
        ],
    )
    shared = pairs.select(
        "vec_id", "crank", AX5._pq_diff2("embedding", "cemb").alias(AX5._PQ_D2)
    ).select(
        "vec_id",
        "crank",
        *[
            AX5._pq_dist_from_d2(s).alias(f"d{s}")
            for s in range(AX5.PQ_SUBSPACES)
        ],
    )
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, shared.collect()))
    assert a == b and a  # exact equality, incl. every float bit


def test_adc_lookup_kernel_bit_identical(spark, sf_dir):
    """The Arrow ADC lookup kernel (round-13) must reproduce the
    expression build — crossJoin(centers) + shared diff² + per-subspace
    folds + stack — BIT-identically: same float32→double upcasts, same
    (x−y)² doubles, same left-fold order, and the 9dp round applied by
    the same JVM F.round. Exact float equality over every (probe row ×
    crank × subspace) entry, on both the fit-time-captured codebook and
    the collected-from-DataFrame fallback."""
    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.plans import analytics_ext5 as AX5
    from investcloud_data_pipeline_spark.functions.vectors import (
        to_double_array,
    )
    from investcloud_data_pipeline_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    codes, cent_df, centers, centers_local = AX5._ivf_pq_fit_encode(
        spark, emb, AX5.IVFPQ_NLIST, AX5.IVFPQ_CODEBOOK, AX5.IVFPQ_SEED
    )
    q = (
        emb.filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("qid"),
            to_double_array("embedding").alias("qv"),
        )
    )
    probe = q.join(F.broadcast(cent_df)).select(
        "qid",
        "cell",
        F.zip_with(
            F.col("qv"), F.col("centroid"), lambda x, y: x - y
        ).alias("qr"),
    )
    expr = (
        probe.crossJoin(F.broadcast(centers))
        .select(
            "qid",
            "cell",
            "crank",
            AX5._pq_diff2("qr", "cemb").alias(AX5._PQ_D2),
        )
        .select(
            "qid",
            "cell",
            "crank",
            *[
                AX5._pq_dist_from_d2(s).alias(f"qd{s}")
                for s in range(AX5.PQ_SUBSPACES)
            ],
        )
        .select(
            "qid",
            "cell",
            "crank",
            F.expr(
                "stack("
                + str(AX5.PQ_SUBSPACES)
                + ", "
                + ", ".join(
                    f"{s}, qd{s}" for s in range(AX5.PQ_SUBSPACES)
                )
                + ") AS (s, qd)"
            ),
        )
    )
    want = sorted(map(tuple, expr.collect()))
    assert want

    def unpack(table):
        # array layout: qd[(crank-1)*8 + s] -> (qid, cell, crank, s, qd)
        return sorted(
            map(
                tuple,
                table.select(
                    "qid", "cell", F.posexplode("qd")
                )
                .select(
                    "qid",
                    "cell",
                    F.expr(
                        f"(pos div {AX5.PQ_SUBSPACES}) + 1 AS crank"
                    ),
                    F.expr(f"pos % {AX5.PQ_SUBSPACES} AS s"),
                    F.col("col").alias("qd"),
                )
                .collect(),
            )
        )

    got_fit = unpack(AX5._adc_lookup_table(probe, centers, centers_local))
    got_collected = unpack(AX5._adc_lookup_table(probe, centers, None))
    assert got_fit == want  # exact equality, incl. every float bit
    assert got_collected == want


def test_ivf_pq_distributed_twin_runs(spark, sf_dir, monkeypatch):
    """Round-12 verdict task #4: the 100 TB branch (Spark ML KMeans
    coarse fit + residual join + per-subspace distributed fits +
    staged encode) must run in CI on every suite pass, not only when
    the corpus outgrows the driver guard. Forcing the local fit to
    decline (kmeans_fit_local -> None trips BOTH the fused path's
    coarse fit and seeded_kmeans_centers inside _ivf_assign, and
    _pq_kmeans_centers' slice fits) routes the whole pipeline through
    the distributed twin; assert the structural contract the guarded
    path satisfies: full rank ladders per query, candidates only from
    probed cells, self excluded."""
    from investcloud_data_pipeline_spark.functions import vectors

    monkeypatch.setattr(vectors, "kmeans_fit_local", lambda *a, **k: None)

    emb = AX5._t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )
    out = AX5.ivf_pq_adc_topk(
        emb, qs, k=5, k_codebook=32, refine=50
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rows in by_q.items():
        assert sorted(r.rank for r in rows) == [1, 2, 3, 4, 5]
        assert all(r.vec_id != q for r in rows)


def test_seeded_kmeans_distributed_twin_runs(spark, sf_dir):
    """The other guarded driver fit (seeded_kmeans_centers): past
    max_driver_bytes it must return None — and its callers' Spark ML
    branch must produce a complete, partition-invariant assignment.
    Drives kmeans_assignments through the distributed branch directly
    (monkeypatch-free: the guard is a parameter here)."""
    from investcloud_data_pipeline_spark.functions.vectors import (
        seeded_kmeans_centers,
    )
    from investcloud_data_pipeline_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assert (
        seeded_kmeans_centers(
            emb, "embedding", k=8, seed=42, max_driver_bytes=0
        )
        is None
    )

    # the Spark ML KMeans branch of kmeans_assignments, forced the
    # same way the fleet-scale corpus would trip it
    from investcloud_data_pipeline_spark.functions import vectors

    n = emb.count()
    real = vectors.seeded_kmeans_centers
    try:
        vectors.seeded_kmeans_centers = (
            lambda df, vec_col, k, seed=42, **kw: None
        )
        got = vectors.kmeans_assignments(
            emb, "embedding", "vec_id", k=8
        ).collect()
    finally:
        vectors.seeded_kmeans_centers = real
    assert len(got) == n
    assert {r.cluster for r in got} <= set(range(8))
    assert len({r.vec_id for r in got}) == n
