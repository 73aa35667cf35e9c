"""Extended analytics operators, wave 7: growth accounting, a trained
naive-Bayes language classifier (the learned counterpart of the
stopword heuristic), and a dimension-truncation retrieval evaluation.

These fill three real gaps a production team hits next: "how is the
user base actually growing month over month?" (the new/retained/
resurrected/churned decomposition every growth dashboard starts from),
"what does a TRAINED classifier do against the lang labels?" (the
counts-only multinomial NB — one aggregation pass to train, broadcast
log-prob table to score, fully SQL-expressible so the whole train+
predict pipeline is strict-oracle), and "how much recall does cheap
dimension truncation cost?" (Matryoshka-style retrieval: rank by the
first 16 of 64 dims, compare against the full-dim exact ranking —
both rankings exact, so the evaluation itself is strict-oracle).

Oracle convention unchanged: every query here is STRICT-oracle; ln()
contributions follow the BM25/PQ discipline (round to 9dp, sum as
DECIMAL, round once at the end) so a 1-ulp cross-engine ln drift can
never flip an argmax or a 6dp output.

Reference parity note: the reference has nothing in this family (its
gold layer is two grouped aggregations, `03_gold_layer:25-42`); this
module is part of the training-data/analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------- daily growth accounting ----------
#
# The canonical active-user decomposition: per day, how many active
# users are new (first day ever), retained (active yesterday too),
# resurrected (active before, but not yesterday) — plus churned
# (active yesterday, absent today). Identity by construction:
# dau = new + retained + resurrected, churned(d) = dau(d-1) -
# retained(d). Daily, not monthly: the driver's events table spans one
# calendar month at every sf, and each user is active on MOST days but
# not all — days are the granularity with real churn dynamics.
#
# Scale: ONE shuffle of the distinct (user, day) relation for the
# per-user window (narrow: 12 bytes/row); the day aggregates ride the
# window's partitioning. Day arithmetic is an integer day number from
# a fixed epoch — no interval/timestamp coercion divergence between
# engines.


def user_growth_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    am = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    am = am.withColumn(
        "mnum", F.datediff("day", F.lit("2000-01-03").cast("date"))
    )
    w = Window.partitionBy("user_id").orderBy("mnum")
    cl = am.select(
        "user_id",
        "day",
        "mnum",
        F.lag("mnum").over(w).alias("prev_mnum"),
        F.lead("mnum").over(w).alias("next_mnum"),
    )
    status = (
        cl.groupBy("day", "mnum")
        .agg(
            F.count("*").cast("long").alias("dau"),
            F.sum(
                F.when(F.col("prev_mnum").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_new"),
            F.sum(
                F.when(
                    F.col("prev_mnum") == F.col("mnum") - 1, 1
                ).otherwise(0)
            ).cast("long").alias("n_retained"),
            F.sum(
                F.when(
                    F.col("prev_mnum").isNotNull()
                    & (F.col("prev_mnum") < F.col("mnum") - 1),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_resurrected"),
        )
    )
    max_mnum = am.groupBy().agg(F.max("mnum").alias("max_mnum"))
    churn = (
        cl.filter(
            F.col("next_mnum").isNull()
            | (F.col("next_mnum") > F.col("mnum") + 1)
        )
        .crossJoin(F.broadcast(max_mnum))
        .filter(F.col("mnum") + 1 <= F.col("max_mnum"))
        .groupBy((F.col("mnum") + 1).alias("mnum"))
        .agg(F.count("*").cast("long").alias("n_churned"))
    )
    # FULL outer join, not left: a day with zero active users has no
    # status row, but users who were active the previous day still
    # churn INTO it — a left join would silently drop those counts.
    # The day for churn-only rows is reconstructed from the day number
    # (mnum is days since the fixed 2000-01-03 epoch).
    return (
        status.join(churn, "mnum", "full_outer")
        .select(
            F.coalesce(
                F.col("day"),
                F.date_add(
                    F.lit("2000-01-03").cast("date"),
                    F.col("mnum").cast("int"),
                ),
            ).alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).cast("long").alias(
                "n_retained"
            ),
            F.coalesce("n_resurrected", F.lit(0)).cast("long").alias(
                "n_resurrected"
            ),
            F.coalesce("n_churned", F.lit(0)).cast("long").alias(
                "n_churned"
            ),
        )
    )


USER_GROWTH_ACCOUNTING_SQL = """
WITH am AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events
), cl AS (
  SELECT user_id, day,
         date_diff('day', DATE '2000-01-03', day) AS mnum,
         lag(date_diff('day', DATE '2000-01-03', day)) OVER w AS prev_mnum,
         lead(date_diff('day', DATE '2000-01-03', day)) OVER w AS next_mnum
  FROM am
  WINDOW w AS (PARTITION BY user_id ORDER BY day)
), st AS (
  SELECT day, mnum,
         count(*) AS dau,
         CAST(sum(CASE WHEN prev_mnum IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(sum(CASE WHEN prev_mnum = mnum - 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(sum(CASE WHEN prev_mnum IS NOT NULL AND prev_mnum < mnum - 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM cl GROUP BY 1, 2
), ch AS (
  SELECT mnum + 1 AS mnum, count(*) AS n_churned
  FROM cl
  WHERE (next_mnum IS NULL OR next_mnum > mnum + 1)
    AND mnum + 1 <= (SELECT max(date_diff('day', DATE '2000-01-03', day)) FROM am)
  GROUP BY 1
)
SELECT coalesce(st.day, DATE '2000-01-03' + CAST(ch.mnum AS INTEGER)) AS day,
       CAST(coalesce(st.dau, 0) AS BIGINT) AS dau,
       CAST(coalesce(st.n_new, 0) AS BIGINT) AS n_new,
       CAST(coalesce(st.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(coalesce(st.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
FROM st FULL OUTER JOIN ch USING (mnum)
"""


# ---------- trained naive-Bayes language classifier ----------
#
# Multinomial NB with Laplace smoothing, trained and evaluated on the
# labeled corpus in ONE declarative pipeline — the counts-only learned
# classifier that complements the stopword HEURISTIC of
# text_language_id / text_langid_confusion:
#
#   logP(t|c) = ln((count(t,c) + 1) / (tokens_c + V))
#   score(d,c) = ln(docs_c / D) + Σ_occurrences logP(t|c)
#   prediction = argmax_c score (tie → lexicographically first lang)
#
# Output is the confusion matrix (labeled vs predicted, cells + recall
# share) — the resubstitution evaluation; the leakage-free split ops
# (corpus_leakage_free_split) are the train/test discipline at scale.
#
# Cross-engine exactness: every ln() contribution is rounded to 9dp
# and summed as DECIMAL(28,9) per (doc, class); the per-occurrence
# class table is tiny (|langs| × V) and broadcast. Scale: one shuffle
# of token occurrences for the (class, term) counts, one for the
# (doc, class) score sum; the argmax is a min(struct) aggregate, no
# window sort.

NB_TOKEN_EXPR = (
    r"transform(filter(split(text, '[^a-zA-Z]+'),"
    r" t -> length(t) >= 3), t -> lower(t))"
)


def text_naive_bayes_langid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.expr(NB_TOKEN_EXPR)).alias("term"),
    )
    # LAZY localCheckpoint, not persist(): the relation is consumed
    # several times (counts, scoring, the token-less anti-join), and
    # checkpoint blocks are released by the ContextCleaner when the
    # plan becomes unreachable — persist() entries would accumulate in
    # the CacheManager for the session lifetime across registry sweeps.
    # eager=False (round-12): the plan collapses to an RDD leaf either
    # way (no re-analysis bloat), but the eager form scheduled one
    # blocking job per checkpoint at plan-BUILD time — three
    # sequential driver round-trips per execution; lazily the blocks
    # materialize inside the first consuming job and later readers hit
    # storage (the pagerank/SSSP lazy-chain discipline).
    # Fault-tolerance tradeoff (blocks are non-replicated and
    # non-recomputable): see the full note in operators/binning.py —
    # applies to every localCheckpoint in this module.
    toks = toks.localCheckpoint(eager=False)
    # class-conditional counts; class totals and the vocabulary size
    # DERIVE from the aggregated (class, term) relation — ct is
    # |classes|×V rows, so everything after costs class-model work,
    # and the raw token stream is scanned exactly twice (ct + scoring)
    ct = toks.groupBy("lang", "term").agg(
        F.count("*").alias("n_tc")
    ).localCheckpoint(eager=False)
    class_tot = ct.groupBy("lang").agg(
        F.sum("n_tc").alias("n_tokens_c")
    )
    vocab = ct.select("term").distinct().groupBy().agg(
        F.count("*").alias("v")
    )
    doc_tot = d.groupBy("lang").agg(F.count("*").alias("n_docs_c"))
    # D derives from the per-class totals (3 rows) — no second scan of
    # the documents table for a grand total
    n_docs = doc_tot.groupBy().agg(
        F.sum("n_docs_c").alias("n_docs")
    )
    classes = (
        doc_tot.join(F.broadcast(n_docs))
        .join(class_tot, "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("lang").alias("clang"),
            F.round(
                F.log(
                    F.col("n_docs_c").cast("double")
                    / F.col("n_docs").cast("double")
                ),
                9,
            ).cast("decimal(28,9)").alias("log_prior"),
            "n_tokens_c",
            "v",
        )
    )
    # Exchange diet (round-9): `classes` (|langs| rows) is referenced
    # by probs, unseen, and the prior-only pick — without a
    # materialization each reference RE-INLINES the doc_tot/class_tot/
    # vocab aggregation pipelines (the round-8 plan audit measured 68
    # exchanges, all plan bloat from these scalar relations). One
    # localCheckpoint of the 3-row relation collapses them (lazy — the
    # class-model aggregation runs inside the first consuming job).
    classes = classes.localCheckpoint(eager=False)
    # smoothed log-probs for SEEN (class, term) pairs; unseen pairs
    # contribute ln(1 / (n_tokens_c + V)), folded in via coalesce after
    # the left join below
    probs = (
        ct.join(F.broadcast(classes), ct.lang == classes.clang)
        .select(
            "clang",
            "term",
            F.round(
                F.log(
                    (F.col("n_tc") + 1).cast("double")
                    / (F.col("n_tokens_c") + F.col("v")).cast("double")
                ),
                9,
            ).cast("decimal(28,9)").alias("log_p"),
        )
    )
    unseen = classes.select(
        "clang",
        "log_prior",
        F.round(
            F.log(
                F.lit(1.0)
                / (F.col("n_tokens_c") + F.col("v")).cast("double")
            ),
            9,
        ).cast("decimal(28,9)").alias("log_unseen"),
    )
    # Per-(doc, term) counts BEFORE the class crossJoin (round-12,
    # guide §2.3 "aggregate before you shuffle"): m occurrences of a
    # term contribute m identical 9dp-rounded decimals, and a decimal
    # sum of m equal values is EXACTLY m × value — multiplying by the
    # count in decimal(38,9) (28+9+1 = 38 precision, scale preserved,
    # no precision-loss rounding) reproduces the per-occurrence sum
    # bit-for-bit while the class join and the score aggregation
    # process distinct (doc, term) pairs instead of every occurrence.
    tf = toks.groupBy("doc_id", "lang", "term").agg(
        F.count("*").cast("decimal(9,0)").alias("tc")
    )
    scored = (
        tf.crossJoin(F.broadcast(unseen))
        .join(F.broadcast(probs), ["clang", "term"], "left")
        .groupBy("doc_id", "lang", "clang", "log_prior")
        .agg(
            F.sum(
                F.coalesce(F.col("log_p"), F.col("log_unseen"))
                * F.col("tc")
            ).alias("log_lik")
        )
        .select(
            "doc_id",
            "lang",
            "clang",
            (F.col("log_prior") + F.col("log_lik")).alias("score"),
        )
    )
    pred_tok = scored.groupBy("doc_id", "lang").agg(
        F.min(
            F.struct(
                (-F.col("score")).alias("neg"),
                F.col("clang").alias("clang"),
            )
        )["clang"].alias("predicted_lang")
    )
    # Documents with NO qualifying token (no alpha run of length >= 3)
    # never reach the scored relation — they get the prior-only argmax
    # (the NB score with an empty likelihood sum), so every labeled
    # document appears in the confusion matrix exactly once.
    prior_pick = classes.groupBy().agg(
        F.min(
            F.struct(
                (-F.col("log_prior")).alias("neg"),
                F.col("clang").alias("clang"),
            )
        )["clang"].alias("predicted_lang")
    )
    no_tok = d.select("doc_id", "lang").join(
        toks.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    pred = pred_tok.unionByName(
        no_tok.crossJoin(F.broadcast(prior_pick))
    )
    cells = pred.groupBy(
        F.col("lang").alias("labeled_lang"), "predicted_lang"
    ).agg(F.count("*").cast("long").alias("n_docs"))
    # second diet cut: label_tot derives FROM cells, so without a
    # materialization the entire score→predict pipeline is inlined
    # twice (once per side of the final join); cells is ≤|langs|² rows
    cells = cells.localCheckpoint(eager=True)
    label_tot = cells.groupBy("labeled_lang").agg(
        F.sum("n_docs").alias("label_total")
    )
    return cells.join(F.broadcast(label_tot), "labeled_lang").select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double")
            / F.col("label_total").cast("double"),
            6,
        ).alias("recall_share"),
    )


TEXT_NAIVE_BAYES_LANGID_SQL = """
WITH toks AS (
  SELECT doc_id, lang, lower(t.term) AS term
  FROM documents,
       unnest(string_split_regex(text, '[^a-zA-Z]+')) AS t(term)
  WHERE length(t.term) >= 3
), ct AS (
  SELECT lang AS clang, term, count(*) AS n_tc FROM toks GROUP BY 1, 2
), class_tot AS (
  SELECT lang AS clang, count(*) AS n_tokens_c FROM toks GROUP BY 1
), vocab AS (SELECT count(DISTINCT term) AS v FROM toks),
doc_tot AS (SELECT lang AS clang, count(*) AS n_docs_c FROM documents GROUP BY 1),
classes AS (
  SELECT d.clang,
         CAST(round(ln(CAST(d.n_docs_c AS DOUBLE)
                       / (SELECT CAST(count(*) AS DOUBLE) FROM documents)), 9)
              AS DECIMAL(28,9)) AS log_prior,
         c.n_tokens_c, vocab.v
  FROM doc_tot d JOIN class_tot c USING (clang) CROSS JOIN vocab
), probs AS (
  SELECT ct.clang, ct.term,
         CAST(round(ln(CAST(ct.n_tc + 1 AS DOUBLE)
                       / CAST(cl.n_tokens_c + cl.v AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS log_p
  FROM ct JOIN classes cl USING (clang)
), unseen AS (
  SELECT clang, log_prior,
         CAST(round(ln(1.0 / CAST(n_tokens_c + v AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS log_unseen
  FROM classes
), scored AS (
  SELECT t.doc_id, t.lang, u.clang,
         u.log_prior + sum(coalesce(p.log_p, u.log_unseen)) AS score
  FROM toks t
  CROSS JOIN unseen u
  LEFT JOIN probs p ON p.clang = u.clang AND p.term = t.term
  GROUP BY t.doc_id, t.lang, u.clang, u.log_prior
), pred AS (
  -- argmax via row_number: DuckDB's min(x ORDER BY ...) ignores the
  -- ordering (min is order-insensitive), so a windowed rank is the
  -- portable argmax with an explicit tie-break
  SELECT doc_id, lang, clang AS predicted_lang FROM (
    SELECT doc_id, lang, clang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, clang ASC) AS r
    FROM scored) WHERE r = 1
  UNION ALL
  -- token-less documents: prior-only argmax (empty likelihood sum)
  SELECT d.doc_id, d.lang,
         (SELECT clang FROM classes
          ORDER BY log_prior DESC, clang ASC LIMIT 1) AS predicted_lang
  FROM documents d
  WHERE d.doc_id NOT IN (SELECT DISTINCT doc_id FROM toks)
), cells AS (
  SELECT lang AS labeled_lang, predicted_lang, count(*) AS n_docs
  FROM pred GROUP BY 1, 2
)
SELECT labeled_lang, predicted_lang, n_docs,
       round(CAST(n_docs AS DOUBLE)
             / sum(CAST(n_docs AS DOUBLE)) OVER (PARTITION BY labeled_lang), 6)
         AS recall_share
FROM cells
"""


# ---------- dimension-truncation retrieval evaluation ----------
#
# The Matryoshka question: if queries rank by only the FIRST
# TRUNC_DIMS of the 64-dim embedding (4× cheaper dot products, 4× less
# bandwidth — the standard first-stage trick), how much of the exact
# full-dim top-k survives? Both rankings are exact (6dp-rounded cosine,
# vec_id tie-break — the discipline dedup_embedding_cosine proved
# cross-engine), so the evaluation is strict-oracle, unlike the
# sketch-based ANN rows-only family.
#
# Scale: one broadcast of the 10 queries against the corpus computes
# BOTH cosines in a single projection (no second scan); each ranking is
# a WindowGroupLimit heap per query; the overlap is a self-join of two
# k-row-per-query relations on (qid, vec_id).

TRUNC_DIMS = 16
TRUNC_K = 5


def ann_dim_truncation_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.vectors import cosine_similarity, to_double_array

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )
    pairs = emb.crossJoin(F.broadcast(qs)).filter(
        F.col("vec_id") != F.col("qid")
    )
    full_cos = F.round(
        cosine_similarity(
            to_double_array("embedding"), to_double_array("qemb")
        ),
        6,
    )
    trunc_cos = F.round(
        cosine_similarity(
            to_double_array(F.slice("embedding", 1, TRUNC_DIMS)),
            to_double_array(F.slice("qemb", 1, TRUNC_DIMS)),
        ),
        6,
    )
    scored = pairs.select(
        "qid",
        "vec_id",
        full_cos.alias("cos_full"),
        trunc_cos.alias("cos_trunc"),
    )
    scored = scored.localCheckpoint(eager=True)

    def topk(col: str) -> DataFrame:
        w = Window.partitionBy("qid").orderBy(
            F.col(col).desc(), F.col("vec_id").asc()
        )
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= TRUNC_K)
            .select("qid", "vec_id")
        )

    overlap = topk("cos_full").intersect(topk("cos_trunc"))
    per_q = overlap.groupBy("qid").agg(
        F.count("*").cast("long").alias("n_overlap")
    )
    return (
        topk("cos_full")
        .select("qid")
        .distinct()
        .join(per_q, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias(
                "n_overlap"
            ),
            F.round(
                F.coalesce("n_overlap", F.lit(0)).cast("double")
                / F.lit(float(TRUNC_K)),
                6,
            ).alias("recall_at_k"),
        )
    )


ANN_DIM_TRUNCATION_RECALL_SQL = f"""
WITH qs AS (
  SELECT vec_id AS qid, embedding AS qemb FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT q.qid, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.qemb AS DOUBLE[])), 6)
           AS cos_full,
         round(list_cosine_similarity(
                 CAST(e.embedding[1:{TRUNC_DIMS}] AS DOUBLE[]),
                 CAST(q.qemb[1:{TRUNC_DIMS}] AS DOUBLE[])), 6)
           AS cos_trunc
  FROM embeddings e CROSS JOIN qs q
  WHERE e.vec_id != q.qid
), tf AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_full DESC, vec_id ASC) AS r
    FROM scored) WHERE r <= {TRUNC_K}
), tt AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_trunc DESC, vec_id ASC) AS r
    FROM scored) WHERE r <= {TRUNC_K}
), ov AS (
  SELECT qid, count(*) AS n_overlap
  FROM (SELECT qid, vec_id FROM tf INTERSECT SELECT qid, vec_id FROM tt)
  GROUP BY 1
)
SELECT q.qid,
       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) / {TRUNC_K}, 6)
         AS recall_at_k
FROM (SELECT DISTINCT qid FROM tf) q LEFT JOIN ov USING (qid)
"""


QUERIES = {
    "user_growth_accounting": (
        user_growth_accounting,
        USER_GROWTH_ACCOUNTING_SQL,
    ),
    "text_naive_bayes_langid": (
        text_naive_bayes_langid,
        TEXT_NAIVE_BAYES_LANGID_SQL,
    ),
    "ann_dim_truncation_recall": (
        ann_dim_truncation_recall,
        ANN_DIM_TRUNCATION_RECALL_SQL,
    ),
}


# ---------- Wilson-interval robust ranking ----------
#
# Rank nations by the share of high-balance customers USING THE WILSON
# SCORE LOWER BOUND, not the raw share — the standard fix for ranking
# proportions with unequal sample sizes (a 3/3 nation must not outrank
# a 95/100 nation). Closed form, z = 1.96:
#
#   lb = (p + z²/2n − z·√(p(1−p)/n + z²/4n²)) / (1 + z²/n)
#
# Cross-engine exactness: n and successes are exact integers; the lb
# expression is written with IDENTICAL operation structure in both
# engines (same literals, same nesting), so the double result is
# bit-identical before the 6dp round. Scale: one aggregate over the
# customer table; everything after is nation-sized.

WILSON_Z = 1.96
HIGH_BAL = 5000.0


def nation_wilson_ranking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n_df = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    agg = c.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(
            F.when(F.col("c_acctbal") > HIGH_BAL, 1).otherwise(0)
        ).cast("long").alias("n_high"),
    )
    z = F.lit(WILSON_Z)
    n = F.col("n_customers").cast("double")
    p = F.col("n_high").cast("double") / n
    lb = (
        p
        + z * z / (F.lit(2.0) * n)
        - z
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + z * z / (F.lit(4.0) * n * n)
        )
    ) / (F.lit(1.0) + z * z / n)
    ranked = (
        agg.join(
            F.broadcast(n_df), agg.c_nationkey == n_df.n_nationkey
        )
        .select(
            "n_name",
            "n_customers",
            "n_high",
            F.round(p, 6).alias("raw_share"),
            F.round(lb, 6).alias("wilson_lb"),
        )
    )
    w = Window.orderBy(F.col("wilson_lb").desc(), F.col("n_name").asc())
    return ranked.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "n_name",
        "n_customers",
        "n_high",
        "raw_share",
        "wilson_lb",
    )


NATION_WILSON_RANKING_SQL = f"""
WITH agg AS (
  SELECT c_nationkey,
         count(*) AS n_customers,
         CAST(sum(CASE WHEN c_acctbal > {HIGH_BAL} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_high
  FROM customer GROUP BY 1
), scored AS (
  SELECT n.n_name, a.n_customers, a.n_high,
         round(CAST(a.n_high AS DOUBLE) / CAST(a.n_customers AS DOUBLE), 6)
           AS raw_share,
         round(
           ((CAST(a.n_high AS DOUBLE) / CAST(a.n_customers AS DOUBLE))
            + {WILSON_Z} * {WILSON_Z} / (2.0 * CAST(a.n_customers AS DOUBLE))
            - {WILSON_Z} * sqrt(
                (CAST(a.n_high AS DOUBLE) / CAST(a.n_customers AS DOUBLE))
                * (1.0 - CAST(a.n_high AS DOUBLE) / CAST(a.n_customers AS DOUBLE))
                / CAST(a.n_customers AS DOUBLE)
                + {WILSON_Z} * {WILSON_Z}
                  / (4.0 * CAST(a.n_customers AS DOUBLE)
                         * CAST(a.n_customers AS DOUBLE))))
           / (1.0 + {WILSON_Z} * {WILSON_Z} / CAST(a.n_customers AS DOUBLE)),
           6) AS wilson_lb
  FROM agg a JOIN nation n ON a.c_nationkey = n.n_nationkey
)
SELECT CAST(row_number() OVER (ORDER BY wilson_lb DESC, n_name ASC) AS BIGINT)
         AS rank,
       n_name, n_customers, n_high, raw_share, wilson_lb
FROM scored
"""


# ---------- one-way ANOVA across return flags ----------
#
# Does mean extended price differ across return flags? The F statistic
# from exact decimal sufficient statistics (the closed-form OLS/Gini
# discipline): per group n_g, Σx (DECIMAL 38,2), Σx² (DECIMAL 38,4) —
# all order-independent — then
#
#   SSB = Σ_g (Σx_g)²/n_g − (Σx)²/N     SSW = Σx² − Σ_g (Σx_g)²/n_g
#   F   = (SSB/(k−1)) / (SSW/(N−k))     η²  = SSB / (SSB + SSW)
#
# Output columns are RELATIVE quantities only (grand mean, F, η²):
# the raw SS values are ~1e15-magnitude differences of ~1e15 doubles
# (catastrophic cancellation), where cross-engine FMA/association
# differences leave ulp-level absolute noise (~0.25) that no fixed
# decimal rounding can absorb — measured live at sf0.1. F and η² carry
# the same information with ~1e-10 RELATIVE error, far inside their
# 6dp rounds.
#
# Per-group double terms are rounded at 2dp (NOT the usual 9dp: the
# terms are ~1e12 at sf0.1, and round(x, 9) scales by 1e9 — an int64
# intermediate overflow in one engine's round; 2dp keeps the scaled
# value under 2^63 while the lost precision is 11 orders of magnitude
# below the term) and summed as DECIMAL so group iteration order can't
# flip the 6dp outputs. One fact shuffle (the group aggregate); the F
# fold is k rows.


def lineitem_returnflag_anova(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    per_g = l.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,2)")).alias(
            "s_g"
        ),
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(19,2)")
                * F.col("l_extendedprice").cast("decimal(19,2)")
            ).cast("decimal(38,4)")
        ).alias("ss_g"),
    )
    term = F.round(
        (F.col("s_g").cast("double") * F.col("s_g").cast("double"))
        / F.col("n_g").cast("double"),
        2,
    ).cast("decimal(38,2)")
    folded = per_g.groupBy().agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum("s_g").alias("s_all"),
        F.sum("ss_g").alias("ss_all"),
        F.sum(term).alias("sum_terms"),
    )
    ssb = F.col("sum_terms").cast("double") - (
        F.col("s_all").cast("double") * F.col("s_all").cast("double")
    ) / F.col("n_total").cast("double")
    ssw = F.col("ss_all").cast("double") - F.col("sum_terms").cast(
        "double"
    )
    # degenerate guard (the OLS/Gini discipline): F is undefined when
    # there is no within-group variance or no residual degrees of
    # freedom — NULL on both engines instead of an ANSI divide-by-zero
    ok = (
        (F.col("k") >= 2)
        & (F.col("n_total") > F.col("k"))
        & (ssw > 0)
    )
    f_stat = F.when(
        ok,
        (ssb / (F.col("k") - 1).cast("double"))
        / (ssw / (F.col("n_total") - F.col("k")).cast("double")),
    )
    eta_sq = F.when(ok, ssb / (ssb + ssw))
    grand_mean = F.col("s_all").cast("double") / F.col(
        "n_total"
    ).cast("double")
    return folded.select(
        "k",
        "n_total",
        F.round(grand_mean, 6).alias("grand_mean"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(eta_sq, 9).alias("eta_squared"),
    )


LINEITEM_RETURNFLAG_ANOVA_SQL = """
WITH per_g AS (
  SELECT l_returnflag,
         count(*) AS n_g,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,2))) AS DECIMAL(38,2))
           AS s_g,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(19,2))
                       * CAST(l_extendedprice AS DECIMAL(19,2))
                       AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS ss_g
  FROM lineitem GROUP BY 1
), folded AS (
  SELECT count(*) AS k,
         CAST(sum(n_g) AS BIGINT) AS n_total,
         sum(s_g) AS s_all,
         sum(ss_g) AS ss_all,
         sum(CAST(round(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                        / CAST(n_g AS DOUBLE), 2) AS DECIMAL(38,2)))
           AS sum_terms
  FROM per_g
)
SELECT k, n_total,
       round(CAST(s_all AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
         AS grand_mean,
       CASE WHEN k >= 2 AND n_total > k
                 AND CAST(ss_all AS DOUBLE) - CAST(sum_terms AS DOUBLE) > 0
            THEN round(
              ((CAST(sum_terms AS DOUBLE)
                - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                  / CAST(n_total AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
              / ((CAST(ss_all AS DOUBLE) - CAST(sum_terms AS DOUBLE))
                 / (CAST(n_total AS DOUBLE) - CAST(k AS DOUBLE))),
              6)
            ELSE NULL END AS f_stat,
       CASE WHEN k >= 2 AND n_total > k
                 AND CAST(ss_all AS DOUBLE) - CAST(sum_terms AS DOUBLE) > 0
            THEN round(
              (CAST(sum_terms AS DOUBLE)
               - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                 / CAST(n_total AS DOUBLE))
              / ((CAST(sum_terms AS DOUBLE)
                  - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                    / CAST(n_total AS DOUBLE))
                 + (CAST(ss_all AS DOUBLE) - CAST(sum_terms AS DOUBLE))),
              9)
            ELSE NULL END AS eta_squared
FROM folded
"""


QUERIES["nation_wilson_ranking"] = (
    nation_wilson_ranking,
    NATION_WILSON_RANKING_SQL,
)
QUERIES["lineitem_returnflag_anova"] = (
    lineitem_returnflag_anova,
    LINEITEM_RETURNFLAG_ANOVA_SQL,
)


# ---------- embedding outlier screen (diagonal Mahalanobis) ----------
#
# Rank vectors by Σ_d (x_d − μ_d)² / σ²_d — the covariance-diagonal
# Mahalanobis distance, the standard cheap screen for corrupt or
# out-of-distribution embeddings before they poison dedup/ANN indexes.
#
# Cross-engine exactness: per-dim μ and σ² are rounded at 6dp BEFORE
# use (so both engines feed identical statistics into the per-term
# math), each per-dim term is rounded at 6dp and summed as DECIMAL
# per vector, σ² is floored at 1e-9 (a constant dimension must not
# ANSI-throw). Scale: the stats aggregate's key cardinality is the
# dimensionality (tiny shuffle, map-side partials); stats broadcast to
# the exploded fan-out; top-k is one TakeOrderedAndProject.

MAHAL_TOP_K = 20


def embedding_mahalanobis_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "vec_id",
        (F.col("dim") + 1).alias("dim"),
        F.col("val").cast("double").alias("val"),
    )
    stats = ex.groupBy("dim").agg(
        F.round(F.avg("val"), 6).alias("m"),
        F.round(F.avg(F.col("val") * F.col("val")), 6).alias("m2"),
    ).select(
        "dim",
        "m",
        F.greatest(
            F.col("m2") - F.col("m") * F.col("m"), F.lit(1e-9)
        ).alias("v"),
    )
    term = F.round(
        (F.col("val") - F.col("m"))
        * (F.col("val") - F.col("m"))
        / F.col("v"),
        6,
    ).cast("decimal(18,6)")
    scored = (
        ex.join(F.broadcast(stats), "dim")
        .groupBy("vec_id")
        .agg(F.sum(term).alias("dec_score"))
        .select(
            "vec_id",
            F.round(F.col("dec_score").cast("double"), 4).alias(
                "mahalanobis_sq"
            ),
        )
    )
    w = Window.orderBy(
        F.col("mahalanobis_sq").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= MAHAL_TOP_K)
        .select("rank", "vec_id", "mahalanobis_sq")
    )


EMBEDDING_MAHALANOBIS_OUTLIERS_SQL = f"""
WITH ex AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
), stats AS (
  SELECT dim, m, greatest(m2 - m * m, 1e-9) AS v
  FROM (
    SELECT dim, round(avg(val), 6) AS m,
           round(avg(val * val), 6) AS m2
    FROM ex GROUP BY dim)
), scored AS (
  SELECT e.vec_id,
         round(CAST(sum(CAST(round(
           (e.val - s.m) * (e.val - s.m) / s.v, 6) AS DECIMAL(18,6)))
           AS DOUBLE), 4) AS mahalanobis_sq
  FROM ex e JOIN stats s USING (dim)
  GROUP BY e.vec_id
)
SELECT CAST(row_number() OVER (
         ORDER BY mahalanobis_sq DESC, vec_id ASC) AS BIGINT) AS rank,
       vec_id, mahalanobis_sq
FROM scored
ORDER BY rank
LIMIT {MAHAL_TOP_K}
"""


# ---------- seasonal-naive forecast backtest ----------
#
# The forecasting-evaluation primitive: forecast each nation's monthly
# revenue with the SEASONAL NAIVE model (same month last year) and
# backtest it — per nation, the count of testable months and the MAPE.
# Seasonal naive is the baseline every real forecasting system must
# beat, so its backtest is the first number a pipeline publishes.
#
# Exactness: monthly revenue is an exact DECIMAL(38,2) sum; the
# year-back peer is matched by integer month number (a self-join, not
# lag — robust to missing months); each APE is rounded at 9dp and
# summed as DECIMAL, one final division. Scale: one fact shuffle for
# the (nation, month) aggregate; the self-join runs on the tiny
# aggregate relation.


def nation_seasonal_naive_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).alias("mnum"),
            F.col("o_totalprice").cast("decimal(38,2)").alias("p"),
        )
        .groupBy("n_name", "mnum")
        .agg(F.sum("p").alias("rev"))
    )
    cur, past = monthly.alias("cur"), monthly.alias("past")
    joined = cur.join(
        past,
        (F.col("cur.n_name") == F.col("past.n_name"))
        & (F.col("cur.mnum") == F.col("past.mnum") + 12),
    )
    ape = F.round(
        F.abs(
            F.col("cur.rev").cast("double")
            - F.col("past.rev").cast("double")
        )
        / F.col("cur.rev").cast("double"),
        9,
    ).cast("decimal(28,9)")
    return (
        joined.groupBy(F.col("cur.n_name").alias("n_name"))
        .agg(
            F.count("*").cast("long").alias("n_backtests"),
            F.sum(ape).alias("sum_ape"),
        )
        .select(
            "n_name",
            "n_backtests",
            F.round(
                F.col("sum_ape").cast("double")
                / F.col("n_backtests").cast("double"),
                6,
            ).alias("mape"),
        )
    )


NATION_SEASONAL_NAIVE_BACKTEST_SQL = """
WITH monthly AS (
  SELECT n.n_name,
         year(o.o_orderdate) * 12 + month(o.o_orderdate) AS mnum,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,2)))
              AS DECIMAL(38,2)) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT cur.n_name,
       count(*) AS n_backtests,
       round(CAST(sum(CAST(round(
           abs(CAST(cur.rev AS DOUBLE) - CAST(past.rev AS DOUBLE))
           / CAST(cur.rev AS DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE), 6) AS mape
FROM monthly cur
JOIN monthly past
  ON cur.n_name = past.n_name AND cur.mnum = past.mnum + 12
GROUP BY cur.n_name
"""


QUERIES["embedding_mahalanobis_outliers"] = (
    embedding_mahalanobis_outliers,
    EMBEDDING_MAHALANOBIS_OUTLIERS_SQL,
)
QUERIES["nation_seasonal_naive_backtest"] = (
    nation_seasonal_naive_backtest,
    NATION_SEASONAL_NAIVE_BACKTEST_SQL,
)


# ---------- two-sample Kolmogorov–Smirnov test ----------
#
# D = max_v |F1(v) − F2(v)| between two customer segments' account-
# balance distributions — the exact distribution-drift primitive that
# complements the binned PSI monitor (PSI needs bin choices; KS does
# not). EXACT ARITHMETIC THROUGHOUT: at each distinct balance the
# statistic's numerator is the integer |c1·n2 − c2·n1| (cumulative
# counts cross-multiplied), so the max is an integer comparison and
# the single division happens once at the end — no float CDFs.
#
# Scale posture: the cumulative window runs over the DISTINCT-value
# relation ordered globally (narrow: value + two counts ≈ 24 B/row) —
# the same documented exact-total-order posture as the curriculum/RFM
# family. The 100 TB form is the round-9 twin
# analytics_ext8.customer_balance_ks_binned: 256 integer bins, no
# single-partition window, strict-oracle d_lo ≤ D ≤ d_up brackets.

KS_SEG_A = "BUILDING"
KS_SEG_B = "MACHINERY"


def customer_balance_ks_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment", F.col("c_acctbal").cast("double").alias("v")
    )
    both = c.filter(
        F.col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B)
    ).select(
        "v",
        F.when(F.col("c_mktsegment") == KS_SEG_A, 1)
        .otherwise(0)
        .alias("a"),
        F.when(F.col("c_mktsegment") == KS_SEG_B, 1)
        .otherwise(0)
        .alias("b"),
    )
    per_v = both.groupBy("v").agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_v.select(
        "v",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
    )
    tot = both.groupBy().agg(
        F.sum("a").cast("long").alias("n1"),
        F.sum("b").cast("long").alias("n2"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(
                    F.col("ca") * F.col("n2") - F.col("cb") * F.col("n1")
                )
            ).alias("d_num")
        )
        .select(
            "n1",
            "n2",
            F.col("d_num").cast("long").alias("d_num"),
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"),
                9,
            ).alias("d_stat"),
        )
    )


CUSTOMER_BALANCE_KS_TEST_SQL = f"""
WITH two_seg AS (
  SELECT CAST(c_acctbal AS DOUBLE) AS v,
         CASE WHEN c_mktsegment = '{KS_SEG_A}' THEN 1 ELSE 0 END AS a,
         CASE WHEN c_mktsegment = '{KS_SEG_B}' THEN 1 ELSE 0 END AS b
  FROM customer
  WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
), per_v AS (
  SELECT v, sum(a) AS na, sum(b) AS nb FROM two_seg GROUP BY v
), cum AS (
  SELECT v,
         sum(na) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS ca,
         sum(nb) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cb
  FROM per_v
), tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2
  FROM two_seg
)
SELECT t.n1, t.n2,
       CAST(max(abs(c.ca * t.n2 - c.cb * t.n1)) AS BIGINT) AS d_num,
       round(CAST(max(abs(c.ca * t.n2 - c.cb * t.n1)) AS DOUBLE)
             / CAST(t.n1 * t.n2 AS DOUBLE), 9) AS d_stat
FROM cum c CROSS JOIN tot t
GROUP BY t.n1, t.n2
"""


# ---------- per-source Jensen–Shannon divergence ----------
#
# Which sources are distributionally UNUSUAL? Per source s, the JSD
# between its term distribution P_s and the corpus distribution Q:
#   JSD = 0.5·Σ_t p ln(p/m) + 0.5·Σ_t q ln(q/m),  m = (p+q)/2
# — symmetric, bounded by ln 2, zero iff P_s = Q. The corpus-mix
# diagnostic that ranks sources for curation review (DSIR/source-mix
# ops decide WEIGHTS; this flags distribution outliers).
#
# Exactness: p, q, m derive from exact integer counts with single
# divisions; every ln contribution is rounded at 9dp and summed as
# DECIMAL per source (one decimal fold over |sources| × |vocab| rows).
# Scale: the spine is sources × vocabulary — at open vocabulary cap
# the vocab by document frequency (the inverted-index MIN_DF
# discipline); counts aggregate map-side, the spine join broadcasts
# the (tiny) per-source and corpus-term marginals.


def text_source_js_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("source", "text")
    toks = d.select(
        "source", F.explode(F.expr(NB_TOKEN_EXPR)).alias("term")
    )
    st = toks.groupBy("source", "term").agg(
        F.count("*").alias("n_st")
    ).localCheckpoint(eager=True)
    s_tot = st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    t_tot = st.groupBy("term").agg(F.sum("n_st").alias("n_t"))
    corpus_n = st.groupBy().agg(F.sum("n_st").alias("n_all"))
    spine = (
        s_tot.crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(corpus_n))
        .join(F.broadcast(st), ["source", "term"], "left")
        .select(
            "source",
            "n_s",
            (
                F.coalesce(F.col("n_st"), F.lit(0)).cast("double")
                / F.col("n_s").cast("double")
            ).alias("p"),
            (
                F.col("n_t").cast("double")
                / F.col("n_all").cast("double")
            ).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / F.lit(2.0)
    contrib = (
        F.when(
            F.col("p") > 0,
            F.lit(0.5) * F.col("p") * F.log(F.col("p") / m),
        ).otherwise(F.lit(0.0))
        + F.lit(0.5) * F.col("q") * F.log(F.col("q") / m)
    )
    return (
        spine.select(
            "source",
            "n_s",
            F.round(contrib, 9).cast("decimal(28,9)").alias("c"),
        )
        .groupBy("source", "n_s")
        .agg(F.sum("c").alias("dec_jsd"))
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            F.round(F.col("dec_jsd").cast("double"), 6).alias("jsd"),
        )
    )


TEXT_SOURCE_JS_DIVERGENCE_SQL = """
WITH toks AS (
  SELECT source, lower(t.term) AS term
  FROM documents,
       unnest(string_split_regex(text, '[^a-zA-Z]+')) AS t(term)
  WHERE length(t.term) >= 3
), st AS (
  SELECT source, term, count(*) AS n_st FROM toks GROUP BY 1, 2
), s_tot AS (SELECT source, sum(n_st) AS n_s FROM st GROUP BY 1),
t_tot AS (SELECT term, sum(n_st) AS n_t FROM st GROUP BY 1),
corpus_n AS (SELECT sum(n_st) AS n_all FROM st),
spine AS (
  SELECT s.source, s.n_s,
         CAST(coalesce(x.n_st, 0) AS DOUBLE) / CAST(s.n_s AS DOUBLE) AS p,
         CAST(t.n_t AS DOUBLE) / (SELECT CAST(n_all AS DOUBLE) FROM corpus_n)
           AS q
  FROM s_tot s
  CROSS JOIN t_tot t
  LEFT JOIN st x ON x.source = s.source AND x.term = t.term
)
SELECT source,
       CAST(n_s AS BIGINT) AS n_tokens,
       round(CAST(sum(CAST(round(
           CASE WHEN p > 0
                THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
           + 0.5 * q * ln(q / ((p + q) / 2.0)), 9) AS DECIMAL(28,9)))
         AS DOUBLE), 6) AS jsd
FROM spine
GROUP BY source, n_s
"""


QUERIES["customer_balance_ks_test"] = (
    customer_balance_ks_test,
    CUSTOMER_BALANCE_KS_TEST_SQL,
)
QUERIES["text_source_js_divergence"] = (
    text_source_js_divergence,
    TEXT_SOURCE_JS_DIVERGENCE_SQL,
)
