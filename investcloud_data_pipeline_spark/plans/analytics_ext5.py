"""Extended analytics operators, wave 5: curriculum training order,
a language-id confusion-matrix evaluation, and reorder-gap survival
curves.

These compose existing strict-oracle building blocks (the quality
score, the stopword language guesser) into the evaluation/ordering
operators a training-data pipeline runs after its filters: "in what
order do we feed the surviving documents?", "how good is the lang-id
gate?", "how long do customers survive between orders?". Each oracle
reuses the building block's OWN DuckDB twin as a CTE, so the
composition is checked end to end, not just the last stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as TX
from ..sources.batch import load_table
from ..stores import stores_enabled
from .training_data import TEXT_LANGUAGE_ID_SQL, TEXT_QUALITY_SCORE_SQL


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------- curriculum training order ----------
#
# Deterministic curriculum for the packed corpus: rank documents into
# quality deciles (best decile = bin 1, fed first), then SHUFFLE within
# each decile with the seeded-md5 key the global-shuffle operator uses
# — curriculum across bins, decorrelation within bins, and an epoch
# seed swap re-shuffles every bin with zero coordination. Output is
# (doc_id, curriculum_bin, pos_in_bin): the feed order is bin-major.
#
# Scale posture: ntile is an exact global rank — the scored relation
# is NARROW (doc_id, score: ~16 bytes/row), which is the same
# documented posture as the RFM segments and decile-lift queries. The
# extreme-scale path is IMPLEMENTED below (`corpus_curriculum_order_
# approx` / `corpus_curriculum_bins_approx` on operators/binning.py's
# percentile_approx bin edges — no single-partition WindowExec
# anywhere, plan-pinned); this exact variant stays as the strict
# oracle twin. The within-bin shuffle partitions by bin (10
# partitions of equal size by construction).

CURRICULUM_BINS = 10
CURRICULUM_SEED = "epoch0"


def corpus_curriculum_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scored = TX.quality_score(
        _t(spark, sf_dir, "documents")
    ).select("doc_id", "quality_score")
    wb = Window.orderBy(F.desc("quality_score"), F.asc("doc_id"))
    binned = scored.withColumn(
        "curriculum_bin", F.ntile(CURRICULUM_BINS).over(wb)
    )
    key = F.md5(
        F.concat(
            F.lit(CURRICULUM_SEED + ":"),
            F.col("doc_id").cast("string"),
        )
    )
    wp = Window.partitionBy("curriculum_bin").orderBy(
        key.asc(), F.col("doc_id").asc()
    )
    return binned.select(
        "doc_id",
        F.col("curriculum_bin").cast("long").alias("curriculum_bin"),
        F.row_number().over(wp).cast("long").alias("pos_in_bin"),
    )


CORPUS_CURRICULUM_ORDER_SQL = f"""
WITH q AS ({TEXT_QUALITY_SCORE_SQL}),
binned AS (
  SELECT doc_id,
         ntile({CURRICULUM_BINS}) OVER (
           ORDER BY quality_score DESC, doc_id ASC) AS curriculum_bin
  FROM q
)
SELECT doc_id, curriculum_bin,
       row_number() OVER (
         PARTITION BY curriculum_bin
         ORDER BY md5('{CURRICULUM_SEED}:' || CAST(doc_id AS VARCHAR)) ASC,
                  doc_id ASC) AS pos_in_bin
FROM binned
"""


# ---------- curriculum order, extreme-scale (approximate bins) ----------
#
# The same curriculum contract as corpus_curriculum_order, with the
# exact ntile (Exchange SinglePartition + one WindowExec sort of the
# whole scored corpus) replaced by percentile_approx bin edges +
# broadcast bin assignment (operators/binning.py). At 100 TB the exact
# query as written funnels every document through one task; this path
# has NO single-partition exchange anywhere (plan-pinned in
# tests/test_scale_posture.py) — the within-bin position window
# partitions by curriculum_bin.
#
# Correctness strategy: percentile_approx is a Spark-side mergeable
# sketch with no DuckDB equivalent, so the per-document ordering is
# rows-only (justified in __spark_entry__.ROWS_ONLY) and the companion
# query `corpus_curriculum_bins_approx` carries the STRICT oracle: it
# emits per-bin population-bound booleans plus the total document
# count, and DuckDB asserts the booleans as literal TRUE and the total
# exactly — a sketch regression that skews any bin past ±50% of the
# ideal population, drops a document, or empties a bin (rowcount)
# fails the ledger. The exact ntile variant above remains the strict
# per-document oracle twin of the curriculum semantics themselves.

CURRICULUM_POP_SLACK = 0.5  # each bin within ±50% of n/bins


def _curriculum_binned_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.binning import approx_quantile_bins

    scored = TX.quality_score(
        _t(spark, sf_dir, "documents")
    ).select("doc_id", "quality_score")
    return approx_quantile_bins(
        scored,
        "quality_score",
        CURRICULUM_BINS,
        descending=True,
        bin_col="curriculum_bin",
    )


def corpus_curriculum_order_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    binned = _curriculum_binned_approx(spark, sf_dir)
    key = F.md5(
        F.concat(
            F.lit(CURRICULUM_SEED + ":"),
            F.col("doc_id").cast("string"),
        )
    )
    wp = Window.partitionBy("curriculum_bin").orderBy(
        key.asc(), F.col("doc_id").asc()
    )
    return binned.select(
        "doc_id",
        F.col("curriculum_bin").cast("long").alias("curriculum_bin"),
        F.row_number().over(wp).cast("long").alias("pos_in_bin"),
    )


def corpus_curriculum_bins_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    binned = _curriculum_binned_approx(spark, sf_dir)
    per_bin = binned.groupBy("curriculum_bin").agg(
        F.count("*").alias("_n_docs")
    )
    tot = binned.groupBy().agg(F.count("*").alias("docs_total"))
    ideal = F.col("docs_total").cast("double") / F.lit(
        float(CURRICULUM_BINS)
    )
    lo = F.floor(ideal * (1.0 - CURRICULUM_POP_SLACK))
    hi = F.ceil(ideal * (1.0 + CURRICULUM_POP_SLACK))
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            F.col("curriculum_bin").cast("long").alias("curriculum_bin"),
            (
                (F.col("_n_docs") >= lo) & (F.col("_n_docs") <= hi)
            ).alias("pop_ok"),
            F.col("docs_total").cast("long").alias("docs_total"),
        )
    )


CORPUS_CURRICULUM_BINS_APPROX_SQL = f"""
SELECT CAST(t.b AS BIGINT) AS curriculum_bin,
       TRUE AS pop_ok,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS docs_total
FROM range(1, {CURRICULUM_BINS} + 1) AS t(b)
"""


# ---------- language-id confusion matrix ----------
#
# Evaluate the stopword language guesser against the labeled lang
# column: the full confusion matrix plus per-cell recall share
# (cell / label total) and precision share (cell / guess total) — the
# numbers that say WHICH languages the gate confuses, not just how
# often. Totals derive from the same aggregated cell relation (the
# chi-square/MI discipline — one pass over predictions, no re-scan).
#
# Scale: the prediction pass is pure column expressions (JVM,
# codegen); the matrix is |langs|^2 rows after one cell aggregate.


def text_langid_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pred = TX.language_id(_t(spark, sf_dir, "documents"))
    cells = pred.groupBy("labeled_lang", "guessed_lang").agg(
        F.count("*").alias("n_docs")
    )
    cells = cells.persist()
    label_tot = cells.groupBy("labeled_lang").agg(
        F.sum("n_docs").alias("label_total")
    )
    guess_tot = cells.groupBy("guessed_lang").agg(
        F.sum("n_docs").alias("guess_total")
    )
    return (
        cells.join(F.broadcast(label_tot), "labeled_lang")
        .join(F.broadcast(guess_tot), "guessed_lang")
        .select(
            "labeled_lang",
            "guessed_lang",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double")
                / F.col("label_total").cast("double"),
                6,
            ).alias("recall_share"),
            F.round(
                F.col("n_docs").cast("double")
                / F.col("guess_total").cast("double"),
                6,
            ).alias("precision_share"),
        )
    )


TEXT_LANGID_CONFUSION_SQL = f"""
WITH pred AS ({TEXT_LANGUAGE_ID_SQL}),
cells AS (
  SELECT labeled_lang, guessed_lang, count(*) AS n_docs
  FROM pred GROUP BY 1, 2
), lt AS (
  SELECT labeled_lang, sum(n_docs) AS label_total FROM cells GROUP BY 1
), gt AS (
  SELECT guessed_lang, sum(n_docs) AS guess_total FROM cells GROUP BY 1
)
SELECT c.labeled_lang, c.guessed_lang, c.n_docs,
       round(CAST(c.n_docs AS DOUBLE) / CAST(l.label_total AS DOUBLE), 6)
         AS recall_share,
       round(CAST(c.n_docs AS DOUBLE) / CAST(g.guess_total AS DOUBLE), 6)
         AS precision_share
FROM cells c
JOIN lt l USING (labeled_lang)
JOIN gt g USING (guessed_lang)
"""


# ---------- reorder-gap survival curve ----------
#
# Customer-retention survival: for each consecutive-order gap (lag
# over each customer's order history), what share of gaps exceeds t
# days, for t in SURVIVAL_DAYS? The discrete survival curve S(t) a
# retention model is calibrated against. Gaps are exact integer day
# differences; one division per threshold, rounded to 6dp.
#
# Scale: ONE window shuffle on o_custkey over a two-column projection;
# the thresholds explode each gap row into |SURVIVAL_DAYS| tiny rows
# AFTER the gap relation is computed (bounded x5), and the final
# aggregate is 5 rows.

SURVIVAL_DAYS = (7, 14, 30, 60, 90)


def customer_reorder_survival(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        o.withColumn("prev_d", F.lag("d").over(w))
        .filter(F.col("prev_d").isNotNull())
        .select(F.datediff("d", "prev_d").alias("gap_days"))
    )
    t = F.explode(
        F.array(*[F.lit(x) for x in SURVIVAL_DAYS])
    ).alias("threshold_days")
    return (
        gaps.select("gap_days", t)
        .groupBy("threshold_days")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum(
                F.when(F.col("gap_days") > F.col("threshold_days"), 1)
                .otherwise(0)
            ).alias("n_surviving"),
        )
        .select(
            "threshold_days",
            "n_gaps",
            "n_surviving",
            F.round(
                F.col("n_surviving").cast("double")
                / F.col("n_gaps").cast("double"),
                6,
            ).alias("survival_share"),
        )
    )


CUSTOMER_REORDER_SURVIVAL_SQL = f"""
WITH gaps AS (
  SELECT date_diff('day', prev_d, d) AS gap_days
  FROM (
    SELECT CAST(o_orderdate AS DATE) AS d,
           lag(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_d
    FROM orders
  )
  WHERE prev_d IS NOT NULL
)
SELECT t.threshold_days,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(CASE WHEN gap_days > t.threshold_days THEN 1 ELSE 0 END)
            AS BIGINT) AS n_surviving,
       round(CAST(sum(CASE WHEN gap_days > t.threshold_days THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS survival_share
FROM gaps
CROSS JOIN (VALUES {", ".join(f"({x})" for x in SURVIVAL_DAYS)})
  AS t(threshold_days)
GROUP BY t.threshold_days
"""


QUERIES = {
    "corpus_curriculum_order": (
        corpus_curriculum_order,
        CORPUS_CURRICULUM_ORDER_SQL,
    ),
    "corpus_curriculum_order_approx": (
        corpus_curriculum_order_approx,
        None,  # percentile_approx edges are engine-specific; see ROWS_ONLY
    ),
    "corpus_curriculum_bins_approx": (
        corpus_curriculum_bins_approx,
        CORPUS_CURRICULUM_BINS_APPROX_SQL,
    ),
    "text_langid_confusion": (
        text_langid_confusion,
        TEXT_LANGID_CONFUSION_SQL,
    ),
    "customer_reorder_survival": (
        customer_reorder_survival,
        CUSTOMER_REORDER_SURVIVAL_SQL,
    ),
}


# ---------- product quantization codes ----------
#
# The ANN-compression path real vector stores run (FAISS-style PQ):
# split each 64-dim embedding into PQ_SUBSPACES contiguous subvectors
# and store, per subspace, only the index of the nearest codebook
# entry — 64 floats become PQ_SUBSPACES small ints. The codebook here
# is a SEEDED SAMPLE: the PQ_CODEBOOK vectors with the smallest
# md5(seed:vec_id) are the centers (deterministic, coordination-free;
# the k-means-refined codebook is the quality upgrade and would be
# rows-only — the sampled one keeps the whole operator strict-oracle).
#
# Cross-engine exactness: subspace distances are fixed-order left
# folds of (x-y)^2 in double over float32 inputs (bit-identical ops in
# both engines), ROUNDED TO 9dp BEFORE the argmin — a 1-ulp fold
# divergence can never flip a code — with center rank as the tie-break;
# the reconstruction error sums the 8 rounded subspace distances as
# DECIMAL (order-independent) and rounds once at 6dp.
#
# Scale: assignment is the textbook O(N x K x M) PQ cost — a broadcast
# of K=16 centers against the vector table, the x(K*M) expansion
# happening AFTER the slice projection; no shuffle of the vectors at
# all until the per-vector regroup (one hash exchange on vec_id).

PQ_SUBSPACES = 8
PQ_SUBDIM = 8
PQ_CODEBOOK = 16
PQ_SEED = "pq0"


def _pq_centers(emb: DataFrame) -> DataFrame:
    """The seeded-sample codebook: the PQ_CODEBOOK vectors with the
    smallest md5(seed:vec_id), ranked (crank 1..K)."""
    key = F.md5(
        F.concat(F.lit(PQ_SEED + ":"), F.col("vec_id").cast("string"))
    )
    return (
        emb.select("vec_id", "embedding", key.alias("k"))
        .orderBy("k", "vec_id")
        .limit(PQ_CODEBOOK)
        .select(
            F.row_number()
            .over(Window.orderBy("k", "vec_id"))
            .alias("crank"),
            F.col("embedding").alias("cemb"),
        )
    )


def _pq_dist_s(s: int, left: str = "embedding", right: str = "cemb"):
    """Subspace-s squared L2 between two 64-dim array columns: a
    fixed-order double fold rounded to 9dp (the cross-engine argmin
    discipline)."""
    a = s * PQ_SUBDIM + 1
    return F.round(
        F.expr(
            f"""
aggregate(
  zip_with(slice({left}, {a}, {PQ_SUBDIM}),
           slice({right}, {a}, {PQ_SUBDIM}),
           (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                   * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
  CAST(0 AS DOUBLE), (acc, e) -> acc + e)
"""
        ),
        9,
    )


# Shared squared-diff restructure (round-12, guide §1.2 "per-task
# work"): evaluating _pq_dist_s once per subspace re-slices BOTH input
# arrays and runs a separate zip_with per subspace — 16 slice
# allocations and 8 lambda evaluations per row. Computing the
# element-wise squared diff ONCE over the full width and folding each
# subspace's slice of it is the identical arithmetic — same (x−y)²
# doubles, same left-fold order, same 0.0 init, so every distance is
# bit-identical (pinned by test_pq_dist_shared_diff2_bit_identical) —
# at ~40% of the expression cost. The two projections must stay
# separate: CollapseProject would otherwise inline the 8 references
# (collapseProjectAlwaysInline=false keeps the non-cheap alias shared).
_PQ_D2 = "__pq_d2"


def _pq_diff2(left: str, right: str):
    """Element-wise (x − y)² over the full array width (one zip_with)."""
    return F.expr(
        f"""zip_with({left}, {right},
  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
          * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))"""
    )


def _pq_dist_from_d2(s: int, d2: str = _PQ_D2):
    """Subspace-s distance from the shared diff² array — the same
    fixed-order fold + 9dp round as _pq_dist_s."""
    a = s * PQ_SUBDIM + 1
    return F.round(
        F.expr(
            f"aggregate(slice({d2}, {a}, {PQ_SUBDIM}),"
            f" CAST(0 AS DOUBLE), (acc, e) -> acc + e)"
        ),
        9,
    )


def _pq_best(
    emb: DataFrame,
    centers: DataFrame,
    extra_cols: tuple = (),
) -> DataFrame:
    """Per vector: the argmin (d, crank) struct per subspace, computed
    with all PQ_SUBSPACES distances in one projection over the
    broadcast codebook and 8 independent min(struct) aggregates — ONE
    hash exchange total (map-side partial mins), no x8 row explosion.
    ``extra_cols`` ride along in the group key (functionally dependent
    on vec_id — e.g. the IVF cell id), so callers don't pay a second
    join to re-attach them."""
    pairs = emb.crossJoin(F.broadcast(centers))
    scored = pairs.select(
        "vec_id",
        *extra_cols,
        "crank",
        _pq_diff2("embedding", "cemb").alias(_PQ_D2),
    ).select(
        "vec_id",
        *extra_cols,
        "crank",
        *[_pq_dist_from_d2(s).alias(f"d{s}") for s in range(PQ_SUBSPACES)],
    )
    return scored.groupBy("vec_id", *extra_cols).agg(
        *[
            F.min(
                F.struct(
                    F.col(f"d{s}").alias("d"), F.col("crank").alias("crank")
                )
            ).alias(f"b{s}")
            for s in range(PQ_SUBSPACES)
        ]
    )


# Session-scoped PQ stores (round-12 optimization). The seeded-sample
# codebook's per-vector argmin relation (``_pq_best``) is the shared
# upstream of BOTH strict PQ queries (embedding_pq_codes derives the
# code strings, ann_pq_adc_topk the stacked (s, crank) codes), and the
# K=64 k-means path's fitted codebook + Arrow-encoded codes are a
# build-once index exactly like the IVF-PQ triple below. Same
# applicationId-keyed memo + eager localCheckpoint discipline as
# plans/training_data.py's pair caches; values are unchanged — the
# stores materialize the identical relations the queries inlined.
_PQ_STORE: dict[tuple, object] = {}


def _pq_best16_cached(
    spark: SparkSession, sf_dir: str, emb: DataFrame
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, "pq_best16")
    df = _PQ_STORE.get(key) if stores_enabled() else None
    if df is None:
        df = _pq_best(emb, _pq_centers(emb)).localCheckpoint(eager=True)
        if stores_enabled():
            _PQ_STORE[key] = df
    return df


def _pq_km_index_cached(
    spark: SparkSession, sf_dir: str, emb: DataFrame
) -> tuple:
    """(centers, codes) for the K=64 per-subspace k-means codebook —
    fit + one fused Arrow encode per session instead of per execution
    (the ``_ivf_pq_index_cached`` economics)."""
    key = (spark.sparkContext.applicationId, sf_dir, "pq_km_index")
    got = _PQ_STORE.get(key) if stores_enabled() else None
    if got is None:
        centers = _pq_kmeans_centers(spark, emb)
        codes = _pq_codes_arrow(emb, centers).localCheckpoint(
            eager=True
        )
        got = (centers, codes)
        if stores_enabled():
            _PQ_STORE[key] = got
    return got


def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    best = _pq_best16_cached(spark, sf_dir, emb)
    codes = F.concat_ws(
        ",",
        *[
            (F.col(f"b{s}.crank") - 1).cast("string")
            for s in range(PQ_SUBSPACES)
        ],
    )
    err = sum(
        (
            F.col(f"b{s}.d").cast("decimal(18,9)")
            for s in range(PQ_SUBSPACES)
        ),
        F.lit(0).cast("decimal(18,9)"),
    )
    return best.select(
        "vec_id",
        codes.alias("pq_codes"),
        F.round(err.cast("double"), 6).alias("recon_err"),
    )


EMBEDDING_PQ_CODES_SQL = f"""
WITH ranked AS (
  SELECT vec_id, embedding,
         row_number() OVER (
           ORDER BY md5('{PQ_SEED}:' || CAST(vec_id AS VARCHAR)), vec_id
         ) AS crank
  FROM embeddings
), centers AS (
  SELECT crank, embedding AS cemb FROM ranked WHERE crank <= {PQ_CODEBOOK}
), sub AS (SELECT unnest(range({PQ_SUBSPACES})) AS s),
scored AS (
  SELECT v.vec_id, sub.s, c.crank,
         round(list_sum(list_transform(range(1, {PQ_SUBDIM} + 1), i ->
           (CAST(v.embedding[CAST(sub.s * {PQ_SUBDIM} AS INT) + i] AS DOUBLE)
            - CAST(c.cemb[CAST(sub.s * {PQ_SUBDIM} AS INT) + i] AS DOUBLE))
           * (CAST(v.embedding[CAST(sub.s * {PQ_SUBDIM} AS INT) + i] AS DOUBLE)
              - CAST(c.cemb[CAST(sub.s * {PQ_SUBDIM} AS INT) + i] AS DOUBLE)))),
           9) AS d
  FROM embeddings v CROSS JOIN centers c CROSS JOIN sub
), best AS (
  SELECT vec_id, s,
         min(d) AS d,
         CAST(min(crank) FILTER (WHERE d = mind) - 1 AS BIGINT) AS code
  FROM (
    SELECT vec_id, s, crank, d,
           min(d) OVER (PARTITION BY vec_id, s) AS mind
    FROM scored
  )
  GROUP BY 1, 2
)
SELECT vec_id,
       string_agg(CAST(code AS VARCHAR), ',' ORDER BY s) AS pq_codes,
       round(CAST(sum(CAST(d AS DECIMAL(18,9))) AS DOUBLE), 6) AS recon_err
FROM best GROUP BY vec_id
"""


QUERIES["embedding_pq_codes"] = (
    embedding_pq_codes,
    EMBEDDING_PQ_CODES_SQL,
)


# ---------- ANN via PQ asymmetric distance (ADC) ----------
#
# The search half of product quantization: rank the whole collection
# against each query using only the CODES — the asymmetric distance
# ADC(q, v) = sum over subspaces of d(q_sub, center[code_s(v)]).
# Per query the work is a K x M lookup table (distances from the
# query's subvectors to every codebook entry) plus one table-scan of
# the codes; the vectors themselves are never touched at query time,
# which is the PQ memory/bandwidth win.
#
# Plan: the (query, crank, subspace) lookup table is 10 x 16 x 8 rows
# — broadcast; vector codes unpivot to (vec_id, s, crank) and join the
# lookup on (s, crank); the per-(query, vector) decimal sum is one
# hash exchange; top-5 per query via WindowGroupLimit. Exactness:
# distances are the same 9dp-rounded folds as the code assignment, the
# ADC sum is a decimal sum of rounded terms, ties break on vec_id —
# strict-oracle like the rest of the PQ family. Recall vs the exact
# ranking is recorded in ANN_RECALL (the seeded-sample codebook trades
# recall for oracle-exactness; the IVF/k-means path is the quality
# upgrade).

PQ_ADC_K = 5


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = PQ_ADC_K,
    centers: DataFrame | None = None,
    arrow_codes: bool = False,
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k of ``queries`` (qid, qemb) against the PQ codes of
    ``emb`` (vec_id, embedding). Shared by the registry query and the
    recall-ledger tool. ``centers`` overrides the seeded-sample
    codebook with a caller-built (crank, cemb) frame — the per-subspace
    slices of each cemb row are independent, so independently fitted
    per-subspace codebooks pack into PQ_CODEBOOK synthetic full-width
    vectors (the k-means upgrade path the recall tool measures).
    ``arrow_codes`` swaps the code-assignment half for the vectorized
    matmul kernel — ONLY valid for rows-only callers (the strict
    ann_pq_adc_topk keeps the 9dp fixed-order expression folds that
    make it oracle-exact)."""
    if centers is None:
        centers = _pq_centers(emb)
    if codes is None:
        if arrow_codes:
            codes = _pq_codes_arrow(emb, centers)
        else:
            best = _pq_best(emb, centers)
            codes = best.select(
                "vec_id",
                F.expr(
                    "stack("
                    + str(PQ_SUBSPACES)
                    + ", "
                    + ", ".join(
                        f"{s}, b{s}.crank" for s in range(PQ_SUBSPACES)
                    )
                    + ") AS (s, crank)"
                ),
            )
    qc = queries.crossJoin(F.broadcast(centers)).select(
        "qid",
        "crank",
        _pq_diff2("qemb", "cemb").alias(_PQ_D2),
    ).select(
        "qid",
        "crank",
        *[
            _pq_dist_from_d2(s).alias(f"qd{s}")
            for s in range(PQ_SUBSPACES)
        ],
    )
    lookup = qc.select(
        "qid",
        "crank",
        F.expr(
            "stack("
            + str(PQ_SUBSPACES)
            + ", "
            + ", ".join(f"{s}, qd{s}" for s in range(PQ_SUBSPACES))
            + ") AS (s, qd)"
        ),
    )
    adc = (
        codes.join(F.broadcast(lookup), ["s", "crank"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(F.col("qd").cast("decimal(18,9)")).alias("dec_adc")
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("dec_adc").asc(), F.col("vec_id").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "rank",
            "vec_id",
            F.round(F.col("dec_adc").cast("double"), 6).alias(
                "adc_dist"
            ),
        )
    )


def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
    )
    # codes derive from the session-shared _pq_best relation (the same
    # stack expression pq_adc_topk would inline) — the expression-fold
    # code assignment runs once per session, shared with
    # embedding_pq_codes; values identical by construction
    codes = _pq_best16_cached(spark, sf_dir, emb).select(
        "vec_id",
        F.expr(
            "stack("
            + str(PQ_SUBSPACES)
            + ", "
            + ", ".join(f"{s}, b{s}.crank" for s in range(PQ_SUBSPACES))
            + ") AS (s, crank)"
        ),
    )
    return pq_adc_topk(emb, queries, k=PQ_ADC_K, codes=codes)


def _pq_adc_sql() -> str:
    sub_dists = lambda l, r: ",\n         ".join(
        f"""round(list_sum(list_transform(range(1, {PQ_SUBDIM} + 1), i ->
           (CAST({l}[{s * PQ_SUBDIM} + i] AS DOUBLE)
            - CAST({r}[{s * PQ_SUBDIM} + i] AS DOUBLE))
           * (CAST({l}[{s * PQ_SUBDIM} + i] AS DOUBLE)
              - CAST({r}[{s * PQ_SUBDIM} + i] AS DOUBLE)))), 9) AS d{s}"""
        for s in range(PQ_SUBSPACES)
    )
    code_stack = ", ".join(
        f"({s}, b{s})" for s in range(PQ_SUBSPACES)
    )
    qd_stack = ", ".join(f"({s}, qd{s})" for s in range(PQ_SUBSPACES))
    best_cols = ",\n         ".join(
        f"min(crank) FILTER (WHERE d{s} = min(d{s}) OVER ()) AS b{s}"
        for s in range(PQ_SUBSPACES)
    )
    # argmin per subspace: window-min per vec_id then filtered min(crank)
    best_inner = ",\n           ".join(
        f"min(d{s}) OVER (PARTITION BY vec_id) AS m{s}"
        for s in range(PQ_SUBSPACES)
    )
    best_outer = ",\n         ".join(
        f"min(crank) FILTER (WHERE d{s} = m{s}) AS c{s}"
        for s in range(PQ_SUBSPACES)
    )
    return f"""
WITH ranked AS (
  SELECT vec_id, embedding,
         row_number() OVER (
           ORDER BY md5('{PQ_SEED}:' || CAST(vec_id AS VARCHAR)), vec_id
         ) AS crank
  FROM embeddings
), centers AS (
  SELECT crank, embedding AS cemb FROM ranked WHERE crank <= {PQ_CODEBOOK}
), scored AS (
  SELECT v.vec_id, c.crank,
         {sub_dists('v.embedding', 'c.cemb')}
  FROM embeddings v CROSS JOIN centers c
), with_min AS (
  SELECT vec_id, crank,
         {", ".join(f"d{s}" for s in range(PQ_SUBSPACES))},
           {best_inner}
  FROM scored
), best AS (
  SELECT vec_id,
         {best_outer}
  FROM with_min GROUP BY vec_id
), codes AS (
  {" UNION ALL ".join(f"SELECT vec_id, {s} AS s, c{s} AS crank FROM best" for s in range(PQ_SUBSPACES))}
), qdists AS (
  SELECT q.vec_id AS qid, c.crank,
         {sub_dists('q.embedding', 'c.cemb')}
  FROM embeddings q CROSS JOIN centers c
  WHERE q.vec_id < 10
), lookup AS (
  {" UNION ALL ".join(f"SELECT qid, crank, {s} AS s, d{s} AS qd FROM qdists" for s in range(PQ_SUBSPACES))}
), adc AS (
  SELECT l.qid, c.vec_id,
         sum(CAST(l.qd AS DECIMAL(18,9))) AS dec_adc
  FROM codes c JOIN lookup l ON l.s = c.s AND l.crank = c.crank
  WHERE c.vec_id != l.qid
  GROUP BY 1, 2
)
SELECT qid, rank, vec_id,
       round(CAST(dec_adc AS DOUBLE), 6) AS adc_dist
FROM (
  SELECT qid, vec_id, dec_adc,
         row_number() OVER (PARTITION BY qid
                            ORDER BY dec_adc ASC, vec_id ASC) AS rank
  FROM adc
)
WHERE rank <= {PQ_ADC_K}
"""


QUERIES["ann_pq_adc_topk"] = (ann_pq_adc_topk, _pq_adc_sql())


# ---------- ANN via PQ ADC, k-means codebook (the quality path) ----------
#
# Same ADC search as ann_pq_adc_topk, but with the codebook FITTED:
# per-subspace k-means (K=64) instead of the seeded 16-vector sample.
# The recall ladder (ANN_RECALL: sampled-16 0.127 → kmeans-16 0.179 →
# kmeans-64 0.283 on random near-orthogonal 64-d vectors) shows the
# codebook is the recall knob; this registers the fitted variant as a
# first-class query so the honest-but-low sampled number is the
# documented floor, not the shipped default. Rows-only oracle (k-means
# is an iterative fit, like IVF); tools/ann_recall.py records its
# recall and tests/test_analytics_ext5.py pins a recall floor so a
# codebook regression fails CI.
#
# Scale: the per-subspace fits run over 8-dim slices (n×96 bytes) under
# the same 256 MB driver guard as IVF/SemDeDup, falling back to
# distributed Spark ML KMeans per subspace above it (the 100 TB path,
# where 8 sequential fits amortize against the corpus scan); the search
# half is unchanged — codes + broadcast lookup, never the vectors.

PQ_KM_CODEBOOK = 64
PQ_KM_SEED = 142


def _pq_kmeans_centers(
    spark: SparkSession,
    emb: DataFrame,
    k_codebook: int = PQ_KM_CODEBOOK,
    seed: int = PQ_KM_SEED,
) -> DataFrame:
    """(crank, cemb) codebook from independent per-subspace k-means
    fits, packed into synthetic full-width vectors (subspace slices are
    independent in ADC, so packing loses nothing).

    Under the driver-fit guard the full vector matrix is collected ONCE
    and the 8 subspace fits slice it locally — 3 Spark jobs total
    instead of 3 per subspace (measured 7.0s → 5.2s warm on the
    registry query at sf0.1; the remaining cost is the O(N×K×M) ADC
    assignment itself, 4× the K=16 twin's work by construction). The
    fit is identical to per-slice collection:
    kmeans_fit_local canonicalizes row order by the slice's own columns
    before seeding, so the source layout is irrelevant."""
    import numpy as np

    from ..functions.vectors import kmeans_fit_local, to_double_array

    # fused guard job (round-13): one aggregate, not count + first
    n, _first = emb.agg(
        F.count(F.lit(1)), F.first("embedding")
    ).first()
    dim = len(_first) if _first is not None else 0
    # clamp so a tiny corpus (sf0.001) still fits a valid codebook
    k_codebook = max(1, min(k_codebook, n))
    slices = None
    if n >= k_codebook and dim and n * (dim * 8 + 32) <= (256 << 20):
        mat = np.asarray(
            [
                r[0]
                for r in emb.select(
                    to_double_array("embedding")
                ).collect()
            ],
            dtype=np.float64,
        )
        slices = []
        for s in range(PQ_SUBSPACES):
            c = kmeans_fit_local(
                np.ascontiguousarray(
                    mat[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
                ),
                k_codebook,
                seed=seed + s,
            )
            if c is None:
                slices = None
                break
            slices.append(c)
    if slices is None:
        # above the driver-fit guard (or degenerate): distributed
        # Spark ML KMeans per subspace — the 100 TB path
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        slices = []
        for s in range(PQ_SUBSPACES):
            sl = emb.select(
                F.slice(
                    "embedding", s * PQ_SUBDIM + 1, PQ_SUBDIM
                ).alias("v")
            )
            sl_vec = sl.withColumn(
                "features", array_to_vector(to_double_array("v"))
            )
            model = KMeans(
                k=k_codebook,
                seed=seed + s,
                maxIter=8,
                featuresCol="features",
            ).fit(sl_vec)
            slices.append(
                np.asarray([list(cc) for cc in model.clusterCenters()])
            )
    full = np.hstack(slices)
    return spark.createDataFrame(
        [
            (i + 1, [float(x) for x in full[i]])
            for i in range(k_codebook)
        ],
        "crank int, cemb array<float>",
    )


def ann_pq_adc_kmeans_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # build-once index (fit + fused Arrow encode) shared per session —
    # the _ivf_pq_index_cached economics applied to the flat-PQ path
    centers, codes = _pq_km_index_cached(spark, sf_dir, emb)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
    )
    return pq_adc_topk(
        emb, queries, k=PQ_ADC_K, centers=centers, codes=codes
    )


QUERIES["ann_pq_adc_kmeans_topk"] = (ann_pq_adc_kmeans_topk, None)


# ---------- ANN via IVF-PQ with residual coding (the recall path) ----------
#
# The FAISS IVFADC composition: a coarse k-means quantizer splits the
# corpus into IVFPQ_NLIST cells; each vector stores its cell id plus
# the PQ codes of its RESIDUAL (vector minus cell centroid). Residuals
# concentrate around the origin with far less variance than the raw
# vectors, so the same code budget quantizes them much more accurately
# — and the residual ADC sum ||(q - c) - r̂||² IS the full distance
# approximation (no separate coarse term needed). The fine codebook is
# K=256 per subspace — the production 8-bit-code default — shared
# across cells (standard IVFADC; per-cell codebooks would multiply
# codebook memory by nlist for marginal gain).
#
# Search: a query probes its IVFPQ_NPROBE nearest cells; per probed
# cell the (crank → distance) lookup table is built from the QUERY
# residual q - centroid(cell), so each candidate's ADC is exact w.r.t.
# its own cell's residual space. The lookup relation is
# |Q| × nprobe × K × M rows of doubles — broadcast; candidate
# generation is the codes table joining that broadcast on
# (cell, s, crank), which prunes to the probed inverted lists without
# any shuffle of the vectors.
#
# Scale: fit is the guarded-collect + distributed-KMeans skeleton the
# K=64 query uses; encode is O(N×K×M) broadcast work plus ONE hash
# exchange; search shuffles only (qid, vec_id, partial sums). At
# 100 TB the codes table (vec_id, cell, 8 bytes of codes) is the only
# full-corpus relation — stored partitioned by cell, the probe prunes
# partitions exactly like the plain-IVF path. Rows-only oracle
# (iterative k-means fits); recall is recorded in ANN_RECALL and
# floor-pinned in tests/test_analytics_ext5.py.

IVFPQ_NLIST = 16
# Operating point (round-11 re-tune; ladders in ANN_RECALL_r10/_r11):
# the binding constraint is CANDIDATE COVERAGE, measured exactly per
# nprobe against the pipeline's own cell assignment —
# nprobe 8/10/12/14/16 → ceiling 0.811/0.892/0.943/0.983/1.0 — so
# nprobe=12 caps at 0.943 regardless of refine depth; round 11 widens
# to nprobe=14 (ceiling 0.983), where refine=200 measures past the
# 0.95 bar at a wall within noise of nprobe=12 — the probe and refine
# deltas are |Q|-bounded and the k-means fits dominate the query.
# Ladder at sf0.1 (100 queries): (10,100) 0.849 → (12,150) 0.922 →
# (12,200) 0.933 → (14,150) 0.952 → (14,200) see ANN_RECALL_r11. At
# fleet scale nlist grows with the corpus and nprobe/nlist falls;
# 14/16 here is a fixture-sized ratio, not the 100 TB one.
IVFPQ_NPROBE = 14
# Adaptive probe widening (round-12, verdict task #3): a query widens
# from IVFPQ_NPROBE to IVFPQ_NPROBE_MAX cells when the first EXCLUDED
# cell is nearly as close as the last probed one —
# (d[nprobe+1] − d[nprobe]) / d[1] < IVFPQ_MARGIN_TAU — i.e. exactly
# the queries whose coarse ranking is ambiguous at the cut, which are
# the ones fixed-nprobe coverage fails. Tuned on a driver-side exact
# replica of the pipeline at sf0.1 (fits are deterministic, so the
# replica IS the query): fixed 14 → recall 0.970 / min 0.70; tau=0.02
# widens 62/100 queries (~+9% ADC candidates) → 0.983 / min 0.80;
# widening ALL queries (nprobe 16) buys only 0.985 for +14% work.
IVFPQ_NPROBE_MAX = 16
IVFPQ_MARGIN_TAU = 0.02
IVFPQ_CODEBOOK = 256
IVFPQ_SEED = 67


def _pq_codes_arrow(
    emb: DataFrame, centers: DataFrame, extra_cols: tuple = ()
) -> DataFrame:
    """Arrow-vectorized PQ code assignment, already STACKED to
    (vec_id, *extra_cols, s, crank): per batch, each subspace's
    squared-L2 table is ONE dense matmul (x² + c² − 2·X@Cᵀ, rounded to
    9dp, argmin with smallest-crank ties — np.argmin returns the first
    minimum, and the center matrix is crank-ordered).

    This is the codes half of ADC for the ROWS-ONLY fitted-codebook
    paths (K=64 k-means, K=256 IVF-PQ residuals): at K=256 the JVM
    expression path evaluates N×K slice/zip_with/aggregate trees
    (measured 17s at 2k×256 — 4× the K=64 twin, exactly the expression
    overhead), while the matmul is milliseconds — the same
    dense-linear-algebra-beats-expression-trees call as
    vectorized_topk. The strict-oracle K=16 queries keep the
    expression path: their 9dp-rounded fixed-order folds are the
    cross-engine exactness contract.

    Equivalence caveat: x² + c² − 2x·c (matmul) and the fixed-order
    fold of (x − c)² differ in final ulps, and the 9dp pre-argmin
    rounding can still disagree when two centers tie EXACTLY at the
    9th decimal — so on adversarial inputs the argmin can flip
    relative to the expression path. The agreement asserted in
    tests/test_analytics_ext5.py holds on the committed fixtures, not
    as a universal guarantee; that is exactly why this kernel is
    restricted to the rows-only (recall-floor-pinned) paths."""
    import numpy as np

    rows = centers.orderBy("crank").collect()
    cmat = np.asarray([list(r.cemb) for r in rows], dtype=np.float64)
    subs = [
        np.ascontiguousarray(
            cmat[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
        )
        for s in range(PQ_SUBSPACES)
    ]
    sub_sq = [(c * c).sum(axis=1) for c in subs]
    carry = ["vec_id", *extra_cols]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in emb.schema
        if f.name in carry
    ) + ", s int, crank int"

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            cranks = np.empty((n, PQ_SUBSPACES), dtype=np.int32)
            for s in range(PQ_SUBSPACES):
                xs = x[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
                d = (
                    (xs * xs).sum(axis=1)[:, None]
                    + sub_sq[s][None, :]
                    - 2.0 * (xs @ subs[s].T)
                )
                cranks[:, s] = np.round(d, 9).argmin(axis=1) + 1
            out = {
                c: np.repeat(pdf[c].to_numpy(), PQ_SUBSPACES)
                for c in carry
            }
            out["s"] = np.tile(
                np.arange(PQ_SUBSPACES, dtype=np.int32), n
            )
            out["crank"] = cranks.reshape(-1)
            yield pd.DataFrame(out)

    return emb.select(*carry, "embedding").mapInPandas(kernel, schema)


def _ivf_assign(
    spark: SparkSession, emb: DataFrame, n_cells: int, seed: int
) -> tuple:
    """Coarse quantizer: (assigned, cent_df) where assigned is
    (vec_id, ev double-array, cell) and cent_df is (cell, centroid).
    Guarded driver fit / distributed Spark ML KMeans fallback — the
    ivf_topk skeleton (operators/simsearch.py)."""
    from ..functions.vectors import (
        assign_cells,
        seeded_kmeans_centers,
        to_double_array,
    )

    centers = seeded_kmeans_centers(emb, "embedding", k=n_cells, seed=seed)
    if centers is not None:
        assigned = emb.select(
            "vec_id", to_double_array("embedding").alias("ev")
        ).withColumn("cell", assign_cells(centers)(F.col("ev")))
        rows = [c.tolist() for c in centers]
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        vec = emb.withColumn(
            "features", array_to_vector(to_double_array("embedding"))
        )
        model = KMeans(
            k=n_cells, seed=seed, maxIter=8, featuresCol="features"
        ).fit(vec)
        assigned = model.transform(vec).select(
            "vec_id",
            to_double_array("embedding").alias("ev"),
            F.col("prediction").alias("cell"),
        )
        rows = [list(c) for c in model.clusterCenters()]
    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(rows)],
        "cell int, centroid array<double>",
    )
    return assigned, cent_df


def _pq_codes_arrow_residual(
    emb: DataFrame, centers: DataFrame, cent_df: DataFrame
) -> DataFrame:
    """Fused IVF-PQ encode: ONE distributed Arrow pass computing, per
    batch, the coarse cell assignment (the exact ``assign_cells``
    argmin: c² − 2·X@Cᵀ in float64), the residual x − centroid(cell),
    and the per-subspace PQ code (x² + c² − 2·X@Cᵀ rounded to 9dp,
    smallest-crank argmin — the ``_pq_codes_arrow`` contract), packed
    to ONE row per vector: (vec_id, cell, cranks) with cranks[s] the
    subspace-s code (round-13 — was stacked ×8 rows; the array form
    lets the ADC join run on ``cell`` alone and the per-candidate sum
    become an expression, dropping the stack explosion and the
    (qid, vec_id) re-aggregation exchange from every search).

    Replaces the round-11 three-stage pipeline (assign pass → residual
    join + eager localCheckpoint → encode pass): the residual never
    materializes as a relation, saving two full-table jobs and the
    checkpoint write. Quantization is bit-identical — both codebook
    frames round-trip through the same DataFrames the staged path read
    (cemb is array<float>, so centers are float32-truncated exactly as
    before)."""
    import numpy as np

    crows = centers.orderBy("crank").collect()
    cmat = np.asarray([list(r.cemb) for r in crows], dtype=np.float64)
    subs = [
        np.ascontiguousarray(cmat[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM])
        for s in range(PQ_SUBSPACES)
    ]
    sub_sq = [(c * c).sum(axis=1) for c in subs]
    vrows = cent_df.orderBy("cell").collect()
    coarse = np.asarray([list(r.centroid) for r in vrows], dtype=np.float64)
    coarse_sq = (coarse * coarse).sum(axis=1)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            cells = (coarse_sq[None, :] - 2.0 * (x @ coarse.T)).argmin(1)
            r = x - coarse[cells]
            cranks = np.empty((n, PQ_SUBSPACES), dtype=np.int32)
            for s in range(PQ_SUBSPACES):
                rs = r[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
                d = (
                    (rs * rs).sum(axis=1)[:, None]
                    + sub_sq[s][None, :]
                    - 2.0 * (rs @ subs[s].T)
                )
                cranks[:, s] = np.round(d, 9).argmin(axis=1) + 1
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": cells.astype(np.int32),
                    "cranks": list(cranks),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id long, cell int, cranks array<int>"
    )


def _adc_lookup_table(
    probe: DataFrame,
    centers: DataFrame,
    centers_local: tuple | None = None,
) -> DataFrame:
    """ADC lookup table (qid, cell, qd) per probe row, where qd is the
    K×8-wide array with ``qd[(crank−1)·8 + s]`` the subspace-s distance
    to codebook entry ``crank``, as ONE Arrow kernel (round-13, guide
    §4 — this |Q|·nprobe·K×8 table was the profiled wall of the IVF-PQ
    search: the JVM evaluated a zip_with + 8 slice-folds expression
    tree per (probe, crank) row, ~7.5s of a 16.3s run at |Q|=100; the
    array form additionally lets the candidate join key on ``cell``
    alone with no row explosion on either side).

    Bit-identical VALUES vs the expression path by construction,
    unlike the matmul encode kernels (which carry the 9dp argmin-flip
    caveat):

    * each element is the same ``(CAST(x AS DOUBLE) − CAST(y AS
      DOUBLE))²`` — the codebook is float32 exactly as stored in the
      ``cemb array<float>`` column and upcast per element;
    * each subspace distance is the same left fold ``0.0 + e₀ + … +
      e₇`` (a sequential numpy column accumulation — IEEE doubles in
      the identical order);
    * the 9dp round STAYS IN THE JVM: the kernel emits the raw folds
      and ``transform(qd, x -> round(x, 9))`` is applied outside, so
      the rounding semantics are literally the same code path as
      before.

    Pinned by test_adc_lookup_kernel_bit_identical (exact float
    equality against the expression build on the real corpus).

    ``centers_local`` is the optional (cranks int array, float32
    matrix) pair captured at fit time; when absent the codebook is
    collected from ``centers`` (≤ K=256 rows — model-sized). Cranks
    are contiguous 1..K by construction in both codebook builders
    (asserted — the positional array indexing depends on it)."""
    import numpy as np

    if centers_local is None:
        crows = centers.orderBy("crank").collect()
        cranks_np = np.asarray([r.crank for r in crows], dtype=np.int32)
        c64 = np.asarray([list(r.cemb) for r in crows], dtype=np.float64)
    else:
        cranks_np, c32 = centers_local
        cranks_np = np.asarray(cranks_np, dtype=np.int32)
        c64 = np.asarray(c32, dtype=np.float64)
    kc = len(cranks_np)
    assert (cranks_np == np.arange(1, kc + 1)).all(), cranks_np

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # chunk to bound the (chunk, K, 64) temporary
            for off in range(0, n, 256):
                part = pdf.iloc[off : off + 256]
                m = len(part)
                q = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in part["qr"]]
                )
                d = q[:, None, :] - c64[None, :, :]
                d2 = d * d
                qd = np.empty((m, kc, PQ_SUBSPACES), dtype=np.float64)
                for s in range(PQ_SUBSPACES):
                    acc = np.zeros((m, kc), dtype=np.float64)
                    for j in range(PQ_SUBDIM):
                        acc = acc + d2[:, :, s * PQ_SUBDIM + j]
                    qd[:, :, s] = acc
                yield pd.DataFrame(
                    {
                        "qid": part["qid"].to_numpy(),
                        "cell": part["cell"].to_numpy(),
                        "qd_raw": list(qd.reshape(m, -1)),
                    }
                )

    raw = probe.mapInPandas(
        kernel,
        schema="qid long, cell int, qd_raw array<double>",
    )
    return raw.select(
        "qid",
        "cell",
        F.transform("qd_raw", lambda x: F.round(x, 9)).alias("qd"),
    )


def _ivf_pq_fit_encode(
    spark: SparkSession,
    emb: DataFrame,
    n_cells: int,
    k_codebook: int,
    seed: int,
) -> tuple:
    """(codes, cent_df, centers) for the IVF-PQ index. Under the driver
    guard (the ``seeded_kmeans_centers`` 256 MB precondition) the corpus
    matrix is collected ONCE and every fit — coarse quantizer, cell
    assignment, residuals, all 8 subspace codebooks — runs locally on
    that matrix, followed by one fused distributed encode
    (``_pq_codes_arrow_residual``). Round 11 paid the collect twice
    (coarse fit, then residual fit) plus a residual-relation
    materialization between them; at sf0.1 that was ~2s of pure job
    scheduling. Above the guard: the distributed twin (Spark ML KMeans
    coarse + residual join + per-subspace distributed fits), the 100 TB
    path, where fit cost amortizes."""
    import numpy as np

    from ..functions.vectors import kmeans_fit_local, to_double_array

    # fused guard job (round-13, guide §5): count + first as one
    # aggregate — two scheduled driver round-trips become one
    n, _first = emb.agg(
        F.count(F.lit(1)), F.first("embedding")
    ).first()
    dim = len(_first) if _first is not None else 0
    coarse = None
    if n >= n_cells and dim and n * (dim * 8 + 32) <= (256 << 20):
        mat = np.asarray(
            [
                r[0]
                for r in emb.select(to_double_array("embedding")).collect()
            ],
            dtype=np.float64,
        )
        coarse = kmeans_fit_local(mat, n_cells, seed)
    if coarse is not None:
        # exact assign_cells math (||x||² constant per row drops out)
        coarse_sq = (coarse * coarse).sum(axis=1)
        cells = (coarse_sq[None, :] - 2.0 * (mat @ coarse.T)).argmin(1)
        rmat = mat - coarse[cells]
        kc = max(1, min(k_codebook, n))
        slices = []
        for s in range(PQ_SUBSPACES):
            c = kmeans_fit_local(
                np.ascontiguousarray(
                    rmat[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
                ),
                kc,
                seed=seed + 1 + s,
            )
            if c is None:
                slices = None
                break
            slices.append(c)
        if slices is not None:
            cent_df = spark.createDataFrame(
                [
                    (int(i), [float(x) for x in coarse[i]])
                    for i in range(n_cells)
                ],
                "cell int, centroid array<double>",
            )
            full = np.hstack(slices)
            centers = spark.createDataFrame(
                [
                    (i + 1, [float(x) for x in full[i]])
                    for i in range(kc)
                ],
                "crank int, cemb array<float>",
            )
            codes = _pq_codes_arrow_residual(emb, centers, cent_df)
            # float32-truncate exactly as the cemb array<float> column
            # stores the codebook, so the lookup kernel sees the same
            # values the expression path would read back
            centers_local = (
                np.arange(1, kc + 1, dtype=np.int32),
                full.astype(np.float32),
            )
            return codes, cent_df, centers, centers_local

    # distributed twin — the 100 TB path
    assigned, cent_df = _ivf_assign(spark, emb, n_cells, seed)
    resid = assigned.join(F.broadcast(cent_df), "cell").select(
        "vec_id",
        "cell",
        F.zip_with("ev", "centroid", lambda x, y: x - y).alias("embedding"),
    )
    # one eager materialization: the residual relation feeds the
    # codebook fit AND the encode scan (same rationale as binning.py)
    resid = resid.localCheckpoint(eager=True)
    centers = _pq_kmeans_centers(
        spark, resid, k_codebook=k_codebook, seed=seed + 1
    )
    # pack the stacked (vec_id, cell, s, crank) rows to the array form
    # the guarded kernel emits directly — one build-time aggregate on
    # the 100 TB path (searches then never re-explode the codes)
    codes = (
        _pq_codes_arrow(resid, centers, extra_cols=("cell",))
        .groupBy("vec_id", "cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "crank"))),
                lambda st: st["crank"],
            ).alias("cranks")
        )
    )
    return codes, cent_df, centers, None


def ivf_pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = PQ_ADC_K,
    n_cells: int = IVFPQ_NLIST,
    n_probe: int = IVFPQ_NPROBE,
    k_codebook: int = IVFPQ_CODEBOOK,
    refine: int = 0,
    n_probe_max: int | None = IVFPQ_NPROBE_MAX,
    margin_tau: float = IVFPQ_MARGIN_TAU,
    index: tuple | None = None,
) -> DataFrame:
    """IVF-PQ ADC top-k of ``queries`` (qid, qemb) against ``emb``
    (vec_id, embedding): coarse cells + K=256 residual PQ codes,
    nprobe-cell candidate generation, residual ADC ranking.

    ``n_probe_max`` > ``n_probe`` enables per-query adaptive probe
    widening: a query probes ``n_probe_max`` cells instead of
    ``n_probe`` when its coarse ranking is ambiguous at the cut
    (margin between the first excluded and last included cell below
    ``margin_tau`` of the nearest-cell distance) — targeting the tail
    queries fixed-width probing misses without paying the extra cells
    everywhere (see IVFPQ_MARGIN_TAU). Pass ``n_probe_max=None`` for
    fixed-width probing.

    ``refine`` > 0 adds the standard exact-refine stage (FAISS's
    IndexRefineFlat composition): the ADC ranking keeps a per-query
    shortlist of ``refine`` candidates, the TRUE vectors of only those
    candidates are fetched, and the final top-k ranks by exact L2 —
    recall then tracks the coarse probe's recall instead of the code
    quantization error, at the cost of one |Q|·refine-row join against
    the vector table (the memory/bandwidth economics that make PQ
    worth running: the full scan touches codes only)."""
    spark = emb.sparkSession
    # single guarded fit + fused Arrow encode (distributed twin above
    # the guard); at K=256 the expression-tree encode costs ~4× the
    # K=64 twin, so the vectorized kernel applies (rows-only path).
    # ``index`` lets a caller reuse a prebuilt (codes, cent_df,
    # centers) triple — index build-once, query-many semantics.
    if index is not None:
        codes, cent_df, centers, *rest = index
    else:
        codes, cent_df, centers, *rest = _ivf_pq_fit_encode(
            spark, emb, n_cells, k_codebook, IVFPQ_SEED
        )
    centers_local = rest[0] if rest else None
    # nprobe nearest cells per query, with the query residual per cell
    from ..functions.vectors import to_double_array

    q = queries.select(
        "qid", to_double_array("qemb").alias("qv")
    )
    w_cell = Window.partitionBy("qid").orderBy(
        F.col("cdist").asc(), F.col("cell").asc()
    )
    probe = (
        q.join(F.broadcast(cent_df))
        .withColumn(
            "cdist",
            F.aggregate(
                F.zip_with(
                    F.col("qv"),
                    F.col("centroid"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn("crk", F.row_number().over(w_cell))
    )
    if n_probe_max is not None and n_probe_max > n_probe:
        # adaptive widening — three aggregates over the SAME qid
        # partition the ranking window already shuffled on, so this
        # adds no exchange: d1 (nearest cell), d_in (last included),
        # d_out (first excluded; null when n_probe covers every cell)
        w_all = Window.partitionBy("qid")
        probe = (
            probe.withColumn("d1", F.min("cdist").over(w_all))
            .withColumn(
                "d_in",
                F.max(
                    F.when(F.col("crk") <= n_probe, F.col("cdist"))
                ).over(w_all),
            )
            .withColumn(
                "d_out",
                F.min(
                    F.when(F.col("crk") > n_probe, F.col("cdist"))
                ).over(w_all),
            )
            .withColumn(
                "widen",
                (F.col("d_out") - F.col("d_in"))
                < F.lit(margin_tau) * F.col("d1"),
            )
            .filter(
                (F.col("crk") <= n_probe)
                | (
                    F.coalesce(F.col("widen"), F.lit(False))
                    & (F.col("crk") <= n_probe_max)
                )
            )
        )
    else:
        probe = probe.filter(F.col("crk") <= n_probe)
    probe = probe.select(
        "qid",
        "cell",
        F.zip_with(
            F.col("qv"), F.col("centroid"), lambda x, y: x - y
        ).alias("qr"),
    )
    # residual ADC lookup: one row per (qid, probed cell) carrying the
    # K×8 distance array, built by the Arrow kernel (round-13 — was a
    # crossJoin + zip_with/slice-fold expression tree per (probe,
    # crank) row stacked to ×8 rows, the profiled wall of the search)
    # and broadcast against the (vec_id, cell, cranks) codes table.
    # The per-candidate ADC sum is now an 8-term expression over the
    # broadcast array — decimal addition is EXACT, so reassociating
    # the old sum() aggregate into a fixed 8-term chain cannot change
    # any value (same 9dp-rounded terms, same decimal result); the
    # (qid, vec_id) re-aggregation exchange disappears outright.
    lookup = _adc_lookup_table(probe, centers, centers_local)
    dec_terms = " + ".join(
        f"CAST(element_at(qd, (element_at(cranks, {s + 1}) - 1) "
        f"* {PQ_SUBSPACES} + {s + 1}) AS DECIMAL(18,9))"
        for s in range(PQ_SUBSPACES)
    )
    adc = (
        codes.join(F.broadcast(lookup), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", F.expr(dec_terms).alias("dec_adc")
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("dec_adc").asc(), F.col("vec_id").asc()
    )
    if not refine:
        return (
            adc.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(
                "qid",
                "rank",
                "vec_id",
                F.round(F.col("dec_adc").cast("double"), 6).alias(
                    "adc_dist"
                ),
            )
        )
    shortlist = (
        adc.withColumn("r0", F.row_number().over(w))
        .filter(F.col("r0") <= refine)
        .select("qid", "vec_id")
    )
    ev = emb.select(
        "vec_id", to_double_array("embedding").alias("cv")
    )
    exact = (
        shortlist.join(ev, "vec_id")
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "vec_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("cv"),
                        F.col("qv"),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                9,
            ).alias("l2"),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(
        F.col("l2").asc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "rank",
            "vec_id",
            F.round(F.col("l2"), 6).alias("l2_dist"),
        )
    )


IVFPQ_REFINE = 200  # exact-refine shortlist depth: 20× k. With
# nprobe=12's 0.943 coverage ceiling, 200 recovers 0.933 recall@10
# (150 → 0.922, 100 → 0.890); the refine join is |Q|·refine rows —
# wall-invisible next to the k-means fits. See ANN_RECALL_r10.


# The IVF-PQ index is a build-once artifact (exactly FAISS's
# economics: train + add once, search many) — the registry query
# shares one per session/sf, checkpointed so re-runs pay only the
# search. Same applicationId-keyed memo discipline as
# plans/training_data.py's pair caches.
_IVFPQ_INDEX_CACHE: dict[tuple, tuple] = {}


def _ivf_pq_index_cached(
    spark: SparkSession, sf_dir: str, emb: DataFrame
) -> tuple:
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _IVFPQ_INDEX_CACHE.get(key) if stores_enabled() else None
    if got is None:
        codes, cent_df, centers, centers_local = _ivf_pq_fit_encode(
            spark, emb, IVFPQ_NLIST, IVFPQ_CODEBOOK, IVFPQ_SEED
        )
        got = (
            codes.localCheckpoint(eager=True),
            cent_df,
            centers,
            centers_local,
        )
        if stores_enabled():
            _IVFPQ_INDEX_CACHE[key] = got
    return got


def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
    )
    return ivf_pq_adc_topk(
        emb,
        queries,
        k=PQ_ADC_K,
        refine=IVFPQ_REFINE,
        index=_ivf_pq_index_cached(spark, sf_dir, emb),
    )


QUERIES["ann_ivf_pq_topk"] = (ann_ivf_pq_topk, None)
