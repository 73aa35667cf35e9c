"""Exact set-similarity self-join by prefix filtering (SSJoin/PPJoin).

The LSH family (``dedup_fuzzy``: minhash banding, simhash blocking)
trades recall for scale; prefix filtering is the EXACT counterpart for
the same candidate-economics. For shingle-set Jaccard >= a/b, any two
qualifying documents must share at least one shingle among each
document's first

    p = n - ceil(a*n/b) + 1       (n = number of distinct shingles)

shingles under a single GLOBAL order (proof: let e be the first
common element in that order; if e sat outside x's prefix, the whole
intersection would fit in x's last ceil(a*n/b)-1 elements, which is
strictly fewer than the >= a*n/b elements a qualifying pair must
share). Ordering by ASCENDING document frequency makes each prefix
the document's RAREST shingles, so the candidate join keys on the
cold tail of the shingle vocabulary — small buckets by construction —
while the guarantee stays lossless: zero false negatives, and every
candidate is verified with the exact Jaccard before it is emitted.
Contrast with ``dedup_fuzzy.ngram_jaccard_pairs``, which joins on ALL
shared shingles and counts them: identical output, but prefix
filtering touches only prefix buckets and defers counting to an
array-intersect over the candidate pairs — strictly fewer join rows
at the same exactness.

Threshold arithmetic is kept rational (a/b, integer ceil via
``(a*n + b - 1) div b``; final filter ``b*|∩| >= a*|∪|``) so the
boundary never depends on float rounding and the DuckDB oracle — the
brute-force all-pairs join, i.e. a strictly independent formulation —
matches bit-for-bit.

100 TB posture: two shuffles build the df-ranked shingle relation
(explode + vocabulary count), one shuffle keys candidates on rare
prefix shingles, and the verify join is pair-keyed. Nothing is
quadratic in the corpus — the only quadratic term is per-bucket
candidate expansion, and buckets are rare-shingle buckets. Exact
copies of a document would inflate their shared buckets m²-fold, so
the operator applies the SAME duplicate-collapse armor as the LSH
family (``dedup_fuzzy._exact_groups``): identical normalized content
is collapsed to one representative before matching and the rep-level
pairs are expanded back exactly afterward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num: int = 1,
    den: int = 2,
    store: "tuple[DataFrame, DataFrame] | None" = None,
) -> DataFrame:
    """Exact shingle-Jaccard >= num/den pairs via prefix filtering.

    Returns ``(id1, id2, n_common, jaccard)`` with id1 < id2 and
    jaccard rounded to 6dp for display; the threshold itself is
    enforced in integer arithmetic (``den*n_common >= num*n_union``)
    so the boundary never depends on float rounding.

    Exact (normalized-content) duplicates are collapsed to one
    representative BEFORE matching and expanded back afterward — the
    same hot-bucket armor as the LSH family: m copies of a document
    share ALL shingles including the rare prefix ones, so without the
    collapse every prefix bucket they touch expands m²-fold. Identical
    shingle sets imply identical scores, so rep-level pairs expand to
    member-level pairs exactly (intra-group pairs score 1.0 with
    n_common = the group's shingle count).
    """
    from .dedup_fuzzy import _expand_member_pairs, shingle_store

    if store is not None:
        ex, members = store
    else:
        ex, members = shingle_store(docs, text_col, id_col, n)
    ex = ex.withColumnRenamed("shingle", "tok")
    # Global order = (document frequency ASC, shingle ASC): a total
    # order over the shingle vocabulary that puts rare shingles first.
    # The df join is vocabulary-sized, not corpus-sized.
    df_counts = ex.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = ex.join(df_counts, "tok")

    per_doc = ranked.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("df", "tok"))).alias("ordered")
    )
    n = F.size("ordered")
    # p = n - ceil(num*n/den) + 1, integer-exact.
    plen = n - F.floor((F.lit(num) * n + F.lit(den - 1)) / F.lit(den)).cast(
        "int"
    ) + F.lit(1)
    per_doc = per_doc.select(
        "id",
        F.transform("ordered", lambda s: s["tok"]).alias("toks"),
        F.slice(F.transform("ordered", lambda s: s["tok"]), 1, plen).alias(
            "prefix"
        ),
    ).persist()
    # persist, NOT localCheckpoint (round-13 interleaved A/B, min-of-4
    # at sf0.1: persist 1.79s vs checkpoint 7.13s warm) — the RDD-leaf
    # form loses the relation's size statistics, so the candidate
    # verify joins lose their stats-driven broadcast and the pair
    # relation re-sorts through SMJ. Same finding as the phash reps
    # relation (operators/multimodal.py); the pattern generalizes:
    # checkpoint pays off on RE-ANALYZED lineage (minhash incremental
    # delta bands), persist wins where the planner's join choice
    # depends on the relation's measured size.

    # size rides the prefix relation so the SSJoin length filter can
    # prune candidates BEFORE the distinct + verify join (round-12):
    # J(x,y) >= num/den requires den*min(|x|,|y|) >= num*max(|x|,|y|)
    # (|∩| <= min and J = |∩|/(|x|+|y|-|∩|) is monotone in |∩|), so the
    # prune is lossless — every dropped pair fails the exact verify
    # filter too. The PPJoin POSITIONAL filter (bound the overlap by
    # min(px,py) + min(|x|-px, |y|-py) per shared prefix token) was
    # also tried and measured USELESS at this operating point —
    # 309,409 -> 308,189 candidate pairs (-0.4%) at sf0.1 — because at
    # threshold 1/2 prefixes span half of each document, so positions
    # almost never certify an overlap shortfall the length filter
    # missed; it was dropped rather than pay posexplode + two extra
    # comparisons per join row.
    pref = per_doc.select(
        "id", F.size("toks").alias("nsh"), F.explode("prefix").alias("tok")
    )
    cands = (
        pref.alias("a")
        .join(pref.alias("b"), "tok")
        .filter(
            (F.col("a.id") < F.col("b.id"))
            & (
                F.lit(den) * F.least(F.col("a.nsh"), F.col("b.nsh"))
                >= F.lit(num) * F.greatest(F.col("a.nsh"), F.col("b.nsh"))
            )
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )

    t1 = per_doc.select(F.col("id").alias("id1"), F.col("toks").alias("t1"))
    t2 = per_doc.select(F.col("id").alias("id2"), F.col("toks").alias("t2"))
    verified = (
        cands.join(t1, "id1")
        .join(t2, "id2")
        .select(
            "id1",
            "id2",
            F.size(F.array_intersect("t1", "t2")).alias("n_common"),
            (F.size("t1") + F.size("t2")).alias("n_total"),
        )
        .filter(
            F.lit(den) * F.col("n_common")
            >= F.lit(num) * (F.col("n_total") - F.col("n_common"))
        )
        .select(
            "id1",
            "id2",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common") / (F.col("n_total") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
    )
    sizes = per_doc.select(
        F.col("id").alias("__rep"), F.size("toks").alias("n_sh")
    )
    return _expand_member_pairs(
        verified,
        members,
        sizes,
        intra_cols=[
            F.col("x.n_sh").cast("long").alias("n_common"),
            F.lit(1.0).alias("jaccard"),
        ],
    )


def seeded_shuffle_assignment(
    docs: DataFrame,
    id_col: str = "doc_id",
    epoch_seed: str = "ep1",
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic seeded global shuffle for training-order
    randomization: order key = md5(seed:doc_id), shard = leading hex
    nibbles of the key (uniform), position = rank of the key within
    the shard. Changing ``epoch_seed`` reshuffles globally with zero
    coordination — the property a multi-epoch training job needs.

    ``n_shards`` must be a power of 16 divisor of the keyspace here
    (16 or 256) so shard extraction stays a pure substring → integer
    map that the DuckDB oracle restates verbatim.

    100 TB posture: one hash-partitioned sort per shard (the write is
    ``repartition(shard_id).sortWithinPartitions(sort_key)``), no
    global sort; shards are md5-uniform so no skew.
    """
    if n_shards not in (16, 256):
        raise ValueError("n_shards must be 16 or 256")
    width = 1 if n_shards == 16 else 2
    key = F.md5(
        F.concat(F.lit(f"{epoch_seed}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("shard_id").orderBy("sort_key", id_col)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            key.alias("sort_key"),
        )
        .withColumn(
            "shard_id",
            F.conv(F.substring("sort_key", 1, width), 16, 10).cast("int"),
        )
        .select(
            "doc_id",
            "shard_id",
            F.row_number().over(w).cast("long").alias("shard_pos"),
        )
    )
