"""Extended analytics operators, wave 4: two-pass heavy hitters via a
partition-local Misra-Gries sketch with exact verification, an
inverted-index builder over the document corpus, incremental
aggregate-view maintenance (the groupBy counterpart of the join-delta
IVM), and a chi-square independence statistic over a contingency
table.

Oracle convention unchanged: every query here is STRICT-oracle. Where
the Spark side runs a smarter physical algorithm (the Misra-Gries
candidate pass), the guarantee is mathematical — the sketch's
candidate set provably contains every item above the support
threshold, and the exact verification join makes the OUTPUT identical
to DuckDB's brute-force count — so the oracle checks the result, not
the mechanism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------- two-pass heavy hitters (Misra-Gries + exact verify) ----------
#
# Find every user producing more than HH_PHI of all events, with EXACT
# counts, without a full groupBy over the raw key space. Pass 1 runs a
# Misra-Gries summary with HH_SKETCH_K counters INSIDE each partition
# (mapInPandas: the sketch dict lives across the partition's Arrow
# batches — this is the per-partition stateful-sketch pattern, Python
# is justified because MG's decrement step has no Catalyst
# equivalent). The union of per-partition candidates is tiny
# (<= partitions * K rows); pass 2 joins the candidate set back
# (broadcast) and counts exactly only the matching rows.
#
# Guarantee (why the output is exact, not approximate): within one
# partition of n_p rows, MG with K counters undercounts any item by at
# most n_p / (K + 1); an item with GLOBAL frequency > n / (K + 1)
# therefore survives in at least one partition's summary. With
# K + 1 >= 1 / HH_PHI, every phi-heavy item is a candidate; the exact
# second pass then filters false positives. 100 TB posture: pass 1 is
# map-only (no shuffle), pass 2 shuffles only rows matching
# candidates after a broadcast semi-join — the full key space is never
# shuffled, which is the whole point at billions of distinct keys.
#
# phi calibration: the driver's events table is UNIFORM over a user
# population that scales with sf (15 / 150 / 1500 users; max per-user
# share 8.8% / 0.86% / 0.099%), so any phi above 0.00099 emits ZERO
# rows at sf0.1 and the strict oracle only ever confirms "both engines
# find nothing" (round-6 verdict, item 1). phi = 0.0005 emits rows at
# ALL tested scale factors (15 / 150 / 1478), so the threshold
# arithmetic, the verify join, and the share column are compared on
# real rows; K = 2048 preserves K + 1 >= 1/phi = 2000. On this uniform
# data the per-partition key count stays below K so the decrement path
# never fires here — that path is exercised by the hypothesis laws in
# tests/test_properties.py and the crafted-skew end-to-end test in
# tests/test_analytics_ext4.py (small K forcing evictions, exactness
# asserted against a brute-force groupBy).

HH_PHI = 0.0005
HH_SKETCH_K = 2048  # K + 1 >= 1/phi, so per-partition survival is guaranteed


def _mg_partition_fn(k: int):
    # Closure factory: the partition kernel is pickled BY VALUE with k
    # captured at plan-build time. A module-level function would be
    # pickled by reference and re-resolve HH_SKETCH_K on the worker,
    # silently ignoring driver-side overrides (tests monkeypatch K to
    # force the eviction path inside real executors).
    def _mg_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from ..operators.sketches import mg_merge

        counters: dict[int, int] = {}
        for pdf in batches:
            counters = mg_merge(
                counters, pdf.groupby("user_id").size().items(), k
            )
        yield pd.DataFrame({"user_id": list(counters.keys())})

    return _mg_partition


def event_heavy_hitters_mg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("user_id")
    candidates = (
        e.mapInPandas(_mg_partition_fn(HH_SKETCH_K), "user_id long")
        .distinct()
    )
    # total stays IN-PLAN (broadcast 1-row aggregate, cross-joined onto
    # the exact counts) so constructing this DataFrame is lazy like
    # every other registry builder — no e.count() action at build time
    # (plan audits / explain dumps / entry smoke pay no table scan).
    # floor() matches the oracle's CAST(floor(...)) for positive totals.
    tot = e.groupBy().agg(F.count("*").alias("_hh_total"))
    exact = (
        e.join(F.broadcast(candidates), "user_id")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .crossJoin(F.broadcast(tot))
        .filter(
            F.col("n_events")
            > F.floor(
                F.col("_hh_total").cast("double") * F.lit(HH_PHI)
            ).cast("long")
        )
    )
    return exact.select(
        "user_id",
        "n_events",
        F.round(
            F.col("n_events").cast("double")
            / F.col("_hh_total").cast("double"),
            6,
        ).alias("share"),
    )


EVENT_HEAVY_HITTERS_MG_SQL = f"""
WITH tot AS (SELECT count(*) AS n FROM events)
SELECT user_id,
       count(*) AS n_events,
       round(CAST(count(*) AS DOUBLE) / (SELECT CAST(n AS DOUBLE) FROM tot), 6)
         AS share
FROM events
GROUP BY user_id
HAVING count(*) > (
  -- floor, not a bare CAST: DuckDB's double->BIGINT cast ROUNDS while
  -- Python's int() truncates; floor matches int() for positive totals
  SELECT CAST(floor(CAST(n AS DOUBLE) * {HH_PHI}) AS BIGINT) FROM tot)
"""


# ---------- inverted index over the document corpus ----------
#
# The retrieval-side primitive BM25 ranks against: term -> document
# frequency + the sorted posting list. Terms are lowercased word
# tokens >= 3 chars; postings are deduplicated (term, doc) pairs;
# only terms appearing in >= MIN_DF documents survive (the long tail
# is where an inverted index explodes, and a real system shards or
# drops it). The posting list is emitted as a comma-joined string of
# doc ids in ascending order — deterministic, and hash-comparable
# across engines without relying on array stringification.
#
# Scale: tokenize -> distinct is one shuffle on (term, doc_id);
# the groupBy(term) rides the same hash partitioning (Catalyst reuses
# the exchange); sort_array makes the per-term order total. Posting
# lists are capped at POSTINGS_CAP ids (slice after sort) so a
# stop-word-like term cannot produce an unbounded row — the cap is the
# documented contract, not a silent truncation.

MIN_DF = 20
POSTINGS_CAP = 64


def documents_inverted_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # split on ASCII letters BEFORE lowercasing: lower() of a pure-ASCII
    # token is identical in every engine, while lower() of the full text
    # can expand non-ASCII codepoints differently (Turkish dotted-I) and
    # shift the token boundaries between engines.
    toks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                r"transform(filter(split(text, '[^a-zA-Z]+'),"
                r" t -> length(t) >= 3), t -> lower(t))"
            )
        ).alias("term"),
    ).distinct()
    return (
        toks.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.slice(
                    F.sort_array(F.collect_list("doc_id")),
                    1,
                    POSTINGS_CAP,
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= MIN_DF)
    )


DOCUMENTS_INVERTED_INDEX_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, lower(t.term) AS term
  FROM documents,
       unnest(string_split_regex(text, '[^a-zA-Z]+')) AS t(term)
  WHERE length(t.term) >= 3
)
SELECT term,
       count(*) AS df,
       array_to_string(
         (list_sort(list(doc_id)))[1:{POSTINGS_CAP}], ',') AS postings
FROM toks
GROUP BY term
HAVING count(*) >= {MIN_DF}
"""


# ---------- incremental aggregate maintenance (IVM for groupBy) ----------
#
# Maintain a per-(nation, mktsegment) customer-count/balance-sum view
# under a delta batch WITHOUT recomputing from the base: the base
# aggregate (customers with c_custkey % 10 != 0) merges with the
# delta's partial aggregate (the held-out % 10 == 0 rows) by summing
# mergeable states — count and decimal sum are both abelian-group
# states, so view ⊎ delta_agg == full recompute, the groupBy
# counterpart of ivm_join_delta. The oracle IS the full recompute, so
# the driver's comparison verifies the maintenance identity itself.
#
# Scale: the delta aggregate shuffles only |delta| rows — maintenance
# cost is proportional to the CHANGE, never the base; both partial
# aggregates are map-side-combined by Catalyst.


def ivm_agg_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    base = c.filter(F.col("c_custkey") % 10 != 0)
    delta = c.filter(F.col("c_custkey") % 10 == 0)

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("c_nationkey", "c_mktsegment").agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias(
                "balance"
            ),
        )

    merged = (
        agg(base)
        .unionByName(agg(delta))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("n_customers").alias("n_customers"),
            F.sum("balance").alias("bal"),
        )
    )
    return merged.select(
        "c_nationkey",
        "c_mktsegment",
        "n_customers",
        F.round(F.col("bal").cast("double"), 2).alias("balance"),
    )


IVM_AGG_DELTA_SQL = """
SELECT c_nationkey, c_mktsegment,
       count(*) AS n_customers,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS balance
FROM customer
GROUP BY 1, 2
"""


# ---------- chi-square independence over a contingency table ----------
#
# Is a customer's market segment independent of their nation? The
# classic contingency-table chi-square statistic
#   X^2 = sum over cells (observed - expected)^2 / expected,
# expected = row_total * col_total / n. One row out: the statistic,
# the degrees of freedom, and Cramer's V effect size. Counts are exact
# integers; marginals derive from the SAME aggregated cell relation
# (the mutual-information lesson: never re-scan the fact table for
# marginals); per-cell terms are rounded to 9dp and summed as
# DECIMAL(18,9) so float ordering can't flip the 6dp result.
#
# Scale: one shuffle of the fact table to cell granularity
# (|nations x segments| rows); everything after is arithmetic on a
# relation the size of the cross-product of the category counts.


def customer_segment_nation_chisq(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("o")
    )
    cells = cells.persist()
    rows = cells.groupBy("c_nationkey").agg(
        F.sum("o").alias("row_tot")
    )
    cols = cells.groupBy("c_mktsegment").agg(
        F.sum("o").alias("col_tot")
    )
    n = cells.agg(F.sum("o").alias("n"))
    joined = (
        cells.join(F.broadcast(rows), "c_nationkey")
        .join(F.broadcast(cols), "c_mktsegment")
        .crossJoin(F.broadcast(n))
    )
    expected = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    term = F.round(
        (F.col("o").cast("double") - expected) ** 2 / expected, 9
    ).cast("decimal(18,9)")
    r = F.count_distinct("c_nationkey")
    k = F.count_distinct("c_mktsegment")
    stat = F.sum(term).cast("double")
    nn = F.first("n").cast("double")
    return joined.agg(
        F.round(stat, 6).alias("chi_square"),
        ((r - 1) * (k - 1)).cast("long").alias("dof"),
        F.round(
            F.sqrt(
                stat / (nn * F.least(r - 1, k - 1).cast("double"))
            ),
            6,
        ).alias("cramers_v"),
    )


CUSTOMER_SEGMENT_NATION_CHISQ_SQL = """
WITH cells AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS o
  FROM customer GROUP BY 1, 2
), rows_t AS (
  SELECT c_nationkey, sum(o) AS row_tot FROM cells GROUP BY 1
), cols_t AS (
  SELECT c_mktsegment, sum(o) AS col_tot FROM cells GROUP BY 1
), tot AS (SELECT sum(o) AS n FROM cells),
terms AS (
  SELECT CAST(round(
           pow(CAST(c.o AS DOUBLE)
               - CAST(r.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE)
                 / CAST(t.n AS DOUBLE), 2)
           / (CAST(r.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE)
              / CAST(t.n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS term,
         c.c_nationkey, c.c_mktsegment, t.n
  FROM cells c
  JOIN rows_t r USING (c_nationkey)
  JOIN cols_t ct USING (c_mktsegment)
  CROSS JOIN tot t
)
SELECT round(CAST(sum(term) AS DOUBLE), 6) AS chi_square,
       CAST((count(DISTINCT c_nationkey) - 1)
            * (count(DISTINCT c_mktsegment) - 1) AS BIGINT) AS dof,
       round(sqrt(CAST(sum(term) AS DOUBLE)
             / (CAST(any_value(n) AS DOUBLE)
                * least(count(DISTINCT c_nationkey) - 1,
                        count(DISTINCT c_mktsegment) - 1))), 6)
         AS cramers_v
FROM terms
"""


QUERIES = {
    "event_heavy_hitters_mg": (
        event_heavy_hitters_mg,
        EVENT_HEAVY_HITTERS_MG_SQL,
    ),
    "documents_inverted_index": (
        documents_inverted_index,
        DOCUMENTS_INVERTED_INDEX_SQL,
    ),
    "ivm_agg_delta": (ivm_agg_delta, IVM_AGG_DELTA_SQL),
    "customer_segment_nation_chisq": (
        customer_segment_nation_chisq,
        CUSTOMER_SEGMENT_NATION_CHISQ_SQL,
    ),
}
