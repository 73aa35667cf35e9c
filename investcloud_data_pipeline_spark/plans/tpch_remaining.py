"""The remaining TPC-H query shapes (q2, q9, q11, q12, q15, q16, q20,
q21), completing the 22-query suite started in ``relational.py``.

The driver testdata has no ``partsupp`` table and no
commit/receipt-date columns, so each query is a shape-preserving
adaptation onto the available star schema: what is kept is the *operator
structure* that makes each TPC-H query a distinct engine test —
correlated min subquery (q2), 5-way join with computed profit (q9),
scalar-subquery-in-HAVING value share (q11), conditional two-branch
counts (q12), scalar-subquery max against an aggregated view (q15),
grouped distinct-count with a NOT-IN exclusion (q16), nested
IN-subquery chains with a correlated threshold (q20), and
EXISTS / NOT-EXISTS semi/anti stacking (q21). Docstrings note each
substitution.

Spark-side, correlated/scalar subqueries are expressed as joins against
aggregated subframes — that is exactly the decorrelation Catalyst itself
performs, but writing the join makes the physical plan explicit: the
per-group aggregate is tiny (group cardinality, not row cardinality), so
it broadcasts, and no per-row subquery re-execution can appear at any
scale. All money sums go through DECIMAL(18,2) so results are
bit-stable against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q2-style: min-price part per (type, size) × EUROPE suppliers.
# Reference shape: correlated subquery `p_retailprice = (SELECT min ...)`
# + 4-way dim join + total-order LIMIT. partsupp's min-supplycost becomes
# part's min-retailprice-within-group; supplier↔part linkage comes from
# observed lineitem pairs. Scale: the per-group min is |type×size| rows →
# broadcast; supplier/nation/region dims broadcast; the only big input,
# the distinct (partkey, suppkey) pairs, aggregates map-side before its
# single shuffle.
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    min_price = p.groupBy(
        F.col("p_type").alias("mp_type"), F.col("p_size").alias("mp_size")
    ).agg(F.min("p_retailprice").alias("min_price"))
    cheapest = p.join(
        F.broadcast(min_price),
        (p.p_type == F.col("mp_type"))
        & (p.p_size == F.col("mp_size"))
        & (p.p_retailprice == F.col("min_price")),
    )
    return (
        cheapest.join(pairs, cheapest.p_partkey == pairs.l_partkey)
        .join(s, pairs.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


Q2_MIN_PRICE_SUPPLIER_SQL = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, supplier, nation, region,
     (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
WHERE p_partkey = pairs.l_partkey
  AND s_suppkey = pairs.l_suppkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND p_retailprice = (
    SELECT min(p2.p_retailprice) FROM part p2
    WHERE p2.p_type = part.p_type AND p2.p_size = part.p_size
  )
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


# --- Q9-style: profit by supplier nation × order year for a part family.
# partsupp's ps_supplycost becomes a retailprice-proportional unit cost
# (0.5 × p_retailprice). Keeps the defining structure: a 5-way join
# (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders) with a LIKE filter on
# the part name and an expression-computed measure aggregated by two
# derived keys. Scale: part/supplier/nation broadcast; lineitem⋈orders
# is the one big shuffle, on orderkey; AQE reorders the join tree.
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    ) - F.lit(0.5).cast(DEC) * F.col("p_retailprice").cast(DEC) * F.col(
        "l_quantity"
    ).cast(DEC)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


Q9_PRODUCT_TYPE_PROFIT_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(0.5 AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


# --- Q11-style: parts holding an outsized share of shipped value.
# partsupp inventory value becomes shipped value (price × qty) of ASIA
# suppliers' lines; the defining scalar-subquery-in-HAVING survives.
# Round-10 redefinition (data-adaptive threshold): the original fixed
# 0.001 fraction goes EMPTY once the part count outgrows 1000 — at
# sf0.1 no single part holds 0.1% of total value, so the query's value
# path was uncompared at bench scale (r9 ledger `empty_pass`). TPC-H
# itself scales Q11's fraction by 1/SF; the equivalent scale-free form
# used here is a mean-multiple: a part is important when its shipped
# value exceeds 2× the MEAN per-part value (measured 19/91/957 rows at
# sf0.001/0.01/0.1 — non-empty and bounded at every scale). The
# predicate is evaluated in exact DECIMAL space
# (part_value · n_parts > 2 · total_value) so the boundary cannot flip
# on float summation order in either engine. Precision ceiling
# (round-11 ADVICE): pv_dec·np and 2·tv_dec widen the intermediates,
# and Spark caps DECIMAL at 38 digits — the exactness claim holds while
# total ASIA value × n_parts stays under 10^36 (≈10^5 beyond a 100 TB
# lineitem), past which Spark loses digits (or nulls under ANSI) while
# DuckDB stays exact. Rewriting as pv_dec > 2·tv_dec/np would shrink
# the intermediates but introduces DECIMAL division ROUNDING, whose
# engine-specific scale rules can flip the boundary at any size — the
# documented ceiling is the better trade.
# Scale: the scalar total is one extra pass over the SAME filtered join
# — Spark computes it as a 1-row aggregate broadcast into the filter;
# both passes share the scan via exchange reuse.
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    value = F.col("l_extendedprice").cast(DEC) * F.col("l_quantity").cast(DEC)
    asian_lines = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    per_part = asian_lines.groupBy("l_partkey").agg(
        F.sum(value).alias("pv_dec")
    )
    total = asian_lines.agg(
        F.sum(value).alias("tv_dec"),
        F.count_distinct("l_partkey").alias("np"),
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("pv_dec") * F.col("np") > F.lit(2) * F.col("tv_dec")
        )
        .select(
            "l_partkey", F.col("pv_dec").cast("double").alias("part_value")
        )
    )


Q11_IMPORTANT_VALUE_SQL = """
WITH asian_lines AS (
  SELECT l_partkey,
         CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
per_part AS (
  SELECT l_partkey, sum(value) AS pv_dec FROM asian_lines GROUP BY 1
),
tot AS (
  SELECT sum(value) AS tv_dec, count(DISTINCT l_partkey) AS np
  FROM asian_lines
)
SELECT l_partkey, CAST(pv_dec AS DOUBLE) AS part_value
FROM per_part, tot
WHERE pv_dec * np > 2 * tv_dec
"""


# --- Q12-style: order-priority mix per line status for one ship year.
# l_shipmode and the commit/receipt late-shipping predicate don't exist
# in the testdata; l_linestatus stands in as the grouping dimension and
# the ship-year bound as the date filter. The defining operator — the
# two-branch conditional count (CASE ... IN high-priorities) folded into
# the aggregate — is unchanged. Scale: lineitem⋈orders shuffle on
# orderkey; the CASE folds into the partial agg, so the join output
# never materializes wider than the 2 group keys + 2 counters.
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_PRIORITY_LINES_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


# --- Q15-style: the supplier(s) achieving the maximum 3-month revenue.
# Identical structure to the reference query (revenue view + scalar
# subquery max); only the date column differs. Scale: the revenue agg is
# one map-side-combined shuffle on suppkey (|suppliers| rows out); the
# max is a 1-row broadcast; supplier dim broadcasts into the final join.
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.col("l_extendedprice").cast(DEC)
            * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
        )
        .cast("double")
        .alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "s_acctbal", "total_revenue")
    )


Q15_TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, s_acctbal, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# --- Q16-style: how many distinct suppliers serve each part profile.
# partsupp becomes the observed distinct (partkey, suppkey) pairs; the
# "customer complaints" NOT-IN exclusion becomes negative-balance
# suppliers. Keeps q16's defining pieces: multi-predicate dim filter
# (<>, NOT LIKE, IN-list), NOT IN subquery, count(DISTINCT) per 3-key
# group. Scale: pairs aggregate map-side; part broadcast; the distinct
# count shuffles once on the group keys.
def q16_supplier_part_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad_suppliers = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        pairs.join(
            F.broadcast(bad_suppliers),
            pairs.l_suppkey == bad_suppliers.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SUPPLIER_PART_PROFILES_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- Q20-style: suppliers shipping an outsized share of a part family.
# ps_availqty > ½ × shipped-qty becomes: the supplier's 1997 shipped
# quantity of a 'red…' part exceeds 0.8 × the per-supplier average for
# that part. Keeps q20's nested-IN chain — suppliers IN (those passing a
# per-(supplier, part) aggregate whose threshold is a correlated
# per-part subquery) — decorrelated Spark-side into two aggregate joins.
# Scale: both aggregates shuffle on partkey (the second reuses the
# exchange); part and the qualifying-supplier set broadcast.
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    l97 = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    per_supp_part = l97.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("supp_qty")
    )
    per_part_avg = per_supp_part.groupBy(
        F.col("l_partkey").alias("ap_partkey")
    ).agg((F.avg("supp_qty") * F.lit(0.8)).alias("qty_threshold"))
    heavy = (
        per_supp_part.join(
            F.broadcast(per_part_avg),
            F.col("l_partkey") == F.col("ap_partkey"),
        )
        .filter(F.col("supp_qty") > F.col("qty_threshold"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


Q20_HEAVY_SHIPPERS_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT g.l_suppkey FROM (
    SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS supp_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    GROUP BY l_partkey, l_suppkey
  ) g
  WHERE g.supp_qty > (
    SELECT avg(g2.supp_qty) * 0.8 FROM (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_partkey, l_suppkey
    ) g2
    WHERE g2.l_partkey = g.l_partkey
  )
)
"""


# --- Q21-style: the lone failing supplier in multi-supplier orders.
# "receipt after commit" (columns absent) becomes l_returnflag = 'R'.
# Keeps q21's defining EXISTS (another supplier in the order) +
# NOT EXISTS (another supplier also failing) stack — Spark-side a
# semi-join and an anti-join against per-order supplier profiles.
# Scale: both profiles are one groupBy over the same orderkey-shuffled
# lineitem (shared exchange); supplier/nation broadcast; the heavy
# fact-to-fact correlation never leaves the orderkey partitioning.
def q21_lone_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    failed = l.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    ).distinct()
    # EXISTS: some other supplier in the same order
    other_supp = (
        l.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    # NOT EXISTS: no other supplier in the order also failed
    multi_fail = (
        failed.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_fail"))
        .filter(F.col("n_fail") > 1)
        .select("l_orderkey")
    )
    lone = (
        failed.join(other_supp, "l_orderkey", "left_semi")
        .join(multi_fail, "l_orderkey", "left_anti")
    )
    return (
        lone.join(s, lone.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


Q21_LONE_FAILING_SUPPLIER_SQL = """
WITH failed AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT s_name, count(*) AS numwait
FROM failed f
JOIN supplier ON f.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = f.l_orderkey AND l2.l_suppkey <> f.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM failed f3
    WHERE f3.l_orderkey = f.l_orderkey AND f3.l_suppkey <> f.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


QUERIES = {
    "q2_min_price_supplier": (q2_min_price_supplier, Q2_MIN_PRICE_SUPPLIER_SQL),
    "q9_product_type_profit": (q9_product_type_profit, Q9_PRODUCT_TYPE_PROFIT_SQL),
    "q11_important_value": (q11_important_value, Q11_IMPORTANT_VALUE_SQL),
    "q12_priority_lines": (q12_priority_lines, Q12_PRIORITY_LINES_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_TOP_SUPPLIER_SQL),
    "q16_supplier_part_profiles": (
        q16_supplier_part_profiles,
        Q16_SUPPLIER_PART_PROFILES_SQL,
    ),
    "q20_heavy_shippers": (q20_heavy_shippers, Q20_HEAVY_SHIPPERS_SQL),
    "q21_lone_failing_supplier": (
        q21_lone_failing_supplier,
        Q21_LONE_FAILING_SUPPLIER_SQL,
    ),
}
