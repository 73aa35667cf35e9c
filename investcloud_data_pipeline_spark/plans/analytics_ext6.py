"""Extended analytics operators, wave 6: cohort lifetime value, an
hour x weekday seasonality profile, and interarrival burstiness.

Standard product-analytics asks on the event/order tables, finishing
the cohort/temporal family (cohort_retention gives the activity
matrix; LTV gives the revenue matrix; the seasonality profile and the
interarrival CV give the load-shape facts capacity planning reads).
All strict-oracle with the usual exact-arithmetic discipline: decimal
sums, integer day/second differences, one final double op rounded to
6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------- cohort lifetime value ----------
#
# Customers cohorted by FIRST-order month; per (cohort, month offset):
# period revenue, cumulative revenue, and cumulative LTV per cohort
# member — the revenue counterpart of cohort_retention's activity
# matrix. Month arithmetic is integer (year*12+month); revenue sums
# are DECIMAL(18,2); the cumulative window orders by the integer
# offset within each cohort (exact, deterministic).
#
# Scale: first-order month is one key-partitioned aggregate; the
# matrix aggregate and the cumulative window both partition by
# cohort_month over the ALREADY AGGREGATED (cohort, offset) relation —
# the fact table is shuffled once.


def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).alias("mo"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    first = o.groupBy("o_custkey").agg(F.min("mo").alias("cohort_mo"))
    sizes = first.groupBy("cohort_mo").agg(
        F.count("*").alias("n_cohort")
    )
    cells = (
        o.join(first, "o_custkey")
        .groupBy("cohort_mo", (F.col("mo") - F.col("cohort_mo")).alias("month_offset"))
        .agg(F.sum("rev").alias("period_rev"))
    )
    w = (
        Window.partitionBy("cohort_mo")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("period_rev").over(w)
    return (
        cells.join(F.broadcast(sizes), "cohort_mo")
        .select(
            F.col("cohort_mo").cast("long").alias("cohort_mo"),
            F.col("month_offset").cast("long").alias("month_offset"),
            "n_cohort",
            F.round(F.col("period_rev").cast("double"), 2).alias(
                "period_revenue"
            ),
            F.round(cum.cast("double"), 2).alias("cum_revenue"),
            F.round(
                cum.cast("double") / F.col("n_cohort").cast("double"),
                6,
            ).alias("ltv_per_customer"),
        )
    )


CUSTOMER_COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mo,
         CAST(o_totalprice AS DECIMAL(18,2)) AS rev
  FROM orders
), first_mo AS (
  SELECT o_custkey, min(mo) AS cohort_mo FROM o GROUP BY 1
), sizes AS (
  SELECT cohort_mo, count(*) AS n_cohort FROM first_mo GROUP BY 1
), cells AS (
  SELECT f.cohort_mo, o.mo - f.cohort_mo AS month_offset,
         sum(o.rev) AS period_rev
  FROM o JOIN first_mo f USING (o_custkey)
  GROUP BY 1, 2
)
SELECT c.cohort_mo, c.month_offset, s.n_cohort,
       round(CAST(c.period_rev AS DOUBLE), 2) AS period_revenue,
       round(CAST(sum(c.period_rev) OVER (
         PARTITION BY c.cohort_mo ORDER BY c.month_offset
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
         AS cum_revenue,
       round(CAST(sum(c.period_rev) OVER (
         PARTITION BY c.cohort_mo ORDER BY c.month_offset
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / s.n_cohort, 6) AS ltv_per_customer
FROM cells c JOIN sizes s USING (cohort_mo)
"""


# ---------- hour x weekday seasonality profile ----------
#
# The load-shape heatmap: per (weekday, hour) cell, event count, mean
# value, and the cell's share of all events. Weekday is ISO (1=Monday
# .. 7=Sunday) computed identically in both engines from the date;
# shares derive from the summed cells (one fact shuffle, the
# marginal-from-joint discipline).


def event_hourly_seasonality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    cells = e.groupBy(
        F.dayofweek("ts").alias("dow_sun1"),
        F.hour("ts").alias("hour"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
    )
    # ISO weekday from Spark's Sunday=1 dayofweek
    iso = ((F.col("dow_sun1") + 5) % 7 + 1).cast("long").alias("iso_dow")
    total = cells.agg(F.sum("n_events").alias("n_total"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            iso,
            "hour",
            "n_events",
            F.round(
                F.col("v").cast("double")
                / F.col("n_events").cast("double"),
                6,
            ).alias("mean_value"),
            F.round(
                F.col("n_events").cast("double")
                / F.col("n_total").cast("double"),
                6,
            ).alias("share"),
        )
    )


EVENT_HOURLY_SEASONALITY_SQL = """
WITH cells AS (
  SELECT isodow(ts) AS iso_dow, hour(ts) AS hour,
         count(*) AS n_events,
         sum(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1, 2
), tot AS (SELECT sum(n_events) AS n_total FROM cells)
SELECT CAST(iso_dow AS BIGINT) AS iso_dow,
       CAST(hour AS INTEGER) AS hour,
       n_events,
       round(CAST(v AS DOUBLE) / n_events, 6) AS mean_value,
       round(CAST(n_events AS DOUBLE) / (SELECT CAST(n_total AS DOUBLE) FROM tot), 6)
         AS share
FROM cells
"""


# ---------- interarrival burstiness ----------
#
# Per event type: the mean, standard deviation, and coefficient of
# variation of consecutive interarrival gaps (whole seconds — both
# engines floor the timestamp identically, so gaps are exact
# integers). CV > 1 means burstier than a Poisson process — the
# capacity-planning fact behind the burst-detection query. Moments
# come from exact decimal sums of the integer gaps; sd uses the
# (n-1)-denominator sample form; types with < 3 gaps or zero mean emit
# NULLs (guarded identically in both engines).
#
# Scale: one window shuffle on event_type over a two-column
# projection; everything after is a per-type aggregate of integers.


def event_interarrival_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp("ts").alias("epoch"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("epoch", "event_id")
    gaps = (
        e.withColumn("prev", F.lag("epoch").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "event_type", (F.col("epoch") - F.col("prev")).alias("gap")
        )
    )
    agg = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap").alias("s"),
        F.sum((F.col("gap") * F.col("gap")).cast("decimal(38,0)")).alias(
            "ss"
        ),
    )
    dd = lambda c: F.col(c).cast("double")
    n = dd("n_gaps")
    mean = dd("s") / n
    var = (dd("ss") - dd("s") * dd("s") / n) / (n - 1)
    ok = (F.col("n_gaps") >= 3) & (mean > 0) & (var >= 0)
    return agg.select(
        "event_type",
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.when(ok, F.round(F.sqrt(var), 6)).alias("sd_gap_s"),
        F.when(ok, F.round(F.sqrt(var) / mean, 6)).alias("cv"),
    )


EVENT_INTERARRIVAL_STATS_SQL = """
WITH e AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS epoch, event_id
  FROM events
), gaps AS (
  SELECT event_type, epoch - prev AS gap
  FROM (
    SELECT event_type, epoch,
           lag(epoch) OVER (PARTITION BY event_type
                            ORDER BY epoch, event_id) AS prev
    FROM e
  )
  WHERE prev IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS n_gaps,
         sum(gap) AS s,
         sum(CAST(gap * gap AS DECIMAL(38,0))) AS ss
  FROM gaps GROUP BY 1
)
SELECT event_type, n_gaps,
       round(CAST(s AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
       CASE WHEN n_gaps >= 3 AND CAST(s AS DOUBLE) / n_gaps > 0
                 AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_gaps)
                     / (n_gaps - 1) >= 0
            THEN round(sqrt((CAST(ss AS DOUBLE)
                             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_gaps)
                            / (n_gaps - 1)), 6)
       END AS sd_gap_s,
       CASE WHEN n_gaps >= 3 AND CAST(s AS DOUBLE) / n_gaps > 0
                 AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_gaps)
                     / (n_gaps - 1) >= 0
            THEN round(sqrt((CAST(ss AS DOUBLE)
                             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_gaps)
                            / (n_gaps - 1))
                       / (CAST(s AS DOUBLE) / n_gaps), 6)
       END AS cv
FROM agg
"""


QUERIES = {
    "customer_cohort_ltv": (customer_cohort_ltv, CUSTOMER_COHORT_LTV_SQL),
    "event_hourly_seasonality": (
        event_hourly_seasonality,
        EVENT_HOURLY_SEASONALITY_SQL,
    ),
    "event_interarrival_stats": (
        event_interarrival_stats,
        EVENT_INTERARRIVAL_STATS_SQL,
    ),
}
