"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Registry convention: every operator family from SURVEY.md §2 plus the
extension surface contributes named (query, oracle) pairs here. Spark-side
and SQL-side column names/aliases are kept identical by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from investcloud_data_pipeline_spark.functions import pandas_udfs as PU
from investcloud_data_pipeline_spark.plans import analytics_ext as AX
from investcloud_data_pipeline_spark.plans import analytics_ext3 as AX3
from investcloud_data_pipeline_spark.plans import analytics_ext4 as AX4
from investcloud_data_pipeline_spark.plans import analytics_ext5 as AX5
from investcloud_data_pipeline_spark.plans import analytics_ext6 as AX6
from investcloud_data_pipeline_spark.plans import analytics_ext7 as AX7
from investcloud_data_pipeline_spark.plans import analytics_ext8 as AX8
from investcloud_data_pipeline_spark.plans import lakehouse as LH
from investcloud_data_pipeline_spark.plans import mining as MN
from investcloud_data_pipeline_spark.plans import pipeline_queries as P
from investcloud_data_pipeline_spark.plans import relational as R
from investcloud_data_pipeline_spark.plans import temporal as T
from investcloud_data_pipeline_spark.plans import tpch_remaining as TR
from investcloud_data_pipeline_spark.plans import training_data as TD
from investcloud_data_pipeline_spark.sources.python_datasource import (
    ACTIVITY_SOURCE_PROFILE_SQL,
    activity_source_profile,
)

SF0001 = "/root/testdata/sf0.001"

# Queries with NO oracle_sql() entry, each with the reason SQL cannot
# express it — the driver records a weaker rows-only check for these;
# tests/test_entry_contract.py asserts this list is exhaustive and
# minimal (every queries() name is either oracled or justified here).
ROWS_ONLY = {
    "ann_brp_lsh_topk": "random-hyperplane LSH buckets (seeded RNG, not SQL)",
    "ann_ivf_topk": "k-means cell assignment (iterative fit, not SQL)",
    "ann_pq_adc_kmeans_topk": (
        "per-subspace k-means codebook (iterative fit, not SQL); "
        "strict twin with the seeded-sample codebook: ann_pq_adc_topk"
    ),
    "ann_ivf_pq_topk": (
        "IVF-PQ residual coding + exact refine (iterative k-means "
        "fits, not SQL); recall floor pinned in test_analytics_ext5"
    ),
    "ann_vectorized_topk": "numpy blocked-matmul summation order",
    "approx_aggregates": "HLL++/KLL sketch estimates are engine-specific",
    "corpus_curriculum_order_approx": (
        "percentile_approx bin edges are a Spark-side mergeable sketch "
        "(engine-specific); boolean-gated strict twin: "
        "corpus_curriculum_bins_approx; exact-ntile strict twin: "
        "corpus_curriculum_order"
    ),
    "dedup_embedding_cosine_fast": "numpy blocked-matmul summation order",
    "dedup_semantic_pairs": "k-means clustering (iterative fit, not SQL)",
    "multimodal_image_patches": (
        "patch_md5 fingerprints raw patch BYTES containing NUL padding; "
        "DuckDB 1.0's md5() is VARCHAR-only (no BLOB overload), so the "
        "digest is not portably computable — grid/padding laws are "
        "pytest-pinned and the pixel law itself is value-pinned via "
        "multimodal_phash_dedup's strict oracle"
    ),
    "multimodal_thumbnail": "PNG codec round-trip + pixel resample (not SQL)",
    "multimodal_wav_resample": (
        "WAV re-encode md5 (blob construction not practical in SQL); "
        "strict siblings pin the codec: multimodal_wav_features, "
        "multimodal_wav_segments"
    ),
    "profile_orders": "HLL++ approx distincts are engine-specific (exact twin: profile_orders_exact)",
}
# Converted OUT of ROWS_ONLY in round 12 (verdict task #6):
# multimodal_wav_features / multimodal_wav_segments (the fixture tone
# is a closed-form function of doc_id and PCM16 is lossless — the
# oracle recomputes from the synthesis law, value-pinning the codec)
# and pydatasource_activity_profile (seed-pure source output committed
# as a parquet fixture the oracle aggregates). Also (later in round 12)
# dedup_simhash_candidates: the kernel's shingle hash is an md5 prefix,
# which DuckDB reproduces bit-exactly, and the bit voting / banding /
# group expansion are plain relational algebra — the Arrow kernel is
# value-pinned pair-for-pair at all three sfs. And
# multimodal_phash_dedup: the fixture image is the doc's ASCII bytes
# tiled 16×16, so the oracle re-derives pixels from the synthesis law
# and dHash's block-mean comparisons reduce to exact integer
# cross-products — the full PNG encode→decode→dHash→banding chain is
# value-pinned pair-for-pair at all three sfs.



def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full Gold pipeline (validity filter → dedup →
    enrich → per-user argmax aggregation) in batch form at sf0.001."""
    return P.gold_user_argmax(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # Reference pipeline, batch form (SURVEY §2: F1/F2, P4/P5, D1, J1, A1, W1, F3, A2)
        "bronze_quality_valid": P.bronze_quality_valid,
        "bronze_quality_quarantine": P.bronze_quality_quarantine,
        "silver_dedup": P.silver_dedup,
        "silver_enrich": P.silver_enrich,
        "gold_region_totals": P.gold_region_totals,
        "gold_user_argmax": P.gold_user_argmax,
        # Relational coverage (joins/aggs/windows/set-ops/json/percentiles)
        **{name: fn for name, (fn, _) in R.QUERIES.items()},
        # Training-data ops (dedup family, similarity search, text analysis)
        **{name: fn for name, (fn, _) in TD.QUERIES.items()},
        # Temporal joins (as-of, range) + cube/top-N/string/approx surface
        **{name: fn for name, (fn, _) in T.QUERIES.items()},
        # Remaining TPC-H shapes (q2/q9/q11/q12/q15/q16/q20/q21)
        **{name: fn for name, (fn, _) in TR.QUERIES.items()},
        # Vectorized Python function surface (scalar/grouped-agg/grouped-map)
        **{name: fn for name, (fn, _) in PU.QUERIES.items()},
        # Lakehouse mutations & governance (CDC merge, SCD2, PII, ER, URL)
        **{name: fn for name, (fn, _) in LH.QUERIES.items()},
        # Analytics mining (YoY, market-basket, triangles, funnel)
        **{name: fn for name, (fn, _) in MN.QUERIES.items()},
        # Extended analytics (proration, skyline, bloom semi-join,
        # prefix-filter exact set-similarity, bounded BFS, RAKE, shuffle)
        **{name: fn for name, (fn, _) in AX.QUERIES.items()},
        # Extended analytics wave 3 (streaks, link prediction, weighted
        # SSSP, Gini, closed-form OLS, autocorrelation)
        **{name: fn for name, (fn, _) in AX3.QUERIES.items()},
        # Extended analytics wave 4 (Misra-Gries heavy hitters,
        # inverted index, aggregate IVM, chi-square independence)
        **{name: fn for name, (fn, _) in AX4.QUERIES.items()},
        # Extended analytics wave 5 (curriculum order, lang-id
        # confusion evaluation, reorder survival)
        **{name: fn for name, (fn, _) in AX5.QUERIES.items()},
        # Extended analytics wave 6 (cohort LTV, seasonality profile,
        # interarrival burstiness)
        **{name: fn for name, (fn, _) in AX6.QUERIES.items()},
        # Extended analytics wave 7 (growth accounting, naive-Bayes
        # lang-id, dimension-truncation retrieval evaluation)
        **{name: fn for name, (fn, _) in AX7.QUERIES.items()},
        # Extended analytics wave 8 (scale-safe binned twins of the
        # exact-cumulative statistics family: KS/Gini/ABC/Pareto)
        **{name: fn for name, (fn, _) in AX8.QUERIES.items()},
        # Engine-native Python data source (rows-only: generator input,
        # no DuckDB-visible tables)
        "pydatasource_activity_profile": activity_source_profile,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bronze_quality_valid": P.BRONZE_QUALITY_VALID_SQL,
        "bronze_quality_quarantine": P.BRONZE_QUALITY_QUARANTINE_SQL,
        "silver_dedup": P.SILVER_DEDUP_SQL,
        "silver_enrich": P.SILVER_ENRICH_SQL,
        "gold_region_totals": P.GOLD_REGION_TOTALS_SQL,
        "gold_user_argmax": P.GOLD_USER_ARGMAX_SQL,
        **{name: sql for name, (_, sql) in R.QUERIES.items()},
        **{name: sql for name, (_, sql) in TD.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in T.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in TR.QUERIES.items()},
        **{name: sql for name, (_, sql) in PU.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in LH.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in MN.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in AX.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in AX3.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in AX4.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in AX5.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in AX6.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in AX7.QUERIES.items() if sql},
        **{name: sql for name, (_, sql) in AX8.QUERIES.items() if sql},
        "pydatasource_activity_profile": ACTIVITY_SOURCE_PROFILE_SQL,
    }
