"""10× scale probe: how do the heavy queries scale from sf0.1 → ~sf1?

The bench proves speed at sf0.1; this probe proves the SHAPE of the
scaling curve. It materializes a synthetic ~sf1 dataset (fact tables
replicated 10× with disjoint primary/foreign keys — orders+lineitem
share each replica's orderkey offset so joins stay consistent;
dimension tables are kept single-copy, which multiplies fan-in per
dimension key exactly like real growth does), then times a
representative slice of the registry at both scale factors and records
the wall-clock ratio per query.

A plan that would melt at 100 TB shows here as a ratio ≫ the data
ratio (quadratic candidate blowup, driver collects, skew collapse); a
healthy distributed plan lands ~linear or below (fixed overheads
amortize). Replicated documents are EXACT cross-replica duplicates by
construction — dedup operators therefore do 10× the real matching
work, which is the stress the probe wants.

Usage: python tools/bench_scale_probe.py [out.json]
       python tools/bench_scale_probe.py --graph [out.json]
       SPARK_GRAFT_PROBE_COPIES=10 SPARK_GRAFT_PROBE_DIR=/tmp/sfprobe
       SPARK_GRAFT_PROBE_QUERIES=name1,name2  # override the query slice
       (copies=100 gives the two-decade probe: 100 copies of sf0.1 is
       an sf10-equivalent fact volume)

``--graph`` runs the STRUCTURE-PRESERVING graph probe (round-7 verdict
task #3): the default replication reuses the single-copy part keys, so
every pair's co-occurrence support multiplies ×copies and the support
filter passes a DENSIFIED graph (3.6k → 1.2M edges at ×10, measured in
round 6) — those ratios compare structurally different graphs. Graph
mode additionally offsets ``l_partkey`` per replica, producing exactly
``copies`` DISJOINT copies of the base co-purchase graph (same degree
distribution, same diameter, same support histogram), so the ratios
for pagerank / k-core / label propagation / clustering coefficient /
link prediction / BFS / SSSP measure like-for-like scaling. (Part-dim
FK integrity is intentionally broken in the graph probe dir — the
graph family never joins the part dimension.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Representative heavy slice: graph iteration, LSH banding, span
# stripping, semantic/embedding work, multi-join TPC-H, sketches,
# curation funnel — the shapes whose scaling behavior matters most.
PROBE_QUERIES = [
    "q1_pricing_summary",
    "q21_lone_failing_supplier",
    "copurchase_pagerank",
    "copurchase_communities",
    "dedup_minhash_lsh",
    "dedup_ngram_containment",
    "dedup_repeated_spans",
    "dedup_semantic_pairs",
    "corpus_curate_full",
    "ann_multiband_lsh_topk",
    "corpus_topic_clusters",
    "event_user_distinct_sketch_merge",
    "text_bpe_encode",
    "text_chunking_explode",
    "dedup_simhash_candidates",
    "multimodal_phash_dedup",
    "copurchase_clustering_coeff",
    "ann_brute_force_topk",
    # wave-2 extension operators with scale-sensitive shapes: the
    # duplicate-collapse in the prefix filter (replicas are exact
    # duplicates), the per-order window in proration, the ×7 day
    # expansion in sliding distinct, the position-keyed vector agg,
    # the broadcast bloom probe, and the bounded-BFS loop
    "dedup_prefix_filter_jaccard",
    "order_proration_largest_remainder",
    "sliding_week_distinct_users",
    "embedding_label_centroids",
    "bloom_filter_semi_join",
    "copurchase_bfs_hops",
    # wave-3/4/5 operators with scale-sensitive shapes: the two-window
    # streak islands, the wedge join in link prediction, the per-round
    # relaxation in weighted SSSP, the map-only MG candidate pass, the
    # (term, doc) shuffle in the inverted index, and the global ntile
    # in the curriculum order (its documented exact-rank posture)
    "user_activity_streaks",
    "copurchase_link_prediction",
    "copurchase_weighted_sssp",
    "event_heavy_hitters_mg",
    "documents_inverted_index",
    "corpus_curriculum_order",
    "corpus_curriculum_order_approx",
    "embedding_pq_codes",
    # round-7 operators with scale-sensitive shapes: the delta-vs-base
    # bucket probe in incremental dedup (replicas are exact duplicates,
    # so the collapse armor is stressed on BOTH sides), the token ×
    # class expansion in naive Bayes, the per-user day window in
    # growth accounting, and the sketch-merge bin spine
    "dedup_minhash_incremental",
    "text_naive_bayes_langid",
    "user_growth_accounting",
    "corpus_curriculum_bins_approx",
]

FACT_OFFSETS = {
    # table -> (columns sharing the per-replica offset, offset step)
    "orders": (["o_orderkey"], 10_000_000),
    "lineitem": (["l_orderkey"], 10_000_000),
    "events": (["event_id"], 100_000_000),
    "documents": (["doc_id"], 1_000_000),
    "embeddings": (["vec_id"], 1_000_000),
}
# graph mode: ALSO relabel the co-purchase node ids per replica, so the
# ×N graph is N disjoint copies of the base graph instead of the same
# node set with ×N support
GRAPH_EXTRA_OFFSETS = {"lineitem": (["l_partkey"], 10_000_000)}
DIMS = ["region", "nation", "customer", "supplier", "part"]

# The iterative / wedge-join graph family measured like-for-like in
# graph mode (every one reads only lineitem's (l_orderkey, l_partkey)).
GRAPH_PROBE_QUERIES = [
    "copurchase_pagerank",
    "copurchase_communities",
    "copurchase_kcore",
    "copurchase_clustering_coeff",
    "copurchase_link_prediction",
    "copurchase_bfs_hops",
    "copurchase_weighted_sssp",
]


def build_probe_dir(
    spark, src_dir: str, out_dir: str, copies: int, graph_mode: bool = False
) -> None:
    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.sources.batch import load_table

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_PROBE_READY")
    stamp = f"{src_dir}:{copies}:graph={graph_mode}"
    if os.path.isfile(marker):
        with open(marker) as fh:
            if fh.read().strip() == stamp:
                return
    for t in DIMS:
        load_table(spark, src_dir, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    for t, (key_cols, step) in FACT_OFFSETS.items():
        if graph_mode and t in GRAPH_EXTRA_OFFSETS:
            extra_cols, extra_step = GRAPH_EXTRA_OFFSETS[t]
        else:
            extra_cols, extra_step = [], 0
        base = load_table(spark, src_dir, t)
        parts = []
        for i in range(copies):
            df = base
            for kc in key_cols:
                df = df.withColumn(kc, F.col(kc) + F.lit(i * step))
            for kc in extra_cols:
                df = df.withColumn(kc, F.col(kc) + F.lit(i * extra_step))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    with open(marker, "w") as fh:
        fh.write(stamp)


def main() -> int:
    argv = sys.argv[1:]
    graph_mode = "--graph" in argv
    if graph_mode:
        argv.remove("--graph")
    out_json = argv[0] if argv else None
    copies = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "10"))
    probe_dir = os.environ.get(
        "SPARK_GRAFT_PROBE_DIR",
        "/tmp/sfprobe_graph" if graph_mode else "/tmp/sfprobe",
    )
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from investcloud_data_pipeline_spark.session import get_spark

    spark = get_spark("bench_scale_probe")
    t0 = time.time()
    build_probe_dir(spark, src_dir, probe_dir, copies, graph_mode)
    build_s = round(time.time() - t0, 1)

    qs = entrymod.queries()
    results = {}
    env_qs = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
    names = (
        [n for n in env_qs.split(",") if n]
        if env_qs
        else (GRAPH_PROBE_QUERIES if graph_mode else PROBE_QUERIES)
    )
    scaled_label = f"x{copies}"
    for name in names:
        fn = qs[name]
        row = {}
        for label, sf_dir in (("base", src_dir), (scaled_label, probe_dir)):
            best = None
            for _ in range(2):
                t0 = time.time()
                try:
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    el = round(time.time() - t0, 3)
                except Exception as exc:  # noqa: BLE001
                    print(f"probe error {name}@{label}: {exc}", file=sys.stderr)
                    el = -1.0
                    break
                if best is None or el < best:
                    best = el
            row[label] = best if best is not None else -1.0
        row["ratio"] = (
            round(row[scaled_label] / row["base"], 2)
            if row["base"] and row["base"] > 0 and row[scaled_label] > 0
            else None
        )
        results[name] = row
        print(f"{name}: {row}", file=sys.stderr)

    ratios = [r["ratio"] for r in results.values() if r["ratio"]]
    out = {
        "metric": (
            f"wall_ratio_at_{copies}x_disjoint_graph_copies"
            if graph_mode
            else f"wall_ratio_at_{copies}x_rows"
        ),
        "graph_mode": graph_mode,
        "copies": copies,
        "base_dir": src_dir,
        "probe_build_s": build_s,
        "median_ratio": round(sorted(ratios)[len(ratios) // 2], 2),
        "max_ratio": max(ratios),
        "queries": results,
    }
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
