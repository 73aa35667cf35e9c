"""IVF-PQ recall/latency tradeoff sweep: recall@k and wall time across
the two operating knobs — nprobe (coarse cells probed) and refine
(exact-re-rank shortlist depth) — against the exact L2 top-k on the
real embeddings table.

This is the curve an operator of the index actually tunes: nprobe buys
candidate-coverage (bounded by the coarse quantizer's recall), refine
converts ADC ranking error into one bounded join. The committed
artifact pins the shape so a regression in either knob is visible.

Usage: python tools/ann_tradeoff.py [out.json] [sf_dir] [k] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 100

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.plans import analytics_ext5 as AX5
    from investcloud_data_pipeline_spark.session import get_spark
    from investcloud_data_pipeline_spark.sources.batch import load_table

    spark = get_spark("ann_tradeoff")
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .persist()
    )
    n_corpus = emb.count()
    qs = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )

    l2 = F.expr(
        "aggregate(zip_with(embedding, qemb,"
        " (x,y)->(CAST(x AS DOUBLE)-CAST(y AS DOUBLE))"
        "*(CAST(x AS DOUBLE)-CAST(y AS DOUBLE))),"
        " CAST(0 AS DOUBLE), (a,e)->a+e)"
    )
    wq = Window.partitionBy("qid").orderBy(
        F.col("l2").asc(), F.col("vec_id").asc()
    )
    exact: dict = {}
    for r in (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", l2.alias("l2"))
        .withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= k)
        .collect()
    ):
        exact.setdefault(r.qid, set()).add(r.vec_id)

    def recall_of(df) -> tuple:
        t0 = time.time()
        got: dict = {}
        for r in df.collect():
            got.setdefault(r.qid, set()).add(r.vec_id)
        wall = round(time.time() - t0, 2)
        per_q = [
            len(got.get(q, set()) & s) / k for q, s in exact.items()
        ]
        return round(sum(per_q) / len(per_q), 4), wall

    points = []
    for n_probe in (1, 2, 4, 8, 16):
        rec, wall = recall_of(
            AX5.ivf_pq_adc_topk(
                emb, qs, k=k, n_probe=n_probe, refine=AX5.IVFPQ_REFINE
            )
        )
        points.append(
            {"knob": "nprobe", "nprobe": n_probe,
             "refine": AX5.IVFPQ_REFINE, "recall_at_k": rec,
             "wall_s": wall}
        )
        print(f"nprobe={n_probe} recall={rec} wall={wall}", file=sys.stderr)
    for refine in (0, 10, 25, 50, 100):
        rec, wall = recall_of(
            AX5.ivf_pq_adc_topk(emb, qs, k=k, refine=refine)
        )
        points.append(
            {"knob": "refine", "nprobe": AX5.IVFPQ_NPROBE,
             "refine": refine, "recall_at_k": rec, "wall_s": wall}
        )
        print(f"refine={refine} recall={rec} wall={wall}", file=sys.stderr)
    emb.unpersist()

    out = {
        "metric": f"ivf_pq_recall@{k}_tradeoff",
        "k": k,
        "n_queries": len(exact),
        "n_corpus": n_corpus,
        "sf_dir": sf_dir,
        "points": points,
    }
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
