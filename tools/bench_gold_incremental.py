"""Scale probe: gold snapshot via full recompute vs incremental merge
(streaming/gold.py::recompute_gold vs merge_gold_incremental).

The incremental path is the documented 100 TB default — per trigger it
reads |batch| + |user x region| totals instead of the full silver
history — but until this probe it had no growth measurement. For each
silver-history scale (1x / 10x / 100x a base volume, fixed user
cardinality, fixed per-trigger batch size) this tool measures the
per-trigger wall of both paths. Expected: recompute grows with the
history (it scans all of silver every trigger), incremental stays flat
(its inputs are the batch and the bounded totals relation).

Usage: python tools/bench_gold_incremental.py [out.json] [base_rows] [batch_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_USERS = 2000
REGIONS = ["North America", "Europe", "Asia", "South America"]


def _silver_rows(spark, n_rows: int, id_offset: int):
    from pyspark.sql import functions as F

    return (
        spark.range(n_rows)
        .select(
            (F.col("id") + id_offset).alias("seq"),
        )
        .select(
            F.concat(F.lit("log_"), F.col("seq")).alias("log_id"),
            F.concat(
                F.lit("user_"), (F.col("seq") % N_USERS).cast("string")
            ).alias("user_id"),
            F.timestamp_seconds(
                F.lit(946684800) + F.col("seq") % 86400
            ).alias("timestamp"),
            F.lit("10.0.0.1").alias("ip_address"),
            ((F.col("seq") % 97) + 1).cast("double").alias("watch_time"),
            F.array(*[F.lit(r) for r in REGIONS])[
                (F.col("seq") % len(REGIONS)).cast("int")
            ].alias("geo_region"),
            F.to_date(
                F.timestamp_seconds(F.lit(946684800) + F.col("seq") % 86400)
            ).alias("event_date"),
        )
    )


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    base_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000

    from investcloud_data_pipeline_spark.config import PipelinePaths
    from investcloud_data_pipeline_spark.session import get_spark
    from investcloud_data_pipeline_spark.streaming.gold import (
        merge_gold_incremental,
        recompute_gold,
    )

    spark = get_spark("bench_gold_incremental")
    points = []
    for scale in (1, 10, 100):
        work = tempfile.mkdtemp(prefix=f"gold_probe_{scale}x_")
        paths = PipelinePaths(root=work)
        n_hist = base_rows * scale
        _silver_rows(spark, n_hist, 0).write.mode("overwrite").parquet(
            paths.silver
        )
        batch_df = _silver_rows(spark, batch_rows, n_hist).localCheckpoint(
            eager=True
        )

        # seed the incremental totals state with the history (epoch 0),
        # so the measured trigger merges against a representative
        # totals table, then time the batch-merge trigger (epoch 1)
        hist_df = spark.read.parquet(paths.silver)
        merge_gold_incremental(spark, paths, hist_df, 0)
        t0 = time.time()
        merge_gold_incremental(spark, paths, batch_df, 1)
        incr_s = round(time.time() - t0, 2)

        # the recompute path's trigger: full-history scan + gold plan
        # (append the batch first so both paths cover the same data)
        batch_df.write.mode("append").parquet(paths.silver)
        t0 = time.time()
        recompute_gold(spark, paths)
        reco_s = round(time.time() - t0, 2)

        points.append(
            {
                "scale": scale,
                "silver_rows": n_hist + batch_rows,
                "batch_rows": batch_rows,
                "incremental_trigger_s": incr_s,
                "recompute_trigger_s": reco_s,
            }
        )
        print(json.dumps(points[-1], separators=(",", ":")),
              file=sys.stderr)
        shutil.rmtree(work, ignore_errors=True)

    p1, p100 = points[0], points[-1]
    out = {
        "metric": "gold_incremental_vs_recompute_trigger_wall",
        "unit": "sec",
        "base_rows": base_rows,
        "n_users": N_USERS,
        "points": points,
        "incremental_100x_over_1x": round(
            p100["incremental_trigger_s"] / p1["incremental_trigger_s"], 2
        ),
        "recompute_100x_over_1x": round(
            p100["recompute_trigger_s"] / p1["recompute_trigger_s"], 2
        ),
    }
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
