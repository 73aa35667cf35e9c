"""Adversarial skew benchmark: one hot key owning ~50% of the fact.

SCALING.md claims three defenses for pathological join skew — AQE's
runtime skew-split, the manual ``salted_join``, and map-side partial
aggregation. The plan-shape tests pin that the mechanisms ENGAGE; this
tool measures what they're WORTH on adversarially skewed data at
sf0.1-like volume, so the skew story is a recorded number, not an
assertion.

Setup: fact = N rows with one user owning ``hot_frac`` of them (64-byte
pad per row so shuffle partitions have real weight), dim = distinct
users. autoBroadcastJoinThreshold=-1 throughout — broadcast would
dissolve the skew trivially; the measured regime is the one where both
sides are too big to broadcast (the actual 100 TB problem).

Three timed variants of the same inner-join + group-by:
  unsalted_no_aqe_skew : sort-merge join, AQE skew-split disabled —
                         the naive plan whose hot partition serializes
                         one straggler task
  unsalted_aqe_skew    : AQE skew-split enabled (runtime fix); the
                         tool asserts ``skew=true`` actually appears in
                         the final adaptive plan
  salted_join          : the manual 16-bucket salt (streaming-safe
                         form, where AQE can't re-plan)

All three must produce identical results (asserted on the aggregate),
and each time is min over ``passes`` warm runs.

Usage: python tools/bench_skew.py [out.json]
       SPARK_GRAFT_SKEW_ROWS=2000000 SPARK_GRAFT_SKEW_HOT=0.5
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    n_rows = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "2000000"))
    hot_frac = float(os.environ.get("SPARK_GRAFT_SKEW_HOT", "0.5"))
    passes = int(os.environ.get("SPARK_GRAFT_SKEW_PASSES", "2"))

    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.operators.scale import salted_join
    from investcloud_data_pipeline_spark.session import get_spark

    spark = get_spark("bench_skew")
    n_hot = int(n_rows * hot_frac)
    n_users = 100_000
    fact = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") < n_hot, F.lit(7))
            .otherwise(F.pmod(F.col("id"), F.lit(n_users)))
            .alias("user_id"),
            (F.col("id") % 97).cast("double").alias("value"),
            # INCOMPRESSIBLE pad (hex digest, not a repeated char): AQE's
            # skew detector reads compressed map-output sizes, so a
            # compressible pad understates the hot partition and the
            # detector never fires (observed: 'x'*64 pads compressed the
            # 80 MB hot partition under a 1 MB threshold).
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        .persist()
    )
    fact.count()
    dim = (
        spark.range(n_users)
        .select(
            F.col("id").alias("user_id"),
            F.concat(F.lit("region_"), (F.col("id") % 7).cast("string")).alias(
                "geo_region"
            ),
        )
        .persist()
    )
    dim.count()

    base_confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        # make the skew detector see the hot partition at this volume
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4MB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in base_confs}
    old["spark.sql.adaptive.skewJoin.enabled"] = spark.conf.get(
        "spark.sql.adaptive.skewJoin.enabled", None
    )

    def agg_of(joined):
        # max(length(pad)) keeps the 64-byte pad alive through the join
        # (column pruning would otherwise strip it, shrinking the hot
        # partition the benchmark exists to create).
        return joined.groupBy("geo_region").agg(
            F.sum("value").alias("total"),
            F.count("*").alias("n"),
            F.max(F.length("pad")).alias("pad_len"),
        )

    def run(label: str, skew_enabled: bool, salted: bool):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if skew_enabled else "false",
        )
        best = None
        rows = None
        final_plan = ""
        for _ in range(passes):
            if salted:
                joined = salted_join(fact, dim, "user_id", salt_buckets=16)
            else:
                joined = fact.join(dim, "user_id")
            out = agg_of(joined)
            t0 = time.time()
            rows = sorted((r.geo_region, r.total, r.n, r.pad_len) for r in out.collect())
            elapsed = round(time.time() - t0, 3)
            final_plan = (
                out._jdf.queryExecution().executedPlan().toString()
            )
            if best is None or elapsed < best:
                best = elapsed
        return {"label": label, "sec": best, "skew_split_in_plan": "skew=true" in final_plan}, rows

    results = {}
    try:
        for k, v in base_confs.items():
            spark.conf.set(k, v)
        variants = [
            ("unsalted_no_aqe_skew", False, False),
            ("unsalted_aqe_skew", True, False),
            ("salted_join", False, True),
        ]
        answers = {}
        for label, skew_on, salted in variants:
            res, rows = run(label, skew_on, salted)
            results[label] = res
            answers[label] = rows
        # numerically identical across all three strategies
        assert answers["unsalted_no_aqe_skew"] == answers["unsalted_aqe_skew"] == answers["salted_join"]
        # the AQE variant must actually have split the hot partition
        assert results["unsalted_aqe_skew"]["skew_split_in_plan"], (
            "AQE skew split did not engage — thresholds vs volume mismatch"
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        fact.unpersist()
        dim.unpersist()

    out = {
        "metric": "skew_join_wall_clock",
        "unit": "sec",
        "n_rows": n_rows,
        "hot_frac": hot_frac,
        "n_users": n_users,
        "passes": passes,
        "variants": results,
        "speedup_aqe": round(
            results["unsalted_no_aqe_skew"]["sec"]
            / results["unsalted_aqe_skew"]["sec"],
            2,
        ),
        "speedup_salted": round(
            results["unsalted_no_aqe_skew"]["sec"]
            / results["salted_join"]["sec"],
            2,
        ),
    }
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
