"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action (collect to driver is not
the workload being measured; we force full materialization of the plan via
``df.write.format("noop")`` which executes every operator but discards
rows — the standard Spark benchmarking sink).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__ as entrymod
    from investcloud_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    # Host calibration: a fixed single-core pure-python loop, timed
    # before and after the sweep. This box is a VM with bursty
    # hypervisor CPU steal — the same loop measured 1.05s..1.73s
    # within one round-9 session — so every absolute wall in this
    # report carries that multiplicative drag. Recording the
    # calibration lets a reader normalize across runs taken at
    # different steal levels (compare calib_s across reports before
    # comparing query walls).
    def _calib() -> float:
        t0 = time.time()
        x = 0
        for i in range(20_000_000):
            x += i * i
        return round(time.time() - t0, 3)

    calib_before = _calib()
    spark = get_spark("bench")

    # Warm the JVM / codegen / parquet footers so the first measured query
    # isn't charged for session startup. load_table, not a raw read —
    # events.parquet needs the nanos-timestamp handling it provides.
    from investcloud_data_pipeline_spark.sources.batch import load_table

    for t in ("lineitem", "events"):
        load_table(spark, sf_dir, t).limit(1).count()

    # Two passes, min per query: single-run timings on this box swing
    # ±40% (JIT, page cache, GC alignment); min-of-2 warm runs is the
    # achievable number and is what BASELINE.md's per-query table holds.
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    # Budget guard: never start a later pass if the elapsed wall clock
    # already exceeds this — protects any driver-side timeout while
    # keeping min-of-2 on the normal path.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "420"))
    bench_t0 = time.time()
    timings: dict[str, float] = {}
    for pass_i in range(n_passes):
        if pass_i > 0 and time.time() - bench_t0 > budget_s:
            print(
                f"bench: skipping pass {pass_i + 1} (budget {budget_s}s exceeded)",
                file=sys.stderr,
            )
            break
        for name, fn in entrymod.queries().items():
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                elapsed = round(time.time() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                print(f"bench error in {name}: {exc}", file=sys.stderr)
                elapsed = -1.0
            prev = timings.get(name)
            if prev is None or prev < 0 or (0 <= elapsed < prev):
                timings[name] = elapsed
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    calib = {"before_s": calib_before, "after_s": _calib()}

    # Full per-query detail goes to a sidecar file; the stdout line must fit
    # entirely inside the driver's 2000-char tail buffer or it records
    # parsed:null (this happened in round 1 with all ~90 queries inlined).
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "host_calibration": calib,
            },
            fh,
            indent=1,
            sort_keys=True,
        )

    # Inline the slowest queries first (most informative vs BASELINE.md)
    # until the compact JSON line would exceed the budget.
    budget = 1700
    inlined: dict[str, float] = {}
    base = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": inlined,
        "queries_total": len(timings),
        "detail_file": "BENCH_DETAIL.json",
        "sf": sf,
        "host_calibration": calib,
    }
    for name in sorted(timings, key=lambda k: -timings[k]):
        inlined[name] = timings[name]
        if len(json.dumps(base, separators=(",", ":"))) > budget:
            del inlined[name]
            break
    print(json.dumps(base, separators=(",", ":")))


if __name__ == "__main__":
    main()
