"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action (collect to driver is not
the workload being measured; we force full materialization of the plan via
``df.write.format("noop")`` which executes every operator but discards
rows — the standard Spark benchmarking sink).

Budget protocol (round 11, fixing the round-10 cold-pass artifact): with
263 registry queries a full pass takes ~350-420s depending on host drag,
so the old "2 full passes unless the budget is exceeded" design degraded
to a SINGLE COLD pass whenever the host ran slow — and BASELINE.md is
min-of-warm, so comparing cold-vs-warm produced 8 false >2x regression
flags in round 10 (all <=1.42x when re-timed warm). The new protocol:

1. Pass 1 runs every query once (cold).
2. The remaining budget is spent on WARM re-runs in worst-ratio-first
   order against BASELINE.md's frozen per-query table (unbaselined
   queries last, by descending cold time) — the queries most likely to
   be falsely flagged get their warm sample first.
3. Any query whose COLD ratio already exceeds the 2.0x flag threshold is
   GUARANTEED a warm re-run even past the soft budget, inside a bounded
   reserve (SPARK_GRAFT_BENCH_FLAG_RESERVE_S, default 180s): a false
   flag costs a full adjudication cycle, which is worse than a bounded
   overrun. Round 9's two-full-pass sweep ran ~700s wall under the same
   driver without issue, so soft 560s + 180s reserve stays inside
   demonstrated tolerance.
4. BENCH_DETAIL.json records per-query pass provenance ("cold" first-run
   wall and "passes" run counts) so tools/compare_baseline.py can tell a
   warm-confirmed number from a first-touch-only sample.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Raw per-query ratio past which a cold sample is guaranteed a warm
# re-run (see module docstring). Mirrors tools/compare_baseline.py's
# DEFAULT --threshold of 2.0 but is NOT shared with it: a compare run
# at a custom --threshold (say 1.5) can flag queries this guarantee
# never warm-confirmed. Override here with SPARK_GRAFT_FLAG_THRESHOLD
# when gating at a non-default bar.
FLAG_THRESHOLD = float(os.environ.get("SPARK_GRAFT_FLAG_THRESHOLD", "2.0"))


def load_baseline_table(path: str) -> dict[str, float]:
    """Parse BASELINE.md's '## Recorded BASELINE' pipe table into
    {query: frozen_sec}. Same grammar as tools/compare_baseline.py;
    returns {} when the file or table is absent (warm phase then falls
    back to descending-cold-time order)."""
    try:
        with open(path) as fh:
            text = fh.read()
    except OSError:
        return {}
    base: dict[str, float] = {}
    in_table = False
    for line in text.splitlines():
        if line.startswith("## Recorded BASELINE"):
            in_table = True
            continue
        if in_table and line.startswith("## "):
            break
        if not in_table:
            continue
        m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", line)
        if m:
            base[m.group(1)] = float(m.group(2))
    return base


def warm_priority(
    cold: dict[str, float], baseline: dict[str, float]
) -> list[str]:
    """Warm-phase ordering: baselined queries by descending cold/baseline
    ratio (the most-likely-false-flag queries first), then unbaselined
    queries by descending cold wall (their numbers seed the NEXT
    baseline, so the expensive ones benefit most from a warm sample).
    Errored queries (wall < 0) are excluded — re-running a failure
    wastes budget without producing a comparable number."""

    def key(name: str):
        b = baseline.get(name)
        if b is not None and b > 0:
            return (1, cold[name] / b, cold[name])
        return (0, 0.0, cold[name])

    return sorted(
        (n for n, t in cold.items() if t >= 0), key=key, reverse=True
    )


def main() -> None:
    import __spark_entry__ as entrymod
    from investcloud_data_pipeline_spark.session import get_spark

    repo_dir = os.path.dirname(os.path.abspath(__file__))
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

    # Round-13 measurement fix (documented in OPTIMIZATION_r13.md): warm
    # the PYTHON WORKER POOL the same way. The first mapInPandas/
    # mapInArrow stage of a session otherwise pays ~#cores concurrent
    # worker spawns (interpreter + pyspark.worker + pandas/numpy imports)
    # inside whichever query touches the Python boundary first — session
    # setup, not query computation, exactly like the JVM warmup above.
    # Affects cold first-touch walls only; warm (min-over-pass) numbers
    # are unchanged in meaning and stay comparable to prior rounds.
    def _ident(batches):
        yield from batches

    par = spark.sparkContext.defaultParallelism
    spark.range(0, par, 1, par).mapInPandas(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # BASELINE.md's frozen table is sf0.1: at any other sf its ratios
    # are meaningless, so the warm phase falls back to cold-time order
    # and nothing is "flagged" (no false reserve spend at dev sfs).
    baseline = (
        load_baseline_table(os.path.join(repo_dir, "BASELINE.md"))
        if abs(sf - 0.1) < 1e-9
        else {}
    )

    # Soft budget: the warm phase stops starting new re-runs past this.
    # Reserve: bounded extra wall available ONLY to warm-confirm queries
    # whose cold sample already crossed the flag threshold.
    # Both are denominated in NOMINAL host seconds and scaled by the
    # measured calibration drag (capped 2x, see below): under
    # hypervisor steal the cold pass alone can exceed a fixed wall
    # budget, which would starve the warm phase on exactly the runs
    # where cold-vs-warm-baseline flags are most likely.
    NOMINAL_CALIB_S = 1.2  # quiet-host single-core loop time
    # Cap 2x: under heavier steal the cold pass alone exceeds any sane
    # wall anyway, and an unbounded scale risks whatever timeout the
    # calling harness enforces (a ~700s two-pass run is the longest
    # demonstrated-safe wall; 2x keeps the worst case near 1500s only
    # when steal is already forcing a ~1000s cold pass).
    drag_est = min(2.0, max(1.0, calib_before / NOMINAL_CALIB_S))
    budget_s = (
        float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "560"))
        * drag_est
    )
    reserve_s = (
        float(os.environ.get("SPARK_GRAFT_BENCH_FLAG_RESERVE_S", "180"))
        * drag_est
    )
    # Max warm re-runs per query (total passes = this + the cold pass).
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    queries = entrymod.queries()
    bench_t0 = time.time()

    def run_once(name: str) -> float:
        t0 = time.time()
        try:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"bench error in {name}: {exc}", file=sys.stderr)
            return -1.0

    # --- pass 1: cold ---
    cold: dict[str, float] = {}
    for name in queries:
        cold[name] = run_once(name)
    timings = dict(cold)
    passes = {name: 1 for name in cold}

    # --- warm phase: worst-ratio-first within budget ---
    order = warm_priority(cold, baseline)
    flagged = {
        n
        for n in order
        if baseline.get(n, 0) > 0
        and cold[n] / baseline[n] > FLAG_THRESHOLD
    }
    warm_reruns = 0
    for warm_round in range(max(0, n_passes - 1)):
        for name in order:
            elapsed = time.time() - bench_t0
            if elapsed > budget_s + reserve_s:
                break
            if elapsed > budget_s and (
                name not in flagged or passes[name] > 1
            ):
                # past the soft budget the reserve is spent ONLY on
                # not-yet-warm flagged queries
                continue
            t = run_once(name)
            if t >= 0:
                warm_reruns += 1
                passes[name] += 1
                if timings[name] < 0 or t < timings[name]:
                    timings[name] = t
        else:
            continue
        break
    skipped_warm = sum(1 for n in order if passes.get(n, 0) < 2)
    if skipped_warm:
        print(
            f"bench: {skipped_warm} queries did not get a warm pass "
            f"(soft budget {budget_s}s, reserve {reserve_s}s); all raw "
            f">{FLAG_THRESHOLD}x cold candidates "
            f"{'were warm-confirmed' if all(passes[n] > 1 for n in flagged) else 'INCLUDE COLD-ONLY SAMPLES'}",
            file=sys.stderr,
        )

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Round-13 (verdict item 1): the session-store pattern builds each
    # family's shared upstream inside the FIRST consumer's cold pass,
    # and min-over-passes then drops that pass — so the steady-state
    # total ("value", unchanged) excludes store builds. "cold_value"
    # is the sum of first-touch walls, which INCLUDES every store
    # build exactly once — the build-inclusive headline. Additions
    # only: "value" keeps its meaning and the driver comparison stays
    # valid.
    cold_total = round(sum(t for t in cold.values() if t >= 0), 3)
    calib = {"before_s": calib_before, "after_s": _calib()}

    # Full per-query detail goes to a sidecar file; the stdout line must fit
    # entirely inside the driver's 2000-char tail buffer or it records
    # parsed:null (this happened in round 1 with all ~90 queries inlined).
    detail_path = os.path.join(repo_dir, "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold": cold,
                "cold_value": cold_total,
                "passes": passes,
                "warm_reruns": warm_reruns,
                "budget_s": budget_s,
                "flag_reserve_s": reserve_s,
                "budget_drag_scale": round(drag_est, 3),
                "bench_wall_s": round(time.time() - bench_t0, 1),
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
        "cold_value": cold_total,
        "queries": inlined,
        "queries_total": len(timings),
        "warm_reruns": warm_reruns,
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
