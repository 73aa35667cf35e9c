"""Compare the latest BENCH_DETAIL.json against BASELINE.md's recorded
per-query table and report regressions.

The round protocol (VERDICT r4/r5): BASELINE.md is anchored once at
round start and frozen; "correct but >2x the frozen baseline" is the
judge's per-query `weak` bar. This tool makes that check one command
instead of a by-hand diff.

Noise adjudication (VERDICT r8 task #5): sub-second queries on this
single host swing up to 5x between same-code runs (the round-8 notes
measured 0.366/1.917/0.314 on one query), so a lone BENCH_DETAIL
sample crossing 2.0x on a <1s baseline is usually a lucky-minimum
baseline meeting an unlucky sample, not a regression. For every
regression candidate whose BASELINE is <1s, this tool automatically
RE-TIMES the query min-of-N in-process (same noop sink as bench.py)
and reclassifies it as adjudicated noise when the min-of-N lands back
under the threshold — emitting the adjudication line the judge would
otherwise have to produce by hand. Round 9 extended the re-time to
EVERY regression candidate after catching a whole bench pass
contaminated by ambient host load. `--no-retime` skips the re-timing
(pure file diff, no Spark session).

Semantic changes: when a round deliberately changes what a query
COMPUTES (e.g. a rows-only -> strict-oracle conversion that adds
validation passes), the frozen number measured a different plan, so
the ratio is not a regression signal. Such queries are declared in
SEMANTIC_CHANGES with the commit and rationale and reported in their
own section — visible, never silently dropped, exit-code neutral.

Usage: python tools/compare_baseline.py [--threshold 2.0] [--no-retime]
Exit code 1 if any query regressed past the threshold AFTER
adjudication.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

# A median-based drag estimate LARGER than the independent calibration
# ratio by more than this factor is treated as uncorroborated: the
# population is slower than the host is, which is what a genuine
# uniform regression looks like. 1.25 leaves room for steal hitting
# multi-core Spark stages harder than the single-core calibration loop.
CALIB_TOLERANCE = 1.25

# min-of-5: round 9 found min-of-3 still lands within ±10% of the
# 2.0x line for queries whose frozen baseline is itself a lucky
# single-run minimum (corpus_curriculum_order_approx: frozen 0.455s,
# round-8 sealed same-code value 0.869s, min-of-3 0.95s) — two extra
# warm runs cost seconds and remove the coin-flip.
RETIME_RUNS = 5
RETIME_BASELINE_CUTOFF_S = 1.0

# Queries whose DEFINITION changed after the baseline freeze: the
# frozen number measured a different computation, so a ratio against
# it is not a same-plan regression signal. Each entry names the commit
# that changed the contract and what changed; entries are reported in
# their own section (never silently dropped) and do not affect the
# exit code. Remove an entry when the baseline is next re-anchored.
# Emptied at the round-10 re-anchor: the new frozen table measured the
# current definition of every query (including the r9 strict-oracle
# conversions and the r10 data-adaptive redefinitions), so no ledgered
# divergence remains. Add entries ONLY when a query's computation
# changes after the freeze; remove them at the next re-anchor.
SEMANTIC_CHANGES: dict[str, str] = {}


def _retime_min(names: list[str], sf_dir: str) -> dict[str, float]:
    """Min-of-RETIME_RUNS wall for each named registry query, measured
    exactly like bench.py (noop sink, warm session)."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entrymod
    from investcloud_data_pipeline_spark.session import get_spark
    from investcloud_data_pipeline_spark.sources.batch import load_table

    spark = get_spark("retime")
    for t in ("lineitem", "events"):
        load_table(spark, sf_dir, t).limit(1).count()
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        best = float("inf")
        for _ in range(RETIME_RUNS):
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001
                print(f"retime error in {name}: {exc}", file=sys.stderr)
                break
            best = min(best, time.time() - t0)
        if best < float("inf"):
            out[name] = round(best, 3)
    return out


def main() -> int:
    threshold = 2.0
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
    retime = "--no-retime" not in sys.argv
    # --bench/--baseline: override the default repo-root artifacts so
    # the adjudication logic is unit-testable on synthetic fixtures
    bench_path = "BENCH_DETAIL.json"
    if "--bench" in sys.argv:
        bench_path = sys.argv[sys.argv.index("--bench") + 1]
    baseline_path = "BASELINE.md"
    if "--baseline" in sys.argv:
        baseline_path = sys.argv[sys.argv.index("--baseline") + 1]
    # test hook: inject a semantic-change entry so the (currently
    # empty, post-re-anchor) ledger's reporting path stays unit-tested
    if "--semantic" in sys.argv:
        SEMANTIC_CHANGES[sys.argv[sys.argv.index("--semantic") + 1]] = (
            "synthetic test entry (--semantic)"
        )

    with open(bench_path) as fh:
        bench_doc = json.load(fh)
    bench = bench_doc["queries"]
    bench_calib = bench_doc.get("host_calibration")
    # Pass provenance (round 11): bench.py records how many times each
    # query ran. A regression candidate whose number is a single COLD
    # pass is first-touch-vs-warm-baseline — the exact shape that
    # produced 8 false flags in round 10 — so it is labeled loudly.
    bench_passes: dict = bench_doc.get("passes") or {}

    with open(baseline_path) as fh:
        text = fh.read()
    # Baseline-side calibration: the re-anchored table header records
    # the single-core loop time measured on the SAME host session that
    # produced the frozen numbers ("Host calibration ... 1.234 s").
    base_calib = None
    mcal = re.search(r"[Hh]ost calibration[^0-9]*([0-9.]+)\s*s", text)
    if mcal:
        base_calib = float(mcal.group(1))
    # table grammar lives in bench.py (one parser for the warm phase,
    # the merge tool, and this gate — a grammar change updated in one
    # place cannot silently desync the other two)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import load_baseline_table

    base = load_baseline_table(baseline_path)

    if not base:
        print("no baseline table found in BASELINE.md", file=sys.stderr)
        return 2

    regressions = []
    improvements = []
    common_base = 0.0
    common_now = 0.0
    ratios = []
    for name, b in sorted(base.items()):
        now = bench.get(name)
        if now is None or now < 0 or b <= 0:
            continue
        common_base += b
        common_now += now
        ratio = now / b
        if b >= 0.5:
            ratios.append(ratio)
        if ratio > threshold:
            regressions.append((name, b, now, ratio))
        elif ratio < 1 / threshold:
            improvements.append((name, b, now, ratio))

    # Host-drag estimation, two independent signals (round-10 ADVICE):
    #
    # 1. MEDIAN same-code ratio across all >=0.5s-baseline queries — a
    #    real single-query regression cannot move the median of ~200
    #    queries, but a genuine UNIFORM regression (session/config
    #    change slowing everything) CAN, so the median alone must not
    #    be allowed to divide itself away.
    # 2. The query-independent host calibration: bench.py times a fixed
    #    single-core pure-python loop before and after the sweep, and
    #    the re-anchored BASELINE.md records the same loop's time on
    #    the session that froze the numbers. current/baseline of that
    #    loop measures HOST drag only — no repo code runs in it.
    #
    # The drag actually divided out of regression ratios is the median
    # estimate CAPPED at calibration * CALIB_TOLERANCE when both sides
    # of the calibration exist. A median the calibration does not
    # corroborate (or a median past the threshold with no calibration
    # available) trips a loud warning and a nonzero exit: that shape is
    # a uniform regression until proven otherwise. Clamped at 1.0 so a
    # faster host never hides a true regression.
    median_drag = 1.0
    if ratios:
        median_drag = max(1.0, statistics.median(ratios))
    calib_drag = None
    calib_drift = None
    if bench_calib and base_calib:
        mid = (bench_calib["before_s"] + bench_calib["after_s"]) / 2
        calib_drag = max(1.0, mid / base_calib)
        calib_drift = bench_calib["after_s"] / bench_calib["before_s"]
    if calib_drag is not None:
        host_drag = max(1.0, min(median_drag, calib_drag * CALIB_TOLERANCE))
        drag_corroborated = median_drag <= calib_drag * CALIB_TOLERANCE
    else:
        host_drag = median_drag
        drag_corroborated = median_drag <= threshold

    semantic = [
        (name, b, now, ratio)
        for name, b, now, ratio in regressions
        if name in SEMANTIC_CHANGES
    ]
    regressions = [r for r in regressions if r[0] not in SEMANTIC_CHANGES]

    adjudicated = []
    if retime and regressions:
        # EVERY candidate gets re-timed, not only sub-second baselines:
        # round 9 caught a whole bench pass contaminated by ambient host
        # load (load-average ~3 with zero repo processes), which pushed
        # multi-second queries past 2x too. Regressions are rare, so the
        # re-time cost is bounded; a candidate that survives min-of-N on
        # a quiet session is a real regression, not a loaded sample.
        candidates = [name for name, b, _, _ in regressions]
        if candidates:
            sf_dir = os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
            )
            print(
                f"re-timing {len(candidates)} regression candidate(s) "
                f"min-of-{RETIME_RUNS} at {sf_dir} ...",
                file=sys.stderr,
            )
            mins = _retime_min(candidates, sf_dir)
            survivors = []
            for name, b, now, ratio in regressions:
                m = mins.get(name)
                if m is not None and m / b <= threshold:
                    adjudicated.append((name, b, now, m))
                else:
                    survivors.append((name, b, now, ratio))
            regressions = survivors

    new = sorted(set(bench) - set(base))
    if common_base:
        print(
            f"common queries: {sum(1 for n in base if n in bench)}; "
            f"baseline total {common_base:.1f}s -> now {common_now:.1f}s "
            f"({common_now / common_base:.2f}x)"
        )
    else:
        print("no baselined query overlaps BENCH_DETAIL.json — "
              "nothing to compare")
    print(f"unbaselined new queries: {len(new)}")
    print(f"host drag, median estimate (same-code ratio, >=0.5s "
          f"baselines): {median_drag:.2f}x")
    if calib_drag is not None:
        print(f"host drag, calibration estimate (single-core loop vs "
              f"baseline {base_calib:.3f}s): {calib_drag:.2f}x "
              f"(within-run drift {calib_drift:.2f}x)")
    else:
        print("host drag, calibration estimate: unavailable "
              "(baseline table has no recorded calibration or bench "
              "report has no host_calibration)")
    print(f"applied drag: {host_drag:.2f}x")
    if not drag_corroborated:
        print("\n!!! UNCORROBORATED DRAG: the median same-code ratio "
              f"({median_drag:.2f}x) exceeds what the query-independent "
              "host calibration supports — this is the shape of a "
              "GENUINE UNIFORM REGRESSION, not host steal. The excess "
              "is NOT divided out; treat this run as failing until "
              "explained.")
    fatal = [r for r in regressions if r[3] / host_drag > threshold]
    if regressions:
        print(f"\nREGRESSIONS (> {threshold}x raw; drag-adjusted in "
              f"parentheses; * = still > {threshold}x after drag):")
        for name, b, now, r in sorted(regressions, key=lambda x: -x[3]):
            adj = r / host_drag
            mark = " *" if adj > threshold else ""
            cold_note = ""
            if bench_passes.get(name) == 1:
                cold_note = (" [COLD-ONLY sample: single first-touch "
                             "pass vs a min-of-warm baseline — re-time "
                             "before trusting]")
            print(f"  {name}: {b:.2f}s -> {now:.2f}s ({r:.2f}x raw, "
                  f"{adj:.2f}x adjusted){mark}{cold_note}")
    else:
        print(f"no per-query regression past {threshold}x")
    if adjudicated:
        print(f"\nNOISE (adjudicated by min-of-{RETIME_RUNS} re-timing):")
        for name, b, now, m in adjudicated:
            print(
                f"  {name}: baseline {b:.3f}s, sampled {now:.3f}s "
                f"({now / b:.2f}x), min-of-{RETIME_RUNS} {m:.3f}s "
                f"({m / b:.2f}x) -> single-run variance, not a regression"
            )
    if semantic:
        print("\nSEMANTIC CHANGES (baseline froze a different query "
              "definition — not same-plan regressions):")
        for name, b, now, r in semantic:
            print(f"  {name}: {b:.2f}s -> {now:.2f}s ({r:.2f}x)")
            print(f"    {SEMANTIC_CHANGES[name]}")
    if improvements:
        print(f"\nimprovements (< {1/threshold:.2f}x):")
        for name, b, now, r in sorted(improvements, key=lambda x: x[3]):
            print(f"  {name}: {b:.2f}s -> {now:.2f}s ({r:.2f}x)")
    return 1 if fatal or not drag_corroborated else 0


if __name__ == "__main__":
    sys.exit(main())
