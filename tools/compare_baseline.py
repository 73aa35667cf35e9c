"""Compare the latest BENCH_DETAIL.json against BASELINE.md's recorded
per-query table and report regressions.

The round protocol (VERDICT r4/r5): BASELINE.md is anchored once at
round start and frozen; "correct but >2x the frozen baseline" is the
judge's per-query `weak` bar. This tool makes that check one command
instead of a by-hand diff.

Usage: python tools/compare_baseline.py [--threshold 2.0]
Exit code 1 if any query regressed past the threshold.
"""

from __future__ import annotations

import json
import re
import sys


def main() -> int:
    threshold = 2.0
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])

    with open("BENCH_DETAIL.json") as fh:
        bench = json.load(fh)["queries"]

    with open("BASELINE.md") as fh:
        text = fh.read()
    base: dict[str, float] = {}
    in_table = False
    for line in text.splitlines():
        if line.startswith("## Recorded BASELINE"):
            in_table = True
            continue
        # stop at the next section heading so a later pipe-table in
        # BASELINE.md can't be silently absorbed into the baseline dict
        if in_table and line.startswith("## "):
            break
        if not in_table:
            continue
        m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", line)
        if m:
            base[m.group(1)] = float(m.group(2))

    if not base:
        print("no baseline table found in BASELINE.md", file=sys.stderr)
        return 2

    regressions = []
    improvements = []
    common_base = 0.0
    common_now = 0.0
    for name, b in sorted(base.items()):
        now = bench.get(name)
        if now is None or now < 0 or b <= 0:
            continue
        common_base += b
        common_now += now
        ratio = now / b
        if ratio > threshold:
            regressions.append((name, b, now, ratio))
        elif ratio < 1 / threshold:
            improvements.append((name, b, now, ratio))

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
    if regressions:
        print(f"\nREGRESSIONS (> {threshold}x):")
        for name, b, now, r in sorted(regressions, key=lambda x: -x[3]):
            print(f"  {name}: {b:.2f}s -> {now:.2f}s ({r:.2f}x)")
    else:
        print(f"no per-query regression past {threshold}x")
    if improvements:
        print(f"\nimprovements (< {1/threshold:.2f}x):")
        for name, b, now, r in sorted(improvements, key=lambda x: x[3]):
            print(f"  {name}: {b:.2f}s -> {now:.2f}s ({r:.2f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
