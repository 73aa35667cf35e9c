"""Rewrite BASELINE.md's recorded per-query table from the latest
BENCH_DETAIL.json (run `python bench.py` first — two-pass min).

Usage: python tools/update_baseline.py [round_label]
"""

from __future__ import annotations

import json
import re
import sys


def main() -> int:
    label = sys.argv[1] if len(sys.argv) > 1 else "round 2"
    with open("BENCH_DETAIL.json") as fh:
        d = json.load(fh)
    rows = "\n".join(
        f"| {name} | {sec} |"
        for name, sec in sorted(d["queries"].items())
        if sec >= 0
    )
    calib = d.get("host_calibration")
    calib_line = ""
    if calib:
        mid = round((calib["before_s"] + calib["after_s"]) / 2, 3)
        # the midpoint must be the FIRST number after the phrase — the
        # compare tool's parser takes the first match
        calib_line = (
            f"\nHost calibration (single-core loop): {mid} s "
            f"(midpoint; before {calib['before_s']} / after "
            f"{calib['after_s']}) — tools/compare_baseline.py divides "
            "future runs' calibration by this to get the "
            "query-independent host-drag estimate.\n"
        )
    section = f"""## Recorded BASELINE ({label}, min of 2 warm passes at sf{d['sf']})

Config: Spark 4.1.2 `local[32]`, AQE on, shuffle.partitions=32, UTC,
Arrow enabled; single warm JVM, every query materialized via the `noop`
sink twice, per-query minimum recorded (single-run variance on this
host is ±40%, so min-of-2 is the reproducible number).
{calib_line}

| query | sec |
|---|---|
{rows}
| **total** | **{d['value']}** |

High run-to-run variance on this host (±40% observed on identical
plans); treat comparisons within ~2× as noise-equivalent.
"""
    with open("BASELINE.md") as fh:
        text = fh.read()
    head = re.split(r"^## Recorded BASELINE.*$", text, maxsplit=1, flags=re.M)[0]
    with open("BASELINE.md", "w") as fh:
        fh.write(head + section)
    print(f"BASELINE.md table refreshed: {len(d['queries'])} queries, "
          f"total {d['value']}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
