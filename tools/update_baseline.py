"""Rewrite BASELINE.md's recorded per-query table from the latest
BENCH_DETAIL.json (run `python bench.py` first — warm-phase min).

Usage:
  python tools/update_baseline.py [round_label]
      REPLACE the whole table with BENCH_DETAIL's numbers (full
      re-anchor — use on a definitively quiet host).
  python tools/update_baseline.py --merge [round_label] [--replace q1,q2]
      MIN-MERGE BENCH_DETAIL into the existing table: per query keep
      min(frozen, new) — a quiet-window sweep can only tighten the
      anchor, never loosen it (the round-10 anchor was taken while the
      host degraded mid-sweep; this is the re-merge it proposed).
      Queries named in --replace take the NEW number unconditionally
      (their definition/plan changed since the freeze, so the frozen
      minimum measured a different computation); queries new to the
      table are inserted. The header calibration becomes the merged
      sweep's (the compare tool divides future drag by it, so it must
      describe the session that produced the CURRENT minima — after a
      min-merge that is the quieter of the two, i.e. the min of the
      calibrations too).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
# single source of the table grammar: bench.py owns it (its warm phase,
# this tool's merge, and compare_baseline.py must all parse the same
# table or the flagged-query warm guarantee silently evaporates)
from bench import load_baseline_table  # noqa: E402


# A merge never tightens a frozen number past this fraction of itself.
# Rationale: the near-dup family shares a session-scoped write-once
# artifact (training_data.jaccard_pairs_cached) — whichever family
# query runs FIRST pays the build, the rest ride it. The warm phase's
# worst-ratio-first ordering can therefore hand a query a rider run
# 20x under its payer-position number (corpus_leakage_free_split:
# frozen 7.66s as the registry-order payer, 0.33s riding a sibling's
# artifact in the r11 sweep). Freezing a rider minimum would flag that
# query in every future registry-order sweep. 0.4 still admits the
# up-to-2.5x corrections a degraded-anchor re-merge exists for;
# repeated quiet sweeps can walk a genuine bigger improvement down
# over rounds.
MERGE_TIGHTEN_FLOOR = 0.4


def merge_tables(
    old: dict[str, float],
    new: dict[str, float],
    replace: set[str],
) -> tuple[dict[str, float], dict[str, str]]:
    """(merged table, per-query provenance in
    {'old','new','replaced','capped'})."""
    merged: dict[str, float] = {}
    prov: dict[str, str] = {}
    for name, sec in new.items():
        if sec < 0:
            continue
        if name in replace or name not in old:
            merged[name] = sec
            prov[name] = "replaced" if name in replace else "new"
        elif sec < old[name] * MERGE_TIGHTEN_FLOOR:
            # suspect rider/ordering artifact — hold the frozen line
            merged[name] = old[name]
            prov[name] = "capped"
        elif sec < old[name]:
            merged[name] = sec
            prov[name] = "new"
        else:
            merged[name] = old[name]
            prov[name] = "old"
    # queries absent from the new sweep keep their frozen number —
    # dropping them would silently unbaseline a regression target
    for name, sec in old.items():
        if name not in merged:
            merged[name] = sec
            prov[name] = "old"
    return merged, prov


def main() -> int:
    args = sys.argv[1:]
    do_merge = "--merge" in args
    if do_merge:
        args.remove("--merge")
    replace: set[str] = set()
    if "--replace" in args:
        i = args.index("--replace")
        if i + 1 >= len(args):
            print("--replace requires a comma-separated query list",
                  file=sys.stderr)
            return 2
        replace = {
            n.strip() for n in args[i + 1].split(",") if n.strip()
        }
        del args[i : i + 2]
    label = args[0] if args else "round 2"

    with open("BENCH_DETAIL.json") as fh:
        d = json.load(fh)
    new = {n: s for n, s in d["queries"].items() if s >= 0}
    calib = d.get("host_calibration")
    new_calib_mid = (
        round((calib["before_s"] + calib["after_s"]) / 2, 3)
        if calib
        else None
    )

    with open("BASELINE.md") as fh:
        text = fh.read()
    head = re.split(
        r"^## Recorded BASELINE.*$", text, maxsplit=1, flags=re.M
    )[0]

    merge_note = ""
    if do_merge:
        old = load_baseline_table("BASELINE.md")
        if not old:
            print("--merge: no existing table found; doing a full "
                  "re-anchor instead", file=sys.stderr)
        mold = re.search(r"[Hh]ost calibration[^0-9]*([0-9.]+)\s*s", text)
        old_calib = float(mold.group(1)) if mold else None
        table, prov = merge_tables(old, new, replace)
        n_new = sum(1 for p in prov.values() if p == "new")
        n_old = sum(1 for p in prov.values() if p == "old")
        # report what actually happened, not what was requested: a
        # --replace name absent/errored in the sweep keeps its frozen
        # value with provenance 'old'
        replaced = sorted(n for n, p in prov.items() if p == "replaced")
        capped = sorted(n for n, p in prov.items() if p == "capped")
        merge_note = (
            f"\nMin-merged table: {n_new} minima tightened by this "
            f"sweep, {n_old} kept from the prior anchor, "
            f"{len(replaced)} replaced outright (definition changed: "
            f"{', '.join(replaced) or 'none'}), "
            f"{len(capped)} suspect sub-{MERGE_TIGHTEN_FLOOR}x samples "
            f"capped at the frozen value"
            f"{' (' + ', '.join(capped) + ')' if capped else ''}.\n"
        )
        missing_replace = sorted(replace - set(replaced))
        if missing_replace:
            print(
                "warning: --replace queries not replaced (absent or "
                f"errored in the sweep): {', '.join(missing_replace)}",
                file=sys.stderr,
            )
        for n in capped:
            print(
                f"capped: {n} sampled {new[n]}s < "
                f"{MERGE_TIGHTEN_FLOOR}x frozen {old[n]}s — suspect "
                "ordering/rider artifact, frozen value kept",
                file=sys.stderr,
            )
        # the calibration describing the minima is the quieter session;
        # a sweep WITHOUT calibration must not drop the existing header
        # (most retained minima come from the old calibrated session,
        # and compare_baseline falls back to the harsher
        # uncorroborated-median path without it)
        if old_calib is not None and new_calib_mid is not None:
            new_calib_mid = min(old_calib, new_calib_mid)
        elif old_calib is not None:
            new_calib_mid = old_calib
    else:
        table = new

    total = round(sum(table.values()), 3)
    rows = "\n".join(
        f"| {name} | {sec} |" for name, sec in sorted(table.items())
    )
    calib_line = ""
    if new_calib_mid is not None:
        # the midpoint must be the FIRST number after the phrase — the
        # compare tool's parser takes the first match
        sweep_note = (
            f"(this sweep's before {calib['before_s']} / after "
            f"{calib['after_s']}) "
            if calib
            else "(retained from the prior anchor; this sweep "
            "recorded no calibration) "
        )
        calib_line = (
            f"\nHost calibration (single-core loop): {new_calib_mid} s "
            f"{sweep_note}— tools/compare_baseline.py divides "
            "future runs' calibration by this to get the "
            "query-independent host-drag estimate.\n"
        )
    mode = "min-merge of warm-phase minima" if do_merge else "warm-phase min"
    section = f"""## Recorded BASELINE ({label}, {mode} at sf{d['sf']})

Config: Spark 4.1.2 `local[32]`, AQE on, shuffle.partitions=32, UTC,
Arrow enabled; single warm JVM, every query materialized via the `noop`
sink, cold pass + worst-ratio-first warm re-passes, per-query minimum
recorded (single-run variance on this host is ±40%, so the min over
warm passes is the reproducible number).
{calib_line}{merge_note}

| query | sec |
|---|---|
{rows}
| **total** | **{total}** |

High run-to-run variance on this host (±40% observed on identical
plans); treat comparisons within ~2× as noise-equivalent.
"""
    with open("BASELINE.md", "w") as fh:
        fh.write(head + section)
    print(f"BASELINE.md table refreshed ({mode}): {len(table)} queries, "
          f"total {total}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
