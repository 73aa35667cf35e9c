"""Unit tests for tools/compare_baseline.py's adjudication logic.

The tool is the round protocol's regression gate (VERDICT r4/r5/r8/r9),
so its classification logic — raw threshold, host-drag calibration,
semantic-change ledger — is pinned here on synthetic fixtures via the
--bench/--baseline overrides and --no-retime (no Spark session).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "compare_baseline.py"


def _run(tmp_path, base: dict, now: dict, threshold: float = 2.0,
         base_calib: float | None = None,
         bench_calib: tuple[float, float] | None = None,
         passes: dict | None = None,
         extra: list | None = None):
    baseline_md = tmp_path / "BASELINE.md"
    lines = ["# baseline", ""]
    if base_calib is not None:
        lines.append(f"Host calibration (single-core loop): "
                     f"{base_calib} s")
    lines += ["## Recorded BASELINE", "",
              "| query | sec |", "|---|---|"]
    lines += [f"| {k} | {v} |" for k, v in base.items()]
    lines += ["", "## next section", "| not_a_query | 9.9 |"]
    baseline_md.write_text("\n".join(lines))
    bench_json = tmp_path / "BENCH.json"
    doc: dict = {"queries": now}
    if passes is not None:
        doc["passes"] = passes
    if bench_calib is not None:
        doc["host_calibration"] = {
            "before_s": bench_calib[0], "after_s": bench_calib[1]
        }
    bench_json.write_text(json.dumps(doc))
    proc = subprocess.run(
        [sys.executable, str(TOOL), "--no-retime",
         "--threshold", str(threshold),
         "--bench", str(bench_json), "--baseline", str(baseline_md)]
        + (extra or []),
        capture_output=True, text=True, cwd=REPO,
    )
    return proc.returncode, proc.stdout


def test_clean_run_exits_zero(tmp_path):
    rc, out = _run(tmp_path, {"q1": 1.0, "q2": 2.0}, {"q1": 1.1, "q2": 1.9})
    assert rc == 0
    assert "no per-query regression" in out


def test_table_parser_stops_at_next_section(tmp_path):
    rc, out = _run(tmp_path, {"q1": 1.0}, {"q1": 1.0, "not_a_query": 99.0})
    # not_a_query sits in a later pipe table and must NOT be absorbed
    # into the baseline dict (it would read as a 10x regression)
    assert rc == 0
    assert "not_a_query" not in out.split("unbaselined")[0]


def test_real_regression_is_fatal(tmp_path):
    # one query 3x slower while 8 siblings hold at 1.0x: the median
    # drag is 1.0, nothing divides the regression away
    base = {f"q{i}": 1.0 for i in range(9)}
    now = {f"q{i}": 1.0 for i in range(9)}
    now["q0"] = 3.0
    rc, out = _run(tmp_path, base, now)
    assert rc == 1
    assert "q0: 1.00s -> 3.00s (3.00x raw, 3.00x adjusted) *" in out


def test_corroborated_uniform_drag_divides_out(tmp_path):
    # EVERY query 2.2x slower AND the query-independent calibration
    # loop is itself ~2.2x slower than the baseline session's: genuine
    # host drag — ratios adjust to 1.0x, exit 0
    base = {f"q{i}": 1.0 for i in range(9)}
    now = {f"q{i}": 2.2 for i in range(9)}
    rc, out = _run(tmp_path, base, now,
                   base_calib=1.0, bench_calib=(2.15, 2.25))
    assert rc == 0
    assert "median estimate" in out and "2.20x" in out
    assert "calibration estimate" in out
    assert "1.00x adjusted" in out
    assert "UNCORROBORATED" not in out
    # the header legend contains a literal '*'; no query LINE may end
    # with the fatal marker
    assert not any(
        line.rstrip().endswith("*")
        for line in out.splitlines()
        if line.startswith("  q")
    )


def test_uncorroborated_uniform_slowdown_is_fatal(tmp_path):
    # EVERY query 2.2x slower but no calibration exists to blame the
    # host: that is the shape of a genuine uniform regression (e.g. a
    # session/config change) — the tool must NOT divide it away and
    # must exit nonzero with a loud warning (round-10 ADVICE)
    base = {f"q{i}": 1.0 for i in range(9)}
    now = {f"q{i}": 2.2 for i in range(9)}
    rc, out = _run(tmp_path, base, now)
    assert rc == 1
    assert "UNCORROBORATED DRAG" in out


def test_calibration_caps_the_applied_drag(tmp_path):
    # median says 2.4x but the calibration loop only degraded 1.1x:
    # the applied drag caps at 1.1 * tolerance, the uniform slowdown
    # survives as per-query regressions, and the run is fatal
    base = {f"q{i}": 1.0 for i in range(9)}
    now = {f"q{i}": 2.4 for i in range(9)}
    rc, out = _run(tmp_path, base, now,
                   base_calib=1.0, bench_calib=(1.1, 1.1))
    assert rc == 1
    assert "UNCORROBORATED DRAG" in out
    # applied drag = min(2.4, 1.1 * 1.25) = 1.375 -> adjusted 1.75x is
    # below threshold per-query, but the uncorroborated alarm still
    # fails the run
    assert "applied drag: 1.38x" in out


def test_moderate_uncalibrated_drag_stays_lenient(tmp_path):
    # a sub-threshold median (1.8x) with no calibration available is
    # still divided out — the hard alarm only trips past the threshold
    base = {f"q{i}": 1.0 for i in range(9)}
    now = {f"q{i}": 1.8 for i in range(9)}
    now["q0"] = 3.4  # 3.4x raw -> 1.89x adjusted: not fatal
    rc, out = _run(tmp_path, base, now)
    assert rc == 0
    assert "UNCORROBORATED" not in out


def test_even_length_ratio_list_uses_true_median(tmp_path):
    # ratios [1.0, 1.0, 2.0, 2.0]: true median 1.50, not the 2.0 the
    # old upper-middle pick produced (round-10 ADVICE)
    base = {f"q{i}": 1.0 for i in range(4)}
    now = {"q0": 1.0, "q1": 1.0, "q2": 2.0, "q3": 2.0}
    rc, out = _run(tmp_path, base, now)
    assert rc == 0
    assert "median estimate" in out and "1.50x" in out


def test_drag_clamped_at_one_on_faster_host(tmp_path):
    # a faster host (median ratio 0.5) must NOT amplify: drag clamps
    # to 1.0, so a genuine 3x regression stays fatal
    base = {f"q{i}": 1.0 for i in range(9)}
    now = {f"q{i}": 0.5 for i in range(9)}
    now["q0"] = 3.0
    rc, out = _run(tmp_path, base, now)
    assert rc == 1
    assert "calibration" in out and "1.00x" in out


def test_semantic_change_is_reported_not_fatal(tmp_path):
    # a ledgered query regresses past threshold: it lands in the
    # SEMANTIC CHANGES section with its rationale, exit stays 0.
    # The live ledger is empty post-re-anchor, so the entry is
    # injected via the --semantic test hook.
    name = "qsem"
    base = {name: 1.0, "q1": 1.0, "q2": 1.0}
    now = {name: 5.0, "q1": 1.0, "q2": 1.0}
    rc, out = _run(tmp_path, base, now, extra=["--semantic", name])
    assert rc == 0
    assert "SEMANTIC CHANGES" in out
    assert f"{name}: 1.00s -> 5.00s (5.00x)" in out


def test_sub_drag_median_uses_only_big_baselines(tmp_path):
    # sub-0.5s baselines are excluded from the calibration median —
    # they are the lucky-minimum population the drag must not learn from
    base = {"tiny1": 0.1, "tiny2": 0.2, "big1": 2.0, "big2": 3.0,
            "big3": 4.0}
    now = {"tiny1": 0.5, "tiny2": 0.9, "big1": 2.0, "big2": 3.0,
           "big3": 4.0}
    rc, out = _run(tmp_path, base, now)
    # big queries at 1.0x -> drag 1.0; tiny blowups stay raw (and
    # fatal, since --no-retime disables the min-of-N adjudication)
    assert "calibration" in out and "1.00x" in out
    assert rc == 1


def test_cold_only_regression_is_labeled(tmp_path):
    # a >2x candidate whose bench number is a single cold pass gets the
    # loud first-touch label; a warm-confirmed sibling does not
    base = {"q0": 1.0, "q1": 1.0, "q2": 1.0}
    now = {"q0": 3.0, "q1": 3.0, "q2": 1.0}
    rc, out = _run(tmp_path, base, now,
                   passes={"q0": 1, "q1": 2, "q2": 2})
    assert rc == 1
    q0_line = next(l for l in out.splitlines() if l.startswith("  q0:"))
    q1_line = next(l for l in out.splitlines() if l.startswith("  q1:"))
    assert "COLD-ONLY" in q0_line
    assert "COLD-ONLY" not in q1_line


# --- bench.py warm-phase unit tests (round 11: the cold-pass fix) ---

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location("bench", REPO / "bench.py")
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)


def test_warm_priority_worst_ratio_first():
    cold = {"fast": 1.0, "slow_ok": 10.0, "flagged": 3.0, "mild": 1.5}
    baseline = {"fast": 1.0, "slow_ok": 10.0, "flagged": 1.0,
                "mild": 1.0}
    order = _bench.warm_priority(cold, baseline)
    # ratios: flagged 3.0, mild 1.5, fast/slow_ok 1.0 (tie broken by
    # descending cold wall)
    assert order == ["flagged", "mild", "slow_ok", "fast"]


def test_warm_priority_unbaselined_last_by_cold_time():
    cold = {"old_mild": 1.2, "new_big": 50.0, "new_small": 0.1}
    baseline = {"old_mild": 1.0}
    order = _bench.warm_priority(cold, baseline)
    # baselined queries outrank even a huge unbaselined one; among the
    # unbaselined, expensive-first
    assert order == ["old_mild", "new_big", "new_small"]


def test_warm_priority_excludes_errored():
    cold = {"ok": 1.0, "boom": -1.0}
    assert _bench.warm_priority(cold, {}) == ["ok"]


def test_load_baseline_table_matches_compare_grammar(tmp_path):
    md = tmp_path / "BASELINE.md"
    md.write_text(
        "# b\n\nHost calibration: 1.2 s\n\n## Recorded BASELINE\n\n"
        "| query | sec |\n|---|---|\n| q_a | 1.5 |\n| q_b | 0.25 |\n\n"
        "## next\n| not_a_query | 9.9 |\n"
    )
    got = _bench.load_baseline_table(str(md))
    assert got == {"q_a": 1.5, "q_b": 0.25}


def test_load_baseline_table_missing_file():
    assert _bench.load_baseline_table("/nonexistent/BASELINE.md") == {}


# --- update_baseline.py min-merge unit tests (round 11: quiet-host
# re-merge discipline) ---

_uspec = _ilu.spec_from_file_location(
    "update_baseline", REPO / "tools" / "update_baseline.py"
)
_ub = _ilu.module_from_spec(_uspec)
_uspec.loader.exec_module(_ub)


def test_merge_tables_keeps_per_query_min():
    old = {"a": 1.0, "b": 2.0, "c": 3.0}
    new = {"a": 0.8, "b": 2.5, "d": 4.0}
    merged, prov = _ub.merge_tables(old, new, replace=set())
    assert merged == {"a": 0.8, "b": 2.0, "c": 3.0, "d": 4.0}
    assert prov == {"a": "new", "b": "old", "c": "old", "d": "new"}


def test_merge_tables_replace_overrides_min():
    # a redefined query takes the NEW number even when slower: the
    # frozen minimum measured a different computation
    old = {"q": 1.0}
    new = {"q": 1.6}
    merged, prov = _ub.merge_tables(old, new, replace={"q"})
    assert merged == {"q": 1.6}
    assert prov == {"q": "replaced"}


def test_merge_tables_drops_errored_new_rows():
    merged, _ = _ub.merge_tables({"a": 1.0}, {"a": -1.0, "b": 2.0}, set())
    assert merged == {"a": 1.0, "b": 2.0}


def test_merge_tables_caps_suspect_rider_minima():
    # a sample below MERGE_TIGHTEN_FLOOR x frozen is an ordering/rider
    # artifact (shared write-once build paid by a different query this
    # sweep) — the frozen value holds; a 0.5x genuine correction merges
    old = {"rider": 8.0, "corrected": 2.0}
    new = {"rider": 0.3, "corrected": 1.0}
    merged, prov = _ub.merge_tables(old, new, replace=set())
    assert merged == {"rider": 8.0, "corrected": 1.0}
    assert prov == {"rider": "capped", "corrected": "new"}
