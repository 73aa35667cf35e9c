"""Contract tests for __spark_entry__: every query runs at sf0.001,
returns a stable non-empty-ish schema, and has a matching oracle entry
(or is knowingly rows-only)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# Queries allowed to return 0 rows on the clean driver data.
MAY_BE_EMPTY = {"bronze_quality_quarantine"}


def test_every_oracle_key_has_a_query():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)


def test_entry_runs_and_matches_flagship(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "user_id",
        "total_value",
        "top_channel_value",
        "top_channel",
    }


@pytest.mark.slow
def test_all_queries_run_at_sf0001(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        n = df.count()
        assert n >= 0, name
        if name not in MAY_BE_EMPTY:
            assert n > 0, f"{name} returned no rows"
        assert len(df.columns) > 0, name


def test_rows_only_allowlist_is_exhaustive_and_minimal():
    """VERDICT r5 #1: every queries() name must either have an oracle or
    appear on the explicit, justified rows-only allowlist — and the
    allowlist must not carry stale names (oracled or removed queries)."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    allow = set(entrymod.ROWS_ONLY)
    assert rows_only == allow, (
        f"unjustified rows-only: {sorted(rows_only - allow)}; "
        f"stale allowlist entries: {sorted(allow - rows_only)}"
    )
    for name, reason in entrymod.ROWS_ONLY.items():
        assert reason.strip(), f"empty justification for {name}"


def test_coverage_registry_section_in_sync():
    """COVERAGE.md's generated registry inventory must match the live
    registry — regenerate with `python tools/gen_coverage.py` when a
    query is added/removed or its oracle strictness changes."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "gen_coverage.py"),
         "--check"],
        capture_output=True, text=True, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
