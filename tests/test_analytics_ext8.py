"""Bracket laws + plan posture for the wave-8 binned twins.

Each binned twin must (a) rigorously bracket / contain its exact
counterpart's statistic on real data, and (b) plan with NO
single-partition Sort/Window — the whole point of the twin is removing
the data-cardinality total order the exact form funnels through.
"""

from __future__ import annotations

import os

from investcloud_data_pipeline_spark.plans import analytics_ext8 as AX8


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_no_single_partition_sort_window(df):
    plan = _plan(df)
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            child = lines[i + 1]
            assert "Sort" not in child and "Window" not in child, plan
    assert "Window" not in plan, plan


def test_ks_binned_brackets_exact(spark, sf_dir):
    from investcloud_data_pipeline_spark.plans.analytics_ext7 import (
        customer_balance_ks_test,
    )

    exact = customer_balance_ks_test(spark, sf_dir).collect()[0]
    binned = AX8.customer_balance_ks_binned(spark, sf_dir).collect()[0]
    assert binned.n1 == exact.n1 and binned.n2 == exact.n2
    assert binned.d_lo_num <= exact.d_num <= binned.d_up_num
    assert 0.0 <= binned.d_lo <= binned.d_up <= 1.0 + 1e-9
    # the bracket must be informative, not vacuous: on 256 bins the
    # within-bin excursion is a small fraction of the distribution
    assert binned.d_up - binned.d_lo < 0.25


def test_gini_binned_brackets_exact(spark, sf_dir):
    from investcloud_data_pipeline_spark.plans.analytics_ext3 import (
        customer_revenue_gini,
    )

    exact = {
        r.n_name: r for r in customer_revenue_gini(spark, sf_dir).collect()
    }
    binned = AX8.customer_revenue_gini_binned(spark, sf_dir).collect()
    assert len(binned) == len(exact) == 25
    for row in binned:
        e = exact[row.n_name]
        assert row.n_customers == e.n_customers
        assert abs(row.total_revenue - e.total_revenue) < 0.02
        # bracket law (1e-6 slack: both ends round at 6dp)
        assert row.gini_lo - 1e-6 <= e.gini <= row.gini_up + 1e-6, (
            row.n_name,
            row.gini_lo,
            e.gini,
            row.gini_up,
        )
        # informative: 256 value bins localize the Lorenz curve up to
        # the per-bin population share — width ≲ max_i cnt_i/n, so the
        # bound adapts to tiny nations (n=4 at sf0.001 ⇒ width ≤ ~0.25)
        assert row.gini_up - row.gini_lo <= max(0.2, 2.0 / row.n_customers)


def test_abc_binned_pins_classes(spark, sf_dir):
    from investcloud_data_pipeline_spark.plans.temporal import (
        part_revenue_abc,
    )

    exact = {
        r.l_partkey: r.abc_class
        for r in part_revenue_abc(spark, sf_dir).collect()
    }
    binned = AX8.part_revenue_abc_binned(spark, sf_dir).collect()
    assert len(binned) == len(exact)
    n_pinned = 0
    order = {"A": 0, "B": 1, "C": 2}
    for row in binned:
        ex = exact[row.l_partkey]
        # bracket: exact class always between class_lo and class_hi
        assert order[row.abc_class_lo] <= order[ex] <= order[
            row.abc_class_hi
        ], (row.l_partkey, row.abc_class_lo, ex, row.abc_class_hi)
        if row.class_pinned:
            n_pinned += 1
            assert row.abc_class_lo == ex
    # the unpinned residue is only the ≤2 boundary-straddling bins
    assert n_pinned >= 0.5 * len(binned)


def test_pareto_banded_contains_exact_frontier(spark, sf_dir):
    from investcloud_data_pipeline_spark.plans.analytics_ext import (
        part_pareto_frontier,
    )

    exact = {
        r.p_partkey for r in part_pareto_frontier(spark, sf_dir).collect()
    }
    banded = {
        r.p_partkey
        for r in AX8.part_pareto_frontier_banded(spark, sf_dir).collect()
    }
    assert exact <= banded
    # superset must stay bounded — the in-band refinement input
    total = (
        AX8._t(spark, sf_dir, "part").count()
    )
    assert len(banded) <= max(10, total // 4)


def test_binned_twins_have_no_single_partition_sort_window(spark, sf_dir):
    for fn in (
        AX8.customer_balance_ks_binned,
        AX8.customer_revenue_gini_binned,
        AX8.part_revenue_abc_binned,
        AX8.part_pareto_frontier_banded,
    ):
        _assert_no_single_partition_sort_window(fn(spark, sf_dir))


def test_exact_twins_document_the_funnel(spark, sf_dir):
    """The exact forms keep their documented single-partition window —
    the twins exist because of it; pin the contrast so a refactor that
    silently changes either side is caught."""
    from investcloud_data_pipeline_spark.plans.analytics_ext7 import (
        customer_balance_ks_test,
    )
    from investcloud_data_pipeline_spark.plans.temporal import (
        part_revenue_abc,
    )

    for fn in (customer_balance_ks_test, part_revenue_abc):
        assert "Window" in _plan(fn(spark, sf_dir))


def test_session_exact_gap_boundary_merges(spark, tmp_path):
    """Pin the session-gap boundary on exact-gap data: two events
    EXACTLY 30:00 apart must land in ONE session — F.session_window
    merges an event arriving exactly gap after the previous one
    (verified on PySpark 4.1.2) — and the gaps-and-islands DuckDB
    oracle must agree (its split predicate is strictly `>`; an `>=`
    split would produce two sessions and a false mismatch on
    second-granularity data)."""
    import duckdb
    import pandas as pdlib

    rows = [
        (0, pdlib.Timestamp("2024-03-01 00:00:00"), 1, "click", 1.0),
        # exactly gap after the previous event: MERGES
        (1, pdlib.Timestamp("2024-03-01 00:30:00"), 1, "view", 2.0),
        # strictly beyond the gap from event 1: NEW session
        (2, pdlib.Timestamp("2024-03-01 01:00:01"), 1, "click", 4.0),
        # far-future closer so the watermark passes every session end
        (3, pdlib.Timestamp("2024-03-02 00:00:00"), 2, "view", 8.0),
    ]
    pdf = pdlib.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).astype({"ts": "datetime64[us]"})
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pdf.assign(props="{}").to_parquet(f"{sf}/events.parquet", index=False)

    got = {
        (r.session_start, r.session_end, r.user_id, r.n, r.total_micros)
        for r in AX8.session_watermark_rollup(spark, sf).collect()
    }
    con = duckdb.connect()
    con.register("events", pdf)
    oracle = {
        tuple(r)
        for r in con.execute(AX8.SESSION_WATERMARK_ROLLUP_SQL).fetchall()
    }
    assert got == oracle
    # user 1: the exact-gap pair is ONE session (n=2), the +1s event
    # its own (n=1); user 2's closer session is still open → 2 rows
    by_user = sorted((u, n) for _, _, u, n, _ in got)
    assert by_user == [(1, 1), (1, 2)]
