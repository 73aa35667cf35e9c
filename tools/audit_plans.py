"""Full-registry physical-plan audit: sweep every ``queries()`` entry
and flag scale anti-patterns in the executed plan.

Flags (each a "would this survive 100 TB?" smell):

* ``BatchEvalPython``    — row-at-a-time pickled Python UDF in the plan
                           (the hot path must be Arrow-batched or JVM).
* ``CartesianProduct``   — non-broadcast cross join. Broadcast 1-row
                           folds (BroadcastNestedLoopJoin over a scalar
                           aggregate) are the sanctioned pattern and are
                           NOT flagged.
* ``SortMergeJoin``      — acceptable for fact⋈fact, but listed so a
                           dimension join that lost its broadcast is
                           visible in review.
* ``Exchange`` count     — informational; sudden growth in a query's
                           shuffle count is the cheapest regression
                           signal there is.

Usage: python tools/audit_plans.py [sf_dir] [--out PLAN_AUDIT.md]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from investcloud_data_pipeline_spark.session import get_spark

    spark = get_spark("audit_plans")

    def count_nodes(plan) -> dict:
        """Walk the physical-plan tree counting operator kinds, WITHOUT
        descending into an InMemoryTableScan's cached relation: a
        persisted subtree executes once regardless of how many scans
        reference it, so its inner Exchanges would be over-counted by a
        plain string count (e.g. a triple self-join on one cached pair
        relation printed the pair plan's exchanges three times)."""
        counts = {"Exchange": 0, "SortMergeJoin": 0,
                  "BatchEvalPython": 0, "CartesianProduct": 0}
        cached_inner = []
        stack = [plan]
        while stack:
            node = stack.pop()
            name = node.nodeName()
            for key in counts:
                # ReusedExchange is a POINTER to an exchange that runs
                # once — counting it as a fresh Exchange overstates the
                # shuffle bill of any plan that fans one relation into
                # several consumers (e.g. the r6 duplicate-collapse
                # expansion joins read `members` four times).
                if key in name and not (
                    key == "Exchange" and "Reused" in name
                ):
                    counts[key] += 1
            if "AdaptiveSparkPlan" in name:
                # AQE wrapper exposes no children; audit its initial plan
                stack.append(node.initialPlan())
                continue
            if "QueryStage" in name:
                stack.append(node.plan())
                continue
            if "InMemoryTableScan" in name:
                # the cached plan is audited once, separately
                try:
                    cached_inner.append(
                        node.relation().cachedPlan()
                    )
                except Exception:  # noqa: BLE001
                    pass
                continue
            children = node.children()
            it = children.iterator()
            while it.hasNext():
                stack.append(it.next())
            # subqueries (broadcast scalar folds etc.) live off-tree
            try:
                sit = node.subqueries().iterator()
                while sit.hasNext():
                    stack.append(sit.next().plan())
            except Exception:  # noqa: BLE001
                pass
        # each DISTINCT cached plan contributes once
        seen = set()
        for inner in cached_inner:
            key = inner.toString()
            if key in seen:
                continue
            seen.add(key)
            sub = count_nodes(inner)
            for k in counts:
                counts[k] += sub[k]
        return counts

    # Sanctioned exceptions: flags that are DELIBERATE, each with the
    # justification printed into the report (the audit stays honest —
    # the node is still listed — but an adjudicated flag doesn't fail
    # the run; remove the entry and the run fails again).
    ADJUDICATED = {
        "text_chunking_udtf": (
            "BatchEvalPython",
            "UDTF API demonstration kept on the pickled evaluator "
            "(measured 3.5x faster than Arrow at this row shape, "
            "BASELINE parity); the production chunker is the flag-free "
            "text_chunking_explode JVM twin (row-identity tested)",
        ),
    }

    rows = []
    hard_flags = 0
    adjudications = []
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            # exchange counts must not depend on audit order: a sibling
            # query's persisted/cached relation turns exchanges into
            # InMemoryTableScan reuse (round-10 measured 9 vs 32 on
            # copurchase_link_prediction depending on what ran before)
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            jplan = df._jdf.queryExecution().executedPlan()
            counts = count_nodes(jplan)
        except Exception as exc:  # noqa: BLE001
            rows.append((name, -1, -1, -1, f"ERROR: {exc}"))
            hard_flags += 1
            continue
        n_exchange = counts["Exchange"]
        n_smj = counts["SortMergeJoin"]
        batch_eval = counts["BatchEvalPython"]
        cartesian = counts["CartesianProduct"]
        notes = []
        adj = ADJUDICATED.get(name)
        if batch_eval:
            notes.append(f"BatchEvalPython x{batch_eval}")
            if adj and adj[0] == "BatchEvalPython":
                notes.append("ADJUDICATED")
                adjudications.append((name, adj[1]))
            else:
                hard_flags += 1
        if cartesian:
            notes.append(f"CartesianProduct x{cartesian}")
            if adj and adj[0] == "CartesianProduct":
                notes.append("ADJUDICATED")
                adjudications.append((name, adj[1]))
            else:
                hard_flags += 1
        rows.append(
            (name, n_exchange, n_smj, round(time.time() - t0, 1),
             "; ".join(notes))
        )

    rows.sort(key=lambda r: (-(r[1] if isinstance(r[1], int) else 99), r[0]))
    lines = [
        "# PLAN AUDIT — full registry",
        "",
        f"Generated by `python tools/audit_plans.py {sf_dir}`: executed-plan",
        "sweep of every registry query. Hard flags (row-at-a-time Python,",
        "non-broadcast cartesian, construction error) fail the run;",
        "Exchange / SortMergeJoin counts are review signals.",
        "",
        "| query | exchanges | sort-merge joins | flags |",
        "|---|---|---|---|",
    ]
    for name, n_ex, n_smj, _secs, notes in rows:
        lines.append(f"| {name} | {n_ex} | {n_smj} | {notes} |")
    if adjudications:
        lines += ["", "## Adjudicated flags", ""]
        for name, why in adjudications:
            lines.append(f"- **{name}** — {why}")
    report = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(report)
        print(f"audit written: {out_path}")
    else:
        print(report)
    worst = rows[0]
    print(
        f"{len(rows)} queries audited; hard flags: {hard_flags}; "
        f"max exchanges: {worst[1]} ({worst[0]})"
    )
    return 1 if hard_flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
