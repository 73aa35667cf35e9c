"""Run any registry query by name and print its result — the ad-hoc
entry point for a user exploring the engine without the driver.

Usage: python tools/run_query.py <query_name> [sf_dir] [--limit N]
       python tools/run_query.py --list [name_filter]

Examples:
    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py dedup_minhash_lsh /root/testdata/sf0.1
    python tools/run_query.py --list dedup
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entrymod

    args = sys.argv[1:]
    if not args or args[0] in ("-h", "--help"):
        print(__doc__)
        return 0

    qs = entrymod.queries()
    if args[0] == "--list":
        pat = args[1].lower() if len(args) > 1 else ""
        oracled = set(entrymod.oracle_sql())
        for name in sorted(qs):
            if pat in name.lower():
                tag = "oracle" if name in oracled else "rows-only"
                print(f"{name}  [{tag}]")
        return 0

    name = args[0]
    rest = [a for a in args[1:] if not a.startswith("--")]
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"
    limit = 50
    if "--limit" in args:
        limit = int(args[args.index("--limit") + 1])

    if name not in qs:
        near = [q for q in sorted(qs) if name.lower() in q.lower()]
        print(f"unknown query {name!r}." + (f" close: {near}" if near else ""))
        return 1

    from investcloud_data_pipeline_spark.session import get_spark

    spark = get_spark("run_query")
    df = qs[name](spark, sf_dir)
    df.show(limit, truncate=False)
    print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
