"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB at the given sf dir, then compares row count,
column names, and order-insensitive values (exact match after sorting;
near-miss diagnostics for floats).

Usage: python tools/check_oracle.py [sf_dir] [name_filter...]
       python tools/check_oracle.py --json LEDGER.json [sf_dir] [filter...]

``--json`` additionally writes a machine-readable ledger: one entry per
registry query with mode (oracle | rows-only), status, row count and
wall time — the committed audit artifact for "every queries() entry is
green", not just the driver's sample.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def normalize(rows):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, float):
                v = repr(v)
            norm.append(str(v) if v is not None else "\x00NULL")
        out.append(tuple(norm))
    out.sort()
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from investcloud_data_pipeline_spark.session import get_spark
    from investcloud_data_pipeline_spark.sources.batch import TESTDATA_TABLES

    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    name_filter = args[1:]

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    ledger: dict[str, dict] = {}
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = normalize([tuple(r) for r in sdf.collect()])
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            ledger[name] = {"mode": "oracle" if name in oracles else "rows-only",
                            "status": "FAIL", "err": f"spark error: {exc}"[:500],
                            "secs": round(time.time() - t0, 1)}
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            ledger[name] = {"mode": "rows-only", "status": "PASS",
                            "rows": len(srows),
                            "secs": round(time.time() - t0, 1)}
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = normalize(rel.fetchall())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            ledger[name] = {"mode": "oracle", "status": "FAIL",
                            "err": f"duckdb error: {exc}"[:500],
                            "secs": round(time.time() - t0, 1)}
            failures += 1
            continue
        problems = []
        # type compatibility check (the driver compares schemas; DuckDB's
        # default integer widths differ from Spark's in easy-to-miss ways)
        DUCK_TO_SPARK = {
            "BIGINT": {"bigint"},
            "INTEGER": {"int"},
            "SMALLINT": {"smallint"},
            "DOUBLE": {"double"},
            "FLOAT": {"float"},
            "VARCHAR": {"string"},
            "TIMESTAMP": {"timestamp", "timestamp_ntz"},
            "DATE": {"date"},
            "BOOLEAN": {"boolean"},
            "HUGEINT": set(),  # no Spark equivalent — always flag
        }
        sdtypes = dict(sdf.dtypes)
        for cname, dtype in zip(ocols, otypes):
            stype = sdtypes.get(cname)
            if stype is None:
                continue
            allowed = DUCK_TO_SPARK.get(str(dtype).split("(")[0])
            if allowed is not None and stype not in allowed:
                problems.append(f"type[{cname}] spark={stype} duckdb={dtype}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={scols} oracle={ocols}")
        elif scols != ocols:
            # driver sorts columns by name; align our value compare too
            sidx = [scols.index(c) for c in sorted(scols)]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            srows = sorted(tuple(r[i] for i in sidx) for r in srows)
            orows = sorted(tuple(r[i] for i in oidx) for r in orows)
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        elif srows != orows:
            n_bad = sum(1 for a, b in zip(srows, orows) if a != b)
            example = next((a, b) for a, b in zip(srows, orows) if a != b)
            problems.append(f"values differ in {n_bad}/{len(srows)} sorted rows; "
                            f"first diff:\n  spark : {example[0]}\n  oracle: {example[1]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            ledger[name] = {"mode": "oracle", "status": "FAIL",
                            "err": "; ".join(problems)[:500],
                            "secs": round(time.time() - t0, 1)}
            failures += 1
        else:
            print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            ledger[name] = {"mode": "oracle", "status": "PASS",
                            "rows": len(srows),
                            "secs": round(time.time() - t0, 1)}
    # Vacuous-pass guard (round-6 verdict, item 1): an oracle query that
    # returns 0 rows "passes" by only ever confirming that both engines
    # find nothing — its thresholds, joins and computed columns have
    # never been compared on an emitted row. Surface every such query
    # loudly and record the list in the ledger so an empty-at-every-sf
    # oracle can't hide again.
    empty = sorted(
        n for n, v in ledger.items()
        if v.get("status") == "PASS" and v.get("rows") == 0
    )
    for n in empty:
        print(f"WARN {n}: PASSED WITH 0 ROWS — the "
              f"{ledger[n]['mode']} comparison is vacuous at this sf")
    print(f"\n{'ALL PASS' if not failures else f'{failures} FAILURES'}"
          + (f" ({len(empty)} vacuous 0-row passes: {', '.join(empty)})"
             if empty else ""))
    if json_out:
        import json

        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(ledger),
            "n_oracle": sum(1 for v in ledger.values() if v["mode"] == "oracle"),
            "n_rows_only": sum(1 for v in ledger.values() if v["mode"] == "rows-only"),
            "n_fail": failures,
            "n_empty_pass": len(empty),
            "empty_pass": empty,
            "queries": dict(sorted(ledger.items())),
        }
        with open(json_out, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=False)
            fh.write("\n")
        print(f"ledger written: {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
