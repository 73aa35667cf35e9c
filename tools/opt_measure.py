"""Round-13 optimization measurement harness.

Times individual registry queries with the noop sink (guide §1.4) on a
shared session, labels jobs (guide §1.5), and optionally dumps
``explain("formatted")`` to plans/r13/<query>_<tag>.txt so plan claims
in OPTIMIZATION_r13.md are reviewable offline.

Usage:
    python tools/opt_measure.py [--sf DIR] [--passes N] [--plans TAG] q1 q2 ...
    python tools/opt_measure.py --top K          # K slowest from BENCH_DETAIL.json
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import __spark_entry__ as entrymod
    from investcloud_data_pipeline_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    passes = 2
    plan_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            i += 1
            sf_dir = args[i]
        elif a == "--passes":
            i += 1
            passes = int(args[i])
        elif a == "--plans":
            i += 1
            plan_tag = args[i]
        elif a == "--top":
            i += 1
            k = int(args[i])
            detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
            q = detail["queries"]
            names.extend(sorted(q, key=lambda n: -q[n])[:k])
        else:
            names.append(a)
        i += 1

    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1

    spark = get_spark("opt_measure")
    from investcloud_data_pipeline_spark.sources.batch import load_table

    for t in ("lineitem", "events"):
        load_table(spark, sf_dir, t).limit(1).count()

    results: dict[str, list[float]] = {}
    for name in names:
        walls = []
        for p in range(passes):
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            t0 = time.time()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls.append(round(time.time() - t0, 3))
            except Exception as exc:  # noqa: BLE001
                print(f"ERROR {name}: {exc}", file=sys.stderr)
                walls.append(-1.0)
                break
            finally:
                spark.sparkContext.setJobDescription(None)
        results[name] = walls
        print(f"{name}: {walls}", flush=True)
        if plan_tag:
            os.makedirs(os.path.join(REPO, "plans", "r13"), exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
            with open(
                os.path.join(REPO, "plans", "r13", f"{name}_{plan_tag}.txt"),
                "w",
            ) as fh:
                fh.write(buf.getvalue())

    print(json.dumps({n: w for n, w in results.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
