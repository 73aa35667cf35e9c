"""Index-growth benchmark for the streaming IVF embedding-index stage
(streaming/documents.py::start_embedding_index_ingest).

The stage's claim: the index is appended PARTITIONED BY cell, so an
IVF probe over the accumulated index is plain partition pruning —
probe latency tracks the PROBED CELLS' share of the corpus, and the
unprobed cells' growth is never touched. This bench drives the stream
one micro-batch at a time and, after EACH batch, measures (a) the
ingest trigger duration, (b) the wall of an nprobe=2 exact-L2 top-k
probe over the accumulated index, and (c) the number of data files the
probe's scan actually touched vs the index total (the pruning
evidence: touched files stay proportional to the probed cells while
the total grows ~linearly).

Usage: python tools/bench_embedding_ingest.py [out.json] [n_batches] [vecs_per_batch] [dim]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _batch_vectors(b: int, n: int, dim: int):
    import numpy as np

    rs = np.random.RandomState(1000 + b)
    # a few gaussian blobs so the coarse quantizer has real structure
    centers = np.random.RandomState(7).randn(8, dim) * 3.0
    labels = rs.randint(0, 8, size=n)
    return centers[labels] + rs.randn(n, dim)


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    per_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
    dim = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from investcloud_data_pipeline_spark.session import get_spark
    from investcloud_data_pipeline_spark.streaming.documents import (
        start_embedding_index_ingest,
    )

    spark = get_spark("bench_embedding_ingest")
    work = tempfile.mkdtemp(prefix="emb_ingest_bench_")
    src, index_dir, cent_dir, ck = (
        os.path.join(work, d) for d in ("src", "index", "cent", "ck")
    )
    os.makedirs(src)

    qvec = _batch_vectors(0, 1, dim)[0]
    n_probe = 2
    cycles = []
    for b in range(n_batches):
        vecs = _batch_vectors(b, per_batch, dim)
        # EMB_SCHEMA expects array<float>: write list<float32> explicitly
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table(
            {
                "vec_id": pa.array(
                    [b * per_batch + i for i in range(per_batch)],
                    type=pa.int64(),
                ),
                "embedding": pa.array(
                    [v.astype("float32") for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * per_batch, type=pa.int32()),
            }
        )
        pq.write_table(table, os.path.join(src, f"b{b:03d}.parquet"))
        t0 = time.time()
        q = start_embedding_index_ingest(
            spark, src, index_dir, cent_dir, ck, n_cells=16
        )
        q.awaitTermination(600)
        ingest_s = round(time.time() - t0, 2)

        # probe: nearest n_probe cells by the stored centroids, exact
        # L2 top-10 over ONLY those cells of the accumulated index
        cent = spark.read.parquet(
            os.path.join(cent_dir, "centroids.parquet")
        ).collect()
        cmat = np.asarray([r.centroid for r in cent])
        cells = np.argsort(((cmat - qvec) ** 2).sum(axis=1))[:n_probe]
        cells = [int(c) for c in cells]
        idx = spark.read.parquet(index_dir).filter(
            F.col("cell").isin(cells)
        )
        qlit = F.array(*[F.lit(float(x)) for x in qvec])
        dist = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                qlit,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda a, e: a + e,
        )
        probe_df = (
            idx.select("vec_id", dist.alias("l2"))
            .orderBy("l2", "vec_id")
            .limit(10)
        )
        walls = []
        for _ in range(2):
            t1 = time.time()
            probe_df.collect()
            walls.append(round(time.time() - t1, 3))
        # file counts from the filesystem: PartitionFilters (asserted
        # below) guarantees the scan touches only the probed cells'
        # directories — inputFiles() would list the whole relation
        def _files_under(*cell_ids):
            want = {f"cell={c}" for c in cell_ids}
            n = 0
            for root, _, files in os.walk(index_dir):
                parts = set(root.split(os.sep))
                if want and not (want & parts):
                    continue
                n += sum(f.endswith(".parquet") for f in files)
            return n

        touched = _files_under(*cells)
        total_files = _files_under()
        plan = probe_df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[[^\]]*cell[^\]]*\]", plan)
        cycles.append(
            {
                "batch": b,
                "index_rows": (b + 1) * per_batch,
                "ingest_s": ingest_s,
                "probe_wall_s": min(walls),
                "files_touched": touched,
                "files_total": total_files,
                "partition_filter_pinned": bool(m),
            }
        )
        print(json.dumps(cycles[-1], separators=(",", ":")),
              file=sys.stderr)

    assert all(c["partition_filter_pinned"] for c in cycles)
    assert all(
        c["files_touched"] < c["files_total"] for c in cycles[1:]
    ), "probe stopped pruning partitions"
    first, last = cycles[1]["probe_wall_s"], cycles[-1]["probe_wall_s"]
    out = {
        "metric": "embedding_index_probe_wall_vs_growth",
        "unit": "sec",
        "n_batches": n_batches,
        "vecs_per_batch": per_batch,
        "dim": dim,
        "n_probe": n_probe,
        "cycles": cycles,
        "probe_last_over_first_steady": (
            round(last / first, 2) if first > 0 else None
        ),
    }
    shutil.rmtree(work, ignore_errors=True)
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
