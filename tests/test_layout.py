"""Z-order layout: Morton interleave math, key locality, clustered
write, and snapshot time travel / retention."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from investcloud_data_pipeline_spark.operators.layout import (
    interleave_bits,
    write_zordered,
    zorder_key,
)


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for j in range(bits):
        out |= ((x >> j) & 1) << (2 * j)
        out |= ((y >> j) & 1) << (2 * j + 1)
    return out


def test_interleave_matches_reference_morton(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", interleave_bits([F.col("x"), F.col("y")], bits=3)
    )
    for r in df.collect():
        assert r.z == _morton2(r.x, r.y, 3), (r.x, r.y)


def test_zorder_key_groups_both_dimensions(spark):
    # 32x32 grid: rows close in z must be close in BOTH x and y.
    rows = [(i, i % 32, i // 32) for i in range(1024)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    keyed = zorder_key(df, ["x", "y"], bits=5).orderBy("_zorder").collect()
    # consecutive z-neighbors: Chebyshev distance stays tiny vs a
    # row-major sort where y-neighbors are 32 apart in x-order.
    dists = [
        max(abs(a.x - b.x), abs(a.y - b.y))
        for a, b in zip(keyed, keyed[1:])
    ]
    assert sorted(dists)[len(dists) // 2] <= 2          # median hop tiny
    assert sum(d > 8 for d in dists) / len(dists) < 0.05  # few long jumps


def test_write_zordered_tightens_file_stats(spark, tmp_path):
    # uniform 2-d data written z-ordered: every file's x-range AND
    # y-range should cover well under the full domain (a 1-d sort
    # leaves the second column's per-file range at ~full width).
    rows = [((i * 7919) % 4096, (i * 104729) % 4096) for i in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long")
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], num_files=16, bits=6)

    import pyarrow.parquet as pq
    import pyarrow.dataset as ds

    widths_x, widths_y = [], []
    for f in ds.dataset(path, format="parquet").files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            s = {md.row_group(rg).column(i).path_in_schema:
                 md.row_group(rg).column(i).statistics
                 for i in range(md.row_group(rg).num_columns)}
            widths_x.append(s["x"].max - s["x"].min)
            widths_y.append(s["y"].max - s["y"].min)
    avg_x = sum(widths_x) / len(widths_x)
    avg_y = sum(widths_y) / len(widths_y)
    # both dimensions pruned: average row-group width well under the
    # 4096 domain (a single-column sort gives ~domain width on the other)
    assert avg_x < 4096 * 0.6 and avg_y < 4096 * 0.6, (avg_x, avg_y)


def test_snapshot_retention_and_time_travel(spark, tmp_path):
    from investcloud_data_pipeline_spark.streaming.atomic import list_versions
    from investcloud_data_pipeline_spark.streaming.cdc import (
        apply_cdc_batch,
        read_version,
    )

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    change_schema = T.StructType(
        list(schema.fields)
        + [T.StructField("op", T.StringType()), T.StructField("seq", T.LongType())]
    )
    root = str(tmp_path / "snap")
    import os

    os.makedirs(root, exist_ok=True)
    for epoch, val in enumerate(["a", "b", "c"]):
        batch = spark.createDataFrame([(1, val, "U", epoch)], change_schema)
        apply_cdc_batch(
            spark, root, schema, ["k"], "seq", batch, epoch_id=epoch, retain=2
        )

    assert list_versions(root) == [1, 2]  # retain=2 keeps current + 1
    old = {r.k: r.v for r in read_version(spark, root, schema, 1).collect()}
    assert old == {1: "b"}
    cur = {r.k: r.v for r in read_version(spark, root, schema, 2).collect()}
    assert cur == {1: "c"}
    with pytest.raises(FileNotFoundError, match="retained: \\[1, 2\\]"):
        read_version(spark, root, schema, 0)
