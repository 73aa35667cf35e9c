"""Batch source tests: enforced-schema CSV ingest with PERMISSIVE
corrupt-record routing (reference S3/T6 — badRecordsPath equivalent)."""

from __future__ import annotations

from investcloud_data_pipeline_spark.datagen import write_activity_files
from investcloud_data_pipeline_spark.sources.batch import read_raw_csv


def test_csv_schema_enforced_and_corrupt_routed(spark, tmp_path):
    src = str(tmp_path / "csv")
    write_activity_files(src, num_files=1, rows_per_file=50, fmt="csv")
    # append a structurally corrupt line (non-numeric watch_time)
    import glob

    path = glob.glob(f"{src}/*.csv")[0]
    with open(path, "a") as f:
        f.write("log_x,user_x,2024-02-01T00:00:00,1.2.3.4,NOT_A_NUMBER\n")

    records, corrupt = read_raw_csv(spark, src)
    assert records.count() == 50
    assert records.schema["watch_time(min)"].dataType.simpleString() == "bigint"
    bad = corrupt.collect()
    assert len(bad) == 1
    assert "NOT_A_NUMBER" in bad[0][0]


class TestSchemaEvolution:
    """Auto Loader schemaLocation/addNewColumns parity (SURVEY §1.3):
    tracked schema persists, new columns evolve on restart, old files
    null-fill, incompatible type changes raise."""

    def test_evolves_new_column_across_restart(self, spark, tmp_path):
        import pandas as pd

        from investcloud_data_pipeline_spark.sources.schema_tracking import (
            load_tracked_schema,
            read_stream_evolving,
        )

        raw = str(tmp_path / "raw")
        loc = str(tmp_path / "schema")
        out = str(tmp_path / "out")
        ck = str(tmp_path / "ck")
        import os as _os

        _os.makedirs(raw)
        pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_parquet(
            f"{raw}/wave1.parquet", index=False
        )

        def drain():
            q = (
                read_stream_evolving(spark, raw, loc)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        drain()
        assert [f.name for f in load_tracked_schema(loc).fields] == ["a", "b"]

        # wave 2 adds column c → restart picks it up; wave-1 rows null-fill
        pd.DataFrame(
            {"a": [3], "b": ["z"], "c": [9.5]}
        ).to_parquet(f"{raw}/wave2.parquet", index=False)
        drain()
        got = spark.read.option("mergeSchema", "true").parquet(out)
        assert set(got.columns) == {"a", "b", "c"}
        rows = {r.a: r.c for r in got.collect()}
        assert rows[3] == 9.5 and rows[1] is None

    def test_numeric_widening_and_incompatible_raise(self, spark, tmp_path):
        import pytest as _pytest
        from pyspark.sql import types as T

        from investcloud_data_pipeline_spark.sources.schema_tracking import (
            merge_schemas,
        )

        old = T.StructType([T.StructField("v", T.IntegerType())])
        wide = T.StructType([T.StructField("v", T.DoubleType())])
        assert merge_schemas(old, wide)["v"].dataType == T.DoubleType()
        assert merge_schemas(wide, old)["v"].dataType == T.DoubleType()

        bad = T.StructType([T.StructField("v", T.StringType())])
        with _pytest.raises(ValueError, match="incompatible evolution"):
            merge_schemas(old, bad)


class TestTimestampTypeContract:
    """events.ts must surface as TIMESTAMP (ltz) regardless of the parquet
    logical type the generator wrote (INT64 nanos → legacy long read, or
    isAdjustedToUTC=false → TIMESTAMP_NTZ). Every time function in the
    registry (unix_micros, window(), watermarks) requires TIMESTAMP, so a
    drift here breaks queries far from the source — pin it at load."""

    def test_ts_is_timestamp_ltz_across_sf_dirs(self, spark):
        import os

        from pyspark.sql.types import TimestampType

        from investcloud_data_pipeline_spark.sources.batch import load_table

        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            d = f"/root/testdata/{sf}"
            if not os.path.isdir(d):
                continue
            df = load_table(spark, d, "events")
            assert isinstance(df.schema["ts"].dataType, TimestampType), (
                f"{sf}: events.ts is {df.schema['ts'].dataType}, "
                "expected TIMESTAMP — load_table normalization regressed"
            )

    def test_unix_micros_works_on_loaded_events(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from investcloud_data_pipeline_spark.sources.batch import load_table

        df = load_table(spark, sf_dir, "events")
        row = df.select(F.unix_micros("ts").alias("us")).first()
        assert row["us"] is not None
