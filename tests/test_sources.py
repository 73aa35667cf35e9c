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
