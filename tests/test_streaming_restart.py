"""Restart recovery: stop the continuous pipeline, add data, restart
from the same checkpoints — no loss, no double-processing."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.config import PipelinePaths
from investcloud_data_pipeline_spark.datagen import (
    make_ip_region_frame,
    write_activity_files,
)
from investcloud_data_pipeline_spark.streaming.pipeline import start_continuous


def _wait_for(fn, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            if fn():
                return True
        except Exception:
            pass
        time.sleep(2)
    return False


def test_continuous_restart_no_loss_no_dup(spark, tmp_path):
    paths = PipelinePaths(str(tmp_path))
    os.makedirs(paths.raw, exist_ok=True)
    ip_regions = spark.createDataFrame(make_ip_region_frame())
    write_activity_files(paths.raw, num_files=2, rows_per_file=200)

    queries = start_continuous(spark, paths, ip_regions, trigger_seconds=2)
    assert _wait_for(
        lambda: spark.read.parquet(paths.bronze).count() == 400
    ), "wave 1 never fully ingested"
    for q in queries:
        q.stop()
    for q in queries:
        q.awaitTermination(30)

    # second wave lands while the pipeline is DOWN
    write_activity_files(paths.raw, num_files=1, rows_per_file=100, start_index=5)

    queries = start_continuous(spark, paths, ip_regions, trigger_seconds=2)
    try:
        assert _wait_for(
            lambda: spark.read.parquet(paths.bronze).count() == 500
        ), "wave 2 not picked up after restart"
        bronze = spark.read.parquet(paths.bronze)
        # no double-processing: every log_id appears exactly as often as
        # in the raw input (bronze does no dedup, so multiset must match)
        raw_counts = (
            spark.read.parquet(paths.raw)
            .groupBy("log_id")
            .agg(F.count("*").alias("n"))
        )
        bronze_counts = bronze.groupBy("log_id").agg(F.count("*").alias("n"))
        assert raw_counts.subtract(bronze_counts).count() == 0
        assert bronze_counts.subtract(raw_counts).count() == 0
    finally:
        for q in queries:
            q.stop()
        for q in queries:
            q.awaitTermination(30)
