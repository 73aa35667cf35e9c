"""Continuous-mode orchestration smoke: all three layer queries running
concurrently with processing-time triggers, data flowing end to end,
clean shutdown."""

from __future__ import annotations

import os
import time

from investcloud_data_pipeline_spark.config import PipelinePaths
from investcloud_data_pipeline_spark.datagen import (
    make_ip_region_frame,
    write_activity_files,
)
from investcloud_data_pipeline_spark.streaming.pipeline import start_continuous


def test_continuous_pipeline_flows_and_stops(spark, tmp_path):
    paths = PipelinePaths(str(tmp_path))
    os.makedirs(paths.raw, exist_ok=True)
    write_activity_files(paths.raw, num_files=2, rows_per_file=200)
    ip_regions = spark.createDataFrame(make_ip_region_frame())

    queries = start_continuous(
        spark, paths, ip_regions, trigger_seconds=2
    )
    try:
        deadline = time.time() + 120
        gold_rows = 0
        while time.time() < deadline:
            try:
                gold_rows = spark.read.parquet(paths.gold).count()
                if gold_rows > 0:
                    break
            except Exception:  # gold not written yet
                pass
            time.sleep(2)
        assert gold_rows > 0, "data never reached the gold layer"
        assert all(q.isActive for q in queries)
        assert all(q.exception() is None for q in queries)
    finally:
        for q in queries:
            q.stop()
    for q in queries:
        q.awaitTermination(30)
    assert not any(q.isActive for q in queries)
