"""Source/sink format breadth: parquet, csv, json, orc round-trips with
enforced schemas, and the external-connector facades' graceful
degradation in a jar-less environment."""

from __future__ import annotations

import pytest

from investcloud_data_pipeline_spark.sources.external import (
    read_delta,
    read_iceberg,
    read_kafka_stream,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, None, 0.0)],
        "id long, s string, v double",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_round_trip(spark, tmp_path, df, fmt):
    path = str(tmp_path / fmt)
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)

    reader = spark.read.schema("id long, s string, v double")
    if fmt == "csv":
        reader = reader.option("header", "true")
    back = reader.format(fmt).load(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_external_connectors_degrade_gracefully(spark):
    with pytest.raises(NotImplementedError, match="Delta"):
        read_delta(spark, "/tmp/nowhere")
    with pytest.raises(NotImplementedError, match="Iceberg"):
        read_iceberg(spark, "cat.db.t")
    with pytest.raises(NotImplementedError, match="Kafka"):
        read_kafka_stream(spark, "localhost:9092", "t")
