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


def _jvm_has(spark, cls):
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def test_external_connectors_degrade_gracefully(spark):
    if not _jvm_has(spark, "org.apache.spark.sql.delta.DeltaLog"):
        with pytest.raises(NotImplementedError, match="Delta"):
            read_delta(spark, "/tmp/nowhere")
    if not _jvm_has(spark, "org.apache.iceberg.spark.source.SparkTable"):
        with pytest.raises(NotImplementedError, match="Iceberg"):
            read_iceberg(spark, "cat.db.t")
    if not _jvm_has(spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"):
        with pytest.raises(NotImplementedError, match="Kafka"):
            read_kafka_stream(spark, "localhost:9092", "t")


def test_delta_roundtrip_or_environment_gate(spark, tmp_path):
    """Environment-gate assertion for the transactional-format surface:
    this image ships NO lake-format jars (verified against the JVM
    classpath, not assumed), so the facade MUST raise its documented
    error and the repo's own versioned-snapshot protocol
    (streaming/atomic.py) is the transactional substitute. If a future
    environment adds delta-spark, this same test flips to a real
    write/read round-trip parity check instead of silently skipping."""
    has_delta = _jvm_has(spark, "org.apache.spark.sql.delta.DeltaLog")
    path = str(tmp_path / "delta_tbl")
    if has_delta:
        df = spark.range(100).selectExpr("id", "id % 7 AS k", "cast(id * 1.5 as double) AS v")
        df.write.format("delta").mode("overwrite").save(path)
        back = read_delta(spark, path)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    else:
        # Explicit gate: both the reader class and the DataSource v2
        # provider must be absent — a half-present classpath would make
        # the facade's message misleading.
        assert not _jvm_has(spark, "io.delta.sql.DeltaSparkSessionExtension")
        with pytest.raises(NotImplementedError, match="Delta Lake jars not on the classpath"):
            read_delta(spark, path)


def test_iceberg_roundtrip_or_environment_gate(spark, tmp_path):
    """Same gate protocol as the Delta test, for Iceberg: this image
    ships no iceberg-spark-runtime (verified against the JVM classpath),
    so the facade MUST raise its documented error; with the jar present
    the test flips to a real hadoop-catalog round-trip."""
    has_iceberg = _jvm_has(spark, "org.apache.iceberg.spark.source.SparkTable")
    if has_iceberg:
        cat = "ice_test"
        spark.conf.set(
            f"spark.sql.catalog.{cat}", "org.apache.iceberg.spark.SparkCatalog"
        )
        spark.conf.set(f"spark.sql.catalog.{cat}.type", "hadoop")
        spark.conf.set(
            f"spark.sql.catalog.{cat}.warehouse", str(tmp_path / "wh")
        )
        df = spark.range(50).selectExpr("id", "id % 5 AS k")
        df.writeTo(f"{cat}.db.t").create()
        back = read_iceberg(spark, f"{cat}.db.t")
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, df.collect())
        )
    else:
        # the catalog plugin class must be absent too, or the facade's
        # "configure spark.sql.catalog..." advice would be misleading
        assert not _jvm_has(spark, "org.apache.iceberg.spark.SparkCatalog")
        with pytest.raises(
            NotImplementedError, match="Iceberg runtime not on the classpath"
        ):
            read_iceberg(spark, "cat.db.t")


def test_kafka_stream_or_environment_gate(spark):
    """Same gate protocol for the Kafka source: without
    spark-sql-kafka the facade raises its documented error; with the
    jar present it must return an unstarted STREAMING frame with the
    Kafka source's fixed schema (no broker needed until .start())."""
    has_kafka = _jvm_has(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    )
    if has_kafka:
        stream = read_kafka_stream(spark, "localhost:9092", "t")
        assert stream.isStreaming
        assert {"key", "value", "topic", "partition", "offset"} <= set(
            stream.columns
        )
    else:
        with pytest.raises(
            NotImplementedError, match="Kafka connector not on the classpath"
        ):
            read_kafka_stream(spark, "localhost:9092", "t")


def test_avro_roundtrip_or_environment_gate(spark, tmp_path, df):
    """Same gate protocol as Delta/Iceberg/Kafka for the spark-avro
    external module (separate jar): with the jar present this is a real
    round-trip; without it the documented error surface must fire -- an
    assertion, not a skip, so the suite's zero-skip contract holds."""
    path = str(tmp_path / "avro")
    try:
        df.write.format("avro").mode("overwrite").save(path)
        registered = True
    except Exception as exc:
        registered = False
        # the documented gate surface: Spark names the missing module
        # and points at the Avro deployment guide
        assert "avro" in str(exc).lower()
        assert "Failed to find data source" in str(exc)
    if registered:
        back = spark.read.format("avro").load(path)
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, df.collect())
        )
