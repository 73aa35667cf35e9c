"""External connector facades: lake formats and message buses that need
jars not present in this environment.

Each helper probes availability at call time and raises a clear
``NotImplementedError`` when the runtime lacks the connector — callers
get a actionable message instead of a Java ClassNotFoundException five
minutes into a job. The Spark-side call shapes are real; only the jars
are missing here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _has_class(spark: SparkSession, class_name: str) -> bool:
    try:
        # Verify the class is loadable in the JVM without instantiating it.
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(class_name)
        return True
    except Exception:  # noqa: BLE001 - any JVM error means "not available"
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake batch read (requires delta-spark jars on the classpath)."""
    if not _has_class(spark, "org.apache.spark.sql.delta.DeltaLog"):
        raise NotImplementedError(
            "Delta Lake jars not on the classpath; the portable pipeline "
            "uses checkpointed parquet sinks instead (streaming/*)"
        )
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table read (requires iceberg-spark-runtime + catalog conf)."""
    if not _has_class(spark, "org.apache.iceberg.spark.source.SparkTable"):
        raise NotImplementedError(
            "Iceberg runtime not on the classpath; configure "
            "spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog "
            "in a deployment that ships the jar"
        )
    return spark.read.table(table)


def read_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """Kafka streaming source (requires spark-sql-kafka jars)."""
    if not _has_class(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    ):
        raise NotImplementedError(
            "Kafka connector not on the classpath; the pipeline's "
            "file-source streams (streaming/bronze.py) are the in-repo "
            "ingestion path"
        )
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .load()
    )
