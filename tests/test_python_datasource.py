"""Python Data Source API: the engine-native activity-log generator is
deterministic, executor-sharded, pipes through the quality split, and
its streaming form respects the admission cap + checkpoint recovery."""

from __future__ import annotations

from investcloud_data_pipeline_spark.operators.quality import parse_raw, split_quality
from investcloud_data_pipeline_spark.sources.python_datasource import register


def _read(spark, **opts):
    r = spark.read.format("activity_log")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_batch_read_is_deterministic_and_sharded(spark):
    register(spark)
    df = _read(spark, rowsPerPartition=200, numPartitions=4, seed=7)
    assert df.columns == [
        "log_id", "user_id", "timestamp", "ip_address", "watch_time(min)"
    ]
    assert df.count() == 800
    assert df.rdd.getNumPartitions() == 4
    # same options → byte-identical content; different seed → different
    rows1 = sorted(map(tuple, df.collect()))
    rows2 = sorted(map(tuple, _read(
        spark, rowsPerPartition=200, numPartitions=4, seed=7).collect()))
    assert rows1 == rows2
    other = sorted(map(tuple, _read(
        spark, rowsPerPartition=200, numPartitions=4, seed=8).collect()))
    assert rows1 != other
    # shards are distinct slices, not copies of one another
    per_part = df.rdd.glom().map(len).collect()
    assert per_part == [200, 200, 200, 200]


def test_generated_rows_flow_through_quality_split(spark):
    register(spark)
    raw = _read(spark, rowsPerPartition=300, numPartitions=2, seed=3,
                dirtyFraction=0.1, dupFraction=0.0)
    valid, quarantine = split_quality(parse_raw(raw))
    n_valid, n_quar = valid.count(), quarantine.count()
    assert n_valid + n_quar == 600
    assert n_quar > 0  # dirty injection reached the DQ predicate
    assert valid.filter("watch_time < 0").count() == 0


def test_stream_respects_cap_and_checkpoint(spark, tmp_path):
    register(spark)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_once():
        q = (
            spark.readStream.format("activity_log")
            .option("batchRows", 100)
            .option("numPartitions", 2)
            .option("maxBatches", 3)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.schema(
        "log_id string, user_id string, timestamp string, "
        "ip_address string, `watch_time(min)` long"
    ).parquet(out)
    assert got.count() == 300  # 3 waves × 100 rows (2 shards × 50)
    # restart with the same checkpoint: the bounded stream is fully
    # consumed, so a fresh reader instance appends NOTHING (exactly-once)
    run_once()
    assert spark.read.parquet(out).count() == 300


def test_shards_per_task_is_data_invariant(spark):
    """Batching shards into fewer tasks (worker-startup amortization)
    must never change the produced rows — shard content is seed-pure."""
    from investcloud_data_pipeline_spark.sources.python_datasource import register

    register(spark)

    def load(shards_per_task):
        return (
            spark.read.format("activity_log")
            .option("rowsPerPartition", "200")
            .option("numPartitions", "4")
            .option("shardsPerTask", str(shards_per_task))
            .option("seed", "11")
            .load()
        )

    base = sorted(map(tuple, load(1).collect()))
    assert sorted(map(tuple, load(2).collect())) == base
    assert sorted(map(tuple, load(4).collect())) == base
    # 4 shards / 2 per task → 2 Spark partitions
    assert load(2).rdd.getNumPartitions() == 2
