"""Stream-stream interval join: streaming output equals the batch join
of the same inputs (self-oracle), and the time bound excludes
out-of-window purchases."""

from __future__ import annotations

import os
from datetime import datetime

import pandas as pd

from investcloud_data_pipeline_spark.streaming.joins import attribute_purchases

CLICKS_SCHEMA = "user_id long, click_ts timestamp, click_id long"
PURCHASES_SCHEMA = "user_id long, purchase_ts timestamp, amount double"


def _ts(minute: int) -> datetime:
    return datetime(2026, 1, 1, 12, minute, 0)


CLICKS = [
    (1, _ts(0), 100),
    (1, _ts(20), 101),   # second click session for user 1
    (2, _ts(5), 200),
    (3, _ts(0), 300),    # user 3 clicks but never buys
]
PURCHASES = [
    (1, _ts(10), 9.99),   # within 15m of click 100 only
    (1, _ts(30), 5.00),   # within 15m of click 101 only
    (2, _ts(25), 7.50),   # 20m after click 200 → outside window, no match
    (4, _ts(10), 1.00),   # user 4 never clicked
]


def test_stream_stream_join_matches_batch(spark, tmp_path):
    cdir, pdir, out, ck = (
        str(tmp_path / d) for d in ("clicks", "purchases", "out", "ck")
    )
    os.makedirs(cdir)
    os.makedirs(pdir)
    # coerce to µs: pandas' default nanosecond INT64 is unreadable as a
    # Spark timestamp column
    pd.DataFrame(CLICKS, columns=["user_id", "click_ts", "click_id"]).to_parquet(
        f"{cdir}/a.parquet", index=False, coerce_timestamps="us"
    )
    pd.DataFrame(
        PURCHASES, columns=["user_id", "purchase_ts", "amount"]
    ).to_parquet(f"{pdir}/a.parquet", index=False, coerce_timestamps="us")

    streamed = attribute_purchases(
        spark.readStream.schema(CLICKS_SCHEMA).parquet(cdir),
        spark.readStream.schema(PURCHASES_SCHEMA).parquet(pdir),
    )
    q = (
        streamed.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.purchase_ts, r.amount, r.click_id)
        for r in spark.read.parquet(out).collect()
    }
    # batch self-oracle: identical plan on static frames
    expected = {
        (r.user_id, r.purchase_ts, r.amount, r.click_id)
        for r in attribute_purchases(
            spark.createDataFrame(
                CLICKS, "user_id long, click_ts timestamp, click_id long"
            ),
            spark.createDataFrame(
                PURCHASES, "user_id long, purchase_ts timestamp, amount double"
            ),
        ).collect()
    }
    assert got == expected
    # semantic spot-checks: each in-window purchase matched exactly its
    # session's click; the 20-minutes-later purchase and the clickless
    # user matched nothing
    assert (1, _ts(10), 9.99, 100) in got
    assert (1, _ts(30), 5.00, 101) in got
    assert not any(u == 2 or u == 4 for (u, *_rest) in got)


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Outer rows materialize only once the click-side watermark passes
    purchase_ts + window — a later wave advances event time and flushes
    the unmatched purchase with null click columns."""
    cdir, pdir, out, ck = (
        str(tmp_path / d) for d in ("oclicks", "opurchases", "oout", "ock")
    )
    os.makedirs(cdir)
    os.makedirs(pdir)

    def write(d, name, rows, cols):
        pd.DataFrame(rows, columns=cols).to_parquet(
            f"{d}/{name}", index=False, coerce_timestamps="us"
        )

    def drain():
        streamed = attribute_purchases(
            spark.readStream.schema(CLICKS_SCHEMA).parquet(cdir),
            spark.readStream.schema(PURCHASES_SCHEMA).parquet(pdir),
            window="15 minutes",
            watermark_delay="10 minutes",
            how="left_outer",
        )
        q = (
            streamed.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # wave 1: user 1 matched; user 4 purchase has no click anywhere
    write(cdir, "w1.parquet", [(1, _ts(0), 100)],
          ["user_id", "click_ts", "click_id"])
    write(pdir, "w1.parquet", [(1, _ts(10), 9.99), (4, _ts(10), 1.00)],
          ["user_id", "purchase_ts", "amount"])
    drain()
    got1 = {
        (r.user_id, r.click_id)
        for r in spark.read.parquet(out).collect()
    }
    assert (1, 100) in got1  # inner match emitted immediately

    # wave 2: far-future rows push both watermarks way past
    # purchase_ts + window → the unmatched user-4 purchase flushes
    far = datetime(2026, 1, 1, 18, 0, 0)
    write(cdir, "w2.parquet", [(9, far, 900)],
          ["user_id", "click_ts", "click_id"])
    write(pdir, "w2.parquet", [(9, far, 0.5)],
          ["user_id", "purchase_ts", "amount"])
    drain()
    drain()  # one more cycle: outer flush happens as watermark commits
    rows = spark.read.parquet(out).collect()
    unmatched = [(r.user_id, r.click_id) for r in rows if r.click_id is None]
    assert (4, None) in unmatched


def test_full_outer_emits_both_sides_unmatched(spark, tmp_path):
    """Round-11 join mode: full_outer emits the unattributed purchase
    (null click columns) AND the convert-nothing click (null purchase
    columns) once the opposing watermark proves no match can arrive;
    inner pairs emit immediately and the batch twin agrees."""
    cdir, pdir, out, ck = (
        str(tmp_path / d) for d in ("fclicks", "fpurchases", "fout", "fck")
    )
    os.makedirs(cdir)
    os.makedirs(pdir)

    def write(d, name, rows, cols):
        pd.DataFrame(rows, columns=cols).to_parquet(
            f"{d}/{name}", index=False, coerce_timestamps="us"
        )

    def drain():
        streamed = attribute_purchases(
            spark.readStream.schema(CLICKS_SCHEMA).parquet(cdir),
            spark.readStream.schema(PURCHASES_SCHEMA).parquet(pdir),
            window="15 minutes",
            watermark_delay="10 minutes",
            how="full_outer",
        )
        q = (
            streamed.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # wave 1: one inner match, one clickless purchase (user 4), one
    # purchaseless click (user 3)
    write(cdir, "w1.parquet", [(1, _ts(0), 100), (3, _ts(0), 300)],
          ["user_id", "click_ts", "click_id"])
    write(pdir, "w1.parquet", [(1, _ts(10), 9.99), (4, _ts(10), 1.00)],
          ["user_id", "purchase_ts", "amount"])
    drain()

    # wave 2: far-future rows push both watermarks past every bound
    far = datetime(2026, 1, 1, 18, 0, 0)
    write(cdir, "w2.parquet", [(9, far, 900)],
          ["user_id", "click_ts", "click_id"])
    write(pdir, "w2.parquet", [(9, far, 0.5)],
          ["user_id", "purchase_ts", "amount"])
    drain()
    drain()  # outer flush lands as the advanced watermark commits

    rows = spark.read.parquet(out).collect()
    got = {
        (r.user_id, r.amount, r.click_id) for r in rows
    }
    assert (1, 9.99, 100) in got            # inner pair
    assert (4, 1.00, None) in got           # purchase-side outer row
    assert (3, None, 300) in got            # click-side outer row (the
    #                                         mode left_outer cannot emit)
    # no key is lost to null-padding: outer rows carry their user_id
    assert all(r.user_id is not None for r in rows)

    # batch twin on the union of both waves produces the same relation
    # (sans the user-9 far rows' own pairing, included in both)
    batch = attribute_purchases(
        spark.createDataFrame(
            [(1, _ts(0), 100), (3, _ts(0), 300), (9, far, 900)],
            CLICKS_SCHEMA,
        ),
        spark.createDataFrame(
            [(1, _ts(10), 9.99), (4, _ts(10), 1.00), (9, far, 0.5)],
            PURCHASES_SCHEMA,
        ),
        window="15 minutes",
        how="full_outer",
    )
    expected = {
        (r.user_id, r.amount, r.click_id) for r in batch.collect()
    }
    assert got == expected


def test_full_outer_rejects_unknown_mode():
    import pytest

    with pytest.raises(ValueError):
        attribute_purchases(None, None, how="right_outer_nested")


def test_chained_stateful_join_then_window_agg(spark, tmp_path):
    """Round-11 chained-stateful class: stream-stream LEFT SEMI
    interval join feeding a downstream watermarked tumbling revenue
    rollup — TWO state stores in one streaming query. Emitted rows
    equal the batch twin restricted to watermark-closed windows, a
    multi-click purchase counts once, and the progress report shows
    both stateful operators."""
    from investcloud_data_pipeline_spark.streaming.joins import (
        attributed_revenue_hourly,
    )

    cdir, pdir, out, ck = (
        str(tmp_path / d) for d in ("cclicks", "cpurch", "cout", "cck")
    )
    os.makedirs(cdir)
    os.makedirs(pdir)

    def write(d, name, rows, cols):
        pd.DataFrame(rows, columns=cols).to_parquet(
            f"{d}/{name}", index=False, coerce_timestamps="us"
        )

    # hour 12: user 1 buys twice (first purchase attributed by TWO
    # clicks — must count once), user 2's purchase is outside its
    # click's window, user 4 has no click; hour 13: one attributed
    # purchase; hour 18: far-future rows that close hours 12/13
    clicks = [
        (1, _ts(0), 100), (1, _ts(5), 101), (2, _ts(5), 200),
        (1, datetime(2026, 1, 1, 13, 0, 0), 102),
        (9, datetime(2026, 1, 1, 18, 0, 0), 900),
    ]
    purchases = [
        (1, _ts(10), 9.5), (1, _ts(18), 4.25), (2, _ts(25), 7.5),
        (4, _ts(10), 1.0),
        (1, datetime(2026, 1, 1, 13, 5, 0), 2.25),
        (9, datetime(2026, 1, 1, 18, 0, 0), 0.5),
    ]
    write(cdir, "w1.parquet", clicks, ["user_id", "click_ts", "click_id"])
    write(pdir, "w1.parquet", purchases,
          ["user_id", "purchase_ts", "amount"])

    streamed = attributed_revenue_hourly(
        spark.readStream.schema(CLICKS_SCHEMA).parquet(cdir),
        spark.readStream.schema(PURCHASES_SCHEMA).parquet(pdir),
        window="15 minutes",
        watermark_delay="10 minutes",
    )
    q = (
        streamed.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    progress = q.lastProgress
    assert progress is not None
    assert len(progress["stateOperators"]) == 2, [
        op["operatorName"] for op in progress["stateOperators"]
    ]

    got = {
        (r.win_start, r.n_purchases, r.revenue_micros)
        for r in spark.read.parquet(out).collect()
    }
    # hour 12: purchases at :10 (attributed, counted ONCE despite two
    # matching clicks) and :18 (attributed via the :05 click); user 2
    # out-of-window and user 4 clickless excluded -> 2 purchases
    assert (datetime(2026, 1, 1, 12, 0, 0), 2, 13_750_000) in got
    assert (datetime(2026, 1, 1, 13, 0, 0), 1, 2_250_000) in got
    # hour 18 is NOT closed by the final watermark -> not emitted
    assert not any(w.hour == 18 for (w, *_r) in got)

    # batch twin on the same static frames, closed-window filtered
    from pyspark.sql import functions as F

    cdf = spark.createDataFrame(clicks, CLICKS_SCHEMA)
    pdf_ = spark.createDataFrame(purchases, PURCHASES_SCHEMA)
    mx = pdf_.groupBy().agg(F.max("purchase_ts").alias("mx"))
    batch = (
        attributed_revenue_hourly(
            cdf, pdf_, window="15 minutes", watermark_delay="10 minutes"
        )
        .crossJoin(F.broadcast(mx))
        .filter(
            F.col("win_start") + F.expr("INTERVAL 1 HOUR")
            <= F.col("mx") - F.expr("INTERVAL 10 MINUTES")
        )
        .select("win_start", "n_purchases", "revenue_micros")
    )
    expected = {
        (r.win_start, r.n_purchases, r.revenue_micros)
        for r in batch.collect()
    }
    assert got == expected
