"""Sampling operators: hash-split is deterministic and ~81/19, stratified
sample is reproducible for a fixed seed and respects per-stratum rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.operators.sampling import (
    deterministic_split,
    stratified_sample,
)
from investcloud_data_pipeline_spark.sources.batch import load_table


def test_split_is_deterministic_and_disjoint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.split for r in deterministic_split(d).collect()}
    b = {r.doc_id: r.split for r in deterministic_split(d).collect()}
    assert a == b
    assert set(a.values()) == {"train", "test"}
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.68 < frac_train < 0.92  # 13/16 ≈ 0.8125 ± corpus noise


def test_split_ratio_tunable(spark):
    df = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    half = deterministic_split(df, train_nibbles=8)
    frac = half.filter("split = 'train'").count() / 4000
    assert 0.44 < frac < 0.56


def test_stratified_sample_reproducible_and_rate_respecting(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    fr = {"en": 0.5, "de": 0.2}
    s1 = sorted(r.doc_id for r in stratified_sample(d, "lang", fr, 7).collect())
    s2 = sorted(r.doc_id for r in stratified_sample(d, "lang", fr, 7).collect())
    assert s1 == s2  # same seed + partitioning → identical sample
    s3 = sorted(r.doc_id for r in stratified_sample(d, "lang", fr, 8).collect())
    assert s1 != s3  # different seed → different sample
    # only the named strata are sampled, at roughly their fractions
    got = stratified_sample(d, "lang", fr, 7).groupBy("lang").count()
    base = d.groupBy("lang").count()
    rates = {
        r.lang: n / dict((b.lang, b["count"]) for b in base.collect())[r.lang]
        for r in got.collect()
        for n in [r["count"]]
    }
    assert set(rates) <= set(fr)
    assert all(abs(rates[lg] - fr[lg]) < 0.25 for lg in rates)
