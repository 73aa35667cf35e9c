"""Corpus sampling: deterministic train/test assignment and stratified
sampling — the operators that carve a cleaned corpus into datasets.

Split assignment hashes the DOCUMENT ID (md5, first hex nibble), not a
random number: the same document lands in the same split on any engine,
any cluster size, any run — the property that keeps train/test
contamination auditable when the corpus is rebuilt. 13 of 16 nibbles
(0-c) → ~81% train; pass ``train_nibbles`` to tune in 1/16 steps.

Stratified sampling wraps ``DataFrame.sampleBy`` (per-stratum Bernoulli
with a fixed seed): one pass, no shuffle, sample size ≈ fraction within
each stratum — how you hold label balance when downsampling a corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_nibbles: int = 13,
) -> DataFrame:
    """Add a ``split`` column ('train' | 'test') from the first hex
    nibble of md5(id): nibble < train_nibbles → train."""
    if not 1 <= train_nibbles <= 15:
        raise ValueError("train_nibbles must be in [1, 15]")
    bound = format(train_nibbles, "x")
    nibble = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return df.withColumn(
        "split", F.when(nibble < bound, "train").otherwise("test")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample with a pinned seed (deterministic
    for a fixed input partitioning)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def source_mix_rates(
    df: DataFrame,
    strata_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Per-source sampling rates that equalize the token contribution of
    every source (the "data mixture" step of corpus assembly: cap
    over-represented crawls so no single source dominates training).

    target = the smallest source's token total; rate = target / own
    total (≤ 1 by construction, deterministic arithmetic — no RNG, so
    the output is oracle-checkable; feed the rates into
    ``stratified_sample`` to materialize the mixture).

    Scale: one map-side-combined groupBy on the source key (|sources|
    rows out) + a 1-row broadcast of the minimum — nothing here grows
    with corpus size.
    """
    totals = df.groupBy(strata_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_col).cast("long").alias("total_tokens"),
    )
    target = totals.agg(F.min("total_tokens").alias("target_tokens"))
    return (
        totals.join(F.broadcast(target))
        .select(
            strata_col,
            "n_docs",
            "total_tokens",
            F.round(F.col("target_tokens") / F.col("total_tokens"), 6).alias(
                "sample_rate"
            ),
        )
    )
