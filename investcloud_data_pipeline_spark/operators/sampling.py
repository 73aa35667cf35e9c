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
