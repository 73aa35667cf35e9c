"""Sequence packing: assign documents to fixed token-budget bins.

Training pipelines pack variable-length documents into fixed-size
context windows (e.g. 4k/8k tokens) before batching; the distributed
form of the streaming greedy packer is CONTIGUOUS packing: within each
shard, documents are laid out in a deterministic order and a bin
boundary is drawn every ``budget`` tokens of the running prefix sum.
Equivalent to the sequential packer whenever documents are shorter than
the budget (oversized documents map to their own bin run and are
flagged for chunking upstream — ``text_chunking_udtf`` is the
companion operator).

Scale: one window function per shard partition — no shuffle beyond the
hash on the shard column, no driver involvement, and each shard's
packing is independent so 100 TB packs as |shards| parallel prefix
sums. The deterministic (shard, order) layout is what makes the packing
reproducible run-to-run — the same property the md5-based train/test
split relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_contiguous(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    shard_col: str | None = None,
) -> DataFrame:
    """Add ``bin_id`` (which fixed-budget bin the document starts in)
    and ``bin_offset`` (token offset within that bin) by contiguous
    prefix-sum packing per shard in ``order_col`` order."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    part = [shard_col] if shard_col else [F.lit(1)]
    w = (
        Window.partitionBy(*part)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("long"))
    return df.withColumn(
        "bin_id", F.floor(prefix / F.lit(budget)).cast("long")
    ).withColumn(
        "bin_offset", (prefix % F.lit(budget)).cast("long")
    )
