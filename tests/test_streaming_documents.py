"""Streaming document ingest: exact dedup across micro-batches + quality
gate, with checkpointed exactly-once semantics."""

from __future__ import annotations

import os

import pandas as pd


def _write(src: str, name: str, rows: list[tuple]) -> None:
    os.makedirs(src, exist_ok=True)
    pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"]).to_parquet(
        f"{src}/{name}", index=False
    )


def test_document_ingest_dedup_and_quality_gate(spark, tmp_path):
    from investcloud_data_pipeline_spark.streaming.documents import (
        start_document_ingest,
    )

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))

    def drain():
        q = start_document_ingest(spark, src, out, ck)
        q.awaitTermination(120)

    _write(
        src,
        "b1.parquet",
        [
            (1, "the quick brown fox jumps", "en", "s1"),
            (2, "THE QUICK  brown FOX jumps!!", "en", "s2"),  # dup of 1 (normalized)
            (3, "too short", "en", "s1"),  # fails min_tokens=3
            (4, "a genuinely different document body", "en", "s1"),
        ],
    )
    drain()
    _write(
        src,
        "b2.parquet",
        [
            (5, "the quick brown fox jumps", "en", "s3"),  # cross-batch dup of 1
            (6, "new content arriving in the second batch", "en", "s3"),
        ],
    )
    drain()

    rows = spark.read.parquet(out).collect()
    kept_ids = sorted(r.doc_id for r in rows)
    # doc 2 is an in-batch exact dup; doc 5 a cross-batch dup; doc 3 gated
    assert 3 not in kept_ids
    assert len([i for i in kept_ids if i in (1, 2)]) == 1
    assert 5 not in kept_ids
    assert {4, 6} <= set(kept_ids)
    digests = [r.digest for r in rows]
    assert len(digests) == len(set(digests))
    assert all(r.n_tokens >= 3 for r in rows)
