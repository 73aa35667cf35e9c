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


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the old wooden fence near the garden gate"
)
# the same 1-word-edit pair the batch LSH recall test pins (band
# agreement at J≈0.7 is probabilistic; this pair is a known collider)
NEAR = BASE.replace("lazy dog", "sleepy dog")
FAR = "completely different content about database engines and query planning"
FAR2 = "another unrelated body of text describing mountain weather patterns today"


def test_neardup_ingest_suppresses_across_and_within_batches(spark, tmp_path):
    from investcloud_data_pipeline_spark.streaming.documents import (
        start_neardup_ingest,
    )

    src, out, sig, ck = (str(tmp_path / d) for d in ("src", "out", "sig", "ck"))

    def drain():
        q = start_neardup_ingest(spark, src, out, sig, ck)
        q.awaitTermination(180)

    _write(
        src,
        "b1.parquet",
        [
            (1, BASE, "en", "s1"),
            (2, FAR, "en", "s1"),
            (7, NEAR, "en", "s1"),  # within-batch near-dup of 1 → suppressed
        ],
    )
    drain()
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert first == [1, 2]

    _write(
        src,
        "b2.parquet",
        [
            (3, NEAR, "en", "s2"),   # cross-batch near-dup of committed 1
            (4, BASE, "en", "s2"),   # cross-batch exact dup (subsumed)
            (5, FAR2, "en", "s2"),   # genuinely new → kept
        ],
    )
    drain()
    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 5]

    # signature state holds bands only for survivors
    sig_ids = {r.id for r in spark.read.parquet(sig).collect()}
    assert sig_ids == {1, 2, 5}

    # replay with the same checkpoint: no new input → no change (and a
    # re-run of a committed epoch would be skipped by the markers)
    drain()
    again = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert again == kept


def test_neardup_ingest_partial_failure_between_sinks(spark, tmp_path):
    """Crash window between the two sinks: docs committed, bands not.
    The replayed epoch must skip the docs append (marker present) and
    complete only the bands append — no duplicate survivor rows."""
    from investcloud_data_pipeline_spark.streaming.bronze import (
        mark_sink_epoch,
        sink_epoch_committed,
    )
    from investcloud_data_pipeline_spark.streaming.documents import (
        start_neardup_ingest,
    )

    src, out, sig, ck = (str(tmp_path / d) for d in ("src", "out", "sig", "ck"))
    _write(src, "b1.parquet", [(1, BASE, "en", "s1"), (2, FAR, "en", "s1")])

    q = start_neardup_ingest(spark, src, out, sig, ck)
    q.awaitTermination(180)
    assert sink_epoch_committed(out, 0) and sink_epoch_committed(sig, 0)

    # Simulate the crash for the NEXT epoch: pre-mark the docs sink for
    # epoch 1 as if the run died after the docs append but before the
    # bands append; the replay must write bands ONLY.
    _write(src, "b2.parquet", [(5, FAR2, "en", "s2")])
    mark_sink_epoch(out, 1)
    n_docs_before = spark.read.parquet(out).count()

    q = start_neardup_ingest(spark, src, out, sig, ck)
    q.awaitTermination(180)

    docs = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert spark.read.parquet(out).count() == n_docs_before  # no re-append
    assert docs == [1, 2]  # doc 5's append was (simulated-)crashed away
    # but its bands DID commit on replay — the sig sink made progress
    assert sink_epoch_committed(sig, 1)
