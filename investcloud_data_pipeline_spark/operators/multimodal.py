"""Multimodal column handling: opaque binary payloads + typed metadata.

Model: media lives in a ``binary`` column (image/audio/video bytes)
accompanied by a metadata struct (format, byte size, media-specific
fields). The Spark-side plumbing — schemas, Arrow batch transfer through
``mapInPandas``, per-frame explosion, partition sizing — is real and
tested; the actual codec step is STUBBED (this environment has no
image/audio libraries) behind ``decode_media``, which raises
``NotImplementedError`` unless a known library is importable, with
``fake_decode_dims`` as the deterministic stand-in used by tests/oracles.

Scale notes: binary payloads dominate row size — the partition knobs that
matter are rows-per-Arrow-batch (spark.sql.execution.arrow.
maxRecordsPerBatch, keep batch bytes ≈ tens of MB) and file split size.
Metadata-only queries must never touch the bytes: keep metadata in plain
columns (columnar parquet reads prune the binary column away entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_BINS = 16


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Simulate a media table: utf-8 payload bytes + metadata struct.

    (With real media, the bytes come from the lake; this builds a
    deterministic stand-in corpus from the documents table.)
    """
    content = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("format"),
            F.length(content).alias("n_bytes"),
            (F.length(content) % 64 + 1).alias("n_frames"),
        ).alias("media_meta"),
    )


def decode_media(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Real media decode — STUB. Raises unless a codec library exists.

    The Spark plumbing (Arrow batches through mapInPandas with a typed
    output schema) is exactly ``fake_decode_dims``; only the per-batch
    kernel differs.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env has no codecs
        raise NotImplementedError(
            "media codecs unavailable in this environment; use "
            "fake_decode_dims for the deterministic stand-in"
        ) from exc
    raise NotImplementedError("real decode kernel not implemented yet")


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF_MARKERS = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """REAL container-header parse, no codec library: PNG IHDR and JPEG
    SOF give (format, width, height) from a few header bytes. Full
    pixel decode stays library-gated in ``decode_media``; header
    metadata is what a 100 TB ingest actually needs first (dimension
    filtering, aspect buckets, corrupt-file routing) and reads ~32
    bytes of each blob."""
    import struct

    if payload[:8] == _PNG_MAGIC and len(payload) >= 24:
        # IHDR is always the first chunk: length(4) 'IHDR'(4) w(4) h(4)
        if payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return ("png", w, h)
        return None
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 <= len(payload):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return ("jpeg", w, h)
                return None
            i += 2 + seg_len
    return None


def image_header_meta(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched header sniffing over a binary column: (id, format,
    width, height, is_image). Unknown/corrupt payloads survive as
    is_image=false rows (quarantine-style routing, never an exception
    mid-scan)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(bytes(b)) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "format": [p[0] if p else None for p in parsed],
                    "width": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int64"
                    ),
                    "height": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int64"
                    ),
                    "is_image": [p is not None for p in parsed],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema="id long, format string, width long, height long, is_image boolean",
    )


def fake_decode_dims(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Deterministic fake 'decode': dims derived from payload length.

    Runs as an Arrow-batched mapInPandas so the binary round-trip
    (JVM → Arrow → pandas bytes → compute → back) is exercised for real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf[content_col].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "width": 64 + (n_bytes % 448),
                    "height": 64 + ((n_bytes * 7) % 448),
                    "n_channels": np.full(len(pdf), 3, dtype="int32"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema="id long, n_bytes long, width long, height long, n_channels int"
    )


def byte_histogram_features(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Feature extraction: 16-bin normalized byte histogram per payload —
    the shape of any real embedding/feature kernel (binary in, fixed-size
    float vector out), vectorized with numpy over Arrow batches."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[content_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * FEATURE_BINS)
                    continue
                hist, _ = np.histogram(arr, bins=FEATURE_BINS, range=(0, 256))
                feats.append((hist / arr.size).round(6).tolist())
            yield pd.DataFrame({"id": pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema="id long, features array<double>"
    )


def byte_histogram_arrow(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """``mapInArrow`` form of :func:`byte_histogram_features` — the
    kernel consumes/produces ``pyarrow.RecordBatch`` directly, skipping
    the Arrow→pandas conversion entirely. For binary-heavy columns
    (image/audio payloads) that conversion is a full copy per batch, so
    this is the preferred shape for large multimodal scans; results are
    identical to the pandas path (tested)."""
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            ids = batch.column(0)
            feats = []
            for payload in batch.column(1):
                arr = np.frombuffer(payload.as_py(), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * FEATURE_BINS)
                    continue
                hist, _ = np.histogram(arr, bins=FEATURE_BINS, range=(0, 256))
                feats.append((hist / arr.size).round(6).tolist())
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(feats, type=pa.list_(pa.float64()))],
                names=["id", "features"],
            )

    return df.select(id_col, content_col).mapInArrow(
        kernel, schema="id long, features array<double>"
    )


def sample_frames(
    df: DataFrame, every_k: int = 7, id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling plumbing: one row per sampled frame index (0-based,
    every k-th frame up to media_meta.n_frames). Pure built-ins — the
    explode happens JVM-side; at scale the binary column is pruned unless
    a downstream decode actually needs it."""
    # cast the sequence elements, not the explode output — a generator
    # can't be nested inside a cast expression
    return df.select(
        F.col(id_col),
        F.col("media_meta.n_frames").cast("long").alias("n_frames"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (F.col("media_meta.n_frames") - 1).cast("long"),
                F.lit(every_k).cast("long"),
            )
        ).alias("frame_idx"),
    )
