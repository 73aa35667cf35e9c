"""Multimodal column handling: opaque binary payloads + typed metadata.

Model: media lives in a ``binary`` column (image/audio/video bytes)
accompanied by a metadata struct (format, byte size, media-specific
fields). The Spark-side plumbing — schemas, Arrow batch transfer through
``mapInPandas``, per-frame explosion, partition sizing — is real and
tested, and so is the pixel decode: ``decode_media`` uses PIL when
importable, else a pure-stdlib PNG decoder (``decode_png_pixels``, with
``encode_png`` as its tested inverse). NULL/corrupt payloads always
surface as decoded=false rows, never as executor exceptions.
``fake_decode_dims`` remains as a deterministic stand-in for oracles
that need decode-shaped output independent of payload format.

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


def codec_backend() -> str:
    """Which pixel-decode backend this environment provides.

    ``"pil"`` when Pillow is importable (all formats it supports);
    otherwise ``"stdlib-png"`` — the pure-stdlib PNG path below, which
    needs only ``zlib`` and decodes non-interlaced 8-bit gray/RGB/RGBA
    PNGs for real. There is no environment with *no* backend.
    """
    try:
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:
        return "stdlib-png"


def decode_png_pixels(payload: bytes) -> "np.ndarray | None":
    """REAL PNG pixel decode with the stdlib only (public PNG spec,
    RFC 2083): signature → IHDR → concatenated IDAT → zlib inflate →
    per-scanline unfilter (None/Sub/Up/Average/Paeth). Supports the
    formats our fixtures and most ML-pipeline thumbnails use:
    non-interlaced, bit depth 8, color type 0 (gray), 2 (RGB), 6
    (RGBA). Returns an (h, w, channels) uint8 array, or None for
    anything else (caller routes to quarantine, never raises)."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        return None
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            # truncated chunk body — corrupt file, quarantine not crash
            return None
        if ctype == b"IHDR":
            if length < 13:
                return None
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if channels is None or depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) != h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub — sequential in x, vectorized over channels
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, channels)


def encode_png(arr: "np.ndarray") -> bytes:
    """Pure-stdlib PNG encoder (filter 0 scanlines, one zlib stream):
    the inverse of :func:`decode_png_pixels` for 8-bit gray/RGB/RGBA.
    Used by the thumbnail-writeback sink shape and as the test fixture
    generator — real, decodable-by-anything PNG bytes."""
    import struct
    import zlib

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _decode_pixels(payload: "bytes | None") -> "np.ndarray | None":
    """One payload → (h, w, c) uint8 pixels, via the best available
    backend. PIL handles every format it knows; the stdlib path covers
    PNG. NULL or undecodable payloads return None (quarantine routing)
    — BOTH backends are exception-wrapped, so a corrupt file can never
    crash an executor task mid-scan."""
    if payload is None:
        return None
    if codec_backend() == "pil":
        import io

        import PIL.Image

        try:
            img = PIL.Image.open(io.BytesIO(payload))
            arr = np.asarray(img.convert(img.mode if img.mode in ("L", "RGB", "RGBA") else "RGB"))
            return arr[:, :, None] if arr.ndim == 2 else arr
        except Exception:
            return None
    try:
        return decode_png_pixels(payload)
    except Exception:
        # decode_png_pixels validates lengths itself; this is the
        # belt-and-braces guarantee behind the quarantine contract
        return None


def decode_media(df: DataFrame, id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """Real media decode over a binary column: Arrow-batched
    ``mapInPandas`` kernel producing (id, decoded, width, height,
    n_channels, mean_intensity). Pixels come from PIL when available,
    else the pure-stdlib PNG decoder — in both cases actual pixel data,
    not header metadata. Undecodable payloads survive as decoded=false
    rows (quarantine-style, never an exception mid-scan).

    Scale: per-batch Python cost is the codec itself; batch sizing via
    spark.sql.execution.arrow.maxRecordsPerBatch keeps Arrow transfers
    tens-of-MB sized. Upstream metadata filters (``image_header_meta``)
    prune non-images before any pixel work."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                arr = _decode_pixels(
                    bytes(payload) if payload is not None else None
                )
                if arr is None:
                    rows.append((i, False, None, None, None, None))
                else:
                    h, w, c = arr.shape
                    rows.append((i, True, w, h, c, float(arr.mean())))
            yield pd.DataFrame(
                rows,
                columns=["id", "decoded", "width", "height", "n_channels", "mean_intensity"],
            ).astype({"width": "Int64", "height": "Int64", "n_channels": "Int64"})

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema="id long, decoded boolean, width long, height long, "
        "n_channels long, mean_intensity double",
    )


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
            parsed = [
                parse_image_header(bytes(b)) if b is not None else None
                for b in pdf[content_col]
            ]
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


# ---------- perceptual-hash image dedup ----------

def dhash64(arr: "np.ndarray") -> int:
    """64-bit difference hash of an image: grayscale → 8×9 block-mean
    grid → sign of each horizontal gradient, packed row-major into 64
    bits. Uniform brightness/contrast shifts preserve gradient signs,
    and the block means absorb small pixel noise and resampling — the
    standard cheap perceptual key for image near-dup detection.

    Pure numpy (no imaging library): the grid comes from
    ``np.add.reduceat`` block sums over index boundaries, with small
    images integer-upscaled first so every cell is non-empty.
    """
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)  # channel-mean grayscale
    h, w = a.shape
    if h < 8:
        a = np.repeat(a, -(-8 // h), axis=0)
        h = a.shape[0]
    if w < 9:
        a = np.repeat(a, -(-9 // w), axis=1)
        w = a.shape[1]
    rb = (np.arange(8) * h) // 8
    cb = (np.arange(9) * w) // 9
    cells = np.add.reduceat(np.add.reduceat(a, rb, axis=0), cb, axis=1)
    rc = np.diff(np.append(rb, h)).astype(np.float64)
    cc = np.diff(np.append(cb, w)).astype(np.float64)
    grid = cells / (rc[:, None] * cc[None, :])  # 8×9 block means
    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def perceptual_hashes(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """(id, decoded, phash) via the real pixel decode: Arrow-batched
    ``mapInPandas``, one :func:`dhash64` per decodable payload.
    Undecodable/NULL payloads keep the quarantine contract
    (decoded=false, phash NULL) — never an executor exception."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dec, hashes = [], [], []
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                arr = _decode_pixels(
                    bytes(payload) if payload is not None else None
                )
                ids.append(i)
                if arr is None:
                    dec.append(False)
                    hashes.append(None)
                else:
                    dec.append(True)
                    # shift into signed-64 range for Spark LongType
                    hashes.append(dhash64(arr) - (1 << 63))
            yield pd.DataFrame(
                {"id": ids, "decoded": dec, "phash": hashes}
            ).astype({"phash": "Int64"})

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema="id long, decoded boolean, phash long"
    )


def phash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-dup pairs: perceptual hashes blocked on 16-bit bands
    (the SimHash banding scheme — pigeonhole guarantees every pair
    within hamming ≤ 3 shares a band; above 3 recall is probabilistic),
    then verified JVM-side with ``bit_count(xor) ≤ max_hamming``.

    Scale: the only shuffle keys on (band_idx, band value) — no
    all-pairs comparison ever happens; the signed-range shift in
    :func:`perceptual_hashes` flips the same top bit on both operands,
    so XOR-popcount hamming is unaffected. Images with the SAME 64-bit
    dHash are collapsed to one representative before the band join (m
    identical images would inflate every touched bucket m²-fold — the
    same hot-bucket armor as the text-side simhash blocking) and the
    pair set is expanded back afterwards (same-hash pairs are hamming-0
    candidates by definition).
    """
    from .dedup_fuzzy import _expand_member_pairs

    # persist the (id, phash) relation: reps/members/chunks all read
    # it, and without the cache each reference re-runs the PNG codec +
    # dHash kernel chain over the corpus. persist (NOT localCheckpoint
    # — round-13 A/B: the RDD-leaf form loses the relation's size
    # statistics, flipping the member-expansion joins from the
    # stats-adaptive broadcast the local sizes earn to SortMergeJoin,
    # for zero wall change) keeps InMemoryRelation stats so the
    # planner's join choice stays size-driven at every scale. The
    # early projection drops the decode-metadata columns the pair
    # build never reads (guide §2.3).
    hashed_all = (
        perceptual_hashes(df, id_col, content_col)
        .filter("decoded")
        .select("id", "phash")
        .persist()
    )
    # the rep relation is itself consumed three ways (members join,
    # band explode, intra-pair expansion) — cache the tiny aggregate
    # instead of re-running its Exchange + HashAggregate per reference
    reps = (
        hashed_all.groupBy("phash")
        .agg(F.min("id").alias("__rep"))
        .persist()
    )
    members = hashed_all.join(reps, "phash").select(
        "__rep", F.col("id").alias("__member")
    )
    hashed = reps.select(F.col("__rep").alias("id"), "phash")
    chunks = (
        hashed.select(
            "id",
            "phash",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(c).alias("band_idx"),
                        F.shiftrightunsigned(F.col("phash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band"),
                    )
                    for c in range(4)
                ])
            ).alias("bk"),
        )
        .select("id", "phash", "bk.band_idx", "bk.band")
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    rep_pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(hamming <= max_hamming)
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            hamming.cast("long").alias("hamming"),
        )
        .distinct()
    )
    return _expand_member_pairs(
        rep_pairs,
        members,
        reps.select("__rep"),
        intra_cols=[F.lit(0).cast("long").alias("hamming")],
    )


def attach_png_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL-PNG media table from the documents corpus:
    each doc's utf-8 bytes are tiled into a 16×16 grayscale image and
    encoded with :func:`encode_png` — actual compressed PNG payloads
    (decodable by any reader), so downstream decode/phash queries
    exercise both codecs end-to-end rather than a fake byte blob."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                raw = str(text or "").encode("utf-8")[:256]
                px = np.frombuffer(raw.ljust(256, b"\x00"), dtype=np.uint8)
                ids.append(i)
                blobs.append(encode_png(px.reshape(16, 16)))
            yield pd.DataFrame({id_col: ids, "content": blobs})

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, content binary"
    )


# ---------- audio (WAV/PCM) ----------
#
# Same posture as the image path: audio lives in a binary column, the
# codec is real (RIFF/WAVE PCM16 — pure stdlib struct math, no external
# libs), undecodable payloads quarantine as decoded=false rows (never
# an exception mid-scan), and the per-payload work is numpy over Arrow
# batches.


def encode_wav_pcm16(samples: "np.ndarray", sample_rate: int = 8000) -> bytes:
    """Minimal canonical RIFF/WAVE writer: mono PCM16 little-endian.
    samples: float array in [-1, 1] (clipped)."""
    import struct

    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(payload: "bytes | None") -> "tuple | None":
    """(n_channels, sample_rate, bits, samples float64 ndarray) or None
    for anything that is not intact mono/stereo PCM16 WAV. Every chunk
    length is validated before unpacking — truncated/corrupt payloads
    return None, they never raise (quarantine contract)."""
    import struct

    try:
        if payload is None:
            return None
        b = bytes(payload)
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(b):
            ctype = b[pos:pos + 4]
            (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
            chunk = b[pos + 8:pos + 8 + clen]
            if len(chunk) < clen:
                return None  # declared length overruns the payload
            if ctype == b"fmt " and clen >= 16:
                fmt = struct.unpack("<HHIIHH", chunk[:16])
            elif ctype == b"data":
                data = chunk
            pos += 8 + clen + (clen % 2)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_fmt, n_ch, rate, _, _, bits = fmt
        if audio_fmt != 1 or bits != 16 or n_ch not in (1, 2) or rate <= 0:
            return None
        usable = len(data) - (len(data) % (2 * n_ch))
        arr = np.frombuffer(data[:usable], dtype="<i2").astype(np.float64)
        arr = arr / 32767.0
        if n_ch == 2:
            arr = arr.reshape(-1, 2).mean(axis=1)  # downmix
        return n_ch, rate, bits, arr
    except Exception:
        return None


def attach_wav_payload(
    df: DataFrame, id_col: str = "doc_id", sample_rate: int = 8000,
    duration_s: float = 0.25,
) -> DataFrame:
    """Deterministic audio fixture: per row, a real PCM16 WAV of a pure
    tone whose frequency derives from the id (220 + id % 440 Hz) — so
    the full encode AND decode codecs run end-to-end on testdata, the
    same trick the image path uses with rendered PNGs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = int(sample_rate * duration_s)
        t = np.arange(n) / sample_rate
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                freq = 220.0 + float(i % 440)
                payloads.append(
                    encode_wav_pcm16(
                        0.5 * np.sin(2 * np.pi * freq * t), sample_rate
                    )
                )
            yield pd.DataFrame({"id": pdf[id_col], "content": payloads})

    return df.select(id_col).mapInPandas(kernel, schema="id long, content binary")


def wav_features(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """Decode + per-clip audio features: duration, RMS energy, peak,
    zero-crossing rate — the cheap screens an audio curation pipeline
    gates on before expensive ASR/embedding. Undecodable payloads
    yield decoded=false rows with NULL features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                parsed = parse_wav(payload)
                if parsed is None or parsed[3].size == 0:
                    rows.append((i, False, None, None, None, None, None))
                    continue
                _, rate, _, x = parsed
                zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                rows.append((
                    i, True, int(x.size),
                    round(x.size / rate, 6),
                    round(float(np.sqrt(np.mean(x * x))), 6),
                    round(float(np.max(np.abs(x))), 6),
                    round(zc / x.size * rate, 2),
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "decoded", "n_samples", "duration_s",
                    "rms", "peak", "zcr_hz",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema=(
            "id long, decoded boolean, n_samples long, duration_s double, "
            "rms double, peak double, zcr_hz double"
        ),
    )


def resize_nearest(arr: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Deterministic nearest-neighbor resample to (out_h, out_w) via
    integer index mapping (floor(i·h/out_h)) — pure numpy indexing, no
    interpolation library, so the result is bit-identical on every
    backend and partitioning. Channels pass through untouched."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols]


def thumbnail_images(
    df: DataFrame,
    out_h: int = 8,
    out_w: int = 8,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """The resize stage of a training-data image pipeline: decode the
    binary payload, nearest-neighbor downsample to (out_h, out_w), and
    re-encode as a real PNG — (id, decoded, orig dims, thumb payload +
    its md5/size). Same quarantine contract as :func:`decode_media`:
    NULL/corrupt payloads come back as decoded=false rows, never an
    executor exception.

    Scale: Arrow-batched ``mapInPandas``, one Python pass per payload;
    the output carries the thumbnail BYTES (the writeback shape — a
    sink would persist them), so batch sizes stay bounded by
    maxRecordsPerBatch exactly like the decode path."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                arr = _decode_pixels(
                    bytes(payload) if payload is not None else None
                )
                if arr is None:
                    rows.append((i, False, None, None, None, None, None))
                else:
                    h, w, _c = arr.shape
                    thumb = encode_png(resize_nearest(arr, out_h, out_w))
                    rows.append(
                        (
                            i,
                            True,
                            w,
                            h,
                            len(thumb),
                            hashlib.md5(thumb).hexdigest(),
                            thumb,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id",
                    "decoded",
                    "width",
                    "height",
                    "thumb_bytes",
                    "thumb_md5",
                    "thumb",
                ],
            ).astype({"width": "Int64", "height": "Int64", "thumb_bytes": "Int64"})

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema="id long, decoded boolean, width long, height long, "
        "thumb_bytes long, thumb_md5 string, thumb binary",
    )


def resample_wav(
    df: DataFrame,
    factor: int = 4,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Audio downsample-by-decimation: decode PCM16 WAV, keep every
    ``factor``-th sample, re-encode at rate/factor — the audio
    counterpart of :func:`thumbnail_images` (the rate-normalization
    stage an audio curation pipeline runs before featurization; plain
    decimation aliases above the new Nyquist, which is acceptable for
    the band-limited synthetic fixtures and keeps the kernel
    backend-free and bit-deterministic). Same quarantine contract:
    undecodable payloads become decoded=false rows.

    Scale: Arrow-batched mapInPandas, one codec pass per payload; the
    re-encoded bytes ride in the output (writeback shape), so
    ``maxRecordsPerBatch`` bounds memory exactly like the image path."""
    import hashlib

    if factor < 1:
        raise ValueError("factor must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                parsed = parse_wav(payload)
                if parsed is None or parsed[3].size == 0:
                    rows.append((i, False, None, None, None, None, None))
                    continue
                _, rate, _, x = parsed
                out_rate = max(1, rate // factor)
                y = x[::factor]
                blob = encode_wav_pcm16(y, sample_rate=out_rate)
                rows.append(
                    (
                        i,
                        True,
                        int(x.size),
                        int(y.size),
                        int(out_rate),
                        hashlib.md5(blob).hexdigest(),
                        blob,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id",
                    "decoded",
                    "n_samples_in",
                    "n_samples_out",
                    "out_rate",
                    "wav_md5",
                    "wav",
                ],
            ).astype(
                {
                    "n_samples_in": "Int64",
                    "n_samples_out": "Int64",
                    "out_rate": "Int64",
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema="id long, decoded boolean, n_samples_in long, "
        "n_samples_out long, out_rate long, wav_md5 string, wav binary",
    )


def image_patches(
    df: DataFrame,
    patch: int = 8,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """ViT-style patch extraction: decode the binary payload and explode
    each image into its non-overlapping ``patch``×``patch`` grid — one
    output row per patch with grid coordinates, the raw patch bytes
    (row-major uint8, the tensor-feed shape) and their md5. Images whose
    dimensions aren't multiples of ``patch`` are zero-padded bottom/right
    (the standard ViT convention) so the grid always covers every pixel.
    Undecodable payloads keep the quarantine contract: ONE
    decoded=false row with NULL patch fields, never an exception.

    Scale: Arrow-batched ``mapInPandas``; the fan-out is (h/p)·(w/p)
    rows per image — bounded by the decode batch size exactly like the
    thumbnail path, and each patch row is p² bytes, so downstream
    repartitioning (e.g. shuffling patches into training shards) moves
    fixed-size units. Deterministic: pure numpy slicing, no codec in
    the output path.
    """
    import hashlib

    if patch < 1:
        raise ValueError("patch must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                arr = _decode_pixels(
                    bytes(payload) if payload is not None else None
                )
                if arr is None:
                    rows.append(
                        (i, False, None, None, None, None, None, None)
                    )
                    continue
                gray = arr[:, :, 0] if arr.ndim == 3 else arr
                h, w = gray.shape
                ph = -(-h // patch) * patch
                pw = -(-w // patch) * patch
                padded = np.zeros((ph, pw), dtype=np.uint8)
                padded[:h, :w] = gray
                for pr in range(ph // patch):
                    for pc in range(pw // patch):
                        blob = padded[
                            pr * patch : (pr + 1) * patch,
                            pc * patch : (pc + 1) * patch,
                        ].tobytes()
                        rows.append(
                            (
                                i,
                                True,
                                pr * (pw // patch) + pc,
                                pr,
                                pc,
                                len(blob),
                                hashlib.md5(blob).hexdigest(),
                                blob,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "decoded", "patch_idx", "patch_row",
                    "patch_col", "patch_bytes", "patch_md5", "patch",
                ],
            ).astype(
                {
                    "patch_idx": "Int64",
                    "patch_row": "Int64",
                    "patch_col": "Int64",
                    "patch_bytes": "Int64",
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema="id long, decoded boolean, patch_idx long, patch_row long,"
        " patch_col long, patch_bytes long, patch_md5 string, patch binary",
    )


def wav_energy_segments(
    df: DataFrame,
    window: int = 160,
    threshold: float = 0.05,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Energy-based activity segmentation (the VAD-shaped screen an
    audio curation pipeline runs before ASR): windowed RMS over
    ``window``-sample frames (20 ms at 8 kHz), a frame is ACTIVE when
    its RMS exceeds ``threshold``; per clip, emit frame totals, the
    active share, the number of contiguous active segments and the
    longest active run — the silence-trim statistics. The trailing
    partial frame is dropped (standard framing). Quarantine contract
    unchanged: undecodable payloads → decoded=false rows. A VALID clip
    shorter than one window is decoded=true with n_frames=0 (and a
    null active_share — no frames to average): "too short" is a
    framing outcome, not a corrupt payload, so it must not inflate the
    quarantine accounting.

    Scale: Arrow-batched mapInPandas; the per-clip output is one fixed
    row regardless of duration, and the framing is one numpy reshape —
    no Python loop over frames.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                parsed = parse_wav(payload)
                if parsed is None:
                    rows.append((i, False, None, None, None, None, None))
                    continue
                if parsed[3].size < window:
                    # valid but shorter than one frame: zero frames,
                    # not quarantine
                    rows.append((i, True, 0, 0, None, 0, 0))
                    continue
                _, rate, _, x = parsed
                n_frames = x.size // window
                frames = x[: n_frames * window].reshape(n_frames, window)
                rms = np.sqrt((frames * frames).mean(axis=1))
                active = rms > threshold
                # contiguous active runs: transitions from 0 -> 1
                starts = int(
                    np.count_nonzero(np.diff(active.astype(np.int8)) == 1)
                ) + int(bool(active[0]))
                longest = 0
                run = 0
                for a in active:  # n_frames is small (duration/20ms)
                    run = run + 1 if a else 0
                    longest = max(longest, run)
                rows.append(
                    (
                        i,
                        True,
                        int(n_frames),
                        int(active.sum()),
                        round(float(active.mean()), 6),
                        int(starts),
                        int(longest),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "decoded", "n_frames", "n_active",
                    "active_share", "n_segments", "longest_run",
                ],
            ).astype(
                {
                    "n_frames": "Int64",
                    "n_active": "Int64",
                    "n_segments": "Int64",
                    "longest_run": "Int64",
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema="id long, decoded boolean, n_frames long, n_active long,"
        " active_share double, n_segments long, longest_run long",
    )
