"""Multimodal plumbing tests: binary payloads, Arrow round-trip kernels,
frame sampling, and the stubbed real-decode gate."""

from __future__ import annotations

import pytest

from investcloud_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    byte_histogram_features,
    decode_media,
    fake_decode_dims,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(1, "abcd"), (2, "x" * 100), (3, "")],
        "doc_id long, text string",
    )
    return attach_binary_payload(docs)


def test_payload_and_metadata(media):
    rows = {r.doc_id: r for r in media.collect()}
    assert bytes(rows[1].content) == b"abcd"
    assert rows[2].media_meta.n_bytes == 100
    assert rows[2].media_meta.n_frames == 100 % 64 + 1
    assert rows[3].media_meta.n_bytes == 0


def test_fake_decode_dims_roundtrip(media):
    out = {r.id: r for r in fake_decode_dims(media).collect()}
    assert out[1].n_bytes == 4
    assert out[1].width == 64 + 4 and out[1].height == 64 + 28
    assert out[3].n_bytes == 0  # empty payload survives the Arrow round-trip


def test_byte_histogram_features(media):
    out = {r.id: r.features for r in byte_histogram_features(media).collect()}
    assert len(out[1]) == 16
    assert abs(sum(out[1]) - 1.0) < 1e-6
    # 'x' == 0x78 → bin 7 of 16 (range 0-256, width 16)
    assert out[2][7] == 1.0
    assert out[3] == [0.0] * 16


def test_sample_frames_stride(media):
    rows = [
        (r.doc_id, r.frame_idx) for r in sample_frames(media, every_k=7).collect()
    ]
    doc2 = sorted(idx for d, idx in rows if d == 2)
    n_frames = 100 % 64 + 1  # 37
    assert doc2 == list(range(0, n_frames, 7))


def test_real_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        decode_media(media)


def test_arrow_histogram_matches_pandas_path(media):
    from investcloud_data_pipeline_spark.operators.multimodal import (
        byte_histogram_arrow,
    )

    pandas_out = {
        r.id: r.features for r in byte_histogram_features(media).collect()
    }
    arrow_out = {r.id: r.features for r in byte_histogram_arrow(media).collect()}
    assert arrow_out == pandas_out
    assert arrow_out[3] == [0.0] * 16  # empty payload


class TestImageHeaderParse:
    """Real PNG/JPEG header parsing (no codec library): handcrafted
    minimal containers with known dimensions."""

    @staticmethod
    def _png(w, h):
        import struct, zlib

        ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + chunk
            + struct.pack(">I", zlib.crc32(chunk))
        )

    @staticmethod
    def _jpeg(w, h):
        import struct

        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">H", 11)
            + b"\x08"
            + struct.pack(">HH", h, w)
            + b"\x01\x01\x11\x00"
        )
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

    def test_known_containers_and_corrupt_routing(self, spark):
        from investcloud_data_pipeline_spark.operators.multimodal import (
            image_header_meta,
            parse_image_header,
        )

        assert parse_image_header(self._png(640, 480)) == ("png", 640, 480)
        assert parse_image_header(self._jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
        assert parse_image_header(b"not an image at all") is None

        rows = [
            (1, bytearray(self._png(64, 32))),
            (2, bytearray(self._jpeg(320, 200))),
            (3, bytearray(b"\x00\x01garbage")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        got = {
            r.id: (r.format, r.width, r.height, r.is_image)
            for r in image_header_meta(df).collect()
        }
        assert got == {
            1: ("png", 64, 32, True),
            2: ("jpeg", 320, 200, True),
            3: (None, None, None, False),
        }
