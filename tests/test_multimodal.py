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


class TestRealDecode:
    """Real pixel decode: PIL when importable, else the pure-stdlib PNG
    path. Fixtures are real PNGs produced by ``encode_png`` (and
    hand-filtered streams for the unfilter paths) — actual pixel data
    round-trips, not header metadata."""

    def test_backend_reported(self):
        from investcloud_data_pipeline_spark.operators.multimodal import (
            codec_backend,
        )

        assert codec_backend() in ("pil", "stdlib-png")

    def test_png_pixels_roundtrip_exact(self):
        import numpy as np

        from investcloud_data_pipeline_spark.operators.multimodal import (
            decode_png_pixels,
            encode_png,
        )

        rng = np.random.default_rng(7)
        for shape in [(5, 4, 3), (3, 7, 4), (6, 2, 1)]:
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            out = decode_png_pixels(encode_png(px))
            assert out is not None and np.array_equal(out, px)

    def test_all_five_unfilter_paths(self):
        """Hand-filter known pixels with each PNG filter type and assert
        the decoder inverts them (encode_png only emits filter 0, so
        this exercises Sub/Up/Average/Paeth explicitly)."""
        import struct
        import zlib

        import numpy as np

        from investcloud_data_pipeline_spark.operators.multimodal import (
            decode_png_pixels,
        )

        rng = np.random.default_rng(13)
        h, w, c = 6, 5, 3
        px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8).astype(int)
        stride, bpp = w * c, c
        flat = px.reshape(h, stride)

        def filt(y, ftype):
            cur = flat[y]
            prev = flat[y - 1] if y > 0 else np.zeros(stride, int)
            out = np.zeros(stride, int)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                if ftype == 0:
                    out[x] = cur[x]
                elif ftype == 1:
                    out[x] = (cur[x] - a) & 0xFF
                elif ftype == 2:
                    out[x] = (cur[x] - b) & 0xFF
                elif ftype == 3:
                    out[x] = (cur[x] - ((a + b) >> 1)) & 0xFF
                else:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    out[x] = (cur[x] - pred) & 0xFF
            return bytes([ftype]) + bytes(out.astype(np.uint8))

        raw = b"".join(filt(y, y % 5) for y in range(h))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        out = decode_png_pixels(payload)
        assert out is not None and np.array_equal(out, px.astype(np.uint8))

    def test_truncated_and_null_payloads_route_to_quarantine(self, spark):
        """ADVICE r4: a truncated IHDR (declared 13 bytes, short data)
        raised struct.error on the stdlib path, and a NULL content
        value raised TypeError in the kernel — both crashed the
        executor task, violating the quarantine contract. All such
        payloads must come back as decoded=false rows."""
        import struct
        import zlib

        from investcloud_data_pipeline_spark.operators.multimodal import (
            decode_png_pixels,
            encode_png,
        )

        magic = b"\x89PNG\r\n\x1a\n"
        # declared 13-byte IHDR, only 4 bytes of data present
        trunc_ihdr = magic + struct.pack(">I", 13) + b"IHDR" + b"\x00" * 4
        # chunk body shorter than its declared length (mid-IDAT cut)
        import numpy as np

        whole = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
        cut = whole[: len(whole) - 24]  # reaches into the IDAT body
        # declared IDAT length lies about the remaining bytes
        bad_len = (
            magic
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
            + struct.pack(">I", 0)
            + struct.pack(">I", 10_000)
            + b"IDAT"
            + zlib.compress(b"\x00" * 10)
        )
        for payload in (trunc_ihdr, cut, bad_len, b"", magic):
            assert decode_png_pixels(payload) is None  # never raises

        rows = [
            (1, bytearray(trunc_ihdr)),
            (2, None),  # NULL binary column
            (3, bytearray(bad_len)),
            (4, bytearray(encode_png(np.full((2, 2, 1), 7, np.uint8)))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        got = {r.id: r for r in decode_media(df).collect()}
        assert got[1].decoded is False and got[2].decoded is False
        assert got[3].decoded is False
        assert got[4].decoded is True and got[4].mean_intensity == 7.0

        from investcloud_data_pipeline_spark.operators.multimodal import (
            image_header_meta,
        )

        hmeta = {r.id: r for r in image_header_meta(df).collect()}
        assert hmeta[2].is_image is False  # NULL payload survives here too

    def test_decode_media_over_spark(self, spark):
        import numpy as np

        from investcloud_data_pipeline_spark.operators.multimodal import (
            codec_backend,
            encode_png,
        )

        grad = np.tile(np.arange(16, dtype=np.uint8)[None, :, None], (8, 1, 3))
        gray = np.full((4, 4, 1), 200, dtype=np.uint8)
        rows = [
            (1, bytearray(encode_png(grad))),
            (2, bytearray(encode_png(gray))),
            (3, bytearray(b"\x00garbage-not-an-image")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        got = {r.id: r for r in decode_media(df).collect()}
        assert (got[1].width, got[1].height, got[1].n_channels) == (16, 8, 3)
        assert abs(got[1].mean_intensity - float(grad.mean())) < 1e-9
        assert (got[2].width, got[2].height, got[2].n_channels) == (4, 4, 1)
        assert got[2].mean_intensity == 200.0
        assert got[3].decoded is False and got[3].width is None
        assert got[1].decoded and got[2].decoded
        # JPEG pixels need PIL; under the stdlib backend they must route
        # to quarantine (decoded=false), never crash the scan.
        jpeg = TestImageHeaderParse._jpeg(8, 8)
        jdf = spark.createDataFrame([(9, bytearray(jpeg))], "doc_id long, content binary")
        jrow = decode_media(jdf).collect()[0]
        if codec_backend() == "stdlib-png":
            assert jrow.decoded is False


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


class TestPerceptualHash:
    """dHash64 + banded candidate join: perceptual invariances on
    crafted images, quarantine routing, and the Spark candidate op."""

    def _imgs(self):
        import numpy as np

        rng = np.random.default_rng(7)
        base = (
            np.linspace(0, 255, 64 * 64).reshape(64, 64)
            + rng.normal(0, 8, (64, 64))
        ).clip(0, 255).astype(np.uint8)
        bright = np.clip(base.astype(int) + 3, 0, 255).astype(np.uint8)
        far = rng.integers(0, 255, (64, 64)).astype(np.uint8)
        return base, bright, far

    def test_dhash_invariances(self):
        import numpy as np

        from investcloud_data_pipeline_spark.operators.multimodal import (
            decode_png_pixels,
            dhash64,
            encode_png,
        )

        base, bright, far = self._imgs()
        ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
        assert ham(dhash64(base), dhash64(bright)) == 0  # brightness shift
        noisy = base.copy()
        noisy[::13, ::17] = np.clip(noisy[::13, ::17].astype(int) + 4, 0, 255)
        assert ham(dhash64(base), dhash64(noisy)) <= 3  # sparse noise
        assert ham(dhash64(base), dhash64(far)) > 10  # unrelated image
        # PNG round-trip is lossless -> identical hash
        assert dhash64(decode_png_pixels(encode_png(base))) == dhash64(base)
        # degenerate tiny image upscales instead of crashing
        assert isinstance(dhash64(np.array([[1, 2], [3, 4]], np.uint8)), int)

    def test_candidate_pairs_and_quarantine(self, spark):
        from investcloud_data_pipeline_spark.operators.multimodal import (
            encode_png,
            perceptual_hashes,
            phash_candidate_pairs,
        )

        base, bright, far = self._imgs()
        rows = [
            (1, bytearray(encode_png(base))),
            (2, bytearray(encode_png(bright))),
            (3, bytearray(encode_png(far))),
            (4, bytearray(b"not a png")),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        pairs = phash_candidate_pairs(df).collect()
        assert [(r.id1, r.id2, r.hamming) for r in pairs] == [(1, 2, 0)]
        hashed = {r.id: r for r in perceptual_hashes(df).collect()}
        assert not hashed[4].decoded and hashed[4].phash is None
        assert not hashed[5].decoded
        assert all(hashed[i].decoded for i in (1, 2, 3))

    def test_attach_png_payload_is_real_decodable_png(self, spark):
        from investcloud_data_pipeline_spark.operators.multimodal import (
            attach_png_payload,
            decode_png_pixels,
        )

        df = spark.createDataFrame(
            [(1, "hello world"), (2, "")], "doc_id long, text string"
        )
        out = {r.doc_id: bytes(r.content) for r in attach_png_payload(df).collect()}
        for payload in out.values():
            arr = decode_png_pixels(payload)
            assert arr is not None and arr.shape == (16, 16, 1)


class TestWavAudio:
    def test_wav_roundtrip_exact(self, spark):
        import numpy as np

        from investcloud_data_pipeline_spark.operators.multimodal import (
            encode_wav_pcm16,
            parse_wav,
        )

        x = np.sin(2 * np.pi * 440 * np.arange(800) / 8000) * 0.5
        payload = encode_wav_pcm16(x, 8000)
        n_ch, rate, bits, back = parse_wav(payload)
        assert (n_ch, rate, bits) == (1, 8000, 16)
        assert back.size == 800
        # PCM16 quantization error bound
        assert np.max(np.abs(back - x)) <= 1.0 / 32767 + 1e-9

    def test_parse_wav_quarantines_corrupt_payloads(self):
        from investcloud_data_pipeline_spark.operators.multimodal import (
            encode_wav_pcm16,
            parse_wav,
        )
        import numpy as np

        good = encode_wav_pcm16(np.zeros(100), 8000)
        assert parse_wav(None) is None
        assert parse_wav(b"") is None
        assert parse_wav(b"RIFFxxxxWAV!") is None        # bad magic
        assert parse_wav(good[:20]) is None              # truncated header
        assert parse_wav(good[:-50]) is None             # truncated data chunk
        # declared chunk length overrunning payload
        bad = bytearray(good)
        bad[16:20] = (10 ** 6).to_bytes(4, "little")
        assert parse_wav(bytes(bad)) is None

    def test_wav_features_closed_form_sine(self, spark):
        """A pure 400 Hz tone at amplitude 0.5: RMS ~ 0.5/sqrt(2), peak
        ~ 0.5, ZCR ~ 2*freq; corrupt/NULL rows quarantine in-plan."""
        from investcloud_data_pipeline_spark.operators.multimodal import (
            encode_wav_pcm16,
            wav_features,
        )
        import numpy as np

        tone = encode_wav_pcm16(
            0.5 * np.sin(2 * np.pi * 400 * np.arange(8000) / 8000), 8000
        )
        df = spark.createDataFrame(
            [(1, bytearray(tone)), (2, bytearray(b"not audio")), (3, None)],
            "id long, content binary",
        )
        out = {r.id: r for r in wav_features(df).collect()}
        assert out[1].decoded
        assert abs(out[1].rms - 0.5 / np.sqrt(2)) < 0.01
        assert abs(out[1].peak - 0.5) < 0.01
        assert abs(out[1].zcr_hz - 800) < 20
        assert abs(out[1].duration_s - 1.0) < 1e-6
        assert not out[2].decoded and out[2].rms is None
        assert not out[3].decoded

    def test_attach_wav_payload_deterministic(self, spark):
        from investcloud_data_pipeline_spark.operators.multimodal import (
            attach_wav_payload,
        )

        base = spark.range(5).selectExpr("id AS doc_id")
        a = {r.id: bytes(r.content)
             for r in attach_wav_payload(base).collect()}
        b = {r.id: bytes(r.content)
             for r in attach_wav_payload(base.repartition(3)).collect()}
        assert a == b
        assert all(p[:4] == b"RIFF" for p in a.values())


class TestThumbnail:
    def test_nearest_resize_exact_mapping(self):
        import numpy as np

        from investcloud_data_pipeline_spark.operators.multimodal import (
            resize_nearest,
        )

        arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
        got = resize_nearest(arr[:, :, None], 2, 2)
        # floor(i*4/2) -> source rows/cols 0 and 2
        assert got[:, :, 0].tolist() == [[0, 2], [8, 10]]
        # identity resize is a no-op
        assert (
            resize_nearest(arr[:, :, None], 4, 4)[:, :, 0] == arr
        ).all()

    def test_round_trip_and_quarantine(self, spark):
        import hashlib

        from investcloud_data_pipeline_spark.operators.multimodal import (
            _decode_pixels,
            attach_png_payload,
            thumbnail_images,
        )

        docs = spark.createDataFrame(
            [(1, "some document text"), (2, "other words entirely")],
            "doc_id long, text string",
        )
        media = attach_png_payload(docs)
        out = thumbnail_images(media, out_h=8, out_w=8)
        rows = {r.id: r for r in out.collect()}
        assert set(rows) == {1, 2}
        for r in rows.values():
            assert r.decoded and (r.width, r.height) == (16, 16)
            arr = _decode_pixels(bytes(r.thumb))
            assert arr is not None and arr.shape[:2] == (8, 8)
            assert hashlib.md5(bytes(r.thumb)).hexdigest() == r.thumb_md5
            assert r.thumb_bytes == len(bytes(r.thumb))

        # corrupt + NULL payloads quarantine as decoded=false rows
        from pyspark.sql import functions as F

        bad = spark.createDataFrame(
            [(10, bytearray(b"\x89PNGgarbage")), (11, None)],
            "doc_id long, content binary",
        )
        got = {r.id: r.decoded for r in thumbnail_images(bad).collect()}
        assert got == {10: False, 11: False}

    def test_partitioning_invariance(self, spark):
        from investcloud_data_pipeline_spark.operators.multimodal import (
            attach_png_payload,
            thumbnail_images,
        )

        docs = spark.createDataFrame(
            [(i, f"text number {i} with words") for i in range(20)],
            "doc_id long, text string",
        )
        one = {
            (r.id, r.thumb_md5)
            for r in thumbnail_images(
                attach_png_payload(docs.coalesce(1))
            ).collect()
        }
        many = {
            (r.id, r.thumb_md5)
            for r in thumbnail_images(
                attach_png_payload(docs.repartition(7))
            ).collect()
        }
        assert one == many


class TestWavResample:
    def test_decimation_laws_and_round_trip(self, spark):
        import hashlib

        import numpy as np

        from investcloud_data_pipeline_spark.operators.multimodal import (
            encode_wav_pcm16,
            parse_wav,
            resample_wav,
        )

        rate = 8000
        t = np.arange(rate) / rate  # 1s
        sine = 0.5 * np.sin(2 * np.pi * 100 * t)
        df = spark.createDataFrame(
            [(1, bytearray(encode_wav_pcm16(sine, rate))), (2, None)],
            "id long, content binary",
        )
        rows = {r.id: r for r in resample_wav(df, factor=4).collect()}
        assert rows[2].decoded is False
        r = rows[1]
        assert r.decoded and r.n_samples_in == rate
        assert r.n_samples_out == (rate + 3) // 4
        assert r.out_rate == rate // 4
        # re-encoded payload decodes and matches the declared law:
        # y = x[::4] (within PCM16 quantization of the re-encode)
        parsed = parse_wav(bytes(r.wav))
        assert parsed is not None
        _, out_rate, _, y = parsed
        assert out_rate == rate // 4 and y.size == r.n_samples_out
        x = parse_wav(bytes(encode_wav_pcm16(sine, rate)))[3]
        assert np.max(np.abs(y - x[::4])) < 1.0 / 32767 + 1e-9
        assert hashlib.md5(bytes(r.wav)).hexdigest() == r.wav_md5

    def test_factor_one_is_identity_rate(self, spark):
        import numpy as np

        from investcloud_data_pipeline_spark.operators.multimodal import (
            encode_wav_pcm16,
            resample_wav,
        )

        rate = 4000
        x = 0.1 * np.ones(rate // 2)
        df = spark.createDataFrame(
            [(1, bytearray(encode_wav_pcm16(x, rate)))], "id long, content binary"
        )
        r = resample_wav(df, factor=1).collect()[0]
        assert (r.out_rate, r.n_samples_in, r.n_samples_out) == (
            rate,
            x.size,
            x.size,
        )


# ---------- image patches ----------

class TestImagePatches:
    def _media(self, spark, arrs):
        from investcloud_data_pipeline_spark.operators.multimodal import (
            encode_png,
        )

        rows = [(i, encode_png(a)) for i, a in enumerate(arrs)]
        return spark.createDataFrame(rows, "doc_id long, content binary")

    def test_grid_coverage_and_stitch_back(self, spark):
        import numpy as np

        from investcloud_data_pipeline_spark.operators import multimodal as MM

        arr = np.arange(256, dtype=np.uint8).reshape(16, 16)
        out = MM.image_patches(
            self._media(spark, [arr]), patch=8
        ).collect()
        assert len(out) == 4
        assert all(r.decoded and r.patch_bytes == 64 for r in out)
        assert {(r.patch_row, r.patch_col) for r in out} == {
            (0, 0), (0, 1), (1, 0), (1, 1)
        }
        # stitching the patches back reproduces the original pixels
        stitched = np.zeros((16, 16), dtype=np.uint8)
        for r in out:
            px = np.frombuffer(bytes(r.patch), dtype=np.uint8).reshape(8, 8)
            stitched[
                r.patch_row * 8 : (r.patch_row + 1) * 8,
                r.patch_col * 8 : (r.patch_col + 1) * 8,
            ] = px
        assert (stitched == arr).all()

    def test_padding_covers_non_multiple_dims(self, spark):
        import numpy as np

        from investcloud_data_pipeline_spark.operators import multimodal as MM

        arr = np.full((10, 13), 7, dtype=np.uint8)
        out = MM.image_patches(self._media(spark, [arr]), patch=8).collect()
        assert len(out) == 2 * 2  # ceil(10/8) x ceil(13/8)
        px = {
            (r.patch_row, r.patch_col): np.frombuffer(
                bytes(r.patch), dtype=np.uint8
            ).reshape(8, 8)
            for r in out
        }
        # bottom-right patch: original region then zero padding
        br = px[(1, 1)]
        assert (br[:2, :5] == 7).all()
        assert (br[2:, :] == 0).all() and (br[:, 5:] == 0).all()

    def test_corrupt_payload_quarantines(self, spark):
        from investcloud_data_pipeline_spark.operators import multimodal as MM

        bad = spark.createDataFrame(
            [(1, bytearray(b"not a png")), (2, None)],
            "doc_id long, content binary",
        )
        out = MM.image_patches(bad, patch=8).collect()
        assert len(out) == 2
        assert all(not r.decoded and r.patch_idx is None for r in out)


# ---------- audio energy segments ----------

class TestWavEnergySegments:
    def _clip(self, spark, samples, rate=8000):
        from investcloud_data_pipeline_spark.operators.multimodal import (
            encode_wav_pcm16,
        )

        return spark.createDataFrame(
            [(1, encode_wav_pcm16(samples, rate))],
            "id long, content binary",
        )

    def test_silence_tone_boundaries(self, spark):
        import numpy as np

        from investcloud_data_pipeline_spark.operators import multimodal as MM

        w = 160
        t = np.arange(w) / 8000.0
        tone = 0.5 * np.sin(2 * np.pi * 440 * t)
        silence = np.zeros(w)
        # [silence, tone, tone, silence, tone] -> 2 segments, longest 2
        x = np.concatenate([silence, tone, tone, silence, tone])
        r = MM.wav_energy_segments(self._clip(spark, x), window=w).collect()[0]
        assert r.decoded
        assert r.n_frames == 5 and r.n_active == 3
        assert r.n_segments == 2 and r.longest_run == 2
        assert abs(r.active_share - 0.6) < 1e-9

    def test_all_silence_and_all_active(self, spark):
        import numpy as np

        from investcloud_data_pipeline_spark.operators import multimodal as MM

        w = 160
        sil = MM.wav_energy_segments(
            self._clip(spark, np.zeros(w * 3)), window=w
        ).collect()[0]
        assert (sil.n_active, sil.n_segments, sil.longest_run) == (0, 0, 0)
        t = np.arange(w * 3) / 8000.0
        act = MM.wav_energy_segments(
            self._clip(spark, 0.5 * np.sin(2 * np.pi * 440 * t)), window=w
        ).collect()[0]
        assert (act.n_active, act.n_segments, act.longest_run) == (3, 1, 3)

    def test_short_or_corrupt_clip_quarantines(self, spark):
        import numpy as np

        from investcloud_data_pipeline_spark.operators import multimodal as MM

        # a VALID clip shorter than one window is NOT quarantine: it
        # decodes fine and simply has zero full frames (null share)
        short = MM.wav_energy_segments(
            self._clip(spark, np.zeros(10)), window=160
        ).collect()[0]
        assert short.decoded
        assert (short.n_frames, short.n_active) == (0, 0)
        assert (short.n_segments, short.longest_run) == (0, 0)
        assert short.active_share is None
        bad = spark.createDataFrame(
            [(1, bytearray(b"RIFFgarbage"))], "id long, content binary"
        )
        assert not MM.wav_energy_segments(bad, window=160).collect()[0].decoded
