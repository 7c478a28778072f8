"""Real stdlib codecs for the multimodal decoder seam: BMP via struct,
WAV via the wave module — genuine decode end-to-end, no PIL/ffmpeg."""

from __future__ import annotations

import math

import pytest

from shaper_spark.operators.codecs import (
    decode_bmp,
    decode_bmp_features,
    decode_wav,
    decode_wav_features,
    encode_bmp,
    encode_wav,
)


class TestBmp:
    def test_roundtrip_dimensions_and_pixels(self):
        px = bytes(range(4 * 2 * 3))  # 4x2, 24-bit
        bmp = encode_bmp(4, 2, px)
        img = decode_bmp(bmp)
        assert (img["width"], img["height"], img["bpp"]) == (4, 2, 24)
        assert img["pixels"] == px

    def test_row_padding_stripped(self):
        # width 3 → row_bytes 9, stride 12: 3 pad bytes per row
        px = bytes([10] * (3 * 2 * 3))
        img = decode_bmp(encode_bmp(3, 2, px))
        assert img["pixels"] == px

    def test_brightness_black_and_white(self):
        black = encode_bmp(2, 2, bytes(12))
        white = encode_bmp(2, 2, bytes([255] * 12))
        fb = decode_bmp_features(black)
        fw = decode_bmp_features(white)
        assert fb["brightness"] == 0.0 and fw["brightness"] == 1.0
        # constant image → zero entropy
        assert fb["entropy"] == 0.0 and fw["entropy"] == 0.0

    def test_entropy_of_uniform_bytes(self):
        # 256 distinct byte values equally often → exactly 8 bits
        px = bytes(range(256)) * 3
        bmp = encode_bmp(16, 16, px)
        assert decode_bmp_features(bmp)["entropy"] == pytest.approx(8.0)

    def test_rejects_non_bmp(self):
        with pytest.raises(ValueError):
            decode_bmp(b"\x89PNG" + b"\x00" * 100)


class TestWav:
    def test_roundtrip_rate_and_frames(self):
        wav = encode_wav(16000, [0, 100, -100, 3000])
        info = decode_wav(wav)
        assert info["sample_rate"] == 16000
        assert info["n_frames"] == 4
        assert info["channels"] == 1

    def test_rms_of_silence_and_full_scale(self):
        silence = encode_wav(8000, [0] * 100)
        loud = encode_wav(8000, [32767] * 100)
        assert decode_wav_features(silence)["rms"] == 0.0
        assert decode_wav_features(loud)["rms"] == pytest.approx(1.0, abs=1e-3)

    def test_rms_of_sine(self):
        n, amp = 1000, 20000
        samples = [
            int(amp * math.sin(2 * math.pi * 50 * i / 8000)) for i in range(n)
        ]
        got = decode_wav_features(encode_wav(8000, samples))["rms"]
        assert got == pytest.approx(amp / 32768.0 / math.sqrt(2), rel=0.05)


class TestSeamIntegration:
    def test_image_features_real_decode_through_spark(self, spark):
        from shaper_spark.operators.multimodal import extract_image_features

        rows = [
            (1, bytearray(encode_bmp(2, 2, bytes([0] * 12)))),
            (2, bytearray(encode_bmp(2, 2, bytes([255] * 12)))),
        ]
        df = spark.createDataFrame(rows, "media_id long, content binary")
        out = {
            r["media_id"]: r.asDict()
            for r in extract_image_features(
                df, decoder=decode_bmp_features
            ).collect()
        }
        assert out[1]["brightness"] == 0.0
        assert out[2]["brightness"] == 1.0
        assert "fake_brightness" not in out[1]

    def test_audio_features_real_decode_through_spark(self, spark):
        from shaper_spark.operators.multimodal import extract_audio_features

        rows = [
            (1, bytearray(encode_wav(16000, [0] * 50)), (100,)),
            (2, bytearray(encode_wav(22050, [30000] * 50)), (100,)),
        ]
        df = spark.createDataFrame(
            rows,
            "media_id long, content binary, meta struct<duration_ms: long>",
        )
        out = {
            r["media_id"]: r.asDict()
            for r in extract_audio_features(
                df, decoder=decode_wav_features
            ).collect()
        }
        assert out[1]["sample_rate"] == 16000 and out[1]["rms"] == 0.0
        assert out[2]["sample_rate"] == 22050 and out[2]["rms"] > 0.9


class TestPalettizedBmp:
    @staticmethod
    def _bmp8(width, height, indices, palette):
        import struct as st

        table = b"".join(bytes(bgr) + b"\x00" for bgr in palette)
        row_bytes = width
        stride = (row_bytes + 3) & ~3
        pad = b"\x00" * (stride - row_bytes)
        body = b"".join(
            bytes(indices[r * width : (r + 1) * width]) + pad
            for r in range(height)
        )
        data_offset = 14 + 40 + len(table)
        header = st.pack(
            "<2sIHHI", b"BM", data_offset + len(body), 0, 0, data_offset
        )
        info = st.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(body),
            2835, 2835, len(palette), 0,
        )
        return header + info + table + body

    def test_palette_applied_not_indices(self):
        # index 0 → white, index 1 → black: an all-index-0 image must be
        # BRIGHT even though its index bytes are all zero
        palette = [(255, 255, 255), (0, 0, 0)]
        white_img = self._bmp8(4, 2, [0] * 8, palette)
        black_img = self._bmp8(4, 2, [1] * 8, palette)
        fw = decode_bmp_features(white_img)
        fb = decode_bmp_features(black_img)
        assert fw["brightness"] == 1.0
        assert fb["brightness"] == 0.0

    def test_missing_palette_rejected(self):
        import struct as st

        header = st.pack("<2sIHHI", b"BM", 54 + 4, 0, 0, 54)
        info = st.pack(
            "<IiiHHIIiiII", 40, 2, 1, 1, 8, 0, 4, 2835, 2835, 0, 0
        )
        with pytest.raises(ValueError):
            decode_bmp(header + info + b"\x00\x00\x00\x00")


class TestResizeBmp:
    def test_downsample_quadrants(self):
        from shaper_spark.operators.codecs import decode_bmp, resize_bmp

        # 4x4 image: left half black, right half white → 2x2 thumb keeps it
        px = bytearray()
        for r in range(4):
            for c in range(4):
                v = 255 if c >= 2 else 0
                px += bytes([v, v, v])
        small = resize_bmp(encode_bmp(4, 4, bytes(px)), 2, 2)
        img = decode_bmp(small)
        assert (img["width"], img["height"]) == (2, 2)
        p = img["pixels"]
        rows = [p[i * 6 : (i + 1) * 6] for i in range(2)]
        for row in rows:
            assert row[:3] == b"\x00\x00\x00"   # left stays black
            assert row[3:6] == b"\xff\xff\xff"  # right stays white

    def test_through_spark_resizer_seam(self, spark):
        from shaper_spark.operators.codecs import decode_bmp, resize_bmp
        from shaper_spark.operators.multimodal import resize_images

        rows = [
            (1, bytearray(encode_bmp(8, 8, bytes([200] * 8 * 8 * 3)))),
        ]
        df = spark.createDataFrame(rows, "media_id long, content binary")
        out = resize_images(df, width=4, height=4, resizer=resize_bmp).collect()
        assert len(out) == 1
        thumb = decode_bmp(bytes(out[0]["thumb"]))
        assert (thumb["width"], thumb["height"]) == (4, 4)
        assert set(thumb["pixels"]) == {200}  # real pixels, not a byte slice
