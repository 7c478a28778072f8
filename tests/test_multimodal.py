"""Multimodal plumbing tests: binary columns + typed metadata through
Arrow-batched mapInPandas, with deterministic decode stubs (no codecs
in this container — strict mode marks where they belong)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaper_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    extract_audio_features,
    extract_image_features,
    sample_video_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, b"image-bytes-one", ("image/png", 64, 48, None)),
        (2, b"clip-bytes-two", ("audio/wav", None, None, 2500)),
        (3, b"video-bytes-three", ("video/mp4", 320, 240, 3000)),
        (4, None, ("image/png", 1, 1, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


class TestMetadata:
    def test_metadata_without_decode(self, spark, media):
        out = attach_media_metadata(media).collect()
        by_id = {r["media_id"]: r for r in out}
        assert by_id[1]["n_bytes"] == len(b"image-bytes-one")
        assert by_id[4]["n_bytes"] is None
        assert len(by_id[2]["content_md5"]) == 32

    def test_metadata_only_query_prunes_content(self, spark, media, tmp_path):
        # at scale the binary chunk lives in its own parquet column
        # chunk and a metadata-only query must not read it
        path = str(tmp_path / "media.parquet")
        media.write.parquet(path)
        df = spark.read.parquet(path).select("media_id", "meta.mime")
        jvm = spark._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "content" not in schema_line


class TestImageFeatures:
    def test_deterministic_stub(self, spark, media):
        a = extract_image_features(media).orderBy("media_id").collect()
        b = extract_image_features(media).orderBy("media_id").collect()
        assert a == b
        assert a[0]["n_bytes"] == len(b"image-bytes-one")
        assert 0.0 <= a[0]["fake_brightness"] <= 1.0

    def test_strict_mode_raises(self, spark, media):
        with pytest.raises(Exception, match="PIL|NotImplemented"):
            extract_image_features(media, strict=True).collect()


class TestAudioFeatures:
    def test_shape_and_determinism(self, spark, media):
        out = extract_audio_features(media).orderBy("media_id").collect()
        by_id = {r["media_id"]: r for r in out}
        assert by_id[2]["fake_duration_ms"] == 2500
        assert by_id[2]["fake_sample_rate"] in (8000, 16000, 24000, 32000, 40000)
        assert 0.0 <= by_id[2]["fake_rms"] <= 1.0
        assert by_id[4]["n_bytes"] == 0  # null content → empty stub

    def test_strict_mode_raises(self, spark, media):
        with pytest.raises(Exception, match="librosa|NotImplemented"):
            extract_audio_features(media, strict=True).collect()


class TestVideoFrames:
    def test_one_row_per_sampled_frame(self, spark, media):
        out = sample_video_frames(media, every_ms=1000).collect()
        frames = [r for r in out if r["media_id"] == 3]
        assert len(frames) == 3  # 3000 ms / 1000 ms
        assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]

    def test_rows_without_duration_skipped(self, spark, media):
        out = sample_video_frames(media, every_ms=1000).collect()
        assert not [r for r in out if r["media_id"] in (1, 4)]

    def test_strict_mode_raises(self, spark, media):
        with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
            sample_video_frames(media, strict=True).collect()


class TestResize:
    def test_output_bounded_and_deterministic(self, spark, media):
        from shaper_spark.operators.multimodal import resize_images

        out = resize_images(media, width=4, height=4).orderBy("media_id").collect()
        assert [r["media_id"] for r in out] == [1, 2, 3]  # null content dropped
        for r in out:
            assert len(r["thumb"]) <= 4 * 4 * 3
            assert (r["width"], r["height"]) == (4, 4)
        again = resize_images(media, width=4, height=4).orderBy("media_id").collect()
        assert [r["thumb_md5"] for r in out] == [r["thumb_md5"] for r in again]

    def test_strict_mode_raises(self, spark, media):
        from shaper_spark.operators.multimodal import resize_images

        with pytest.raises(Exception, match="PIL|NotImplemented"):
            resize_images(media, strict=True).collect()


class TestDecoderInjection:
    """Real-codec adapter seam: a cluster with PIL passes a decoder
    callable; the stub (fake_* columns) stays the default."""

    def test_injected_decoder_produces_real_columns(self, spark, media):
        from shaper_spark.operators.multimodal import extract_image_features

        def fake_real_decoder(data: bytes) -> dict:
            return {
                "n_bytes": len(data),
                "brightness": (data[0] if data else 0) / 255.0,
                "entropy": 0.5,
            }

        out = extract_image_features(media, decoder=fake_real_decoder)
        assert out.columns == ["media_id", "n_bytes", "brightness", "entropy"]
        rows = {r["media_id"]: r.asDict() for r in out.collect()}
        assert all(r["entropy"] == 0.5 for r in rows.values())
        first = media.orderBy("media_id").first()
        expected = (bytes(first["content"])[0]) / 255.0
        assert abs(rows[first["media_id"]]["brightness"] - expected) < 1e-9

    def test_default_stays_stubbed(self, spark, media):
        from shaper_spark.operators.multimodal import extract_image_features

        out = extract_image_features(media)
        assert "fake_brightness" in out.columns

    def test_injected_audio_decoder(self, spark, media):
        from shaper_spark.operators.multimodal import extract_audio_features

        def fake_real(data: bytes) -> dict:
            return {"n_bytes": len(data), "sample_rate": 16000, "rms": 0.25}

        out = extract_audio_features(media, decoder=fake_real)
        assert out.columns == [
            "media_id", "n_bytes", "sample_rate", "rms", "duration_ms",
        ]
        rows = {r["media_id"]: r.asDict() for r in out.collect()}
        assert all(r["sample_rate"] == 16000 for r in rows.values())
        assert rows[2]["duration_ms"] == 2500
