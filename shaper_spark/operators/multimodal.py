"""Multimodal columns: images/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched pandas over mapInPandas.

The Spark-side plumbing (schemas, partitioning, batch iteration, UDF
signatures) is real and tested. Decode has three tiers:

* REAL for stdlib-parsable formats: inject ``codecs.decode_bmp_features``
  / ``codecs.decode_wav_features`` via the ``decoder`` seam — genuine
  BMP/WAV decode end-to-end, zero third-party dependencies.
* The same seam accepts PIL/ffmpeg/librosa adapters on a codec-equipped
  cluster (those libraries are not in this container).
* Default without a decoder: STUB — raises NotImplementedError (strict
  mode) or produces a deterministic ``fake_``-prefixed value derived
  from the bytes, so pipelines stay testable without codecs and nobody
  mistakes fakes for decoded features.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "extract_image_features",
    "extract_audio_features",
    "resize_images",
    "sample_video_frames",
    "decode_image_stub",
]

# Canonical multimodal column group: content plus typed metadata. At scale
# the binary column lives in its own parquet column chunk — Spark's column
# pruning means metadata-only queries never read the bytes.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def decode_image_stub(content: bytes) -> dict:
    """STUB decode: deterministic pseudo-features from the byte content.

    Replace with a real decoder (PIL etc.) when codecs are available;
    the contract is stable: bytes in → feature dict out."""
    if content is None:
        raise NotImplementedError("no content; real decoder not available")
    h = hashlib.md5(content).digest()
    return {
        "n_bytes": len(content),
        "fake_brightness": h[0] / 255.0,
        "fake_entropy": h[1] / 255.0,
    }


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata without decoding: byte length + md5, JVM-side."""
    return df.withColumn("n_bytes", F.length(F.col(content_col))).withColumn(
        "content_md5", F.md5(F.col(content_col))
    )


_FEATURE_SCHEMA = (
    "media_id long, n_bytes int, fake_brightness double, fake_entropy double"
)
_REAL_FEATURE_SCHEMA = (
    "media_id long, n_bytes int, brightness double, entropy double"
)


def extract_image_features(
    df: DataFrame, strict: bool = False, decoder=None
) -> DataFrame:
    """Per-image features via mapInPandas: Arrow-batched, one Python
    process per core, no per-row serde. `strict=True` raises instead of
    faking, marking where the real codec belongs.

    ``decoder`` is the real-codec adapter seam: a picklable callable
    ``bytes -> {"n_bytes": int, "brightness": float, "entropy": float}``
    (e.g. wrapping PIL on a cluster that has it). When provided, the
    output columns are the real names (``brightness``/``entropy``); the
    default stub keeps the ``fake_`` prefix so nobody mistakes md5-fakes
    for decoded features. The Spark plumbing (batching, schema,
    partitioning) is identical either way — installing codecs requires
    no code change here, just passing the callable."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                if decoder is not None:
                    feats = decoder(data)
                    rows.append(
                        {
                            "media_id": media_id,
                            "n_bytes": feats["n_bytes"],
                            "brightness": feats["brightness"],
                            "entropy": feats["entropy"],
                        }
                    )
                    continue
                if strict:
                    raise NotImplementedError(
                        "image decode requires PIL; not in this environment"
                    )
                feats = decode_image_stub(data)
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": feats["n_bytes"],
                        "fake_brightness": feats["fake_brightness"],
                        "fake_entropy": feats["fake_entropy"],
                    }
                )
            yield pd.DataFrame(rows)

    schema = _REAL_FEATURE_SCHEMA if decoder is not None else _FEATURE_SCHEMA
    return df.select("media_id", "content").mapInPandas(op, schema)


_RESIZE_SCHEMA = (
    "media_id long, width int, height int, thumb binary, thumb_md5 string"
)


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    strict: bool = False,
    resizer=None,
) -> DataFrame:
    """Thumbnail plumbing: binary in → smaller binary out, one row per
    image. ``resizer`` is the real-codec seam: a picklable callable
    ``(bytes, width, height) -> bytes`` producing a genuinely resized
    image — ``codecs.resize_bmp`` does this with zero dependencies for
    BMPs, PIL.Image.resize covers the rest on a codec-equipped cluster.
    Default without a resizer: STUB — a deterministic byte slice sized
    like a real w×h×3 buffer cap, keeping the Arrow batch shape, output
    schema, and the output-bytes ≤ input-bytes property testable."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        cap = width * height * 3
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                if resizer is not None:
                    data = resizer(bytes(content), width, height)
                    rows.append(
                        {
                            "media_id": media_id,
                            "width": width,
                            "height": height,
                            "thumb": data,
                            "thumb_md5": hashlib.md5(data).hexdigest(),
                        }
                    )
                    continue
                if strict:
                    raise NotImplementedError(
                        "image resize requires PIL; not in this environment"
                    )
                data = bytes(content)[:cap]
                rows.append(
                    {
                        "media_id": media_id,
                        "width": width,
                        "height": height,
                        "thumb": data,
                        "thumb_md5": hashlib.md5(data).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "thumb", "thumb_md5"],
            )

    return df.select("media_id", "content").mapInPandas(op, _RESIZE_SCHEMA)


_AUDIO_SCHEMA = (
    "media_id long, n_bytes int, fake_sample_rate int, "
    "fake_rms double, fake_duration_ms long"
)
_REAL_AUDIO_SCHEMA = (
    "media_id long, n_bytes int, sample_rate int, "
    "rms double, duration_ms long"
)


def extract_audio_features(
    df: DataFrame, strict: bool = False, decoder=None
) -> DataFrame:
    """Per-clip audio features via mapInPandas (same Arrow-batched shape
    as images). STUB: sample-rate/RMS are md5-derived and duration comes
    from metadata; a real implementation swaps in librosa/soundfile —
    the batch iteration, schema, and partitioning stay identical.

    ``decoder`` mirrors the image seam: a picklable callable
    ``bytes -> {"n_bytes", "sample_rate", "rms"}`` producing real
    features (columns lose the ``fake_`` prefix); the stub stays the
    default."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, content, duration in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                data = bytes(content) if content is not None else b""
                if decoder is not None:
                    feats = decoder(data)
                    rows.append(
                        {
                            "media_id": media_id,
                            "n_bytes": feats["n_bytes"],
                            "sample_rate": feats["sample_rate"],
                            "rms": feats["rms"],
                            "duration_ms": 0
                            if pd.isna(duration)
                            else int(duration),
                        }
                    )
                    continue
                if strict:
                    raise NotImplementedError(
                        "audio decode requires librosa/soundfile; "
                        "not in this environment"
                    )
                h = hashlib.md5(data).digest()
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(data),
                        "fake_sample_rate": 8000 + (h[2] % 5) * 8000,
                        "fake_rms": h[3] / 255.0,
                        # nullable longs arrive as float NaN in pandas
                        "fake_duration_ms": 0
                        if pd.isna(duration)
                        else int(duration),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=(
                    ["media_id", "n_bytes", "sample_rate", "rms", "duration_ms"]
                    if decoder is not None
                    else [
                        "media_id",
                        "n_bytes",
                        "fake_sample_rate",
                        "fake_rms",
                        "fake_duration_ms",
                    ]
                ),
            )

    flat = df.select(
        "media_id", "content", F.col("meta.duration_ms").alias("duration_ms")
    )
    schema = _REAL_AUDIO_SCHEMA if decoder is not None else _AUDIO_SCHEMA
    return flat.mapInPandas(op, schema)


_FRAME_SCHEMA = "media_id long, frame_idx int, frame_md5 string"


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame.

    STUB: frames are simulated as slices of the byte stream keyed by
    duration metadata; a real implementation swaps the slicing for an
    ffmpeg seek — the exploded (media_id, frame_idx) output shape and
    partitioning are already what downstream featurizers consume."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, content, duration in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                if strict:
                    raise NotImplementedError("video decode requires ffmpeg")
                if content is None or pd.isna(duration):
                    continue
                data = bytes(content)
                n_frames = max(int(duration) // every_ms, 1)
                for i in range(n_frames):
                    chunk = data[i % max(len(data), 1) :][:64]
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": i,
                            "frame_md5": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_md5"])

    flat = df.select(
        "media_id", "content", F.col("meta.duration_ms").alias("duration_ms")
    )
    return flat.mapInPandas(op, _FRAME_SCHEMA)
