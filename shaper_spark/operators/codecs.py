"""Real, dependency-free media codecs for the multimodal decoder seam.

The multimodal operators (multimodal.py) take a ``decoder`` callable —
the injection point where a codec-equipped cluster plugs in PIL/ffmpeg.
This module provides REAL decoders for the formats the Python standard
library can parse on its own:

* ``decode_bmp``  — uncompressed 8/24/32-bit Windows BMP via ``struct``:
  true width/height plus brightness (mean pixel intensity) and entropy
  (Shannon bits of the pixel-byte histogram).
* ``decode_wav``  — PCM WAV via the stdlib ``wave`` module: true sample
  rate and RMS amplitude.

So ``extract_image_features(df, decoder=decode_bmp_features)`` performs
a genuine decode end-to-end with zero third-party dependencies; the
PIL/ffmpeg seam remains for JPEG/PNG/MP3/video, which have no stdlib
parser. Encoders (``encode_bmp``/``encode_wav``) are included so tests
and diagnostics can round-trip without codec libraries.

Everything here runs inside Arrow-batched ``mapInPandas`` workers —
pure-Python per-image cost is bounded by thumbnail-scale inputs; at
100 TB the heavy decode belongs to the injected native codec, and these
functions document exactly the contract it must satisfy.
"""

from __future__ import annotations

import io
import math
import struct
import wave

__all__ = [
    "decode_bmp",
    "decode_wav",
    "decode_bmp_features",
    "decode_wav_features",
    "encode_bmp",
    "encode_wav",
    "resize_bmp",
]


def decode_bmp(content: bytes) -> dict:
    """Parse an uncompressed 8/24/32-bit BMP: header fields plus the raw
    pixel intensity bytes (row padding stripped, row order preserved
    bottom-up as stored). Raises ValueError on anything else."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    header_size = struct.unpack_from("<I", content, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0:
        raise ValueError("compressed BMP not supported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported bit depth {bpp}")
    abs_h = abs(height)
    bytes_per_px = bpp // 8
    row_bytes = width * bytes_per_px
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    palette = None
    if bpp == 8:
        # 8-bit BMPs are palettized: indices mean nothing without the
        # BGRX color table between the info header and the pixel data.
        table = content[14 + header_size : data_offset]
        if len(table) < 4:
            raise ValueError("8-bit BMP missing color palette")
        palette = [table[i : i + 3] for i in range(0, len(table) - 3, 4)]
    pixels = bytearray()
    for r in range(abs_h):
        start = data_offset + r * stride
        row = content[start : start + row_bytes]
        if len(row) < row_bytes:
            raise ValueError("truncated BMP pixel data")
        if palette is not None:
            for idx in row:
                if idx >= len(palette):
                    raise ValueError("BMP palette index out of range")
                pixels += palette[idx]  # indices → real BGR intensities
        else:
            pixels += row
    return {
        "width": width,
        "height": abs_h,
        "bpp": bpp,
        "planes": planes,
        # negative biHeight = rows stored TOP-DOWN; consumers that
        # re-encode (always bottom-up, positive height) must reverse
        # row order first or the image flips vertically
        "top_down": height < 0,
        "pixels": bytes(pixels),
    }


def decode_bmp_features(content: bytes) -> dict:
    """Adapter matching ``extract_image_features``'s decoder contract:
    bytes → {n_bytes, brightness, entropy} — REAL values from a real
    parse (brightness = mean pixel byte / 255; entropy = Shannon bits
    of the pixel-byte histogram, 0..8)."""
    img = decode_bmp(content)
    px = img["pixels"]
    n = len(px)
    if n == 0:
        return {"n_bytes": len(content), "brightness": 0.0, "entropy": 0.0}
    hist = [0] * 256
    for b in px:
        hist[b] += 1
    brightness = sum(i * c for i, c in enumerate(hist)) / (n * 255.0)
    entropy = -sum(
        (c / n) * math.log2(c / n) for c in hist if c
    )
    return {
        "n_bytes": len(content),
        "brightness": round(brightness, 6),
        "entropy": round(entropy, 6),
    }


def decode_wav(content: bytes) -> dict:
    """Parse a PCM WAV via the stdlib ``wave`` module: sample rate,
    channels, sample width, frame count, and raw frames."""
    with wave.open(io.BytesIO(content), "rb") as w:
        return {
            "sample_rate": w.getframerate(),
            "channels": w.getnchannels(),
            "sample_width": w.getsampwidth(),
            "n_frames": w.getnframes(),
            "frames": w.readframes(w.getnframes()),
        }


def decode_wav_features(content: bytes) -> dict:
    """Adapter matching ``extract_audio_features``'s decoder contract:
    bytes → {n_bytes, sample_rate, rms} — REAL values (RMS normalized
    to [0, 1] over 16-bit full scale; 8-bit WAVs are unsigned and are
    re-centered before the RMS)."""
    info = decode_wav(content)
    frames = info["frames"]
    sw = info["sample_width"]
    if sw == 2:
        fmt = f"<{len(frames) // 2}h"
        samples = struct.unpack(fmt, frames)
        scale = 32768.0
    elif sw == 1:
        samples = [b - 128 for b in frames]
        scale = 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if not samples:
        rms = 0.0
    else:
        rms = math.sqrt(sum(s * s for s in samples) / len(samples)) / scale
    return {
        "n_bytes": len(content),
        "sample_rate": info["sample_rate"],
        "rms": round(rms, 6),
    }


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 24-bit uncompressed BMP writer (``pixels`` is
    bottom-up BGR, ``width*height*3`` bytes). For tests/diagnostics."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    pad = b"\x00" * (stride - row_bytes)
    body = b"".join(
        pixels[r * row_bytes : (r + 1) * row_bytes] + pad
        for r in range(height)
    )
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Minimal 16-bit mono PCM WAV writer. For tests/diagnostics."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def resize_bmp(content: bytes, width: int, height: int) -> bytes:
    """REAL image resize with zero dependencies: nearest-neighbor
    resample of an uncompressed BMP to ``width``×``height``, returned
    as a 24-bit BMP (palettized inputs come out expanded — decode_bmp
    already applies the color table). The ``resizer`` seam contract for
    ``multimodal.resize_images``: bytes in → smaller bytes out, still a
    decodable image."""
    img = decode_bmp(content)
    sw, sh = img["width"], img["height"]
    if sw <= 0 or sh <= 0:
        raise ValueError("degenerate source dimensions")
    src = img["pixels"]
    bpp = 3 if len(src) == sw * sh * 3 else 4
    if img["top_down"]:
        # encode_bmp writes bottom-up; reverse top-down rows so the
        # output renders the same way up as the input
        rb = sw * bpp
        src = b"".join(
            src[r * rb : (r + 1) * rb] for r in range(sh - 1, -1, -1)
        )
    out = bytearray()
    for r in range(height):
        sr = r * sh // height
        row_off = sr * sw * bpp
        for c in range(width):
            sc = c * sw // width
            px = src[row_off + sc * bpp : row_off + sc * bpp + 3]
            out += px
    return encode_bmp(width, height, bytes(out))
