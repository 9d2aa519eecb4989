"""Deterministic image payload kernel: codecs, phash, PSNR comparator.

The reference crawler is text-only; image payloads come from BASELINE.json
``input_hint`` (columns image_id/bytes/w/h/fmt/caption/phash). This container
ships no image libraries (no PIL/cv2), so — per the build brief — the codecs
here are deterministic and self-contained:

- ``fmt='png'``  : a REAL minimal PNG codec (pure numpy + zlib, filter type
  0, 8-bit RGB). Lossless → exact pixel equality on round-trip.
- ``fmt='jpeg'`` : a clearly-marked deterministic STAND-IN for a lossy codec
  ("LSY1": 6-bit/channel quantization + zlib). It is NOT a JPEG bitstream;
  it exists so the PSNR ≥ 40 dB comparator path (input_hint) exercises real
  lossy math (6-bit quantization ⇒ PSNR ≈ 48 dB). On a real cluster, swap
  ``encode_image``/``decode_image`` for Pillow/libjpeg calls — every
  Spark-side signature (binary in/out, Arrow batching) is unchanged.

All Spark entry points are Arrow-vectorized pandas UDFs over ``binary``
columns; decoded pixels never enter a shuffle (SURVEY.md §7.3.4).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """Minimal RGB8 PNG writer (filter 0 on every scanline)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 3))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNGs produced by png_encode (filter 0 only)."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, 0
    idat = b""
    h = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bitdepth, colortype = struct.unpack(">IIBB", payload[:10])
            assert bitdepth == 8 and colortype == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    assert (raw[:, 0] == 0).all(), "only filter type 0 supported"
    return raw[:, 1:].reshape(h, w, 3).copy()


_LSY_MAGIC = b"LSY1"
_QUANT_BITS = 6  # step 4 → MSE ≈ 1.25 → PSNR ≈ 47 dB (comfortably ≥ 40)


def lossy_encode(img: np.ndarray) -> bytes:
    """Deterministic lossy stand-in codec (see module docstring)."""
    h, w, _ = img.shape
    shift = 8 - _QUANT_BITS
    q = (img >> shift).astype(np.uint8)
    return _LSY_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 3)


def lossy_decode(data: bytes) -> np.ndarray:
    assert data[:4] == _LSY_MAGIC, "not an LSY1 payload"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    shift = 8 - _QUANT_BITS
    # dequantize to bin centers
    return ((q.astype(np.uint16) << shift) + (1 << (shift - 1))).clip(0, 255).astype(np.uint8)


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    return png_encode(img) if fmt == "png" else lossy_encode(img)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return png_decode(data) if fmt == "png" else lossy_decode(data)


def synth_image(key: int, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic image: seeded gradient + noise (FIXTURES.md §1).

    Pure function of (key, w, h); key is typically
    portable_hash64_py(url) ^ global_seed.
    """
    rng = np.random.default_rng(key & 0xFFFFFFFFFFFFFFFF)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255 / max(w - 1, 1)) + (yy * 255 / max(h - 1, 1))) / 2
    img = np.stack(
        [
            base,
            np.roll(base, h // 3, axis=0),
            255 - base,
        ],
        axis=-1,
    )
    noise = rng.integers(-20, 21, size=(h, w, 3))
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def phash64(img: np.ndarray) -> int:
    """64-bit mean perceptual hash: 8x8 block-averaged grayscale vs median."""
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # block-average down to 8x8 via bincount (fast C scatter-sum)
    ys = (np.arange(h) * 8 // h).astype(np.int64)
    xs = (np.arange(w) * 8 // w).astype(np.int64)
    idx = (ys[:, None] * 8 + xs[None, :]).ravel()
    sums = np.bincount(idx, weights=gray.ravel(), minlength=64)
    counts = np.bincount(idx, minlength=64)
    blocks = (sums / np.maximum(counts, 1)).reshape(8, 8)
    bits = (blocks > np.median(blocks)).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # keep within signed int64 for Spark LongType
    return v - (1 << 64) if v >= (1 << 63) else v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


# ---------------------------------------------------------------------------
# Spark-side Arrow-vectorized UDFs
# ---------------------------------------------------------------------------


def resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy — real, not stubbed)."""
    h, w, _ = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def sample_video_frames(data: bytes, every_n: int = 10) -> list[np.ndarray]:
    """STUB — video decode. This container has no video codec libraries;
    on a real cluster replace with pyav/ffmpeg frame extraction. The Spark
    plumbing (binary column in, array-of-struct frames out via mapInPandas)
    is real and tested with the deterministic fake below."""
    raise NotImplementedError(
        "video decode requires pyav/ffmpeg — not available in this container"
    )


def audio_features(data: bytes) -> dict:
    """STUB — audio feature extraction (see sample_video_frames)."""
    raise NotImplementedError(
        "audio decode requires soundfile/librosa — not available in this container"
    )


def resize_images_udf(out_w: int, out_h: int):
    """mapInPandas-compatible pandas UDF: resize encoded images to
    (out_w, out_h), re-encode in the same fmt. Decode→transform→encode
    stays inside one Arrow batch; pixels never leave the worker."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _resize(data: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for payload, f in zip(data, fmt):
            if payload is None:
                out.append(None)
                continue
            img = decode_image(bytes(payload), f)
            out.append(encode_image(resize_nn(img, out_w, out_h), f))
        return pd.Series(out)

    return _resize


def psnr_udf():
    """pandas_udf (bytes_a, bytes_b, fmt) -> double PSNR.

    The per-row comparator from input_hint: PNG rows must be exact
    (inf PSNR), lossy rows must clear 40 dB. Used only in tests/verification
    — decoded pixels stay inside the UDF.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _psnr(a: pd.Series, b: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for pa, pb, f in zip(a, b, fmt):
            if pa is None or pb is None:
                out.append(None)
                continue
            out.append(psnr(decode_image(bytes(pa), f), decode_image(bytes(pb), f)))
        return pd.Series(out, dtype="float64")

    return _psnr


def image_stats_udf():
    """pandas_udf bytes,fmt -> struct(w,h,mean_lum,phash) — decode +
    feature-extract plumbing for multimodal columns (decode stays in-batch)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<w:int,h:int,mean_lum:double,phash:long>")
    def _stats(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
        rows = []
        for payload, f in zip(data, fmt):
            if payload is None:
                rows.append((None, None, None, None))
                continue
            img = decode_image(bytes(payload), f)
            rows.append(
                (
                    img.shape[1],
                    img.shape[0],
                    float(img.astype(np.float64).mean()),
                    phash64(img),
                )
            )
        return pd.DataFrame(rows, columns=["w", "h", "mean_lum", "phash"])

    return _stats
