"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

The image decode step is REAL for PNG: a minimal pure-stdlib baseline
decoder (``zlib`` inflate + per-row unfiltering, 8-bit truecolor/
grayscale, RFC 2083) — no PIL/opencv needed, deterministic, and fast
enough for feature extraction at batch granularity.  Other codecs
(JPEG, audio, video) are STUBBED behind ``NotImplementedError`` unless
``fake=True`` supplies the deterministic stand-in; swapping in
PIL/ffmpeg is a one-function change at the same injection point.

Schema convention:
  media(media_id: long, kind: string, data: binary,
        meta: struct<width:int, height:int, mime:string>)
"""

from __future__ import annotations

import hashlib
import struct
import sys
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
import pyspark.sql.types as T

# the mapInPandas closures call module-level decode functions; ship the
# module by value so executors don't need the package on PYTHONPATH
# (same idiom as ``linkgraph/superstep.py``)
try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder: 8-bit truecolor (HxWx3) or grayscale (HxW),
    filter 0 on every scanline.  Stdlib only."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, color_type = arr.shape[0], arr.shape[1], 0
        rows = arr
    else:
        h, w, _ = arr.shape
        color_type = 2
        rows = arr.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters 0-4 (None/Sub/Up/Average/Paeth)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft, line = int(rows[y, 0]), rows[y, 1:].astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth need the in-row running value
            cur = np.empty(stride, dtype=np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = pv[i]
                if ft == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ft == 3:
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif ft == 4:
                    c = pv[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (line[i] + pred) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter {ft}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Pure-stdlib baseline PNG decode → HxWx3 uint8 (grayscale is
    broadcast to 3 channels).  Supports 8-bit truecolor/grayscale,
    no interlace — the fixture/encoder subset, asserted explicitly."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in (0, 2) or interlace != 0:
                raise NotImplementedError(
                    f"minimal decoder: depth={depth} ctype={ctype} interlace={interlace}"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    ch = 3 if ctype == 2 else 1
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    px = _unfilter(raw, h, w * ch, ch)
    if ch == 1:
        return np.repeat(px.reshape(h, w, 1), 3, axis=2)
    return px.reshape(h, w, 3)


def _synth_image(media_id: int) -> np.ndarray:
    """Deterministic closed-form test pattern — the channel means have
    an exact SQL expression, so the full decode path is oracle-able:
    pixel[y, x, c] = (id·37 + x·7 + y·13 + c·91) mod 256, with
    w = 8 + id mod 9 and h = 8 + (3·id) mod 9."""
    w, h = 8 + media_id % 9, 8 + (3 * media_id) % 9
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((media_id * 37 + x * 7 + y * 13 + c * 91) % 256).astype(np.uint8)


def synthetic_media(spark, n: int = 64, seed: int = 42, png: bool = True) -> DataFrame:
    """Deterministic media table.  ``png=True`` (default): REAL PNG
    blobs of the closed-form test pattern (decoded end-to-end by
    :func:`decode_png`).  ``png=False``: opaque sha256-stream bytes
    (the codec-less stand-in for non-image kinds)."""
    rows = []
    for i in range(n):
        if png:
            img = _synth_image(i)
            h, w = img.shape[:2]
            rows.append((i, "image", bytearray(encode_png(img)), (w, h, "image/png")))
        else:
            blob = b"".join(
                hashlib.sha256(f"{seed}:{i}:{j}".encode()).digest() for j in range(8)
            )
            rows.append((i, "image", bytearray(blob), (16, 16, "image/fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(data: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image blob to HxWx3 uint8.  PNG decodes for real
    (:func:`decode_png`); other formats need PIL/opencv, which are not
    in this container — gated behind ``fake`` (deterministic stand-in:
    bytes reshaped/tiled to 16x16x3)."""
    if bytes(data[:8]) == _PNG_SIG:
        return decode_png(bytes(data))
    if not fake:
        raise NotImplementedError(
            "non-PNG image decoding requires PIL/opencv; not present in "
            "this environment"
        )
    arr = np.frombuffer(
        (data * ((16 * 16 * 3) // len(data) + 1))[: 16 * 16 * 3], dtype=np.uint8
    )
    return arr.reshape(16, 16, 3)


def image_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """(media_id, width, height, mean_r, mean_g, mean_b, brightness) —
    decode + feature-extract per Arrow batch.  PNG blobs decode for
    real; ``fake_decode=True`` additionally admits opaque blobs via the
    deterministic stub (the plumbing is identical either way)."""

    def feats(it):
        for pdf in it:
            out = {
                "media_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "brightness": [],
            }
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                img = decode_image(bytes(data), fake=fake_decode).astype(np.float64)
                means = img.mean(axis=(0, 1))
                out["media_id"].append(mid)
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
                out["brightness"].append(round(float(img.mean()), 6))
            yield pd.DataFrame(out)

    schema = (
        "media_id long, width long, height long, "
        "mean_r double, mean_g double, mean_b double, brightness double"
    )
    return media.select("media_id", "data").mapInPandas(feats, schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """(media_id, frame_idx, frame_hash) — video-frame-sampling shape:
    one row per sampled 'frame' (here: every Nth 64-byte window hashed).
    Real ffmpeg sampling drops into the same mapInPandas slot."""

    def sample(it):
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(data)
                for k, off in enumerate(range(0, len(blob), every_n_bytes)):
                    ids.append(mid)
                    idxs.append(k)
                    hashes.append(
                        int.from_bytes(
                            hashlib.md5(blob[off : off + every_n_bytes]).digest()[:8],
                            "big",
                            signed=False,
                        )
                        >> 1
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return media.select("media_id", "data").mapInPandas(
        sample, "media_id long, frame_idx long, frame_hash long"
    )
