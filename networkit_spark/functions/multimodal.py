"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

The decode step is STUBBED (image/audio codecs are not in this
container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (bytes →
seeded pixel stats) stands in.  Everything Spark-side — schema,
partition sizing, UDF signature, Arrow batch shape — is real and
tested; swapping in PIL/ffmpeg is a one-function change.

Schema convention:
  media(media_id: long, kind: string, data: binary,
        meta: struct<width:int, height:int, mime:string>)
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
import pyspark.sql.types as T

# the mapInPandas closures call module-level ``decode_image``; ship the
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


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: data = sha256 stream bytes."""
    rows = []
    for i in range(n):
        blob = b"".join(
            hashlib.sha256(f"{seed}:{i}:{j}".encode()).digest() for j in range(8)
        )
        rows.append((i, "image", bytearray(blob), (16, 16, "image/fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(data: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image blob to HxWx3 uint8.  REAL CODECS NOT AVAILABLE
    in this container — gate behind ``fake`` (deterministic stand-in:
    bytes reshaped/tiled to 16x16x3)."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv; not present in this environment"
        )
    arr = np.frombuffer((data * ((16 * 16 * 3) // len(data) + 1))[: 16 * 16 * 3], dtype=np.uint8)
    return arr.reshape(16, 16, 3)


def image_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """(media_id, mean_r, mean_g, mean_b, brightness) — decode +
    feature-extract per Arrow batch; the distributed plumbing (binary
    Arrow transfer, per-batch numpy, schema) is the real article even
    though the decoder is the deterministic stub."""

    def feats(it):
        for pdf in it:
            out = {"media_id": [], "mean_r": [], "mean_g": [], "mean_b": [], "brightness": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                img = decode_image(bytes(data), fake=fake_decode).astype(np.float64)
                means = img.mean(axis=(0, 1))
                out["media_id"].append(mid)
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
                out["brightness"].append(round(float(img.mean()), 6))
            yield pd.DataFrame(out)

    schema = "media_id long, mean_r double, mean_g double, mean_b double, brightness double"
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
