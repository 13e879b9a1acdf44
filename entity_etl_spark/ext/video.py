"""Video columns with a REAL frame container + frame sampler (E5, SURVEY
§2.3 multimodal).

Compressed codecs (H.264/VP9) stay behind the :mod:`multimodal` stub seam —
no codec libs in this environment — but *container* plumbing is where the
Spark-side engineering lives, so that part is genuine: a VID0 blob is a
12-byte header (magic, frame count, geometry) followed by uncompressed
8-bit grayscale planes, fully parseable with struct + numpy.

- :func:`synthesize_video` — test-harness encoder: per embedding row, a
  6-frame 8x8 clip; frame f holds the byte-quantized embedding *rotated by
  f positions* (``np.roll``), so every frame's bytes differ but the pixel
  POPULATION is rotation-invariant. That makes the sampled-frame mean
  SQL-expressible: it equals the plain quantized-embedding mean, which the
  DuckDB oracle re-derives through the exact byte quantization.
- :func:`sample_frame_features` — the real decode path: parse the header,
  ``np.frombuffer`` the plane array, keep every ``stride``-th frame (the
  classic keyframe-sampling step of a video training pipeline), and emit
  per-clip features. One Arrow ``mapInPandas`` pass; blobs never shuffle
  (sampling happens where the blob partition lives — at 100 TB the frames
  are the data, so the operator must be map-only).

Quantization matches :mod:`image` (``floor((x+1)/2*255+0.5)`` clamped), so
the image/audio/video trio shares one oracle algebra.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAGIC = b"VID0"
SIDE = 8
N_FRAMES = 6
_HDR = "<4sIHH"  # magic, n_frames, width, height
_HDR_LEN = struct.calcsize(_HDR)


def _encode_video(gray: np.ndarray) -> bytes:
    """6-frame 8x8 grayscale clip; frame f = quantized vector rolled by f."""
    q = gray.astype(np.uint8)
    frames = b"".join(np.roll(q, f).tobytes() for f in range(N_FRAMES))
    return struct.pack(_HDR, MAGIC, N_FRAMES, SIDE, SIDE) + frames


def _decode_video(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a VID0 container; returns (n_frames, w, h, frames[n, h, w])."""
    magic, n_frames, w, h = struct.unpack_from(_HDR, blob, 0)
    if magic != MAGIC:
        raise ValueError("not a VID0 blob")
    plane = w * h
    raw = np.frombuffer(blob, dtype=np.uint8, offset=_HDR_LEN,
                        count=n_frames * plane)
    return n_frames, w, h, raw.reshape(n_frames, h, w)


def synthesize_video(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, video binary) — one clip per embedding row."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()),
         T.StructField("video", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                g = np.clip(np.floor((x + 1.0) / 2.0 * 255.0 + 0.5), 0, 255)
                blobs.append(_encode_video(g))
            yield pd.DataFrame({"vec_id": pdf[id_col], "video": blobs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_sampled_pixel", T.DoubleType()),
    ]
)


def sample_frame_features(
    df: DataFrame,
    id_col: str = "vec_id",
    video_col: str = "video",
    stride: int = 2,
) -> DataFrame:
    """Keyframe sampling + per-clip stats in one map-only Arrow pass."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[video_col]):
                n, w, h, frames = _decode_video(bytes(blob))
                sampled = frames[::stride]
                rows.append(
                    (
                        int(vid), n, len(sampled), w, h,
                        round(float(sampled.astype(np.float64).mean()), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "vec_id", "n_frames", "n_sampled", "width", "height",
                    "mean_sampled_pixel",
                ],
            )

    return df.mapInPandas(feats, VIDEO_FEATURE_SCHEMA)
