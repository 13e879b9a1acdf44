"""Image columns with a REAL decoder (E5 upgrade, SURVEY §2.3).

Uncompressed 24-bit BMP needs no codec library — a 54-byte header plus raw
BGR pixel rows, fully parseable with numpy. Together with :mod:`audio`
(WAV/PCM) this makes the multimodal decode path genuine for two formats;
only compressed codecs (JPEG/MP3/H.264) remain behind the
:mod:`multimodal` stub seam.

- :func:`synthesize_bmp` — test-harness encoder: an 8x8 grayscale-in-RGB
  BMP per row whose 64 pixel values quantize the row's embedding
  (``floor((x + 1) / 2 * 255 + 0.5)`` clamped to a byte; 8x8 x 3 bytes =
  24-byte rows, already 4-byte aligned, so no padding ambiguity).
- :func:`decode_bmp_features` — the real decode: parse the
  BITMAPINFOHEADER, ``np.frombuffer`` the pixel array, re-flip the
  bottom-up rows, and emit (width, height, mean pixel value). Pixel
  values are integers, so the mean is exact in double precision and a
  relational oracle can re-derive it from the source floats through the
  full binary round trip.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SIDE = 8  # 8x8 pixels; 24-bit rows are 4-byte aligned with no padding


def _encode_bmp(gray: np.ndarray) -> bytes:
    """8x8 24-bit BMP with R=G=B=gray[i] per pixel, bottom-up row order."""
    px = gray.reshape(SIDE, SIDE)[::-1]  # BMP stores rows bottom-up
    bgr = np.repeat(px.astype(np.uint8).reshape(-1, 1), 3, axis=1)
    pixels = bgr.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(pixels), 0, 0, 54,
        40, SIDE, SIDE, 1, 24, 0, len(pixels), 2835, 2835, 0, 0,
    )
    return header + pixels


def _decode_bmp(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an uncompressed 24-bit BMP; returns (width, height, HxWx3)."""
    if blob[0:2] != b"BM":
        raise ValueError("not a BMP blob")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError("decoder supports uncompressed 24-bit BMP only")
    row_bytes = (width * 3 + 3) // 4 * 4
    raw = np.frombuffer(blob, dtype=np.uint8, offset=data_off,
                        count=row_bytes * abs(height))
    rows = raw.reshape(abs(height), row_bytes)[:, : width * 3]
    img = rows.reshape(abs(height), width, 3)
    if height > 0:  # bottom-up → top-down
        img = img[::-1]
    return width, abs(height), img


def synthesize_bmp(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, bmp binary) — embedding mapped half-up onto 0..255 gray."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("bmp", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                g = np.clip(np.floor((x + 1.0) / 2.0 * 255.0 + 0.5), 0, 255)
                blobs.append(_encode_bmp(g))
            yield pd.DataFrame({"vec_id": pdf[id_col], "bmp": blobs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


BMP_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_bmp_features(
    df: DataFrame, id_col: str = "vec_id", bmp_col: str = "bmp"
) -> DataFrame:
    """Real binary decode → per-image features, one Arrow pass."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[bmp_col]):
                w, h, img = _decode_bmp(bytes(blob))
                rows.append(
                    (int(vid), w, h, round(float(img.astype(np.float64).mean()), 6))
                )
            yield pd.DataFrame(
                rows, columns=["vec_id", "width", "height", "mean_pixel"]
            )

    return df.mapInPandas(feats, BMP_FEATURE_SCHEMA)
