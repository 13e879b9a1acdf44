"""Audio columns with a REAL decoder (E5 upgrade, SURVEY §2.3).

Unlike the generic media stub (:mod:`multimodal`), WAV/PCM needs no codec
library — the format is a 44-byte RIFF header plus a raw little-endian
sample array, fully parseable with numpy. This module carries genuine
binary audio through the engine:

- :func:`synthesize_wav` — test-harness encoder: per row, a 16-bit mono
  PCM WAV whose samples quantize the row's embedding vector
  (``floor(x * 32767 + 0.5)`` clamped to int16 — half-up rounding chosen
  because every SQL engine's ``round``/``floor`` matches it, so an oracle
  can re-derive the exact samples from the source floats).
- :func:`decode_wav_features` — the real decode path: validate the RIFF
  structure, read the header fields, ``np.frombuffer`` the PCM block, and
  emit per-clip features (sample count, rate, RMS, peak). Arrow-batched
  ``mapInPandas``; blobs never shuffle (features only from here on — the
  :mod:`multimodal` discipline).

All sample math is exact: int16 values squared and summed stay within
double precision, so RMS/peak are bit-identical to a relational
restatement over the original floats — that is what the driver oracle
checks end-to-end through the binary round trip.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SAMPLE_RATE = 8000


def _encode_wav(samples: np.ndarray, rate: int = SAMPLE_RATE) -> bytes:
    """Minimal canonical RIFF/WAVE encoder: 16-bit mono PCM."""
    pcm = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16,
        1,              # PCM
        1,              # mono
        rate,
        rate * 2,       # byte rate
        2,              # block align
        16,             # bits per sample
        b"data", len(pcm),
    )
    return hdr + pcm


def _decode_wav(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a 16-bit mono PCM WAV; returns (sample_rate, n_samples, data)."""
    if blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    (fmt_size,) = struct.unpack_from("<I", blob, 16)
    audio_fmt, channels, rate = struct.unpack_from("<HHI", blob, 20)
    (bits,) = struct.unpack_from("<H", blob, 34)
    if (audio_fmt, channels, bits) != (1, 1, 16):
        raise ValueError("decoder supports 16-bit mono PCM only")
    data_off = 20 + fmt_size
    if blob[data_off : data_off + 4] != b"data":
        raise ValueError("missing data chunk")
    (n_bytes,) = struct.unpack_from("<I", blob, data_off + 4)
    data = np.frombuffer(blob, dtype="<i2", offset=data_off + 8, count=n_bytes // 2)
    return rate, len(data), data


def synthesize_wav(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, wav binary) — embedding quantized half-up to int16 PCM."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("wav", T.BinaryType())]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wavs = []
            for vec in pdf[vec_col]:
                x = np.asarray(vec, dtype=np.float32).astype(np.float64)
                s = np.clip(np.floor(x * 32767.0 + 0.5), -32768, 32767)
                wavs.append(_encode_wav(s))
            yield pd.DataFrame({"vec_id": pdf[id_col], "wav": wavs})

    return df.select(id_col, vec_col).mapInPandas(synth, schema)


WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak_abs", T.IntegerType()),
    ]
)


def decode_wav_features(
    df: DataFrame, id_col: str = "vec_id", wav_col: str = "wav"
) -> DataFrame:
    """Real binary decode → per-clip features. One Arrow pass; output
    carries features only (never re-shuffle the blobs)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[wav_col]):
                rate, n, data = _decode_wav(bytes(blob))
                d = data.astype(np.float64)
                rows.append(
                    (
                        int(vid),
                        rate,
                        n,
                        round(float(np.sqrt(np.mean(d * d))), 6) if n else 0.0,
                        # widen before abs: np.abs(int16(-32768)) overflows
                        int(np.max(np.abs(data.astype(np.int32)))) if n else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["vec_id", "sample_rate", "n_samples", "rms", "peak_abs"]
            )

    return df.mapInPandas(feats, WAV_FEATURE_SCHEMA)
