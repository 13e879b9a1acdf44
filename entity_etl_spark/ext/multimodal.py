"""Multimodal column plumbing (E5, SURVEY §2.3).

Images/audio/video ride through the engine as opaque ``binary`` columns with
a typed metadata struct. The Spark-side mechanics — schema, Arrow batching,
partition sizing — are real and tested. Decoding: REAL for formats the
stdlib + numpy can parse without codec libraries — WAV/PCM (:mod:`audio`),
uncompressed BMP, zlib/DEFLATE PNG, LZW GIF87a, and (r9) baseline lossy
JPEG/JFIF (:mod:`image`), all driver-oracle-verified through the full
binary round trip. THIS module's generic ``_decode_batch`` remains the
stub seam for the remaining codecs (MP3/H.264: ``mode='fake'`` produces
deterministic pseudo-features; ``'error'`` raises NotImplementedError)
because those libraries are not in this environment. Swapping in a real
codec changes ONE function body, nothing else — exactly as audio.py/image.py
demonstrate.

Scale notes: media blobs dominate partition size — repartition so each
partition stays within executor memory (``target_rows_per_partition``), and
never groupBy/shuffle the blob column itself; extract features first, carry
(id, features) forward, and re-join blobs only at the sink if needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-harness adapter: materialize a binary payload column + metadata
    struct from a text column (stands in for reading image/audio bytes)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("media", blob).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("media_type"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.sha2(blob, 256).alias("digest"),
        ),
    )


def _decode_batch(blobs: pd.Series, mode: str) -> pd.DataFrame:
    """The ONE substitution point for a real decoder (PIL/torchaudio/etc.).

    ``mode='wav'`` IS a real decoder — it routes through
    :mod:`entity_etl_spark.ext.audio`'s RIFF parse + numpy PCM decode, so
    the driver-checked E5 row exercises genuine binary decoding;
    ``'fake'`` (deterministic byte arithmetic) remains for plumbing tests
    and as the stand-in for codec formats absent from this environment."""
    if mode == "error":
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; use mode='fake' for deterministic plumbing tests"
        )
    if mode == "wav":
        import numpy as np

        from .audio import _decode_wav

        n_bytes, feat_mean, feat_dim = [], [], []
        for b in blobs:
            bb = bytes(b)
            _rate, n, data = _decode_wav(bb)
            n_bytes.append(len(bb))
            feat_mean.append(
                float(data.astype(np.float64).sum() / n) if n else 0.0
            )
            feat_dim.append(n)
        return pd.DataFrame(
            {"n_bytes": n_bytes, "feat_mean": feat_mean, "feat_dim": feat_dim}
        )
    # deterministic fake: 'features' derived from byte content
    n_bytes = blobs.map(len)
    feat_mean = blobs.map(
        lambda b: (sum(b[:64]) / min(len(b), 64)) if len(b) else 0.0
    )
    return pd.DataFrame({"n_bytes": n_bytes, "feat_mean": feat_mean})


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    mode: str = "fake",
    target_rows_per_partition: int | None = None,
) -> DataFrame:
    """Feature extraction over binary media via mapInPandas (Arrow batches).

    Output schema is fixed (FEATURE_SCHEMA) regardless of decoder, so the
    downstream plan never changes when the stub is replaced."""
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))
    if target_rows_per_partition:
        n = max(1, df.count() // target_rows_per_partition)
        cols = cols.repartition(n)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_batch(pdf["media"], mode)
            dim = (
                feats["feat_dim"].astype("int32")
                if "feat_dim" in feats.columns
                else 64
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats["n_bytes"].astype("int64"),
                    "feat_mean": feats["feat_mean"].astype("float64"),
                    "feat_dim": dim,
                }
            )

    return cols.mapInPandas(run, FEATURE_SCHEMA)
