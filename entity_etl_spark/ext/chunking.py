"""Text chunking for training-data pipelines — Python UDTF surface.

Splits each document into fixed-size word windows with overlap (the standard
LLM pre-training shard step). Implemented as a registered Python UDTF — the
engine's user-extensible row→rows transform surface, the same role the
reference's runtime-loaded template registry plays for row→row transforms
(templates.js:15-34; SURVEY §2.2 'UDF/UDAF/UDTF surface').

Semantics are deliberately also expressible with built-ins
(``sequence`` + ``transform`` + ``slice`` + ``posexplode``) — the UDTF form
is the extension-point demonstration; :func:`chunk_documents_builtin` is the
codegen fast path. Both tokenize identically: split on single spaces,
dropping empty tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


def make_chunker_udtf(size: int, stride: int):
    """Build a chunker UDTF class for a fixed (size, stride).

    UDTF constructor args must be constants, so the window geometry is baked
    into the class via closure — ``eval`` receives only data columns.
    ``useArrow=True``: rows cross the Python boundary as Arrow batches
    (the same 10-100× transfer win as Pandas UDFs over pickled rows)."""

    @udtf(
        returnType="chunk_id: bigint, chunk: string, n_words: bigint",
        useArrow=True,
    )
    class Chunker:
        def eval(self, text: str):  # noqa: D401 - UDTF contract
            words = [w for w in (text or "").split(" ") if w]
            i = 0
            while i * stride < len(words):
                piece = words[i * stride : i * stride + size]
                yield i, " ".join(piece), len(piece)
                i += 1

    return Chunker


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    size: int = 100,
    stride: int = 80,
) -> DataFrame:
    """doc → (doc_id, chunk_id, chunk, n_words) rows via the UDTF applied
    LATERAL per row. Row-at-a-time Python is the slow path by design here —
    the built-in variant below is what a 100 TB run uses; this one proves
    the pluggable-UDTF seam works end-to-end."""
    spark = df.sparkSession
    name = f"chunk_{size}_{stride}"
    spark.udtf.register(name, make_chunker_udtf(size, stride))
    df.createOrReplaceTempView("__chunk_in")
    return spark.sql(
        f"""
        SELECT {id_col}, c.chunk_id, c.chunk, c.n_words
        FROM __chunk_in, LATERAL {name}({text_col}) AS c
        """
    )


def chunk_documents_builtin(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    size: int = 100,
    stride: int = 80,
) -> DataFrame:
    """Same output, pure built-ins: words → index sequence → posexplode →
    slice. Whole-stage codegen, no Python workers — the scale path."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n_chunks = F.ceil(F.size(F.col("__words")) / F.lit(stride)).cast("int")
    return (
        df.withColumn("__words", words)
        .filter(F.size("__words") > 0)
        .withColumn("__idx", F.sequence(F.lit(0), n_chunks - 1))
        .select(
            F.col(id_col),
            F.explode("__idx").alias("chunk_id"),
            F.col("__words"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("__words"), F.col("chunk_id") * stride + 1, size), " "
            ).alias("chunk"),
            F.least(
                F.lit(size),
                F.size("__words") - F.col("chunk_id") * stride,
            )
            .cast("bigint")
            .alias("n_words"),
        )
    )
