"""Training-sequence packing (SURVEY §2.3 training-data surface).

The standard GPT-style "concatenate and chunk" packing: documents are laid
end-to-end in a deterministic order and sliced into fixed-capacity training
sequences; a document straddling a boundary is split across the two
sequences. The entire operator is window arithmetic + one explode — no UDF,
no driver loop.

Scale design: packing runs INDEPENDENTLY per shard (here the ``source``
column) — a global pack order would serialize the cumulative sum through
one task, while per-shard packing is how production pipelines do it anyway
(shards are the unit of shuffling/epoch sampling). The only exchange is the
window's hash partition on the shard key; within a shard the running sum is
a single ordered pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str,
    capacity: int,
    shard_col: str,
    order_col: str,
) -> DataFrame:
    """Assign each document its (sequence, span) slots under concat-and-chunk
    packing with ``capacity`` tokens per training sequence.

    Output: one row per (document, sequence) span —
    ``(shard, doc order key, seq_id, span_tokens)`` where ``seq_id`` is the
    0-based sequence index within the shard and ``span_tokens`` how many of
    the document's tokens land in that sequence. ``sum(span_tokens)`` per
    doc equals its token count; every sequence except a shard's last holds
    exactly ``capacity`` tokens.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.col(n_tokens_col).cast("long")
    offset = F.coalesce(F.sum(n_tokens_col).over(w), F.lit(0)).cast("long")
    # the window must resolve in its own projection before the explode can
    # reference it (a window expression can't nest inside a generator)
    offsets = df.select(
        F.col(shard_col).alias("shard"),
        F.col(order_col).alias("doc_key"),
        offset.alias("__off"),
        n.alias("__n"),
    )
    first_seq = F.floor(F.col("__off") / capacity)
    # greatest(n,1): a zero-token doc still occupies one (empty) slot —
    # and F.sequence(a, b) with b < a would generate DESCENDING otherwise
    last_seq = F.floor(
        (F.col("__off") + F.greatest(F.col("__n"), F.lit(1)) - 1) / capacity
    )
    staged = offsets.select(
        "shard",
        "doc_key",
        "__off",
        "__n",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    span = F.least(
        (F.col("seq_id") + 1) * capacity, F.col("__off") + F.col("__n")
    ) - F.greatest(F.col("seq_id") * capacity, F.col("__off"))
    return staged.select(
        "shard", "doc_key", "seq_id", span.cast("long").alias("span_tokens")
    )
