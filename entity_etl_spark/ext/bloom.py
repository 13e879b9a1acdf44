"""Distributed Bloom filter in pure DataFrame ops (sketch surface E6 /
runtime-prefilter pattern).

The classic 100 TB use: build a compact membership sketch over the SMALL
side's keys, broadcast it, and pre-filter the BIG side map-side so the
expensive join/shuffle only sees probable members. Spark's own runtime
bloom filters do this inside the optimizer; this is the same structure as
an explicit, inspectable operator:

- :func:`build_bloom` — k deterministic hash positions per key
  (``xxhash64(key, seed)``), exploded and OR-folded into 64-bit words by a
  ``bit_or`` aggregate: the filter IS a tiny (word_idx, bits) DataFrame
  (n_bits/64 rows), shuffling only hash positions — never keys.
- :func:`probe_bloom` — each probe key joins its k words against the
  broadcast filter; membership = all k bits set (``min`` over booleans =
  AND). No false negatives by construction; false-positive rate ~
  ``(1 - e^{-kn/m})^k``.

Everything is integer hashing — bit-for-bit deterministic across runs, so
tests can pin exact false-positive counts.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class BloomFilter(NamedTuple):
    """The filter table plus the parameters it was built with — probing
    with mismatched (n_bits, k) silently breaks membership, so the build
    carries them and probe_bloom reads them from here."""

    words: DataFrame  # (word_idx long, bits long)
    n_bits: int
    k: int


def _bit_positions(col: Column, n_bits: int, k: int) -> Column:
    """array of k bit positions in [0, n_bits) for a key."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits)) for i in range(k)]
    )


def build_bloom(
    df: DataFrame,
    key_col: str,
    n_bits: int | None = None,
    k: int | None = None,
    target_fp: float = 0.01,
) -> BloomFilter:
    """Filter over the keys of ``df`` — n_bits/64 words, broadcastable.

    By default the filter SIZES ITSELF to the key count (one count job —
    metadata-cheap after a distinct): ``m = -n ln(p) / (ln 2)^2`` bits
    and ``k = (m/n) ln 2`` hashes for ``target_fp``. A fixed n_bits that
    was comfortable at test scale saturates at 10× the keys (fill → 1,
    FP rate → 1 — the sketch silently stops filtering anything); sizing
    from n keeps the FP rate flat at every scale. Pass explicit
    ``n_bits``/``k`` to pin the layout instead."""
    if n_bits is None:
        import math

        n = max(df.count(), 1)
        m = -n * math.log(target_fp) / (math.log(2) ** 2)
        n_bits = max(64, int(math.ceil(m / 64.0)) * 64)
        if k is None:
            k = max(1, round(n_bits / n * math.log(2)))
    elif k is None:
        k = 5
    bits = df.select(
        F.explode(_bit_positions(F.col(key_col), n_bits, k)).alias("__bit")
    )
    words = (
        bits.select(
            (F.col("__bit") / 64).cast("long").alias("word_idx"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("__bit") % 64).cast("int"),
            ).alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("bits"))
    )
    return BloomFilter(words=words, n_bits=n_bits, k=k)


def probe_bloom(df: DataFrame, key_col: str, bloom: BloomFilter) -> DataFrame:
    """Rows of ``df`` whose key is PROBABLY in the filter (no false
    negatives). The filter broadcasts; the probe side never shuffles —
    exactly the map-side prefilter shape that matters at scale."""
    probes = df.withColumn(
        "__bit",
        F.explode(_bit_positions(F.col(key_col), bloom.n_bits, bloom.k)),
    ).select(
        "*",
        (F.col("__bit") / 64).cast("long").alias("word_idx"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("__bit") % 64).cast("int")
        ).alias("__mask"),
    )
    hit = (
        probes.join(F.broadcast(bloom.words), "word_idx", "left")
        .withColumn(
            "__hit",
            F.coalesce(F.col("bits").bitwiseAND(F.col("__mask")) != 0, F.lit(False)),
        )
        .groupBy(key_col)
        .agg(F.min("__hit").alias("__member"))  # AND over the k probes
        .filter(F.col("__member"))
        .select(key_col)
    )
    return df.join(hit, key_col, "left_semi")


# --------------------------------------------------- streaming bloom state
BLOOM_STATE_SCHEMA = "word_idx long, bits long"


def run_streaming_bloom(
    spark,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    *,
    batch_to_keys,
    key_col: str,
    n_bits: int,
    k: int,
    timeout_sec: float = 300.0,
) -> None:
    """Maintain a Bloom filter incrementally over a stream: each
    micro-batch writes ITS OWN word table (≤ n_bits/64 rows) to
    ``state_dir/batch=<id>``; reading merges words by ``bit_or``. OR is
    associative, commutative, AND idempotent, so per-batch-dir overwrite
    makes at-least-once replay exact — the merged filter is bit-for-bit
    the one-shot filter over everything streamed (the registry query's
    oracle pins that equivalence). The third exactly-mergeable state
    family next to count-min (sums of counts) and streaming k-means
    (sums of coordinates): here the monoid is 64-bit OR.

    ``n_bits``/``k`` are REQUIRED: the layout must be pinned up front —
    per-batch auto-sizing would give each batch a different geometry and
    merging mismatched layouts silently breaks membership. Size for the
    expected TOTAL keys, not a batch.

    Runs on the shared slot kernel (:func:`..streaming.run_slot_stream`):
    path guards, stale-slot reset, batch spreading, and the idempotent
    per-slot overwrite live there; this op contributes only the OR-monoid
    partial (a batch-local word table).
    """
    from ..streaming import run_slot_stream

    def slot(batch_df: DataFrame, batch_id: int) -> DataFrame:
        keys = batch_to_keys(batch_df)
        return build_bloom(keys, key_col, n_bits=n_bits, k=k).words

    run_slot_stream(
        spark, stream, state_dir, checkpoint_dir, slot,
        timeout_sec=timeout_sec,
    )


def read_bloom_state(spark, state_dir: str, n_bits: int, k: int) -> BloomFilter:
    """Merged view of the per-batch word tables in ``state_dir`` (the
    empty filter if the stream never wrote state)."""
    from ..streaming import read_state_slots

    words = read_state_slots(spark, state_dir, BLOOM_STATE_SCHEMA)
    merged = words.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
    return BloomFilter(words=merged, n_bits=n_bits, k=k)
