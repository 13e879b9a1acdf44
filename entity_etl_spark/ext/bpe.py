"""Distributed BPE merge learning (E4 — the tokenizer-TRAINING core).

:func:`entity_etl_spark.ext.text` counts tokens with a GPT-2-style
pre-tokenizer; this module implements the other half of the tokenizer
story: learning the merge table itself (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units") as a distributed
iteration. Each BPE step is two relational operations over the
word-frequency table:

1. **pair counting** — explode adjacent symbol pairs of every word's
   current segmentation, weighted by word frequency, and take the global
   argmax (count desc, then lexicographic pair for determinism). This is
   the classic map-side-combined explode+groupBy — the same shape as the
   repetition and contamination scans.
2. **merge rewrite** — map-only higher-order fold over the symbol
   array: append each symbol, or fuse it into the accumulator's last
   token when that token is ``l`` and the symbol is ``r``. "Last token
   is ``l``" is decidable by string suffix because a merged ``l+r`` can
   never equal ``l`` (``r`` is non-empty) — so the fold is EXACTLY
   Sennrich's greedy left-to-right non-overlapping scan, including runs:
   ``a a a a`` merges to ``(aa) (aa)``. (A flat ``replace(' l r ',
   ' lr ')`` is NOT equivalent — the match consumes the separator the
   next occurrence needs, under-merging runs; a hypothesis test pins
   the fold against the reference greedy model.)

Only the per-step argmax row (one pair + its count) reaches the driver —
the word table never moves. At 100 TB the word-frequency table is the
standard first aggregation of any tokenizer build; each additional merge
is one explode-aggregate plus one codegen'd map, so n_merges steps cost
n_merges shuffles over |vocab| rows (not |corpus|).

The oracle states the SAME unrolled iteration in SQL (scalar subqueries
for the argmax), making merge choice + count decidable per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text", min_len: int = 2
) -> DataFrame:
    """(w, freq) over lowercase alphabetic words — the BPE training input."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w")
        )
        .filter(F.length("w") >= min_len)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def learn_bpe_merges(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 2,
    min_len: int = 2,
) -> DataFrame:
    """Run ``n_merges`` BPE steps; returns one row per learned merge:
    (step, left_sym, right_sym, pair_count), deterministic under ties
    (count desc, then lexicographic pair)."""
    spark = docs.sparkSession
    words = word_frequencies(docs, text_col, min_len)
    # initial segmentation: every char its own symbol
    seqdf = words.select(
        F.filter(F.split("w", ""), lambda c: c != "").alias("syms"),
        "freq",
    ).localCheckpoint(eager=False)  # word derivation runs once, not per step

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        syms = F.col("syms")
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        )
        top = (
            seqdf.select(F.explode(pairs).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((step, l, r, cnt))
        seqdf = seqdf.withColumn("syms", _greedy_merge(F.col("syms"), l, r))
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, pair_count bigint"
    )


def _greedy_merge(syms, l: str, r: str):
    """Greedy left-to-right merge of adjacent (l, r) into l+r — a string
    fold: append each symbol to the space-joined accumulator, or fuse it
    when the accumulator's last token is ``l`` and the symbol is ``r``
    (suffix-decidable: a just-merged token ``l+r`` can never equal
    ``l``). Split back to the symbol array at the end."""
    L = len(l)
    rest = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    folded = F.aggregate(
        rest,
        F.element_at(syms, 1),
        lambda acc, x: F.when(
            (x == r)
            & (
                (acc == l)
                | (F.substring(acc, -(L + 1), L + 1) == " " + l)
            ),
            F.concat(
                F.substring(acc, 1, F.length(acc) - L), F.lit(l + r)
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )
    return F.split(folded, " ")


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer APPLICATION (the encode side of :func:`learn_bpe_merges`):
    segment every word by the merge table, in merge order, and return the
    per-document token accounting ``(id, n_words, n_tokens)``.

    Scale shape: the greedy fold runs over the DISTINCT vocabulary, not
    the corpus — tokenize each unique word once, then equi-join the
    per-word token counts back to the slim (doc, word) stream and
    aggregate. At 100 TB the fold costs |vocab| rows (bounded by the
    language, not the data); the corpus-sized work is one explode and
    one map-side-combined aggregation. The merge table is foldable
    literals (a real tokenizer's would broadcast — same dataflow).
    """
    wf = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"),
    ).filter(F.col("w") != "")
    # Collapse the corpus-sized explode ONCE into (doc, word, cnt), then
    # cut the lineage: the two consumers below (distinct-vocab branch and
    # token-count join) would otherwise each re-run the explode —
    # Catalyst's column pruning rewrites the vocab branch's explode
    # without doc_id, so the subtrees aren't identical and ReusedExchange
    # cannot fire. localCheckpoint materializes the slim aggregate once
    # (same two-consumer pattern as layout.distributed_shuffle_rank); on
    # a real cluster the deployment path would persist this table to
    # storage instead (executor loss discards localCheckpoint blocks).
    wfc = wf.groupBy(id_col, "w").agg(
        F.count(F.lit(1)).alias("__cnt")
    ).localCheckpoint(eager=False)
    enc = wfc.select("w").distinct().withColumn(
        "syms", F.filter(F.split("w", ""), lambda c: c != "")
    )
    for left, right in merges:
        enc = enc.withColumn(
            "syms", _greedy_merge(F.col("syms"), left, right)
        )
    wtok = enc.select("w", F.size("syms").alias("w_tokens"))
    counts = (
        wfc.join(wtok, "w")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("__cnt") * F.col("w_tokens"))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    # per-DOCUMENT accounting: docs with no alphabetic words report
    # (0, 0) instead of silently vanishing from the result
    return docs.select(id_col).join(counts, id_col, "left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
    )
