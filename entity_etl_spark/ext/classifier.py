"""Document-quality classifier gate (E4 — the DCLM / fastText pattern).

Public LLM-data pipelines (CCNet, Gopher, DCLM, fastText quality filters)
gate documents with a LINEAR bag-of-ngrams classifier: hash each token
into a bucket, sum the bucket weights, squash through a sigmoid, keep
docs above a probability threshold. The architecture — model broadcast
to every task, map-only scoring, zero shuffle — is what matters at
100 TB; this module implements exactly that shape with a PINNED weight
vector (no training corpus ships with this environment, and a
deterministic model is what makes the DuckDB oracle decidable).

Scoring stays entirely inside whole-stage codegen: tokenization is
``split``/``filter`` higher-order expressions, the bucket hash is the
repo's portable md5 recipe (identical in Spark and DuckDB, see
:mod:`entity_etl_spark.ext.sampling`), and the weight lookup is
``element_at`` on a foldable array literal — no UDF, no Python boundary,
no join. Swapping in real fastText-exported weights changes only the
``weights`` argument.

Composes into :func:`entity_etl_spark.ext.prep.prepare_training_data` as
an optional gate alongside the CCNet-style perplexity and Gopher-style
repetition filters — completing the public quality-gate triple.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default model size: 64 hash buckets — tiny on purpose (foldable literal
#: array; a real fastText model would broadcast, same dataflow).
N_BUCKETS = 64


def pinned_weights(n_buckets: int = N_BUCKETS) -> list[float]:
    """The pinned linear model: weight[b] = ((b*37 + 11) mod n - n/2) / n.

    Deterministic, zero-mean-ish, full-rank across buckets — a stand-in
    with the exact shape of a trained model and a closed form every SQL
    engine reproduces digit-for-digit."""
    n = n_buckets
    return [float(((b * 37 + 11) % n) - n // 2) / n for b in range(n)]


def _bucket(tok: Column, n_buckets: int) -> Column:
    """Portable token -> bucket hash: first 8 hex chars of md5, mod n.
    (Same recipe as ext/sampling's deterministic variates — chosen over
    xxhash64 because DuckDB states it identically.)"""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def quality_score(
    text: Column,
    *,
    n_buckets: int = N_BUCKETS,
    bias: float = 0.0,
    weights: list[float] | None = None,
) -> Column:
    """P(high quality) for a text column: sigmoid of the mean bucket
    weight over whitespace tokens (mean, not sum, so the score is
    length-invariant like fastText's normalized bag-of-words input).
    Empty docs score sigmoid(bias)."""
    w = weights if weights is not None else pinned_weights(n_buckets)
    if len(w) != n_buckets:
        # element_at past the array end is non-ANSI NULL — a short weight
        # list would silently NULL every score instead of erroring
        raise ValueError(
            f"weights has {len(w)} entries but n_buckets={n_buckets}; "
            "pass n_buckets=len(weights) or a full-length vector"
        )
    w_arr = F.array(*[F.lit(float(x)) for x in w])
    toks = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != ""
    )
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(w_arr, (_bucket(t, n_buckets) + 1).cast("int")),
    )
    n = F.size(toks)
    logit = F.lit(float(bias)) + F.when(n > 0, total / n).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


def classify_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_buckets: int = N_BUCKETS,
    bias: float = 0.0,
    weights: list[float] | None = None,
) -> DataFrame:
    """(id, quality_prob, keep) per document — one map-only scan."""
    prob = quality_score(
        F.col(text_col), n_buckets=n_buckets, bias=bias, weights=weights
    )
    return docs.select(
        F.col(id_col),
        F.round(prob, 6).alias("quality_prob"),
        (prob >= threshold).alias("keep"),
    )
