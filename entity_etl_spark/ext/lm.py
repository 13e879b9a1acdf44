"""Distributed character n-gram language-model quality scoring (E4).

The CCNet/Gopher-style quality gate scores each document with a small
language model and filters on perplexity. The heavy engine (KenLM) is a
library concern; the ENGINE pattern — train a model as an aggregate over
the corpus, broadcast it, score every document with joins — is what has to
survive 100 TB, and is what this module implements with a char-bigram
add-one-smoothed LM (SURVEY.md §2.3 E4).

Scale shape:

- ``doc_char_bigrams``: explode (doc, position) → 2-char slice. The
  explode stays inside one whole-stage-codegen pipeline; the groupBys that
  follow partial-aggregate map-side, so the shuffle carries distinct
  bigrams per partition (bounded by charset², ~10⁴), not corpus positions.
- ``train_char_bigram_lm``: three aggregates over one bigram scan —
  bigram counts, prefix counts, vocabulary size. Model size is O(charset²)
  rows: tiny forever, broadcast-joinable at any corpus size.
- ``score_documents``: per-doc bigram histogram (one shuffle keyed
  doc_id×bigram, map-side combined), broadcast-join the model, weighted
  log-prob average per doc (second shuffle keyed doc_id). No Python in the
  loop — ln/arithmetic are codegen expressions.

Unseen-data semantics: add-one smoothing; a bigram never seen under a seen
prefix scores ln(1/(c(prefix)+V)); a wholly unseen prefix scores ln(1/V).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_char_bigrams(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, bigram, prefix) — one row per character position 1..len-1."""
    # NB: F.sequence(1, 0) yields the DESCENDING [1, 0], not an empty array —
    # docs shorter than 2 chars must be filtered, not left to the sequence.
    return (
        docs.select(id_col, text_col)
        .filter(F.length(text_col) >= 2)
        .withColumn(
            "__p", F.explode(F.sequence(F.lit(1), F.length(text_col) - 1))
        )
        .select(
            F.col(id_col),
            F.expr(f"substring({text_col}, __p, 2)").alias("bigram"),
            F.expr(f"substring({text_col}, __p, 1)").alias("prefix"),
        )
    )


def train_char_bigram_lm(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> dict[str, DataFrame]:
    """Train the LM: returns ``{"bigrams": (bigram, cab), "prefixes":
    (prefix, ca), "vocab": (v)}`` — all tiny (≤ charset²) and broadcastable."""
    bg = doc_char_bigrams(docs, text_col=text_col, id_col=id_col)
    bigrams = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cab"))
    prefixes = bg.groupBy("prefix").agg(F.count(F.lit(1)).alias("ca"))
    vocab = bg.select(
        F.countDistinct(F.substring("bigram", 2, 1)).alias("v")
    )
    return {"bigrams": bigrams, "prefixes": prefixes, "vocab": vocab}


def score_documents(
    docs: DataFrame,
    model: dict[str, DataFrame],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Per-document average bigram log-probability under the trained model.

    Output: (id, n_bigrams, avg_logprob) — more negative = less like the
    training corpus; the quality gate thresholds on it. Documents shorter
    than 2 chars produce no bigrams and are absent (they carry no signal).
    """
    hist = (
        doc_char_bigrams(docs, text_col=text_col, id_col=id_col)
        .groupBy(id_col, "bigram", "prefix")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scored = (
        hist.join(F.broadcast(model["bigrams"]), "bigram", "left")
        .join(F.broadcast(model["prefixes"]), "prefix", "left")
        .crossJoin(F.broadcast(model["vocab"]))
        .withColumn("__cab", F.coalesce("cab", F.lit(0)))
        .withColumn("__ca", F.coalesce("ca", F.lit(0)))
        .withColumn(
            "__logp",
            F.log((F.col("__cab") + 1.0) / (F.col("__ca") + F.col("v"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("n").cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum(F.col("n") * F.col("__logp")) / F.sum("n"), round_to
        ).alias("avg_logprob"),
    )


def source_kl_divergence(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """KL(P_source || P_corpus) over whitespace-token unigram
    distributions — how far each source's language drifts from the corpus
    mix. The mixture-design diagnostic: high-KL sources are the ones
    up/down-weighting will actually change.

    No smoothing needed: every source token is, by construction, in the
    corpus support (P ≪ Q always holds for a sub-corpus).

    Scale: one tokenize-explode scan feeds two map-side-combined
    aggregations — (source, token) counts and the token margins; the
    margins join is token-keyed (bounded by vocabulary), the per-source
    totals ride a broadcast. Everything else is codegen ln/arithmetic.
    """
    toks = docs.select(
        group_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "\\s+"), lambda t: t != ""
            )
        ).alias("tok"),
    )
    st = toks.groupBy(group_col, "tok").agg(F.count(F.lit(1)).alias("c_st"))
    t = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_t"))
    s_tot = toks.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_s"))
    g_tot = toks.agg(F.count(F.lit(1)).alias("n_g"))
    return (
        st.join(t, "tok")
        .join(F.broadcast(s_tot), group_col)
        .crossJoin(F.broadcast(g_tot))
        .withColumn("__p", F.col("c_st") / F.col("n_s"))
        .withColumn("__q", F.col("c_t") / F.col("n_g"))
        .groupBy(group_col)
        .agg(
            F.max("n_s").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("__p") * F.log(F.col("__p") / F.col("__q"))),
                round_to,
            ).alias("kl_vs_corpus"),
        )
    )


def dsir_importance_sample(
    docs: DataFrame,
    *,
    target_lang: str = "en",
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = ("source",),
    n_buckets: int = 256,
    k: int = 100,
    round_to: int = 4,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): score every candidate document by the hashed-unigram
    log-likelihood ratio of a target domain vs the raw corpus, then draw a
    weighted sample without replacement via the Gumbel-top-k trick.

    Engine shape (SURVEY.md §2.3 E4; no reference citation — additive):

    - tokens hash into ``n_buckets`` buckets (md5-derived, engine-portable),
      so both "language models" are O(n_buckets) count tables regardless of
      corpus size — broadcastable forever, the entire point of DSIR's
      hashed features at scale;
    - one tokenize-explode scan builds a per-(doc, bucket) histogram
      (map-side combined: shuffle carries ≤ n_buckets rows per doc, not one
      per token), pinned once and reused by the raw counts, the target
      counts, and the scoring join;
    - per-bucket log-ratio ``ln((c_t+1)/(N_t+B)) - ln((c_r+1)/(N_r+B))``
      (add-one smoothing) lives in a B-row broadcast table;
    - candidate docs (lang != target) get a length-normalized score
      ``avg over tokens of lr(bucket)``, then a deterministic Gumbel key
      ``score - ln(-ln(u(doc_id)))`` with the md5-uniform — no RNG state,
      identical selection on any cluster layout (same portability contract
      as sampling.weighted_sample_per_group);
    - top-k is orderBy+limit → TakeOrderedAndProject (per-partition heaps,
      never a global sort).

    Returns the k selected docs: (rnk, id, lang, carry..., n_tokens,
    dsir_logratio), rnk 1..k by descending Gumbel key.
    """
    from .dedup import nonempty_tokens

    toks = docs.select(
        id_col,
        lang_col,
        *carry_cols,
        F.explode(nonempty_tokens(F.col(text_col))).alias("tok"),
    )
    bkt = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    ).alias("bkt")
    hist = (
        toks.select(id_col, lang_col, *carry_cols, bkt)
        .groupBy(id_col, lang_col, *carry_cols, "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
        # three consumers (raw counts, target counts, scoring join): pin
        .localCheckpoint(eager=True)
    )
    raw = hist.groupBy("bkt").agg(F.sum("c").alias("c_r"))
    tgt = (
        hist.filter(F.col(lang_col) == target_lang)
        .groupBy("bkt")
        .agg(F.sum("c").alias("c_t"))
    )
    n_r = raw.agg(F.sum("c_r").alias("n_r"))
    n_t = tgt.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("n_t"))
    b = float(n_buckets)
    lr = (
        raw.join(tgt, "bkt", "left")
        .crossJoin(F.broadcast(n_r))
        .crossJoin(F.broadcast(n_t))
        .select(
            "bkt",
            (
                F.log((F.coalesce("c_t", F.lit(0)) + F.lit(1.0)) / (F.col("n_t") + b))
                - F.log((F.col("c_r") + F.lit(1.0)) / (F.col("n_r") + b))
            ).alias("lr"),
        )
    )
    scored = (
        hist.filter(F.col(lang_col) != target_lang)
        .join(F.broadcast(lr), "bkt")
        .groupBy(id_col, lang_col, *carry_cols)
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            (F.sum(F.col("c") * F.col("lr")) / F.sum("c")).alias("__score"),
        )
    )
    u = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("double") / F.lit(4294967296.0)
    keyed = scored.withColumn("__key", F.col("__score") - F.log(-F.log(u)))
    top = keyed.orderBy(F.desc("__key"), id_col).limit(k)
    w = Window.orderBy(F.desc("__key"), id_col)  # k rows: single task is fine
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rnk"),
        id_col,
        lang_col,
        *carry_cols,
        "n_tokens",
        # + 0.0 canonicalizes IEEE negative zero (round can yield -0.0)
        (F.round("__score", round_to) + F.lit(0.0)).alias("dsir_logratio"),
    )
