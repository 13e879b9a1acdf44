"""End-to-end training-data preparation: the extension operators composed
into one declarative pipeline (the document-side analogue of
``pipeline.run_incremental``'s entity flow).

Stages — each one an already-oracle-verified operator, chained lazily so
Catalyst fuses them (clean + featurize + filter are ONE map stage; the
dedup is the only shuffle; the split is map-only again):

1. normalize text (:func:`ext.text.clean_text`)
2. quality gate (:func:`ext.text.quality_features` thresholds)
3. exact dedup, keep min id (fingerprint winners semi-join)
4. leakage-safe split hashed on the group column
   (:func:`ext.sampling.grouped_split`)

Output: the surviving corpus with ``n_tokens`` and ``split`` attached —
ready for :func:`ext.packing.pack_sequences` / shard writing.

At 100 TB this chain materializes exactly ONE intermediate — the
featurized corpus, checkpointed between the feature projection and the
quality gate (r11): a pushed-down gate re-evaluates the whole
clean+count expression tree inside FilterExec, which applies no
subexpression elimination (measured 8x the one-pass cost), and the
gated corpus has two more consumers (fingerprint branch, survivor
semi-join) that each re-ran the clean+feature scan. One executor-local
write plus cache reads replaces three scans carrying ~8x-duplicated
expression work; the only exchange still carries (fp, id) pairs and
the survivors still semi-join back broadcast. The near-dup pass
(MinHash) and the LM perplexity gate slot between stages 3 and 4 when
their cost is warranted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import fingerprint
from .sampling import grouped_split
from .text import clean_text, quality_features


def prepare_training_data(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_tokens: int = 20,
    min_quality: float = 0.15,
    classifier_threshold: float | None = None,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    per_source_cap: int | None = None,
    shuffle_seed: str | None = None,
) -> DataFrame:
    """Clean → gate → dedup → [cap] → split → [shuffle]. Returns the kept
    rows with the cleaned text, quality features, and a ``split`` column.

    ``classifier_threshold`` adds the third public quality gate (the
    DCLM/fastText-pattern linear classifier, ext/classifier.py) on top of
    the heuristic features and the perplexity-style score: docs below
    P(high quality) = threshold drop. Still one map-only predicate in the
    same scan — no extra pass.

    ``per_source_cap`` bounds any one source/domain to its top-K docs by
    quality_score (the anti-domination mixture step) — a rank<=K window
    Spark truncates map-side via WindowGroupLimit.

    ``shuffle_seed`` appends a ``shuffle_rank`` column — the reproducible
    global training permutation (operators.distributed_shuffle_rank; no
    single-reducer global sort)."""
    cleaned = docs.withColumn(text_col, clean_text(text_col))
    # checkpoint BETWEEN the feature projection and the gate: pushing
    # the gate's predicate into the feature expressions re-evaluates
    # the whole clean+count tree inside FilterExec, which (unlike
    # ProjectExec) applies no subexpression elimination — measured 8x
    # the one-pass cost at sf1 (16.4 s vs 2.0 s for 50k docs). The
    # barrier computes features exactly once; it also serves the two
    # downstream consumers (fingerprint branch + survivor semi-join)
    # that previously re-ran the clean+feature scan each.
    gated = (
        quality_features(cleaned, text_col)
        .localCheckpoint(eager=True)
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("quality_score") >= min_quality)
        )
    )
    if classifier_threshold is not None:
        from .classifier import quality_score

        gated = gated.filter(
            quality_score(F.col(text_col)) >= classifier_threshold
        )
    slim = gated.select(
        F.col(id_col).alias("__id"), fingerprint(text_col).alias("__fp")
    )
    winners = slim.groupBy("__fp").agg(F.min("__id").alias("__id"))
    deduped = gated.join(
        winners.select("__id"), gated[id_col] == winners["__id"], "left_semi"
    )
    if per_source_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(
            F.desc("quality_score"), id_col
        )
        deduped = (
            deduped.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= per_source_cap)
            .drop("__rk")
        )
    out = grouped_split(
        deduped,
        group_col,
        val_fraction=val_fraction,
        test_fraction=test_fraction,
    )
    if shuffle_seed is not None:
        from ..operators import distributed_shuffle_rank

        out = distributed_shuffle_rank(out, id_col, seed=shuffle_seed)
    return out


def run_streaming_prep(
    spark,
    stream: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_tokens: int = 20,
    min_quality: float = 0.15,
    timeout_sec: float = 120.0,
) -> None:
    """Continuous training-data ingest: the prep pipeline as a Structured
    Streaming job over any streaming docs source (files landing in a
    bucket, Kafka, the rest_entities DataSource).

    Per micro-batch (foreachBatch): clean → quality gate → incremental
    exact dedup against the PERSISTENT fingerprint state (so a document
    seen in ANY earlier batch never re-enters the corpus — cross-batch,
    not just in-batch) → leakage-safe split → append surviving rows
    partitioned by split. Source offsets (the checkpoint dir) make re-reads
    impossible; the fingerprint state makes re-sends harmless — the same
    two-layer idempotence as pipeline.run_streaming.

    State is a one-column parquet (``fp``) swapped atomically per batch via
    a generation dir, like state.save_state — at scale, a bucketed-by-fp
    table (sinks.write_bucketed) keeps the anti-join shuffle-free.
    """
    from ..state import append_state, load_state
    from ..streaming import (
        planned_batch_rows,
        run_available_now,
        spread_batch,
    )
    from .dedup import exact_dedup_incremental

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = planned_batch_rows(checkpoint_dir, batch_id)
        if rows == 0 or (rows is None and batch_df.isEmpty()):
            return
        # a micro-batch often arrives as ONE input partition (one landed
        # file / one page); fan out before the per-doc heavy work or all
        # cores but one sit idle — width scaled to the batch's size
        batch_df = spread_batch(spark, batch_df, rows)
        cleaned = batch_df.withColumn(text_col, clean_text(text_col))
        # pinned: the gated batch has several downstream consumers
        # (fingerprints, body semi-join, split+write) — without the
        # barrier each re-runs the clean + quality-feature scan
        gated = (
            quality_features(cleaned, text_col)
            # barrier BELOW the gate: FilterExec applies no
            # subexpression elimination, so a pushed-down gate
            # re-evaluates the whole feature tree ~8x (see
            # prepare_training_data); the ckpt was already here for
            # the multi-consumer pin and now also pays the features
            # exactly once
            .localCheckpoint(eager=True)
            .filter(
                (F.col("n_tokens") >= min_tokens)
                & (F.col("quality_score") >= min_quality)
            )
        )
        seen = load_state(spark, state_dir, "doc_fps")
        kept, new_fps = exact_dedup_incremental(
            seen, gated, id_col=id_col, text_col=text_col, new_fps_only=True
        )
        out = grouped_split(kept, group_col)
        out.write.mode("append").partitionBy("split").parquet(out_dir)
        # state grows by O(batch), never rewriting the accumulated table
        append_state(new_fps, state_dir, "doc_fps")

    run_available_now(stream, checkpoint_dir, process, timeout_sec=timeout_sec)


def run_streaming_neardup_prep(
    spark,
    stream: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_tokens: int = 20,
    min_quality: float = 0.15,
    verify_threshold: float = 0.5,
    method: str = "exact",
    timeout_sec: float = 120.0,
) -> None:
    """Continuous ingest with NEAR-dup suppression: like
    :func:`run_streaming_prep` but the persistent state carries document
    CONTENT structure, so a paraphrased/near-duplicate re-send of any
    earlier document is dropped, not just byte-identical ones.

    Per micro-batch: clean → quality gate → incremental near-dup dedup
    against the persistent state → leakage-safe split → append. Same
    two-layer idempotence as run_streaming_prep (source offsets +
    content state).

    ``method='exact'`` (default): state = the corpus shingle inverted
    index (:func:`...dedup.exact_neardup_dedup_incremental`) — the drop
    decision uses the exact pair set at any scale, and the corpus
    contributes only a columnar (doc, sh) state scan per batch (document
    bodies are never re-read). ``method='minhash'``: state = MinHash
    signatures (:func:`...dedup.minhash_dedup_incremental` — signatures
    map-side, LSH band join, bodies fetched candidate-only from the
    written output) — smaller state and cheaper joins at a measured
    recall trade near the threshold. Both grow state by exactly the
    survivors' rows (append, never rewrite)."""
    from ..state import append_state, load_state
    from ..streaming import (
        planned_batch_rows,
        run_available_now,
        spread_batch,
    )
    from .dedup import exact_neardup_dedup_incremental, minhash_dedup_incremental

    if method not in ("exact", "minhash"):
        raise ValueError(f"unknown near-dup method: {method!r}")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = planned_batch_rows(checkpoint_dir, batch_id)
        if rows == 0 or (rows is None and batch_df.isEmpty()):
            return
        # one landed file = one input partition; fan out before the
        # per-doc heavy work (clean/quality/signature fold) — width
        # scaled to the batch's size
        batch_df = spread_batch(spark, batch_df, rows)
        cleaned = batch_df.withColumn(text_col, clean_text(text_col))
        # pinned: consumed by the shingle/signature fold, the verify body
        # union, and the kept anti-join — one clean+quality scan, not three
        gated = (
            quality_features(cleaned, text_col)
            # barrier BELOW the gate: FilterExec applies no
            # subexpression elimination, so a pushed-down gate
            # re-evaluates the whole feature tree ~8x (see
            # prepare_training_data); the ckpt was already here for
            # the multi-consumer pin and now also pays the features
            # exactly once
            .localCheckpoint(eager=True)
            .filter(
                (F.col("n_tokens") >= min_tokens)
                & (F.col("quality_score") >= min_quality)
            )
        )
        if method == "exact":
            state = load_state(spark, state_dir, "doc_shingles")
            sizes = load_state(spark, state_dir, "doc_sizes")
            # two-table layout (r12): narrow (doc, sh) shingle rows plus
            # a tiny (doc, n) sizes table, so the per-batch pair join
            # stays narrow and its aggregation keeps one count buffer. A
            # fresh dir starts two-table; a dir that already holds a
            # single-table state but no sizes table KEEPS the
            # single-table layout (appending narrow rows would leave
            # NULL-n rows the sizes table doesn't cover) — migrate old
            # dirs offline if the narrow layout matters.
            two_table = state is None or sizes is not None
            empty = spark.createDataFrame(
                [], f"{id_col} long, {text_col} string"
            )
            kept, new_sh = exact_neardup_dedup_incremental(
                empty,
                gated,
                id_col=id_col,
                text_col=text_col,
                corpus_shingles=state,
                corpus_sizes=sizes if state is not None else None,
                threshold=verify_threshold,
                new_shingles_only=True,
            )
            out = grouped_split(kept, group_col)
            out.write.mode("append").partitionBy("split").parquet(out_dir)
            # append exactly the survivors' rows: O(batch) state growth
            if two_table:
                append_state(
                    new_sh.select("doc", "sh"), state_dir, "doc_shingles"
                )
                # one (doc, n) row per survivor, deduped from the delta
                # rows (which read pinned shingle blocks — recomputing
                # sizes from text here would re-shingle the batch)
                append_state(
                    new_sh.select("doc", "n").dropDuplicates(["doc"]),
                    state_dir,
                    "doc_sizes",
                )
            else:
                append_state(new_sh, state_dir, "doc_shingles")
            return
        sigs = load_state(spark, state_dir, "doc_sigs")
        try:
            corpus = spark.read.parquet(out_dir).select(id_col, text_col)
        except Exception:  # first batch: nothing written yet
            corpus = spark.createDataFrame(
                [], f"{id_col} long, {text_col} string"
            )
        kept, new_sigs = minhash_dedup_incremental(
            corpus,
            gated,
            id_col=id_col,
            text_col=text_col,
            corpus_sigs=sigs,
            verify_threshold=verify_threshold,
            new_sigs_only=True,
        )
        out = grouped_split(kept, group_col)
        out.write.mode("append").partitionBy("split").parquet(out_dir)
        # append exactly the survivors' signatures: O(batch) state
        # growth, never an O(corpus) rewrite of the signature table
        append_state(new_sigs, state_dir, "doc_sigs")

    run_available_now(stream, checkpoint_dir, process, timeout_sec=timeout_sec)
