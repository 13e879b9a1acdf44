"""Iterative graph operators over DataFrames.

Near-dup pairs (ext.dedup) form a graph; corpus dedup wants one
representative per CONNECTED COMPONENT, not per pair (A~B, B~C must
collapse A,B,C together even when A~C was never emitted). Spark has no
built-in iterative fixpoint, so :func:`connected_components` drives one
from the scheduler side: min-label propagation, each iteration one
join + aggregate, lineage cut via localCheckpoint so the plan does not
grow with iterations.

Converges in O(diameter) iterations — near-dup graphs are unions of small
cliques (diameter ≤ 2-3), so the loop runs 2-4 times in practice; a
``max_iter`` bound guards pathological chains."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pin(df: DataFrame, checkpoint_dir: str | None, name: str) -> DataFrame:
    """Cut lineage: localCheckpoint locally, parquet swap on a cluster.

    localCheckpoint stores blocks on executors — an executor lost during
    iteration k loses blocks and fails the job. With ``checkpoint_dir``
    the frame is written to reliable storage and read back instead (the
    same recovery posture as dedup.materialize_signatures(path)); each
    pin gets its own subdirectory because overwriting a path that the
    next iteration's plan still reads from is undefined. Label/edge
    tables are slim (two longs per row), so the dir stays small; callers
    pass a temp dir they own and clean."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    import os

    path = os.path.join(checkpoint_dir, name)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    *,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``edges`` is undirected input (one row per pair, either orientation).
    Each iteration: every node adopts the min label among itself and its
    neighbors; stop when no label changed. Labels and the symmetrized edge
    list are both small relative to a corpus (nodes appearing in any pair),
    so each iteration is one shuffle on node id.

    ``checkpoint_dir``: reliable-storage pinning for cluster runs — each
    iteration's labels are parquet-swapped instead of localCheckpoint'd,
    so losing an executor mid-iteration cannot lose label blocks (see
    :func:`_pin`). Local default stays executor-memory checkpoints."""
    sym = _pin(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct(),
        checkpoint_dir,
        "cc_edges",
    )
    labels = _pin(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node")),
        checkpoint_dir,
        "cc_labels_init",
    )
    for it in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy(F.col("u").alias("node2"))
            .agg(F.min("comp").alias("n_comp"))
        )
        new_labels = _pin(
            labels.join(neighbor_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))
                ).alias("comp"),
            ),
            checkpoint_dir,
            # alternate two label dirs: iteration k's plan reads k-1's
            # files, so k must never overwrite them mid-write
            f"cc_labels_{it % 2}",
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # loop exhausted max_iter with labels still moving: the result is
        # truncated (a component wider than max_iter hops would be split) —
        # surface it instead of returning silently-wrong groups
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} "
            "iterations; labels are truncated — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("node", "comp")


def keep_best_per_group(
    grouped: DataFrame,
    *,
    group_col: str = "group_rep",
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Flag each group's winner (max ``score_col``, min ``id_col``
    tie-break): (id_col, group_col, kept boolean) — the canonical-
    selection reduction that turns near-dup groups into keep/drop.

    Deliberately NOT a row_number window: the kept flag is needed on
    EVERY row, so WindowGroupLimit cannot prune, and a pathological
    mega-group (an all-identical corpus collapses into one component)
    would funnel through a single sort task. ``min_by`` over
    (-score, id) is a hash aggregate instead — partial aggregation
    collapses each partition's slice of the mega-group to ONE row before
    the shuffle, so per-task work is bounded by partition size, not
    group size; the winner table (one row per group) then joins back
    broadcast-or-bucketed on the group key."""
    winners = grouped.groupBy(group_col).agg(
        F.min_by(
            id_col,
            F.struct(
                (-F.col(score_col)).alias("s"), F.col(id_col).alias("i")
            ),
        ).alias("__winner")
    )
    return (
        grouped.join(winners, group_col)
        .select(
            id_col,
            group_col,
            (F.col(id_col) == F.col("__winner")).alias("kept"),
        )
    )


def within_group_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    item_a: str = "item_a",
    item_b: str = "item_b",
    max_group_size: int | None = None,
    observation=None,
    dropped_metric: str = "pairs_rows_in_dropped_groups",
    max_metric: str = "pairs_max_group_size",
) -> DataFrame:
    """Unordered within-group item pairs: (group_col, item_a < item_b).

    The shared kernel of every basket-shaped pair explode — co-purchase
    edges (items per order), item-item co-occurrence (items per
    customer), event-type co-occurrence (types per user), shingle
    doc-pairs (docs per shingle). Fan-out is Σ_g C(|g|, 2), so one whale
    group (a 10k-line order, a stop-shingle) dominates a single task's
    explode; ``max_group_size`` routes through
    :func:`entity_etl_spark.ext.caps.cap_hot_groups` to drop over-full
    groups BEFORE the self-join with Observation accounting — the same
    contract as the LSH bucket caps. Default None = exact (registry
    parity); the self-join reuses the cap's group-keyed exchange."""
    from .caps import cap_hot_groups

    capped = cap_hot_groups(
        df,
        [group_col],
        max_group_size,
        observation=observation,
        dropped_metric=dropped_metric,
        max_metric=max_metric,
    )
    a = capped.select(
        F.col(group_col).alias("__wg"), F.col(item_col).alias(item_a)
    )
    b = capped.select(
        F.col(group_col).alias("__wg2"), F.col(item_col).alias(item_b)
    )
    return (
        a.join(
            b,
            (F.col("__wg") == F.col("__wg2"))
            & (F.col(item_a) < F.col(item_b)),
        )
        .select(F.col("__wg").alias(group_col), item_a, item_b)
    )


def near_dup_groups(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """(doc, group_rep) for every doc in a near-dup pair: the transitive
    closure of pairwise similarity, each group labeled by its min doc id —
    the correct reduction for corpus dedup (keep one rep per GROUP)."""
    return connected_components(pairs, src, dst).select(
        F.col("node").alias("doc"), F.col("comp").alias("group_rep")
    )
