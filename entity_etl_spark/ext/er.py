"""Entity resolution (record linkage): block -> score -> best-match.

The classic three-stage shape (Fellegi-Sunter lineage, every MDM/dedup
system): candidate pairs come from an EQUI-JOIN on blocking keys (never
all-pairs), each candidate scores with a cheap map-side comparator
(edit distance here; any similarity works), and each left record keeps
its best-scoring right match via a rank-1 window — which Spark compiles
to WindowGroupLimit, so a record with thousands of candidates carries
one row of window state.

At 100 TB the whole cost is governed by block sizes: Σ_b |L_b|·|R_b|
scored pairs. Oversized blocks are the skew knob — tighten the blocking
key or salt it; the dataflow does not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_entities(
    dirty: DataFrame,
    clean: DataFrame,
    *,
    block_cols: list[str],
    dirty_id: str,
    clean_id: str,
    dirty_name: str,
    clean_name: str,
    max_len_diff: int = 1,
    keep_unmatched: bool = True,
    max_block_size: int | None = None,
    observation=None,
) -> DataFrame:
    """Best clean match per dirty record: equi-join on ``block_cols``
    (+ a name-length band, a standard cheap filter that prunes most of
    each block before the comparator runs), levenshtein score, keep the
    rank-1 candidate per dirty id (ties: lower distance, then lower
    clean id — deterministic). Returns
    (dirty_id, matched_id, edit_dist).

    ``keep_unmatched`` (default True) left-joins the rank-1 matches back
    to the full dirty id set, so records with ZERO candidates (blocking
    key absent from clean, or length band pruned everything) surface as
    (dirty_id, NULL, NULL) rather than silently vanishing — accuracy
    reports over the output then count them as misses instead of
    inflating the denominator-free match rate. Pass False for the
    matched-only inner shape.

    ``max_block_size`` caps the CLEAN side's rows per blocking key
    before the join (ext.caps.cap_hot_groups, Observation-accounted):
    block cost is Σ_b |L_b|·|R_b|, so one degenerate clean block (an
    empty-string city, a default zip) multiplies against every dirty row
    sharing it. Dirty rows whose only candidates sat in a dropped block
    surface as unmatched, never silently — the same reporting path as
    zero-candidate blocking misses. Default None = exact."""
    from .caps import cap_hot_groups

    d = dirty.select(
        F.col(dirty_id).alias("__did"),
        F.col(dirty_name).alias("__dname"),
        *[F.col(c) for c in block_cols],
    )
    c = clean.select(
        F.col(clean_id).alias("__cid"),
        F.col(clean_name).alias("__cname"),
        *[F.col(c_) for c_ in block_cols],
    )
    c = cap_hot_groups(
        c,
        block_cols,
        max_block_size,
        observation=observation,
        dropped_metric="er_rows_in_dropped_blocks",
        max_metric="er_max_block_size",
        repartition=max_block_size is not None or observation is not None,
    )
    cand = d.join(c, block_cols).filter(
        F.abs(F.length("__dname") - F.length("__cname")) <= max_len_diff
    )
    scored = cand.withColumn(
        "__dist", F.levenshtein("__dname", "__cname")
    )
    w = Window.partitionBy("__did").orderBy("__dist", "__cid")
    best = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("__did").alias(dirty_id),
            F.col("__cid").alias("matched_id"),
            F.col("__dist").cast("int").alias("edit_dist"),
        )
    )
    if not keep_unmatched:
        return best
    # Left-join back so zero-candidate records appear with NULL match.
    # The right side is rank-1-per-did (<= |dirty| rows), so this join
    # shuffles on the same did key the window already used — no new
    # skew surface, and AQE can plan it alongside the window exchange.
    return dirty.select(F.col(dirty_id)).join(best, dirty_id, "left")
