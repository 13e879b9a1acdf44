"""Embedding/feature preprocessing (E3 support): distributed column-wise
statistics over array<float> columns and in-place re-assembly.

The training-data shape: embeddings arrive as an opaque ``array<double>``
column; downstream ANN / clustering wants them standardized (zero mean,
unit variance per dimension). Doing that distributed means (a) one
aggregation producing dim-wise stats — tiny, O(dim) rows — and (b) a
map-only rewrite of every vector against the broadcast stats. No Python in
either step: posexplode is codegen, the re-assembly is a higher-order
``transform`` against a broadcast single-row struct array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_stats(
    emb: DataFrame, *, vec_col: str = "embedding"
) -> DataFrame:
    """(dim, mu, sigma) — population mean/stddev per vector dimension.
    One shuffle keyed by dim (<= a few thousand groups, partial-aggregated
    map-side after the posexplode)."""
    return (
        emb.select(F.posexplode(vec_col).alias("dim", "__x"))
        .groupBy("dim")
        .agg(
            F.avg("__x").alias("mu"),
            F.stddev_pop("__x").alias("sigma"),
        )
    )


def standardize(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Add ``out_col`` = the per-dimension z-scored vector. ``stats`` lets a
    training-set fit transform a val/test set (the leakage-correct mode);
    default fits on ``emb`` itself.

    The stats table collapses to ONE broadcast row (a dim-sorted struct
    array), and the rewrite is ``transform(vec, (x, i) -> (x - mu[i]) /
    sigma[i])`` — map-only, codegen, any corpus size. Zero-variance dims
    pass through centered (sigma coalesced to 1)."""
    out_col = out_col or f"{vec_col}_std"
    stats = dim_stats(emb, vec_col=vec_col) if stats is None else stats
    packed = stats.agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "mu", "sigma"))
        ).alias("__stats")
    )
    return (
        emb.crossJoin(F.broadcast(packed))
        .withColumn(
            out_col,
            F.expr(
                f"transform({vec_col}, (x, i) -> "
                "(x - __stats[i].mu) / coalesce(nullif(__stats[i].sigma, 0.0), 1.0))"
            ),
        )
        .drop("__stats")
    )
