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


def vector_norms_arrow(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-vector L2 norms through ``mapInArrow`` — the LOWEST-overhead
    Python boundary Spark offers: RecordBatches cross as raw Arrow (no
    pandas object materialization, unlike mapInPandas), and the list
    column's values buffer is reshaped zero-copy into an (n, dim) numpy
    matrix for one vectorized BLAS reduction per batch.

    The JVM higher-order-function form (ext/similarity.norm) is still
    the default — this is the seam to reach for when per-vector math
    outgrows SQL expressions (the oracle pins both forms equal). Math is
    float64 (cast up from the stored float32) to match the DuckDB
    DOUBLE[] oracle digit-for-digit after rounding.
    """
    import pyarrow as pa

    out_schema = f"{id_col} long, norm double"

    def batches(it):
        import math

        import numpy as np

        for batch in it:
            ids = batch.column(id_col)
            vecs = batch.column(vec_col)
            if isinstance(vecs, pa.ChunkedArray):  # pragma: no cover
                vecs = vecs.combine_chunks()
            offsets = vecs.offsets.to_numpy(zero_copy_only=False)
            lens = np.diff(offsets)
            vals = vecs.values.to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            if len(lens) and (lens == lens[0]).all() and lens[0] > 0:
                # uniform dim: zero-copy reshape + one vectorized reduction
                norms = np.sqrt(
                    (vals[offsets[0]: offsets[-1]]
                     .reshape(-1, lens[0]) ** 2).sum(axis=1)
                )
            else:  # ragged fallback: per-slice reduction
                norms = np.array(
                    [
                        math.sqrt(float((vals[s:e] ** 2).sum()))
                        for s, e in zip(offsets[:-1], offsets[1:])
                    ]
                )
            # NULL vector rows have a zero-length slot (norm would come
            # out 0.0); read the validity bitmap and emit NULL instead,
            # matching the JVM higher-order form and the DuckDB oracle.
            null_mask = (
                vecs.is_null().to_numpy(zero_copy_only=False)
                if vecs.null_count
                else None
            )
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(
                        np.round(norms, round_to),
                        pa.float64(),
                        mask=null_mask,
                    ),
                ],
                names=[id_col, "norm"],
            )

    return df.select(id_col, vec_col).mapInArrow(batches, out_schema)
