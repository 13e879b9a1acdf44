"""Random projection (Johnson-Lindenstrauss) for embedding columns.

The standard pre-ANN dimensionality reduction: project d-dim vectors onto
``out_dim`` signed sums (Achlioptas, "Database-friendly random
projections": m[j][i] in {+1, -1} preserves pairwise distances in
expectation with variance O(1/out_dim); no dense Gaussian needed). At
100 TB this is a narrow MAP-SIDE transform — column-pruned scan, zero
shuffle, whole-stage codegen (the matrix is a driver-side constant folded
into the expressions) — that cuts every downstream ANN/LSH/cluster
shuffle byte count by d/out_dim.

Determinism contract: the sign matrix derives from md5 over
``"rp{seed}_{j}_{i}"`` — the portable cross-engine recipe (hashlib here,
``md5()`` in the DuckDB oracle; first hex digit < '8' means +1). The fold
is a left-associative double chain in a PINNED syntactic order on both
engines (unlike a SQL GROUP-BY sum, whose order is uncontrollable) and
quantizes via ``floor(x*1e6 + 0.5)/1e6`` — bit-identical on any engine
holding the same double.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def signed_projection_matrix(
    seed: int, out_dim: int, in_dim: int
) -> list[list[int]]:
    """out_dim x in_dim matrix of +-1, deterministic in (seed, j, i).

    m[j][i] = +1 iff the first hex digit of md5("rp{seed}_{j}_{i}") is
    0-7 — reproducible from SQL (DuckDB md5), Python (hashlib), or any
    engine with an md5 builtin, so oracle and engine build the SAME
    matrix independently."""
    return [
        [
            1
            if hashlib.md5(f"rp{seed}_{j}_{i}".encode()).hexdigest()[0] < "8"
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def _signed_sum(vec: Column, signs: list[int]) -> Column:
    """Left-associative double fold of +-vec[i], i ascending, as a
    higher-order ``aggregate(zip_with(...))`` loop. Three properties make
    it cross-engine bit-identical: float -> double is exact, multiplying
    by the +-1.0 literal is exact, and the fold ORDER is pinned (DuckDB's
    ``reduce(list, (x,y) -> x+y)`` folds the same order; the 0.0 init
    only differs on a -0.0 leading term, which the final floor
    quantization collapses anyway).

    Two rejected alternatives, for the record: DECIMAL(38,10) partials
    (Spark quantizes double -> decimal by correctly rounding the exact
    binary expansion, DuckDB via double arithmetic — off-by-1-ulp
    partials cross the final 1e-6 floor boundary), and an unrolled
    64-term Add chain (64 terms x 16 output dims in one Generate consume
    method exceeds the JVM's 64KB method limit — whole-stage codegen
    fails to compile and the operator silently drops to interpreted
    eval; the higher-order fold is a tight generated loop instead)."""
    signs_lit = F.array(*[F.lit(float(s)) for s in signs])
    return F.aggregate(
        F.zip_with(vec, signs_lit, lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def random_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Project ``vec_col`` to ``out_dim`` dims; LONG output
    ``(id, dim, value)`` — one row per output coordinate, the
    join-friendly shape for feeding LSH/IVF over the reduced space.

    value = floor(sum_i m[j][i]*vec[i] / sqrt(out_dim) * 1e6 + 0.5)/1e6.
    ``out_dim`` must be a power of 4 (default 16) so 1/sqrt(out_dim) is a
    power of two — scaling the fold result is then an EXACT double
    multiply, keeping the whole pipeline a sequence of operations every
    IEEE-754 engine computes bit-identically (see :func:`_signed_sum`
    for why decimal partials were rejected)."""
    rows = [
        F.struct(
            F.lit(j).cast("int").alias("dim"),
            v.alias("value"),
        )
        for j, v in enumerate(
            _project_values(vec_col, in_dim, out_dim, seed)
        )
    ]
    return df.select(
        F.col(id_col), F.explode(F.array(*rows)).alias("__p")
    ).select(id_col, F.col("__p.dim").alias("dim"), F.col("__p.value").alias("value"))


def _project_values(
    vec_col: str, in_dim: int, out_dim: int, seed: int
) -> list[Column]:
    scale = 1.0 / (out_dim**0.5)
    if scale != 2.0 ** round(math.log2(scale)):
        raise ValueError(
            f"out_dim={out_dim}: 1/sqrt(out_dim) must be a power of two "
            "(use out_dim in 4, 16, 64, 256)"
        )
    mat = signed_projection_matrix(seed, out_dim, in_dim)
    return [
        F.floor(
            _signed_sum(F.col(vec_col), mat[j]).cast("double")
            * F.lit(scale)
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
        for j in range(out_dim)
    ]


def random_project_vec(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 7,
) -> DataFrame:
    """:func:`random_project` in WIDE form: ``(id, proj array<double>)``
    — same values, one row per input vector (the shape for pairwise
    distance math and for re-feeding the reduced vectors to the ANN
    operators)."""
    return df.select(
        F.col(id_col),
        F.array(*_project_values(vec_col, in_dim, out_dim, seed)).alias(
            "proj"
        ),
    )


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 5,
    in_dim: int = 64,
    n_bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k through the projected space: signed-random-projection
    LSH (Charikar SRP — two vectors agree on bit b with probability
    1 - angle/pi) where the hyperplanes ARE the first ``n_bits`` rows of
    the JL sign matrix, so the whole index derives from the same
    deterministic md5 matrix as :func:`random_project`.

    Shape: one map-side projection per side (zero shuffle), bucket =
    the n_bits sign bits packed into a long; queries multi-probe the
    exact bucket plus all Hamming-1 neighbors (n_bits+1 probes — the
    standard recall knob); candidates join on the bucket long, dedupe,
    and rerank EXACTLY in the original space (cosine over the full
    vectors, top-k window). Candidate volume ~ (n_bits+1) * n/2^n_bits
    per query — at 100 TB raise n_bits so buckets stay ~constant-sized
    and the rerank join carries (bucket, id) longs, never vectors,
    until the final candidate fetch.

    Exactness contract: DETERMINISTIC (no floats in the bucketing — the
    projection is floor-quantized) but approximate; recall is measured
    by the ``embedding_rp_ann_topk`` gate, never assumed."""
    from .similarity import cosine

    def buckets(df: DataFrame) -> DataFrame:
        proj = random_project(
            df, id_col, vec_col, in_dim=in_dim, out_dim=16, seed=seed
        ).filter(F.col("dim") < n_bits)
        return proj.groupBy(id_col).agg(
            F.sum(
                F.when(
                    F.col("value") >= 0, F.expr("shiftleft(1L, dim)")
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("__bucket")
        )

    cb = buckets(corpus)
    qb = buckets(queries)
    probes = qb.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.array(
                F.col("__bucket"),
                *[
                    F.col("__bucket").bitwiseXOR(F.lit(1 << b))
                    for b in range(n_bits)
                ],
            )
        ).alias("__bucket"),
    )
    cand = (
        probes.join(cb.select(F.col(id_col).alias("neighbor_id"), "__bucket"),
                    "__bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("neighbor_id")
    )
    return (
        cand.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn("score", F.round(cosine(F.col("__cv"), F.col("__qv")), 6))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )
