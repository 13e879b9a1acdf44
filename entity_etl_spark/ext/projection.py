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
from functools import reduce

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
    """Left-associative double fold of +-vec[i], i ascending:
    (((t0+t1)+t2)+...). float -> double is exact and the fold ORDER is
    pinned syntactically, so any engine folding the same order (DuckDB:
    ``reduce(list, (x,y) -> x+y)``) produces the bit-identical double.
    DECIMAL partials were tried and rejected: Spark quantizes
    double -> decimal(38,10) by correctly rounding the exact binary
    expansion (BigDecimal), DuckDB by double arithmetic — off-by-1-ulp
    partials that cross the final 1e-6 floor boundary."""
    terms = []
    for i, s in enumerate(signs):
        t = F.element_at(vec, i + 1).cast("double")
        terms.append(t if s > 0 else -t)
    return reduce(lambda a, b: a + b, terms)


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
    scale = 1.0 / (out_dim**0.5)
    if scale != 2.0 ** round(math.log2(scale)):
        raise ValueError(
            f"out_dim={out_dim}: 1/sqrt(out_dim) must be a power of two "
            "(use out_dim in 4, 16, 64, 256)"
        )
    mat = signed_projection_matrix(seed, out_dim, in_dim)
    rows = [
        F.struct(
            F.lit(j).cast("int").alias("dim"),
            (
                F.floor(
                    _signed_sum(F.col(vec_col), mat[j]).cast("double")
                    * F.lit(scale)
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("value"),
        )
        for j in range(out_dim)
    ]
    return df.select(
        F.col(id_col), F.explode(F.array(*rows)).alias("__p")
    ).select(id_col, F.col("__p.dim").alias("dim"), F.col("__p.value").alias("value"))
