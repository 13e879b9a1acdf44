"""Similarity search over embedding columns (E3, SURVEY §2.3).

- :func:`cosine` — dot/norm entirely in built-in higher-order functions
  (zip_with + aggregate): JVM-side, codegen'd, no Python.
- :func:`topk_brute_force` — exact top-k neighbors for a (small) query set:
  broadcast the queries, score every corpus row, row_number ≤ k. One pass
  over the corpus, no shuffle of the corpus itself — the 100 TB baseline.
- :func:`lsh_topk` — random-hyperplane LSH variant: queries and corpus are
  bucketed by sign-pattern; only same-bucket rows are scored. Sub-linear
  scoring at the cost of recall (multi-probe over neighboring buckets can
  recover it). The hyperplanes derive deterministically from xxhash64 so
  both sides bucket identically with no shared state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _f64(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (cast to double
    element-wise first — float math would diverge between engines)."""
    fa, fb = _f64(a), _f64(b)
    return dot(fa, fb) / (norm(fa) * norm(fb))


def topk_brute_force(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` is broadcast (a query batch is small by construction); the
    corpus streams through map-side scoring; the only shuffle is the
    per-query top-k window over |queries|·|corpus| scored rows — at scale
    replace the window with a per-partition heap (mapInPandas) feeding a
    final window over partitions·k rows.

    Both sides are unit-normalized ONCE per row before the cross join, so
    the per-pair work is a single dot product (zip_with + aggregate) instead
    of dot + two norms + two casts — higher-order array functions are
    interpreted per element, so trimming per-pair expressions is a ~3× win
    on the |Q|·|C| hot path."""
    from pyspark.sql import Window

    def unit(df, id_alias):
        return (
            df.withColumn("__v", _f64(F.col(vec_col)))
            .withColumn("__n", norm(F.col("__v")))
            .select(
                F.col(id_col).alias(id_alias),
                F.transform(F.col("__v"), lambda x: x / F.col("__n")).alias(
                    f"__{id_alias}_vec"
                ),
            )
        )

    q = unit(queries, "query_id")
    scored = unit(corpus, "neighbor_id").crossJoin(F.broadcast(q))
    scored = scored.filter(F.col("neighbor_id") != F.col("query_id")).withColumn(
        "score",
        F.round(dot(F.col("__neighbor_id_vec"), F.col("__query_id_vec")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def _hyperplane(dim: int, plane_idx: int, plane_fn: str = "xxhash64") -> Column:
    """Deterministic pseudo-random hyperplane: component j of plane i is a
    zero-mean value derived from a hash of (i, j). No driver-side RNG state —
    executors regenerate it identically (closure captures only ints).

    ``plane_fn="md5"``: the repo's portable cross-engine recipe —
    component = md5-prefix-int('i_j') / 2^31 - 1 (exactly representable,
    so an ANSI oracle regenerates the planes bit-for-bit); paired with
    round-9 dot quantization in the callers so sign/margin decisions
    agree across engines. xxhash64 (default) is cheaper JVM-side."""
    if plane_fn == "md5":
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_", F.lit(str(plane_idx)), j.cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .cast("double")
            / F.lit(2147483648.0)
            - F.lit(1.0),
        )
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.xxhash64(F.lit(plane_idx), j).cast("double") / F.lit(float(2**63))
        ),
    )


def _plane_dot(v: Column, dim: int, i: int, plane_fn: str) -> Column:
    """Query/corpus-side plane projection; portable mode quantizes to 9
    decimals so downstream sign/margin decisions are engine-stable."""
    d = dot(v, _hyperplane(dim, i, plane_fn))
    return F.round(d, 9) if plane_fn == "md5" else d


def lsh_bucket(
    vec_col: Column, dim: int, n_planes: int = 8, plane_fn: str = "xxhash64"
) -> Column:
    """Sign-pattern bucket id (0..2^n_planes-1) of a vector under the
    deterministic hyperplane family."""
    v = _f64(vec_col)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        bit = (
            F.when(_plane_dot(v, dim, i, plane_fn) >= 0, 1)
            .otherwise(0)
            .cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def lsh_margin_probe_buckets(
    vec_col: Column,
    dim: int,
    n_planes: int,
    n_probe: int,
    plane_fn: str = "xxhash64",
) -> Column:
    """Margin-aware multi-probe bucket list (array<long>).

    The plane dots are computed once; the bucket is the sign pattern, and
    the extra probes flip the planes with the SMALLEST |dot| — the query's
    least-confident bits, where a true neighbor most plausibly landed on the
    other side. Strictly better probe placement than flipping fixed plane
    positions, at identical cost (same number of probed buckets). All
    column-level: array of (|dot|, idx) structs → array_sort → slice →
    XOR."""
    dots = F.array(
        *[
            _plane_dot(_f64(vec_col), dim, i, plane_fn)
            for i in range(n_planes)
        ]
    )
    base = F.aggregate(
        F.zip_with(
            dots,
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            # F.shiftleft's python wrapper takes only int bit counts;
            # call_function reaches the SQL form with a column bit count
            lambda d, i: F.when(
                d >= 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    # (margin, idx) sorted ascending by margin → least-confident planes first
    ranked = F.array_sort(
        F.zip_with(
            dots,
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("idx")),
        )
    )
    flips = F.transform(
        F.slice(ranked, 1, max(0, min(n_probe - 1, n_planes))),
        lambda s: base.bitwiseXOR(
            F.call_function("shiftleft", F.lit(1).cast("long"), s["idx"])
        ),
    )
    return F.array_distinct(F.concat(F.array(base), flips))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 6,
    n_probe: int = 1,
    probe: str = "margin",
    max_bucket_size: int | None = None,
    observation=None,
    plane_fn: str = "xxhash64",
) -> DataFrame:
    """Approximate top-k: score only corpus rows sharing the query's
    hyperplane bucket. Equi-join on the bucket key replaces the cross join —
    the scored set shrinks ~2^n_planes-fold.

    ``n_probe`` > 1 enables multi-probe: each query additionally searches
    (n_probe - 1) buckets at Hamming distance 1 — recall recovery without
    growing the index (queries explode n_probe-fold; the corpus side is
    untouched). ``probe="margin"`` flips the query's least-confident planes
    (smallest |dot|, cf. multi-probe LSH literature); ``probe="fixed"``
    flips plane positions 0..n_probe-2 (the baseline the unit test compares
    against).

    ``max_bucket_size`` caps the CORPUS side of a hot bucket (a dense
    embedding cluster puts B rows behind one sign pattern; every query
    probing it then scores B rows): oversized buckets are dropped before
    the join, with dropped-row accounting on ``observation``
    (``lshtopk_rows_in_dropped_buckets`` / ``lshtopk_max_bucket_size``) —
    same hot-bucket contract as ``dedup.lsh_candidate_pairs``. Queries
    landing only in dropped buckets return fewer than k rows; raise
    ``n_probe`` to recover."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        lsh_bucket(F.col(vec_col), dim, n_planes, plane_fn).alias(
            "__bucket"
        ),
    )
    from .caps import cap_hot_groups

    c = cap_hot_groups(
        c,
        ["__bucket"],
        max_bucket_size,
        observation=observation,
        dropped_metric="lshtopk_rows_in_dropped_buckets",
        max_metric="lshtopk_max_bucket_size",
        repartition=max_bucket_size is not None,
    )
    if probe == "margin" and n_probe > 1:
        probe_buckets = lsh_margin_probe_buckets(
            F.col(vec_col), dim, n_planes, n_probe, plane_fn
        )
    else:
        base_bucket = lsh_bucket(F.col(vec_col), dim, n_planes, plane_fn)
        probe_buckets = F.array_distinct(
            F.array(
                base_bucket,
                *[
                    base_bucket.bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(max(0, min(n_probe - 1, n_planes)))
                ],
            )
        )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.explode(probe_buckets).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a neighbor found via several probed buckets must count once
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score", F.round(cosine(F.col("__cvec"), F.col("__qvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    strategy: str = "auto",
    heap_threshold: int = 1000,
) -> DataFrame:
    """Flagship exact top-k entry point with automatic physical strategy.

    Both strategies return IDENTICAL results (unit-tested equal); they
    differ only in physical plan:

    - ``brute``: broadcast cross join + global top-k window — lowest
      latency when the corpus is small (the window shuffle carries all
      |corpus|·|queries| scored rows).
    - ``heap`` (:func:`topk_partition_heap`): per-partition numpy matmul +
      local top-k, final window over |partitions|·|queries|·k rows — the
      only shape that survives a 100× corpus, and already ~2.5× faster at
      sf0.1.
    - ``auto``: ``heap`` once the corpus reaches ``heap_threshold`` rows
      (one columnar count job — metadata-cheap on parquet)."""
    if strategy == "auto":
        strategy = "heap" if corpus.count() >= heap_threshold else "brute"
    if strategy == "heap":
        return topk_partition_heap(corpus, queries, id_col, vec_col, k)
    if strategy == "brute":
        return topk_brute_force(corpus, queries, id_col, vec_col, k)
    raise ValueError(f"unknown top-k strategy: {strategy}")


#: Hard cap on rows any similarity helper will pull to the driver for
#: numpy broadcast. 2M rows x 64 dims x 8 bytes ~= 1 GiB — comfortably
#: inside the 16 GiB driver; beyond it the caller gets an error instead
#: of a driver OOM. Contract: the *query/reference* side is small by
#: design (queries << corpus); the corpus side never collects.
MAX_DRIVER_COLLECT_ROWS = 2_000_000


def _collect_matrix(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    what: str,
    return_raw: bool = False,
):
    """Collect (ids, normalized float64 matrix) with the documented row
    cap enforced in the SAME job as the collect: limit(cap + 1) bounds
    driver memory identically to a separate probe+count pass, without
    executing the upstream plan twice. ``return_raw=True`` additionally
    returns the un-normalized matrix (consumers that replicate
    ivf.train_centroids' raw-mean centroid update driver-side need it).

    The transfer rides ``toArrow()`` (columnar, zero row objects — the
    guide-§6 Arrow-for-driver-transfers lever; ~7× faster than the
    row-based collect at n=20k) with a constant-width fast path that
    reshapes the list column's flattened value buffer straight into the
    (n, dim) matrix."""
    import numpy as np

    from .ivf import _normalize

    tbl = df.select(id_col, vec_col).limit(
        MAX_DRIVER_COLLECT_ROWS + 1
    ).toArrow()
    if tbl.num_rows > MAX_DRIVER_COLLECT_ROWS:
        raise ValueError(
            f"{what} side has more than {MAX_DRIVER_COLLECT_ROWS} rows; "
            "refusing the driver-side collect (it would risk a driver "
            "OOM). Use the distributed path (LSH/IVF/PQ) or raise "
            "MAX_DRIVER_COLLECT_ROWS deliberately."
        )
    ids = tbl.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    vec = tbl.column(1).combine_chunks()
    n = tbl.num_rows
    offs = np.asarray(vec.offsets)
    widths = np.diff(offs)
    if n and vec.null_count == 0 and (widths == widths[0]).all():
        mat = (
            np.asarray(vec.flatten())
            .astype(np.float64)
            .reshape(n, int(widths[0]))
        )
    elif n == 0:
        # an empty frame must come back as an empty MATRIX — the 1-D
        # (0,) array the general path builds blows up _normalize's
        # axis=1 norm, making every caller's n == 0 branch dead code
        # and empty inputs crash with AxisError instead
        mat = np.zeros((0, 0))
    else:  # ragged/null rows: the general (slow) materialization
        mat = np.array(vec.to_pylist(), dtype=np.float64)
    if return_raw:
        return ids, _normalize(mat), mat
    return ids, _normalize(mat)


def exact_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold, id_a < id_b — the auditable
    O(n²) twin that recall/precision gates (SemDeDup, LSH) verify against.

    Physical shape: the corpus collects ONCE to the driver (guarded by
    ``MAX_DRIVER_COLLECT_ROWS`` — all-pairs verification is only ever run
    at audit scale) and broadcasts; each Arrow batch then computes one
    |batch| x |corpus| BLAS matmul and emits its surviving pairs. That
    parallelizes the quadratic work across executors with zero shuffle —
    versus a BroadcastNestedLoopJoin evaluating an expression-tree cosine
    per pair (~100x slower at sf0.1).

    Two partition-shape guards keep the quadratic work bounded AND spread:

    - the left side is explicitly repartitioned to the cluster's
      parallelism — a small parquet corpus (one file under
      maxPartitionBytes) otherwise arrives as ONE input split and the
      whole n² gram runs in a single Python worker (measured 19.7 s vs
      ~2 s spread at n=20k on local[32]);
    - inside each task the gram is computed in row chunks of
      ``block_rows`` so the peak sims block is block_rows × n doubles
      (~160 MB at n=20k) instead of an entire Arrow batch × n (~1.6 GB
      at the default 10k-row batch) — allocator pressure there was the
      2.7× run-to-run variance on a quiet box."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from .ivf import _normalize as _nrm

    all_ids, all_mat = _collect_matrix(emb, id_col, vec_col, "all-pairs corpus")
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((all_ids, all_mat))
    block_rows = 1024

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def block(batches):
        ids_all, mat_all = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = _nrm(np.array(list(pdf[vec_col]), dtype=np.float64))
            for lo in range(0, len(ids), block_rows):
                sims = mat[lo : lo + block_rows] @ mat_all.T
                ii, jj = np.where(sims >= threshold)
                ids_blk = ids[lo : lo + block_rows]
                keep = ids_blk[ii] < ids_all[jj]  # upper triangle, no self
                yield pd.DataFrame(
                    {
                        "id_a": ids_blk[ii][keep],
                        "id_b": ids_all[jj][keep],
                        "cos_sim": sims[ii, jj][keep],
                    }
                )

    return (
        emb.select(id_col, vec_col)
        .repartition(sc.defaultParallelism)
        .mapInPandas(block, out_schema)
    )


def topk_partition_heap(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k at scale: per-partition vectorized scoring + local top-k,
    then one tiny global reduce.

    :func:`topk_brute_force` ranks |corpus|·|queries| scored rows through a
    window — fine locally, but the window shuffle carries every scored row.
    Here each corpus partition computes a numpy matmul against the
    broadcast query matrix (Arrow batches, BLAS — far faster per row than
    expression-tree dot products) and emits only its local top-k per query;
    the final window ranks |partitions|·|queries|·k rows — negligible at
    any corpus size. Scores are float64, rounded like the brute-force path.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql import types as T

    # query side only (queries << corpus by contract); row-cap guarded
    q_ids, q_norm = _collect_matrix(queries, id_col, vec_col, "query")
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_norm))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def score_partition(batches):
        q_ids_l, q_norm_l = bq.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(mat) == 0:
                continue
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            scores = mat @ q_norm_l.T  # |rows| x |queries|
            top = min(k + 1, len(ids))  # +1 absorbs the self-match
            part = np.argpartition(-scores, top - 1, axis=0)[:top]
            rows = []
            for qi in range(len(q_ids_l)):
                for ci in part[:, qi]:
                    if ids[ci] != q_ids_l[qi]:
                        rows.append(
                            (int(q_ids_l[qi]), int(ids[ci]), round(float(scores[ci, qi]), 6))
                        )
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    local_tops = corpus.select(id_col, vec_col).mapInPandas(
        score_partition, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("neighbor_id")
    )
    return (
        local_tops.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def assign_nearest_centroid(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared-L2 argmin) —
    the k-means assignment step as a ZERO-shuffle map-only plan.

    ``centroids`` is a small driver-side list of ``(cluster_id, vector)``
    (k rows — the Lloyd's-iteration state, never the data). It is inlined
    as a literal array column, so each corpus row computes all k distances
    and takes the argmin inside one codegen'd expression: no cross join,
    no groupBy, no Python. At 100 TB this is the shape that matters —
    assignment is a pure map over the corpus; only the (tiny) centroid
    update that follows aggregates anything.

    Ties after rounding break to the lowest cluster id (struct ordering),
    so results are layout-independent and engine-portable.
    """
    best = _nearest_centroid_expr(centroids, _f64(F.col(vec_col)))
    return df.select(
        F.col(id_col),
        best["cluster"].alias("cluster"),
        best["dist2"].alias("dist2"),
    )


def _nearest_centroid_expr(
    centroids: list[tuple[int, list[float]]], v: Column
) -> Column:
    """struct(dist2, cluster) of the nearest centroid to double-array ``v``
    — centroids inlined as literals, argmin via struct-ordered array_min
    (ties after round-6 break to the lowest cluster id)."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cid).cast("int").alias("cluster"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("c"),
            )
            for cid, vec in centroids
        ]
    )
    dists = F.transform(
        cent_arr,
        lambda s: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(v, s["c"], lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("dist2"),
            s["cluster"].alias("cluster"),
        ),
    )
    return F.array_min(dists)


def kmeans_lloyd(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means for ``n_iter`` iterations; returns the final
    assignment (id, cluster, dist2).

    Iterative ML on the relational engine: each iteration is one map-only
    assignment (:func:`assign_nearest_centroid` — centroids inlined as
    literals) plus one centroid update, a single (cluster, dim)-keyed
    aggregation whose result is k x dim scalars — Lloyd's state, collected
    to the driver (512 doubles for k=8, dim=64), never the data. At
    100 TB the per-iteration cost is one corpus scan + one tiny shuffle;
    clusters that lose all members drop out (deterministic policy both
    engines replay).

    Updated centroid coordinates are rounded to 9 decimals so the
    engine-portable oracle (avg over the same members) lands on the
    identical double before the next assignment — same convention as the
    rest of the registry's cross-engine float math.
    """
    v = _f64(F.col(vec_col))
    for _ in range(n_iter - 1):
        # assignment and update in one scan — no id-keyed join back to the
        # vectors: the only exchange is the map-side-combined (cluster,
        # pos) partial aggregation. The cluster MUST be projected in its
        # own select BELOW the posexplode: a generator and the argmin in
        # one select puts the k x dim fold ABOVE the Generate, where it
        # re-evaluates once per exploded dim (measured 64x = ~17x wall
        # at sf1) instead of once per row
        best = _nearest_centroid_expr(centroids, v)
        assigned = df.select(
            best["cluster"].alias("cluster"), v.alias("__v")
        )
        upd = (
            assigned.select("cluster", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("x"), 9).alias("av"))
            .collect()  # k x dim Lloyd's state scalars, not data
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(
                r["av"]
            )
        centroids = [
            (cid, [dims[p] for p in sorted(dims)])
            for cid, dims in sorted(by_cluster.items())
        ]
    return assign_nearest_centroid(df, centroids, id_col, vec_col)


# ------------------------------------------------- streaming k-means state
# State rows: (cluster, pos, s DECIMAL(38,12), m BIGINT) — per-dimension
# member SUMS and counts, not means. Decimal addition is exact and
# order-independent (the label-probe/conditional_agg lesson), so the
# running state is layout-independent and every engine replaying the
# same batch sequence holds BIT-IDENTICAL centroids s/m.
KM_STATE_SCHEMA = (
    "cluster int, pos int, s decimal(38,12), m bigint"
)


def _km_state_dirs(state_dir: str) -> list[tuple[int, str]]:
    import os

    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        if d.startswith("batch="):
            out.append((int(d.split("=", 1)[1]), os.path.join(state_dir, d)))
    return sorted(out)


def _km_read_state(spark, state_dir: str, before: int | None = None):
    """Cumulative (cluster, pos, s, m) AFTER the newest batch < ``before``
    (or the newest overall); None if no state yet."""
    dirs = [
        (b, p) for b, p in _km_state_dirs(state_dir)
        if before is None or b < before
    ]
    if not dirs:
        return None
    return spark.read.schema(KM_STATE_SCHEMA).parquet(dirs[-1][1])


def _km_centroids(state, seeds: list[tuple[int, list[float]]]):
    """Driver-side centroid list for the next assignment: per-dim mean
    s/m (the decimal-partials precedent, cast to double IN the engine so
    the oracle's CAST(s/m AS DOUBLE) lands on the identical value);
    clusters with no members yet keep their seed vector."""
    if state is None:
        return list(seeds)
    rows = (
        state.select(
            "cluster",
            "pos",
            # exact decimal -> nearest double, then IEEE divide by the
            # integer-exact count: bit-identical in any engine
            (F.col("s").cast("double") / F.col("m")).alias("cx"),
        )
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda t: t["cx"],
            ).alias("cv")
        )
        .collect()
    )
    got = {int(r["cluster"]): [float(x) for x in r["cv"]] for r in rows}
    return [(cid, got.get(cid, vec)) for cid, vec in seeds]


def run_streaming_kmeans(
    spark,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    *,
    seeds: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    timeout_sec: float = 300.0,
) -> None:
    """Online (running-mean) k-means under Structured Streaming: each
    micro-batch is assigned against the centroids implied by the state so
    far, then folds its per-(cluster, dim) decimal sums and counts into
    the state — the sequential mini-batch analogue of Lloyd's update.

    State discipline (the count-min pattern adapted to SEQUENTIAL state):
    ``state_dir/batch=<id>`` holds the CUMULATIVE (s, m) after batch
    <id>, computed from the newest state with id < <id> — so an
    at-least-once foreachBatch replay recomputes from the same prior
    state and overwrites its own directory with the same bytes
    (idempotent), and a crash between write and checkpoint-commit cannot
    double-fold a batch. Per-batch cost: one scan of the batch + one
    k x dim aggregation; the state is k x dim rows, never the data.

    At 100 TB this is the shape for continuous corpus clustering
    (SemDeDup-style cells maintained online): assignment is a map over
    each arriving batch against k literal centroids; only sketch-sized
    state persists.

    Runs on the shared slot kernel (:func:`..streaming.run_slot_stream`);
    unlike the merge-on-read families this op's slot holds the FOLDED
    cumulative state (sequential read), which is why the slot fn reads
    the prior slot itself.
    """
    from ..streaming import run_slot_stream

    def slot(batch_df: DataFrame, batch_id: int) -> DataFrame:
        prev = _km_read_state(spark, state_dir, before=batch_id)
        cents = _km_centroids(prev, seeds)
        v = _f64(F.col(vec_col))
        best = _nearest_centroid_expr(cents, v)
        # cluster projected BELOW the posexplode (see kmeans_lloyd note)
        assigned = batch_df.select(
            best["cluster"].alias("cluster"), v.alias("__v")
        )
        sums = (
            assigned.select(
                "cluster", F.posexplode("__v").alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum(F.col("x").cast("decimal(38,12)")).alias("s"),
                F.count(F.lit(1)).alias("m"),
            )
        )
        merged = (
            sums
            if prev is None
            else prev.unionByName(sums)
            .groupBy("cluster", "pos")
            .agg(F.sum("s").alias("s"), F.sum("m").alias("m"))
        )
        return merged.select(
            F.col("cluster").cast("int"),
            F.col("pos").cast("int"),
            F.col("s").cast("decimal(38,12)"),
            F.col("m").cast("bigint"),
        )

    run_slot_stream(
        spark, stream, state_dir, checkpoint_dir, slot,
        timeout_sec=timeout_sec,
    )


def read_kmeans_state(spark, state_dir: str):
    """Final cumulative state (None if the stream never wrote any).

    Local-path contract as on the write side: the slot listing is
    driver-local, so a URI-schemed dir raises instead of silently
    reading as "no state"."""
    from ..streaming import require_local_state_paths

    require_local_state_paths(state_dir)
    return _km_read_state(spark, state_dir)


# ------------------------------------------------ streaming top-k state
TOPK_STATE_SCHEMA = (
    "query_id long, neighbor_id long, score double, rnk bigint, "
    "write_k int"
)


def run_streaming_topk(
    spark,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    *,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    timeout_sec: float = 300.0,
) -> None:
    """Maintain exact top-k cosine neighbors per query over a STREAMED
    corpus: each micro-batch writes its own per-query batch-local top-k
    (:func:`topk_brute_force` over just the batch) to
    ``state_dir/batch=<id>``; reading merges by re-ranking the union.
    Partial top-k is a monoid — top-k(union of per-batch top-ks) =
    top-k(whole corpus), because a global top-k row is necessarily in
    its own batch's top-k — so the merged state is EXACTLY the one-shot
    answer (the registry oracle pins that equality), and per-batch-slot
    overwrite keeps at-least-once replay idempotent. The fourth
    exactly-mergeable state family: counts, sums, bits, now ranks.

    State size: |queries| x k rows per batch — never the corpus. The
    100 TB shape for continuously-ingested vector corpora: each arriving
    batch is scored map-side against the (tiny, broadcast) query set;
    nothing is ever re-scored.
    """
    from ..streaming import run_slot_stream

    # pin the (small-by-contract) query set ONCE: left as a lazy plan it
    # would re-scan its source inside every foreachBatch call. The pin is
    # a driver-side collect, so it routes through the same row-cap guard
    # as every other driver-side matrix pull — a mistakenly-huge query
    # side raises instead of OOMing the driver
    q_rows = (
        queries.select(id_col, vec_col)
        .limit(MAX_DRIVER_COLLECT_ROWS + 1)
        .collect()
    )
    if len(q_rows) > MAX_DRIVER_COLLECT_ROWS:
        raise ValueError(
            f"query side has more than {MAX_DRIVER_COLLECT_ROWS} rows; "
            "refusing the driver-side pin (it would risk a driver OOM). "
            "The streaming top-k contract is a small query set scored "
            "against a streamed corpus — swap the sides, or raise "
            "MAX_DRIVER_COLLECT_ROWS deliberately."
        )
    q_schema = queries.select(id_col, vec_col).schema
    pinned_queries = spark.createDataFrame(q_rows, q_schema)

    def slot(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return topk_brute_force(
            batch_df, pinned_queries, id_col, vec_col, k=k
        ).withColumn("write_k", F.lit(k).cast("int"))

    run_slot_stream(
        spark, stream, state_dir, checkpoint_dir, slot,
        timeout_sec=timeout_sec,
    )


def read_topk_state(spark, state_dir: str, k: int | None = None) -> DataFrame:
    """Merged exact top-k per query from the per-batch partials (the
    empty result if the stream never wrote state).

    The merge is exact only up to the k the STREAM was run with (each
    slot retains write-k rows per query — rank write-k+1 of the union is
    not the true global rank write-k+1). The writer records write_k in
    the state, so ``k=None`` (default) reads at exactly that depth and a
    larger explicit ``k`` raises instead of silently returning a
    plausible-but-wrong deeper ranking."""
    from pyspark.sql import Window

    from ..streaming import read_state_slots

    parts = read_state_slots(spark, state_dir, TOPK_STATE_SCHEMA)
    wk_row = parts.agg(
        F.min("write_k").alias("wk"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    write_k = wk_row["wk"]
    if k is None and write_k is None and wk_row["n"] > 0:
        # state exists but carries no write_k (written before the column
        # existed, or by another writer — read_state_slots imposes the
        # schema, so the column reads as null): a real merged top-k is
        # sitting in the slots and silently returning empty would mask it
        raise ValueError(
            f"state at {state_dir!r} has {wk_row['n']} rows but no "
            "write_k column: cannot establish the depth the stream was "
            "run with. Re-run the stream with this writer, or pass an "
            "explicit k you can vouch for."
        )
    if k is None:
        k = write_k if write_k is not None else 0
    elif write_k is not None and k > write_k:
        raise ValueError(
            f"read k={k} exceeds the stream's write_k={write_k}: ranks "
            f"beyond write_k are not the true global top-k"
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("neighbor_id")
    )
    return (
        parts.select("query_id", "neighbor_id", "score")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
    )
