"""SemDeDup — semantic deduplication via cluster-scoped pairwise cosine
(E2/E3 bridge; cf. Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication").

The web-scale recipe: k-means the embedding space, then compare pairs ONLY
within a cluster — the O(n²) global comparison becomes k × O((n/k)²), and
each cluster's comparison is an independent, shuffle-local task. Pairs
above the threshold are semantic duplicates; the keep-min-id policy drops
the rest. Cross-cluster near-dups are missed by construction (the paper's
own trade-off); the driver query states this decidably as a recall floor
against the exact all-pairs set.

Scale shape:

- clustering reuses :mod:`entity_etl_spark.ext.ivf`'s deterministic
  spherical k-means (map-side assignment, one (cluster, dim) aggregate per
  Lloyd iteration — only k×dim floats reach the driver);
- the pair join is an equi-join on ``cell``: one shuffle keyed by cluster,
  each reducer does its own small quadratic compare. No all-pairs
  BroadcastNestedLoopJoin anywhere;
- with cluster sizes bounded (k scales with n), reducer work is bounded;
  a skewed giant cluster is the known failure mode — split it by raising
  k or sub-clustering (the paper re-clusters oversized cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import types as T

from .ivf import (
    TWO_LEVEL_MIN_K,
    _coarse_index,
    _nearest_cells,
    _normalize,
    assign_cells,
    train_centroids,
)


def assign_cells_multi(
    corpus: DataFrame,
    centroids,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
) -> DataFrame:
    """One row per (vector, cell) for the ``n_probe`` nearest centroids —
    the multi-assignment that recovers boundary-straddling pairs (two
    vectors compare iff they share ANY probed cell). Map-side numpy top-p,
    no shuffle; downstream candidate rows multiply by <= n_probe. Once
    k >= ``ivf.TWO_LEVEL_MIN_K`` the top-p runs through the two-level
    coarse index (n·~2√k instead of n·k centroid dot products — the r10
    verdict's quadratic-centroid-stage fix; ties are stable so probe-0
    always equals :func:`ivf.assign_cells`'s argmax)."""
    import numpy as np

    coarse = (
        _coarse_index(centroids)
        if centroids.shape[0] >= TWO_LEVEL_MIN_K
        else None
    )
    bc = corpus.sparkSession.sparkContext.broadcast((centroids, coarse))
    out_schema = T.StructType(
        [f for f in corpus.select(id_col, vec_col).schema.fields]
        + [
            T.StructField("cell", T.IntegerType()),
            # probe rank: 0 = the primary (nearest) cell — lets a
            # consumer recover the single-assignment rows without a
            # second centroid pass
            T.StructField("__probe", T.IntegerType()),
        ]
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        cent, crs = bc.value
        p = min(n_probe, cent.shape[0])
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            top = _nearest_cells(mat, cent, crs, p)
            rep = pdf.loc[pdf.index.repeat(p), [id_col, vec_col]].copy()
            rep["cell"] = top.reshape(-1).astype("int32")
            rep["__probe"] = np.tile(np.arange(p, dtype="int32"), len(pdf))
            # the two-level path pads a short candidate list by
            # repeating its LAST cell (ivf._nearest_cells) — drop the
            # padded duplicates, or the same vector enters one cell's
            # gram twice and pairs with itself (an id_a == id_b row,
            # violating the id_a < id_b contract). Padding repeats are
            # adjacent by construction (distinct argsort candidates),
            # so one shifted compare finds them all.
            dup = np.zeros_like(top, dtype=bool)
            if p > 1:
                dup[:, 1:] = top[:, 1:] == top[:, :-1]
            keep = ~dup.reshape(-1)
            if not keep.all():
                rep = rep.loc[keep]
            yield rep

    return corpus.select(id_col, vec_col).mapInPandas(run, out_schema)


# corpora above this train Lloyd on a deterministic hash-sample of
# ~this many rows (floored at 20 rows per requested cluster). 50k keeps
# every driver-tested SF (<= 20k embeddings at sf1) training full-corpus
# bit-identically; the sf10 rehearsal (200k) and anything larger get
# the bounded-training path.
_MAX_TRAIN_ROWS = 50_000


def semantic_near_dup_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    target_cell_size: int = 256,
    iterations: int = 2,
    threshold: float = 0.4,
    n_probe: int = 1,
) -> DataFrame:
    """(id_a, id_b, cos_sim) for shared-cell pairs with cosine >= threshold,
    id_a < id_b. The SemDeDup candidate set: exact cosine, cluster-scoped;
    ``n_probe > 1`` multi-assigns each vector to its nearest cells to
    recover boundary-straddling pairs (distinct-ed below, so a pair sharing
    two cells still appears once).

    ``n_clusters=None`` (default) scales k with the corpus:
    ``ceil(n / target_cell_size)``, so per-cell gram work stays
    ~target_cell_size² no matter the corpus size. A FIXED k is the
    quadratic trap this module's header warns about — at 10× the corpus
    each cell holds 10× the vectors and every reducer does 100× the
    matmul (caught by the round-5 sf1 rehearsal: 29× cost for 10× data).
    The count() spent resolving k is one columnar metadata job.

    Training is hash-sampled once the corpus exceeds
    ``_MAX_TRAIN_ROWS`` (Lloyd over a bounded representative sample —
    centroid quality needs coverage, not every row; assignment still
    runs full-corpus), and with auto-k large the assignment itself runs
    through the two-level coarse index (``ivf.TWO_LEVEL_MIN_K``) — the
    two halves of the r10 verdict's quadratic-centroid-stage fix."""
    import math

    n = emb.count()
    if n_clusters is None:
        n_clusters = max(1, math.ceil(n / target_cell_size))
    frac = min(1.0, max(_MAX_TRAIN_ROWS, 20 * n_clusters) / max(n, 1))
    cents = train_centroids(
        emb, id_col, vec_col, n_clusters, iterations,
        sample_fraction=frac if frac < 1.0 else None,
    )
    if n_probe > 1:
        cells = assign_cells_multi(
            emb, cents, id_col=id_col, vec_col=vec_col, n_probe=n_probe
        )
    else:
        cells = assign_cells(emb.select(id_col, vec_col), cents, id_col, vec_col)
    # multi-probe: a pair sharing 2 cells appears twice — and its two
    # gram-matmul cosines may differ in the LAST ULP (different BLAS
    # blocking for different cell-matrix shapes), so the dedup key must
    # be the PAIR, not (pair, cos). max() picks a deterministic value.
    # Dedup happens AFTER the threshold so only surviving pairs shuffle.
    return (
        cell_pairs_gram(cells, threshold, id_col=id_col, vec_col=vec_col)
        .groupBy("id_a", "id_b")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )


def cell_pairs_gram(
    cells: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell exact pair compare as ONE BLAS gram matrix per cluster.

    One shuffle keyed by ``cell`` (applyInPandas), then each reducer runs
    its own N_c x N_c float64 matmul and emits only the pairs above the
    threshold — the same quadratic-within-cluster work the self-equi-join
    form does, but vectorized in Arrow/numpy instead of one expression-tree
    cosine per candidate pair (~100x fewer JVM expression evaluations; the
    r3 bench measured the join form at 73 s/action and this at <2 s on the
    sf0.1 corpus). Cluster sizes bound reducer memory: N_c x N_c doubles —
    the SemDeDup contract that k scales with n (oversized cells should be
    re-clustered, per the paper)."""
    import numpy as np
    import pandas as pd

    # output ids keep the INPUT id type (the expression-join form this
    # replaced was generic over any ordered id type; hardcoding int64
    # here would break string/uuid ids the id_col parameter advertises)
    id_type = cells.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def gram(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) < 2:
            return pd.DataFrame(
                {"id_a": pdf[id_col].iloc[:0],
                 "id_b": pdf[id_col].iloc[:0],
                 "cos_sim": pd.Series(dtype="float64")}
            )
        # sort by id: with unique ascending ids, (id_a < id_b) becomes
        # (position_a < position_b), so each row chunk only multiplies
        # against the columns at or after it — half the flops AND half
        # the sims traffic of the full-rectangle form
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
        # row-chunked gram, block size shrunk for oversized cells so the
        # peak sims block stays ~128 MB (a fixed 1024-row chunk against
        # a 10^5-row cell is a ~1 GB allocation per concurrent worker —
        # the r10 sf10 kernel-OOM mechanism)
        block = max(64, min(1024, int(16e6 / max(1, len(ids)))))
        frames = []
        for lo in range(0, len(ids), block):
            hi = min(lo + block, len(ids))
            sims = mat[lo:hi] @ mat[lo:].T
            ii, jj = np.where(sims >= threshold)
            keep = ii < jj  # upper triangle, no self-pairs
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": ids[lo:][ii[keep]],
                        "id_b": ids[lo:][jj[keep]],
                        "cos_sim": sims[ii[keep], jj[keep]],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return cells.groupBy("cell").applyInPandas(gram, schema)


def semantic_pair_gate(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    iterations: int = 2,
    threshold: float = 0.4,
    n_probe: int = 3,
    return_counts: bool = False,
) -> DataFrame:
    """The SemDeDup recall/precision gate as ONE tiled masked-matmul
    pass — the optimization of the pair-materializing gate form
    (``semantic_near_dup_pairs`` + ``exact_cosine_pairs`` + full_outer):
    identical output row ``(n_exact_pairs, recall_ok, precision_ok)``,
    but neither side materializes its O(n²·density) pair set as rows.

    Semantics (unchanged from the join form):

    - ``exact``  = unordered pairs (a < b) with float64 cosine >=
      threshold;
    - ``found``  = exact pairs that additionally share ANY of each
      vector's ``n_probe`` nearest cells (the multi-probe assignment
      :func:`assign_cells_multi` computes) — the SemDeDup candidate
      policy. Every emitted SemDeDup pair is exact-cosine-verified, so
      found ⊆ exact structurally; n_bad counts any violation anyway;
    - ``recall_ok``     = |found| / |exact| >= 0.8 (NULL when the exact
      set is empty — the division semantics of the join form);
    - ``precision_ok``  = n_bad == 0.

    One float64 dot product per surviving pair is the authoritative
    cosine for BOTH memberships. The join form evaluated each side with
    a separate float64 BLAS pass; with the measured corpus margin
    around the threshold (>= 1e-8 at every rehearsed SF, vs ~1e-15
    float64 summation noise) the two evaluations always classify
    identically — the same margin argument that lets the DuckDB oracle
    restate the count — so collapsing them changes no output.

    Physical shape: the corpus collects ONCE to the driver (the
    ``MAX_DRIVER_COLLECT_ROWS``-guarded audit-scale contract
    exact_cosine_pairs documents); Lloyd runs driver-side on the
    collected matrix (bit-equivalent math to ivf.train_centroids'
    full-corpus path, zero extra Spark jobs); the normalized float64
    matrix + per-vector probe bitmasks broadcast once. Upper-triangle
    TILES (square, cache-sized, float32 gram) fan out over the cluster;
    each tile extracts the sparse >= threshold-band survivors and
    re-evaluates only those in float64, emitting three partial COUNTS.
    float32 rounding is immaterial: its worst-case dot error for
    unit-norm dim-d vectors (~d·2⁻²⁴, ~4e-6 at d=64) is orders below
    the pre-filter band, so no exact pair can be missed, and every
    counted membership comes from the float64 re-evaluation. Nothing
    else shuffles: the 10×-data cost at sf10 drops from the r10
    measured 94× (pair-row materialization through Arrow + a 22M-vs-
    22M-row full_outer, 703 s) to near the tiled-matmul floor."""
    import numpy as np

    from .similarity import _collect_matrix

    spark = emb.sparkSession
    ids, mat, raw = _collect_matrix(
        emb, id_col, vec_col, "all-pairs corpus", return_raw=True
    )
    order = np.argsort(ids, kind="stable")
    mat = np.ascontiguousarray(mat[order])
    raw = raw[order]
    n = len(ids)

    # driver-side Lloyd, replicating train_centroids' full-corpus math:
    # seed = the k smallest-xxhash64(id) vectors (collected by the SAME
    # orderBy(xxhash64).limit(k) job train_centroids runs — hash
    # semantics are the engine's, so the seeds are bit-identical to the
    # distributed trainer's), assignment = argmax cosine vs normalized
    # centroids, update = mean of RAW members then one normalize.
    # (Summation order differs from the distributed aggregation by
    # ~1e-15 — harmless: n_exact is centroid-independent and the recall
    # margin is ~0.17, so the output row is unchanged.)
    k = min(n_clusters, n) if n else n_clusters
    if n == 0:
        cents = np.zeros((0, 1))
    else:
        seed_rows = (
            emb.select(vec_col)
            .orderBy(F.xxhash64(F.col(id_col)))
            .limit(k)
            .collect()
        )
        cents = _normalize(np.array([r[0] for r in seed_rows],
                                    dtype=np.float64))
        for _ in range(iterations):
            cells = (mat @ cents.T).argmax(axis=1)
            new = cents.copy()
            for c in range(k):
                members = raw[cells == c]
                if len(members):
                    vec = members.mean(axis=0)
                    if np.linalg.norm(vec) > 0:
                        new[c] = vec
            cents = _normalize(new)
    k = cents.shape[0]
    coarse = _coarse_index(cents) if k >= TWO_LEVEL_MIN_K else None
    p = min(n_probe, k)
    if n:
        top = _nearest_cells(mat, cents, coarse, p)
    else:
        top = np.zeros((0, max(p, 1)), dtype=np.int64)
    if k <= 64:
        bits = np.bitwise_or.reduce(
            np.left_shift(np.uint64(1), top.astype(np.uint64)), axis=1
        )
        top = None
    else:  # probe lists compare pairwise on the sparse survivors below
        bits = None
        top = np.ascontiguousarray(top.astype(np.int32))
    bc = spark.sparkContext.broadcast((mat, bits, top))

    # square tile fan-out over the upper triangle: each float32 sims
    # tile is ~tile² · 4 bytes (16 MB at 2048) — cache-friendly, and
    # per-tile temporaries stay small regardless of corpus size (the
    # 128 MB-per-strip shape of the row-blocked form was the sf10
    # memory-traffic wall). Tiles round-robin across tasks so the
    # half-weight diagonal tiles spread.
    tile = 2048
    nt = (n + tile - 1) // tile
    coords = [(i, j) for i in range(nt) for j in range(i, nt)]
    starts = spark.createDataFrame(
        coords or [(0, 0)], "ti: int, tj: int"
    ).repartition(spark.sparkContext.defaultParallelism)
    if not coords:
        starts = starts.limit(0)
    out_schema = T.StructType(
        [
            T.StructField("n_exact", T.LongType()),
            T.StructField("n_inter", T.LongType()),
            T.StructField("n_bad", T.LongType()),
        ]
    )
    # pairs at or above (threshold - band) in the float32 gram get the
    # float64 re-evaluation; float32 error is ~4e-6 for these vectors,
    # so every pair whose true cosine is >= threshold survives the
    # pre-filter with 3 decimal orders of slack
    band = 1e-2

    def run(batches):
        import pandas as pd

        mat_b, bits_b, top_b = bc.value
        mat32 = mat_b.astype(np.float32)
        for pdf in batches:
            n_exact = n_inter = n_bad = 0
            for ti, tj in zip(pdf["ti"], pdf["tj"]):
                a0, a1 = ti * tile, min((ti + 1) * tile, n)
                b0, b1 = tj * tile, min((tj + 1) * tile, n)
                sims = mat32[a0:a1] @ mat32[b0:b1].T
                cand = sims >= threshold - band
                if ti == tj:  # keep strict upper triangle only
                    cand &= np.triu(
                        np.ones(cand.shape, dtype=bool), k=1
                    )
                ii, jj = np.nonzero(cand)
                if not len(ii):
                    continue
                gi, gj = a0 + ii, b0 + jj
                d = np.einsum("ij,ij->i", mat_b[gi], mat_b[gj])
                exact = d >= threshold
                if bits_b is not None:
                    share = (bits_b[gi] & bits_b[gj]) != 0
                else:
                    share = (
                        top_b[gi][:, :, None] == top_b[gj][:, None, :]
                    ).any(axis=(1, 2))
                found = share & (d >= threshold)
                n_exact += int(exact.sum())
                n_inter += int((found & exact).sum())
                n_bad += int((found & ~exact).sum())
            yield pd.DataFrame(
                {
                    "n_exact": [n_exact],
                    "n_inter": [n_inter],
                    "n_bad": [n_bad],
                }
            )

    partials = starts.mapInPandas(run, out_schema)
    agg = partials.agg(
        F.sum("n_exact").alias("__e"),
        F.sum("n_inter").alias("__i"),
        F.sum("n_bad").alias("__b"),
    )
    cols = [
        F.coalesce(F.col("__e"), F.lit(0))
        .cast("bigint")
        .alias("n_exact_pairs"),
        F.when(
            F.col("__e") > 0, (F.col("__i") / F.col("__e")) >= 0.8
        ).alias("recall_ok"),
        (F.coalesce(F.col("__b"), F.lit(0)) == 0).alias("precision_ok"),
    ]
    if return_counts:
        # measurement surface (the two-level recall artifact): the raw
        # found/bad counts behind the booleans. Additive and default-off;
        # the declared gate row is byte-identical without it.
        cols += [
            F.coalesce(F.col("__i"), F.lit(0))
            .cast("bigint")
            .alias("n_found_pairs"),
            F.coalesce(F.col("__b"), F.lit(0))
            .cast("bigint")
            .alias("n_bad_pairs"),
        ]
    return agg.select(*cols)


# ------------------------------------------------ incremental state twin
#
# The exact and MinHash dedup families have persisted-state incremental
# twins (dedup.exact_dedup_incremental / minhash_dedup_incremental);
# this completes the story for SEMANTIC dedup (VERDICT r9 item 6): the
# persisted state is the trained centroids plus one (cell, id, vector)
# row per kept doc. A new batch assigns MAP-SIDE against the broadcast
# centroids and compares only against its probed cells' members — per
# increment, work is O(|batch| x touched-cell sizes), and with the
# state table partitioned/bucketed by cell the semi-join below prunes
# the state read to touched cells only.

def materialize_semantic_state(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    target_cell_size: int = 256,
    iterations: int = 2,
):
    """First-run state: (centroids ndarray, cells DataFrame of
    (cell, id, vector) — each corpus vector in its PRIMARY cell).
    Persist both; later increments never rescan the corpus."""
    import math

    if n_clusters is None:
        n_clusters = max(
            1, math.ceil(corpus.count() / target_cell_size)
        )
    cents = train_centroids(
        corpus, id_col, vec_col, n_clusters, iterations
    )
    cells = assign_cells(
        corpus.select(id_col, vec_col), cents, id_col, vec_col
    )
    return cents, cells


def cell_cross_pairs(
    cells: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    new_col: str = "__new",
) -> DataFrame:
    """Per-cell NEW-vs-ALL exact cosine (the incremental twin of
    :func:`cell_pairs_gram`): one shuffle keyed by cell, each reducer
    one |new| x |cell| BLAS matmul — state-state pairs were settled in
    earlier increments and are never recomputed. Emits
    ``(id_a, id_b, cos_sim)`` where ``id_b`` is the NEW doc that would
    drop: the partner is a state doc (state precedes batch — the
    keep-min contract minhash_dedup_incremental documents) or a
    smaller-id new sibling."""
    import numpy as np
    import pandas as pd

    id_type = cells.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def gram(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {"id_a": pdf[id_col].iloc[:0],
             "id_b": pdf[id_col].iloc[:0],
             "cos_sim": pd.Series(dtype="float64")}
        )
        new = pdf[new_col].to_numpy(dtype=bool)
        if len(pdf) < 2 or not new.any():
            return empty
        ids = pdf[id_col].to_numpy()
        mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
        qids = ids[new]
        qmat = mat[new]
        frames = []
        # block size shrinks for oversized cells: peak sims block stays
        # ~128 MB instead of 1024 x |cell| doubles per concurrent worker
        block = max(64, min(1024, int(16e6 / max(1, len(ids)))))
        for lo in range(0, len(qids), block):
            sims = qmat[lo : lo + block] @ mat.T
            ii, jj = np.where(sims >= threshold)
            qa = qids[lo : lo + block][ii]
            mb = ids[jj]
            # partner drops the new doc iff it is state (any id) or a
            # smaller-id new sibling; never self
            keep = (~new[jj]) | (mb < qa)
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": mb[keep],
                        "id_b": qa[keep],
                        "cos_sim": sims[ii, jj][keep],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else empty

    return cells.groupBy("cell").applyInPandas(gram, schema)


def semantic_dedup_incremental(
    batch: DataFrame,
    centroids,
    state_cells: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_probe: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Drop batch docs semantically near-duplicate to the accumulated
    state (or to a smaller-id batch sibling). Returns ``(kept_batch,
    state_delta)`` — the delta is the kept docs' PRIMARY-cell rows;
    append it to the persisted state (state.append_state), so per-batch
    persistence costs O(batch).

    The batch multi-probes its ``n_probe`` nearest cells (recovering
    boundary-straddling pairs against state members stored in their
    primary cells); the state side is semi-join-pruned to touched
    cells, so an increment reads state proportional to the batch's
    cell footprint, not the corpus."""
    bcells = (
        assign_cells_multi(
            batch, centroids, id_col=id_col, vec_col=vec_col,
            n_probe=n_probe,
        )
        if n_probe > 1
        else assign_cells(
            batch.select(id_col, vec_col), centroids, id_col, vec_col
        ).withColumn("__probe", F.lit(0))
    ).localCheckpoint(eager=True)  # consumers: pair gram, touched set, delta
    touched = bcells.select("cell").distinct()
    scells = state_cells.join(touched, "cell", "left_semi")
    all_cells = scells.select(id_col, vec_col, "cell").withColumn(
        "__new", F.lit(False)
    ).unionByName(
        bcells.select(id_col, vec_col, "cell").withColumn(
            "__new", F.lit(True)
        )
    )
    losers = (
        cell_cross_pairs(
            all_cells, threshold, id_col=id_col, vec_col=vec_col
        )
        .select(F.col("id_b").alias("__loser"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    kept = batch.join(
        losers, batch[id_col] == losers["__loser"], "left_anti"
    )
    # the delta's primary-cell rows are already in the checkpointed
    # bcells (__probe == 0) — prune to survivors instead of re-running
    # the centroid matmul over the kept batch
    delta = (
        bcells.filter(F.col("__probe") == 0)
        .join(kept.select(id_col), id_col, "left_semi")
        .select(id_col, vec_col, "cell")
    )
    return kept, delta


def semdedup_drop_ids(pairs: DataFrame) -> DataFrame:
    """Keep-min-id policy over the pair set: drop the greater id of every
    near-dup pair (transitively safe: any dropped id has a smaller kept or
    dropped witness, so each similarity group keeps its minimum)."""
    return pairs.select(F.col("id_b").alias("drop_id")).distinct()
