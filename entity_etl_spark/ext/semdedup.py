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

from .ivf import _normalize, assign_cells, train_centroids


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
    no shuffle; downstream candidate rows multiply by <= n_probe."""
    import numpy as np

    bc = corpus.sparkSession.sparkContext.broadcast(centroids)
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

        cent = bc.value
        p = min(n_probe, cent.shape[0])
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            top = np.argsort(-(mat @ cent.T), axis=1)[:, :p]
            rep = pdf.loc[pdf.index.repeat(p), [id_col, vec_col]].copy()
            rep["cell"] = top.reshape(-1).astype("int32")
            rep["__probe"] = np.tile(np.arange(p, dtype="int32"), len(pdf))
            yield rep

    return corpus.select(id_col, vec_col).mapInPandas(run, out_schema)


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
    The count() spent resolving k is one columnar metadata job."""
    import math

    if n_clusters is None:
        n_clusters = max(1, math.ceil(emb.count() / target_cell_size))
    cents = train_centroids(emb, id_col, vec_col, n_clusters, iterations)
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
        ids = pdf[id_col].to_numpy()
        mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
        # row-chunked gram: peak sims block is 1024 x N_c doubles instead
        # of N_c x N_c — an oversized cell (fixed small k on a big corpus)
        # degrades to more chunks, not a multi-GB allocation in one worker
        frames = []
        for lo in range(0, len(ids), 1024):
            sims = mat[lo : lo + 1024] @ mat.T
            ii, jj = np.where(sims >= threshold)
            ids_blk = ids[lo : lo + 1024]
            keep = ids_blk[ii] < ids[jj]  # upper triangle, no self-pairs
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": ids_blk[ii][keep],
                        "id_b": ids[jj][keep],
                        "cos_sim": sims[ii, jj][keep],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return cells.groupBy("cell").applyInPandas(gram, schema)


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
        for lo in range(0, len(qids), 1024):
            sims = qmat[lo : lo + 1024] @ mat.T
            ii, jj = np.where(sims >= threshold)
            qa = qids[lo : lo + 1024][ii]
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
