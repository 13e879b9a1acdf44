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
from .similarity import cosine


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
        + [T.StructField("cell", T.IntegerType())]
    )

    def run(batches):
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
            yield rep

    return corpus.select(id_col, vec_col).mapInPandas(run, out_schema)


def semantic_near_dup_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    iterations: int = 2,
    threshold: float = 0.4,
    n_probe: int = 1,
) -> DataFrame:
    """(id_a, id_b, cos_sim) for shared-cell pairs with cosine >= threshold,
    id_a < id_b. The SemDeDup candidate set: exact cosine, cluster-scoped;
    ``n_probe > 1`` multi-assigns each vector to its nearest cells to
    recover boundary-straddling pairs (distinct-ed below, so a pair sharing
    two cells still appears once)."""
    cents = train_centroids(emb, id_col, vec_col, n_clusters, iterations)
    if n_probe > 1:
        cells = assign_cells_multi(
            emb, cents, id_col=id_col, vec_col=vec_col, n_probe=n_probe
        )
    else:
        cells = assign_cells(emb.select(id_col, vec_col), cents, id_col, vec_col)
    a = cells.select(
        F.col("cell"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
    )
    b = cells.select(
        F.col("cell"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
        .distinct()  # multi-probe: a pair sharing 2 cells appears twice;
        # dedup AFTER the threshold so only surviving pairs shuffle
    )


def semdedup_drop_ids(pairs: DataFrame) -> DataFrame:
    """Keep-min-id policy over the pair set: drop the greater id of every
    near-dup pair (transitively safe: any dropped id has a smaller kept or
    dropped witness, so each similarity group keeps its minimum)."""
    return pairs.select(F.col("id_b").alias("drop_id")).distinct()
