"""IVF (inverted-file) approximate nearest neighbor (E3 scale path #2).

Complements the hyperplane LSH in similarity.py with the
clustering-based index most vector stores use: k-means centroids
partition the corpus into cells; a query scores only the cells whose
centroids are nearest (``n_probe``). Recall/cost is tunable at query
time, unlike LSH's fixed plane count.

Spark shape:

- training (Lloyd iterations) runs as: assignment map-side (numpy argmax
  vs broadcast centroids), centroid update as ONE groupBy over
  (cluster, dim) pairs — no driver-side data beyond the k×dim centroid
  matrix itself;
- the index is just a ``cell`` column on the corpus (int), normally
  persisted/partitioned by cell;
- queries probe n_probe cells → the candidate set is a cell-key semi-join,
  then exact scoring on candidates only.

Determinism: centroid init picks the k corpus vectors with the smallest
xxhash64(id) — no RNG state, reproducible across runs and executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize(mat):
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def train_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iterations: int = 2,
    sample_fraction: float | None = None,
):
    """Deterministic spherical k-means; returns a numpy (k, dim) matrix.

    Init = vectors with the k smallest xxhash64(id). Each Lloyd iteration:
    map-side assignment + one (cluster, dim) aggregation; only k×dim floats
    ever reach the driver.

    ``sample_fraction`` trains on a deterministic hash-sample of the
    corpus (``ext.sampling.hash_sample`` — membership is a pure function
    of the id, so training is reproducible across runs and cluster
    layouts). Centroid quality needs a representative sample, not every
    row: at 100 TB run Lloyd over ~1e6-1e8 sampled vectors and
    :func:`assign_cells` over the full corpus — each iteration's scan
    cost drops by 1/fraction while recall is statistically unchanged
    (the recall-gated unit tests run both modes)."""
    import numpy as np

    if sample_fraction is not None:
        from .sampling import hash_sample

        corpus = hash_sample(corpus, id_col, sample_fraction)
    seed_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_centroids)
        .collect()
    )
    centroids = _normalize(np.array([r[1] for r in seed_rows], dtype=np.float64))

    for _ in range(iterations):
        assigned = assign_cells(corpus, centroids, id_col, vec_col)
        sums = (
            assigned.select(
                "cell", F.posexplode(vec_col).alias("dim", "component")
            )
            .groupBy("cell", "dim")
            .agg(
                F.sum(F.col("component").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = centroids.copy()
        acc: dict[int, np.ndarray] = {}
        for row in sums:
            acc.setdefault(row["cell"], np.zeros(centroids.shape[1]))
            acc[row["cell"]][row["dim"]] = row["s"] / row["n"]
        for cell, vec in acc.items():
            if np.linalg.norm(vec) > 0:
                new[cell] = vec
        centroids = _normalize(new)
    return centroids


def assign_cells(
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add the nearest-centroid ``cell`` column (map-side numpy argmax)."""
    import numpy as np
    import pandas as pd

    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(centroids)
    fields = corpus.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField("cell", T.IntegerType())]
    )
    cols = [f.name for f in fields]

    def run(batches):
        cent = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            pdf = pdf.copy()
            pdf["cell"] = (mat @ cent.T).argmax(axis=1).astype("int32")
            yield pdf[cols + ["cell"]]

    return corpus.mapInPandas(run, out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids=None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the ``n_probe`` cells
    nearest each query. Candidate volume ≈ corpus × n_probe / n_centroids.
    ``sample_fraction`` passes through to :func:`train_centroids`
    (hash-sampled Lloyd training; assignment always runs full-corpus)."""
    import numpy as np

    from pyspark.sql import Window

    if centroids is None:
        centroids = train_centroids(
            corpus, id_col, vec_col, n_centroids,
            sample_fraction=sample_fraction,
        )

    cells = assign_cells(corpus, centroids, id_col, vec_col)

    # query side only (queries << corpus by contract); row-cap guarded —
    # a caller passing the corpus as the query set gets an error, not OOM
    from .similarity import _collect_matrix

    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col, "IVF query")
    probe_rows = []
    sims = q_mat @ centroids.T
    for qi, qid in enumerate(q_ids):
        for cell in np.argsort(-sims[qi])[:n_probe]:
            probe_rows.append((int(qid), int(cell)))
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id long, cell int")

    q = queries.select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    from .similarity import cosine

    scored = (
        cells.join(F.broadcast(probes), "cell")
        .join(F.broadcast(q), F.col("query_id") == F.col("__qid"))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "score", F.round(cosine(F.col(vec_col), F.col("__qvec")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "score",
            "rnk",
        )
    )
