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
    (the recall-gated unit tests run both modes).

    Each Lloyd iteration is ONE fused mapInPandas pass: assignment and
    per-partition partial (cell, count, sum-vector) accumulation happen
    in the same numpy batch loop, so an iteration emits at most
    k rows per partition instead of the previous shape's n×dim
    posexplode rows; the (cell, dim)-pair aggregation that collected
    k×dim ROWS to the driver (the r10 verdict's driver-bottleneck
    finding for k ∝ n) is now a k-row groupBy whose per-dim sums ride
    ONE array column. The driver still receives the k×dim centroid
    matrix itself — that is the output, and it must be broadcast for
    assignment anyway — but never a row-per-component explosion of it."""
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
    dim = centroids.shape[1]
    slim = corpus.select(vec_col)
    partial_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("sums", T.ArrayType(T.DoubleType())),
        ]
    )

    for _ in range(iterations):
        bc = corpus.sparkSession.sparkContext.broadcast(centroids)

        def partials(batches):
            import pandas as pd

            cent = bc.value
            k = cent.shape[0]
            acc_n = np.zeros(k, dtype=np.int64)
            acc_s = np.zeros((k, cent.shape[1]), dtype=np.float64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                raw = np.array(list(pdf[vec_col]), dtype=np.float64)
                cells = (_normalize(raw) @ cent.T).argmax(axis=1)
                acc_n += np.bincount(cells, minlength=k)
                # sum RAW components (the update the (cell, dim)
                # aggregation form computed): mean of raw members,
                # normalized once below — not mean-of-normalized
                np.add.at(acc_s, cells, raw)
            hit = np.nonzero(acc_n)[0]
            if len(hit) == 0:
                # an empty partition must yield NOTHING: an empty
                # DataFrame's [] column comes out float64-dtyped and
                # Arrow refuses the cast to list<double>
                return
            yield pd.DataFrame(
                {
                    "cell": hit.astype("int32"),
                    "n": acc_n[hit],
                    "sums": list(acc_s[hit]),
                }
            )

        rows = (
            slim.mapInPandas(partials, partial_schema)
            .groupBy("cell")
            .agg(
                F.sum("n").alias("n"),
                *[
                    F.sum(F.col("sums").getItem(i)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        bc.unpersist()
        new = centroids.copy()
        for row in rows:
            vec = np.array([row[f"s{i}"] for i in range(dim)]) / row["n"]
            if np.linalg.norm(vec) > 0:
                new[row["cell"]] = vec
        centroids = _normalize(new)
    return centroids


# k at or above this: assign through a coarse level (train ~sqrt(k)
# super-cells over the centroid matrix, assign vector -> nearest
# super-cells -> argmax within their children). Flat assignment is
# n*k*dim work — with the SemDeDup contract k ∝ n that is the quadratic
# centroid stage the r10 verdict flagged; two-level is ~n*2*sqrt(k)*dim.
# The threshold keeps every small-k consumer (the k<=16 registry
# queries, IVF defaults) on the bit-identical flat path.
TWO_LEVEL_MIN_K = 256
# super-cells probed per vector: 1 reproduces pure two-level speed;
# 2 (default) recovers most boundary-straddle misassignments for ~2x
# the (still tiny) coarse cost. Assignment stays approximate either
# way — a vector's true nearest centroid can live under an unprobed
# super-cell; SemDeDup/IVF consumers are recall-gated by design.
_COARSE_PROBES = 2


def _coarse_index(centroids):
    """Cluster the k centroids into ~sqrt(k) super-cells (numpy Lloyd,
    deterministic stride init) and return (super_centroids,
    child_cell_ids_per_super). Pure driver-side numpy on the k×dim
    matrix — no Spark jobs."""
    import numpy as np

    k = centroids.shape[0]
    s = max(2, int(np.ceil(np.sqrt(k))))
    sup = centroids[:: max(1, k // s)][:s].copy()
    for _ in range(3):
        a = (centroids @ sup.T).argmax(axis=1)
        for j in range(len(sup)):
            members = centroids[a == j]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    sup[j] = m / n
    a = (centroids @ sup.T).argmax(axis=1)
    children = [np.nonzero(a == j)[0] for j in range(len(sup))]
    # drop childless super-cells: probing one would yield an empty
    # candidate set (and argmax over it would crash)
    keep = [j for j, ch in enumerate(children) if len(ch)]
    return sup[keep], [children[j] for j in keep]


def _nearest_cells(mat, cent, coarse, p: int = 1):
    """Top-``p`` nearest cells per row of ``mat`` (normalized), either
    flat (coarse=None) or through the two-level index. Returns an
    (n, p) int array of cell ids, nearest first."""
    import numpy as np

    if coarse is None:
        sims = mat @ cent.T
        if p == 1:
            return sims.argmax(axis=1).reshape(-1, 1)
        # stable: on exact cosine ties probe-0 equals argmax (the
        # primary-cell tie-consistency contract materialize/incremental
        # state relies on — r10 ADVICE)
        return np.argsort(-sims, axis=1, kind="stable")[:, :p]
    sup, children = coarse
    nprobe = min(_COARSE_PROBES, len(sup))
    stop = np.argsort(-(mat @ sup.T), axis=1)[:, :nprobe]
    out = np.empty((len(mat), p), dtype=np.int64)
    order = np.lexsort(stop.T[::-1])
    lo = 0
    flat = stop[order]
    while lo < len(order):
        hi = lo + 1
        while hi < len(order) and (flat[hi] == flat[lo]).all():
            hi += 1
        rows = order[lo:hi]
        cand = np.unique(
            np.concatenate([children[j] for j in flat[lo]])
        )
        sims = mat[rows] @ cent[cand].T
        if p == 1:
            out[rows, 0] = cand[sims.argmax(axis=1)]
        else:
            pp = min(p, len(cand))
            top = np.argsort(-sims, axis=1, kind="stable")[:, :pp]
            out[rows, :pp] = cand[top]
            if pp < p:  # fewer candidate cells than probes: repeat last
                out[rows, pp:] = out[rows, pp - 1][:, None]
        lo = hi
    return out


def assign_cells(
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add the nearest-centroid ``cell`` column (map-side numpy argmax;
    two-level through :func:`_coarse_index` once k >= TWO_LEVEL_MIN_K)."""
    import numpy as np
    import pandas as pd

    sc = corpus.sparkSession.sparkContext
    coarse = (
        _coarse_index(centroids)
        if centroids.shape[0] >= TWO_LEVEL_MIN_K
        else None
    )
    bc = sc.broadcast((centroids, coarse))
    fields = corpus.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField("cell", T.IntegerType())]
    )
    cols = [f.name for f in fields]

    def run(batches):
        cent, crs = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            pdf = pdf.copy()
            pdf["cell"] = _nearest_cells(mat, cent, crs, 1)[:, 0].astype(
                "int32"
            )
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
