"""Product-quantization ANN (E3 scale path #3 — the memory-bound regime).

IVF prunes WHICH vectors to score; PQ shrinks WHAT is scored: each vector
is split into M subvectors, each quantized to its nearest codeword from a
per-subspace codebook (K entries), so a 64-dim float vector becomes M
small codes (M=8, K=16 → 8 nibbles = 4 bytes, a 64× compression). Queries
score codes with asymmetric distance computation (ADC): one M×K lookup
table of exact query-subvector·codeword dot products per query, then a
score is just M table lookups + adds — no float vector is ever touched at
scan time. At 100 TB this is the difference between scanning 25 TB of
floats and 400 GB of codes.

Spark shape (mirrors ivf.py):

- training: per-iteration assignment is map-side numpy against broadcast
  codebooks; the update is ONE groupBy over (subspace, cluster) partial
  sums — only M×K×(dim/M) floats reach the driver;
- encoding: one Arrow ``mapInPandas`` pass → (id, array<int> codes);
- search: broadcast (query LUTs) + per-partition numpy gather/top-k, final
  window over |partitions|·|queries|·k rows (the partition-heap pattern).

Determinism note: codebooks come from distributed float k-means, so codes
can wobble at cluster boundaries across runs — correctness is therefore
gated as recall-vs-exact (like IVF), never a pinned result set.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


class PQCodebooks(NamedTuple):
    codebooks: "object"  # numpy (M, K, dsub) float64
    m: int
    k: int


from .ivf import _normalize  # shared zero-guarded row normalization


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    iterations: int = 2,
    sample_fraction: float | None = None,
) -> PQCodebooks:
    """Per-subspace k-means codebooks over unit-normalized vectors.

    Init: the k vectors with the smallest xxhash64(id) seed every
    subspace (deterministic, no RNG). Each Lloyd iteration runs ONE
    distributed pass: per-row numpy assignment against the broadcast
    codebooks, then a (subspace, cluster) aggregation of partial sums.

    ``sample_fraction``: train the codebooks on a deterministic
    hash-sample (``ext.sampling.hash_sample``) — codeword quality needs
    a representative sample, not the full corpus; encoding
    (:func:`encode_pq`) always runs over every row. The standard
    100 TB shape: sample for Lloyd, full-scan once for codes."""
    import numpy as np

    if sample_fraction is not None:
        from .sampling import hash_sample

        corpus = hash_sample(corpus, id_col, sample_fraction)
    seed_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(k)
        .collect()
    )
    seeds = _normalize(np.array([r[1] for r in seed_rows], dtype=np.float64))
    dim = seeds.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = np.stack(
        [seeds[:, j * dsub : (j + 1) * dsub].copy() for j in range(m)]
    )  # (M, K, dsub)

    sc = corpus.sparkSession.sparkContext
    schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType()),
            T.StructField("cl", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("vsum", T.ArrayType(T.DoubleType())),
        ]
    )
    for _ in range(iterations):
        bb = sc.broadcast(books)

        def partials(batches):
            import numpy as _np
            import pandas as _pd

            bk = bb.value
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = _normalize(
                    _np.array(list(pdf[vec_col]), dtype=_np.float64)
                )
                rows = []
                for j in range(m):
                    sub = mat[:, j * dsub : (j + 1) * dsub]
                    # nearest codeword by dot product (spherical)
                    assign = _np.argmax(sub @ bk[j].T, axis=1)
                    for c in _np.unique(assign):
                        mask = assign == c
                        rows.append(
                            (
                                j,
                                int(c),
                                int(mask.sum()),
                                sub[mask].sum(axis=0).tolist(),
                            )
                        )
                yield _pd.DataFrame(rows, columns=["sub", "cl", "n", "vsum"])

        agg = (
            corpus.select(vec_col)
            .mapInPandas(partials, schema)
            .groupBy("sub", "cl")
            .agg(
                F.sum("n").alias("n"),
                F.array(
                    *[
                        F.sum(F.element_at("vsum", i + 1)).alias(f"d{i}")
                        for i in range(dsub)
                    ]
                ).alias("vsum"),
            )
            .collect()
        )
        new_books = books.copy()
        for r in agg:
            if r["n"]:
                v = np.array(r["vsum"], dtype=np.float64) / r["n"]
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    new_books[r["sub"], r["cl"]] = v / nrm
        books = new_books
        bb.unpersist()
    return PQCodebooks(codebooks=books, m=m, k=k)


def encode_pq(
    corpus: DataFrame,
    books: PQCodebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length M) — the compressed index."""
    import numpy as np

    sc = corpus.sparkSession.sparkContext
    bb = sc.broadcast(books.codebooks)
    m = books.m
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def enc(batches):
        import pandas as pd

        bk = bb.value
        dsub = bk.shape[2]
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            codes = np.stack(
                [
                    np.argmax(mat[:, j * dsub : (j + 1) * dsub] @ bk[j].T, axis=1)
                    for j in range(m)
                ],
                axis=1,
            )
            yield pd.DataFrame(
                {"vec_id": pdf[id_col], "codes": list(codes.astype(int))}
            )

    return corpus.select(id_col, vec_col).mapInPandas(enc, schema)


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    books: PQCodebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ADC search: per-query M×K lookup tables (exact query-subvector ·
    codeword dots), scores via numpy gather over the code matrix, local
    top-k per partition, tiny global reduce."""
    import numpy as np

    # query side only (queries << corpus by contract); row-cap guarded —
    # a caller passing the corpus as the query set gets an error, not OOM
    from .similarity import _collect_matrix

    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col, "PQ query")
    bk = books.codebooks
    m, dsub = books.m, bk.shape[2]
    # LUT[q, j, c] = <query_j_sub, codeword_c>
    luts = np.stack(
        [
            np.stack(
                [q_mat[:, j * dsub : (j + 1) * dsub] @ bk[j].T for j in range(m)],
                axis=1,
            )
        ]
    )[0]  # (Q, M, K)
    sc = codes.sparkSession.sparkContext
    b = sc.broadcast((q_ids, luts))
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def search(batches):
        import pandas as pd

        ids_l, luts_l = b.value
        nq = len(ids_l)
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf["codes"]), dtype=np.int64)  # (N, M)
            # scores (N, Q): sum over subspaces of LUT[q, j, code]
            scores = np.zeros((len(cids), nq))
            for j in range(m):
                scores += luts_l[:, j, :][:, cmat[:, j]].T  # (N, Q)
            top = min(k + 1, len(cids))
            part = np.argpartition(-scores, top - 1, axis=0)[:top]
            rows = []
            for qi in range(nq):
                for ci in part[:, qi]:
                    if cids[ci] != ids_l[qi]:
                        rows.append(
                            (
                                int(ids_l[qi]),
                                int(cids[ci]),
                                round(float(scores[ci, qi]), 6),
                            )
                        )
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    local = codes.mapInPandas(search, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        local.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def pq_topk_reranked(
    corpus: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    books: PQCodebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int | None = None,
) -> DataFrame:
    """The production PQ shape: ADC over codes produces a cheap shortlist
    (``shortlist`` candidates/query), then ONLY the shortlisted vectors are
    fetched and scored exactly — recall recovers to near-exact while the
    scan still touches codes, not floats.

    ``shortlist=None`` auto-scales it to ``max(50, 1% of the corpus)``:
    ADC ranking error grows with corpus size (more distractors inside one
    quantization cell), so a FIXED shortlist silently loses recall as the
    corpus grows — the r5 sf1 rehearsal watched the recall gate flip false
    at 10x data with shortlist=50 (same lesson as SemDeDup's auto-k). The
    one count job runs against ``corpus`` — the same row count as codes
    (encode_pq is 1:1) WITHOUT executing the encode lineage a second
    time (a parquet-backed corpus answers from footer stats); pass an
    explicit int to pin cost when the corpus size is known."""
    from .similarity import cosine

    if shortlist is None:
        shortlist = max(50, -(-corpus.count() // 100))
    cand = pq_topk(
        codes, queries, books, id_col, vec_col, k=shortlist
    ).select("query_id", "neighbor_id")
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = (
        cand.join(vecs, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("score", F.round(cosine(F.col("__cv"), F.col("__qv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )
