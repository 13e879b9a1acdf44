"""Extension-operator tests (E1-E5): dedup, similarity, text, multimodal."""

import math

import pytest
from pyspark.sql import functions as F

from entity_etl_spark.ext.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_near_dups,
    shingles,
    simhash_near_dups,
)
from entity_etl_spark.ext.multimodal import attach_binary, extract_features
from entity_etl_spark.ext.similarity import cosine, lsh_topk, topk_brute_force
from entity_etl_spark.ext.text import lang_id, quality_features, token_count

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "completely different content about spark query engines and shuffles"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(spark, docs):
    out = exact_dedup(docs, ["text"], "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3]


def test_shingles(spark, docs):
    row = docs.filter("doc_id = 1").select(shingles("text", 3).alias("s")).first()
    assert "the quick brown" in row["s"]
    assert all(len(s.split(" ")) == 3 for s in row["s"])


def test_shingles_short_text_empty(spark):
    df = spark.createDataFrame([(1, "two words")], ["doc_id", "text"])
    assert df.select(shingles("text", 3).alias("s")).first()["s"] == []


def test_jaccard_pairs_finds_near_and_exact_dups(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()}
    assert pairs[(1, 4)] == 1.0           # exact dup
    assert 0.5 <= pairs[(1, 2)] < 1.0     # near dup
    assert (1, 3) not in pairs            # unrelated


def test_minhash_lsh_agrees_with_exact(spark, docs):
    got = {(r["doc_a"], r["doc_b"]) for r in
           minhash_near_dups(docs, "doc_id", "text", verify_threshold=0.5).collect()}
    assert (1, 4) in got
    assert (1, 2) in got
    assert (1, 3) not in got


def test_simhash_near_dups(spark, docs):
    got = {(r["doc_a"], r["doc_b"]) for r in
           simhash_near_dups(docs, "doc_id", "text", max_hamming=3).collect()}
    assert (1, 4) in got        # identical text -> hamming 0
    assert (1, 3) not in got


def test_cosine_column(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], ["a", "b"]
    )
    vals = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert vals[0] == pytest.approx(1.0)
    assert vals[1] == pytest.approx(0.0)


@pytest.fixture()
def vectors(spark):
    rows = []
    for i in range(20):
        angle = i * math.pi / 40
        rows.append((i, [math.cos(angle), math.sin(angle)], 0))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_topk_brute_force(spark, vectors):
    out = topk_brute_force(vectors, vectors.filter("vec_id = 0"), k=3).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rnk"])] == [1, 2, 3]
    assert all(r["query_id"] == 0 for r in out)


def test_lsh_topk_subset_of_bucket(spark, vectors):
    out = lsh_topk(vectors, vectors.filter("vec_id = 0"), k=3, dim=2, n_planes=2)
    rows = out.collect()
    # approximate: every returned neighbor must be a real vector, ranked
    assert all(1 <= r["rnk"] <= 3 for r in rows)
    assert all(0 <= r["neighbor_id"] < 20 for r in rows)


def test_token_count_and_lang(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of the house"),
         (2, "el gato que la casa el perro que")],
        ["doc_id", "text"],
    )
    toks = {r["doc_id"]: r["n"] for r in
            df.select("doc_id", token_count("text").alias("n")).collect()}
    assert toks == {1: 8, 2: 8}
    langs = {r["doc_id"]: r["lang"] for r in
             df.select("doc_id", lang_id("text").alias("lang")).collect()}
    assert langs[1] == "en"
    assert langs[2] == "es"


def test_quality_features(spark):
    df = spark.createDataFrame([(1, "the cat sat on the mat")], ["doc_id", "text"])
    row = quality_features(df, "text").first()
    assert row["n_tokens"] == 6
    assert row["n_chars_calc"] == 22
    assert 0.0 <= row["quality_score"] <= 1.0
    assert row["stopword_ratio"] == pytest.approx(2 / 6, abs=1e-4)


def test_multimodal_plumbing(spark, docs):
    enriched = attach_binary(docs, "text")
    meta = enriched.select("doc_id", "media_meta.n_bytes").collect()
    assert all(r["n_bytes"] > 0 for r in meta)
    feats = extract_features(enriched, "doc_id", "media", mode="fake").collect()
    assert len(feats) == 4
    assert all(r["feat_dim"] == 64 and r["n_bytes"] > 0 for r in feats)
    # identical texts -> identical fake features (deterministic decode)
    by_id = {r["doc_id"]: r["feat_mean"] for r in feats}
    assert by_id[1] == by_id[4]


def test_multimodal_error_mode_raises(spark, docs):
    import py4j.protocol

    enriched = attach_binary(docs, "text")
    with pytest.raises(Exception):
        extract_features(enriched, "doc_id", "media", mode="error").collect()


def test_drop_near_dups_keeps_min_id_representative(spark, docs):
    from entity_etl_spark.ext.dedup import drop_near_dups

    out = drop_near_dups(docs, "doc_id", "text")
    kept = sorted(r["doc_id"] for r in out.collect())
    # 1,2,4 are a near-dup group -> only min id 1 survives; 3 unrelated
    assert kept == [1, 3]


def test_connected_components_chain_and_island(spark):
    from entity_etl_spark.ext.graph import connected_components

    # chain 1-2-3 (1~3 never directly paired) + island 7-8
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["doc_a", "doc_b"]
    )
    got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_near_dup_groups_transitive(spark, docs):
    from entity_etl_spark.ext.dedup import jaccard_pairs
    from entity_etl_spark.ext.graph import near_dup_groups

    pairs = jaccard_pairs(docs, "doc_id", "text", 3, 0.5)
    groups = {r["doc"]: r["group_rep"] for r in near_dup_groups(pairs).collect()}
    # 1,2,4 form one near-dup component labeled by min id 1
    assert groups[1] == 1 and groups[2] == 1 and groups[4] == 1
    assert 3 not in groups  # never in any pair


def test_topk_partition_heap_matches_brute_force(spark, vectors):
    from entity_etl_spark.ext.similarity import topk_brute_force, topk_partition_heap

    q = vectors.filter("vec_id IN (0, 10)")
    exact = {(r["query_id"], r["rnk"]): r["neighbor_id"]
             for r in topk_brute_force(vectors, q, k=3).collect()}
    heap = {(r["query_id"], r["rnk"]): r["neighbor_id"]
            for r in topk_partition_heap(vectors.repartition(4), q, k=3).collect()}
    assert heap == exact


def test_topk_auto_dispatch(spark, vectors):
    from entity_etl_spark.ext.similarity import topk, topk_brute_force

    q = vectors.filter("vec_id IN (0, 10)")
    exact = {(r["query_id"], r["rnk"]): r["neighbor_id"]
             for r in topk_brute_force(vectors, q, k=3).collect()}
    # force each strategy through the dispatcher + auto at both thresholds
    for kwargs in ({"strategy": "brute"}, {"strategy": "heap"},
                   {"strategy": "auto", "heap_threshold": 1},
                   {"strategy": "auto", "heap_threshold": 10**9}):
        got = {(r["query_id"], r["rnk"]): r["neighbor_id"]
               for r in topk(vectors, q, k=3, **kwargs).collect()}
        assert got == exact, kwargs


def test_ivf_topk_high_recall_on_clustered_data(spark):
    import math

    from entity_etl_spark.ext.ivf import ivf_topk, train_centroids
    from entity_etl_spark.ext.similarity import topk_brute_force

    # two tight clusters on the unit circle -> k-means separates them and
    # probing 1 cell of 2 already finds every true neighbor
    rows = []
    for i in range(30):
        base = 0.0 if i < 15 else math.pi
        a = base + (i % 15) * 0.01
        rows.append((i, [math.cos(a), math.sin(a)], 0))
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = vecs.filter("vec_id IN (0, 20)")

    exact = {(r["query_id"], r["neighbor_id"]) for r in
             topk_brute_force(vecs, q, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in
              ivf_topk(vecs, q, k=3, n_centroids=2, n_probe=1).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall == 1.0


def test_ivf_sampled_training_keeps_recall(spark):
    """sample_fraction trains Lloyd on a hash-sample only (the 100 TB
    shape: sample for training, full corpus for assignment) — on
    well-separated clusters the recall gate must hold unchanged."""
    import math

    from entity_etl_spark.ext.ivf import ivf_topk
    from entity_etl_spark.ext.similarity import topk_brute_force

    rows = []
    for i in range(60):
        base = 0.0 if i < 30 else math.pi
        a = base + (i % 30) * 0.01
        rows.append((i, [math.cos(a), math.sin(a)], 0))
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = vecs.filter("vec_id IN (0, 40)")

    exact = {(r["query_id"], r["neighbor_id"]) for r in
             topk_brute_force(vecs, q, k=3).collect()}
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            vecs, q, k=3, n_centroids=2, n_probe=1, sample_fraction=0.5
        ).collect()
    }
    assert len(exact & approx) / len(exact) == 1.0


def test_pq_sampled_training_keeps_recall(spark):
    """PQ codebooks trained on a hash-sample must still pass the
    reranked recall gate (encoding always runs full-corpus)."""
    import math

    from entity_etl_spark.ext.pq import (
        encode_pq,
        pq_topk_reranked,
        train_pq_codebooks,
    )
    from entity_etl_spark.ext.similarity import topk_brute_force

    rows = []
    for i in range(60):
        base = 0.0 if i < 30 else math.pi / 2
        a = base + (i % 30) * 0.01
        rows.append(
            (i, [math.cos(a), math.sin(a), math.cos(2 * a), math.sin(2 * a)])
        )
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = vecs.filter("vec_id IN (0, 40)")
    books = train_pq_codebooks(
        vecs, m=2, k=8, iterations=2, sample_fraction=0.5
    )
    codes = encode_pq(vecs, books)
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             topk_brute_force(vecs, q, k=3).collect()}
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk_reranked(
            vecs, codes, q, books, k=3, shortlist=10
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 2 / 3


def test_ivf_centroids_deterministic(spark):
    import numpy as np

    from entity_etl_spark.ext.ivf import train_centroids

    vecs = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3)], 0) for i in range(20)],
        ["vec_id", "embedding", "label"],
    )
    c1 = train_centroids(vecs, n_centroids=3, iterations=1)
    c2 = train_centroids(vecs, n_centroids=3, iterations=1)
    assert np.array_equal(c1, c2)


def test_lsh_multiprobe_recall_not_worse(spark, vectors):
    from entity_etl_spark.ext.similarity import lsh_topk, topk_brute_force

    q = vectors.filter("vec_id IN (0, 10)")
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             topk_brute_force(vectors, q, k=3).collect()}

    def recall(n_probe):
        got = {(r["query_id"], r["neighbor_id"]) for r in
               lsh_topk(vectors, q, k=3, dim=2, n_planes=2, n_probe=n_probe).collect()}
        return len(exact & got) / len(exact)

    assert recall(3) >= recall(1)  # probing more buckets never loses recall


def test_hash_sample_deterministic_and_stable_under_repartition(spark):
    from entity_etl_spark.ext.sampling import hash_sample

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 0.3).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(df.repartition(7), "doc_id", 0.3).collect()
    )
    assert a == b                      # layout-independent
    assert 0.25 < len(a) / 2000 < 0.35  # ~fraction


def test_train_val_test_split_stable_under_growth(spark):
    from entity_etl_spark.ext.sampling import train_val_test_split

    small = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    big = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    s_small = {r["doc_id"]: r["split"]
               for r in train_val_test_split(small, "doc_id").collect()}
    s_big = {r["doc_id"]: r["split"]
             for r in train_val_test_split(big, "doc_id").collect()}
    # growing the corpus never reassigns existing rows
    assert all(s_big[k] == v for k, v in s_small.items())
    assert set(s_big.values()) == {"train", "val", "test"}


def test_chunking_udtf_equals_builtin(spark):
    from entity_etl_spark.ext.chunking import chunk_documents, chunk_documents_builtin

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(250))),  # 4 chunks (stride 80)
            (2, "a b c"),                                 # 1 short chunk
            (3, ""),                                      # no chunks
            (4, None),                                    # no chunks
        ],
        ["doc_id", "text"],
    )
    kw = dict(size=100, stride=80)
    a = sorted(
        (r.doc_id, r.chunk_id, r.chunk, r.n_words)
        for r in chunk_documents(docs, **kw).collect()
    )
    b = sorted(
        (r.doc_id, r.chunk_id, r.chunk, r.n_words)
        for r in chunk_documents_builtin(docs, **kw).collect()
    )
    assert a == b
    assert [x[:2] for x in a] == [(1, 0), (1, 1), (1, 2), (1, 3), (2, 0)]
    # overlap: chunk 1 starts at word 80
    assert a[1][2].startswith("w80 ")
    assert a[4][3] == 3  # short doc: one 3-word chunk


def test_lsh_margin_probe_beats_or_ties_fixed(spark):
    """Margin-aware probing (flip least-confident planes) must never lose
    to fixed-position probing at the same probe budget, and must agree with
    single-probe when n_probe=1."""
    from entity_etl_spark.ext.similarity import lsh_topk, topk_brute_force

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 8")
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             topk_brute_force(emb, q, k=3).collect()}

    def recall(probe, n_probe):
        got = {(r["query_id"], r["neighbor_id"]) for r in
               lsh_topk(emb, q, k=3, dim=64, n_planes=6,
                        n_probe=n_probe, probe=probe).collect()}
        return len(exact & got) / len(exact)

    assert recall("margin", 1) == recall("fixed", 1)  # same base bucket
    r_margin, r_fixed = recall("margin", 3), recall("fixed", 3)
    assert r_margin >= r_fixed
    assert r_margin >= recall("margin", 1)


# --------------------------------------------------- prefix filter (r6)
def test_prefix_filter_pairs_equals_exact_join(spark, docs):
    from entity_etl_spark.ext.dedup import prefix_filter_pairs

    for t in (0.5, 0.7):
        exact = {tuple(r) for r in
                 jaccard_pairs(docs, "doc_id", "text", 3, t).collect()}
        pf = {tuple(r) for r in
              prefix_filter_pairs(docs, "doc_id", "text", 3, t).collect()}
        assert pf == exact


def test_prefix_filter_pairs_near_threshold_recall(spark):
    # pairs sitting EXACTLY on the threshold boundary — the regime where
    # LSH misses (r5 sf1 finding) and where prefix-length / length-filter
    # float slop would bite. With k=1 token shingles:
    #   J(1,2) = |{a,b}| / |{a,b,c,d}|     = 2/4 = 0.5 exactly, and the
    #     pair also sits ON the length-filter boundary (min=2 == t*max);
    #   J(3,4) = |{a,c}| / |{a,c,e,f}|     = 2/4 = 0.5 exactly at equal
    #     sizes (prefix length n - ceil(t*n) + 1 = 2 of 3: t*n landing
    #     between integers).
    df = spark.createDataFrame(
        [
            (1, "a b c d"),  # shingle-1 set {a,b,c,d} (k=1 tokens)
            (2, "a b"),
            (3, "a c e"),
            (4, "a c f"),
            (5, "x y z w"),
        ],
        ["doc_id", "text"],
    )
    from entity_etl_spark.ext.dedup import prefix_filter_pairs

    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             jaccard_pairs(df, "doc_id", "text", 1, 0.5).collect()}
    pf = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
          prefix_filter_pairs(df, "doc_id", "text", 1, 0.5).collect()}
    # the exactly-at-threshold pairs MUST be found by both paths: a
    # regression in the ceil/eps prefix or length math shows up here
    assert exact == pf
    assert pf[(1, 2)] == 0.5 and pf[(3, 4)] == 0.5


def test_prefix_filter_pairs_sf_corpus_equality(spark):
    from entity_etl_spark.ext.dedup import prefix_filter_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {tuple(r) for r in
             jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()}
    pf = {tuple(r) for r in
          prefix_filter_pairs(docs, "doc_id", "text", 3, 0.5).collect()}
    assert pf == exact and len(exact) > 0


# ------------------------------------- exact incremental near-dup (r6)
def test_exact_neardup_incremental_policy_and_state(spark):
    from entity_etl_spark.ext.dedup import exact_neardup_dedup_incremental

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the bank")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            # near-dup of corpus doc 1 -> dropped
            (10, "the quick brown fox jumps over the lazy dog near the bend"),
            # novel -> kept
            (11, "completely different content about spark query engines ok"),
            # in-batch near-dup of 11 (smaller id wins) -> dropped
            (12, "completely different content about spark query engines no"),
        ],
        ["doc_id", "text"],
    )
    kept, state = exact_neardup_dedup_incremental(corpus, batch)
    assert sorted(r["doc_id"] for r in kept.collect()) == [11]
    # state = corpus shingles + survivors' shingles only
    state_docs = sorted(
        r["doc"] for r in state.select("doc").distinct().collect()
    )
    assert state_docs == [1, 11]

    # increment 2 against the PERSISTED state, duplicated rows simulating
    # an at-least-once replayed append — dedup on load must keep counts
    # exact (duplicated shingles would corrupt the intersection math)
    state2 = state.unionByName(state)  # worst-case full duplication
    batch2 = spark.createDataFrame(
        [
            # near-dup of KEPT doc 11 -> dropped via state, not bodies
            (20, "completely different content about spark query engines yes"),
            (21, "a wholly novel sentence with nothing shared at all here"),
        ],
        ["doc_id", "text"],
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    kept2, state3 = exact_neardup_dedup_incremental(
        empty, batch2, corpus_shingles=state2, new_shingles_only=True
    )
    assert sorted(r["doc_id"] for r in kept2.collect()) == [21]
    assert sorted(
        r["doc"] for r in state3.select("doc").distinct().collect()
    ) == [21]


def test_exact_neardup_incremental_matches_batch_policy_on_sf(spark):
    """Chained increments over the sf0.001 corpus reproduce the batch
    keep-min-id policy (the contract the streaming prep query's oracle
    unrolls). NOTE the two policies coincide only when dropped docs don't
    chain (incremental dedups later batches against KEPT docs only; batch
    mode drops the greater side of every pair) — true on this corpus's
    planted-dup structure, which is what this regression pins."""
    from entity_etl_spark.ext.dedup import (
        drop_near_dups,
        exact_neardup_dedup_incremental,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    empty = docs.limit(0).select("doc_id", "text")
    state = None
    kept_all = []
    for b in range(3):
        batch = docs.filter(
            (F.col("doc_id") * 3 / n >= b) & (F.col("doc_id") * 3 / n < b + 1)
        ).select("doc_id", "text")
        kept, state = exact_neardup_dedup_incremental(
            empty, batch, corpus_shingles=state
        )
        kept_all += [r["doc_id"] for r in kept.collect()]
    batch_kept = [
        r["doc_id"]
        for r in drop_near_dups(docs, "doc_id", "text").select("doc_id").collect()
    ]
    assert sorted(kept_all) == sorted(batch_kept)


def test_drop_near_dups_methods_agree(spark, docs):
    from entity_etl_spark.ext.dedup import drop_near_dups

    base = sorted(
        r["doc_id"]
        for r in drop_near_dups(docs, "doc_id", "text").collect()
    )
    for m in ("prefix", "minhash"):
        got = sorted(
            r["doc_id"]
            for r in drop_near_dups(docs, "doc_id", "text", method=m).collect()
        )
        assert got == base, m


# ------------------------------------------------- random projection (r6)
def test_random_projection_matrix_deterministic_and_balanced():
    from entity_etl_spark.ext.projection import signed_projection_matrix

    m1 = signed_projection_matrix(7, 16, 64)
    m2 = signed_projection_matrix(7, 16, 64)
    assert m1 == m2
    assert signed_projection_matrix(8, 16, 64) != m1  # seed matters
    flat = [v for row in m1 for v in row]
    assert set(flat) == {1, -1}
    # md5 bits are balanced: the +1 fraction should be near 1/2
    assert 0.4 < flat.count(1) / len(flat) < 0.6


def test_random_projection_preserves_distances(spark):
    # JL contract: squared pairwise distances preserved in expectation.
    # 10 deterministic 64-dim vectors; after projecting to 16 dims the
    # distance RATIO distribution must center near 1 (tolerances wide:
    # variance is O(1/out_dim) per pair).
    import math
    import random

    from entity_etl_spark.ext.projection import random_project

    rng = random.Random(13)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(10)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    proj = {
        (r["vec_id"], r["dim"]): r["value"]
        for r in random_project(
            df, "vec_id", "embedding", in_dim=64, out_dim=16, seed=7
        ).collect()
    }
    assert len(proj) == 160
    ratios = []
    for a in range(10):
        for b in range(a + 1, 10):
            d_orig = math.dist(vecs[a][1], vecs[b][1])
            d_proj = math.dist(
                [proj[(a, j)] for j in range(16)],
                [proj[(b, j)] for j in range(16)],
            )
            ratios.append((d_proj / d_orig) ** 2)
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3
    assert all(0.2 < r < 2.5 for r in ratios)


def test_random_projection_rejects_non_power_of_two_scale(spark):
    import pytest as _pytest

    from entity_etl_spark.ext.projection import random_project

    df = spark.createDataFrame([(1, [0.0] * 64)], ["vec_id", "embedding"])
    with _pytest.raises(ValueError):
        random_project(df, out_dim=9)


def test_rp_lsh_topk_recalls_clustered_neighbors(spark):
    # SRP-LSH earns its keep on CLUSTERED data (tight angular clusters
    # agree on every sign bit; near-uniform corpora are the documented
    # weak regime — the registry's distance-preservation query is the
    # JL contract, not ANN). 3 tight clusters of 30 vectors: each
    # query's true top-5 live in its own cluster, which shares the
    # exact bucket, so recall should be ~1.
    import random

    from entity_etl_spark.ext.projection import rp_lsh_topk
    from entity_etl_spark.ext.similarity import topk_brute_force

    rng = random.Random(5)
    centers = [
        [10.0 if d % 3 == c else 0.1 for d in range(64)] for c in range(3)
    ]
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [v + rng.uniform(-0.05, 0.05) for v in c]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") < 3)  # one query per cluster
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             topk_brute_force(emb, q, "vec_id", "embedding", k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in
              rp_lsh_topk(emb, q, "vec_id", "embedding", k=5).collect()}
    assert len(exact & approx) / len(exact) >= 0.8


def test_rp_distance_preservation_jl_bound(spark):
    # the aggregate JL statement over the registry query's own output:
    # mean squared-distance ratio ~ 1, spread bounded (var ~ 2/out_dim)
    from entity_etl_spark.queries import REGISTRY

    rows = REGISTRY["embedding_rp_distance_preservation"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    ratios = [r["d2_ratio"] for r in rows]
    assert len(ratios) > 1000
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15
    # individual pairs stay within loose multiplicative JL bounds
    assert sum(1 for r in ratios if 0.3 < r < 2.2) / len(ratios) > 0.98


def test_exact_neardup_incremental_replayed_batch_docs_in_state(spark):
    # Source-level redelivery: doc 5 was appended to the shingle state by
    # increment 1, and increment 2's batch REDELIVERS doc 5 alongside the
    # genuinely-new doc 6. Without excluding the state copy of batch
    # docs, doc 5's shingles appear twice in all_sh while doc 6's appear
    # once — the ASYMMETRIC doubling that corrupts the pair: with
    # na=nb=6 and i=3 shared shingles, J(5,6) = 3/9 = 0.333 (keep 6)
    # but the corrupted count reads 2i/(2na+nb-2i) = 6/12 = 0.5 (wrong
    # drop). A symmetric replay (both docs doubled) cancels out, which
    # is why this fixture pins the asymmetric case.
    from entity_etl_spark.ext.dedup import exact_neardup_dedup_incremental

    empty = spark.createDataFrame([], "doc_id long, text string")
    doc5 = (5, "a b c d e f g h")       # shingles: abc bcd cde def efg fgh
    doc6 = (6, "d e f g h p q r")       # shares exactly {def, efg, fgh}
    inc1 = spark.createDataFrame([doc5], ["doc_id", "text"])
    kept1, state = exact_neardup_dedup_incremental(empty, inc1)
    assert [r["doc_id"] for r in kept1.collect()] == [5]

    inc2 = spark.createDataFrame([doc5, doc6], ["doc_id", "text"])
    kept2, _ = exact_neardup_dedup_incremental(
        empty, inc2, corpus_shingles=state
    )
    # doc 6 is NOT a near-dup of doc 5 (J = 0.333 < 0.5): it must be
    # kept, redelivery of doc 5 notwithstanding
    assert sorted(r["doc_id"] for r in kept2.collect()) == [5, 6]


def test_exact_neardup_incremental_mixed_schema_state_dir(spark):
    """A pre-r11 (doc, sh) state dir that later received (doc, sh, n)
    appends loads as 3-col with n NULL on the legacy rows (plain schema
    inference picks one footer). The op must re-derive those docs'
    sizes — a NULL n makes the Jaccard predicate NULL and silently KEEPS
    every near-dup of a legacy corpus doc (r11 review finding)."""
    from entity_etl_spark.ext.dedup import (
        _shingle_rows_with_size,
        exact_neardup_dedup_incremental,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the bank"),
            (2, "completely different content about spark query engines ok"),
        ],
        ["doc_id", "text"],
    )
    state = _shingle_rows_with_size(corpus, "doc_id", "text", 3)
    # doc 1 = legacy rows (n NULL, as a mixed-dir load yields); doc 2 =
    # post-upgrade rows (n present)
    mixed = state.withColumn(
        "n", F.when(F.col("doc") == 1, F.lit(None)).otherwise(F.col("n"))
    )
    batch = spark.createDataFrame(
        [
            # near-dup of LEGACY doc 1 -> must drop (NULL-n bug kept it)
            (10, "the quick brown fox jumps over the lazy dog near the bend"),
            # near-dup of upgraded doc 2 -> drops either way
            (11, "completely different content about spark query engines no"),
            (12, "a wholly novel sentence with nothing shared at all here"),
        ],
        ["doc_id", "text"],
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    kept, _ = exact_neardup_dedup_incremental(
        empty, batch, corpus_shingles=mixed, new_shingles_only=True
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [12]

    # legacy (no n column at all) + replay-duplicated rows: sizes must
    # come from the DEDUPED rows (duplicated counts would halve every
    # Jaccard and wrongly keep near-dups)
    legacy = state.drop("n")
    dup = legacy.unionByName(legacy)
    kept2, _ = exact_neardup_dedup_incremental(
        empty, batch, corpus_shingles=dup, new_shingles_only=True
    )
    assert sorted(r["doc_id"] for r in kept2.collect()) == [12]


def test_exact_neardup_incremental_two_table_state(spark):
    """r12 two-table state: narrow (doc, sh) + (doc, n) sizes must give
    the same kept set and delta as the single-table (doc, sh, n) layout,
    including under replay-duplicated rows in EITHER table and a
    replayed batch whose docs already sit in both tables."""
    from entity_etl_spark.ext.dedup import exact_neardup_dedup_incremental

    empty = spark.createDataFrame([], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the bank"),
            (2, "completely different content about spark query engines ok"),
        ],
        ["doc_id", "text"],
    )
    _, state = exact_neardup_dedup_incremental(empty, corpus)
    batch = spark.createDataFrame(
        [
            (2, "completely different content about spark query engines ok"),
            (10, "the quick brown fox jumps over the lazy dog near the bend"),
            (11, "completely different content about spark query engines no"),
            (12, "a wholly novel sentence with nothing shared at all here"),
        ],
        ["doc_id", "text"],
    )
    kept_single, delta_single = exact_neardup_dedup_incremental(
        empty, batch, corpus_shingles=state, new_shingles_only=True
    )
    # two-table: same state split into narrow shingles + sizes, each
    # with worst-case full replay duplication
    narrow = state.select("doc", "sh")
    sizes = state.select("doc", "n").dropDuplicates(["doc"])
    kept_two, delta_two = exact_neardup_dedup_incremental(
        empty,
        batch,
        corpus_shingles=narrow.unionByName(narrow),
        corpus_sizes=sizes.unionByName(sizes),
        new_shingles_only=True,
    )
    assert sorted(r["doc_id"] for r in kept_two.collect()) == sorted(
        r["doc_id"] for r in kept_single.collect()
    )
    assert sorted(
        (r["doc"], r["sh"], r["n"]) for r in delta_two.collect()
    ) == sorted((r["doc"], r["sh"], r["n"]) for r in delta_single.collect())
    # full-state return keeps the (doc, sh, n) shape in two-table mode
    _, full = exact_neardup_dedup_incremental(
        empty, batch, corpus_shingles=narrow, corpus_sizes=sizes
    )
    assert set(full.columns) == {"doc", "sh", "n"}


def test_exact_neardup_incremental_heterogeneous_mixed_doc(spark):
    """A doc with state rows in BOTH layouts (a batch replayed across
    the layout upgrade): after dedup its rows are an arbitrary
    null/non-null n mix. Counting only the null subset understates n and
    OVERSTATES Jaccard (the r11 repair's blind spot, r11 ADVICE) — the
    repair must recount over ALL of the doc's deduped rows."""
    from pyspark.sql import functions as F

    from entity_etl_spark.ext.dedup import (
        _shingle_rows_with_size,
        exact_neardup_dedup_incremental,
    )

    corpus = spark.createDataFrame(
        [(5, "a b c d e f g h")], ["doc_id", "text"]  # 6 distinct shingles
    )
    rows = _shingle_rows_with_size(corpus, "doc_id", "text", 3)
    # exactly the 3 SHARED shingles carry NULL n (the pre-upgrade rows
    # the (doc, sh) dedup kept), the other 3 carry n=6: the null-subset
    # recount then reads n=3, and every pair row that matters carries
    # the undercounted value — J = 3/(3 + 6 - 3) = 0.5 >= 0.5, the
    # wrong drop (doc 6's true J is 3/9). Pinned deterministic so the
    # broken repair ALWAYS fails, not only when a hash cooperates.
    shared = ("d e f", "e f g", "f g h")
    mixed = rows.withColumn(
        "n",
        F.when(
            F.col("sh").isin(*shared),
            F.lit(None).cast(rows.schema["n"].dataType),
        ).otherwise(F.col("n")),
    )
    assert mixed.filter(F.col("n").isNull()).count() == 3
    batch = spark.createDataFrame(
        [(6, "d e f g h p q r")], ["doc_id", "text"]
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    kept, _ = exact_neardup_dedup_incremental(
        empty, batch, corpus_shingles=mixed, new_shingles_only=True
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [6]
