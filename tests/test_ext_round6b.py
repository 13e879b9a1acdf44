"""Round-6b extension operators: containment near-dup pairs, the Gopher
quality gate, and the k-means assignment step — hand-computed fixtures
(the parity harness checks the registry form; these pin the math)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_containment_pairs_detects_subsumption_jaccard_misses(spark):
    """A short doc quoted verbatim inside a long one: containment of the
    short side is exactly 1.0 while Jaccard is far below any near-dup
    threshold — the case this operator exists for."""
    from entity_etl_spark.ext.dedup import containment_pairs, jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    long = (
        short
        + " zeta eta theta iota kappa lmbda mu nu xi omicron pi rho sigma"
        + " tau upsilon phi chi psi omega one two three four five six"
    )
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r
        for r in containment_pairs(
            docs, "doc_id", "text", k=3, threshold=0.8
        ).collect()
    }
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    # doc 1 has 5 tokens -> 3 distinct 3-shingles, all present in doc 2
    assert r.containment_a == 1.0
    assert r.max_containment == 1.0
    n_long_shingles = len(long.split()) - 2  # all distinct by construction
    assert r.containment_b == round(3 / n_long_shingles, 6)
    # and Jaccard at the same 0.5 near-dup threshold does NOT pair them
    jac = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).collect()
    assert jac == []


def test_containment_pairs_threshold_excludes_partial_overlap(spark):
    from entity_etl_spark.ext.dedup import containment_pairs

    # 6 tokens -> 4 shingles; docs share exactly 2 of 4 (containment 0.5)
    a = "w1 w2 w3 w4 w5 w6"
    b = "w1 w2 w3 w4 x5 x6"
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    assert (
        containment_pairs(docs, "doc_id", "text", k=3, threshold=0.8).count()
        == 0
    )
    got = containment_pairs(
        docs, "doc_id", "text", k=3, threshold=0.5
    ).collect()
    assert len(got) == 1 and got[0].max_containment == 0.5


def test_gopher_gate_each_rule_fires_on_its_own_fixture(spark):
    from entity_etl_spark.ext.text import gopher_gate

    good = (
        "the quick brown fox jumps over that lazy dog and runs away with "
        "great speed to be sure of having covered enough distinct ground "
        "for every single rule check here today"
    )
    rows = [
        (1, good),
        (2, "the of and that have with be to"),  # < 20 tokens
        (3, " ".join(["the", "be", "of"] + ["supercalifragilistic"] * 30)),
        (4, "the be " + "# " * 40 + " ".join(["word"] * 20)),  # hash ratio
        (5, "the be with that\n" + "\n".join(["item ends..."] * 9)),
        (6, "\n".join(["- the bullet be of line %d here" % i for i in range(10)])),
        (7, " ".join("tok%d" % i for i in range(30))),  # no required words
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_gate(docs).collect()}

    assert got[1].keep and all(
        got[1][c] for c in got[1].asDict() if c.startswith("rule_")
    )
    assert not got[2].rule_token_count and not got[2].keep
    assert not got[3].rule_mean_word_len and not got[3].keep
    assert not got[4].rule_hash_ratio and not got[4].keep
    # doc 5: 9 of 10 nonempty lines end in '...' -> frac 0.9 > 0.3
    assert got[5].ellipsis_line_frac == 0.9
    assert not got[5].rule_ellipsis_lines and not got[5].keep
    # doc 6: every line is a bullet -> frac 1.0 > 0.9
    assert got[6].bullet_line_frac == 1.0
    assert not got[6].rule_bullet_lines and not got[6].keep
    assert got[7].required_word_hits == 0
    assert not got[7].rule_required_words and not got[7].keep


def test_gopher_gate_mean_word_len_is_exact_over_tokens(spark):
    from entity_etl_spark.ext.text import gopher_gate

    # "aa   bbbb" with a whitespace run: 2 tokens, 6 chars -> 3.0 exactly
    docs = spark.createDataFrame(
        [(1, "aa   bbbb")], "doc_id long, text string"
    )
    r = gopher_gate(docs).collect()[0]
    assert r.n_tokens == 2 and r.mean_word_len == 3.0


def test_gopher_gate_is_map_only(spark):
    """The gate must stay a pre-shuffle filter: no Exchange in the plan."""
    from entity_etl_spark.ext.text import gopher_gate

    docs = spark.createDataFrame(
        [(1, "the be of")], "doc_id long, text string"
    )
    plan = gopher_gate(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_assign_nearest_centroid_argmin_and_tiebreak(spark):
    from entity_etl_spark.ext.similarity import assign_nearest_centroid

    emb = spark.createDataFrame(
        [
            (10, [0.0, 0.0]),
            (11, [4.0, 0.0]),
            (12, [2.0, 0.0]),  # equidistant (dist2 = 4.0) -> lowest cluster
            (13, [3.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    cents = [(0, [0.0, 0.0]), (1, [4.0, 0.0])]
    got = {
        r.vec_id: r
        for r in assign_nearest_centroid(emb, cents, "vec_id", "embedding").collect()
    }
    assert (got[10].cluster, got[10].dist2) == (0, 0.0)
    assert (got[11].cluster, got[11].dist2) == (1, 0.0)
    assert (got[12].cluster, got[12].dist2) == (0, 4.0)  # tie -> cluster 0
    assert (got[13].cluster, got[13].dist2) == (1, 2.0)


def test_assign_nearest_centroid_is_zero_shuffle(spark):
    from entity_etl_spark.ext.similarity import assign_nearest_centroid

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    plan = (
        assign_nearest_centroid(emb, [(0, [1.0, 1.0]), (1, [2.0, 2.0])])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_kmeans_lloyd_second_iteration_flips_assignment(spark):
    """Exactly-representable 1-D fixture: point X starts nearer seed 1,
    but after the centroid update (c0 -> 1.5, c1 -> 11.75) it flips to
    cluster 0 — pinning that the update/re-assign loop actually runs."""
    from entity_etl_spark.ext.similarity import kmeans_lloyd

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),   # seed 0
            (1, [10.0, 0.0]),  # seed 1
            (2, [3.0, 0.0]),
            (3, [20.0, 0.0]),
            (4, [5.25, 0.0]),  # X: iter1 -> 1 (22.5625 < 27.5625), iter2 -> 0
        ],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [0.0, 0.0]), (1, [10.0, 0.0])]
    one = {
        r.vec_id: r.cluster
        for r in kmeans_lloyd(emb, cents, n_iter=1).collect()
    }
    assert one == {0: 0, 1: 1, 2: 0, 3: 1, 4: 1}
    two = {
        r.vec_id: (r.cluster, r.dist2)
        for r in kmeans_lloyd(emb, cents, n_iter=2).collect()
    }
    # c0 = mean(0, 3) = 1.5; c1 = mean(10, 20, 5.25) = 11.75 (exact)
    assert two[4] == (0, 14.0625)  # (5.25 - 1.5)^2 — the flip
    assert two[0] == (0, 2.25)
    assert two[1] == (1, 3.0625)
    assert two[2] == (0, 2.25)
    assert two[3] == (1, 68.0625)


def test_kmeans_lloyd_drops_emptied_cluster(spark):
    """A seed that captures no members after re-assignment disappears —
    the deterministic empty-cluster policy both engines replay."""
    from entity_etl_spark.ext.similarity import kmeans_lloyd

    emb = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0]), (2, [2.0])],
        "vec_id long, embedding array<double>",
    )
    # iter1: every point is nearer seed 0 (max dist2 4 < 2304), so
    # cluster 1 captures NOTHING and must vanish from the centroid list;
    # the re-assignment runs against c0 = mean(0,1,2) = 1.0 alone
    cents = [(0, [0.0]), (1, [50.0])]
    got = {
        r.vec_id: (r.cluster, r.dist2)
        for r in kmeans_lloyd(emb, cents, n_iter=2).collect()
    }
    assert got == {0: (0, 1.0), 1: (0, 0.0), 2: (0, 1.0)}


def _stage_two_batches(tmp_path, spark, rows):
    """rows: list of (vec_id, [floats], batch) — staged via the same
    mtime-ordered helper the registry queries use."""
    import os

    from entity_etl_spark.queries import _stage_bucketed_batches

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, __b int"
    )
    _stage_bucketed_batches(str(tmp_path), in_dir, df, 2)
    return in_dir


def _run_km(spark, tmp_path, in_dir, seeds, tag):
    from entity_etl_spark.ext.similarity import run_streaming_kmeans

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    state = str(tmp_path / f"state_{tag}")
    run_streaming_kmeans(
        spark,
        stream,
        state,
        str(tmp_path / f"ckpt_{tag}"),
        seeds=seeds,
        vec_col="embedding",
        timeout_sec=300.0,
    )
    return state


def test_streaming_kmeans_running_mean_hand_fixture(spark, tmp_path):
    """1-D fixture, exact values, with a point that DISTINGUISHES the
    running-mean state from the seeds: after batch 1, c0's mean is 2.0
    (not the seed 0.0), so 5.5 in batch 2 assigns to cluster 0
    (|5.5-2| < |5.5-10|) where a seeds-only regression would send it to
    cluster 1 (|5.5-10| < |5.5-0|) — the sequential semantics are load-
    bearing in the assertion, not coincident with the seeds."""
    from entity_etl_spark.ext.similarity import (
        _km_centroids,
        read_kmeans_state,
    )

    rows = [
        (0, [2.0], 0),    # -> cluster 0 (4 < 64); c0 mean becomes 2.0
        (1, [10.0], 0),   # -> cluster 1; c1 mean stays 10.0
        (4, [5.5], 1),    # running: -> 0 (12.25 < 20.25); seeds: -> 1
        (12, [12.0], 1),  # -> cluster 1 either way
    ]
    seeds = [(0, [0.0]), (1, [10.0])]
    in_dir = _stage_two_batches(tmp_path, spark, rows)
    state_dir = _run_km(spark, tmp_path, in_dir, seeds, "hand")
    state = read_kmeans_state(spark, state_dir)
    got = {
        (r.cluster, r.pos): (float(r.s), r.m) for r in state.collect()
    }
    # c0 folded {2, 5.5}: s=7.5, m=2; c1 folded {10, 12}: s=22, m=2
    # (a seeds-only regression reads {(0,0): (2.0, 1), (1,0): (27.5, 3)})
    assert got == {(0, 0): (7.5, 2), (1, 0): (22.0, 2)}
    cents = _km_centroids(state, seeds)
    assert cents == [(0, [3.75]), (1, [11.0])]


def test_streaming_kmeans_replay_is_idempotent(spark, tmp_path):
    """A full second run over the same input with the SAME state dir but
    a fresh checkpoint (= every batch replayed at-least-once) must leave
    the state exactly as the first run did: each batch recomputes from
    the state before it and overwrites its own slot."""
    from entity_etl_spark.ext.similarity import read_kmeans_state

    rows = [
        (0, [0.0], 0),
        (1, [10.0], 0),
        (4, [4.0], 1),
        (12, [12.0], 1),
    ]
    seeds = [(0, [0.0]), (1, [10.0])]
    in_dir = _stage_two_batches(tmp_path, spark, rows)
    state_dir = _run_km(spark, tmp_path, in_dir, seeds, "rep")
    first = sorted(
        (r.cluster, r.pos, float(r.s), r.m)
        for r in read_kmeans_state(spark, state_dir).collect()
    )

    # replay: fresh checkpoint, same state dir
    from entity_etl_spark.ext.similarity import run_streaming_kmeans

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    run_streaming_kmeans(
        spark,
        stream,
        state_dir,
        str(tmp_path / "ckpt_rep2"),
        seeds=seeds,
        vec_col="embedding",
        timeout_sec=300.0,
    )
    second = sorted(
        (r.cluster, r.pos, float(r.s), r.m)
        for r in read_kmeans_state(spark, state_dir).collect()
    )
    assert first == second


def test_streaming_bloom_merge_equals_oneshot_and_detects_lost_batch(
    spark, tmp_path
):
    """OR-merged per-batch word tables must equal the one-shot filter;
    deleting a batch slot (a lost batch) must break the equality — the
    exact failure the registry gate exists to catch."""
    import os
    import shutil

    from entity_etl_spark.ext.bloom import (
        build_bloom,
        read_bloom_state,
        run_streaming_bloom,
    )
    from entity_etl_spark.queries import _stage_bucketed_batches

    keys = list(range(100))
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    _stage_bucketed_batches(
        str(tmp_path),
        in_dir,
        spark.createDataFrame(
            [(x, x % 2) for x in keys], "event_id bigint, __b int"
        ),
        2,
    )

    stream = (
        spark.readStream.schema("event_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    state_dir = str(tmp_path / "state")
    run_streaming_bloom(
        spark,
        stream,
        state_dir,
        str(tmp_path / "ckpt"),
        batch_to_keys=lambda b_: b_,
        key_col="event_id",
        n_bits=1024,
        k=5,
        timeout_sec=300.0,
    )
    all_df = spark.createDataFrame([(x,) for x in keys], "event_id bigint")
    oneshot = {
        (r.word_idx, r.bits)
        for r in build_bloom(all_df, "event_id", n_bits=1024, k=5)
        .words.collect()
    }
    merged = {
        (r.word_idx, r.bits)
        for r in read_bloom_state(spark, state_dir, 1024, 5).words.collect()
    }
    assert merged == oneshot

    # lose a batch -> equality must break
    slots = [d for d in os.listdir(state_dir) if d.startswith("batch=")]
    assert len(slots) == 2
    shutil.rmtree(os.path.join(state_dir, sorted(slots)[1]))
    degraded = {
        (r.word_idx, r.bits)
        for r in read_bloom_state(spark, state_dir, 1024, 5).words.collect()
    }
    assert degraded != oneshot


def test_streaming_state_fresh_checkpoint_clears_stale_slots(
    spark, tmp_path
):
    """A NEW run (fresh checkpoint, batch ids restarting at 0) pointed at
    a state dir left over from a longer previous run must not read the
    stale higher slots back as final state."""
    import os

    from entity_etl_spark.ext.similarity import (
        _km_centroids,
        read_kmeans_state,
    )

    rows = [
        (0, [2.0], 0),
        (1, [10.0], 0),
        (4, [5.5], 1),
        (12, [12.0], 1),
    ]
    seeds = [(0, [0.0]), (1, [10.0])]
    in_dir = _stage_two_batches(tmp_path, spark, rows)
    # poison: a stale slot from a "previous, longer" run at batch=7
    state_dir = str(tmp_path / "state_stale")
    os.makedirs(state_dir)
    from decimal import Decimal

    spark.createDataFrame(
        [(0, 0, Decimal("999.0"), 9)],
        "cluster int, pos int, s decimal(38,12), m bigint",
    ).write.parquet(os.path.join(state_dir, "batch=7"))

    from entity_etl_spark.ext.similarity import run_streaming_kmeans

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    run_streaming_kmeans(
        spark,
        stream,
        state_dir,
        str(tmp_path / "ckpt_stale"),
        seeds=seeds,
        vec_col="embedding",
        timeout_sec=300.0,
    )
    got = {
        (r.cluster, r.pos): (float(r.s), r.m)
        for r in read_kmeans_state(spark, state_dir).collect()
    }
    assert got == {(0, 0): (7.5, 2), (1, 0): (22.0, 2)}
    assert _km_centroids(read_kmeans_state(spark, state_dir), seeds) == [
        (0, [3.75]),
        (1, [11.0]),
    ]


def test_streaming_topk_merges_across_batches_exactly(spark, tmp_path):
    """The global #1 neighbor arrives in the LAST batch: the merged state
    must re-rank across batch partials (not first-batch-wins), and
    deleting that batch's slot must demote it — the monoid property and
    its failure mode."""
    import os
    import shutil

    from entity_etl_spark.ext.similarity import (
        read_topk_state,
        run_streaming_topk,
    )
    from entity_etl_spark.queries import _stage_bucketed_batches

    rows = [
        (0, [1.0, 0.0], 0),   # the query itself (self-match excluded)
        (1, [1.0, 1.0], 0),   # cos = 0.707107
        (2, [0.0, 1.0], 0),   # cos = 0.0
        (3, [2.0, 0.2], 1),   # cos = 0.995037 — global #1, last batch
    ]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    _stage_bucketed_batches(
        str(tmp_path),
        in_dir,
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, __b int"
        ),
        2,
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    state_dir = str(tmp_path / "state")
    run_streaming_topk(
        spark,
        stream,
        state_dir,
        str(tmp_path / "ckpt"),
        queries=queries,
        k=2,
        timeout_sec=300.0,
    )
    got = sorted(
        (r.rnk, r.neighbor_id, r.score)
        for r in read_topk_state(spark, state_dir, k=2).collect()
    )
    assert [(rnk, nid) for rnk, nid, _ in got] == [(1, 3), (2, 1)]
    assert got[0][2] == 0.995037 and got[1][2] == 0.707107

    # lose the last batch's slot -> the late winner disappears
    slots = sorted(
        d for d in os.listdir(state_dir) if d.startswith("batch=")
    )
    shutil.rmtree(os.path.join(state_dir, slots[-1]))
    degraded = sorted(
        (r.rnk, r.neighbor_id)
        for r in read_topk_state(spark, state_dir, k=2).collect()
    )
    assert degraded == [(1, 1), (2, 2)]
