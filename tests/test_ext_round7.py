"""Round-7 hardening: the shared slot-stream kernel's local-path guard,
the streaming top-k read/pin guards, and the production profile."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_require_local_state_paths_rejects_uri_schemes():
    """hdfs:// / s3a:// / file:// state dirs would make the driver-local
    slot listing silently read as "no prior state" — the kernel must
    raise instead (the silent-wrong-cumulative-state failure)."""
    from entity_etl_spark.streaming import require_local_state_paths

    for bad in ("hdfs://nn/state", "s3a://bucket/state", "file:///tmp/s"):
        with pytest.raises(ValueError, match="URI scheme"):
            require_local_state_paths(bad)
    # plain local paths (absolute, relative, Windows-ish drive letters are
    # not schemes because schemes need 2+ chars before ://) pass
    require_local_state_paths("/tmp/state", "rel/state", None)


def test_reset_state_slots_guards_uri_paths(tmp_path):
    from entity_etl_spark.streaming import (
        reset_state_slots_if_fresh_checkpoint,
    )

    with pytest.raises(ValueError, match="URI scheme"):
        reset_state_slots_if_fresh_checkpoint(
            "hdfs://nn/ckpt", str(tmp_path)
        )
    with pytest.raises(ValueError, match="URI scheme"):
        reset_state_slots_if_fresh_checkpoint(
            str(tmp_path), "s3a://bucket/state"
        )


def test_read_kmeans_state_guards_uri_path(spark):
    from entity_etl_spark.ext.similarity import read_kmeans_state

    with pytest.raises(ValueError, match="URI scheme"):
        read_kmeans_state(spark, "s3a://bucket/km-state")


def test_read_topk_state_null_write_k_raises_not_empty(spark, tmp_path):
    """State rows written without a write_k column (older writer /
    foreign writer): k=None must raise — a real merged top-k exists in
    the slots and an empty result would silently mask it. An explicit k
    the caller vouches for still reads."""
    from entity_etl_spark.ext.similarity import read_topk_state

    slot = tmp_path / "state" / "batch=0"
    spark.createDataFrame(
        [(0, 1, 0.9, 1), (0, 2, 0.5, 2)],
        "query_id long, neighbor_id long, score double, rnk bigint",
    ).coalesce(1).write.parquet(str(slot))

    with pytest.raises(ValueError, match="no write_k"):
        read_topk_state(spark, str(tmp_path / "state"))
    got = sorted(
        (r.rnk, r.neighbor_id)
        for r in read_topk_state(spark, str(tmp_path / "state"), k=2)
        .collect()
    )
    assert got == [(1, 1), (2, 2)]


def test_read_topk_state_empty_dir_still_returns_empty(spark, tmp_path):
    from entity_etl_spark.ext.similarity import read_topk_state

    assert read_topk_state(spark, str(tmp_path / "nothing")).count() == 0


def test_run_streaming_topk_query_pin_is_cap_guarded(spark, tmp_path,
                                                     monkeypatch):
    """The pinned query-set collect routes through the driver row cap:
    an over-cap query side raises up front instead of OOMing the
    driver mid-stream."""
    import entity_etl_spark.ext.similarity as sim

    monkeypatch.setattr(sim, "MAX_DRIVER_COLLECT_ROWS", 2)
    queries = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="more than 2 rows"):
        sim.run_streaming_topk(
            spark,
            stream=None,  # guard fires before the stream is touched
            state_dir=str(tmp_path / "state"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            queries=queries,
            k=1,
        )


# ---------------------------------------------------------------- DOULION
def _k_clique_edges(spark, n, offset=0):
    rows = [
        (offset + i, offset + j) for i in range(n) for j in range(i + 1, n)
    ]
    return spark.createDataFrame(rows, "u long, v long")


def test_count_triangles_compact_forward_exact(spark):
    from entity_etl_spark.ext.graph import count_triangles_compact_forward

    # K5 has C(5,3) = 10 triangles; a disjoint path adds none
    k5 = _k_clique_edges(spark, 5)
    path = spark.createDataFrame(
        [(100, 101), (101, 102), (102, 103)], "u long, v long"
    )
    got = count_triangles_compact_forward(k5.union(path)).collect()[0]
    assert got["n_tri"] == 10


def test_doulion_estimate_measured_error_on_planted_graph(spark):
    """DOULION error contract (VERDICT r6 item 4): on a triangle-rich
    planted graph (K40 = 9880 triangles), the deterministic p=0.25
    estimate must land within the concentration band. relative std
    ~ sqrt(1/p^3 / T) ~ 8%, so +/-40% is five sigmas; the coin is
    deterministic, so this is a fixed value, not a flaky draw."""
    from entity_etl_spark.ext.graph import (
        count_triangles_compact_forward,
        doulion_triangle_estimate,
    )

    edges = _k_clique_edges(spark, 40)
    exact = count_triangles_compact_forward(edges).collect()[0]["n_tri"]
    assert exact == 9880
    est = doulion_triangle_estimate(edges, p=0.25).collect()[0]
    assert est["n_edges_sampled"] < 40 * 39 // 2  # it actually sampled
    assert 0.6 * exact <= est["est_triangles"] <= 1.4 * exact


def test_doulion_vs_exact_on_testdata_sf0001(spark):
    """Measured error on the real co-purchase graph at sf0.001, against
    the exact registry query (ground truth). Deterministic both sides."""
    from entity_etl_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    exact = (
        REGISTRY["triangle_count_copurchase"].fn(spark, sf).collect()[0]
    )
    est = REGISTRY["triangle_count_doulion"].fn(spark, sf).collect()[0]
    t = exact["n_triangles"]
    # sparse graph at this SF -> loose band; the planted-graph test pins
    # the tight contract, this pins end-to-end wiring on real tables
    assert est["n_tri_sampled"] >= 0
    if t >= 200:
        assert 0.4 * t <= est["est_triangles"] <= 1.6 * t


def test_sample_edges_portable_rejects_bad_p(spark):
    from entity_etl_spark.ext.graph import sample_edges_portable

    df = spark.createDataFrame([(1, 2)], "u long, v long")
    import pytest

    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            sample_edges_portable(df, p=bad)


def test_wedge_preflight_guard_raises_with_doulion_pointer(spark):
    """The exact-triangle kernel pre-flights its wedge-join volume (one
    linear agg over the pinned oriented edges) and raises above the
    guard instead of dying on shuffle spill — the r7 sf10 failure mode
    (4.15G wedges, ~70 GB spill, JVM death). K10 has sum C(outdeg,2) =
    120 oriented wedges; a 100-wedge guard must fire, the default and
    an explicit opt-out must not."""
    import pytest

    from entity_etl_spark.ext.graph import count_triangles_compact_forward
    from entity_etl_spark.queries import q_triangle_count_copurchase

    k10 = spark.createDataFrame(
        [(i, j) for i in range(10) for j in range(i + 1, 10)], "u int, v int"
    )
    with pytest.raises(ValueError, match="doulion_triangle_estimate"):
        count_triangles_compact_forward(k10, max_wedges=100)
    # default guard (2e9) and explicit opt-out both compute: C(10,3)=120
    assert (
        count_triangles_compact_forward(k10).collect()[0]["n_tri"] == 120
    )
    assert (
        count_triangles_compact_forward(k10, max_wedges=None)
        .collect()[0]["n_tri"]
        == 120
    )
    # registry query: tight guard raises at BUILD time, opt-out (<=0) runs
    with pytest.raises(ValueError, match="doulion_triangle_estimate"):
        q_triangle_count_copurchase(
            spark, "/root/testdata/sf0.001", max_wedges=10
        )
    assert (
        q_triangle_count_copurchase(
            spark, "/root/testdata/sf0.001", max_wedges=0
        ).count()
        == 1
    )


def test_png_roundtrip_exact_and_filters_exercised():
    """PNG encode/decode round-trip is byte-exact for random images, the
    synthesizer cycles all five filter types (the decoder's paeth_rows
    proves filter bytes are honored), and corrupted chunks fail CRC."""
    import struct

    import numpy as np
    import pytest

    from entity_etl_spark.ext.image import _decode_png, _encode_png

    rng = np.random.default_rng(42)
    for _ in range(50):
        g = rng.integers(0, 256, 64).astype(np.uint8)
        blob = _encode_png(g)
        w, h, img, n_paeth = _decode_png(blob)
        assert (w, h) == (8, 8)
        assert n_paeth == 1  # rows 0..7 -> filters 0,1,2,3,4,0,1,2
        assert np.array_equal(img.ravel(), g)
    # flip one IDAT payload byte: the CRC walk must reject it
    blob = bytearray(_encode_png(np.zeros(64, dtype=np.uint8)))
    idat_at = blob.index(b"IDAT")
    (length,) = struct.unpack_from(">I", blob, idat_at - 4)
    blob[idat_at + 4 + length // 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        _decode_png(bytes(blob))


def test_paeth_predictor_reference_vectors():
    """Paeth tie-breaking order (left, then up, then up-left) against
    hand-computed PNG-spec §9.4 cases — an independent reference, not a
    round-trip (encoder and decoder share _paeth, so a symmetric bug
    would round-trip cleanly)."""
    from entity_etl_spark.ext.image import _paeth

    # p = a + b - c; nearest of a/b/c wins, ties left > up > up-left.
    # NOTE: when pa == pb with a != b, c is exactly the midpoint and
    # pc = 0 always wins — the only OBSERVABLE tie orders are
    # pa == pc (left must beat up-left) and pb == pc (up must beat
    # up-left), derived below.
    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 20, 15) == 15  # p=15: pa=5, pb=5, pc=0 -> up-left
    assert _paeth(10, 20, 5) == 20   # p=25: pa=15, pb=5, pc=20 -> up
    assert _paeth(1, 200, 100) == 100  # p=101: pa=100, pb=99, pc=1 -> c
    assert _paeth(3, 0, 1) == 3  # p=2: pa=1, pb=2, pc=1 -> tie a/c -> LEFT
    assert _paeth(3, 0, 2) == 0  # p=1: pa=2, pb=1, pc=1 -> tie b/c -> UP
    assert _paeth(5, 5, 9) == 5  # p=1: pa=4, pb=4, pc=8 -> tie a/b -> left


def test_minhash_xxh64_leg_subset_and_recall(spark):
    """Correctness gate for the oracle-less deployable leg
    (minhash_near_dups_xxh64_pairs — the r9 rename; the original name is
    now the oracle-paired gate row): the emitted pair set must be a
    SUBSET of the exact Jaccard pair set (exact verify makes precision
    1.0 by construction — any non-subset pair is a verify bug) and
    recall vs exact must clear the same 0.75 floor the relational recall
    gate uses. Run at sf0.001 AND sf0.01 for two corpus shapes."""
    from entity_etl_spark.ext.dedup import jaccard_pairs
    from entity_etl_spark.queries import REGISTRY

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        exact = {
            (r["doc_a"], r["doc_b"])
            for r in jaccard_pairs(
                docs, "doc_id", "text", k=3, threshold=0.5
            ).collect()
        }
        got = {
            (r["doc_a"], r["doc_b"])
            for r in REGISTRY["minhash_near_dups_xxh64_pairs"]
            .fn(spark, sf)
            .collect()
        }
        assert got <= exact, f"non-exact pairs emitted at {sf}: {got - exact}"
        if exact:
            recall = len(got) / len(exact)
            assert recall >= 0.75, f"recall {recall:.3f} < 0.75 at {sf}"


def test_drop_near_dups_rejects_lsh_knobs_on_exact_methods(spark):
    """hash_fn / observation are LSH-stage knobs; passing them with an
    exact method must raise, not silently ignore (same contract as
    max_bucket_size / signature_path)."""
    import pytest
    from pyspark.sql import Observation

    from entity_etl_spark.ext.dedup import drop_near_dups

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="hash_fn"):
        drop_near_dups(docs, "doc_id", "text", hash_fn="md5")
    with pytest.raises(ValueError, match="observation"):
        drop_near_dups(
            docs, "doc_id", "text", observation=Observation("x")
        )
