"""Round-6 extension operators: DSIR importance sampling, count-min
heavy hitters, streaming watermark dedup — hand-computed fixtures
(the parity harness checks the registry form; these pin the math)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def _bkt(tok: str, n: int = 256) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n


def _u(doc_id: int) -> float:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def test_dsir_importance_sample_hand_fixture(spark):
    """4 docs, 2 target (en) / 2 candidates: replay the hashed-unigram
    log-ratio and the Gumbel keys in pure Python and assert the engine's
    ranking and scores match exactly."""
    from entity_etl_spark.ext.lm import dsir_importance_sample

    rows = [
        (1, "alpha alpha beta", "en", "s1"),
        (2, "beta gamma", "en", "s1"),
        (3, "alpha beta beta", "fr", "s2"),
        (4, "delta delta gamma", "de", "s2"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {
        r.doc_id: r
        for r in dsir_importance_sample(
            docs, target_lang="en", n_buckets=256, k=10
        ).collect()
    }
    assert set(got) == {3, 4}

    # python replay
    B = 256
    toks = []
    for doc_id, text, lang, _src in rows:
        for t in text.split():
            toks.append((doc_id, lang, _bkt(t)))
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for _d, lang, b in toks:
        raw[b] = raw.get(b, 0) + 1
        if lang == "en":
            tgt[b] = tgt.get(b, 0) + 1
    n_r, n_t = sum(raw.values()), sum(tgt.values())
    lr = {
        b: math.log((tgt.get(b, 0) + 1.0) / (n_t + B))
        - math.log((c + 1.0) / (n_r + B))
        for b, c in raw.items()
    }
    keys = {}
    for doc_id, text, lang, _src in rows:
        if lang == "en":
            continue
        bs = [_bkt(t) for t in text.split()]
        score = sum(lr[b] for b in bs) / len(bs)
        keys[doc_id] = (score, score - math.log(-math.log(_u(doc_id))))
        assert abs(got[doc_id].dsir_logratio - round(score, 4)) < 1e-12
        assert got[doc_id].n_tokens == len(bs)
    want_order = sorted(keys, key=lambda d: (-keys[d][1], d))
    got_order = sorted(got, key=lambda d: got[d].rnk)
    assert got_order == want_order


def test_dsir_topk_plan_is_take_ordered(spark):
    """The k-selection must be TakeOrderedAndProject (per-partition
    heaps), never a global Exchange+Sort."""
    from entity_etl_spark.ext.lm import dsir_importance_sample

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 7}", "en" if i % 3 == 0 else "fr", "s")
         for i in range(60)],
        "doc_id long, text string, lang string, source string",
    )
    df = dsir_importance_sample(docs, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def _cm_bkt(tok: str, j: int, width: int) -> int:
    h = hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[:8]
    return int(h, 16) % width


def test_countmin_sketch_exact_replay_with_collisions(spark):
    """width=8 forces collisions; estimates must equal the Python-replayed
    sketch exactly, and every estimate must upper-bound the true count."""
    from entity_etl_spark.ext.sketches import build_countmin, estimate_countmin

    stream = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + list("defghij")
    df = spark.createDataFrame([(t,) for t in stream], "tok string")
    depth, width = 3, 8
    sketch = build_countmin(df, "tok", depth=depth, width=width)

    cells: dict[tuple[int, int], int] = {}
    for t in stream:
        for j in range(depth):
            k = (j, _cm_bkt(t, j, width))
            cells[k] = cells.get(k, 0) + 1
    got_cells = {(r.j, r.bkt): r.c for r in sketch.collect()}
    assert got_cells == cells

    keys = spark.createDataFrame(
        [(t,) for t in sorted(set(stream))], "tok string"
    )
    est = {
        r.tok: r.cm_est
        for r in estimate_countmin(
            keys, "tok", sketch, depth=depth, width=width
        ).collect()
    }
    true = {t: stream.count(t) for t in set(stream)}
    for t, c in true.items():
        want = min(cells[(j, _cm_bkt(t, j, width))] for j in range(depth))
        assert est[t] == want
        assert est[t] >= c  # count-min never underestimates

    # a never-seen key estimates 0 only if some row has an empty cell
    unseen = spark.createDataFrame([("zzz-unseen",)], "tok string")
    e0 = estimate_countmin(
        unseen, "tok", sketch, depth=depth, width=width
    ).first()["cm_est"]
    want0 = min(
        cells.get((j, _cm_bkt("zzz-unseen", j, width)), 0)
        for j in range(depth)
    )
    assert e0 == want0


def test_countmin_weighted_build(spark):
    """weight_col aggregates weighted frequency, not occurrence count."""
    from entity_etl_spark.ext.sketches import build_countmin, estimate_countmin

    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 2)], "tok string, w long"
    )
    sketch = build_countmin(df, "tok", depth=2, width=64, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",)], "tok string")
    est = {
        r.tok: r.cm_est
        for r in estimate_countmin(
            keys, "tok", sketch, depth=2, width=64
        ).collect()
    }
    assert est["a"] >= 15 and est["b"] >= 2


def test_drop_duplicates_within_watermark_cross_batch(spark, tmp_path):
    """An explicit redelivery: batch 1 re-sends key (7, 'click') from
    batch 0 with a later ts. Within the watermark horizon the duplicate
    must be suppressed; a fresh key in batch 1 must still emit."""
    import os

    from entity_etl_spark.streaming import run_available_now

    b0 = spark.createDataFrame(
        [("2024-01-01 10:00:00", 7, "click"),
         ("2024-01-01 10:05:00", 8, "view")],
        "ts string, user_id long, event_type string",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type")
    b1 = spark.createDataFrame(
        [("2024-01-01 11:00:00", 7, "click"),   # redelivery -> suppressed
         ("2024-01-01 11:10:00", 9, "click")],  # fresh -> emitted
        "ts string, user_id long, event_type string",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type")

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    import shutil
    import time
    for i, part in enumerate((b0, b1)):
        stage = str(tmp_path / f"stage{i}")
        part.coalesce(1).write.parquet(stage)
        src = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        shutil.copyfile(
            os.path.join(stage, src), os.path.join(in_dir, f"b{i}.parquet")
        )
        t = time.time() + i
        os.utime(os.path.join(in_dir, f"b{i}.parquet"), (t, t))

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    emit_dir = str(tmp_path / "emit")

    def sink(df, _bid):
        df.write.mode("append").parquet(emit_dir)

    run_available_now(stream, str(tmp_path / "ckpt"), sink, timeout_sec=300.0)
    got = sorted(
        (r.user_id, r.event_type)
        for r in spark.read.parquet(emit_dir).collect()
    )
    assert got == [(7, "click"), (8, "view"), (9, "click")]


def test_countmin_merge_equals_oneshot(spark):
    """Merging split-stream sketches must equal the one-shot sketch
    cell-for-cell (the exactness that makes per-batch maintenance sound)."""
    from entity_etl_spark.ext.sketches import build_countmin, merge_countmin

    stream = [f"t{i % 11}" for i in range(200)]
    full = spark.createDataFrame([(t,) for t in stream], "tok string")
    part1 = spark.createDataFrame([(t,) for t in stream[:80]], "tok string")
    part2 = spark.createDataFrame([(t,) for t in stream[80:]], "tok string")
    one = {
        (r.j, r.bkt): r.c
        for r in build_countmin(full, "tok", depth=3, width=16).collect()
    }
    merged = {
        (r.j, r.bkt): r.c
        for r in merge_countmin(
            [
                build_countmin(part1, "tok", depth=3, width=16),
                build_countmin(part2, "tok", depth=3, width=16),
            ]
        ).collect()
    }
    assert merged == one


def test_round6_ops_are_layout_independent(spark):
    """Determinism across cluster layouts: repartitioning the input must
    not change DSIR's selection or the count-min cells (no RNG state,
    no partition-dependent arithmetic) — the rerun/retry contract."""
    from entity_etl_spark.ext.lm import dsir_importance_sample
    from entity_etl_spark.ext.sketches import build_countmin

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)),
             "en" if i % 4 == 0 else ("fr" if i % 2 else "de"), f"s{i % 3}")
            for i in range(80)
        ],
        "doc_id long, text string, lang string, source string",
    )
    sel_a = [
        (r.rnk, r.doc_id)
        for r in dsir_importance_sample(docs.repartition(13), k=10).collect()
    ]
    sel_b = [
        (r.rnk, r.doc_id)
        for r in dsir_importance_sample(docs.coalesce(1), k=10).collect()
    ]
    assert sel_a == sel_b

    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    cells_a = {
        (r.j, r.bkt): r.c
        for r in build_countmin(toks.repartition(11), "tok").collect()
    }
    cells_b = {
        (r.j, r.bkt): r.c
        for r in build_countmin(toks.coalesce(1), "tok").collect()
    }
    assert cells_a == cells_b


def test_countmin_state_replay_is_idempotent(spark, tmp_path):
    """At-least-once foreachBatch replay: re-writing the same batch id
    must REPLACE its cell table (per-batch overwrite slot), never
    double-count — the merged state equals the single-application sketch."""
    import os

    from entity_etl_spark.ext.sketches import (
        build_countmin,
        read_countmin_state,
    )

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "tok string")
    sk = build_countmin(df, "tok", depth=2, width=16)
    state_dir = str(tmp_path / "state")
    slot = os.path.join(state_dir, "batch=0")
    sk.write.mode("overwrite").parquet(slot)
    sk.write.mode("overwrite").parquet(slot)  # replay of the same batch
    merged = {
        (r.j, r.bkt): r.c for r in read_countmin_state(spark, state_dir).collect()
    }
    want = {(r.j, r.bkt): r.c for r in sk.collect()}
    assert merged == want

    # empty state dir -> empty (all-zero) sketch, not PATH_NOT_FOUND
    empty = read_countmin_state(spark, str(tmp_path / "never_written"))
    assert empty.count() == 0
