"""Structured Streaming pipeline tests: incremental file ingestion with
checkpoint (O1/O14), streaming changed-row suppression (O5), stateful TTL
dedup (O12/O13)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entity_etl_spark.model import TableSpec
from entity_etl_spark.streaming import (
    changed_rows_stream,
    run_available_now,
    stateful_ttl_dedup,
    stream_source,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
SPEC = TableSpec(name="s", id_field="id", ts_field="ts")


def write_batch(spark, path, rows, n_file):
    df = spark.createDataFrame(
        [(i, x, f"2024-01-01 00:{m:02d}:00") for i, x, m in rows],
        "id long, x long, ts string",
    ).select("id", "x", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/f{n_file}")


def drain(spark, src_dir, ckpt, transform):
    collected = []
    stream = stream_source(spark, f"{src_dir}/f*", SCHEMA)
    out = transform(stream)
    run_available_now(out, ckpt, lambda df, _bid: collected.extend(df.collect()))
    return collected


def test_incremental_file_source_with_changed_row_suppression(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    xform = lambda s: changed_rows_stream(s, SPEC, "10 minutes")

    # batch 1: three entities
    write_batch(spark, src, [(1, 11, 0), (2, 12, 1), (3, 13, 2)], 1)
    got1 = drain(spark, src, ckpt, xform)
    assert sorted(r["id"] for r in got1) == [1, 2, 3]

    # batch 2 (new files): unchanged re-send of 1 (new ts), changed 2, new 4,
    # and a null id that must be dropped
    write_batch(spark, src, [(1, 11, 3), (2, 24, 4), (4, 14, 5)], 2)
    write_batch(spark, src, [(None, 99, 6)], 3)
    got2 = drain(spark, src, ckpt, xform)
    # id=1 re-sent with SAME content -> suppressed by the (id, hash) dedup
    # state carried in the checkpoint; 2 changed and 4 new -> emitted
    assert sorted(r["id"] for r in got2) == [2, 4]
    # restart with same checkpoint and no new files -> nothing
    assert drain(spark, src, ckpt, xform) == []


def test_stateful_ttl_dedup_truth_table(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    xform = lambda s: stateful_ttl_dedup(s, SPEC, ttl_hours=8.0)

    write_batch(spark, src, [(1, 11, 0), (2, 12, 1), (3, 13, 2)], 1)
    got1 = drain(spark, src, ckpt, xform)
    assert sorted(r["id"] for r in got1) == [1, 2, 3]

    # the cache.test.js:84-96 truth table: same-content/new-ts suppressed,
    # changed emitted, identical suppressed, new emitted
    write_batch(spark, src, [(1, 11, 3), (2, 24, 4), (3, 13, 2), (4, 14, 5)], 2)
    got2 = drain(spark, src, ckpt, xform)
    assert sorted(r["id"] for r in got2) == [2, 4]


def test_intra_batch_change_sequence_emitted_in_order(spark, tmp_path):
    # two different values of one key in one batch: both are changes
    # (the reference would see them across pages; LWW state ends at the last)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    write_batch(spark, src, [(7, 1, 0), (7, 2, 1), (7, 2, 2)], 1)
    got = drain(spark, src, ckpt, lambda s: stateful_ttl_dedup(s, SPEC))
    assert [(r["id"], r["x"]) for r in sorted(got, key=lambda r: r["ts"])] == [
        (7, 1),
        (7, 2),
    ]


def test_streaming_session_window_aggregation(spark, tmp_path):
    """Event-time session windows in a streaming aggregation: events within
    a 5-minute gap of each other merge into one session per id; watermark
    bounds session state. Uses availableNow + complete drain."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # id 1: minutes 0,2,4 -> one session; minute 20 -> a second session.
    # id 2: minute 1 only.
    write_batch(spark, src, [(1, 1, 0), (1, 1, 2), (1, 1, 4), (1, 1, 20), (2, 1, 1)], 1)

    stream = stream_source(spark, f"{src}/f*", SCHEMA)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "5 minutes"), F.col("id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    collected = []
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_test")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT id, n FROM sess_test").collect()
    got = sorted((r["id"], r["n"]) for r in rows)
    assert got == [(1, 1), (1, 3), (2, 1)]


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join (purchases x signups within 10 minutes):
    both sides watermarked so join state is bounded; availableNow drain."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # x encodes the side: 1 = purchase, 2 = signup; id is the user key.
    write_batch(
        spark, src,
        [(1, 1, 5), (2, 1, 30), (1, 2, 2), (2, 2, 50), (3, 1, 10)],
        1,
    )
    stream = stream_source(spark, f"{src}/f*", SCHEMA)
    purchases = (
        stream.filter("x = 1")
        .select("id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    signups = (
        stream.filter("x = 2")
        .select(F.col("id").alias("s_id"), F.col("ts").alias("s_ts"))
        .withWatermark("s_ts", "1 hour")
    )
    joined = purchases.join(
        signups,
        (purchases.id == signups.s_id)
        & (signups.s_ts >= purchases.p_ts - F.expr("INTERVAL 10 MINUTES"))
        & (signups.s_ts <= purchases.p_ts + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select("id", "p_ts", "s_ts")
    collected = []
    run_available_now(
        joined, ckpt, lambda df, _bid: collected.extend(df.collect())
    )
    # user 1: purchase @5 within 10 min of signup @2 -> joins.
    # user 2: purchase @30 vs signup @50 -> outside the window, no row.
    # user 3: no signup -> no row.
    assert [r["id"] for r in collected] == [1]


def test_run_streaming_prep_cross_batch_dedup(spark, tmp_path):
    from entity_etl_spark.ext.prep import run_streaming_prep
    from entity_etl_spark.streaming import stream_source

    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "prep_ckpt")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    good = ("the quick brown fox jumps over the lazy dog and it "
            "is a fine day in the park of wonders to see it all ") * 2

    def write_docs(rows, n):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{n}")

    def run():
        run_streaming_prep(
            spark, stream_source(spark, f"{src}/f*", schema),
            out, state, ckpt,
        )

    write_docs([(1, good, "sa"), (2, "tiny", "sa"), (3, good + "x", "sb")], 1)
    run()
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 3}  # quality gate dropped 2

    # batch 2: replay of doc 1's content under a new id + genuinely new doc
    write_docs([(10, good, "sa"), (11, good + "y z", "sb")], 2)
    run()
    all_rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in all_rows} == {1, 3, 11}  # 10 deduped cross-batch
    # split column survives the partitioned write
    assert all(r.split in ("train", "val", "test") for r in all_rows)


def test_transform_with_state_ttl_dedup_matches_applyinpandas(spark, tmp_path):
    """The Spark 4 transformWithStateInPandas variant reproduces the exact
    cache.test.js truth table the applyInPandasWithState path pins — the
    two stateful APIs are behavioral twins."""
    from entity_etl_spark.streaming import _HAS_TWS, stateful_ttl_dedup_tws

    if not _HAS_TWS:
        pytest.skip(
            "transformWithStateInPandas needs google.protobuf (state-server "
            "protocol), absent in this environment"
        )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        xform = lambda s: stateful_ttl_dedup_tws(s, SPEC, ttl_hours=8.0)

        write_batch(spark, src, [(1, 11, 0), (2, 12, 1), (3, 13, 2)], 1)
        got1 = drain(spark, src, ckpt, xform)
        assert sorted(r["id"] for r in got1) == [1, 2, 3]

        write_batch(
            spark, src, [(1, 11, 3), (2, 24, 4), (3, 13, 2), (4, 14, 5)], 2
        )
        got2 = drain(spark, src, ckpt, xform)
        assert sorted(r["id"] for r in got2) == [2, 4]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join — the enrichment pattern: a streaming fact joins
    a static dimension (broadcast; re-read per micro-batch so dim updates
    between triggers are picked up). Rows without a dim match survive as
    NULL (left join) — the schemaless-tolerant reference posture."""
    src = str(tmp_path / "ss_src")
    ckpt = str(tmp_path / "ss_ckpt")
    write_batch(spark, src, [(1, 10, 0), (2, 20, 1), (3, 30, 2)], 1)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "id long, tier string"
    )

    collected = []
    stream = stream_source(spark, f"{src}/f*", SCHEMA)
    enriched = stream.join(F.broadcast(dim), "id", "left")
    run_available_now(
        enriched, ckpt, lambda df, _bid: collected.extend(df.collect())
    )
    got = sorted((r["id"], r["x"], r["tier"]) for r in collected)
    assert got == [(1, 10, "gold"), (2, 20, "silver"), (3, 30, None)]


def test_run_streaming_neardup_prep_drops_paraphrased_resend(spark, tmp_path):
    """Near-dup streaming ingest: batch 2 re-sends batch 1's surviving
    content with a small tail edit — byte-UNidentical, so fingerprint
    state would admit it; the MinHash signature state drops it. A
    genuinely new doc still lands."""
    from entity_etl_spark.ext.prep import run_streaming_neardup_prep
    from entity_etl_spark.streaming import stream_source

    src = str(tmp_path / "nd_src")
    out = str(tmp_path / "nd_corpus")
    state = str(tmp_path / "nd_state")
    ckpt = str(tmp_path / "nd_ckpt")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    good = ("the quick brown fox jumps over the lazy dog and it "
            "is a fine day in the park of wonders to see it all ") * 2
    fresh = ("entirely different content about distributed joins and "
             "shuffle partitions with a vocabulary all of its own that "
             "overlaps nothing in the first document at all here ") * 2

    def write_docs(rows, n):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{n}")

    def run():
        run_streaming_neardup_prep(
            spark, stream_source(spark, f"{src}/f*", schema),
            out, state, ckpt,
        )

    write_docs([(1, good, "sa")], 1)
    run()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1}

    # paraphrased re-send (tail edit) + genuinely new doc
    write_docs([(10, good + "extra tail words", "sa"), (11, fresh, "sb")], 2)
    run()
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 11}  # 10 suppressed by SIGNATURE state, not bytes


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the built-in twin of the
    applyInPandasWithState TTL dedup (stateful_ttl_dedup) — dedup state
    for a key is dropped once the watermark passes its event time, so
    state is bounded without a custom processor. A re-send INSIDE the
    watermark window is suppressed even when its timestamp differs (the
    semantic dropDuplicates([...]) alone cannot express)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # same id twice with different ts inside the window + a distinct id
    write_batch(spark, src, [(1, 11, 0), (1, 11, 2), (2, 12, 1)], 1)
    collected = []
    stream = stream_source(spark, f"{src}/f*", SCHEMA)
    out = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["id"]
    )
    run_available_now(
        out, ckpt, lambda df, _bid: collected.extend(df.collect())
    )
    assert sorted(r["id"] for r in collected) == [1, 2]
    # the duplicate kept is the FIRST-arriving row per key
    assert {r["id"]: r["x"] for r in collected} == {1: 11, 2: 12}


def test_stateful_dedup_under_rocksdb_state_store(spark, tmp_path):
    """The same changed-row suppression drains correctly under the
    RocksDB state store provider — the 100 TB state backend (state
    spills to disk instead of living in executor heap; changelog
    checkpointing). No extra deps: RocksDB ships in Spark core."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        xform = lambda s: changed_rows_stream(s, SPEC, "10 minutes")
        write_batch(spark, src, [(1, 11, 0), (2, 12, 1)], 1)
        got1 = drain(spark, src, ckpt, xform)
        assert sorted(r["id"] for r in got1) == [1, 2]
        # re-send of 1 unchanged (suppressed by RocksDB-held state),
        # 2 changed, 3 new
        write_batch(spark, src, [(1, 11, 3), (2, 24, 4), (3, 13, 5)], 2)
        got2 = drain(spark, src, ckpt, xform)
        assert sorted(r["id"] for r in got2) == [2, 3]
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_stream_stream_left_outer_join_null_completion(spark, tmp_path):
    """LEFT OUTER stream-stream join: an unmatched left row is held in
    state until the watermark passes its join window, THEN emits with
    nulls — the semantics that make outer joins bounded-state (a row
    can only be declared unmatched once late data is impossible)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # x=1 purchases, x=2 signups; user 1 matches, user 9 never will
    write_batch(spark, src, [(1, 1, 5), (9, 1, 6), (1, 2, 4)], 1)

    def build(stream):
        purchases = (
            stream.filter("x = 1")
            .select("id", F.col("ts").alias("p_ts"))
            .withWatermark("p_ts", "5 minutes")
        )
        signups = (
            stream.filter("x = 2")
            .select(F.col("id").alias("s_id"), F.col("ts").alias("s_ts"))
            .withWatermark("s_ts", "5 minutes")
        )
        return purchases.join(
            signups,
            (purchases.id == signups.s_id)
            & (signups.s_ts >= purchases.p_ts - F.expr("INTERVAL 5 MINUTES"))
            & (signups.s_ts <= purchases.p_ts + F.expr("INTERVAL 5 MINUTES")),
            "left_outer",
        ).select("id", "p_ts", "s_id")

    collected = []
    stream = stream_source(spark, f"{src}/f*", SCHEMA)
    run_available_now(
        build(stream), ckpt,
        lambda df, _bid: collected.extend(df.collect()),
    )
    # inner part: user 1 matched; user 9 still pending (watermark has not
    # passed its window yet)
    assert {(r["id"], r["s_id"]) for r in collected} == {(1, 1)}

    # advance event time far past user 9's window; the held row completes
    # with a NULL right side. Eviction happens in the micro-batch AFTER
    # the one whose data moved the watermark, so: one file to advance it
    # (f2), one more batch to flush (f3) — maxFilesPerTrigger=1 keeps
    # them separate batches.
    # (rows on BOTH sides: the query watermark is the MIN across the two
    # withWatermark columns, so a side that never advances pins it)
    write_batch(spark, src, [(50, 1, 50), (60, 2, 50)], 2)
    write_batch(spark, src, [(51, 1, 51), (61, 2, 51)], 3)
    collected2 = []
    stream2 = stream_source(
        spark, f"{src}/f*", SCHEMA, max_files_per_trigger=1
    )
    run_available_now(
        build(stream2), ckpt,
        lambda df, _bid: collected2.extend(df.collect()),
    )
    null_completed = {r["id"] for r in collected2 if r["s_id"] is None}
    assert 9 in null_completed


def test_crash_recovery_exactly_once_with_batchid_idempotent_sink(
    spark, tmp_path
):
    """Fault injection: the sink crashes mid-run; a restart from the SAME
    checkpoint replays the failed micro-batch (at-least-once), and a
    batchId-keyed idempotent sink turns that into exactly-once output —
    the foreachBatch recovery contract a production pipeline relies on."""
    import pytest as _pytest
    from pyspark.sql.streaming import StreamingQueryException

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    write_batch(spark, src, [(1, 11, 0), (2, 12, 1)], 1)
    write_batch(spark, src, [(3, 13, 2), (4, 14, 3)], 2)

    sunk: dict[int, list] = {}   # batch_id -> rows (idempotent: keyed)
    crashed = {"armed": True}

    def sink(df, bid):
        rows = df.collect()
        if crashed["armed"] and bid == 1:
            crashed["armed"] = False
            raise RuntimeError("injected sink failure")
        # idempotent by batch id: a replayed batch overwrites, never appends
        sunk[bid] = rows

    def start():
        stream = stream_source(
            spark, f"{src}/f*", SCHEMA, max_files_per_trigger=1
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with _pytest.raises(StreamingQueryException, match="injected"):
        start()
    # batch 0 landed, batch 1 died mid-sink
    assert set(sunk) == {0}

    start()  # restart from the same checkpoint: replays batch 1 onward
    got = sorted(r["id"] for rows in sunk.values() for r in rows)
    assert got == [1, 2, 3, 4]  # every row exactly once
