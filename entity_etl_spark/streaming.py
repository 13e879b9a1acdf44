"""Structured Streaming variant of the incremental pipeline.

The reference *is* a micro-batch streaming job by construction (15-min cron,
crontab:1; checkpointed incremental fetch, app.js:76-82; keyed TTL state,
cache.js:50-67 — SURVEY §0). This module maps it onto Spark Structured
Streaming natively:

- file/parquet ``readStream`` + checkpointLocation replaces the
  ``updatedFromMs`` high-water mark (the source tracks processed files;
  offsets live in the checkpoint — O1/O3/O14 for free);
- ``withWatermark`` bounds state, replacing the TTL horizon for the dedup
  operator (O13);
- changed-row suppression (O5) = ``dropDuplicates([id, content_hash])``
  within the watermark — identical content re-arriving is suppressed,
  changed content (new hash) passes;
- last-write-wins upsert state (O12/O15) with explicit TTL =
  ``applyInPandasWithState`` keyed by id, state = (content_hash, ttl),
  ProcessingTimeTimeout purges idle keys — the exact cache.js contract;
- ``Trigger.AvailableNow`` drains everything pending then stops — the
  streaming twin of the reference's do…while(partialResults) page loop
  (app.js:48-59) on a cron tick.

Delivery remains at-least-once toward the sink (state commits after the
batch), matching app.js:55-58; sinks must upsert by id.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .delta import HASH_COL, content_hash
from .model import TableSpec


def stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental file source (O1): new files under ``path`` are the
    micro-batches; processed-file tracking lives in the checkpoint (O14)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def changed_rows_stream(
    stream: DataFrame,
    spec: TableSpec,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming changed-row suppression (O5 + O13 in one operator).

    Emits a row iff its (id, content-hash-ignoring-ts) pair was not seen
    within the watermark horizon. The watermark bounds the dedup state the
    same way the reference's TTL bounds its cache (cache.js:60-67)."""
    hashed = stream.withColumn(
        HASH_COL, content_hash(stream.columns, exclude=(spec.ts_field,))
    )
    return (
        hashed.filter(F.col(spec.id_field).isNotNull())
        .withWatermark(spec.ts_field, watermark_delay)
        .dropDuplicates([spec.id_field, HASH_COL])
        .drop(HASH_COL)
    )


_TTL_HASH_COL = "__ttl_hash"


def _ttl_dedup_fn(
    id_field: str,
    ts_field: str,
    ttl_ms: int,
    out_columns: Sequence[str],
):
    """Builds the applyInPandasWithState function for stateful TTL dedup
    (O5/O12/O13): state per key = (content_hash, ttl); emit on new/changed;
    refresh TTL on every sighting (cache.js:79 refresh-on-read); purge on
    timeout.

    The content hash arrives PRE-COMPUTED in ``_TTL_HASH_COL`` — the same
    JVM-side :func:`delta.content_hash` expression the batch path uses, so
    batch and streaming dedup states are interchangeable and the Python side
    does no per-row work. The chain rule "emit iff hash differs from the
    previously kept hash" collapses to a vectorized shifted-series compare:
    a skipped row's hash always EQUALS the carried hash, so the carried hash
    is simply the previous row's hash — first-of-each-consecutive-run."""
    import pandas as pd

    out_cols = list(out_columns)

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()  # TTL purge (cache.js:60-67)
            return
        prev_hash = state.get[0] if state.exists else None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(ts_field)
            h = pdf[_TTL_HASH_COL]
            shifted = h.shift(1)
            if prev_hash is not None:
                shifted.iloc[0] = prev_hash
            # NaN != anything -> first row emits when there is no prior state
            keep = h.ne(shifted)
            prev_hash = h.iloc[-1]
            out = pdf.loc[keep, out_cols]
            if len(out):
                yield out
        state.update((prev_hash,))
        state.setTimeoutDuration(ttl_ms)  # refresh-on-read (cache.js:79)

    return fn


def stateful_ttl_dedup(
    stream: DataFrame,
    spec: TableSpec,
    ttl_hours: float = 8.0,
) -> DataFrame:
    """Keyed state with explicit TTL via applyInPandasWithState — the full
    cache.js contract (change detection + last-write-wins + TTL purge +
    refresh-on-read) as one stateful streaming operator.

    Use :func:`changed_rows_stream` (watermark + dropDuplicates, pure
    built-ins) when event-time TTL is acceptable; use this when TTL must be
    processing-time like the reference's wall-clock TTL (cache.js:95-97)."""
    out_schema = stream.schema
    fn = _ttl_dedup_fn(
        spec.id_field,
        spec.ts_field,
        int(ttl_hours * 3600 * 1000),
        stream.columns,
    )
    # hash JVM-side with the SAME expression as the batch path (delta.py) —
    # batch and streaming states share hash semantics, and Python only does
    # one vectorized series compare per key-batch
    hashed = stream.withColumn(
        _TTL_HASH_COL, content_hash(stream.columns, exclude=(spec.ts_field,))
    )
    return (
        hashed.filter(F.col(spec.id_field).isNotNull())
        .groupBy(spec.id_field)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="h string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], Any],
    timeout_sec: float = 120.0,
) -> None:
    """Drain everything pending, then stop (reference page loop,
    app.js:48-59, on one cron tick). ``batch_fn(df, batch_id)`` is the sink
    (foreachBatch = at-least-once; upsert by id for effective idempotence).

    A drain still active at ``timeout_sec`` is stopped AND raised: a
    truncated availableNow run has processed a prefix of the pending
    batches, and returning normally would hand the caller silently
    partial output (checkpointed offsets make the next run resume
    correctly, so the error is retryable).

    Completion is detected by *progress*, not only by query termination:
    a stateful operator with ``ProcessingTimeTimeout`` timers keeps an
    availableNow query alive indefinitely (timer expiry schedules fresh
    zero-input micro-batches after the source is drained, so
    ``awaitTermination`` never returns True). availableNow plans all
    pending offsets up front and runs them in the earliest batches, so
    a completed batch with ``numInputRows == 0`` while the source
    reports no data available means every pending batch has been
    delivered to ``batch_fn`` — the drain is complete and the query is
    stopped gracefully (timer-only batches emit nothing for our
    append-mode state ops; TTL purge on a later real run re-arms).

    Two refinements close races in that detection:

    - when the progress's per-source offsets carry ``latestOffset`` (the
      availableNow wrapper latches the planned end there), drained means
      ``endOffset == latestOffset`` on EVERY source — immune to a
      zero-row planned batch (an empty file in a one-file micro-batch
      source) completing before ``isDataAvailable`` refreshes for the
      next planned batch, which could otherwise read as done with
      planned data still pending; timer-only churn never advances
      endOffset, so the signal is also stable under 50-batch timer loops;
    - the zero-input fallback (sources without latestOffset) is confirmed
      on two polls >= 1 s apart with UNCHANGED source end-offsets — a
      pending planned batch starts well inside that window and resets
      the probe."""
    import time as _time

    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = False

    def _drained_now() -> tuple[bool, bool, Any]:
        """(drained, strong, key): strong = offsets prove it (progress is
        published only after the batch's foreachBatch completed, so
        endOffset == latestOffset everywhere means every planned row was
        delivered); weak = zero-input heuristic needing confirmation."""
        lp = q.lastProgress
        if lp is None:
            return False, False, None
        srcs = lp.get("sources") or []
        key = tuple(repr(s.get("endOffset")) for s in srcs)

        def _off(s: dict, name: str) -> Any:
            v = s.get(name)
            # PySpark STRINGIFIES progress values: an unreported offset
            # arrives as the string "None" (FileStreamSource never fills
            # latestOffset), not JSON null
            return None if v in (None, "None", "null", "") else v

        if srcs and all(_off(s, "latestOffset") is not None for s in srcs):
            drained = all(
                _off(s, "endOffset") == _off(s, "latestOffset") for s in srcs
            )
            return drained, True, key
        st = q.status
        return (
            lp.get("numInputRows", 0) == 0
            and not st.get("isDataAvailable", True),
            False,
            key,
        )

    try:
        deadline = _time.monotonic() + timeout_sec
        candidate_key: Any = None
        candidate_at = 0.0
        while _time.monotonic() < deadline:
            # 0.2 s poll: awaitTermination returns the moment a
            # self-terminating (availableNow, timer-free) query ends, so
            # the granularity only prices the DETECTION loop for
            # timer-kept-alive stateful queries — there it bounds the
            # latency between the drain completing and the first ok
            # probe (was up to 1 s of dead wait per streaming query).
            # The >= 1.0 s unchanged-offsets confirmation window below
            # is a correctness guard and stays as-is.
            if q.awaitTermination(0.2):
                finished = True
                break
            ok, strong, key = _drained_now()
            now = _time.monotonic()
            if ok and strong:
                finished = True
                break
            if not ok or candidate_key != key:
                candidate_key = key if ok else None
                candidate_at = now
            elif now - candidate_at >= 1.0:
                finished = True
                break
    finally:
        if q.isActive:
            q.stop()
    if not finished:
        raise TimeoutError(
            f"availableNow drain still running after {timeout_sec}s — "
            "output is a prefix of the pending batches; re-run resumes "
            "from the checkpointed offsets (or raise timeout_sec)"
        )


# ---------------------------------------------------------------------------
# transformWithStateInPandas twin (Spark 4 StatefulProcessor API)
# ---------------------------------------------------------------------------

try:  # the API landed in Spark 4.0; guard so older runtimes still import.
    # Runtime also needs protobuf: the TWS state server speaks a protobuf
    # protocol (pyspark/sql/streaming/proto/StateMessage_pb2) — absent in
    # some minimal environments, so gate on both.
    import google.protobuf.descriptor  # noqa: F401
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


class TtlDedupProcessor(StatefulProcessor):
    """The cache.js contract (change-detect + last-write-wins + TTL purge +
    refresh-on-read) on the Spark 4 ``transformWithStateInPandas`` API —
    the successor of :func:`stateful_ttl_dedup`'s applyInPandasWithState.

    What the new API buys at scale: typed per-key ValueState with a
    *native* TTL (``ttlDurationMs`` — the state store expires keys without
    a user-managed timer, exactly cache.js:60-67), incremental state
    checkpointing (RocksDB changelog), and the same Arrow batch transfer.
    The Python side stays vectorized: the emit rule collapses to one
    shifted-series compare per key-batch (see ``_ttl_dedup_fn``); the
    content hash arrives pre-computed JVM-side so batch and streaming
    dedup states stay interchangeable.
    """

    def __init__(self, id_field: str, ts_field: str, ttl_ms: int,
                 out_columns: Sequence[str]):
        self._id = id_field
        self._ts = ts_field
        self._ttl_ms = ttl_ms
        self._out_cols = list(out_columns)

    def init(self, handle: "StatefulProcessorHandle") -> None:
        # native state TTL: refresh happens on every update (refresh-on-read)
        self._h = handle.getValueState(
            "h", "h string", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        prev = self._h.get() if self._h.exists() else None
        prev_hash = prev[0] if prev is not None else None
        for pdf in rows:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(self._ts)
            h = pdf[_TTL_HASH_COL]
            shifted = h.shift(1)
            if prev_hash is not None:
                shifted.iloc[0] = prev_hash
            keep = h.ne(shifted)
            prev_hash = h.iloc[-1]
            out = pdf.loc[keep, self._out_cols]
            if len(out):
                yield out
        # update == TTL refresh for this key, even when nothing was emitted
        self._h.update((prev_hash,))

    def close(self) -> None:
        pass


def stateful_ttl_dedup_tws(
    stream: DataFrame,
    spec: TableSpec,
    ttl_hours: float = 8.0,
) -> DataFrame:
    """:func:`stateful_ttl_dedup` re-expressed on transformWithStateInPandas.

    Same semantics, pinned equal by ``tests/test_streaming.py``; prefer
    this variant on Spark 4 state stores (RocksDB + changelog
    checkpointing) — TTL is enforced by the store itself instead of a
    per-key processing-time timer."""
    if not _HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0 and the "
            "protobuf package (the TWS state-server protocol)"
        )
    out_schema = stream.schema
    hashed = stream.withColumn(
        _TTL_HASH_COL, content_hash(stream.columns, exclude=(spec.ts_field,))
    )
    proc = TtlDedupProcessor(
        spec.id_field,
        spec.ts_field,
        int(ttl_hours * 3600 * 1000),
        stream.columns,
    )
    return (
        hashed.filter(F.col(spec.id_field).isNotNull())
        .groupBy(spec.id_field)
        .transformWithStateInPandas(
            proc,
            outputStructType=out_schema,
            outputMode="append",
            timeMode="ProcessingTime",
        )
    )


def require_local_state_paths(*paths: str) -> None:
    """Reject URI-schemed state/checkpoint paths for the per-batch-slot
    state discipline.

    Slot WRITES go through Spark's writer (which resolves any Hadoop
    filesystem), but the read/reset side (:func:`_km_state_dirs`-style
    listings, :func:`reset_state_slots_if_fresh_checkpoint`) is
    driver-local ``os.*`` — pointed at ``hdfs://`` / ``s3a://`` (or even
    ``file://``, which ``os.path`` does not resolve) it would silently
    find no prior state, so every batch folds against the seeds and the
    "cumulative" state is silently wrong rather than loud. Until the
    read side routes through the Hadoop FileSystem API, the contract is
    plain local filesystem paths — enforced here, once, for every slot
    op."""
    for p in paths:
        if p is not None and re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", p):
            raise ValueError(
                f"slot-state path {p!r} carries a URI scheme: the "
                "per-batch-slot state kernel reads state via driver-local "
                "filesystem calls, so remote (or file://-prefixed) state "
                "dirs would silently read as empty. Pass a plain local "
                "path (strip the scheme), or mount the remote store "
                "locally."
            )


def planned_batch_rows(checkpoint_dir: str, batch_id: int) -> int | None:
    """Exact planned input-row count of micro-batch ``batch_id`` of a
    SINGLE-file-source stream, read from the checkpoint's file-source log
    plus the listed files' parquet footers — ZERO Spark jobs (the
    foreachBatch frame itself is a ``LogicalRDD`` and exposes nothing).

    The file source writes ``checkpoint/sources/0/<batch_id>`` (JSON
    lines of the files planned into that batch) BEFORE the batch runs,
    so during ``foreachBatch`` the entry is authoritative; every
    ``compactInterval``-th batch the entry is ``<batch_id>.compact``
    carrying all prior entries tagged with their batchId. A batch with
    neither entry planned no new files (a timer-only / zero-input
    batch): 0 rows. Returns None — callers fall back to ``isEmpty()`` —
    when the checkpoint is not a local single-file-source layout or a
    listed file is not locally readable parquet."""
    import json as _json
    import os
    from urllib.parse import unquote, urlparse

    src_root = os.path.join(checkpoint_dir, "sources")
    try:
        subs = [d for d in os.listdir(src_root) if not d.startswith(".")]
    except OSError:
        return None
    if subs != ["0"]:
        return None  # zero or several sources: rows not attributable
    sdir = os.path.join(src_root, "0")
    entry = os.path.join(sdir, str(batch_id))
    compact = entry + ".compact"
    if os.path.exists(entry):
        path, only_batch = entry, None
    elif os.path.exists(compact):
        path, only_batch = compact, int(batch_id)
    else:
        return 0  # no entry = the batch planned no new files
    total = 0
    try:
        import pyarrow.parquet as _pq

        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or not line.startswith("{"):
                    continue  # version header
                rec = _json.loads(line)
                if only_batch is not None and rec.get("batchId") != only_batch:
                    continue
                p = rec["path"]
                if "://" in p:
                    u = urlparse(p)
                    if u.scheme != "file":
                        return None
                    p = unquote(u.path)
                total += _pq.ParquetFile(p).metadata.num_rows
    except Exception:
        return None
    return total


def source_batch_is_empty(
    batch_df: DataFrame,
    checkpoint_dir: str | None = None,
    batch_id: int | None = None,
) -> bool:
    """Empty-batch probe for per-batch frames of SOURCE-SHAPED streams —
    the ``isEmpty()`` pre-check folded into a driver-side read of the
    file-source checkpoint log (guide §1: the take(1) job cost ~0.1 s per
    micro-batch across every slot/prep stream, pure overhead on the
    non-empty common case).

    Exact when frame emptiness equals source emptiness: the frame is the
    source, or row-preserving transforms of it (0 planned rows => empty
    under ANY per-row transform). A caller that pre-filters its stream
    may see a planned-rows>0 batch that is empty after the filter; every
    slot family tolerates that (an empty partial merges as identity and
    a sequential fold of nothing re-writes the prior state), it just
    pays one redundant slot write. Falls back to ``isEmpty()`` whenever
    the planned rows are unknowable."""
    if checkpoint_dir is not None and batch_id is not None:
        n = planned_batch_rows(checkpoint_dir, batch_id)
        if n is not None:
            return n == 0
    return batch_df.isEmpty()


# Rows per partition when spreading a landed micro-batch: small enough
# that test-scale batches (thousands of docs) still parallelize the
# per-doc heavy work, large enough that a task amortizes its ~5-15 ms
# scheduling cost over real work. At deployment batch sizes (millions of
# rows) the clamp to defaultParallelism is what binds, so the local
# default and the cluster behavior come from the ONE input-scaled rule.
_SPREAD_ROWS_PER_PARTITION = 256


def spread_batch(
    spark, batch_df: DataFrame, planned_rows: int | None = None
) -> DataFrame:
    """Spread a landed micro-batch across the cluster for per-row heavy
    work (tokenize / signature fold / scoring), width scaled to the
    batch's ACTUAL planned row count instead of a flat
    ``defaultParallelism``: a landed file arrives as ONE input partition,
    but a flat-width repartition makes every downstream stage of a
    kilobyte-sized batch pay parallelism× task overhead (measured: the
    sf0.1 streaming family ran 19-75 jobs of 32 tasks each over ~200 KB
    batches — task scheduling, not compute). ``planned_rows`` comes from
    :func:`planned_batch_rows`; None (unknowable) applies the at-scale
    default, full parallelism."""
    parallelism = spark.sparkContext.defaultParallelism
    if planned_rows is None:
        return batch_df.repartition(parallelism)
    parts = max(
        1, min(parallelism, -(-planned_rows // _SPREAD_ROWS_PER_PARTITION))
    )
    return batch_df.repartition(parts)


def run_slot_stream(
    spark,
    stream,
    state_dir: str,
    checkpoint_dir: str,
    slot_fn,
    *,
    timeout_sec: float = 300.0,
    coalesce: int | None = 1,
) -> None:
    """Shared per-batch-slot streaming state kernel (count-min / Bloom /
    online k-means / streaming top-k — the exactly-mergeable state
    families).

    The cycle every slot op repeats, extracted once:

    1. guard driver-local paths (:func:`require_local_state_paths`);
    2. drop stale ``batch=*`` slots when the checkpoint is fresh
       (:func:`reset_state_slots_if_fresh_checkpoint`);
    3. per micro-batch: skip empties, spread the landed single-partition
       batch across the cluster, call ``slot_fn(batch_df, batch_id)`` for
       the slot CONTENT (a partial for merge-on-read families, the
       folded cumulative state for sequential families like k-means),
       and overwrite ``state_dir/batch=<id>`` — per-slot overwrite is
       what makes at-least-once foreachBatch replay idempotent.

    ``slot_fn`` returning None skips the slot write (a batch that
    contributes nothing). ``coalesce`` controls output-file granularity
    for the sketch-sized slot tables (None = leave partitioning alone).
    Read sides stay per-op (:func:`read_state_slots` + each family's
    merge fold)."""
    import os

    require_local_state_paths(state_dir, checkpoint_dir)
    reset_state_slots_if_fresh_checkpoint(checkpoint_dir, state_dir)

    def process(batch_df, batch_id: int) -> None:
        rows = planned_batch_rows(checkpoint_dir, batch_id)
        if rows == 0 or (rows is None and batch_df.isEmpty()):
            return
        # a landed file / page arrives as ONE input partition; spread the
        # per-row heavy work (tokenize / signature fold / scoring) or all
        # cores but one sit idle — width scaled to the batch's size
        batch_df = spread_batch(spark, batch_df, rows)
        slot = slot_fn(batch_df, batch_id)
        if slot is None:
            return
        if coalesce is not None:
            slot = slot.coalesce(coalesce)
        slot.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch={batch_id}")
        )

    run_available_now(stream, checkpoint_dir, process, timeout_sec=timeout_sec)


def reset_state_slots_if_fresh_checkpoint(
    checkpoint_dir: str, state_dir: str
) -> None:
    """Remove ``state_dir/batch=*`` slots when ``checkpoint_dir`` has no
    committed offsets yet (a NEW logical run, not a crash-resume).

    The per-batch-slot state discipline (count-min / online k-means /
    Bloom) is idempotent under replays of the SAME batch sequence, but a
    fresh run pointed at a state_dir left over from a longer previous run
    would silently read the stale higher slots as final state (sequential
    reads) or double-fold them (merge-on-read). A fresh checkpoint means
    batch ids restart at 0, so any existing slot is definitionally stale;
    a resumed checkpoint keeps its slots — replay needs them.

    Driver-local ``os.*`` only — a URI-schemed path would silently no-op
    exactly where the stale-slot protection matters, so it raises instead
    (:func:`require_local_state_paths`).
    """
    import os
    import shutil

    require_local_state_paths(checkpoint_dir, state_dir)

    offsets = os.path.join(checkpoint_dir, "offsets")
    if os.path.isdir(offsets) and os.listdir(offsets):
        return  # resume: slots are live replay inputs
    if not os.path.isdir(state_dir):
        return
    for d in os.listdir(state_dir):
        if d.startswith("batch="):
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)


def read_state_slots(spark, state_dir: str, schema: str):
    """Read every ``state_dir/batch=<id>`` slot as one DataFrame (the
    shared read side of the per-batch-slot state discipline — count-min,
    Bloom, streaming top-k). A state dir that was never written yields
    the EMPTY frame of ``schema`` rather than a missing-path error."""
    from pyspark.errors import AnalysisException

    try:
        return (
            spark.read.schema(schema)
            # per-batch subdirs are replay slots, not partition columns
            .option("recursiveFileLookup", "true")
            .parquet(state_dir)
        )
    except AnalysisException:
        return spark.createDataFrame([], schema)
