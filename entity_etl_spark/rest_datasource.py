"""Python DataSource (DSv2) REST-entities connector — O1/O2/O3 in literal form.

The reference's source is a paginated REST endpoint serving flat JSON
entities incrementally: the ``updatedFromMs`` time predicate is baked into
the request URL so the *source* evaluates it and only the delta crosses the
wire (app.js:76-82, config.json:9). ``sources.rest_source`` already drains
that endpoint driver-side; this module is the DataSource-V2 form the build
plan named as the literal O3 mapping (SURVEY §8.4): the predicate arrives via
Spark's filter-pushdown contract instead of being hand-threaded.

Spark-first shape (pyspark.sql.datasource, Spark 4):

- ``spark.read.format("rest_entities").load()`` — batch reader.
  :meth:`RestEntitiesReader.pushFilters` absorbs ``updatedOnMs`` comparisons
  (GreaterThan / GreaterThanOrEqual / IsNotNull) and the reader evaluates
  them source-side; everything else is returned to Spark unchanged, exactly
  the ``SupportsPushDownFilters`` split.
- one :class:`InputPartition` per page → pages scan executor-parallel, where
  the reference drained them sequentially (app.js:48-59).
- ``spark.readStream.format("rest_entities")`` — incremental streaming
  reader whose offset IS the reference checkpoint: ``{"updatedFromMs": N}``
  with initial offset 1 (cache.js:18) advancing to max(updatedOnMs) seen
  (cache.js:99-119). Structured Streaming's offset log persists it, playing
  the role of the cache file's ``checkpoint`` field.

Transport: tests and offline deployments point ``path`` at a directory of
page JSON files (each ``{"items": [...], "partialResults": bool}`` —
README.md:205-256); a live deployment passes ``fetcher`` as a
``module:function`` dotted path resolved on the executor, keeping the
DataSource picklable. No network is touched in this repo's tests.
"""

from __future__ import annotations

import glob
import importlib
import json
import os
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

TS_FIELD_OPT = "tsfield"
DEFAULT_TS_FIELD = "updatedOnMs"
DEFAULT_SCHEMA = "id STRING, value STRING, updatedOnMs LONG"


def _load_pages(path: str) -> list[str]:
    """Page files in name order = the endpoint's page sequence."""
    return sorted(glob.glob(os.path.join(path, "*.json")))


def _read_page(page_path: str) -> list[dict]:
    with open(page_path, encoding="utf-8") as fh:
        payload = json.load(fh)
    # accept both the reference envelope and a bare JSON array
    return payload["items"] if isinstance(payload, dict) else payload


def _resolve_fetcher(dotted: str):
    mod, _, fn = dotted.partition(":")
    return getattr(importlib.import_module(mod), fn)


class PagePartition(InputPartition):
    def __init__(self, page_path: str):
        self.page_path = page_path


class RestEntitiesReader(DataSourceReader):
    """Batch reader with source-side time-predicate evaluation (O3)."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.ts_field = options.get(TS_FIELD_OPT, DEFAULT_TS_FIELD)
        # absorbed predicate: emit rows with ts_field > min_exclusive
        self.min_exclusive: int | None = None
        self.require_ts_not_null = False

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Absorb supported ``updatedOnMs`` comparisons; return the rest.

        Mirrors the reference baking ``updatedFromMs={{checkpoint}}`` into
        the request (app.js:77-78): the absorbed bound is evaluated by the
        source, so Spark does not re-check it — the test suite relies on
        that to prove the pushdown is real, not advisory."""
        unsupported: list[Filter] = []
        for f in filters:
            col = f.attribute[0] if hasattr(f, "attribute") else None
            if isinstance(f, GreaterThan) and col == self.ts_field and isinstance(f.value, int):
                bound = f.value
            elif (
                isinstance(f, GreaterThanOrEqual)
                and col == self.ts_field
                and isinstance(f.value, int)
            ):
                bound = f.value - 1
            elif isinstance(f, IsNotNull) and col == self.ts_field:
                self.require_ts_not_null = True
                continue
            else:
                unsupported.append(f)
                continue
            if self.min_exclusive is None or bound > self.min_exclusive:
                self.min_exclusive = bound
        return unsupported

    def partitions(self) -> Sequence[InputPartition]:
        path = self.options.get("path")
        if path:
            return [PagePartition(p) for p in _load_pages(path)]
        return [InputPartition(0)]  # cursor-driven REST: single drain

    def _keep(self, entity: dict) -> bool:
        ts = entity.get(self.ts_field)
        if self.require_ts_not_null and ts is None:
            return False
        if self.min_exclusive is not None:
            return isinstance(ts, int) and ts > self.min_exclusive
        return True

    def _emit(self, entities: Iterable[dict]) -> Iterator[tuple]:
        names = self.schema.fieldNames()
        for e in entities:
            if self._keep(e):
                yield tuple(e.get(n) for n in names)

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if isinstance(partition, PagePartition):
            yield from self._emit(_read_page(partition.page_path))
            return
        # live REST: sequential do…while(partialResults) drain (app.js:48-59).
        # ``fetcher`` is a module:function dotted path; the function is called
        # as fn(options_dict, updated_from_ms) so transport config (base URL,
        # auth header names, page dirs in tests) rides the options channel and
        # the reader stays picklable.
        fetch = _resolve_fetcher(self.options["fetcher"])
        opts = dict(self.options)
        cursor = self.min_exclusive if self.min_exclusive is not None else 0
        partial = True
        while partial:
            resp = fetch(opts, cursor)
            items = list(resp.get("items", []))
            partial = bool(resp.get("partialResults", False))
            yield from self._emit(items)
            ts_values = [
                it[self.ts_field]
                for it in items
                if isinstance(it.get(self.ts_field), int)
            ]
            if not ts_values:
                break
            # monotone cursor (cf. checkpoint.next_checkpoint's max clamp):
            # a page of stale rows (max ts < cursor) must never move the
            # cursor backward, and equality bumps +1 for forward progress
            new_cursor = max(ts_values)
            cursor = new_cursor if new_cursor > cursor else cursor + 1


class RestEntitiesStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader: the offset is the reference checkpoint.

    ``{"updatedFromMs": N}`` — initial 1 (cache.js:18), advanced to the max
    ``updatedOnMs`` observed (cache.js:99-119, the sort-desc-head is just a
    max). Structured Streaming's offset log persists/restores it, replacing
    the cache file's ``checkpoint`` field; replays between two committed
    offsets are exact (readBetweenOffsets), giving the micro-batch the same
    at-least-once-or-better contract the reference documents.

    **Backpressure** (``maxPagesPerTrigger`` option): each micro-batch
    drains at most that many pages, carrying a page cursor in the offset
    (``pageIdx``) while the time high-water mark stays FIXED until the
    pass reaches the last page — only then does ``updatedFromMs`` jump to
    the max observed (``maxSeen`` accumulates across the pass). That is
    the reference's own pagination contract made durable: it saves the
    cache after EVERY page inside the do…while(partialResults) loop
    (app.js:48-59), so a restart resumes mid-drain without re-reading
    earlier pages and without advancing the checkpoint early (which would
    drop rows still sitting in later pages). The page list must be stable
    for the duration of one drain pass (it is re-listed per pass)."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.ts_field = options.get(TS_FIELD_OPT, DEFAULT_TS_FIELD)
        raw = options.get("maxpagespertrigger")
        self.max_pages = int(raw) if raw is not None else None

    def initialOffset(self) -> dict:
        return {"updatedFromMs": 1}

    def _rows_in(self, pages: list[str], min_exclusive: int, max_inclusive: int | None):
        names = self.schema.fieldNames()
        rows, max_seen = [], min_exclusive
        for page in pages:
            for e in _read_page(page):
                ts = e.get(self.ts_field)
                if not isinstance(ts, int) or ts <= min_exclusive:
                    continue
                if max_inclusive is not None and ts > max_inclusive:
                    continue
                rows.append(tuple(e.get(n) for n in names))
                max_seen = max(max_seen, ts)
        return rows, max_seen

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        pages = _load_pages(self.options["path"])
        start_ts = int(start["updatedFromMs"])
        if self.max_pages is None:
            rows, max_seen = self._rows_in(pages, start_ts, None)
            return iter(rows), {"updatedFromMs": max_seen}
        idx = int(start.get("pageIdx", 0))
        max_seen = int(start.get("maxSeen", start_ts))
        # windows with no NEW rows don't consume a trigger (else an idle
        # source would cycle page cursors through empty batches forever):
        # keep sliding until a window yields rows or the pass completes —
        # each batch emits at most max_pages pages WORTH of new data
        rows: list[tuple] = []
        while idx < len(pages) and not rows:
            take = pages[idx : idx + self.max_pages]
            rows, seen = self._rows_in(take, start_ts, None)
            max_seen = max(max_seen, seen)
            idx += len(take)
        if idx >= len(pages):  # drain pass complete: advance the HWM
            return iter(rows), {"updatedFromMs": max_seen}
        return iter(rows), {
            "updatedFromMs": start_ts,  # fixed until the pass completes
            "pageIdx": idx,
            "maxSeen": max_seen,
        }

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        pages = _load_pages(self.options["path"])
        s_idx = int(start.get("pageIdx", 0))
        e_idx = int(end.get("pageIdx", 0))
        page_slice = pages[s_idx:e_idx] if e_idx > s_idx else pages[s_idx:]
        cap = int(end.get("maxSeen", end["updatedFromMs"]))
        rows, _ = self._rows_in(page_slice, int(start["updatedFromMs"]), cap)
        return iter(rows)


class RestBatchCommit(WriterCommitMessage):
    """Temp files staged by one task, finalized (renamed) at job commit."""

    def __init__(self, tmp_files: list[str]):
        self.tmp_files = tmp_files


class RestEntitiesWriter(DataSourceWriter):
    """Batched sink — O11 in literal DSv2 form (app.js:88-112).

    Each task slices its partition's rows into batches of
    ``maxBatchSize`` (config.json:19 contract: 10,000 default) and emits
    one reference-shaped page envelope per batch. Transport is either

    - ``poster`` (``module:function`` dotted path, called as
      ``fn(options, body_json_str)``) — the live HTTP form; any raised
      error fails the task (the reference's fail-fast on non-2xx,
      app.js:109-111), Spark retries, and a failed job ABORTS: staged
      temp files are deleted, so at-least-once toward a live endpoint
      comes only from task retries, never from half-committed output; or
    - ``path`` — offline file transport: batches stage as hidden temp
      files and RENAME into place only at job commit (write-temp-then-
      swap, the same atomicity discipline as state.save_state). A
      crashed job leaves no visible pages.

    The envelope matches the reader's (``{"items": [...],
    "partialResults": false}``), so ``spark.read.format("rest_entities")``
    round-trips what this writer produced."""

    def __init__(self, options: dict):
        self.options = options
        self.path = options.get("path")
        self.poster = options.get("poster")
        self.max_batch = int(options.get("maxbatchsize", 10000))
        if not self.path and not self.poster:
            raise ValueError("rest_entities writer needs 'path' or 'poster'")

    def write(self, iterator) -> RestBatchCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # attempt number in the temp name: a speculative/zombie attempt of
        # the same partition must not write into the winner's temp file
        # (interleaved writes -> corrupt page committed); only the attempt
        # whose commit message reaches commit() gets renamed in
        attempt = ctx.taskAttemptId()
        tmp_files: list[str] = []
        batch: list[str] = []
        n_batches = 0

        def flush() -> None:
            nonlocal n_batches
            if not batch:
                return
            body = (
                '{"items": [' + ",".join(batch) + '], "partialResults": false}'
            )
            if self.poster:
                _resolve_fetcher(self.poster)(dict(self.options), body)
            if self.path:
                tmp = os.path.join(
                    self.path,
                    f".batch-{pid:05d}-{n_batches:05d}-a{attempt}.tmp",
                )
                with open(tmp, "w", encoding="utf-8") as fh:
                    fh.write(body)
                tmp_files.append(tmp)
            n_batches += 1
            batch.clear()

        if self.path:
            os.makedirs(self.path, exist_ok=True)
        for row in iterator:
            batch.append(json.dumps(row.asDict()))
            if len(batch) >= self.max_batch:
                flush()
        flush()
        return RestBatchCommit(tmp_files)

    def commit(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp in m.tmp_files:
                d, base = os.path.split(tmp)
                final = os.path.join(d, base.lstrip(".")[: -len(".tmp")] + ".json")
                os.replace(tmp, final)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp in m.tmp_files:
                try:
                    os.remove(tmp)
                except OSError:
                    pass


class RestEntitiesDataSource(DataSource):
    """``spark.dataSource.register(RestEntitiesDataSource)`` then
    ``spark.read.format("rest_entities").schema(...).option("path", dir)``
    to read, ``df.write.format("rest_entities").option(...)`` to sink."""

    @classmethod
    def name(cls) -> str:
        return "rest_entities"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> RestEntitiesReader:
        return RestEntitiesReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> RestEntitiesStreamReader:
        return RestEntitiesStreamReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> RestEntitiesWriter:
        return RestEntitiesWriter(dict(self.options))
