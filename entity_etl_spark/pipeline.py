"""Run orchestration (EP1, O16) — the reference main()/handleEntityType()
loop (app.js:13-60) re-expressed around DataFrames.

Per table, one incremental run is:

    incoming   = incremental_scan(source, ts, checkpoint)        # O1/O3
    latest     = keep_latest_per_key(incoming, id, ts)           # O15
    delta      = changed_rows(latest, state, id, ignore=[ts])    # O5
    shaped     = apply_mapping(delta, projection_spec)           # O6-O9
    bodies     = assemble_bodies(assign_batches(to_json(shaped)))# O9/O10
    sink(bodies)                                                 # O11
    state'     = merge_state(state, latest, id, ...)             # O12/O13
    checkpoint'= next_checkpoint(max_ts(incoming), prev, partial)# O14

State/checkpoint are saved after the sink succeeds, preserving the
reference's at-least-once contract (app.js:55-58): a crash between send and
save re-sends; the sink upserts by id so re-sends are idempotent.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import batch as batch_mod
from . import checkpoint as ckpt_mod
from . import state as state_mod
from .delta import changed_rows
from .log import log
from .mapping import apply_mapping, to_json_rows
from .model import EngineConfig, TableSpec


def keep_latest_per_key(df: DataFrame, id_field: str, ts_field: str) -> DataFrame:
    """Latest row per key (O15): the distributed equivalent of the
    reference's Map.set last-write-wins within a page (cache.js:55-57).
    Deterministic tiebreak on the full content hash would be overkill; ties
    on (id, ts) keep an arbitrary-but-single row via row_number."""
    w = Window.partitionBy(id_field).orderBy(F.desc(ts_field))
    return (
        df.filter(F.col(id_field).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _project_to_json(delta: DataFrame, projection) -> DataFrame:
    """Row → JSON-string projection (O6-O9), by either path:

    - a spec list (the declarative grammar, mapping.py) → typed columns →
      ``to_json``;
    - a Handlebars template STRING (the reference's own .hbs dialect,
      hbs.py) → the rendered text IS the JSON — byte-faithful migration
      mode: point the engine at an unmodified reference template.
    """
    if isinstance(projection, str):
        from .hbs import compile_hbs

        return delta.select(compile_hbs(projection, delta).alias("json"))
    return to_json_rows(apply_mapping(delta, projection))


@dataclass
class RunResult:
    table: str
    input_rows: int
    emitted_rows: int
    batches: int
    checkpoint_ms: int


def run_incremental(
    spark: SparkSession,
    spec: TableSpec,
    source: DataFrame,
    projection: Sequence[Mapping],
    config: EngineConfig,
    sink: Callable[[DataFrame], None],
    *,
    partial_results: bool = False,
    now_epoch_ms: int | None = None,
) -> RunResult:
    """One incremental run for one table (reference handleEntityType,
    app.js:44-60).

    The config's execution profile is active only for the DURATION of
    the run (profile_ctx, restored on exit) — RunResult carries scalars
    and every plan inside is built before return, so a production-
    profile pipeline cannot leak capped defaults into later same-process
    parity calls (r7 review)."""
    from .profile import profile_ctx

    with profile_ctx(config.profile):
        return _run_incremental_impl(
            spark,
            spec,
            source,
            projection,
            config,
            sink,
            partial_results=partial_results,
            now_epoch_ms=now_epoch_ms,
        )


def _run_incremental_impl(
    spark: SparkSession,
    spec: TableSpec,
    source: DataFrame,
    projection: Sequence[Mapping],
    config: EngineConfig,
    sink: Callable[[DataFrame], None],
    *,
    partial_results: bool = False,
    now_epoch_ms: int | None = None,
) -> RunResult:
    bucketed = bool(config.state_buckets)
    if bucketed:
        state = state_mod.load_state_bucketed(spark, config.state_dir, spec.name)
    else:
        state = state_mod.load_state(spark, config.state_dir, spec.name)

    def persist_state(df: DataFrame) -> None:
        if bucketed:
            state_mod.save_state_bucketed(
                df,
                config.state_dir,
                spec.name,
                spec.id_field,
                n_buckets=config.state_buckets,
            )
        else:
            state_mod.save_state(df, config.state_dir, spec.name)

    checkpoint = ckpt_mod.load_checkpoint(
        config.state_dir, spec.name, config.initial_checkpoint_ms
    )

    if spec.ts_field not in source.columns or spec.id_field not in source.columns:
        # empty/schemaless fetch (a dynamic-schema source returns no rows, so
        # no columns): reference behavior for an empty page — expired state
        # entries still purge, checkpoint is kept (cache.js:60-67,101-104)
        if state is not None:
            now = state_mod.now_ms() if now_epoch_ms is None else now_epoch_ms
            live = state.filter(F.col(state_mod.TTL_COL) >= F.lit(now))
            persist_state(live)
        return RunResult(
            table=spec.name,
            input_rows=0,
            emitted_rows=0,
            batches=0,
            checkpoint_ms=checkpoint,
        )

    incoming = ckpt_mod.incremental_scan(source, spec.ts_field, checkpoint)
    incoming = incoming.cache()  # reused by delta, state merge, and max-ts
    latest = keep_latest_per_key(incoming, spec.id_field, spec.ts_field)
    delta = changed_rows(latest, state, spec.id_field, ignore=(spec.ts_field,))

    jsons = _project_to_json(delta, projection)
    batched = batch_mod.assign_batches_distributed(jsons, config.max_batch_size)
    bodies = batch_mod.assemble_bodies(batched).cache()

    # metrics derive from the cached bodies in ONE aggregate — emitted rows
    # = sum of per-batch item counts (delta is one row per emitted item), so
    # no separate delta.count()/bodies.count() recomputation jobs
    stats = bodies.agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.coalesce(F.sum("n_items"), F.lit(0)).alias("emitted"),
    ).first()
    n_batches, emitted = int(stats["n_batches"]), int(stats["emitted"])
    sink(bodies)

    # state + checkpoint persist AFTER the sink (at-least-once, app.js:55-58).
    # merge over `latest` (all seen keys), not `delta`, reproduces
    # TTL refresh-on-read for unchanged keys (cache.js:79).
    if bucketed:
        # `latest` is one-row-per-key here, so the join-based MERGE is exact;
        # with the state table bucketed by id only the delta shuffles
        next_state = state_mod.merge_state_join(
            state,
            latest,
            spec.id_field,
            ignore=(spec.ts_field,),
            ttl_hours=config.state_ttl_hours,
            now_epoch_ms=now_epoch_ms,
        )
    else:
        next_state = state_mod.merge_state(
            state,
            latest,
            spec.id_field,
            ignore=(spec.ts_field,),
            ts_field=spec.ts_field,
            ttl_hours=config.state_ttl_hours,
            now_epoch_ms=now_epoch_ms,
        )
    persist_state(next_state)
    # one fused job gives both the checkpoint high-water mark and the
    # input-row metric from the cached incoming scan
    mx, n_input = ckpt_mod.max_ts_and_count(incoming, spec.ts_field)
    new_ckpt = ckpt_mod.next_checkpoint(mx, checkpoint, partial_results)
    ckpt_mod.save_checkpoint(config.state_dir, spec.name, new_ckpt)

    result = RunResult(
        table=spec.name,
        input_rows=n_input,
        emitted_rows=emitted,
        batches=n_batches,
        checkpoint_ms=new_ckpt,
    )
    # reference per-type summary logging (app.js:56-58)
    log.info(
        "%s: input=%d emitted=%d batches=%d checkpoint=%d",
        spec.name, n_input, emitted, n_batches, new_ckpt,
    )
    incoming.unpersist()
    bodies.unpersist()
    return result


def run_streaming(
    spark: SparkSession,
    spec: TableSpec,
    stream: DataFrame,
    projection: Sequence[Mapping],
    config: EngineConfig,
    sink: Callable[[DataFrame], None],
    checkpoint_dir: str,
    *,
    timeout_sec: float = 120.0,
    now_epoch_ms: int | None = None,
    now_fn: Callable[[int], int] | None = None,
) -> None:
    """The whole reference program as ONE Structured Streaming job.

    ``stream`` is any streaming DataFrame (the `rest_entities` DataSource,
    Kafka, files…). Per micro-batch, foreachBatch runs the same transition
    as :func:`run_incremental` — keep-latest (O15) → changed-rows vs state
    (O5) → projection (O6-O9) → batch bodies (O10) → sink (O11) → state
    MERGE w/ TTL (O12/O13) — while the SOURCE's offset log replaces the
    checkpoint scalar (O3/O14): for the rest_entities source the offset
    literally is ``{"updatedFromMs": N}``.

    Two-layer dedup mirrors the reference exactly: offsets suppress
    re-reads (cache.js:99-119); the content-hash state suppresses re-sends
    of entities whose ``updatedOnMs`` advanced without a real change
    (cache.js:69-85 — the case offsets cannot catch).

    foreachBatch is at-least-once; the sink must upsert by id — the same
    contract the reference documents for its target (README.md:161-171).

    TTL clock: ``now_epoch_ms`` pins one deterministic now for every
    batch (nothing expires mid-run); ``now_fn(batch_id)`` advances it
    per micro-batch, so state written at batch b' is PURGED at the first
    merge whose now exceeds its ttl — the streaming-visible form of the
    reference's expiry-at-update (cache.js:60-67). A continuous
    deployment passes neither and gets the wall clock.

    An EMPTY micro-batch skips the sink but still purges expired state —
    the same contract as run_incremental's empty-fetch path (reference
    cache.js:60-67,101-104): the TTL clock ticks on every batch, so a
    quiet source cannot preserve suppression state past its ttl.

    ``sink`` may accept ``(bodies)`` or ``(bodies, batch_id)`` — the
    two-arg form receives the STREAM's batch id, which is the only
    correct label for per-batch outputs (a caller-side counter
    desynchronizes the moment an empty batch skips the sink).
    """
    import inspect

    from .streaming import planned_batch_rows, run_available_now

    try:
        sink_takes_batch_id = (
            len([
                p
                for p in inspect.signature(sink).parameters.values()
                if p.kind
                in (
                    inspect.Parameter.POSITIONAL_ONLY,
                    inspect.Parameter.POSITIONAL_OR_KEYWORD,
                )
            ])
            >= 2
        )
    except (TypeError, ValueError):  # builtins without signatures
        sink_takes_batch_id = False

    def process(batch_df: DataFrame, batch_id: int) -> None:
        now_b = now_fn(batch_id) if now_fn is not None else now_epoch_ms
        # zero-job empty probe (file-source checkpoint log); non-file
        # sources fall back to the take(1) job. A planned-rows>0 batch
        # emptied by caller-side transforms would run the main branch on
        # an empty frame — same resulting state (merge_state filters
        # expired rows itself), plus one empty sink append.
        rows = planned_batch_rows(checkpoint_dir, batch_id)
        if rows == 0 or (rows is None and batch_df.isEmpty()):
            state = state_mod.load_state(spark, config.state_dir, spec.name)
            if state is not None:
                now = state_mod.now_ms() if now_b is None else now_b
                state_mod.save_state(
                    state.filter(F.col(state_mod.TTL_COL) >= F.lit(now)),
                    config.state_dir,
                    spec.name,
                )
            return
        latest = keep_latest_per_key(batch_df, spec.id_field, spec.ts_field)
        state = state_mod.load_state(spark, config.state_dir, spec.name)
        delta = changed_rows(latest, state, spec.id_field, ignore=(spec.ts_field,))
        jsons = _project_to_json(delta, projection)
        batched = batch_mod.assign_batches_distributed(jsons, config.max_batch_size)
        bodies = batch_mod.assemble_bodies(batched)
        if sink_takes_batch_id:
            sink(bodies, batch_id)
        else:
            sink(bodies)
        next_state = state_mod.merge_state(
            state,
            latest,
            spec.id_field,
            ignore=(spec.ts_field,),
            ts_field=spec.ts_field,
            ttl_hours=config.state_ttl_hours,
            now_epoch_ms=now_b,
        )
        state_mod.save_state(next_state, config.state_dir, spec.name)

    run_available_now(stream, checkpoint_dir, process, timeout_sec=timeout_sec)


def run_all(
    spark: SparkSession,
    catalog_specs: Sequence[TableSpec],
    sources: Mapping[str, DataFrame],
    projections: Mapping[str, Sequence[Mapping]],
    config: EngineConfig,
    sink: Callable[[DataFrame], None],
    requested: Sequence[str] | None = None,
) -> list[RunResult]:
    """Loop over tables (reference main(), app.js:20-27): tables without a
    projection spec are skipped with a warning, mirroring the missing-template
    guard (app.js:22-25); ``requested`` filters by name (app.js:62-69)."""
    req = set(requested or [])
    results = []
    for spec in catalog_specs:
        if req and spec.name not in req:
            continue
        if spec.name not in projections:
            log.warning("no projection spec for table %s; skipping", spec.name)
            continue
        results.append(
            run_incremental(
                spark, spec, sources[spec.name], projections[spec.name], config, sink
            )
        )
    return results
