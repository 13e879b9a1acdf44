"""Pluggable state backends behind one MERGE interface (O12/O13).

The reference persists its cache after every page (app.js:55-58,
cache.js:37-42) — on a lakehouse that contract is a table-format MERGE
(Delta/Iceberg: an ATOMIC manifest-pointer swap with time travel). This
sandbox has no ``delta-spark``, so the engine ships the probe + the
interface now, with two always-available backends proving the contract;
when the package is present the Delta backend activates with NO caller
changes — the swap is one config value.

Interface (every backend): ``load(spark, state_dir, table)`` →
DataFrame | None, ``save(state, state_dir, table, id_field)``,
plus the shared logical transition :func:`entity_etl_spark.state.
merge_state_join` (purge expired → upsert matched → insert new →
refresh TTL) which is exactly the ``MERGE INTO … WHEN MATCHED UPDATE
WHEN NOT MATCHED INSERT`` statement the Delta backend issues natively.

Backends:

- ``parquet`` — generation-swap parquet dir (:func:`state.save_state`).
  Zero catalog dependencies; the test/oracle workhorse.
- ``bucketed`` — warehouse table bucketed+sorted by id
  (:func:`state.save_state_bucketed`): the recurring merge join needs no
  state-side shuffle. The 100 TB default where Delta is unavailable.
- ``delta`` — real ``MERGE INTO`` against a Delta table (atomic commit,
  concurrent-reader safe, time travel). Requires the probe to pass.

``resolve_backend("auto")`` picks delta when available, else bucketed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from . import state as _state


def delta_available(spark: SparkSession | None = None) -> bool:
    """Capability probe for the Delta Lake backend.

    True only when the ``delta-spark`` package imports AND (when a
    session is given) the session was built with the Delta SQL extension
    + catalog — both are required for ``MERGE INTO`` to parse. A bare
    import without the extension yields AnalysisException at first use,
    so the probe checks the config too."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    if spark is not None:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        if "DeltaSparkSessionExtension" not in ext:
            return False
    return True


@dataclass(frozen=True)
class _ParquetBackend:
    name: str = "parquet"

    def load(self, spark, state_dir, table):
        return _state.load_state(spark, state_dir, table)

    def save(self, state, state_dir, table, id_field):
        _state.save_state(state, state_dir, table)


@dataclass(frozen=True)
class _BucketedBackend:
    name: str = "bucketed"

    def load(self, spark, state_dir, table):
        return _state.load_state_bucketed(spark, state_dir, table)

    def save(self, state, state_dir, table, id_field):
        _state.save_state_bucketed(state, state_dir, table, id_field)


@dataclass(frozen=True)
class _DeltaBackend:
    """Real Delta MERGE. Only constructed when :func:`delta_available`.

    ``save`` here is the full transition in one atomic commit: the next
    state produced by ``merge_state_join`` overwrites via MERGE keyed on
    ``id_field`` (matched → update hash/ttl, unmatched-source → insert,
    state rows absent from the next state = expired → delete). Readers
    concurrent with the commit see the previous snapshot — the property
    the generation-swap backends emulate with pointer files."""

    name: str = "delta"

    def _path(self, state_dir, table):
        import os

        return os.path.join(state_dir, f"{table}.delta")

    def load(self, spark, state_dir, table):
        import os

        p = self._path(state_dir, table)
        if not os.path.exists(p):
            return None
        return spark.read.format("delta").load(p)

    def save(self, state, state_dir, table, id_field):  # pragma: no cover
        # pragma: env-blocked — exercised only where delta-spark exists;
        # the interface contract is pinned by the bucketed/parquet twins
        import os

        from delta.tables import DeltaTable

        spark = state.sparkSession
        p = self._path(state_dir, table)
        if not os.path.exists(p):
            state.write.format("delta").save(p)
            return
        tgt = DeltaTable.forPath(spark, p)
        (
            tgt.alias("t")
            .merge(
                state.alias("s"), f"t.{id_field} = s.{id_field}"
            )
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            # rows missing from the next state were purged (TTL expiry)
            .whenNotMatchedBySourceDelete()
            .execute()
        )


def resolve_backend(kind: str = "auto", spark: SparkSession | None = None):
    """Return the state backend for ``kind`` ('auto' | 'parquet' |
    'bucketed' | 'delta'). 'auto' = delta when the probe passes, else
    bucketed; asking for 'delta' without the capability raises with the
    probe's reason rather than failing later inside a job."""
    if kind == "auto":
        return _DeltaBackend() if delta_available(spark) else _BucketedBackend()
    if kind == "parquet":
        return _ParquetBackend()
    if kind == "bucketed":
        return _BucketedBackend()
    if kind == "delta":
        if not delta_available(spark):
            raise RuntimeError(
                "delta backend requested but delta-spark is not importable "
                "(or the session lacks DeltaSparkSessionExtension); install "
                "delta-spark and build the session with "
                "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
            )
        return _DeltaBackend()
    raise ValueError(f"unknown state backend: {kind}")


def run_merge_cycle(
    backend,
    incoming: DataFrame,
    state_dir: str,
    table: str,
    id_field: str,
    *,
    ttl_hours: float = 8.0,
    now_epoch_ms: int | None = None,
) -> DataFrame:
    """One full state transition through ``backend``: load → MERGE
    (purge/upsert/refresh via ``merge_state_join``) → save; returns the
    next state. This is THE seam every backend shares — a deployment
    switches backend by changing ``resolve_backend``'s argument and
    nothing else (config.json-style one-line swap)."""
    spark = incoming.sparkSession
    prev = backend.load(spark, state_dir, table)
    nxt = _state.merge_state_join(
        prev,
        incoming,
        id_field,
        ttl_hours=ttl_hours,
        now_epoch_ms=now_epoch_ms,
    )
    backend.save(nxt, state_dir, table, id_field)
    return backend.load(spark, state_dir, table)
