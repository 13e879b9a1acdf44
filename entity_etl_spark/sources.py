"""Sources & catalog (O1/O2).

The reference's sources are (a) a paginated REST endpoint serving JSON
entities incrementally (app.js:76-82) and (b) a catalog endpoint listing the
entity types with their ``uniqueIdField`` (app.js:71-74). The engine
generalizes both:

- :func:`read_table` — parquet/json/csv reader (the driver's test harness is
  parquet at /root/testdata/sf*/; a production deployment points the same
  call at an object store).
- :class:`Catalog` — the type registry: table name → TableSpec. The test
  catalog is static; a REST deployment would populate it from the discovery
  endpoint.
- :func:`rest_source` — driver-side paginated REST fetch materialized to a
  DataFrame. The time predicate (``updatedFromMs``) is applied *in the
  request*, mirroring the reference's source-side pushdown (app.js:77-78,
  config.json:9). Kept optional/injectable so tests never need a network.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession

from .model import TableSpec


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", **options
) -> DataFrame:
    reader = spark.read.options(**options)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    if fmt == "orc":
        return reader.orc(path)
    raise ValueError(f"unsupported format: {fmt}")


def read_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test-harness table, e.g. /root/testdata/sf0.01/lineitem.parquet.

    The harness's ``events.ts`` column is parquet TIMESTAMP(NANOS), which
    Spark rejects by default; read it as long nanoseconds and convert to a
    microsecond timestamp (same floor-truncation DuckDB applies when casting
    TIMESTAMP_NS → TIMESTAMP, so oracle comparisons agree)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # integer division — ns/1000 in double would lose precision at
        # epoch-nanosecond magnitude (2^62 >> 2^53)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_events_since(
    spark: SparkSession, sf_dir: str, min_ts_exclusive_micros: int
) -> DataFrame:
    """Incremental events scan with the time predicate pushed into the
    parquet scan (O3 parity: the reference evaluates ``updatedFromMs``
    source-side, app.js:76-82).

    The ns→µs conversion is monotonic, so ``converted_ts > C`` is rewritten
    onto the RAW nanosecond column (``ts_ns > C*1000 + 999``) *before* the
    conversion — Catalyst pushes the raw predicate to parquet row-group
    stats; a filter on the derived column would not be pushable."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        return df.filter(
            F.col("ts") > F.lit(min_ts_exclusive_micros * 1000 + 999)
        ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.filter(
        F.col("ts").cast("timestamp")
        > F.timestamp_micros(F.lit(min_ts_exclusive_micros))
    )


def register_sf_views(spark: SparkSession, sf_dir: str, names: Iterable[str]) -> None:
    """Register the harness tables as temp views for spark.sql queries."""
    for name in names:
        read_sf_table(spark, sf_dir, name).createOrReplaceTempView(name)


class Catalog:
    """Table registry (reference fetchEntityTypes, app.js:71-74)."""

    def __init__(self, specs: Iterable[TableSpec] = ()):
        self._specs: dict[str, TableSpec] = {s.name: s for s in specs}

    def add(self, spec: TableSpec) -> None:
        self._specs[spec.name] = spec

    def get(self, name: str) -> TableSpec:
        return self._specs[name]

    def names(self) -> list[str]:
        return sorted(self._specs)

    def select(self, requested: Iterable[str] | None = None) -> list[TableSpec]:
        """Filter the catalog by requested names (reference CLI-arg semi-join,
        app.js:62-69: empty request = all types)."""
        req = list(requested or [])
        if not req:
            return [self._specs[n] for n in self.names()]
        return [self._specs[n] for n in self.names() if n in set(req)]


def rest_source(
    spark: SparkSession,
    fetch_page: Callable[[int], Mapping],
    checkpoint_ms: int,
) -> tuple[DataFrame, bool]:
    """Drain a paginated incremental REST source into one DataFrame.

    ``fetch_page(updated_from_ms) -> {"items": [...], "partialResults": bool}``
    (the reference response envelope, README.md:205-256). The driver-side loop
    mirrors app.js:48-59 ``do…while(partialResults)``; each page's max
    timestamp advances the request cursor. Returns (df, saw_partial).

    This is the ingest edge, not the compute path — page sizes are bounded by
    the source API, so driver materialization is O(page), and the DataFrame
    hand-off immediately distributes.
    """
    rows: list[str] = []
    partial = True
    saw_partial = False
    cursor = checkpoint_ms
    while partial:
        resp = fetch_page(cursor)
        items = list(resp.get("items", []))
        partial = bool(resp.get("partialResults", False))
        saw_partial = saw_partial or partial
        rows.extend(json.dumps(it) for it in items)
        if partial:
            ts_values = [
                it["updatedOnMs"]
                for it in items
                if isinstance(it.get("updatedOnMs"), int)
            ]
            if not ts_values:
                break
            # monotone: stale pages can't move the cursor backward; equality
            # (or regression) bumps +1 for forward progress
            new_cursor = max(ts_values)
            cursor = new_cursor if new_cursor > cursor else cursor + 1
    df = spark.read.json(spark.sparkContext.parallelize(rows or ["{}"]))
    if not rows:
        df = df.limit(0)
    return df, saw_partial


def reference_catalog() -> Catalog:
    """The catalog a reference deployment migrates with: one TableSpec per
    shipped projection spec (entity type), with the reference's id fields
    (``uniqueIdField``, app.js:46: AWSUniqueId for AWS types — the sample
    payload README.md:209-228; the Azure/GCE specs key on their stable
    instance ids) and the reserved ``updatedOnMs`` event-time column
    (cache.js:16)."""
    from .mapping import load_projection_specs

    id_fields = {"azureVm": "azure_vm_id", "gce": "gcp_id"}
    return Catalog(
        TableSpec(
            name=name,
            id_field=id_fields.get(name, "AWSUniqueId"),
            ts_field="updatedOnMs",
        )
        for name in load_projection_specs()
    )
