"""Query registry: every SURVEY.md §2 operator as a (Spark DataFrame fn,
DuckDB oracle SQL) pair over the driver's test tables.

Conventions (driver contract, __spark_entry__.py):

- each Spark fn takes ``(spark, sf_dir)`` and returns a DataFrame;
- every computed column is aliased identically in Spark and SQL;
- timestamps are rendered to strings (µs precision) in BOTH engines —
  engine-native timestamp encodings differ, strings hash identically;
- double aggregates are ``round(x, N)``-ed in BOTH engines (Spark and DuckDB
  sum doubles in different orders; rounding absorbs the last-ulp wobble);
- DuckDB ``sum(BIGINT)`` returns INT128 — always cast back to BIGINT.

Reference citations (file:line into /root/reference) are on each entry; the
extension operators (E1-E6) cite SURVEY.md §2.3 instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import tsutil
from .delta import changed_rows
from .sources import read_sf_table

# event-time cutoff splitting `events` into "state so far" vs "incoming page"
CUTOFF = "2024-01-20 00:00:00"

SPARK_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


@dataclass
class Q:
    """One registered query: Spark impl + optional DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Q] = {}


def register(name: str, sql: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = Q(fn=fn, sql=sql, doc=doc, tags=tags)
        return fn

    return deco


def _ts_str(col):
    return F.date_format(col, SPARK_TS_FMT)


# ---------------------------------------------------------------------------
# Core reference operators (SURVEY §2.1)
# ---------------------------------------------------------------------------


@register(
    "incremental_scan",
    f"""
    SELECT event_id,
           strftime(ts, '{DUCK_TS_FMT}') AS ts_str,
           user_id, event_type, value
    FROM events
    WHERE ts > TIMESTAMP '{CUTOFF}'
    """,
    doc="O1/O3 app.js:76-82: source scan with the checkpoint predicate "
    "pushed into the scan (parquet row-group pruning).",
    tags=("core", "bench"),
)
def q_incremental_scan(spark: SparkSession, sf: str) -> DataFrame:
    from datetime import datetime, timezone

    from .sources import read_events_since

    cutoff_us = int(
        datetime.strptime(CUTOFF, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=timezone.utc)
        .timestamp()
        * 1_000_000
    )
    ev = read_events_since(spark, sf, cutoff_us)
    return ev.select(
        "event_id",
        _ts_str(F.col("ts")).alias("ts_str"),
        "user_id",
        "event_type",
        "value",
    )


@register(
    "filter_isin",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE event_type IN ('signup', 'purchase')
    GROUP BY event_type
    """,
    doc="O4 app.js:62-69: CLI-args type filter as an IN-list predicate.",
    tags=("core",),
)
def q_filter_isin(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "semi_join_filter",
    """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    GROUP BY c_nationkey
    """,
    doc="O4 app.js:22-25: template-exists guard as a left-semi join against "
    "the spec catalog (broadcast at scale: the catalog is tiny).",
    tags=("core",),
)
def q_semi_join_filter(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_sf_table(spark, sf, "customer")
    nation = read_sf_table(spark, sf, "nation").filter(F.col("n_regionkey") == 2)
    return (
        cust.join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
            "left_semi",
        )
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "changed_rows",
    f"""
    WITH state AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '{CUTOFF}') WHERE rn = 1
    ), incoming AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts > TIMESTAMP '{CUTOFF}') WHERE rn = 1
    )
    SELECT i.user_id, i.event_type, i.value
    FROM incoming i LEFT JOIN state s ON i.user_id = s.user_id
    WHERE s.user_id IS NULL
       OR i.event_type <> s.event_type OR i.value <> s.value
    """,
    doc="O5 cache.js:69-85 (the core operator): new-or-changed rows vs the "
    "state snapshot, ignoring the event-time column — content hash + left "
    "join in Spark; field-equality in the oracle.",
    tags=("core", "bench"),
)
def q_changed_rows(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")

    def latest(df):
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("user_id", "event_type", "value")
        )

    cutoff = F.lit(CUTOFF).cast("timestamp")
    state = latest(ev.filter(F.col("ts") <= cutoff))
    incoming = latest(ev.filter(F.col("ts") > cutoff))
    from .delta import with_content_hash, HASH_COL

    state_h = with_content_hash(state, exclude=()).select(
        "user_id", F.col(HASH_COL)
    )
    return changed_rows(incoming, state_h, "user_id", ignore=())


@register(
    "keep_latest_per_key",
    f"""
    SELECT user_id, event_id, event_type,
           strftime(ts, '{DUCK_TS_FMT}') AS ts_str
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
    doc="O15 cache.js:55-57: last-write-wins per key (Map.set) as a "
    "keep-latest window.",
    tags=("core", "bench"),
)
def q_keep_latest(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id", "event_id", "event_type", _ts_str(F.col("ts")).alias("ts_str")
        )
    )


@register(
    "projection_mapping",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS cmdb_ci,
           c_name AS name,
           'Customer' AS type,
           'Acme' AS vendor,
           c_mktsegment AS segment,
           'balance=' || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
             || ' nation=' || CAST(c_nationkey AS VARCHAR) AS comments
    FROM customer
    """,
    doc="O6/O8 templates/*.hbs via app.js:84-86: rename + literal columns + "
    "string interpolation, compiled to a select list.",
    tags=("core",),
)
def q_projection_mapping(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_sf_table(spark, sf, "customer")
    return cust.select(
        F.col("c_custkey").cast("string").alias("cmdb_ci"),
        F.col("c_name").alias("name"),
        F.lit("Customer").alias("type"),
        F.lit("Acme").alias("vendor"),
        F.col("c_mktsegment").alias("segment"),
        F.concat(
            F.lit("balance="),
            F.col("c_acctbal").cast("decimal(12,2)").cast("string"),
            F.lit(" nation="),
            F.col("c_nationkey").cast("string"),
        ).alias("comments"),
    )


@register(
    "coalesce_fallback",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IS NOT NULL AND o_orderpriority <> ''
                THEN o_orderpriority ELSE o_orderstatus END AS label
    FROM orders
    """,
    doc="O7 templates/awsEc2.hbs:8: Handlebars #with fallback — empty string "
    "AND null are falsy (plain coalesce would keep '').",
    tags=("core",),
)
def q_coalesce_fallback(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_sf_table(spark, sf, "orders")
    c = F.col("o_orderpriority")
    return orders.select(
        "o_orderkey",
        F.when(c.isNotNull() & (c != ""), c)
        .otherwise(F.col("o_orderstatus"))
        .alias("label"),
    )


@register(
    "to_json_rows",
    """
    SELECT '{"id":' || CAST(event_id AS VARCHAR)
           || ',"type":"' || event_type || '"}' AS json
    FROM events
    """,
    doc="O9 app.js:85: row → JSON string serialization (deterministic "
    "field order; built via concat in both engines so bytes match).",
    tags=("core",),
)
def q_to_json_rows(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return ev.select(
        F.concat(
            F.lit('{"id":'),
            F.col("event_id").cast("string"),
            F.lit(',"type":"'),
            F.col("event_type"),
            F.lit('"}'),
        ).alias("json")
    )


@register(
    "batch_assembly",
    """
    WITH numbered AS (
      SELECT event_id,
             CAST(floor((row_number() OVER (ORDER BY event_id) - 1) / 1000)
                  AS BIGINT) AS batch_id
      FROM events
    )
    SELECT batch_id,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(min(event_id) AS BIGINT) AS first_id,
           CAST(max(event_id) AS BIGINT) AS last_id
    FROM numbered GROUP BY batch_id
    """,
    doc="O10 app.js:95-107: slice into maxBatchSize chunks "
    "(config.json:19) — batch ids via row_number, then per-batch array-agg.",
    tags=("core",),
)
def q_batch_assembly(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    w = Window.orderBy("event_id")
    return (
        ev.withColumn(
            "batch_id", F.floor((F.row_number().over(w) - 1) / F.lit(1000))
        )
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("event_id").alias("first_id"),
            F.max("event_id").alias("last_id"),
        )
    )


@register(
    "batch_assembly_hbs",
    """
    WITH numbered AS (
      SELECT '{"id":' || event_id || '}' AS js,
             CAST(floor((row_number() OVER (ORDER BY event_id) - 1) / 1000)
                  AS BIGINT) AS batch_id
      FROM events
    )
    SELECT batch_id,
           CAST(count(*) AS BIGINT) AS n_items,
           '[' || chr(10) || string_agg(js, ',' ORDER BY js) || chr(10)
               || ']' AS body
    FROM numbered GROUP BY batch_id
    """,
    doc="O10 request bodies through the reference's ACTUAL body template "
    "(templates/targetBody.hbs:1-3, inlined verbatim): {{#each}} compiled "
    "to transform+array_join Column expressions (hbs.compile_hbs_body / "
    "batch.assemble_bodies_hbs) — a migrating user's custom body template "
    "runs unmodified, distributed, zero UDFs. Byte-equal oracle (chr(10) "
    "prefix/suffix from the template literal; items sorted for retry "
    "determinism — the sink is an order-insensitive per-id upsert, "
    "reference README.md:161-171).",
    tags=("core",),
)
def q_batch_assembly_hbs(spark: SparkSession, sf: str) -> DataFrame:
    from .batch import assemble_bodies_hbs

    # templates/targetBody.hbs, byte-verbatim (no trailing newline)
    tpl = (
        "[\n{{#each entities}}{{{.}}}"
        "{{#unless @last}},{{/unless}}{{/each}}\n]"
    )
    ev = read_sf_table(spark, sf, "events")
    w = Window.orderBy("event_id")
    batched = ev.select(
        F.concat(
            F.lit('{"id":'), F.col("event_id").cast("string"), F.lit("}")
        ).alias("json"),
        F.floor((F.row_number().over(w) - 1) / F.lit(1000)).alias(
            "__batch_id"
        ),
    )
    return assemble_bodies_hbs(batched, tpl)


@register(
    "state_merge_upsert",
    f"""
    WITH unioned AS (
      SELECT user_id, event_type, value, ts, event_id, 0 AS prio
      FROM events WHERE ts <= TIMESTAMP '{CUTOFF}'
      UNION ALL
      SELECT user_id, event_type, value, ts, event_id, 1 AS prio
      FROM events WHERE ts > TIMESTAMP '{CUTOFF}'
    )
    SELECT user_id, event_type, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY prio DESC, ts DESC, event_id DESC) AS rn
      FROM unioned) WHERE rn = 1
    """,
    doc="O12 cache.js:50-58: MERGE/upsert last-write-wins — union + "
    "keep-latest window (Delta MERGE equivalent without Delta).",
    tags=("core", "bench"),
)
def q_state_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    cutoff = F.lit(CUTOFF).cast("timestamp")
    old = ev.filter(F.col("ts") <= cutoff).withColumn("prio", F.lit(0))
    new = ev.filter(F.col("ts") > cutoff).withColumn("prio", F.lit(1))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("prio"), F.desc("ts"), F.desc("event_id")
    )
    return (
        old.unionByName(new)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", "value")
    )


@register(
    "ttl_expiry",
    f"""
    SELECT user_id, CAST(count(*) AS BIGINT) AS live_events
    FROM events
    WHERE ts >= TIMESTAMP '{CUTOFF}'
    GROUP BY user_id
    """,
    doc="O13 cache.js:60-67: TTL purge — state rows older than the horizon "
    "are dropped during the merge.",
    tags=("core",),
)
def q_ttl_expiry(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return (
        ev.filter(F.col("ts") >= F.lit(CUTOFF).cast("timestamp"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("live_events"))
    )


@register(
    "checkpoint_max",
    f"""
    SELECT strftime(max(ts), '{DUCK_TS_FMT}') AS max_ts_str,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    """,
    doc="O14 cache.js:99-119: checkpoint advance = max(updatedOnMs) — the "
    "reference sorts desc and takes head; here a map-side-combined max.",
    tags=("core",),
)
def q_checkpoint_max(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return ev.agg(
        _ts_str(F.max("ts")).alias("max_ts_str"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
    doc="O9/JSON functions (app.js:73,81 res.json(); cache.js:26 "
    "JSON.parse): JSON field extraction from a string column.",
    tags=("core",),
)
def q_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


# ---------------------------------------------------------------------------
# Relational analytics (SURVEY §2.2 categories: aggregations, joins, windows,
# sorts/top-k, rollup, date/time) — the generalized engine surface
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    -- money sums ride exact DECIMAL factor-wise (the q9 pattern; the r7
    -- sf10 spot caught the double sums crossing the 2-dec grid at 1e12
    -- magnitudes); averages derive from the SAME exact sums so the
    -- double quotient is bit-identical in both engines, quantized with
    -- the portable floor form
    WITH g AS (
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sq,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sbase,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(12,4))
                    - CAST(l_discount AS DECIMAL(12,4)))) AS sdisc,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(12,4))
                    - CAST(l_discount AS DECIMAL(12,4)))
                 * (CAST(1 AS DECIMAL(12,4))
                    + CAST(l_tax AS DECIMAL(12,4)))) AS schg,
             sum(CAST(l_discount AS DECIMAL(12,2))) AS sdsc,
             count(*) AS cnt
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           round(CAST(sq AS DOUBLE), 2) AS sum_qty,
           CAST(floor(sbase * 100 + 0.5) AS DOUBLE) / 100 AS sum_base_price,
           CAST(floor(sdisc * 100 + 0.5) AS DOUBLE) / 100 AS sum_disc_price,
           CAST(floor(schg * 100 + 0.5) AS DOUBLE) / 100 AS sum_charge,
           floor(CAST(sq AS DOUBLE) / cnt * 10000 + 0.5) / 10000 AS avg_qty,
           floor(CAST(sbase AS DOUBLE) / cnt * 10000 + 0.5) / 10000
             AS avg_price,
           floor(CAST(sdsc AS DOUBLE) / cnt * 10000 + 0.5) / 10000
             AS avg_disc,
           CAST(cnt AS BIGINT) AS count_order
    FROM g
    """,
    doc="TPC-H Q1 shape: grouped multi-aggregate scan; partial (map-side) "
    "aggregation + single shuffle on the 2-col group key.",
    tags=("analytics", "bench"),
)
def q_q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    # exact DECIMAL money sums factor-wise (q9 pattern; the r7 sf10 spot
    # caught the double sums crossing the 2-dec grid at 1e12 magnitudes);
    # averages reuse the SAME exact sums -> identical double quotient in
    # both engines; final quantize via the portable floor form
    one = F.lit(1).cast("decimal(12,4)")
    price4 = F.col("l_extendedprice").cast("decimal(18,4)")
    disc4 = F.col("l_discount").cast("decimal(12,4)")
    tax4 = F.col("l_tax").cast("decimal(12,4)")
    half = F.lit("0.5").cast("decimal(2,1)")

    def money2(dec_sum):
        return F.floor(dec_sum * 100 + half).cast("double") / 100

    def avg4(dec_sum, cnt):
        return (
            F.floor(dec_sum.cast("double") / cnt * 10000 + F.lit(0.5))
            / 10000
        )

    g = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("__sq"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "__sbase"
            ),
            F.sum(price4 * (one - disc4)).alias("__sdisc"),
            F.sum(price4 * (one - disc4) * (one + tax4)).alias("__schg"),
            F.sum(F.col("l_discount").cast("decimal(12,2)")).alias("__sdsc"),
            F.count(F.lit(1)).alias("__cnt"),
        )
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("__sq").cast("double"), 2).alias("sum_qty"),
        money2(F.col("__sbase")).alias("sum_base_price"),
        money2(F.col("__sdisc")).alias("sum_disc_price"),
        money2(F.col("__schg")).alias("sum_charge"),
        avg4(F.col("__sq"), F.col("__cnt")).alias("avg_qty"),
        avg4(F.col("__sbase"), F.col("__cnt")).alias("avg_price"),
        avg4(F.col("__sdsc"), F.col("__cnt")).alias("avg_disc"),
        F.col("__cnt").alias("count_order"),
    )


@register(
    "top_orders_revenue",
    """
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join + grouped revenue + top-k. The customer "
    "dim is broadcast; lineitem↔orders is the only real shuffle.",
    tags=("analytics", "bench"),
)
def q_top_orders_revenue(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_sf_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_sf_table(spark, sf, "orders")
    li = read_sf_table(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "region_nation_revenue",
    """
    SELECT r_name, n_name,
           CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(12,4))
                             - CAST(l_discount AS DECIMAL(12,4))))
                      * 100 + 0.5) AS DOUBLE) / 100 AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY r_name, n_name
    """,
    doc="TPC-H Q5 shape: star join through two broadcast dims into the fact "
    "chain; grouped revenue per (region, nation).",
    tags=("analytics", "bench"),
)
def q_region_nation_revenue(spark: SparkSession, sf: str) -> DataFrame:
    region = read_sf_table(spark, sf, "region")
    nation = read_sf_table(spark, sf, "nation")
    cust = read_sf_table(spark, sf, "customer")
    orders = read_sf_table(spark, sf, "orders")
    li = read_sf_table(spark, sf, "lineitem")
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(dims, cust.c_nationkey == nation.n_nationkey)
        .groupBy("r_name", "n_name")
        .agg(
            (
                F.floor(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,4)")
                        * (
                            F.lit(1).cast("decimal(12,4)")
                            - F.col("l_discount").cast("decimal(12,4)")
                        )
                    )
                    * 100
                    + F.lit("0.5").cast("decimal(2,1)")
                ).cast("double")
                / 100
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "top_customers_per_nation",
    """
    SELECT n_name, c_name, spend, rnk FROM (
      SELECT n_name, c_name,
             round(sum(o_totalprice), 2) AS spend,
             CAST(row_number() OVER (PARTITION BY n_name
                  ORDER BY round(sum(o_totalprice), 2) DESC, c_name)
                  AS BIGINT) AS rnk
      FROM nation
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      GROUP BY n_name, c_name)
    WHERE rnk <= 3
    """,
    doc="Window top-k per group (SURVEY §2.2 'window functions'): rank "
    "customers by spend within each nation, keep top 3.",
    tags=("analytics", "bench"),
)
def q_top_customers_per_nation(spark: SparkSession, sf: str) -> DataFrame:
    nation = read_sf_table(spark, sf, "nation")
    cust = read_sf_table(spark, sf, "customer")
    orders = read_sf_table(spark, sf, "orders")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("spend"), "c_name")
    return (
        spend.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_name", "spend", "rnk")
    )


@register(
    "rollup_order_stats",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 + 0.5)
                AS DOUBLE) / 100 AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="Grouping-sets/rollup (SURVEY §2.2 'aggregations — grouping sets "
    "ABSENT in reference'): hierarchical totals in one pass.",
    tags=("analytics",),
)
def q_rollup_order_stats(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_sf_table(spark, sf, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100
                + F.lit("0.5").cast("decimal(2,1)")
            ).cast("double")
            / 100
        ).alias("total"),
    )


@register(
    "set_ops_except",
    """
    SELECT user_id FROM events
    WHERE event_type = 'view' AND ts < TIMESTAMP '2024-01-02'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-02'
    """,
    doc="Set ops (SURVEY §2.2 'set ops ABSENT in reference'): users who "
    "viewed but never errored (EXCEPT = distinct left-anti).",
    tags=("analytics",),
)
def q_set_ops_except(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    day1 = F.lit("2024-01-02").cast("timestamp")
    viewed = ev.filter(
        (F.col("event_type") == "view") & (F.col("ts") < day1)
    ).select("user_id")
    errored = ev.filter(
        (F.col("event_type") == "error") & (F.col("ts") < day1)
    ).select("user_id")
    return viewed.subtract(errored)


@register(
    "sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM gaps GROUP BY user_id
    """,
    doc="Sessionization (streaming §2.2 'session windows ABSENT in "
    "reference'; batch form): gap>30min via lag window + cumulative flag.",
    tags=("analytics", "bench"),
)
def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic (NTZ-safe, exact micros) — same semantics as the
    # oracle's `ts - lag(ts) > INTERVAL 30 MINUTE`, no epoch truncation
    gap = F.col("ts") - F.lag("ts").over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.expr("INTERVAL '30' MINUTE")), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "tumbling_window_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling event-time window (streaming §2.2 'windows ABSENT in "
    "reference'; batch form = group by date_trunc).",
    tags=("analytics",),
)
def q_tumbling_window_counts(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_str"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "percentile_value_by_type",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(min(value), 4) AS vmin,
           round(max(value), 4) AS vmax
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated quantiles per group (E6's exact twin; the "
    "approx_* variants are registered rows-only).",
    tags=("analytics",),
)
def q_percentile_value_by_type(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


@register(
    "approx_distinct_users",
    """
    SELECT event_type, true AS within_5pct
    FROM events GROUP BY event_type
    """,
    doc="E6 approx_count_distinct (HLL++), stated decidably: per event_type "
    "the HLL estimate must land within 5% of the exact distinct count. "
    "The sketch runs at rsd=0.01 so the 5% assertion has a ~5-sigma "
    "margin at ANY scale factor (the default rsd=0.05 sketch landed one "
    "sf0.1 group just past its own 1-sigma bound — a correct sketch, a "
    "too-tight claim). Another engine cannot reproduce a sketch's exact "
    "estimate, so the cross-engine-checkable claim is the epsilon bound, "
    "computed in-engine and asserted as a boolean the oracle pins.",
    tags=("analytics",),
)
def q_approx_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("__approx"),
            F.countDistinct("user_id").alias("__exact"),
        )
        .select(
            "event_type",
            (
                F.abs(F.col("__approx") - F.col("__exact")) / F.col("__exact")
                <= 0.05
            ).alias("within_5pct"),
        )
    )


@register(
    "distinct_users_exact",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="Exact distinct aggregate (SURVEY §2.2 'distinct-agg ABSENT in "
    "reference').",
    tags=("analytics",),
)
def q_distinct_users_exact(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Extension operators (SURVEY §2.3, E1-E6): LLM-data-pipeline surface
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY text
    """,
    doc="E1 exact dedup: one representative (min id) per distinct content; "
    "the shuffle carries (fingerprint,id), not document bodies.",
    tags=("ext", "bench"),
)
def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import fingerprint

    docs = read_sf_table(spark, sf, "documents")
    return (
        docs.withColumn("__fp", fingerprint("text", "md5"))
        .groupBy("__fp")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keeper_id", "n_copies")
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id, md5(text) AS fp FROM documents
    """,
    doc="E1 content fingerprint (md5 hex) per document — the stable key the "
    "dedup/state ops hang off.",
    tags=("ext",),
)
def q_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.text import doc_fingerprint

    docs = read_sf_table(spark, sf, "documents")
    return docs.select("doc_id", doc_fingerprint("text").alias("fp"))


@register(
    "ngram_jaccard_pairs",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
    doc="E2 exact n-gram (k=3) Jaccard near-dup pairs via shingle equi-join "
    "— ground truth for the MinHash/SimHash approximations.",
    tags=("ext",),
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import jaccard_pairs

    docs = read_sf_table(spark, sf, "documents")
    return jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)


# SF-portable MinHash oracle (the simhash md5-prefix precedent, extended
# to the full LSH pipeline in round 7): the registry query runs
# minhash_near_dups with the portable md5-coefficient hash family and
# exact string band keys, so the ENTIRE pipeline — shingle, 64-way
# signature fold, 16 banded buckets, bucket self-join, exact-Jaccard
# verification — restates relationally at ANY scale factor. The emitted
# pair set is deterministic (same signatures, same buckets in both
# engines); the probabilistic-recall CONTRACT of LSH is gated separately
# by minhash_recall_gate (bench2), which measures recall against the
# exact pair set.
from .ext.dedup import portable_minhash_params as _pmp  # noqa: E402

_MH_PARAMS = _pmp(64)
_MH_P = 2_147_483_647
_MH_SIG = ",\n         ".join(
    f"MIN((({a}*lo) % {_MH_P} + ({b}*hi) % {_MH_P} + {c}) % {_MH_P}) AS h{i}"
    for i, (a, b, c) in enumerate(_MH_PARAMS)
)
_MH_BANDS = ",\n        ".join(
    "concat('{i}_', h{a}, '_', h{b}, '_', h{c}, '_', h{d})".format(
        i=i, a=4 * i, b=4 * i + 1, c=4 * i + 2, d=4 * i + 3
    )
    for i in range(16)
)
_MINHASH_ORACLE = f"""
    -- full relational MinHash+LSH (portable md5-coefficient family):
    -- 64-way signature fold, 16x4 string band keys, bucket join,
    -- exact-Jaccard verify at 0.5
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id AS doc, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    hh AS (
      SELECT doc,
             CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) AS lo,
             CAST(('0x' || substring(md5(s), 9, 8)) AS BIGINT) AS hi
      FROM sh
    ),
    sig AS (
      SELECT doc,
         {_MH_SIG}
      FROM hh GROUP BY doc
    ),
    bucket AS (
      SELECT doc, unnest([
        {_MH_BANDS}]) AS key
      FROM sig
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM bucket a JOIN bucket b ON a.key = b.key AND a.doc < b.doc
    ),
    sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.doc = c.doc_a
      JOIN sh sb ON sb.doc = c.doc_b AND sb.s = sa.s
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc = i.doc_a
    JOIN sizes sb ON sb.doc = i.doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """


# Capped-LSH pair CTE chain (shared by the production dedup twins): the
# same portable md5 pipeline as _MINHASH_ORACLE with the hot-bucket cap
# restated relationally — buckets holding more than max_bucket_size docs
# are dropped whole BEFORE the pair join (cap_hot_groups semantics).
_MINHASH_CAPPED_CTES = f"""
    toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id AS doc, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    hh AS (
      SELECT doc,
             CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) AS lo,
             CAST(('0x' || substring(md5(s), 9, 8)) AS BIGINT) AS hi
      FROM sh
    ),
    sig AS (
      SELECT doc,
         {_MH_SIG}
      FROM hh GROUP BY doc
    ),
    bucket AS MATERIALIZED (
      SELECT doc, unnest([
        {_MH_BANDS}]) AS key
      FROM sig
    ),
    bkept AS (SELECT key FROM bucket GROUP BY key
              HAVING count(*) <= 2000),
    bucketc AS (SELECT b.doc, b.key FROM bucket b JOIN bkept USING (key)),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM bucketc a JOIN bucketc b ON a.key = b.key AND a.doc < b.doc
    ),
    sizes AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cand c
      JOIN sh sa ON sa.doc = c.doc_a
      JOIN sh sb ON sb.doc = c.doc_b AND sb.s = sa.s
      GROUP BY 1, 2
    ),
    vpairs AS MATERIALIZED (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc = i.doc_a
      JOIN sizes sb ON sb.doc = i.doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    )"""


@register(
    "minhash_near_dups",
    _MINHASH_ORACLE,
    doc="E2 MinHash(64) + banded LSH(16x4) near-dup pairs, exact-Jaccard "
    "verified >= 0.5 (ext/dedup.minhash_near_dups). Runs the portable "
    "md5-coefficient hash family + exact string band keys so the oracle "
    "restates the full pipeline relationally at any SF (xxhash64 stays "
    "the cheaper default for non-replayed use). 100 TB shape: signatures "
    "map-side, bucket join, verify candidates only. The probabilistic "
    "recall contract is gated separately (minhash_recall_gate, bench2) — "
    "this entry is the production-shaped linear leg under the frozen "
    "headline name.",
    tags=("ext", "bench"),
)
def q_minhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import minhash_near_dups

    docs = read_sf_table(spark, sf, "documents")
    return minhash_near_dups(
        docs,
        "doc_id",
        "text",
        num_hashes=64,
        bands=16,
        verify_threshold=0.5,
        hash_fn="md5",
    )


@register(
    "minhash_near_dups_xxh64",
    None,  # engine-native xxhash64 has no ANSI restatement (that is WHY
    # the frozen headline runs the portable md5 family); correctness is
    # pinned instead by tests/test_ext_round7.py: every emitted pair is
    # exact-Jaccard >= 0.5 BY CONSTRUCTION (subset-of-exact asserted) and
    # recall vs the exact pair set is gated at the same 0.75 floor the
    # relational recall gate uses
    doc="E2 MinHash(64)+LSH(16x4) near-dup pairs on the DEPLOYABLE "
    "engine-native hash family (hash_fn='xxhash64', the "
    "ext/dedup.minhash_near_dups default): one xxhash64 per shingle "
    "folded 64 ways map-side, xxhash64 band keys, bucket join, exact "
    "verify on candidates only. Identical plan shape to the frozen "
    "headline minhash_near_dups — only the hash family differs — so "
    "this entry benches the production form's constant factor while "
    "the md5 twin keeps the full relational oracle (VERDICT r7 item 3).",
    tags=("ext", "bench"),
)
def q_minhash_near_dups_xxh64(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import minhash_near_dups

    docs = read_sf_table(spark, sf, "documents")
    return minhash_near_dups(
        docs,
        "doc_id",
        "text",
        num_hashes=64,
        bands=16,
        verify_threshold=0.5,
        hash_fn="xxhash64",
    )


@register(
    "minhash_recall_gate",
    r"""
    -- LSH is probabilistic near its S-curve threshold: r5's sf1 rehearsal
    -- measured 76% recall at 32 hashes / 8 bands (S-curve ~0.59 vs the 0.5
    -- verify threshold), so a pair-set-equality oracle only held at small
    -- SF by luck. The decidable cross-engine claim (embedding_ivf_topk
    -- precedent) is: every emitted pair is exact (n_false_pos = 0, because
    -- candidates are exact-Jaccard-verified) and recall vs the exact pair
    -- set clears a pinned floor at the aligned 64/16 config.
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    )
    SELECT CAST(count(*) AS BIGINT) AS n_truth_pairs,
           CAST(0 AS BIGINT) AS n_false_pos,
           true AS recall_ok
    FROM truth
    """,
    doc="E2 MinHash+LSH recall GATE: the production xxhash64 pipeline "
    "measured against the exact pair set computed in-query "
    "(ext/dedup.jaccard_pairs) — emits the truth-pair count, the "
    "false-positive count (0: every candidate is exact-Jaccard-verified) "
    "and a recall >= 0.75 gate at the aligned 64/16 config. "
    "Quadratic-truth by design (the exact join IS the point), so it "
    "lives in the heavy group; the frozen headline name benches the "
    "linear LSH leg (minhash_near_dups).",
    tags=("ext", "bench2"),
)
def q_minhash_recall_gate(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import jaccard_pairs, minhash_near_dups

    docs = read_sf_table(spark, sf, "documents")
    truth = jaccard_pairs(docs, "doc_id", "text", 3, 0.5).select(
        "doc_a", "doc_b", F.lit(1).alias("__t")
    )
    approx = minhash_near_dups(
        docs, "doc_id", "text", num_hashes=64, bands=16, verify_threshold=0.5
    ).select(
        F.col("doc_a").alias("__qa"),
        F.col("doc_b").alias("__qb"),
        F.lit(1).alias("__a"),
    )
    both = truth.join(
        approx,
        (truth["doc_a"] == approx["__qa"]) & (truth["doc_b"] == approx["__qb"]),
        "full_outer",
    )
    return both.agg(
        F.coalesce(F.sum("__t"), F.lit(0)).cast("bigint").alias(
            "n_truth_pairs"
        ),
        F.count(F.when(F.col("__t").isNull(), 1)).cast("bigint").alias(
            "n_false_pos"
        ),
        F.coalesce(  # an empty truth set is vacuously full recall
            F.count(
                F.when(F.col("__t").isNotNull() & F.col("__a").isNotNull(), 1)
            )
            / F.sum("__t")
            >= 0.75,
            F.lit(True),
        ).alias("recall_ok"),
    )


@register(
    "prefix_filter_pairs",
    r"""
    -- the exact n-gram-Jaccard pair set at t = 0.7: prefix filtering is
    -- deterministic (100% recall by the SSJoin prefix lemma) and every
    -- candidate is exact-verified, so the output EQUALS the exact set —
    -- a full-strength oracle at any SF, unlike the probabilistic LSH path
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.7
    """,
    doc="E2 AllPairs/PPJoin prefix-filtered exact Jaccard join at t=0.7 "
    "(ext/dedup.prefix_filter_pairs): shingles ranked rarest-first by "
    "global df, the inverted index built over per-doc PREFIXES only "
    "(length n - ceil(t*n) + 1), candidates pruned by length + PPJoin "
    "positional filters, then exact-verified. 100% recall by "
    "construction — the deterministic high-threshold scale path: at "
    "t=0.7 the index holds ~30% of shingles and the quadratic "
    "stop-shingle postings never enter it.",
    tags=("ext",),
)
def q_prefix_filter_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import prefix_filter_pairs

    docs = read_sf_table(spark, sf, "documents")
    return prefix_filter_pairs(docs, "doc_id", "text", k=3, threshold=0.7)


# SF-portable SimHash oracle: the registry query runs simhash with the
# repo's PORTABLE md5-prefix token hash (two 32-bit halves — integer
# arithmetic both engines evaluate identically), so the ENTIRE pipeline
# — tokenize, 64 majority votes, 16-bit pigeonhole blocks, block join,
# XOR-popcount Hamming — restates relationally at ANY scale factor
# (replacing the r3 sf0.01 golden pin).
_SIMHASH_VOTES = ",\n         ".join(
    "SUM(CASE WHEN ({h} >> {s}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}".format(
        h="hi" if b >= 32 else "lo", s=b % 32, b=b
    )
    for b in range(64)
)
_SIMHASH_BLOCKS = ",\n         ".join(
    "("
    + " + ".join(
        f"CASE WHEN b{b} > 0 THEN {1 << (b % 16)} ELSE 0 END"
        for b in range(blk * 16, (blk + 1) * 16)
    )
    + f") AS blk{blk}"
    for blk in range(4)
)
_SIMHASH_ORACLE = f"""
    -- full relational SimHash (portable md5-prefix token hash): 64
    -- majority-vote bits as two 32-bit halves, 4x16-bit pigeonhole
    -- blocks, pairs agree on >= 1 block, exact Hamming filter
    WITH tok AS (
      SELECT doc_id AS doc,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
      FROM documents
    ),
    h AS (
      SELECT doc,
             CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT) AS lo,
             CAST(('0x' || substring(md5(t), 9, 8)) AS BIGINT) AS hi
      FROM tok
    ),
    votes AS (
      SELECT doc,
         {_SIMHASH_VOTES}
      FROM h GROUP BY doc
    ),
    sig AS (
      SELECT doc,
         {_SIMHASH_BLOCKS}
      FROM votes
    )
    SELECT CAST(a.doc AS BIGINT) AS doc_a, CAST(b.doc AS BIGINT) AS doc_b,
           CAST(bit_count(xor(a.blk0, b.blk0)) + bit_count(xor(a.blk1, b.blk1))
              + bit_count(xor(a.blk2, b.blk2)) + bit_count(xor(a.blk3, b.blk3))
            AS INT) AS hamming
    FROM sig a JOIN sig b
      ON a.doc < b.doc
     AND (a.blk0 = b.blk0 OR a.blk1 = b.blk1
          OR a.blk2 = b.blk2 OR a.blk3 = b.blk3)
    WHERE bit_count(xor(a.blk0, b.blk0)) + bit_count(xor(a.blk1, b.blk1))
        + bit_count(xor(a.blk2, b.blk2)) + bit_count(xor(a.blk3, b.blk3)) <= 3
    """


@register(
    "simhash_near_dups",
    _SIMHASH_ORACLE,
    doc="E2 SimHash(64-bit) near-dup pairs within Hamming distance 3, via "
    "the pigeonhole blocked equi-join. Runs the portable md5-prefix token "
    "hash so the oracle restates the full pipeline relationally at any "
    "SF (xxhash64 stays the cheaper default for non-replayed use).",
    tags=("ext",),
)
def q_simhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import simhash_near_dups

    docs = read_sf_table(spark, sf, "documents")
    return simhash_near_dups(
        docs, "doc_id", "text", max_hamming=3, hash_fn="md5"
    )


@register(
    "embedding_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), qe), 6)
               AS score
      FROM embeddings c, q WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, score, rnk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """,
    doc="E3 brute-force cosine top-k: broadcast query batch, map-side "
    "scoring via zip_with/aggregate (JVM, no UDF), per-query top-k window.",
    tags=("ext", "bench"),
)
def q_embedding_topk(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.similarity import topk

    emb = read_sf_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # auto: brute-force cross join below 1k corpus rows, partition-heap
    # above (identical exact results; the heap shape survives 100x)
    return topk(emb, queries, "vec_id", "embedding", k=5, strategy="auto")


# SF-portable hyperplane-LSH oracle: the registry query runs lsh_topk
# with the portable md5-prefix plane family (components exactly
# representable; plane dots quantized to 9 decimals before sign/margin
# decisions), so the FULL ANN pipeline — plane generation, sign-pattern
# buckets, margin-aware multi-probe, bucket join, cosine top-k —
# restates relationally at ANY scale factor (replacing the r3 sf0.01
# golden pin). Shared by embedding_lsh_topk and lsh_topk_recall.
_LSH_TOPK_CTES = """
    planes AS (
      SELECT p.p, j.j,
             CAST(('0x' || substring(md5(p.p || '_' || j.j), 1, 8))
                  AS BIGINT) / 2147483648.0 - 1.0 AS w
      FROM (SELECT unnest(range(4)) AS p) p,
           (SELECT unnest(range(64)) AS j) j
    ),
    dots AS (
      SELECT e.vec_id, pl.p,
             round(SUM(CAST(e.embedding[pl.j + 1] AS DOUBLE) * pl.w), 9)
               AS d
      FROM embeddings e, planes pl
      GROUP BY e.vec_id, pl.p
    ),
    buckets AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN d >= 0 THEN 1 << p ELSE 0 END) AS BIGINT)
               AS bucket
      FROM dots GROUP BY vec_id
    ),
    qrank AS (
      SELECT vec_id AS qid, p,
             row_number() OVER (PARTITION BY vec_id ORDER BY abs(d), p)
               AS rk
      FROM dots WHERE vec_id < 10
    ),
    probes AS (
      SELECT DISTINCT qid, bucket FROM (
        SELECT vec_id AS qid, bucket FROM buckets WHERE vec_id < 10
        UNION ALL
        SELECT r.qid, xor(b.bucket, CAST(1 << r.p AS BIGINT)) AS bucket
        FROM qrank r JOIN buckets b ON b.vec_id = r.qid
        WHERE r.rk <= 3
      )
    ),
    cand AS (
      SELECT DISTINCT pr.qid AS query_id, cb.vec_id AS neighbor_id
      FROM probes pr JOIN buckets cb ON cb.bucket = pr.bucket
      WHERE cb.vec_id <> pr.qid
    ),
    lsh_ranked AS (
      SELECT query_id, neighbor_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
      FROM (
        SELECT c.query_id, c.neighbor_id,
               round(list_cosine_similarity(
                 CAST(ce.embedding AS DOUBLE[]),
                 CAST(qe.embedding AS DOUBLE[])), 6) AS score
        FROM cand c
        JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        JOIN embeddings qe ON qe.vec_id = c.query_id)
    )
"""


@register(
    "embedding_lsh_topk",
    f"""
    -- full relational hyperplane LSH (portable md5 plane family,
    -- round-9 dot quantization): planes=4, margin multi-probe n_probe=4
    -- -> 4 of 16 buckets scanned per query
    WITH {_LSH_TOPK_CTES}
    SELECT query_id, neighbor_id, score, rnk
    FROM lsh_ranked WHERE rnk <= 5
    """,
    doc="E3 LSH-bucketed approximate top-k (random-hyperplane signs, "
    "margin-aware multi-probe): equi-join on bucket replaces the cross "
    "join — the 100 TB ANN path. Runs the portable md5 plane family so "
    "the oracle restates the full pipeline relationally at any SF "
    "(xxhash64 planes stay the cheaper default elsewhere).",
    tags=("ext",),
)
def q_embedding_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.similarity import lsh_topk

    emb = read_sf_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(
        emb, queries, "vec_id", "embedding",
        k=5, dim=64, n_planes=4, n_probe=4, probe="margin",
        plane_fn="md5",
    )


@register(
    "embedding_norm_stats",
    """
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                  x -> x * x)))), 4) AS avg_norm
    FROM embeddings GROUP BY label
    """,
    doc="E3/E6 vector stats: L2 norm via higher-order aggregate (JVM-side), "
    "grouped per label.",
    tags=("ext",),
)
def q_embedding_norm_stats(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.similarity import norm

    emb = read_sf_table(spark, sf, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(norm(F.col("embedding"))), 4).alias("avg_norm"),
    )


@register(
    "embedding_random_projection",
    """
    SELECT vec_id, CAST(j AS INT) AS dim,
           floor(reduce(
                   list_transform(range(64), i ->
                     CASE WHEN substring(md5('rp7_' || j || '_' || i), 1, 1)
                               < '8'
                          THEN  CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
                          ELSE -CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
                     END),
                   (x, y) -> x + y)
                 * 0.25 * 1e6 + 0.5) / 1e6 AS value
    FROM embeddings, range(16) t(j)
    """,
    doc="E3 dimensionality reduction: Johnson-Lindenstrauss signed "
    "random projection 64 -> 16 dims (Achlioptas database-friendly "
    "+-1 matrix), the standard pre-ANN shrink — a map-side zero-shuffle "
    "codegen transform whose sign matrix both engines derive "
    "independently from md5('rp{seed}_{j}_{i}'); a pinned-order "
    "left-associative double fold + floor-quantization make the values "
    "hash-identical cross-engine.",
    tags=("ext",),
)
def q_embedding_random_projection(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.projection import random_project

    emb = read_sf_table(spark, sf, "embeddings")
    return random_project(
        emb, "vec_id", "embedding", in_dim=64, out_dim=16, seed=7
    )


@register(
    "rp_lsh_topk_clustered",
    """
    -- SRP-LSH is gated on a CLUSTERED set (its documented weak regime is
    -- near-uniform vectors — the r6 reason this operator had no gate).
    -- The clustered set is built in-query from a deterministic portable
    -- md5 +/-1 direction per 20-id micro-cluster, so the construction is
    -- SF-agnostic and float-order-free; like the IVF gate, the decidable
    -- cross-engine claim is the result-shape invariant + a measured
    -- recall floor (0.6, observed 0.85-0.96 across 5 sets incl. the
    -- adversarial generated twins)
    SELECT CAST(5 * (SELECT count(*) FROM embeddings
                     WHERE vec_id % 101 = 0 AND vec_id < 20000)
                AS BIGINT) AS n_truth_pairs,
           true AS recall_ok
    """,
    doc="E3 SRP-LSH ANN gate on a planted clustered distribution "
    "(ext/projection.rp_lsh_topk): corpus vectors are pulled toward a "
    "deterministic md5 +/-1 direction per 20-id micro-cluster (within-"
    "cluster cosine ~0.93 — the clustered regime SRP is FOR; near-"
    "uniform synthetic embeddings are its documented weak regime, which "
    "is why the r6 operator shipped gateless). Queries stride every "
    "101st id so the measurement averages over many clusters instead of "
    "one cluster's bucket luck; recall@5 vs in-query exact brute force "
    "gated >= 0.6 (observed 0.85-0.96 at sf0.001-sf1 incl. the "
    "adversarial clustered/anisotropic generated twins). 100 TB shape: "
    "map-side projection both sides, bucket-long join, Hamming-1 "
    "multi-probe, exact rerank over candidates only.",
    tags=("ext",),
)
def q_rp_lsh_topk_clustered(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.projection import rp_lsh_topk
    from .ext.similarity import topk_brute_force

    emb = read_sf_table(spark, sf, "embeddings")
    sub = F.floor(F.col("vec_id") / 20).cast("string")

    def sign(d: int):
        return F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", sub, F.lit(d))), 1, 4
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            F.lit(0.125),
        ).otherwise(F.lit(-0.125))

    cdir = F.array(*[sign(d) for d in range(64)])
    clustered = (
        emb.withColumn("__c", cdir)
        .withColumn("__e", F.col("embedding").cast("array<double>"))
        .select(
            "vec_id",
            F.zip_with(
                "__e", "__c", lambda x, c: F.lit(0.25) * x + F.lit(0.9) * c
            ).alias("embedding"),
        )
    )
    # query set bounded at <200 ids at ANY SF (stride spreads them over
    # many clusters; the id bound keeps the in-query brute-force truth
    # O(199*n) instead of O(n^2/101) as the corpus grows)
    queries = clustered.filter(
        (F.col("vec_id") % 101 == 0) & (F.col("vec_id") < 20000)
    )
    exact = topk_brute_force(
        clustered, queries, "vec_id", "embedding", k=5
    ).select("query_id", "neighbor_id")
    approx = rp_lsh_topk(
        clustered, queries, "vec_id", "embedding", k=5, n_bits=6
    ).select(
        F.col("query_id").alias("q2"), F.col("neighbor_id").alias("n2")
    )
    hit = exact.join(
        approx,
        (exact.query_id == approx.q2) & (exact.neighbor_id == approx.n2),
        "left",
    )
    return hit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth_pairs"),
        (F.count("n2") / F.count(F.lit(1)) >= 0.6).alias("recall_ok"),
    )


@register(
    "embedding_rp_distance_preservation",
    """
    WITH v AS (
      SELECT vec_id, embedding,
             list_transform(range(16), j ->
               floor(reduce(list_transform(range(64), i ->
                 CASE WHEN substring(md5('rp7_' || j || '_' || i), 1, 1)
                           < '8'
                      THEN  CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
                      ELSE -CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
                 END),
                 (x, y) -> x + y) * 0.25 * 1e6 + 0.5) / 1e6
             ) AS proj
      FROM embeddings WHERE vec_id < 50
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             reduce(list_transform(range(16), t ->
               (a.proj[CAST(t AS INT) + 1] - b.proj[CAST(t AS INT) + 1])
               * (a.proj[CAST(t AS INT) + 1] - b.proj[CAST(t AS INT) + 1])),
               (x, y) -> x + y) AS d2p,
             reduce(list_transform(range(64), t ->
               (CAST(a.embedding[CAST(t AS INT) + 1] AS DOUBLE)
                - CAST(b.embedding[CAST(t AS INT) + 1] AS DOUBLE))
               * (CAST(a.embedding[CAST(t AS INT) + 1] AS DOUBLE)
                  - CAST(b.embedding[CAST(t AS INT) + 1] AS DOUBLE))),
               (x, y) -> x + y) AS d2o
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           floor(d2p / d2o * 1e6 + 0.5) / 1e6 AS d2_ratio
    FROM pairs WHERE d2o > 0
    """,
    doc="E3 JL distance-preservation audit: per-pair squared-distance "
    "ratio projected/original over the first 50 vectors (1,225 pairs) — "
    "the measurable statement of the Johnson-Lindenstrauss contract the "
    "projection is deployed for. EXACT cross-engine oracle (not a "
    "recall gate): both engines build the same md5 sign matrix, fold in "
    "the same pinned order, and quantize identically, so every ratio "
    "matches bit-for-bit. The tiny a.id < b.id pair join is an "
    "intentional 50-row NLJ (documented exact-oracle class); the "
    "aggregate JL bound itself (mean ratio ~ 1 +- O(1/sqrt(out_dim))) "
    "is asserted in tests/test_ext.py, not here, to keep the query "
    "deterministic.",
    tags=("ext",),
)
def q_embedding_rp_distance_preservation(
    spark: SparkSession, sf: str
) -> DataFrame:
    from .ext.projection import random_project_vec

    emb = read_sf_table(spark, sf, "embeddings").filter(F.col("vec_id") < 50)
    pv = random_project_vec(emb, "vec_id", "embedding", out_dim=16, seed=7)
    sides = emb.join(pv, "vec_id")
    a = sides.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__ea"),
        F.col("proj").alias("__pa"),
    )
    b = sides.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__eb"),
        F.col("proj").alias("__pb"),
    )

    def sq_dist(x, y, cast):
        pair = F.zip_with(
            x,
            y,
            (lambda u, v: (u.cast("double") - v.cast("double"))
             * (u.cast("double") - v.cast("double")))
            if cast
            else (lambda u, v: (u - v) * (u - v)),
        )
        return F.aggregate(pair, F.lit(0.0), lambda acc, t: acc + t)

    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("__d2p", sq_dist(F.col("__pa"), F.col("__pb"), False))
        .withColumn("__d2o", sq_dist(F.col("__ea"), F.col("__eb"), True))
        .filter(F.col("__d2o") > 0)
        .select(
            "id_a",
            "id_b",
            (
                F.floor(F.col("__d2p") / F.col("__d2o") * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("d2_ratio"),
        )
    )


def _duck_count_occ(word: str) -> str:
    """DuckDB twin of ext.text._count_occurrences (padded replace-count)."""
    needle = f" {word} "
    return (
        f"CAST((length(' ' || lower(text) || ' ') - "
        f"length(replace(' ' || lower(text) || ' ', '{needle}', ''))) "
        f"/ {len(needle)} AS BIGINT)"
    )


def _duck_lang_scores() -> dict[str, str]:
    from .ext.text import LANG_MARKERS

    return {
        lang: "(" + " + ".join(_duck_count_occ(w) for w in words) + ")"
        for lang, words in LANG_MARKERS.items()
    }


def _duck_lang_case() -> str:
    """Argmax cascade in lang-code order (ties -> earlier code), matching
    ext.text.lang_id exactly."""
    s = _duck_lang_scores()
    langs = sorted(s)
    clauses = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"{s[lang]} >= {s[rest]}" for rest in langs[i + 1:])
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{langs[-1]}' END"


@register(
    "lang_id_pred",
    f"""
    SELECT doc_id, {_duck_lang_case()} AS pred_lang FROM documents
    """,
    doc="E4 language ID: marker-word hit counts per language, argmax with "
    "deterministic ties — pure column arithmetic, single map-only scan.",
    tags=("ext",),
)
def q_lang_id_pred(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.text import lang_id

    docs = read_sf_table(spark, sf, "documents")
    return docs.select("doc_id", lang_id("text").alias("pred_lang"))


@register(
    "text_quality",
    f"""
    WITH feats AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_calc,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             ({" + ".join(_duck_count_occ(w) for w in
                          ("the", "a", "of", "and", "to", "in", "is", "it"))})
               AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars_calc, n_tokens,
           round((n_chars_calc - (n_tokens - 1)) / n_tokens, 4) AS avg_token_len,
           round(n_stop / n_tokens, 4) AS stopword_ratio,
           round(least(n_tokens / 200.0, 1.0) * 0.5
                 + least((n_stop / n_tokens) * 4.0, 1.0) * 0.5, 4)
             AS quality_score
    FROM feats
    """,
    doc="E4 quality scoring: char/token counts, mean token length, stopword "
    "ratio, composite score — one map-only scan, no UDF.",
    tags=("ext", "bench"),
)
def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.text import quality_features

    docs = read_sf_table(spark, sf, "documents")
    return quality_features(docs, "text").select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "avg_token_len",
        "stopword_ratio",
        "quality_score",
    )


@register(
    "token_counts",
    """
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
             AS n_tokens
    FROM documents
    """,
    doc="E4 token counting (whitespace tokenizer).",
    tags=("ext",),
)
def q_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.text import token_count

    docs = read_sf_table(spark, sf, "documents")
    return docs.select("doc_id", token_count("text").alias("n_tokens"))


@register(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest
    FROM documents
    """,
    doc="E5 multimodal metadata: binary payload column + typed metadata "
    "struct (byte length, content digest) — the blob never shuffles.",
    tags=("ext",),
)
def q_multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.multimodal import attach_binary

    docs = read_sf_table(spark, sf, "documents")
    return attach_binary(docs, "text").select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.digest").alias("digest"),
    )


@register(
    "multimodal_features",
    """
    -- REAL decode path: the media blobs are 16-bit PCM WAVs whose samples
    -- quantize the embedding half-up to int16; the decoded features are
    -- restated relationally through that exact quantization. Sum of int16
    -- samples is exact in double precision, and both engines divide the
    -- same operands, so feat_mean is bit-identical.
    SELECT vec_id AS doc_id,
           CAST(44 + 2 * len(embedding) AS BIGINT) AS n_bytes,
           list_sum(list_transform(embedding,
             x -> greatest(least(floor(CAST(x AS DOUBLE) * 32767 + 0.5),
                           32767), -32768)))
             / len(embedding) AS feat_mean,
           CAST(len(embedding) AS INT) AS feat_dim
    FROM embeddings
    """,
    doc="E5 feature extraction over binary media via mapInPandas (Arrow "
    "batches, fixed output schema) — driver-checked row runs the REAL "
    "WAV decoder (ext/audio.py RIFF parse + numpy PCM decode) through "
    "the generic multimodal seam; mode='fake' remains for plumbing "
    "tests of codec formats absent from this environment. Oracle "
    "re-derives the decoded stats from the source floats through the "
    "exact int16 quantization.",
    tags=("ext",),
)
def q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.audio import synthesize_wav
    from .ext.multimodal import extract_features

    emb = read_sf_table(spark, sf, "embeddings")
    media = synthesize_wav(emb).select(
        F.col("vec_id").alias("doc_id"), F.col("wav").alias("media")
    )
    return extract_features(media, "doc_id", "media", mode="wav")


# ---------------------------------------------------------------------------
# Custom composed operators (operators.py) + function-category coverage
# ---------------------------------------------------------------------------


@register(
    "asof_join",
    f"""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '{DUCK_TS_FMT}') AS purchase_ts,
           strftime(s.ts, '{DUCK_TS_FMT}') AS last_signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of join (ABSENT in Spark builtins; composed as union + "
    "last-value window, one shuffle, no join): latest signup at-or-before "
    "each purchase per user.",
    tags=("custom", "bench"),
)
def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import asof_join

    ev = read_sf_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    out = asof_join(purchases, signups, "user_id", "ts", "signup_ts", ["signup_ts"])
    return out.select(
        "event_id",
        "user_id",
        _ts_str(F.col("ts")).alias("purchase_ts"),
        _ts_str(F.col("signup_ts")).alias("last_signup_ts"),
    )


@register(
    "range_join",
    f"""
    SELECT p.event_id AS purchase_id, e.event_id AS incident_id, p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 1 HOUR
    """,
    doc="Range/interval join (ABSENT in Spark as an equi-join; naive theta "
    "join = BroadcastNestedLoop): bucketized to a hash join on "
    "(key, hour-bucket) + exact refine.",
    tags=("custom", "bench"),
)
def q_range_join(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import range_join_bucketed

    ev = read_sf_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    incidents = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("inc_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("inc_end"),
    )
    out = range_join_bucketed(
        purchases, incidents, "user_id", "pts", "inc_start", "inc_end", 3600
    )
    return out.select("purchase_id", "incident_id", "user_id")


@register(
    "salted_agg_stats",
    """
    SELECT event_type,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(user_id) AS BIGINT) AS max_user
    FROM events GROUP BY event_type
    """,
    doc="Skew-safe two-phase aggregation (salted partial + merge) — result "
    "identical to a plain groupBy, verified by the oracle; the plan spreads "
    "each hot key over 16 reducers.",
    tags=("custom",),
)
def q_salted_agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import salted_aggregate

    ev = read_sf_table(spark, sf, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("bigint")
    )
    return salted_aggregate(
        ev,
        ["event_type"],
        {"total_cents": ("sum", "cents"), "n": ("count", "cents"),
         "max_user": ("max", "user_id")},
        salt_buckets=16,
    )


@register(
    "time_rollup_multi",
    """
    SELECT 'hour' AS gran,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day' AS gran,
           strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 2
    """,
    doc="Hypertable-style multi-granularity rollup: one scan, one shuffle "
    "(map-side melt to (gran,bucket) pairs), hour+day levels together.",
    tags=("custom",),
)
def q_time_rollup_multi(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import time_rollup

    ev = read_sf_table(spark, sf, "events")
    out = time_rollup(
        ev, "ts", ["hour", "day"], [],
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    return out.select(
        "gran",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n",
        "total",
    )


@register(
    "cube_order_stats",
    """
    SELECT o_orderstatus, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 + 0.5)
                AS DOUBLE) / 100 AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (o_orderstatus, c_mktsegment)
    """,
    doc="CUBE aggregation (all 4 grouping combinations in one pass).",
    tags=("analytics",),
)
def q_cube_order_stats(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_sf_table(spark, sf, "orders")
    cust = read_sf_table(spark, sf, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .cube("o_orderstatus", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.floor(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100
                    + F.lit("0.5").cast("decimal(2,1)")
                ).cast("double")
                / 100
            ).alias("total"),
        )
    )


@register(
    "intersect_users",
    """
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03'
    INTERSECT
    SELECT user_id FROM events
    WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03'
    """,
    doc="INTERSECT set op: users who both purchased and errored in the "
    "window.",
    tags=("analytics",),
)
def q_intersect_users(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    lim = F.lit("2024-01-03").cast("timestamp")
    a = ev.filter((F.col("event_type") == "purchase") & (F.col("ts") < lim)).select("user_id")
    b = ev.filter((F.col("event_type") == "error") & (F.col("ts") < lim)).select("user_id")
    return a.intersect(b)


@register(
    "string_funcs",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           substring(p_name, 1, 8) AS name_prefix,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowels,
           split_part(p_type, ' ', 1) AS type_first_word,
           CAST(length(p_name) AS BIGINT) AS name_len
    FROM part
    """,
    doc="String-function coverage (SURVEY §2.2): case, substring, pad, "
    "regexp, split_part, length.",
    tags=("functions",),
)
def q_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    part = read_sf_table(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_replace("p_type", "[aeiou]", "").alias("type_novowels"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.length("p_name").cast("bigint").alias("name_len"),
    )


@register(
    "datetime_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_epoch_start
    FROM orders
    """,
    doc="Date/time-function coverage (SURVEY §2.2): extract, interval "
    "arithmetic, last_day, datediff.",
    tags=("functions",),
)
def q_datetime_funcs(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_sf_table(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).cast("bigint").alias("days_since_epoch_start"),
    )


@register(
    "math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
           round(abs(l_extendedprice - l_quantity * 1000), 2) AS abs_diff,
           round(sqrt(l_quantity), 4) AS qty_sqrt,
           round(power(1 + l_tax, 2), 6) AS tax_sq
    FROM lineitem
    """,
    doc="Math-function coverage (SURVEY §2.2): ceil/floor/abs/sqrt/power.",
    tags=("functions",),
)
def q_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 2).alias("abs_diff"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
    )


@register(
    "array_funcs",
    """
    SELECT doc_id,
           CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                AS BIGINT) AS n_unique_tokens,
           array_to_string((regexp_split_to_array(trim(text), '\\s+'))[1:3], ' ')
             AS first3
    FROM documents
    """,
    doc="Array-function coverage (SURVEY §2.2): split, distinct, slice, "
    "join.",
    tags=("functions",),
)
def q_array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
    )


@register(
    "pivot_event_counts",
    """
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    doc="Pivot (SURVEY §2.2 'pivot/unpivot'): per-user event counts wide by "
    "type. Spark-side uses the native pivot() operator with an explicit "
    "value list (no extra distinct-values job).",
    tags=("analytics",),
)
def q_pivot_event_counts(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in types],
    )


@register(
    "unpivot_lineitem_metrics",
    """
    SELECT l_orderkey, l_linenumber, 'qty' AS metric,
           round(l_quantity, 2) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price' AS metric,
           round(l_extendedprice, 2) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount' AS metric,
           round(l_discount, 2) AS val FROM lineitem
    """,
    doc="Unpivot/melt (SURVEY §2.2 'pivot/unpivot'): wide metrics to "
    "(metric, val) rows via the native unpivot operator — map-side only, "
    "no shuffle.",
    tags=("analytics",),
)
def q_unpivot_lineitem_metrics(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 2).alias("qty"),
        F.round("l_extendedprice", 2).alias("price"),
        F.round("l_discount", 2).alias("discount"),
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["qty", "price", "discount"],
        "metric",
        "val",
    )


@register(
    "sliding_window_counts",
    """
    WITH slid AS (
      SELECT to_timestamp(CAST(floor((epoch(ts) - k * 900) / 3600) AS BIGINT) * 3600
                          + k * 900) AS win_start,
             value
      FROM events, UNNEST(range(0, 4)) AS t(k)
      WHERE epoch(ts) >= CAST(floor((epoch(ts) - k * 900) / 3600) AS BIGINT) * 3600 + k * 900
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM slid GROUP BY win_start
    """,
    doc="Sliding event-time window (1h length, 15min slide) via the native "
    "window() function — each event lands in 4 overlapping windows, "
    "exploded map-side.",
    tags=("analytics",),
)
def q_sliding_window_counts(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win"),
            "n",
            "total",
        )
    )


@register(
    "session_window_agg",
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, new_s DESC
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '{fmt}') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess GROUP BY user_id, sid
    """.format(fmt="%Y-%m-%d %H:%M:%S.%f"),
    doc="Native session_window aggregation (30min gap) — Spark's built-in "
    "dynamic-gap session windows; the oracle reconstructs sessions via the "
    "lag/cumsum islands technique.",
    tags=("analytics", "bench"),
)
def q_session_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            _ts_str(F.col("w.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "embedding_neardup_pairs",
    """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6)
             AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
    doc="E2 embedding-cosine near-dup pairs (threshold 0.4 — the synthetic corpus has no true dups; the tail of the cosine distribution exercises the operator). Exact "
    "all-pairs here (the oracle-checkable ground truth); the LSH-bucketed "
    "variant (ext.similarity.lsh_topk machinery) is the 100 TB path.",
    tags=("ext",),
)
def q_embedding_neardup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.similarity import cosine

    emb = read_sf_table(spark, sf, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("__ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("__eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("__cos", cosine(F.col("__ea"), F.col("__eb")))
        .filter(F.col("__cos") >= 0.4)
        .select("vec_a", "vec_b", F.round("__cos", 6).alias("cos_sim"))
    )


@register(
    "dedup_corpus_minhash",
    r"""
    -- keep-min-id policy over the EXACT Jaccard pair set. The engine's
    -- pair source is the deterministic shingle equi-join (r6: was
    -- MinHash-LSH, whose sub-100% recall near the threshold silently
    -- inflated the kept set at sf1), so the surviving corpus is exactly
    -- documents minus the greater id of each exact pair, at any SF.
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    losers AS (
      SELECT DISTINCT doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    )
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM losers)
    """,
    doc="E2 corpus-level near-dup removal: docs surviving the "
    "keep-min-id-per-pair policy over the exact Jaccard pair set "
    "(drop_near_dups method='exact'; the name's MinHash path remains as "
    "method='minhash', its recall measured by minhash_near_dups' gate) — "
    "the 'deduplicated training corpus' output surface. Oracle: the same "
    "policy over the same exact pair set.",
    tags=("ext", "bench2"),
)
def q_dedup_corpus_minhash(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import drop_near_dups

    docs = read_sf_table(spark, sf, "documents")
    out = drop_near_dups(docs, "doc_id", "text")
    return out.select("doc_id", "lang", "source")


@register(
    "dedup_corpus_minhash_prod",
    f"""
    -- PRODUCTION twin of dedup_corpus_minhash (VERDICT r7 item 4): the
    -- pair source is banded MinHash-LSH with the hot-bucket cap, NOT the
    -- exact shingle equi-join — the exact join's work is sum_s C(df_s,2)
    -- and this corpus's shingle df is ~uniform (~888 median at sf10,
    -- measured), so it is ~25G join rows at sf10 while the LSH leg stays
    -- linear. Same portable md5 family as the minhash_near_dups oracle,
    -- so the capped candidate set, exact verification, and keep-min-id
    -- policy all restate relationally at any SF.
    WITH {_MINHASH_CAPPED_CTES},
    losers AS (SELECT DISTINCT doc_b FROM vpairs)
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM losers)
    """,
    doc="E2 corpus dedup, production profile: drop_near_dups(method="
    "'minhash', max_bucket_size=2000, portable md5 family) — banded LSH "
    "candidates (hot buckets dropped whole with Observation accounting), "
    "exact-Jaccard verify on candidates only, keep-min-id policy. The "
    "linear at-scale alternative recorded for the sf10 exclusion of the "
    "exact pair source (policy contract keeps that name exact). Recall "
    "vs the exact pair set is measured by minhash_recall_gate.",
    tags=("ext", "bench2"),
)
def q_dedup_corpus_minhash_prod(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Observation

    from .ext.dedup import drop_near_dups

    docs = read_sf_table(spark, sf, "documents")
    out = drop_near_dups(
        docs,
        "doc_id",
        "text",
        method="minhash",
        hash_fn="md5",
        max_bucket_size=2000,
        observation=Observation("dedup_prod_drops"),
    )
    return out.select("doc_id", "lang", "source")


@register(
    "full_outer_join_daily",
    """
    WITH p AS (
      SELECT date_trunc('day', ts) AS d, round(sum(value), 2) AS purchase_total
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    e AS (
      SELECT date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT strftime(coalesce(p.d, e.d), '%Y-%m-%d') AS day,
           p.purchase_total, e.n_errors
    FROM p FULL OUTER JOIN e ON p.d = e.d
    """,
    doc="FULL OUTER join (SURVEY §2.2 join-type coverage): daily purchase "
    "totals against daily error counts, preserving days present on either "
    "side only.",
    tags=("analytics",),
)
def q_full_outer_join_daily(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.round(F.sum("value"), 2).alias("purchase_total"))
    )
    e = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", "ts").alias("d2"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    return (
        p.join(e, p["d"] == e["d2"], "full_outer")
        .select(
            F.date_format(F.coalesce("d", "d2"), "yyyy-MM-dd").alias("day"),
            "purchase_total",
            "n_errors",
        )
    )


@register(
    "anti_join_users",
    """
    SELECT user_id FROM (SELECT DISTINCT user_id FROM events) u
    WHERE user_id NOT IN (
      SELECT user_id FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03')
    """,
    doc="Left-anti join (O5's pure-new-rows half, SURVEY §2.1): users with "
    "no purchase in the opening window.",
    tags=("analytics",),
)
def q_anti_join_users(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    users = ev.select("user_id").distinct()
    purchasers = ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
    ).select(F.col("user_id").alias("pu"))
    return users.join(purchasers, users.user_id == purchasers.pu, "left_anti")


@register(
    "map_funcs",
    """
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(len(json_keys(props)) AS BIGINT) AS n_props
    FROM events
    """,
    doc="Map-function coverage (SURVEY §2.2 'array/map functions'): JSON "
    "string -> MAP column, key extraction, cardinality.",
    tags=("functions",),
)
def q_map_funcs(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.element_at(m, "k").cast("bigint").alias("k_val"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_props"),
    )


@register(
    "grouped_pandas_normalize",
    """
    SELECT event_id,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4)
             AS value_z
    FROM events
    """,
    doc="Grouped-map Pandas UDF surface (applyInPandas, Arrow-batched): "
    "per-group z-score normalization; the oracle is the equivalent window "
    "SQL — demonstrating the UDF escape hatch produces engine-identical "
    "results.",
    tags=("ext",),
)
def q_grouped_pandas_normalize(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    ev = read_sf_table(spark, sf, "events").select("event_id", "event_type", "value")

    def normalize(pdf: "pd.DataFrame") -> "pd.DataFrame":
        std = pdf["value"].std(ddof=1)
        z = (pdf["value"] - pdf["value"].mean()) / std
        return pd.DataFrame({"event_id": pdf["event_id"], "value_z": z.round(4)})

    return ev.groupBy("event_type").applyInPandas(
        normalize, "event_id bigint, value_z double"
    )


@register(
    "neardup_groups",
    r"""
    -- sh/pairs/edges MATERIALIZED: edges references pairs twice and the
    -- recursion scans edges every iteration — inlined, DuckDB re-ran
    -- the O(shingle-join) pair computation per reference and blew the
    -- 4 GB spill cap at sf1 (sweep finding); materialized, the
    -- recursion runs over the tiny edge set
    WITH RECURSIVE toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2) i
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc, CAST(least(u, min(v)) AS BIGINT) AS group_rep
    FROM reach GROUP BY u
    """,
    doc="Iterative connected components (min-label propagation, lineage cut "
    "per iteration) over exact near-dup pairs: the transitive-closure "
    "grouping corpus dedup needs; oracle = recursive CTE.",
    tags=("ext",),
)
def q_neardup_groups(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import jaccard_pairs
    from .ext.graph import near_dup_groups

    docs = read_sf_table(spark, sf, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", 3, 0.5)
    return near_dup_groups(pairs)


@register(
    "lsh_topk_recall",
    f"""
    -- fully relational recall@5: both the exact brute-force top-k and
    -- the LSH top-k restate in SQL (portable md5 plane family), so the
    -- measured recall is oracle-computable at ANY scale factor
    WITH {_LSH_TOPK_CTES},
    exact_ranked AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 round(list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]),
                   CAST(q.embedding AS DOUBLE[])), 6) DESC, c.vec_id)
                 AS rnk
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
      WHERE rnk <= 5
    ),
    approx AS (
      SELECT query_id, neighbor_id FROM lsh_ranked WHERE rnk <= 5
    )
    SELECT round(CAST(count(a.neighbor_id) AS DOUBLE)
                 / count(*), 4) AS recall_at_5,
           CAST(count(*) AS BIGINT) AS n_truth_pairs
    FROM exact_ranked e
    LEFT JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    """,
    doc="E3 quality metric: recall@5 of the hyperplane-LSH ANN against the "
    "exact brute-force top-k for the query batch — the number a deployment "
    "watches when trading n_planes/n_probe for speed. Oracle: the full "
    "relational restatement of both sides (portable md5 planes), valid "
    "at any SF.",
    tags=("ext",),
)
def q_lsh_topk_recall(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.similarity import lsh_topk, topk_brute_force

    emb = read_sf_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = topk_brute_force(emb, queries, "vec_id", "embedding", k=5).select(
        "query_id", "neighbor_id"
    )
    approx = lsh_topk(
        emb, queries, "vec_id", "embedding",
        k=5, dim=64, n_planes=4, n_probe=4, probe="margin",
        plane_fn="md5",
    ).select(
        F.col("query_id").alias("q2"), F.col("neighbor_id").alias("n2")
    )
    hit = exact.join(
        approx,
        (exact.query_id == approx.q2) & (exact.neighbor_id == approx.n2),
        "left",
    )
    return hit.agg(
        F.round(
            F.count("n2") / F.count(F.lit(1)), 4
        ).alias("recall_at_5"),
        F.count(F.lit(1)).cast("bigint").alias("n_truth_pairs"),
    )


@register(
    "embedding_topk_heap",
    """
    -- same oracle as embedding_topk: the heap path is an EXACT algorithm,
    -- and rounding scores to 6 decimals absorbs the last-ulp difference
    -- between BLAS and sequential summation order.
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), qe), 6)
               AS score
      FROM embeddings c, q WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, score, rnk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """,
    doc="E3 scale-path exact top-k: per-partition numpy matmul + local "
    "top-k via mapInPandas, final reduce over partitions*queries*k rows — "
    "the shuffle no longer carries every scored row. Oracle: the exact "
    "brute-force top-k (heap path is exact, so outputs are identical).",
    tags=("ext", "bench"),
)
def q_embedding_topk_heap(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.similarity import topk_partition_heap

    emb = read_sf_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return topk_partition_heap(emb, queries, "vec_id", "embedding", k=5)


@register(
    "embedding_ivf_topk",
    """
    -- IVF centroids come from distributed float k-means, whose summation
    -- order is not bit-deterministic across runs — the exact neighbor set
    -- can wobble at cluster boundaries, so the decidable cross-engine claim
    -- is the recall floor (observed 0.54 probing 4/16 cells; pinned with
    -- margin) plus the relational result-shape invariant.
    SELECT CAST(5 * (SELECT count(*) FROM embeddings WHERE vec_id < 10)
                AS BIGINT) AS n_truth_pairs,
           true AS recall_ok
    """,
    doc="E3 IVF ANN: deterministic spherical k-means cells (map-side "
    "assignment, one groupBy per Lloyd iteration), queries probe the "
    "n_probe nearest cells — candidate volume ~ corpus/n_centroids*n_probe. "
    "Stated decidably: recall@5 vs brute force >= 0.35 (floats forbid "
    "pinning the pair set).",
    tags=("ext",),
)
def q_embedding_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.ivf import ivf_topk
    from .ext.similarity import topk_brute_force

    emb = read_sf_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = topk_brute_force(emb, queries, "vec_id", "embedding", k=5).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk(
        emb, queries, "vec_id", "embedding", k=5, n_centroids=16, n_probe=4
    ).select(F.col("query_id").alias("q2"), F.col("neighbor_id").alias("n2"))
    hit = exact.join(
        approx,
        (exact.query_id == approx.q2) & (exact.neighbor_id == approx.n2),
        "left",
    )
    return hit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth_pairs"),
        (F.count("n2") / F.count(F.lit(1)) >= 0.35).alias("recall_ok"),
    )


@register(
    "exists_subquery",
    """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_big_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    GROUP BY o_orderstatus
    """,
    doc="Correlated EXISTS subquery via the spark.sql() surface (decorrelated "
    "by Catalyst into a left-semi join).",
    tags=("analytics",),
)
def q_exists_subquery(spark: SparkSession, sf: str) -> DataFrame:
    from .sources import register_sf_views

    register_sf_views(spark, sf, ["orders", "lineitem"])
    return spark.sql(
        """
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_big_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        GROUP BY o_orderstatus
        """
    )


@register(
    "scalar_subquery",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rich
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c_mktsegment
    """,
    doc="Scalar subquery via spark.sql(): customers above the global mean "
    "balance (the subquery runs once; no per-row recompute).",
    tags=("analytics",),
)
def q_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    from .sources import register_sf_views

    register_sf_views(spark, sf, ["customer"])
    return spark.sql(
        """
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rich
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        GROUP BY c_mktsegment
        """
    )


@register(
    "string_agg_top_names",
    """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           array_to_string((array_agg(c_name ORDER BY c_name))[1:3], ',')
             AS first3_names
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Ordered string aggregation (targetBody array-join generalized, "
    "O10): deterministic because the list is sorted before joining.",
    tags=("analytics",),
)
def q_string_agg_top_names(spark: SparkSession, sf: str) -> DataFrame:
    nation = read_sf_table(spark, sf, "nation")
    cust = read_sf_table(spark, sf, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.array_join(
                F.slice(F.array_sort(F.collect_list("c_name")), 1, 3), ","
            ).alias("first3_names"),
        )
    )


@register(
    "window_lag_lead_running",
    f"""
    SELECT user_id, event_id,
           strftime(ts, '{DUCK_TS_FMT}') AS ts_str,
           CAST(lag(event_id) OVER w AS BIGINT) AS prev_event,
           CAST(lead(event_id) OVER w AS BIGINT) AS next_event,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2)
             AS running_value,
           CAST(row_number() OVER w AS BIGINT) AS seq
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Window-function breadth (SURVEY §2.2 'window functions ABSENT in "
    "reference'): lag/lead/running sum/row_number in one frame.",
    tags=("analytics",),
)
def q_window_lag_lead_running(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        _ts_str(F.col("ts")).alias("ts_str"),
        F.lag("event_id").over(w).cast("bigint").alias("prev_event"),
        F.lead("event_id").over(w).cast("bigint").alias("next_event"),
        F.round(F.sum("value").over(wsum), 2).alias("running_value"),
        F.row_number().over(w).cast("bigint").alias("seq"),
    )


@register(
    "conditional_agg",
    """
    -- double sums go through DECIMAL(38,10): decimal addition is exact
    -- and ORDER-INDEPENDENT, so distributed partial-agg order can't move
    -- the last ulp across a rounding boundary, and the final quantization
    -- is a DECIMAL cast (HALF_UP in both engines — an sf0.1 group landed
    -- on an exact 129.10875 avg tie, where round()-on-double diverges:
    -- Spark rounds the shortest decimal repr, DuckDB the binary value)
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS n_purchases,
           CAST(CAST(coalesce(sum(CAST(value AS DECIMAL(38,10)))
                       FILTER (WHERE event_type = 'purchase'), 0)
                     AS DECIMAL(38,2)) AS DOUBLE) AS purchase_value,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
             AS n_errors,
           CAST(CAST(sum(CASE WHEN value > 100
                              THEN CAST(value AS DECIMAL(38,10)) END)
                     / count(CASE WHEN value > 100 THEN value END)
                     AS DECIMAL(38,4)) AS DOUBLE) AS avg_big_value
    FROM events GROUP BY user_id
    """,
    doc="Conditional aggregation (FILTER clauses / count_if): one scan, "
    "several predicated aggregates. Money-ish sums ride DECIMAL partials "
    "(exact, order-independent — reproducible across partitionings), "
    "divided/rounded in double at the end.",
    tags=("analytics",),
)
def q_conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    is_p = F.col("event_type") == "purchase"
    dec = F.col("value").cast("decimal(38,10)")
    big = F.col("value") > 100
    return ev.groupBy("user_id").agg(
        F.count(F.when(is_p, 1)).alias("n_purchases"),
        F.coalesce(F.sum(F.when(is_p, dec)), F.lit(0).cast("decimal(38,10)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("purchase_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        (
            F.sum(F.when(big, dec))
            / F.count(F.when(big, F.col("value")))
        )
        .cast("decimal(38,4)")
        .cast("double")
        .alias("avg_big_value"),
    )


@register(
    "null_semantics",
    """
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS status_or_null,
           coalesce(nullif(o_orderpriority, ''), 'UNKNOWN') AS prio_norm,
           CAST(o_orderstatus IS DISTINCT FROM 'F' AS VARCHAR) AS not_f
    FROM orders
    """,
    doc="NULL-semantics functions: NULLIF / COALESCE / IS DISTINCT FROM "
    "(null-safe equality, the <=> operator).",
    tags=("functions",),
)
def q_null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_sf_table(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("")), F.lit("UNKNOWN")
        ).alias("prio_norm"),
        (~F.col("o_orderstatus").eqNullSafe("F")).cast("string").alias("not_f"),
    )


@register(
    "ntile_value_buckets",
    """
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           round(min(value), 2) AS lo, round(max(value), 2) AS hi
    FROM (SELECT value,
                 CAST(ntile(10) OVER (ORDER BY value, event_id) AS BIGINT)
                   AS bucket
          FROM events)
    GROUP BY bucket
    """,
    doc="ntile decile bucketing + per-bucket range — the sort-based "
    "histogram shape.",
    tags=("analytics",),
)
def q_ntile_value_buckets(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    w = Window.orderBy("value", "event_id")
    return (
        ev.select(
            "value", F.ntile(10).over(w).cast("bigint").alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@register(
    "date_spine_gap_fill",
    """
    WITH spine AS (
      SELECT s AS day
      FROM generate_series(TIMESTAMP '2024-01-01',
                           TIMESTAMP '2024-01-30', INTERVAL 1 DAY) AS t(s)
    ),
    daily AS (
      SELECT date_trunc('day', ts) AS day, round(sum(value), 2) AS total
      FROM events WHERE event_type = 'signup' GROUP BY 1
    )
    SELECT strftime(spine.day, '%Y-%m-%d') AS day,
           daily.total,
           CAST(daily.total IS NULL AS VARCHAR) AS was_gap
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    """,
    doc="Date-spine gap detection: a generated series (sequence + explode) "
    "left-joined to daily aggregates exposes missing days — the gap-filling "
    "skeleton every reporting pipeline needs.",
    tags=("analytics",),
)
def q_date_spine_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-30").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(F.date_trunc("day", "ts").alias("d2"))
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    return spine.join(daily, spine.day == daily.d2, "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "total",
        F.col("total").isNull().cast("string").alias("was_gap"),
    )


@register(
    "regexp_extract_funcs",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CAST(regexp_matches(p_type, 'BRUSHED|POLISHED') AS VARCHAR)
             AS is_finished,
           CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT)
             AS consonant_len
    FROM part
    """,
    doc="Regexp-function coverage: extract with group, boolean match, "
    "global replace.",
    tags=("functions",),
)
def q_regexp_extract_funcs(spark: SparkSession, sf: str) -> DataFrame:
    part = read_sf_table(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.col("p_type").rlike("BRUSHED|POLISHED").cast("string").alias("is_finished"),
        F.length(F.regexp_replace("p_name", "[aeiou]", "")).cast("bigint").alias(
            "consonant_len"
        ),
    )


_DUCK_HASH_UNIT = (
    "(CAST(('0x' || substring(md5(CAST({id} AS VARCHAR)), 1, 8)) AS BIGINT)"
    " / 4294967296.0)"
)


@register(
    "train_val_test_split",
    f"""
    SELECT split, lang, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT lang,
             CASE WHEN {_DUCK_HASH_UNIT.format(id='doc_id')} < 0.1 THEN 'test'
                  WHEN {_DUCK_HASH_UNIT.format(id='doc_id')} < 0.2 THEN 'val'
                  ELSE 'train' END AS split
      FROM documents)
    GROUP BY split, lang
    """,
    doc="Deterministic train/val/test split from the id hash: membership "
    "is a pure row function — stable across runs, retries, partitioning, "
    "and corpus growth (ext/sampling.py).",
    tags=("ext",),
)
def q_train_val_test_split(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.sampling import train_val_test_split

    docs = read_sf_table(spark, sf, "documents")
    return (
        train_val_test_split(docs, "doc_id", val_fraction=0.1, test_fraction=0.1)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "stratified_sample",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents)
    WHERE rn <= 20
    """,
    doc="Deterministic stratified sampling: md5 order is a reproducible "
    "shuffle, so 'first 20 per language' is the same set on every run.",
    tags=("ext",),
)
def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.sampling import stratified_take

    docs = read_sf_table(spark, sf, "documents")
    return stratified_take(docs, "lang", "doc_id", 20).select("doc_id", "lang")


@register(
    "stats_aggregates",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(stddev_samp(l_extendedprice), 2) AS std_price,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Statistical aggregates (corr/covar/stddev/variance) — single-scan "
    "partial+final hash aggregation; SURVEY §2.2 aggregation breadth.",
    tags=("analytics",),
)
def q_stats_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@register(
    "explode_word_counts",
    """
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    HAVING count(*) >= 50
    """,
    doc="explode / LATERAL VIEW (UNNEST): tokenize documents and count "
    "words — the generator runs inside codegen; no Python in the loop.",
    tags=("ext",),
)
def q_explode_word_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
    )


@register(
    "window_first_last_nth",
    f"""
    SELECT user_id, event_id,
           CAST(first_value(event_id) OVER w AS BIGINT) AS first_event,
           CAST(last_value(event_id) OVER w AS BIGINT) AS last_event,
           CAST(nth_value(event_id, 2) OVER w AS BIGINT) AS second_event
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first_value/last_value/nth_value over an unbounded frame — "
    "per-user session anchors in one windowed scan.",
    tags=("analytics",),
)
def q_window_first_last_nth(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_id").over(w).cast("bigint").alias("first_event"),
        F.last("event_id").over(w).cast("bigint").alias("last_event"),
        F.nth_value("event_id", 2).over(w).cast("bigint").alias("second_event"),
    )


@register(
    "percent_rank_cume_dist",
    """
    SELECT event_id, event_type,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM events
    WHERE user_id < 5 AND value IS NOT NULL
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    doc="Rank-family windows (percent_rank/cume_dist): relative position "
    "of each event's value within its type.",
    tags=("analytics",),
)
def q_percent_rank_cume_dist(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        (F.col("user_id") < 5) & F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "least_greatest_bitwise",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(least(l_quantity, l_linenumber * 10) AS DOUBLE) AS lo,
           CAST(greatest(l_quantity, l_linenumber * 10) AS DOUBLE) AS hi,
           CAST(l_orderkey & 255 AS BIGINT) AS key_band,
           CAST(xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS BIGINT)
             AS key_xor,
           CAST(l_orderkey << 1 AS BIGINT) AS key_shl
    FROM lineitem
    WHERE l_orderkey < 200
    """,
    doc="least/greatest + bitwise and/xor/shift — scalar-function breadth "
    "(SURVEY §2.2 math functions), all whole-stage-codegen.",
    tags=("analytics",),
)
def q_least_greatest_bitwise(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.col("l_quantity"), F.col("l_linenumber") * 10)
        .cast("double")
        .alias("lo"),
        F.greatest(F.col("l_quantity"), F.col("l_linenumber") * 10)
        .cast("double")
        .alias("hi"),
        (F.col("l_orderkey").bitwiseAND(F.lit(255))).cast("bigint").alias("key_band"),
        (F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("bigint")))
        .cast("bigint")
        .alias("key_xor"),
        F.shiftleft(F.col("l_orderkey"), 1).cast("bigint").alias("key_shl"),
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS BIGINT)
             AS gid,
           CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(12,4))
                             - CAST(l_discount AS DECIMAL(12,4))))
                      * 100 + 0.5) AS DOUBLE) / 100 AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Explicit GROUPING SETS with grouping() disambiguation — completes "
    "the rollup/cube family (SURVEY §2.2 'grouping sets ABSENT').",
    tags=("analytics",),
)
def q_grouping_sets_revenue(spark: SparkSession, sf: str) -> DataFrame:
    from .sources import register_sf_views

    register_sf_views(spark, sf, ["lineitem"])
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS rflag,
               coalesce(l_linestatus, 'ALL') AS lstatus,
               CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS BIGINT)
                 AS gid,
               CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(12,4))
                             - CAST(l_discount AS DECIMAL(12,4))))
                      * 100 + 0.5) AS DOUBLE) / 100 AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


_CHUNK_ORACLE = """
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents{where})
    SELECT doc_id, CAST(g.i AS BIGINT) AS chunk_id,
           array_to_string(words[g.i*80+1 : g.i*80+100], ' ') AS chunk,
           CAST(least(100, len(words) - g.i*80) AS BIGINT) AS n_words
    FROM w, UNNEST(generate_series(0, CAST(ceil(len(words)/80.0) AS INT)-1))
              AS g(i)
    WHERE len(words) > 0
"""


@register(
    "chunk_documents_udtf",
    _CHUNK_ORACLE.format(where=" WHERE doc_id < 200"),
    doc="LLM-training chunking via a registered Python UDTF (LATERAL "
    "row→rows) — the engine's pluggable-UDTF seam, the generalized form of "
    "the reference's runtime template registry (templates.js:15-34).",
    tags=("ext",),
)
def q_chunk_documents_udtf(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.chunking import chunk_documents

    docs = read_sf_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return chunk_documents(docs, "doc_id", "text", size=100, stride=80)


@register(
    "chunk_documents_builtin",
    _CHUNK_ORACLE.format(where=""),
    doc="Same chunking in pure built-ins (sequence/explode/slice): "
    "whole-stage codegen, no Python workers — the 100 TB path.",
    tags=("ext", "bench"),
)
def q_chunk_documents_builtin(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.chunking import chunk_documents_builtin

    docs = read_sf_table(spark, sf, "documents")
    return chunk_documents_builtin(docs, "doc_id", "text", size=100, stride=80)


@register(
    "variant_shred",
    """
    SELECT event_id,
           event_type AS etype,
           user_id AS uid,
           event_id AS nested_eid,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(NULL AS VARCHAR) AS missing_path
    FROM events
    """,
    doc="Spark 4 VARIANT for schemaless entities (SURVEY §1.3: the "
    "reference's ragged JSON rows): parse_json → variant_get typed paths, "
    "incl. a nested path and a missing path (NULL, not error). The oracle "
    "states the expected values relationally — a faithful round-trip "
    "re-derives each field.",
    tags=("ext", "bench"),
)
def q_variant_shred(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    j = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.col("user_id").alias("u"),
            F.struct(F.col("event_id").alias("eid")).alias("n"),
        )
    )
    v = F.parse_json(j)
    pv = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.t", "string").alias("etype"),
        F.variant_get(v, "$.u", "bigint").alias("uid"),
        F.variant_get(v, "$.n.eid", "bigint").alias("nested_eid"),
        F.variant_get(pv, "$.k", "bigint").alias("k_val"),
        F.variant_get(pv, "$.missing", "string").alias("missing_path"),
    )


@register(
    "rest_source_scan",
    """
    SELECT event_id, user_id, event_type,
           CAST(epoch_ms(ts) AS BIGINT) AS updatedOnMs
    FROM events
    WHERE CAST(epoch_ms(ts) AS BIGINT) > 1705708800000
    """,
    doc="O1/O3 through the rest_entities Python DataSource: the events "
    "table staged as paginated REST page files, read back with the "
    "updatedFromMs predicate ABSORBED by pushFilters (evaluated "
    "source-side, app.js:76-82 parity) — pages scan executor-parallel.",
    tags=("ext",),
)
def q_rest_source_scan(spark: SparkSession, sf: str) -> DataFrame:
    import os as _os

    from .rest_datasource import RestEntitiesDataSource

    try:
        spark.dataSource.register(RestEntitiesDataSource)
    except Exception:
        pass  # already registered in this session
    # runtime conf: the harness session may not have session.py's default
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")

    # stage the events table as REST page files (deterministic: 8 pages
    # split by event_id; rewritten only when absent)
    # key the staging dir by source-file mtime too: the driver regenerates
    # testdata between rounds without clearing /tmp, and stale staged pages
    # would silently diverge from the fresh oracle data
    tag = _os.path.basename(sf.rstrip("/"))
    src_file = _os.path.join(sf, "events.parquet")
    try:
        ver = int(_os.path.getmtime(src_file))
    except OSError:
        ver = 0
    pages_dir = f"/tmp/spark_graft_rest_pages_{tag}_{ver}"
    done = _os.path.join(pages_dir, "_STAGED")
    if not _os.path.exists(done):
        # stage WITHOUT materializing the table on the driver (r2 verdict
        # item 1): rows serialize to item JSON in the scan, repartition by
        # page id so each of the 8 tasks holds whole pages, and every task
        # writes its own page envelope — executor-side file writes (the
        # same pattern as any file sink; on a cluster pages_dir would be a
        # shared filesystem), zero rows through the driver at any SF
        _os.makedirs(pages_dir, exist_ok=True)
        n_pages = 8
        items = read_sf_table(spark, sf, "events").select(
            (F.col("event_id") % n_pages).cast("int").alias("__page"),
            F.col("event_id").alias("__order"),
            F.to_json(
                F.struct(
                    "event_id",
                    "user_id",
                    "event_type",
                    tsutil.epoch_millis("ts").alias("updatedOnMs"),
                )
            ).alias("__item"),
        )

        def _write_pages(it):
            from collections import defaultdict

            buf = defaultdict(list)
            for row in it:
                buf[row["__page"]].append((row["__order"], row["__item"]))
            for pg, page_rows in buf.items():
                page_rows.sort()  # deterministic item order within a page
                partial = "true" if pg < n_pages - 1 else "false"
                tmp = _os.path.join(pages_dir, f".page{pg}.tmp")
                with open(tmp, "w", encoding="utf-8") as fh:
                    fh.write(
                        '{"items": ['
                        + ",".join(s for _, s in page_rows)
                        + '], "partialResults": '
                        + partial
                        + "}"
                    )
                _os.replace(tmp, _os.path.join(pages_dir, f"page{pg}.json"))

        items.repartition(n_pages, "__page").foreachPartition(_write_pages)
        # an empty residue class writes no file from the executors; fill
        # the gaps with empty envelopes so the page SET always honors the
        # pagination contract — in particular the final page must exist
        # to carry partialResults:false (a do..while(partialResults)
        # consumer would otherwise never see the terminator). Envelope
        # metadata only — still zero data rows through the driver.
        for pg in range(n_pages):
            page_path = _os.path.join(pages_dir, f"page{pg}.json")
            if not _os.path.exists(page_path):
                partial = "true" if pg < n_pages - 1 else "false"
                with open(page_path, "w", encoding="utf-8") as fh:
                    fh.write(
                        '{"items": [], "partialResults": ' + partial + "}"
                    )
        open(done, "w").close()

    df = (
        spark.read.format("rest_entities")
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, updatedOnMs BIGINT")
        .option("path", pages_dir)
        .load()
    )
    return df.filter(F.col("updatedOnMs") > 1705708800000)


@register(
    "hbs_render",
    """
    SELECT doc_id,
           replace(replace(replace(replace(replace(replace(replace(
             source || '&<"src">', '&', '&amp;'), '<', '&lt;'),
             '>', '&gt;'), '"', '&quot;'), chr(39), '&#x27;'), '`', '&#x60;'),
             '=', '&#x3D;')
           || ' / ' ||
           CASE WHEN nullif(lang, 'en') IS NOT NULL
                THEN lang ELSE 'fallback-' || doc_id END AS rendered
    FROM documents
    """,
    doc="O6-O9 via the Handlebars-dialect compiler (hbs.py): mustache "
    "HTML-escaping ({{x}}), raw triple-stache ({{{x}}}), and the #with/else "
    "fallback block, compiled to built-in Column expressions (reference "
    "templates.js:15-40, templates/awsElb.hbs). Oracle: the escape table "
    "and truthiness restated as SQL replace/CASE chains.",
    tags=("reference",),
)
def q_hbs_render(spark: SparkSession, sf: str) -> DataFrame:
    from .hbs import render_hbs

    docs = (
        read_sf_table(spark, sf, "documents")
        .withColumn("seg", F.concat(F.col("source"), F.lit('&<"src">')))
        .withColumn("maybe_lang", F.expr("nullif(lang, 'en')"))
        .withColumn("fb", F.concat(F.lit("fallback-"), F.col("doc_id")))
    )
    tpl = (
        "{{entity.seg}} / "
        "{{#with entity.maybe_lang}}{{{.}}}{{else}}{{{entity.fb}}}{{/with}}"
    )
    return render_hbs(docs, tpl).select("doc_id", "rendered")


# ---------------------------------------------------------------------------
# Round 2: training-data pipeline surface (PII, quality, packing,
# contamination) + engine-surface breadth (recursive CTE, posexplode,
# catalog, orchestration-as-query)
# ---------------------------------------------------------------------------


@register(
    "pii_redact",
    r"""
    WITH staged AS (
      SELECT doc_id,
             text || ' Contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com ip=10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || ' ssn=123-45-6789 tel=+1-555-867-5309' AS txt
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
             AS n_email,
           CAST(len(regexp_extract_all(txt, '\b\d{3}-\d{2}-\d{4}\b')) AS INT)
             AS n_ssn,
           CAST(len(regexp_extract_all(txt,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
           CAST(len(regexp_extract_all(txt,
             '\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}')) AS INT) AS n_phone,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(txt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
             '\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}', '[PHONE]', 'g')
             AS redacted
    FROM staged
    """,
    doc="Training-data hygiene: PII detection counts + masking over "
    "document text (emails, SSNs, IPv4, phone numbers), pure "
    "regexp_count/regexp_replace column expressions — map-only, no "
    "shuffle, the single-scan 100 TB shape (ext/pii.py). Deterministic "
    "PII is injected per doc so the operator is exercised on every row.",
    tags=("ext",),
)
def q_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.pii import pii_counts, redact_pii

    docs = read_sf_table(spark, sf, "documents")
    staged = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip=10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(" ssn=123-45-6789 tel=+1-555-867-5309"),
        ).alias("txt"),
    )
    return staged.select(
        "doc_id", *pii_counts("txt"), redact_pii("txt").alias("redacted")
    )


@register(
    "repetition_quality",
    r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, w FROM t),
    uni AS (SELECT doc_id, n_tokens, unnest(w) AS g FROM base),
    uc AS (SELECT doc_id, n_tokens, g, count(*) AS c FROM uni GROUP BY 1, 2, 3),
    ustats AS (
      SELECT doc_id, n_tokens, count(*) AS n_distinct, max(c) AS top1
      FROM uc GROUP BY 1, 2
    ),
    bi AS (
      SELECT doc_id,
             unnest(w[1:len(w)-1]) || ' ' || unnest(w[2:len(w)]) AS g
      FROM base WHERE len(w) >= 2
    ),
    bc AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
    bstats AS (SELECT doc_id, max(c) AS top2 FROM bc GROUP BY 1)
    SELECT u.doc_id, u.n_tokens,
           round(n_distinct / CAST(n_tokens AS DOUBLE), 6)
             AS distinct_token_frac,
           round(top1 / CAST(n_tokens AS DOUBLE), 6) AS top_token_frac,
           round(coalesce(top2, 0)
                 / CAST(greatest(n_tokens - 1, 1) AS DOUBLE), 6)
             AS top_bigram_frac
    FROM ustats u LEFT JOIN bstats b USING (doc_id)
    """,
    doc="Gopher-style repetition quality signals per document: distinct-"
    "token fraction, top-token fraction, top-bigram fraction — the "
    "standard low-quality filter for pre-training corpora "
    "(ext/text.py repetition_metrics). Shuffle carries only "
    "(doc, gram, count) rows, map-side combined.",
    tags=("ext",),
)
def q_repetition_quality(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.text import repetition_metrics

    docs = read_sf_table(spark, sf, "documents")
    return repetition_metrics(docs, "doc_id", "text")


@register(
    "pack_sequences",
    r"""
    WITH t AS (
      SELECT source AS shard, doc_id AS doc_key,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
      FROM documents
    ),
    o AS (
      SELECT shard, doc_key, n,
             CAST(coalesce(sum(n) OVER (
               PARTITION BY shard ORDER BY doc_key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS off
      FROM t
    ),
    ex AS (
      SELECT shard, doc_key, off, n,
             unnest(range(off // 1024,
                          (off + greatest(n, 1) - 1) // 1024 + 1)) AS seq_id
      FROM o
    )
    SELECT shard, doc_key, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(least((seq_id + 1) * 1024, off + n)
                - greatest(seq_id * 1024, off) AS BIGINT) AS span_tokens
    FROM ex
    """,
    doc="GPT-style concat-and-chunk sequence packing: documents laid "
    "end-to-end per shard (source column) and sliced into 1024-token "
    "training sequences; docs straddling a boundary split across both "
    "(ext/packing.py). Pure window arithmetic + one explode; packing is "
    "per-shard so the running sum never serializes globally.",
    tags=("ext",),
)
def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.packing import pack_sequences
    from .ext.text import token_count

    docs = read_sf_table(spark, sf, "documents").select(
        "source", "doc_id", token_count("text").alias("n_tokens")
    )
    return pack_sequences(
        docs, "n_tokens", capacity=1024, shard_col="source", order_col="doc_id"
    )


@register(
    "contamination_check",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)
    ),
    bench AS (SELECT doc_id, s FROM sh WHERE doc_id < 20),
    corp AS (SELECT doc_id, s FROM sh WHERE doc_id >= 20)
    SELECT corp.doc_id,
           CAST(count(*) AS BIGINT) AS n_shared_shingles,
           CAST(count(DISTINCT bench.doc_id) AS BIGINT) AS n_bench_docs
    FROM corp JOIN bench ON corp.s = bench.s
    GROUP BY corp.doc_id
    """,
    doc="Benchmark-contamination check: 5-gram shingle overlap between the "
    "corpus and a held-out benchmark set (docs 0-19) — the standard "
    "eval-leakage scan before training. One equi-join keyed by shingle; "
    "cost scales with shared shingles, not |corpus|x|bench|.",
    tags=("ext",),
)
def q_contamination_check(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import shingles

    docs = read_sf_table(spark, sf, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles("text", 5)).alias("s")
    )
    bench = sh.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bench_id"), "s"
    )
    corp = sh.filter(F.col("doc_id") >= 20)
    return (
        corp.join(bench, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


@register(
    "fuzzy_verify_levenshtein",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(substring(ta.text, 1, 100),
                            substring(tb.text, 1, 100)) AS INT) AS edit_dist
    FROM pairs
    JOIN documents ta ON ta.doc_id = doc_a
    JOIN documents tb ON tb.doc_id = doc_b
    """,
    doc="Edit-distance refinement of near-dup candidates: levenshtein over "
    "100-char prefixes of each candidate pair — the cheap second-stage "
    "verifier (built-in levenshtein, cost scales with candidates, never "
    "|corpus|^2).",
    tags=("ext",),
)
def q_fuzzy_verify_levenshtein(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import jaccard_pairs

    docs = read_sf_table(spark, sf, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    ta = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, 100).alias("__pa"),
    )
    tb = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, 100).alias("__pb"),
    )
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("__pa", "__pb").alias("edit_dist"),
        )
    )


@register(
    "posexplode_tokens",
    r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE doc_id < 5
    )
    SELECT doc_id,
           CAST(unnest(range(1, len(w) + 1)) - 1 AS INT) AS pos,
           unnest(w) AS token
    FROM t
    """,
    doc="Position-aware explode (posexplode / LATERAL VIEW surface): "
    "token stream with 0-based positions per document.",
    tags=("functions",),
)
def q_posexplode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents").filter(F.col("doc_id") < 5)
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos", "token"
        ),
    )


@register(
    "recursive_weekly_spine",
    """
    WITH RECURSIVE spine(d) AS (
      SELECT CAST('2024-01-01' AS DATE)
      UNION ALL
      SELECT CAST(d + INTERVAL 7 DAY AS DATE) FROM spine
      WHERE d < CAST('2024-01-29' AS DATE)
    )
    SELECT s.d AS week_start, CAST(count(e.event_id) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN events e
      ON CAST(e.ts AS DATE) >= s.d
     AND CAST(e.ts AS DATE) < s.d + INTERVAL 7 DAY
    GROUP BY s.d
    """,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): weekly date spine "
    "generated by recursion + range-joined event counts — the "
    "gap-preserving rollup pattern without a pre-materialized calendar "
    "table.",
    tags=("analytics",),
)
def q_recursive_weekly_spine(spark: SparkSession, sf: str) -> DataFrame:
    read_sf_table(spark, sf, "events").createOrReplaceTempView(
        "__events_spine_v"
    )
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
          SELECT CAST('2024-01-01' AS DATE)
          UNION ALL
          SELECT CAST(d + INTERVAL 7 DAY AS DATE) FROM spine
          WHERE d < CAST('2024-01-29' AS DATE)
        )
        SELECT s.d AS week_start, CAST(count(e.event_id) AS BIGINT) AS n_events
        FROM spine s LEFT JOIN __events_spine_v e
          ON CAST(e.ts AS DATE) >= s.d
         AND CAST(e.ts AS DATE) < s.d + INTERVAL 7 DAY
        GROUP BY s.d
        """
    )


@register(
    "catalog_discovery",
    """
    SELECT 'region' AS table_name, CAST(count(*) AS BIGINT) AS n_rows, 2 AS n_cols FROM region
    UNION ALL SELECT 'nation', count(*), 3 FROM nation
    UNION ALL SELECT 'customer', count(*), 5 FROM customer
    UNION ALL SELECT 'supplier', count(*), 4 FROM supplier
    UNION ALL SELECT 'part', count(*), 6 FROM part
    UNION ALL SELECT 'orders', count(*), 6 FROM orders
    UNION ALL SELECT 'lineitem', count(*), 11 FROM lineitem
    UNION ALL SELECT 'events', count(*), 6 FROM events
    UNION ALL SELECT 'documents', count(*), 5 FROM documents
    UNION ALL SELECT 'embeddings', count(*), 3 FROM embeddings
    """,
    doc="O2 catalog/type discovery as a driver-checkable query: per-table "
    "row count + column count from the live schemas (reference "
    "discovery loop, app.js:20-27 over configured entity types). Oracle "
    "pins the schema contract.",
    tags=("reference",),
)
def q_catalog_discovery(spark: SparkSession, sf: str) -> DataFrame:
    from functools import reduce

    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    parts = []
    for t in tables:
        d = read_sf_table(spark, sf, t)
        parts.append(
            d.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")).select(
                F.lit(t).alias("table_name"),
                "n_rows",
                F.lit(len(d.columns)).cast("int").alias("n_cols"),
            )
        )
    return reduce(DataFrame.unionByName, parts)


@register(
    "pipeline_incremental_run",
    """
    SELECT CAST(count(*) AS BIGINT) AS input_rows,
           CAST(count(DISTINCT event_id) AS BIGINT) AS emitted_rows
    FROM events
    """,
    doc="O16 orchestration as a driver-checkable query: one full "
    "run_incremental over the events table from a fresh state dir "
    "(initial checkpoint 1 => full history; empty state => every latest "
    "row emits). Returns the run metrics; batch count is excluded "
    "(partition-layout dependent).",
    tags=("reference",),
)
def q_pipeline_incremental_run(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from .model import EngineConfig, TableSpec
    from .pipeline import run_incremental

    events = read_sf_table(spark, sf, "events")
    spec = TableSpec(name="events", id_field="event_id", ts_field="ts")
    projection = [
        {"target": "id", "source": "event_id"},
        {"target": "type", "source": "event_type"},
    ]
    with tempfile.TemporaryDirectory() as td:
        cfg = EngineConfig(state_dir=td)
        res = run_incremental(
            spark, spec, events, projection, cfg, lambda bodies: None
        )
    return spark.createDataFrame(
        [(res.input_rows, res.emitted_rows)],
        "input_rows bigint, emitted_rows bigint",
    )


@register(
    "audio_wav_features",
    """
    -- the decoded features restated over the source floats: the WAV
    -- payload quantizes each embedding half-up to int16 PCM, and int
    -- sample math is exact in double precision, so the oracle reproduces
    -- the full binary round trip relationally.
    SELECT vec_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(len(embedding) AS INT) AS n_samples,
           round(sqrt(list_sum(list_transform(embedding,
             x -> pow(greatest(least(floor(CAST(x AS DOUBLE) * 32767 + 0.5),
                               32767), -32768), 2))) / len(embedding)), 6)
             AS rms,
           CAST(list_max(list_transform(embedding,
             x -> abs(greatest(least(floor(CAST(x AS DOUBLE) * 32767 + 0.5),
                               32767), -32768)))) AS INT) AS peak_abs
    FROM embeddings
    """,
    doc="E5 with a REAL decoder: embeddings -> 16-bit PCM WAV blobs -> "
    "RIFF header parse + numpy sample decode -> per-clip features "
    "(ext/audio.py). Two Arrow mapInPandas passes; blobs never shuffle. "
    "Oracle re-derives the decoded stats from the source floats through "
    "the exact int16 quantization.",
    tags=("ext",),
)
def q_audio_wav_features(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.audio import decode_wav_features, synthesize_wav

    emb = read_sf_table(spark, sf, "embeddings")
    return decode_wav_features(synthesize_wav(emb))


@register(
    "image_bmp_features",
    """
    SELECT vec_id,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           round(list_sum(list_transform(embedding,
             x -> greatest(least(floor((CAST(x AS DOUBLE) + 1) / 2 * 255
                                       + 0.5), 255), 0)))
                 / len(embedding), 6) AS mean_pixel
    FROM embeddings
    """,
    doc="E5 with a REAL decoder: embeddings -> uncompressed 24-bit BMP "
    "blobs -> BITMAPINFOHEADER parse + numpy pixel decode (bottom-up row "
    "flip) -> per-image features (ext/image.py). Oracle re-derives the "
    "mean pixel from the source floats through the exact byte "
    "quantization.",
    tags=("ext",),
)
def q_image_bmp_features(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.image import decode_bmp_features, synthesize_bmp

    emb = read_sf_table(spark, sf, "embeddings")
    return decode_bmp_features(synthesize_bmp(emb))


@register(
    "image_png_features",
    """
    -- the Spark side round-trips every embedding through a REAL zlib-
    -- deflated, scanline-filtered PNG (all five filter types, CRC-checked
    -- chunks); the oracle re-derives the decoded stats from the source
    -- floats through the exact byte quantization. paeth_rows pins that
    -- the decoder read the per-scanline filter bytes: rows 0..7 carry
    -- filters (0,1,2,3,4,0,1,2) by construction, exactly one Paeth.
    SELECT vec_id,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           round(list_sum(list_transform(embedding,
             x -> greatest(least(floor((CAST(x AS DOUBLE) + 1) / 2 * 255
                                       + 0.5), 255), 0)))
                 / len(embedding), 6) AS mean_pixel,
           CAST(1 AS INT) AS paeth_rows
    FROM embeddings
    """,
    doc="E5 with a REAL COMPRESSED decoder (no codec library): embeddings "
    "-> 8-bit grayscale PNG blobs (stdlib zlib DEFLATE, filter types "
    "0-4 cycled per scanline) -> chunk walk with CRC32 verification, "
    "IDAT inflate, Sub/Up/Average/Paeth defiltering (ext/image.py "
    "_decode_png) -> per-image features. Two Arrow mapInPandas passes; "
    "blobs never shuffle (map-only seam, same shape as image_bmp_"
    "features). The oracle restates the mean through the exact byte "
    "quantization — a defilter or inflate bug cannot hash-match.",
    tags=("ext",),
)
def q_image_png_features(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.image import decode_png_features, synthesize_png

    emb = read_sf_table(spark, sf, "embeddings")
    return decode_png_features(synthesize_png(emb))


@register(
    "bloom_membership_prefilter",
    """
    -- membership truths the sketch must satisfy, restated relationally:
    -- zero false negatives (every true member survives the prefilter) and
    -- a bounded false-positive rate (observed 0.1% at these parameters;
    -- gated at 2%).
    SELECT CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN event_id END) AS BIGINT) AS n_exact,
           true AS no_false_negatives,
           true AS fp_rate_ok
    FROM events
    """,
    doc="E6/runtime-filter: distributed Bloom filter in pure DataFrame ops "
    "(ext/bloom.py) — k xxhash64 bit positions per key OR-folded into "
    "64-bit words by bit_or, broadcast to prefilter the probe side "
    "map-side (no probe-side shuffle). Build over purchase event ids, "
    "probe all ids; asserts no-false-negative and the FP-rate bound.",
    tags=("ext",),
)
def q_bloom_membership_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.bloom import build_bloom, probe_bloom

    ev = read_sf_table(spark, sf, "events")
    members = ev.filter(F.col("event_type") == "purchase").select(
        "event_id"
    ).distinct()
    probe = ev.select("event_id").distinct()
    bloom = build_bloom(members, "event_id")
    probable = probe_bloom(probe, "event_id", bloom)
    n_exact = members.count()
    n_total = probe.count()
    covered = probable.join(members, "event_id", "left_semi").count()
    n_prob = probable.count()
    return spark.createDataFrame(
        [
            (
                n_exact,
                covered == n_exact,
                (n_prob - n_exact) <= 0.02 * max(n_total - n_exact, 1),
            )
        ],
        "n_exact bigint, no_false_negatives boolean, fp_rate_ok boolean",
    )


@register(
    "approx_percentile_check",
    """
    SELECT event_type, true AS within_1pct
    FROM events GROUP BY event_type
    """,
    doc="E6 approx quantile sketch stated decidably: per event_type the "
    "percentile_approx(0.5, accuracy=10000) estimate must land within 1% "
    "of the exact interpolated median (observed error <= 0.085%); "
    "cross-engine sketches differ, the epsilon bound does not.",
    tags=("analytics",),
)
def q_approx_percentile_check(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile_approx(value, 0.5, 10000)").alias("__a"),
            F.expr("percentile(value, 0.5)").alias("__e"),
        )
        .select(
            "event_type",
            (
                F.abs(F.col("__a") - F.col("__e"))
                / F.greatest(F.abs(F.col("__e")), F.lit(1e-9))
                <= 0.01
            ).alias("within_1pct"),
        )
    )


@register(
    "zorder_clustering_key",
    """
    SELECT o_orderkey,
           CAST(o_custkey % 1024 AS BIGINT) AS x,
           CAST(dayofyear(o_orderdate) % 1024 AS BIGINT) AS y,
           CAST(list_sum(list_transform(range(0, 10),
             i -> (((o_custkey % 1024 >> i) & 1) << (2 * i))
                + (((dayofyear(o_orderdate) % 1024 >> i) & 1) << (2 * i + 1))
           )) AS BIGINT) AS z
    FROM orders WHERE o_orderkey < 200
    """,
    doc="Data-layout surface: Z-order (Morton) clustering key — bit "
    "interleave of (customer, day-of-year) so range predicates on either "
    "dimension prune contiguous key ranges (ext/layout.py; "
    "cluster_by_zorder does repartitionByRange + sortWithinPartitions "
    "over this key). Pure bit arithmetic, engine-portable.",
    tags=("ext",),
)
def q_zorder_clustering_key(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.layout import zorder_key

    orders = read_sf_table(spark, sf, "orders").filter(F.col("o_orderkey") < 200)
    x = (F.col("o_custkey") % 1024).cast("long")
    y = (F.dayofyear("o_orderdate") % 1024).cast("long")
    return orders.select(
        "o_orderkey",
        x.alias("x"),
        y.alias("y"),
        zorder_key(x, y, bits=10).alias("z"),
    )


@register(
    "incremental_rollup_merge",
    """
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Incremental view maintenance: the daily rollup is maintained as "
    "mergeable partial-agg state — the pre-checkpoint rollup (old state) "
    "unions with the post-checkpoint delta's rollup and re-aggregates "
    "(sum-of-counts, sum-of-sums). The oracle is the full recompute: "
    "MATCH proves merge(old_state, delta) == recompute(all), i.e. the "
    "engine can maintain 100 TB rollups without rescanning history.",
    tags=("analytics",),
)
def q_incremental_rollup_merge(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    cut = F.lit("2024-01-15").cast("timestamp")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sv"),
        )

    old_state = rollup(ev.filter(F.col("ts") < cut))     # persisted rollup
    delta = rollup(ev.filter(F.col("ts") >= cut))        # new data only
    merged = (
        old_state.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    return merged.select(
        "day", "event_type", F.col("n").cast("bigint").alias("n"),
        F.round("sv", 2).alias("total_value"),
    )


@register(
    "pandas_udaf_geomean",
    """
    SELECT event_type,
           round(exp(avg(ln(value))), 6) AS geo_mean
    FROM events WHERE value > 0 GROUP BY event_type
    """,
    doc="True UDAF surface: a pandas_udf GROUPED_AGG aggregator (geometric "
    "mean via numpy) — Arrow-batched per group, the escape hatch for "
    "aggregations Spark lacks. Oracle restates it as exp(avg(ln)).",
    tags=("functions",),
)
def q_pandas_udaf_geomean(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: queries.py uses `from __future__ import
    # annotations`, which stringifies hints and defeats signature inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geo_mean(v):
        return float(np.exp(np.log(v.to_numpy(dtype=np.float64)).mean()))

    ev = read_sf_table(spark, sf, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.round(geo_mean("value"), 6).alias("geo_mean")
    )


@register(
    "pandas_scalar_udf_logistic",
    """
    SELECT event_id,
           round(1 / (1 + exp(-(value - 35) / 10)), 6) AS score
    FROM events WHERE event_id < 1000
    """,
    doc="Vectorized SCALAR pandas UDF surface: logistic scoring over Arrow "
    "batches (numpy) — the 10-100x-over-row-Python path for logic that "
    "genuinely needs Python. Oracle restates the closed form.",
    tags=("functions",),
)
def q_pandas_scalar_udf_logistic(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", PandasUDFType.SCALAR)
    def logistic(v):
        x = v.to_numpy(dtype=np.float64)
        return pd.Series(1.0 / (1.0 + np.exp(-(x - 35.0) / 10.0)))

    ev = read_sf_table(spark, sf, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id", F.round(logistic("value"), 6).alias("score")
    )


@register(
    "window_range_frame",
    """
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           round(sum(value) OVER w, 2) AS v_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE-frame window (value-based, not row-based): per user, the "
    "trailing-hour event count and value sum at every event — the "
    "point-in-time feature-engineering frame (leakage-free trailing "
    "aggregates for training data).",
    tags=("analytics",),
)
def q_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_sf_table(spark, sf, "events")
    # order by exact integer epoch micros (NTZ-safe, tz-free) and widen the
    # frame to micros: j in frame <=> ts_j >= ts_i - 3600s, exactly the
    # oracle's RANGE 3600 PRECEDING over epoch seconds — no float boundary
    w = (
        Window.partitionBy("user_id")
        .orderBy(tsutil.epoch_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("v_last_hour"),
    )


@register(
    "mode_aggregate",
    """
    SELECT user_id, min(m) AS top_type FROM (
      SELECT user_id, event_type AS m,
             rank() OVER (PARTITION BY user_id ORDER BY count(*) DESC)
               AS rnk
      FROM events GROUP BY user_id, event_type
    ) WHERE rnk = 1 GROUP BY user_id
    """,
    doc="mode() aggregate (Spark 4 deterministic mode): each user's most "
    "frequent event type; ties broken by taking the minimum value so both "
    "engines agree. Oracle restates mode as rank-over-counts.",
    tags=("analytics",),
)
def q_mode_aggregate(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    # deterministic=true -> lowest value among equally-frequent candidates
    return ev.groupBy("user_id").agg(
        F.expr("mode(event_type, true)").alias("top_type")
    )


@register(
    "try_arithmetic_funcs",
    """
    SELECT event_id,
           CASE WHEN value = 0 THEN NULL ELSE round(100 / value, 6) END
             AS safe_div,
           TRY_CAST(event_type AS DOUBLE) AS bad_cast,
           TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS good_cast
    FROM events WHERE event_id < 2000
    """,
    doc="ANSI null-safety surface: try_divide / try_cast return NULL "
    "instead of raising on bad input — the fault-tolerant expression set "
    "a dirty 100 TB corpus needs (no task retries from one bad row).",
    tags=("functions",),
)
def q_try_arithmetic_funcs(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.round(F.try_divide(F.lit(100), F.col("value")), 6).alias("safe_div"),
        F.try_to_number(F.col("event_type"), F.lit("999")).cast("double").alias(
            "bad_cast"
        ),
        F.col("event_id").cast("string").try_cast("bigint").alias("good_cast"),
    )


@register(
    "array_higher_order_funcs",
    """
    WITH t AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      WHERE vec_id < 100
    )
    SELECT vec_id,
           CAST(len(list_filter(e, x -> x > 0)) AS INT) AS n_positive,
           CAST(list_bool_or(list_transform(e, x -> abs(x) > 0.2)) AS BOOLEAN)
             AS any_large,
           CAST(list_bool_and(list_transform(e, x -> abs(x) < 1)) AS BOOLEAN)
             AS all_unit,
           round(list_sum(list_transform(e, x -> x * x)), 6) AS sum_sq
    FROM t
    """,
    doc="Array higher-order functions (filter / exists / forall / "
    "aggregate): per-vector predicates and folds entirely JVM-side — the "
    "lambda surface that keeps array logic out of Python.",
    tags=("functions",),
)
def q_array_higher_order_funcs(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_sf_table(spark, sf, "embeddings").filter(F.col("vec_id") < 100)
    e = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.exists(e, lambda x: F.abs(x) > 0.2).alias("any_large"),
        F.forall(e, lambda x: F.abs(x) < 1).alias("all_unit"),
        F.round(
            F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sum_sq"),
    )


@register(
    "format_roundtrip_orc_csv",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_chars) AS BIGINT) AS checksum,
           true AS orc_matches, true AS csv_matches
    FROM documents
    """,
    doc="Format/connector surface: documents round-trip through ORC and "
    "CSV (write + read back under /tmp) and must reproduce the row count "
    "and a content checksum exactly — the storage-format portability "
    "claim as a driver row.",
    tags=("functions",),
)
def q_format_roundtrip_orc_csv(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    docs = read_sf_table(spark, sf, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    agg = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("ck")
    ).first()
    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").orc(td + "/o")
        docs.write.mode("overwrite").option("header", True).csv(td + "/c")
        o = spark.read.orc(td + "/o").agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("ck")
        ).first()
        c = (
            spark.read.option("header", True)
            .schema("doc_id long, lang string, source string, n_chars long")
            .csv(td + "/c")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("ck"))
            .first()
        )
    return spark.createDataFrame(
        [
            (
                agg["n"],
                agg["ck"],
                (o["n"], o["ck"]) == (agg["n"], agg["ck"]),
                (c["n"], c["ck"]) == (agg["n"], agg["ck"]),
            )
        ],
        "n_rows bigint, checksum bigint, orc_matches boolean, csv_matches boolean",
    )


@register(
    "asof_join_forward",
    f"""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '{DUCK_TS_FMT}') AS purchase_ts,
           strftime(s.ts, '{DUCK_TS_FMT}') AS next_signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts <= s.ts
    """,
    doc="Forward as-of join (pd.merge_asof direction='forward'): the "
    "EARLIEST signup at-or-after each purchase per user — same "
    "union + last-value window shape, descending time order.",
    tags=("custom",),
)
def q_asof_join_forward(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import asof_join

    ev = read_sf_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    out = asof_join(
        purchases, signups, "user_id", "ts", "signup_ts", ["signup_ts"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        _ts_str(F.col("ts")).alias("purchase_ts"),
        _ts_str(F.col("signup_ts")).alias("next_signup_ts"),
    )


@register(
    "argmax_histogram_funcs",
    """
    WITH am AS (
      SELECT event_type, max(value) AS max_value
      FROM events GROUP BY event_type
    ),
    winner AS (
      SELECT e.event_type, CAST(max(e.event_id) AS BIGINT) AS max_event_id
      FROM events e JOIN am ON e.event_type = am.event_type
                         AND e.value = am.max_value
      GROUP BY e.event_type
    ),
    hist AS (
      -- width_bucket(value, 0, 50, 10) restated (DuckDB lacks the fn):
      -- 10 buckets of width 5, underflow -> 0, overflow -> 11
      SELECT event_type,
             CASE WHEN value < 0 THEN 0
                  WHEN value >= 50 THEN 11
                  ELSE CAST(floor(value / 5) + 1 AS BIGINT) END AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT h.event_type, h.bucket, h.n, w.max_event_id,
           round(am.max_value, 4) AS max_value
    FROM hist h
    JOIN winner w ON w.event_type = h.event_type
    JOIN am ON am.event_type = h.event_type
    """,
    doc="argmax/argmin + histogram surface: max_by with a struct ordering "
    "key (deterministic tie-break on id) and width_bucket value "
    "histograms — the 'which row achieved the aggregate' pattern without "
    "a self-join (one aggregation, no re-scan).",
    tags=("analytics",),
)
def q_argmax_histogram_funcs(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    per_type = ev.groupBy("event_type").agg(
        F.expr("max_by(event_id, struct(value, event_id))").alias(
            "max_event_id"
        ),
        F.round(F.max("value"), 4).alias("max_value"),
    )
    hist = ev.groupBy(
        "event_type",
        F.expr("width_bucket(value, 0, 50, 10)").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return hist.join(per_type, "event_type").select(
        "event_type", "bucket", "n", "max_event_id", "max_value"
    )


@register(
    "bpe_token_counts",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
           )) AS BIGINT) AS n_bpe_pretokens
    FROM documents
    """,
    doc="E4 token counting, BPE-ish: the GPT-2 pre-tokenizer regex "
    "(contraction suffixes, letter runs, digit runs, punctuation runs, "
    "whitespace — lookahead dropped for RE2 compatibility) counted per "
    "document. The whitespace twin is `token_counts`; real BPE merges "
    "would run as an Arrow UDF over these pre-token streams.",
    tags=("ext",),
)
def q_bpe_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    pat = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias("n_bpe_pretokens"),
    )


@register(
    "union_schema_evolution",
    """
    SELECT event_id, event_type, value, NULL AS extra_tag FROM events
    WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, event_type, NULL AS value, 'legacy' AS extra_tag
    FROM events WHERE event_type = 'signup'
    """,
    doc="Schema-drift union (the reference's schemaless entity model, "
    "SURVEY §1.3): two snapshots with different column sets union by NAME "
    "with missing columns null-filled (unionByName allowMissingColumns) — "
    "the append path when a source adds/drops fields between runs.",
    tags=("functions",),
)
def q_union_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    old_shape = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "event_type", "value"
    )
    new_shape = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "event_type", F.lit("legacy").alias("extra_tag")
    )
    return old_shape.unionByName(new_shape, allowMissingColumns=True).select(
        "event_id",
        "event_type",
        "value",
        F.col("extra_tag").cast("string").alias("extra_tag"),
    )


@register(
    "approx_topk_tokens",
    """
    SELECT CAST(5 AS INT) AS k,
           true AS counts_exact,
           true AS within_exact_top10
    FROM (SELECT 1)
    """,
    doc="E6 frequent-items sketch (approx_top_k) over the exploded token "
    "stream, stated decidably: each sketched (item, count) must carry the "
    "EXACT count (the tracker is sized above the distinct-token count) "
    "and sit inside the exact top-10 (set containment dodges tie-order "
    "ambiguity at the boundary).",
    tags=("ext",),
)
def q_approx_topk_tokens(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    )
    approx = (
        toks.agg(F.expr("approx_top_k(tok, 5, 100000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("tok"), F.col("e.count").alias("ac"))
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("ec"))
    top10 = exact.orderBy(F.desc("ec"), "tok").limit(10)
    joined = approx.join(exact, "tok", "left").join(
        top10.select("tok", F.lit(True).alias("in10")), "tok", "left"
    )
    return joined.agg(
        F.count(F.lit(1)).cast("int").alias("k"),
        F.min(F.col("ac") == F.col("ec")).alias("counts_exact"),
        F.min(F.coalesce("in10", F.lit(False))).alias("within_exact_top10"),
    )


@register(
    "mixture_resample",
    """
    -- the mixture arithmetic restated: per-source acceptance rates applied
    -- to a uniform deterministic hash of the doc id. hash(doc_id) must be
    -- engine-portable, so the uniform variate is (doc_id * 2654435761) %
    -- 1000 / 1000 (Knuth multiplicative hash — identical integer math in
    -- any engine), not an engine hash function.
    WITH rates AS (
      SELECT DISTINCT source,
             CASE CAST(substring(source, 4) AS INT) % 4
               WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
               WHEN 2 THEN 0.25 ELSE 0.1 END AS rate
      FROM documents
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE ((d.doc_id * 2654435761) % 1000) / 1000.0 < r.rate
    """,
    doc="Training-mixture resampling: per-source acceptance rates (the "
    "'data mixture' knob — upsample books/wiki, downsample news) applied "
    "via a deterministic per-doc uniform variate, so the sample is "
    "reproducible, growth-stable, and needs no shuffle (broadcast the "
    "rate table, filter map-side).",
    tags=("ext",),
)
def q_mixture_resample(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    # per-source mixture weights cycling 1.0 / 0.5 / 0.25 / 0.1 over the
    # corpus's sources (a real deployment supplies this table)
    weights = [1.0, 0.5, 0.25, 0.1]
    rates = (
        docs.select("source")
        .distinct()
        .withColumn(
            "rate",
            F.element_at(
                F.array(*[F.lit(w) for w in weights]),
                (F.substring("source", 4, 10).cast("int") % 4) + 1,
            ),
        )
    )
    u = (F.col("doc_id") * F.lit(2654435761)) % 1000 / 1000.0
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(u < F.col("rate"))
        .select("doc_id", "source")
    )


@register(
    "json_corrupt_records",
    """
    -- staged fixture: 4 valid JSONL lines + 2 corrupt ones (see the Spark
    -- side); PERMISSIVE mode must keep valid rows and capture bad lines in
    -- _corrupt_record instead of failing the scan.
    SELECT CAST(4 AS BIGINT) AS n_good, CAST(2 AS BIGINT) AS n_corrupt,
           CAST(30 AS BIGINT) AS sum_good_x
    FROM (SELECT 1)
    """,
    doc="Dirty-ingest surface: PERMISSIVE JSON reading with "
    "columnNameOfCorruptRecord — one bad line quarantines into "
    "_corrupt_record, the scan survives, valid rows flow on. At 100 TB a "
    "FAILFAST scan over crawled JSON is not an option.",
    tags=("functions",),
)
def q_json_corrupt_records(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import tempfile

    lines = [
        '{"id": 1, "x": 5}',
        '{"id": 2, "x": 10}',
        'this is not json at all',
        '{"id": 3, "x": 7}',
        '{"id": 4, "x": 8}',
        '{"id": 5, "x": ',
    ]
    td = tempfile.mkdtemp(prefix="spark_graft_json_")
    path = os.path.join(td, "rows.jsonl")
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    df = (
        spark.read.schema("id long, x long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    ).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    return spark.createDataFrame(
        [(good.count(), bad.count(),
          good.agg(F.sum("x")).first()[0])],
        "n_good bigint, n_corrupt bigint, sum_good_x bigint",
    )


@register(
    "embedding_pq_topk",
    """
    -- float k-means codebooks forbid pinning the result set (summation
    -- order wobbles cluster boundaries); the decidable claim is the
    -- recall floor of the full PQ pipeline: auto-scaled ADC shortlist
    -- (max(50, 1% of corpus) — fixed 50 lost the floor at sf1, r5) +
    -- exact rerank observed at 0.96 recall@5, gated with margin at 0.8.
    SELECT CAST(5 * (SELECT count(*) FROM embeddings WHERE vec_id < 10)
                AS BIGINT) AS n_truth_pairs,
           true AS recall_ok
    FROM (SELECT 1)
    """,
    doc="E3 scale path #3 — product quantization (memory-bound ANN): "
    "per-subspace k-means codebooks (m=16, k=32), 16-byte codes replace "
    "64-dim float vectors at scan time, ADC lookup-table scoring, exact "
    "rerank of an auto-scaled shortlist (max(50, 1% of corpus) — "
    "ext/pq.py). Stated decidably as a recall floor vs brute force.",
    tags=("ext", "bench2"),
)
def q_embedding_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.pq import encode_pq, pq_topk_reranked, train_pq_codebooks
    from .ext.similarity import topk_brute_force

    emb = read_sf_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    books = train_pq_codebooks(emb, m=16, k=32, iterations=2)
    codes = encode_pq(emb, books)
    approx = pq_topk_reranked(
        emb, codes, queries, books, k=5, shortlist=None
    ).select(F.col("query_id").alias("q2"), F.col("neighbor_id").alias("n2"))
    exact = topk_brute_force(emb, queries, "vec_id", "embedding", k=5).select(
        "query_id", "neighbor_id"
    )
    hit = exact.join(
        approx,
        (exact.query_id == approx.q2) & (exact.neighbor_id == approx.n2),
        "left",
    )
    return hit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth_pairs"),
        (F.count("n2") / F.count(F.lit(1)) >= 0.8).alias("recall_ok"),
    )


@register(
    "scd2_user_event_history",
    f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), chg AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, event_id,
           strftime(ts, '{DUCK_TS_FMT}') AS valid_from,
           strftime(lead(ts) OVER w2, '{DUCK_TS_FMT}') AS valid_to,
           (lead(ts) OVER w2 IS NULL) AS is_current
    FROM chg
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD Type-2 history state (state.scd2_history + merge_scd2): the "
    "keep-history generalization of the reference's last-write-wins upsert "
    "(cache.js:55-57). Runs the INCREMENTAL path — history built at the "
    "checkpoint cutoff, then merge_scd2 over the post-cutoff batch — and the "
    "oracle recomputes the full series, so MATCH proves incremental == "
    "rebuild with closed rows passing through shuffle-free.",
    tags=("ext", "bench2"),
)
def q_scd2_user_event_history(spark: SparkSession, sf: str) -> DataFrame:
    from .state import merge_scd2, scd2_history

    ev = read_sf_table(spark, sf, "events")
    prefix = ev.filter(F.col("ts") <= F.lit(CUTOFF).cast("timestamp"))
    batch = ev.filter(F.col("ts") > F.lit(CUTOFF).cast("timestamp"))
    history = scd2_history(prefix, "user_id", "event_type", "ts", "event_id")
    merged = merge_scd2(history, batch, "user_id", "event_type", "ts", "event_id")
    return merged.select(
        "user_id",
        "event_type",
        "event_id",
        _ts_str(F.col("valid_from")).alias("valid_from"),
        _ts_str(F.col("valid_to")).alias("valid_to"),
        "is_current",
    )


@register(
    "salted_join_orders",
    """
    -- money sums ride DECIMAL(38,10) partials end-to-end (at sf1 the
    -- outer double sum reaches ~5e11 where ordering drift exceeds the
    -- 2-dec grid), and the single final quantize is floor(x*100 + 0.5)
    -- on the exact decimal: a decimal DOWN-CAST would HALF_UP in Spark
    -- but TRUNCATE in DuckDB, which diverges once o_totalprice > 2^19
    -- (a double's ulp there exceeds the 1e-10 cast grid)
    WITH dim AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             sum(CAST(o_totalprice AS DECIMAL(38,10))) AS spend
      FROM orders GROUP BY o_custkey
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(d.n_orders) AS BIGINT) AS total_orders,
           CAST(floor(sum(spend) * 100 + 0.5) AS DOUBLE) / 100
             AS total_spend
    FROM events e JOIN dim d ON e.user_id = d.o_custkey
    GROUP BY e.event_type
    """,
    doc="Skew-safe salted equi-join (operators.salted_join): fact side "
    "salted deterministically on event_id, dim replicated x16, join on "
    "(key, salt) — one hot user spreads over 16 reducers. The manual "
    "escape hatch when AQE skew split can't fire. Oracle is the plain "
    "join, so MATCH proves salting preserves join semantics.",
    tags=("ext",),
)
def q_salted_join_orders(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import salted_join

    ev = read_sf_table(spark, sf, "events")
    orders = read_sf_table(spark, sf, "orders")
    dim = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,10)")).alias("spend"),
    )
    joined = salted_join(
        ev.withColumnRenamed("user_id", "o_custkey"),
        dim,
        ["o_custkey"],
        salt_buckets=16,
        how="inner",
        salt_on="event_id",
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("n_orders").cast("bigint").alias("total_orders"),
        (
            F.floor(
                F.sum("spend") * 100 + F.lit("0.5").cast("decimal(2,1)")
            ).cast("double")
            / 100
        ).alias("total_spend"),
    )


@register(
    "lm_quality_score",
    """
    WITH bg AS (
      SELECT doc_id,
             substring(text, p, 2) AS bigram,
             substring(text, p, 1) AS prefix
      FROM (SELECT doc_id, text,
                   unnest(range(1, length(text))) AS p
            FROM documents)
    ),
    model AS (SELECT bigram, count(*) AS cab FROM bg GROUP BY bigram),
    pfx AS (SELECT prefix, count(*) AS ca FROM bg GROUP BY prefix),
    vocab AS (SELECT count(DISTINCT substring(bigram, 2, 1)) AS v FROM bg)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(ln((cab + 1.0) / (ca + v))) / count(*), 4) AS avg_logprob
    FROM bg JOIN model USING (bigram) JOIN pfx USING (prefix) CROSS JOIN vocab
    GROUP BY doc_id
    """,
    doc="E4 distributed n-gram LM quality scoring (ext/lm.py): train a "
    "char-bigram add-one-smoothed LM as map-side-combined aggregates "
    "(model is O(charset**2) — broadcastable forever), score every doc "
    "via broadcast joins over its bigram histogram. The engine pattern "
    "behind CCNet-style perplexity filtering, with ln/arith in codegen.",
    tags=("ext",),
)
def q_lm_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.lm import score_documents, train_char_bigram_lm

    docs = read_sf_table(spark, sf, "documents")
    model = train_char_bigram_lm(docs)
    return score_documents(docs, model)


@register(
    "repeated_substring_windows",
    """
    WITH wins AS (
      SELECT doc_id, substring(text, p, 24) AS w
      FROM (SELECT doc_id, text,
                   unnest(range(1, length(text) - 24 + 2, 8)) AS p
            FROM documents
            WHERE length(text) >= 24)
    ),
    stats AS (SELECT w, count(DISTINCT doc_id) AS nd FROM wins GROUP BY w)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows,
           round(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) / count(*), 4)
             AS dup_frac
    FROM wins JOIN stats USING (w)
    GROUP BY doc_id
    """,
    doc="E1/E2 cross-doc repeated-substring detection "
    "(ext/dedup.repeated_substring_windows): Lee-et-al exact-substring "
    "dedup signal as a stride-24-char shingle-window equi-join (suffix-"
    "array-free). Windows explode in codegen; distinct-doc counts partial-"
    "aggregate map-side; at 100 TB the group key is xxhash64(window).",
    tags=("ext",),
)
def q_repeated_substring_windows(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import repeated_substring_windows

    docs = read_sf_table(spark, sf, "documents")
    return repeated_substring_windows(docs, k=24, stride=8)


@register(
    "quality_classifier_gate",
    r"""
    -- the pinned linear model in closed form: weight(bucket b) =
    -- (((b*37 + 11) % 64) - 32) / 64.0, bucket = md5-mod-64 of the token
    -- (the repo's portable hash recipe). Same fold order, same doubles.
    WITH scored AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                           t -> t <> ''),
               t -> ((((CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT)
                        % 64) * 37 + 11) % 64) - 32) / 64.0
             ) AS ws
      FROM documents
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(CASE WHEN len(ws) > 0
               THEN list_sum(ws) / len(ws) ELSE 0.0 END))), 6)
             AS quality_prob,
           (1.0 / (1.0 + exp(-(CASE WHEN len(ws) > 0
               THEN list_sum(ws) / len(ws) ELSE 0.0 END)))) >= 0.5 AS keep
    FROM scored
    """,
    doc="E4 document-quality classifier gate (ext/classifier.py — the "
    "DCLM/fastText pattern): linear bag-of-tokens model, md5-bucket hash, "
    "sigmoid of the mean bucket weight, threshold keep. Model is a pinned "
    "closed form so the oracle is decidable; the dataflow is the real "
    "thing — weights foldable/broadcast, scoring pure codegen "
    "(split/filter/aggregate higher-order exprs), zero shuffle, no UDF. "
    "Composes into prepare_training_data(classifier_threshold=...).",
    tags=("ext",),
)
def q_quality_classifier_gate(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.classifier import classify_documents

    docs = read_sf_table(spark, sf, "documents")
    return classify_documents(docs, threshold=0.5)


@register(
    "repeated_substring_spans",
    """
    WITH wins AS (
      SELECT doc_id, CAST(p AS BIGINT) AS p, substring(text, CAST(p AS INT), 20) AS w
      FROM (SELECT doc_id, text,
                   unnest(range(1, length(text) - 20 + 2, 4)) AS p
            FROM documents
            WHERE length(text) >= 20)
    ),
    ok AS (
      SELECT w FROM (SELECT w, count(DISTINCT doc_id) AS nd FROM wins GROUP BY w)
      WHERE nd BETWEEN 2 AND 50
    ),
    rep AS (SELECT wins.* FROM wins JOIN ok USING (w)),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.p AS pa, b.p AS pb, a.p - b.p AS diag
      FROM rep a JOIN rep b ON a.w = b.w AND a.doc_id < b.doc_id
    ),
    flagged AS (
      SELECT *, CASE WHEN pa - lag(pa) OVER
                  (PARTITION BY doc_a, doc_b, diag ORDER BY pa) = 4
                THEN 0 ELSE 1 END AS new_chain
      FROM cand
    ),
    chains AS (
      SELECT *, sum(new_chain) OVER
                  (PARTITION BY doc_a, doc_b, diag ORDER BY pa
                   ROWS UNBOUNDED PRECEDING) AS chain_id
      FROM flagged
    )
    SELECT doc_a, doc_b,
           CAST(min(pa) AS BIGINT) AS start_a,
           CAST(min(pb) AS BIGINT) AS start_b,
           CAST(20 + max(pa) - min(pa) AS BIGINT) AS span_len
    FROM chains GROUP BY doc_a, doc_b, diag, chain_id
    """,
    doc="E1/E2 MAXIMAL repeated spans (ext/dedup.repeated_substring_spans): "
    "the Lee-et-al exact-substring semantics — adjacent matching k=20 "
    "windows (stride 4) chain per (doc pair, alignment diagonal) into "
    "maximal (start_a, start_b, span_len) extents via one lag + one "
    "running-sum window. Self-join is a hash equi-join on window text "
    "with a doc-frequency cap (2..50) bounding fan-out; no NLJ anywhere. "
    "Oracle restates the identical chain aggregation.",
    tags=("ext",),
)
def q_repeated_substring_spans(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import repeated_substring_spans

    docs = read_sf_table(spark, sf, "documents")
    return repeated_substring_spans(docs, k=20, stride=4, max_df=50)


@register(
    "semantic_dedup_pairs",
    """
    -- float k-means forbids pinning the candidate set; the decidable
    -- claims are (a) the exact all-pairs count both engines compute and
    -- (b) the SemDeDup recall floor (measured 0.97 at k=8/p=3; gated 0.8)
    -- plus perfect precision (every emitted pair is exact-cosine-verified).
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
           true AS recall_ok,
           true AS precision_ok
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
    doc="E2/E3 SemDeDup (ext/semdedup.py, Abbas et al.): k-means cells + "
    "n_probe=3 multi-assignment, pairwise exact cosine ONLY within shared "
    "cells — O(n^2) becomes k independent shuffle-local compares. Stated "
    "decidably as recall >= 0.8 vs the exact pair set with precision 1.",
    tags=("ext", "bench2"),
)
def q_semantic_dedup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.semdedup import semantic_near_dup_pairs
    from .ext.similarity import exact_cosine_pairs

    emb = read_sf_table(spark, sf, "embeddings")
    found = semantic_near_dup_pairs(
        emb, n_clusters=8, threshold=0.4, n_probe=3
    ).select(
        F.col("id_a").alias("fa"), F.col("id_b").alias("fb"), F.lit(1).alias("__f")
    )
    exact = exact_cosine_pairs(emb, 0.4).select(
        "id_a", "id_b", F.lit(1).alias("__e")
    )
    # full outer: exact-only rows = recall misses, found-only rows =
    # precision violations; ONE action computes every gate (the previous
    # three-action form re-ran k-means + the all-pairs compare per action)
    j = exact.join(
        found,
        (exact.id_a == found.fa) & (exact.id_b == found.fb),
        "full_outer",
    )
    return j.agg(
        F.count("__e").cast("bigint").alias("n_exact_pairs"),
        (
            F.count(F.when(F.col("__e").isNotNull() & F.col("__f").isNotNull(), 1))
            / F.count("__e")
            >= 0.8
        ).alias("recall_ok"),
        (F.count(F.when(F.col("__e").isNull(), 1)) == 0).alias("precision_ok"),
    )


@register(
    "dedup_exact_incremental",
    """
    WITH state AS (
      SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id < 250
    ),
    batch AS (
      SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id >= 250
    ),
    winners AS (
      SELECT fp, CAST(min(doc_id) AS BIGINT) AS doc_id
      FROM batch GROUP BY fp
    )
    SELECT w.doc_id FROM winners w
    WHERE w.fp NOT IN (SELECT fp FROM state)
    """,
    doc="E1 incremental exact dedup (ext/dedup.exact_dedup_incremental): "
    "dedup a new batch against the accumulated corpus via a fingerprint "
    "STATE table (the corpus-scale analogue of cache.js:69-85 change "
    "suppression). Batch shuffles as (fp,id) only; state anti-join is "
    "fp-keyed and bucket-able; bodies move once.",
    tags=("ext",),
)
def q_dedup_exact_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import exact_dedup_incremental, fingerprint

    docs = read_sf_table(spark, sf, "documents")
    state = (
        docs.filter(F.col("doc_id") < 250)
        .select(fingerprint("text").alias("fp"))
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") >= 250)
    kept, _next = exact_dedup_incremental(state, batch)
    return kept.select("doc_id")


@register(
    "grouped_split_by_source",
    """
    WITH assigned AS (
      SELECT source,
             CASE
               WHEN CAST(('0x' || substring(md5(source), 1, 8))::UBIGINT
                         AS DOUBLE) / 4294967296.0 < 0.15 THEN 'test'
               WHEN CAST(('0x' || substring(md5(source), 1, 8))::UBIGINT
                         AS DOUBLE) / 4294967296.0 < 0.35 THEN 'val'
               ELSE 'train'
             END AS split
      FROM documents
    )
    SELECT source, split, CAST(count(*) AS BIGINT) AS n
    FROM assigned GROUP BY source, split
    """,
    doc="Leakage-safe grouped split (ext/sampling.grouped_split): the "
    "split hashes the GROUP key (source), so all documents of a source "
    "land in one split and val/test can't see a train-set sibling. "
    "Map-only; oracle recomputes the identical md5 assignment, and "
    "one-row-per-source proves no group straddles splits.",
    tags=("ext",),
)
def q_grouped_split_by_source(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.sampling import grouped_split

    docs = read_sf_table(spark, sf, "documents")
    return (
        grouped_split(docs, "source", val_fraction=0.2, test_fraction=0.15)
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "winsorize_event_values",
    """
    WITH stats AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(min(stats.lo), 6) AS p05,
           round(min(stats.hi), 6) AS p95,
           round(avg(least(greatest(e.value, stats.lo), stats.hi)), 6)
             AS avg_winsorized,
           CAST(sum(CASE WHEN e.value < stats.lo OR e.value > stats.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
    FROM events e JOIN stats USING (event_type)
    GROUP BY e.event_type
    """,
    doc="Per-group quantile clipping (operators.winsorize): exact group "
    "percentiles (map-side partial agg), broadcast back, clamp in codegen. "
    "The outlier guard before training statistics; percentile_approx is "
    "the same-shape 100 TB swap-in.",
    tags=("ext",),
)
def q_winsorize_event_values(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import winsorize

    ev = read_sf_table(spark, sf, "events")
    w = winsorize(ev, "value", ["event_type"], lower=0.05, upper=0.95)
    stats = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("__lo"),
        F.expr("percentile(value, 0.95)").alias("__hi"),
    )
    return (
        w.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("__lo"), 6).alias("p05"),
            F.round(F.min("__hi"), 6).alias("p95"),
            F.round(F.avg("value_w"), 6).alias("avg_winsorized"),
            F.sum(
                ((F.col("value") < F.col("__lo")) | (F.col("value") > F.col("__hi")))
                .cast("long")
            )
            .cast("bigint")
            .alias("n_clamped"),
        )
    )


@register(
    "standardize_embeddings",
    """
    WITH e AS (
      SELECT vec_id,
             unnest(CAST(embedding AS DOUBLE[])) AS x,
             unnest(range(0, len(embedding))) AS d
      FROM embeddings
    ),
    stats AS (
      SELECT d, avg(x) AS mu, stddev_pop(x) AS sigma FROM e GROUP BY d
    )
    SELECT e.vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           round(sqrt(sum(pow((e.x - stats.mu)
                              / coalesce(nullif(stats.sigma, 0.0), 1.0), 2))), 4)
             AS z_norm
    FROM e JOIN stats USING (d)
    GROUP BY e.vec_id
    """,
    doc="E3 dim-wise embedding standardization (ext/features.standardize): "
    "one posexplode aggregation for O(dim) stats, then a map-only "
    "higher-order transform against the broadcast struct array re-writes "
    "every vector in place. Output pins the standardized vector's norm.",
    tags=("ext",),
)
def q_standardize_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.features import standardize

    emb = read_sf_table(spark, sf, "embeddings")
    std = standardize(emb)
    return std.select(
        "vec_id",
        F.size("embedding_std").cast("bigint").alias("n_dims"),
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding_std", F.lit(0.0), lambda acc, x: acc + x * x
                )
            ),
            4,
        ).alias("z_norm"),
    )


@register(
    "clean_text_normalize",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(
                 regexp_replace(text,
                   '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', ' ', 'g'),
                 '[ \\t\\n\\r]+', ' ', 'g'))) AS clean_fp,
           CAST(length(trim(regexp_replace(
                 regexp_replace(text,
                   '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', ' ', 'g'),
                 '[ \\t\\n\\r]+', ' ', 'g'))) AS BIGINT) AS clean_len
    FROM documents
    """,
    doc="E4 text cleanup (ext/text.clean_text): strip control chars, "
    "collapse whitespace runs, trim — map-only codegen regexps with "
    "engine-portable character classes; md5 of the cleaned text pins "
    "byte-exactness against the oracle.",
    tags=("ext",),
)
def q_clean_text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.text import clean_text

    docs = read_sf_table(spark, sf, "documents")
    clean = clean_text("text")
    return docs.select(
        "doc_id",
        F.md5(clean).alias("clean_fp"),
        F.length(clean).cast("bigint").alias("clean_len"),
    )


def _duck_clean_text(col: str = "text") -> str:
    """DuckDB twin of ext.text.clean_text."""
    ctrl = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
    return (
        f"trim(regexp_replace(regexp_replace({col}, '{ctrl}', ' ', 'g'), "
        "'[ \\t\\n\\r]+', ' ', 'g'))"
    )


@register(
    "training_data_prep",
    f"""
    WITH cleaned AS (
      SELECT doc_id, source, {_duck_clean_text()} AS text
      FROM documents
    ),
    feats AS (
      SELECT doc_id, source, text,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             ({" + ".join(_duck_count_occ(w) for w in
                          ("the", "a", "of", "and", "to", "in", "is", "it"))})
               AS n_stop
      FROM cleaned
    ),
    gated AS (
      SELECT * FROM feats
      WHERE n_tokens >= 20
        AND round(least(n_tokens / 200.0, 1.0) * 0.5
                  + least(n_stop / n_tokens * 4.0, 1.0) * 0.5, 4) >= 0.15
    ),
    winners AS (
      SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM gated GROUP BY fp
    ),
    deduped AS (
      SELECT g.* FROM gated g JOIN winners w ON g.doc_id = w.doc_id
    ),
    assigned AS (
      SELECT source, n_tokens,
             CASE
               WHEN CAST(('0x' || substring(md5(source), 1, 8))::UBIGINT
                         AS DOUBLE) / 4294967296.0 < 0.1 THEN 'test'
               WHEN CAST(('0x' || substring(md5(source), 1, 8))::UBIGINT
                         AS DOUBLE) / 4294967296.0 < 0.2 THEN 'val'
               ELSE 'train'
             END AS split
      FROM deduped
    )
    SELECT split, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM assigned GROUP BY split, source
    """,
    doc="End-to-end training-data prep (ext/prep.prepare_training_data): "
    "clean -> quality gate -> exact dedup -> leakage-safe grouped split, "
    "composed lazily so Catalyst fuses clean+featurize+gate into one map "
    "stage with a single (fp,id) dedup shuffle. The oracle chains the "
    "stage oracles, pinning the whole pipeline end to end.",
    tags=("ext", "bench2"),
)
def q_training_data_prep(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.prep import prepare_training_data

    docs = read_sf_table(spark, sf, "documents")
    out = prepare_training_data(docs)
    return out.groupBy("split", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


@register(
    "streaming_neardup_prep",
    f"""
    -- Structured-Streaming near-dup prep, restated relationally: the
    -- corpus splits into 3 contiguous-id micro-batches; a doc is kept
    -- iff it is not a >=0.5-Jaccard near-dup of (a) any SMALLER-ID doc
    -- in its own batch or (b) any KEPT doc of an earlier batch — the
    -- exact greedy policy exact_neardup_dedup_incremental implements
    -- with persistent shingle-index state (EXACT pair recall by
    -- construction, so this equality holds at any SF — r6; the LSH
    -- signature state is the method='minhash' alternative, recall-gated
    -- by minhash_near_dups). The 3-batch recursion unrolls into chained
    -- CTEs k0/k1/k2. MATERIALIZED hints keep the oracle itself
    -- scale-bounded: without them DuckDB re-inlines the shingle
    -- self-join into every consumer and the sf1 run exhausted 4 GB of
    -- temp (r5 close); materialized once, the pair set is tiny and the
    -- chained keeps are cheap semi-joins.
    WITH cleaned AS (
      SELECT doc_id, source, {_duck_clean_text()} AS text
      FROM documents
    ),
    feats AS (
      SELECT doc_id, source, text,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             ({" + ".join(_duck_count_occ(w) for w in
                          ("the", "a", "of", "and", "to", "in", "is", "it"))})
               AS n_stop
      FROM cleaned
    ),
    gated AS MATERIALIZED (
      SELECT * FROM feats
      WHERE n_tokens >= 20
        AND round(least(n_tokens / 200.0, 1.0) * 0.5
                  + least(n_stop / n_tokens * 4.0, 1.0) * 0.5, 4) >= 0.15
    ),
    batched AS MATERIALIZED (
      SELECT doc_id, source, text, n_tokens,
             least(2, CAST(floor(doc_id * 3.0 /
                   (SELECT count(*) FROM documents)) AS INT)) AS b
      FROM gated
    ),
    toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
      FROM batched
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2) i
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ),
    k0 AS MATERIALIZED (
      SELECT d.doc_id FROM batched d WHERE d.b = 0 AND NOT EXISTS (
        SELECT 1 FROM pairs p JOIN batched a ON a.doc_id = p.doc_a
        WHERE p.doc_b = d.doc_id AND a.b = 0)
    ),
    k1 AS MATERIALIZED (
      SELECT d.doc_id FROM batched d WHERE d.b = 1 AND NOT EXISTS (
        SELECT 1 FROM pairs p JOIN batched a ON a.doc_id = p.doc_a
        WHERE p.doc_b = d.doc_id
          AND (a.b = 1 OR a.doc_id IN (SELECT doc_id FROM k0)))
    ),
    k2 AS (
      SELECT d.doc_id FROM batched d WHERE d.b = 2 AND NOT EXISTS (
        SELECT 1 FROM pairs p JOIN batched a ON a.doc_id = p.doc_a
        WHERE p.doc_b = d.doc_id
          AND (a.b = 2 OR a.doc_id IN (SELECT doc_id FROM k0)
               OR a.doc_id IN (SELECT doc_id FROM k1)))
    ),
    kept AS (
      SELECT doc_id FROM k0 UNION ALL SELECT doc_id FROM k1
      UNION ALL SELECT doc_id FROM k2
    )
    SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
           CASE
             WHEN CAST(('0x' || substring(md5(d.source), 1, 8))::UBIGINT
                       AS DOUBLE) / 4294967296.0 < 0.1 THEN 'test'
             WHEN CAST(('0x' || substring(md5(d.source), 1, 8))::UBIGINT
                       AS DOUBLE) / 4294967296.0 < 0.2 THEN 'val'
             ELSE 'train'
           END AS split
    FROM batched d JOIN kept k ON k.doc_id = d.doc_id
    """,
    doc="Continuous near-dup training-data ingest, end to end "
    "(ext/prep.run_streaming_neardup_prep, method='exact'): the corpus "
    "arrives as 3 file-source micro-batches; each batch cleans, "
    "quality-gates, and near-dup-dedups against the PERSISTENT shingle "
    "inverted-index state (cross-batch — a paraphrased re-send of any "
    "earlier survivor is dropped; exact pair recall at any SF, r6), then "
    "appends split-partitioned survivors. The oracle unrolls the "
    "per-batch greedy policy into chained SQL CTEs over the exact "
    "Jaccard pair set, pinning the stateful streaming semantics "
    "relationally — not just a rows-only check. Scale: per batch the "
    "shingle fold is map-side, the candidate join's right side is the "
    "batch, document bodies are never re-read (the corpus contributes a "
    "columnar (doc, sh) state scan); state grows by survivors' shingles.",
    tags=("ext", "bench2"),
)
def q_streaming_neardup_prep(spark: SparkSession, sf: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import time

    from .ext.prep import run_streaming_neardup_prep

    docs = read_sf_table(spark, sf, "documents")
    n_docs = docs.count()
    base = tempfile.mkdtemp(prefix="stream_neardup_")
    # the returned DataFrame lazily reads out_dir, so the workdir can't
    # be deleted here — reclaim it at interpreter exit instead of
    # leaking a corpus copy per invocation (parity sweeps, bench runs)
    import atexit

    atexit.register(shutil.rmtree, base, True)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    bcol = F.least(
        F.lit(2), F.floor(F.col("doc_id") * 3.0 / n_docs)
    ).cast("int")
    staged = docs.withColumn("__b", bcol)
    # one file per micro-batch, replayed in id order — the keep-min-id
    # ordering contract of minhash_dedup_incremental
    _stage_bucketed_batches(base, in_dir, staged, 3)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = os.path.join(base, "out")
    run_streaming_neardup_prep(
        spark,
        stream,
        out_dir,
        os.path.join(base, "state"),
        os.path.join(base, "ckpt"),
        # availableNow terminates on drain; the margin only matters when
        # a loaded box slows batches (a tight cap truncates the drain
        # and reads as a parity mismatch)
        timeout_sec=600.0,
    )
    return spark.read.parquet(out_dir).select(
        "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"), "split"
    )


@register(
    "streaming_state_pipeline",
    """
    -- pipeline.run_streaming (the whole reference program as ONE
    -- Structured Streaming job) restated relationally: events arrive as
    -- 3 contiguous-event_id micro-batches of (user_id, ts, event_type)
    -- entities; per batch the engine keeps the latest row per user
    -- (O15), emits users whose content CHANGED vs the persisted
    -- content-hash state (O5 — hash ignores ts), sinks the projected
    -- batch bodies (O6-O11), then MERGEs all seen users back into state
    -- with refreshed TTL (O12/O13). Content = (user_id, event_type), so
    -- state's stored copy for user u before batch b is u's latest type
    -- in the most recent EARLIER batch containing u — exactly
    -- lag(event_type) over the user's batch sequence; a user emits when
    -- that lag is absent (first sight) or differs (real change).
    WITH ev AS (
      SELECT event_id, user_id, ts, event_type,
             least(2, CAST(floor(event_id * 3.0 /
                   (SELECT count(*) FROM events)) AS INT)) AS b
      FROM events
    ),
    -- (b, user, ts) collapsed to max-event_id BEFORE keep-latest: the
    -- engine's keep_latest_per_key is tie-arbitrary on equal ts, so the
    -- staged stream is de-tied upstream (same dedup both sides)
    ded AS (
      SELECT b, user_id, ts, event_type FROM (
        SELECT *, row_number() OVER (PARTITION BY b, user_id, ts
                                     ORDER BY event_id DESC) AS dr
        FROM ev)
      WHERE dr = 1
    ),
    latest AS (
      SELECT b, user_id, event_type FROM (
        SELECT *, row_number() OVER (PARTITION BY b, user_id
                                     ORDER BY ts DESC) AS rn
        FROM ded)
      WHERE rn = 1
    ),
    seq AS (
      SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY b)
               AS prev_type
      FROM latest
    )
    SELECT CAST(b AS INT) AS b, user_id AS id, event_type AS type
    FROM seq
    WHERE prev_type IS NULL OR prev_type <> event_type
    """,
    doc="O12/O13 state pipeline end-to-end under Structured Streaming "
    "(pipeline.run_streaming): 3 file-source micro-batches drive "
    "keep-latest -> changed-rows vs persisted content-hash state -> "
    "projection/batch-body sink -> MERGE upsert with TTL refresh; the "
    "emitted bodies are read back and the oracle unrolls the stateful "
    "per-batch transition with a lag over each user's batch sequence — "
    "pinning the cross-batch suppression semantics relationally (the "
    "streaming twin of pipeline_incremental_run, and the second "
    "oracle-paired streaming e2e after streaming_neardup_prep).",
    tags=("reference", "bench2"),
)
def q_streaming_state_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile
    import time

    from .model import EngineConfig, TableSpec
    from .pipeline import run_streaming

    events = read_sf_table(spark, sf, "events")
    n_events = events.count()
    base = tempfile.mkdtemp(prefix="stream_state_")
    # the returned DataFrame lazily reads emit_dir — reclaim at exit
    atexit.register(shutil.rmtree, base, True)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    from pyspark.sql import Window as W

    entity = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.least(F.lit(2), F.floor(F.col("event_id") * 3.0 / n_events))
        .cast("int")
        .alias("__b"),
    )
    # de-tie (batch, user, ts) on max event_id before staging: the
    # engine's keep-latest is tie-arbitrary on equal ts, and both this
    # staging and the oracle apply the identical collapse
    dw = W.partitionBy("__b", "user_id", "ts").orderBy(
        F.col("event_id").desc()
    )
    entity = (
        entity.withColumn("__dr", F.row_number().over(dw))
        .filter(F.col("__dr") == 1)
        .drop("__dr", "event_id")
    )
    # one file per micro-batch, replayed in event-time order
    _stage_bucketed_batches(base, in_dir, entity, 3)
    stream = (
        spark.readStream.schema(entity.drop("__b").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    emit_dir = os.path.join(base, "emit")

    def sink(bodies: DataFrame, batch_id: int) -> None:
        # labeled with the STREAM's batch id (2-arg sink contract) — a
        # caller-side counter would desynchronize if an empty micro-batch
        # ever skipped the sink
        bodies.withColumn("b", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(emit_dir)

    run_streaming(
        spark,
        TableSpec(name="entities", id_field="user_id", ts_field="ts"),
        stream,
        [
            {"target": "id", "source": "user_id"},
            {"target": "type", "source": "event_type"},
        ],
        EngineConfig(state_dir=os.path.join(base, "state")),
        sink,
        os.path.join(base, "ckpt"),
        timeout_sec=600.0,  # drain margin under load (availableNow exits early)
        now_epoch_ms=1_700_000_000_000,
    )
    item = "array<struct<id:bigint,type:string>>"
    return (
        spark.read.parquet(emit_dir)
        .select("b", F.explode(F.from_json("body", item)).alias("e"))
        .select(
            F.col("b").cast("int").alias("b"),
            F.col("e.id").alias("id"),
            F.col("e.type").alias("type"),
        )
    )


@register(
    "streaming_ttl_expiry",
    """
    -- run_streaming with an ADVANCING per-batch clock (now_fn): 5
    -- micro-batches, one simulated hour apart, TTL 1.5 h. A state entry
    -- written at batch b' is purged by the merge at the first batch m
    -- with (m - b') > 1.5 — so at batch b the loaded state (saved after
    -- batch b-1's merge) holds only users last seen at b-1 or b-2. The
    -- emit rule the engine must reproduce: a user emits when first
    -- seen, when its content changed, OR when its last sighting is >= 3
    -- batches back (suppression state EXPIRED — same content re-emits).
    -- Presence follows the deterministic (user*7 + b*3) % 10 < 4
    -- pattern so per-user gap lengths of 1..4 all occur in the data.
    WITH ev AS (
      SELECT event_id, user_id, ts, event_type,
             least(4, CAST(floor(event_id * 5.0 /
                   (SELECT count(*) FROM events)) AS INT)) AS b
      FROM events
    ),
    flt AS (
      SELECT * FROM ev WHERE (user_id * 7 + b * 3) % 10 < 4
    ),
    -- de-tie (b, user, ts) on max event_id (same collapse as staging)
    ded AS (
      SELECT b, user_id, ts, event_type FROM (
        SELECT *, row_number() OVER (PARTITION BY b, user_id, ts
                                     ORDER BY event_id DESC) AS dr
        FROM flt)
      WHERE dr = 1
    ),
    latest AS (
      SELECT b, user_id, event_type FROM (
        SELECT *, row_number() OVER (PARTITION BY b, user_id
                                     ORDER BY ts DESC) AS rn
        FROM ded)
      WHERE rn = 1
    ),
    seq AS (
      SELECT *,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY b)
               AS prev_type,
             lag(b) OVER (PARTITION BY user_id ORDER BY b) AS prev_b
      FROM latest
    )
    SELECT CAST(b AS INT) AS b, user_id AS id, event_type AS type
    FROM seq
    WHERE prev_b IS NULL OR b - prev_b >= 3 OR event_type <> prev_type
    """,
    doc="O13 TTL EXPIRY under Structured Streaming, deterministically: "
    "run_streaming(now_fn=) advances the merge clock one simulated hour "
    "per micro-batch against a 1.5 h TTL, so suppression state for a "
    "user absent >= 3 batches is purged and an unchanged re-send emits "
    "again — the cross-batch twin of the batch-mode ttl_expiry query. "
    "The oracle derives the purge horizon relationally from each "
    "user's batch-sighting lag. Sibling of streaming_state_pipeline "
    "(which pins the no-expiry upsert semantics with a fixed clock).",
    tags=("reference",),
)
def q_streaming_ttl_expiry(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile
    import time

    from .model import EngineConfig, TableSpec
    from .pipeline import run_streaming

    events = read_sf_table(spark, sf, "events")
    n_events = events.count()
    base = tempfile.mkdtemp(prefix="stream_ttl_")
    atexit.register(shutil.rmtree, base, True)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    n_batches = 5
    bcol = (
        F.least(
            F.lit(n_batches - 1),
            F.floor(F.col("event_id") * float(n_batches) / n_events),
        )
        .cast("int")
        .alias("__b")
    )
    from pyspark.sql import Window as W

    entity = (
        events.select("user_id", "ts", "event_type", "event_id")
        .withColumn("__b", bcol)
        # deterministic sparse presence: users drop in and out so gap
        # lengths 1..4 (suppression vs expiry regimes) all occur
        .filter((F.col("user_id") * 7 + F.col("__b") * 3) % 10 < 4)
    )
    # de-tie (batch, user, ts) on max event_id before staging (the
    # engine's keep-latest is tie-arbitrary on equal ts; oracle mirrors)
    dw = W.partitionBy("__b", "user_id", "ts").orderBy(
        F.col("event_id").desc()
    )
    entity = (
        entity.withColumn("__dr", F.row_number().over(dw))
        .filter(F.col("__dr") == 1)
        .drop("__dr", "event_id")
    )
    _stage_bucketed_batches(base, in_dir, entity, n_batches)
    stream = (
        spark.readStream.schema(entity.drop("__b").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    emit_dir = os.path.join(base, "emit")

    def sink(bodies: DataFrame, batch_id: int) -> None:
        # labeled with the STREAM's batch id (2-arg sink contract) — a
        # caller-side counter would desynchronize if an empty micro-batch
        # ever skipped the sink
        bodies.withColumn("b", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(emit_dir)

    hour_ms = 3_600_000
    run_streaming(
        spark,
        TableSpec(name="entities", id_field="user_id", ts_field="ts"),
        stream,
        [
            {"target": "id", "source": "user_id"},
            {"target": "type", "source": "event_type"},
        ],
        EngineConfig(state_dir=os.path.join(base, "state"),
                     state_ttl_hours=1.5),
        sink,
        os.path.join(base, "ckpt"),
        timeout_sec=600.0,  # drain margin under load (availableNow exits early)
        now_fn=lambda b: 1_700_000_000_000 + b * hour_ms,
    )
    item = "array<struct<id:bigint,type:string>>"
    return (
        spark.read.parquet(emit_dir)
        .select("b", F.explode(F.from_json("body", item)).alias("e"))
        .select(
            F.col("b").cast("int").alias("b"),
            F.col("e.id").alias("id"),
            F.col("e.type").alias("type"),
        )
    )


def _stage_ts_ordered_batches(
    spark: SparkSession,
    df: DataFrame,
    base: str,
    n_batches: int,
    extra_files: list[tuple[str, DataFrame]] | None = None,
):
    """Write ``df`` as ``n_batches`` event-time-CONTIGUOUS parquet files
    with ascending mtimes (one file = one micro-batch under
    ``maxFilesPerTrigger=1``), returning (in_dir, schema).

    Harness-only arrival simulation: batch k holds the k-th tercile of
    the [min ts, max ts] span, so a later batch never carries an earlier
    event time — files replay the way a real time-ordered feed arrives,
    and a watermark delay exceeding zero drops nothing. The min/max
    comes from one aggregate (no global sort; the real deployment reads
    an already-arriving stream and stages nothing). ``extra_files``
    appends sentinel batches after the real ones (e.g. a far-future
    watermark flush for outer-join null completion)."""
    import os
    import shutil
    import time

    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    # ts may be TIMESTAMP_NTZ (the testdata's type), which Spark 4 refuses
    # to cast straight to double; route through timestamp_ltz — any
    # monotonic numeric image of ts works for tercile bucketing.
    ts_num = F.col("ts").cast("timestamp_ltz").cast("double")
    mn, mx = df.agg(F.min(ts_num), F.max(ts_num)).first()
    span = (mx - mn) + 1e-6
    staged = df.withColumn(
        "__b",
        F.least(
            F.lit(n_batches - 1),
            F.floor((ts_num - mn) * n_batches / span),
        ).cast("int"),
    )
    parts = [
        (f"b{b}.parquet", staged.filter(F.col("__b") == b).drop("__b"))
        for b in range(n_batches)
    ]
    parts += list(extra_files or [])
    for i, (fname, part_df) in enumerate(parts):
        stage_dir = os.path.join(base, f"stage_{fname}")
        part_df.coalesce(1).write.parquet(stage_dir)
        src = next(
            f for f in os.listdir(stage_dir) if f.endswith(".parquet")
        )
        dst = os.path.join(in_dir, fname)
        shutil.move(os.path.join(stage_dir, src), dst)
        os.utime(dst, (time.time() - (len(parts) - i) * 100,) * 2)
    return in_dir, df.schema


def _stage_bucketed_batches(
    base: str, in_dir: str, staged: DataFrame, n_batches: int
) -> None:
    """Write a df carrying an int ``__b`` bucket column as one parquet
    file per bucket into ``in_dir``, with ascending mtimes so the file
    source (``maxFilesPerTrigger=1``) replays buckets in order. The
    shared mechanics of every micro-batch staging harness; callers own
    the bucketing rule (doc-id terciles, event-id terciles, ...)."""
    import os
    import shutil
    import time

    for b in range(n_batches):
        stage_dir = os.path.join(base, f"stage{b}")
        (
            staged.filter(F.col("__b") == b)
            .drop("__b")
            .coalesce(1)
            .write.parquet(stage_dir)
        )
        src = next(f for f in os.listdir(stage_dir) if f.endswith(".parquet"))
        dst = os.path.join(in_dir, f"b{b}.parquet")
        shutil.move(os.path.join(stage_dir, src), dst)
        os.utime(dst, (time.time() - (n_batches - b) * 100,) * 2)


@register(
    "streaming_stream_join",
    """
    -- Stream-stream INNER interval join (purchase attribution): each
    -- purchase joined to every view by the same user within the 30
    -- minutes before it. Inner-join emission under append mode is
    -- micro-batch-invariant (a match emits in the batch that completes
    -- it), and the staged batches are event-time-contiguous with a 2 h
    -- watermark, so state eviction can never race a qualifying match:
    -- a view is evicted only once the watermark passes view_ts + 30
    -- min, and every event in later batches is >= 2 h past that
    -- watermark. The streamed result therefore equals this plain join.
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id AS user_id, v.ts AS view_ts, p.ts AS purchase_ts
    FROM events v JOIN events p
      ON p.user_id = v.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    doc="Stream-stream inner join with watermarks on BOTH sides and a "
    "time-interval condition (SURVEY 2.2 streaming row), end-to-end "
    "under Structured Streaming: view/purchase events arrive as 3 "
    "event-time-ordered file micro-batches; one file source is consumed "
    "by both join legs; join state is watermark-bounded exactly the way "
    "a 100 TB deployment would bound it (state per key ~ events in the "
    "last 2.5 h, independent of total history). Oracle = the equivalent "
    "batch interval join.",
    tags=("streaming",),
)
def q_streaming_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming import run_available_now

    events = read_sf_table(spark, sf, "events")
    # Watermarks demand TIMESTAMP (ltz); the testdata's ts is NTZ. Cast
    # on the way in, cast back at the output so values hash-match the
    # oracle's naive timestamps (ntz->ltz->ntz is identity at fixed
    # session tz).
    sides = events.filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    base = tempfile.mkdtemp(prefix="stream_join_")
    atexit.register(shutil.rmtree, base, True)
    in_dir, schema = _stage_ts_ordered_batches(spark, sides, base, 3)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
        "inner",
    ).select("view_id", "purchase_id", "user_id", "view_ts", "purchase_ts")
    emit_dir = os.path.join(base, "emit")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(emit_dir)

    run_available_now(
        joined, os.path.join(base, "ckpt"), sink, timeout_sec=600.0
    )
    out_schema = (
        "view_id bigint, purchase_id bigint, user_id bigint, "
        "view_ts timestamp, purchase_ts timestamp"
    )
    return spark.read.schema(out_schema).parquet(emit_dir).select(
        "view_id",
        "purchase_id",
        "user_id",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
    )


@register(
    "streaming_stream_join_outer",
    """
    -- Stream-stream LEFT OUTER interval join: every view, with its
    -- attributed purchase(s) within the following 30 minutes, or NULLs
    -- if none. Under append mode the NULL completion for an unmatched
    -- view emits only once the global watermark passes view_ts + 30
    -- min; the staged feed appends two far-future sentinel batches
    -- (one view-typed + one purchase-typed, so BOTH legs' watermarks
    -- advance past every real window under the min policy) to flush
    -- the tail, then the sentinels are filtered out of the result.
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id AS user_id, v.ts AS view_ts, p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = v.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    doc="Stream-stream LEFT OUTER join with watermarks on both sides "
    "(SURVEY 2.2 streaming row, outer-emission semantics): matched rows "
    "emit in the completing batch exactly like the inner join; "
    "unmatched views emit with NULLs only after state eviction, which "
    "the harness forces deterministically with far-future sentinel "
    "batches on BOTH legs (multipleWatermarkPolicy=min takes the "
    "minimum across inputs). At 100 TB the same plan holds: outer-join "
    "state is bounded by the watermark horizon, and the sentinel trick "
    "is exactly a production heartbeat topic. Oracle = the equivalent "
    "batch left interval join.",
    tags=("streaming",),
)
def q_streaming_stream_join_outer(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming import run_available_now

    events = read_sf_table(spark, sf, "events")
    sides = events.filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    base = tempfile.mkdtemp(prefix="stream_join_outer_")
    atexit.register(shutil.rmtree, base, True)

    # Two sentinel batches: the first advances both legs' watermarks
    # past every real view's 30-min window; the second triggers one
    # more micro-batch so the null completions evicted under the new
    # watermark actually emit (no reliance on a trailing no-data
    # batch). Distinct users and 100-day separation keep the sentinels
    # from joining each other; negative ids filter them out below.
    def sentinel(day_offset: int, eid: int, uid: int, etype: str):
        return events.agg(
            F.lit(eid).cast("long").alias("event_id"),
            F.lit(uid).cast("long").alias("user_id"),
            (
                F.max(F.col("ts").cast("timestamp"))
                + F.expr(f"INTERVAL {day_offset} DAYS")
            ).alias("ts"),
            F.lit(etype).alias("event_type"),
        )

    extra = [
        (
            "sentinel_a.parquet",
            sentinel(100, -1, -1, "view").unionByName(
                sentinel(100, -2, -2, "purchase")
            ),
        ),
        (
            "sentinel_b.parquet",
            sentinel(200, -3, -3, "view").unionByName(
                sentinel(200, -4, -4, "purchase")
            ),
        ),
    ]
    in_dir, schema = _stage_ts_ordered_batches(
        spark, sides, base, 3, extra_files=extra
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
        "left_outer",
    ).select("view_id", "purchase_id", "user_id", "view_ts", "purchase_ts")
    emit_dir = os.path.join(base, "emit")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(emit_dir)

    run_available_now(
        joined, os.path.join(base, "ckpt"), sink, timeout_sec=600.0
    )
    out_schema = (
        "view_id bigint, purchase_id bigint, user_id bigint, "
        "view_ts timestamp, purchase_ts timestamp"
    )
    return (
        spark.read.schema(out_schema)
        .parquet(emit_dir)
        .filter(F.col("view_id") >= 0)
        .select(
            "view_id",
            "purchase_id",
            "user_id",
            F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        )
    )


@register(
    "streaming_window_agg",
    """
    -- Tumbling 1-hour event-time windows per event_type, finalized
    -- under append mode: a window emits exactly once, when the
    -- watermark passes its end. The staged feed is event-time-ordered
    -- with a 2 h watermark delay, so no window can finalize before all
    -- its events arrive; two far-future sentinel batches flush the
    -- tail windows (watermark advances in the first, the second runs
    -- the batch that emits the evictions).
    SELECT strftime(date_trunc('hour', ts), '{fmt}') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """.format(fmt="%Y-%m-%d %H:%M:%S.%f"),
    doc="Watermarked tumbling-window aggregation under Structured "
    "Streaming, append mode (SURVEY 2.2 streaming row) — the canonical "
    "finalized-window rollup a 100 TB event pipeline runs: state per "
    "(window, type) cell, bounded by the watermark horizon, emitted "
    "exactly once. Oracle = the equivalent batch GROUP BY "
    "date_trunc('hour').",
    tags=("streaming",),
)
def q_streaming_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming import run_available_now

    events = read_sf_table(spark, sf, "events")
    sides = events.select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )

    def sentinel(day_offset: int):
        return events.agg(
            (
                F.max(F.col("ts").cast("timestamp"))
                + F.expr(f"INTERVAL {day_offset} DAYS")
            ).alias("ts"),
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
        )

    base = tempfile.mkdtemp(prefix="stream_winagg_")
    atexit.register(shutil.rmtree, base, True)
    in_dir, schema = _stage_ts_ordered_batches(
        spark,
        sides,
        base,
        3,
        extra_files=[
            ("sentinel_a.parquet", sentinel(100)),
            ("sentinel_b.parquet", sentinel(200)),
        ],
    )
    agg = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            _ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    emit_dir = os.path.join(base, "emit")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(emit_dir)

    run_available_now(agg, os.path.join(base, "ckpt"), sink, timeout_sec=600.0)
    out_schema = (
        "window_start string, event_type string, "
        "n_events bigint, total_value double"
    )
    return (
        spark.read.schema(out_schema)
        .parquet(emit_dir)
        .filter(F.col("event_type") != "__sentinel__")
    )


@register(
    "streaming_session_window",
    """
    -- Event-time session windows (30-min gap) per user under append
    -- mode: a session emits once, when the watermark passes its end
    -- (last event + gap). Same staged time-ordered feed + sentinel
    -- flush as streaming_window_agg; oracle reconstructs sessions with
    -- the lag/cumsum islands technique (twin of the batch
    -- session_window_agg oracle).
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, new_s DESC
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '{fmt}') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess GROUP BY user_id, sid
    """.format(fmt="%Y-%m-%d %H:%M:%S.%f"),
    doc="Streaming session-window aggregation with watermark (SURVEY "
    "2.2 streaming row): Spark's dynamic session merge runs in the "
    "state store, sessions finalize exactly once in append mode. Must "
    "produce byte-identical sessions to the batch session_window_agg "
    "path — one semantics, two execution modes. Sessions spanning "
    "micro-batch boundaries merge correctly because the feed is "
    "event-time-ordered and the 2 h watermark far exceeds the 30-min "
    "gap.",
    tags=("streaming",),
)
def q_streaming_session_window(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming import run_available_now

    events = read_sf_table(spark, sf, "events")
    sides = events.select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
    )

    def sentinel(day_offset: int, uid: int):
        return events.agg(
            (
                F.max(F.col("ts").cast("timestamp"))
                + F.expr(f"INTERVAL {day_offset} DAYS")
            ).alias("ts"),
            F.lit(uid).cast("long").alias("user_id"),
            F.lit(0.0).alias("value"),
        )

    base = tempfile.mkdtemp(prefix="stream_sesswin_")
    atexit.register(shutil.rmtree, base, True)
    in_dir, schema = _stage_ts_ordered_batches(
        spark,
        sides,
        base,
        3,
        extra_files=[
            ("sentinel_a.parquet", sentinel(100, -1)),
            ("sentinel_b.parquet", sentinel(200, -2)),
        ],
    )
    agg = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(
            F.col("user_id"),
            F.session_window("ts", "30 minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            _ts_str(F.col("w.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )
    emit_dir = os.path.join(base, "emit")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(emit_dir)

    run_available_now(agg, os.path.join(base, "ckpt"), sink, timeout_sec=600.0)
    out_schema = (
        "user_id bigint, session_start string, "
        "n_events bigint, total_value double"
    )
    return (
        spark.read.schema(out_schema)
        .parquet(emit_dir)
        .filter(F.col("user_id") >= 0)
    )


@register(
    "small_quantity_revenue",
    """
    SELECT p.p_brand,
           round(sum(l.l_extendedprice) / 7.0, 2) AS avg_weekly_revenue,
           CAST(count(*) AS BIGINT) AS n_small_orders
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY p.p_brand
    """,
    doc="TPC-H Q17-shaped correlated aggregate: revenue from orders below "
    "half the part's average quantity. The correlated scalar subquery "
    "decorrelates into one per-part aggregate joined back (Catalyst "
    "RewriteCorrelatedScalarSubquery) — per-part stats partial-aggregate "
    "map-side; no per-row re-scan ever happens at any scale.",
    tags=("core",),
)
def q_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    part = read_sf_table(spark, sf, "part")
    li.createOrReplaceTempView("__li_q17")
    part.createOrReplaceTempView("__part_q17")
    return spark.sql(
        """
        SELECT p.p_brand,
               round(sum(l.l_extendedprice) / 7.0, 2) AS avg_weekly_revenue,
               CAST(count(*) AS BIGINT) AS n_small_orders
        FROM __li_q17 l
        JOIN __part_q17 p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity)
          FROM __li_q17 l2 WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY p.p_brand
        """
    )


@register(
    "distributed_running_total",
    """
    SELECT event_id,
           round(sum(value) OVER (ORDER BY event_id), 4) AS running_total
    FROM events
    """,
    doc="Distributed prefix-sum (operators.distributed_cumsum): global "
    "running total computed as range-bucketed local cumsums + broadcast "
    "bucket offsets — the widest exchange spreads over 64 reducers where "
    "the naive Window.orderBy funnels 100 TB through ONE task. Oracle is "
    "the naive global window, pinning row-for-row equality.",
    tags=("ext",),
)
def q_distributed_running_total(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import distributed_cumsum

    ev = read_sf_table(spark, sf, "events")
    out = distributed_cumsum(ev, "event_id", "value", n_buckets=64)
    return out.select(
        "event_id", F.round("running_total", 4).alias("running_total")
    )


@register(
    "interpolate_daily_gaps",
    """
    WITH spine AS (
      SELECT et.event_type, s.s AS day
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN generate_series(TIMESTAMP '2024-01-01',
                                 TIMESTAMP '2024-01-30',
                                 INTERVAL 1 DAY) AS s(s)
    ),
    daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             sum(value) AS total
      FROM events WHERE value > 95 GROUP BY 1, 2
    ),
    grid AS (
      SELECT spine.event_type,
             datediff('day', TIMESTAMP '2024-01-01', spine.day) AS day_num,
             strftime(spine.day, '%Y-%m-%d') AS day,
             daily.total
      FROM spine LEFT JOIN daily
        ON spine.event_type = daily.event_type AND spine.day = daily.day
    ),
    filled AS (
      SELECT event_type, day_num, day, total,
             last_value(total IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN total IS NOT NULL THEN day_num END
                        IGNORE NULLS) OVER wb AS pt,
             first_value(total IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN total IS NOT NULL THEN day_num END
                         IGNORE NULLS) OVER wf AS nt
      FROM grid
      WINDOW wb AS (PARTITION BY event_type ORDER BY day_num
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY day_num
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, day,
           round(CASE
             WHEN total IS NOT NULL THEN total
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (day_num - pt) / (nt - pt)
           END, 4) AS total_filled,
           (total IS NULL) AS was_gap
    FROM filled
    """,
    doc="Linear gap interpolation (operators.interpolate_linear) over a "
    "per-key date spine: running-last/running-first ignorenulls frames "
    "share ONE (key, t) sort — single Exchange, codegen arithmetic; edge "
    "gaps clamp to the nearest value.",
    tags=("ext",),
)
def q_interpolate_daily_gaps(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import interpolate_linear

    ev = read_sf_table(spark, sf, "events")
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(1).select(
                F.explode(
                    F.sequence(
                        F.lit("2024-01-01").cast("timestamp"),
                        F.lit("2024-01-30").cast("timestamp"),
                        F.expr("INTERVAL 1 DAY"),
                    )
                ).alias("day")
            )
        )
    )
    daily = (
        ev.filter(F.col("value") > 95)
        .groupBy(
            F.col("event_type").alias("et2"),
            F.date_trunc("day", "ts").alias("d2"),
        )
        .agg(F.sum("value").alias("total"))
    )
    grid = spine.join(
        daily,
        (spine.event_type == daily.et2) & (spine.day == daily.d2),
        "left",
    ).select(
        "event_type",
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")).alias(
            "day_num"
        ),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "total",
    )
    out = interpolate_linear(
        grid, ["event_type"], "day_num", "total", out_col="total_filled"
    )
    return out.select(
        "event_type",
        "day",
        F.round("total_filled", 4).alias("total_filled"),
        F.col("total").isNull().alias("was_gap"),
    )


@register(
    "robust_outlier_values",
    """
    WITH med AS (
      SELECT event_type, median(value) AS m FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, median(abs(e.value - med.m)) AS d
      FROM events e JOIN med USING (event_type) GROUP BY e.event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN mad.d > 0
                          AND abs(e.value - med.m) / mad.d > 2.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(min(med.m), 4) AS med,
           round(min(mad.d), 4) AS mad
    FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
    GROUP BY e.event_type
    """,
    doc="Robust median/MAD outlier gate (operators.robust_outliers): "
    "survives heavy tails where mean/stddev z-scores self-destruct. Two "
    "exact-percentile passes (MAD needs the median first), both stat "
    "tables broadcast back; percentile_approx is the 100 TB swap-in.",
    tags=("ext",),
)
def q_robust_outlier_values(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import robust_outliers

    ev = read_sf_table(spark, sf, "events")
    flagged = robust_outliers(ev, "value", ["event_type"], z=2.5)
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("__m")
    )
    with_m = ev.join(F.broadcast(med), "event_type")
    mad = with_m.groupBy("event_type").agg(
        F.expr("percentile(abs(value - __m), 0.5)").alias("__d")
    )
    return (
        flagged.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("is_outlier").cast("long")).cast("bigint").alias(
                "n_outliers"
            ),
            F.round(F.min("__m"), 4).alias("med"),
            F.round(F.min("__d"), 4).alias("mad"),
        )
    )


@register(
    "weighted_sample_docs",
    """
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ln(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     ::UBIGINT AS DOUBLE) / 4294967296.0) / n_chars AS k
      FROM documents WHERE n_chars > 0
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM (SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY k DESC, doc_id) AS rn
          FROM keyed)
    WHERE rn <= 5
    """,
    doc="Deterministic weighted sampling without replacement, 5 docs per "
    "source weighted by length (ext/sampling.weighted_sample_per_group, "
    "Efraimidis-Spirakis A-ES with an md5-derived uniform): no RNG state, "
    "identical selection on any cluster layout; the oracle replays the "
    "exact arithmetic.",
    tags=("ext",),
)
def q_weighted_sample_docs(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.sampling import weighted_sample_per_group

    docs = read_sf_table(spark, sf, "documents")
    return weighted_sample_per_group(
        docs, "source", "doc_id", "n_chars", 5
    ).select("source", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))


@register(
    "source_kl_divergence",
    """
    WITH toks AS (
      SELECT source, lower(t.tok) AS tok
      FROM documents,
           UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    st AS (SELECT source, tok, count(*) AS c_st FROM toks GROUP BY 1, 2),
    tt AS (SELECT tok, count(*) AS c_t FROM toks GROUP BY 1),
    s_tot AS (SELECT source, count(*) AS n_s FROM toks GROUP BY 1),
    g_tot AS (SELECT count(*) AS n_g FROM toks)
    SELECT st.source,
           CAST(max(s_tot.n_s) AS BIGINT) AS n_tokens,
           round(sum((c_st / n_s) * ln((c_st / n_s) / (c_t / n_g))), 4)
             AS kl_vs_corpus
    FROM st JOIN tt USING (tok) JOIN s_tot USING (source) CROSS JOIN g_tot
    GROUP BY st.source
    """,
    doc="Per-source KL divergence vs the corpus token distribution "
    "(ext/lm.source_kl_divergence) — the mixture-design diagnostic. One "
    "tokenize scan, two map-side-combined aggregations, margins joined "
    "token-keyed, totals broadcast; ln/arith in codegen.",
    tags=("ext",),
)
def q_source_kl_divergence(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.lm import source_kl_divergence

    docs = read_sf_table(spark, sf, "documents")
    return source_kl_divergence(docs)


@register(
    "funnel_conversion",
    f"""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.t1
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM t1) AS BIGINT) AS n_viewed,
           CAST((SELECT count(*) FROM t2) AS BIGINT) AS n_clicked,
           CAST((SELECT count(*) FROM t3) AS BIGINT) AS n_purchased,
           round(CAST((SELECT count(*) FROM t3) AS DOUBLE)
                 / (SELECT count(*) FROM t1), 4) AS view_to_purchase
    """,
    doc="Ordered event funnel (view -> click-after -> purchase-after): "
    "three stage aggregations all keyed user_id — one logical shuffle key, "
    "co-partitioned joins reuse the exchange; no window over the full "
    "event stream. The conversion-analysis staple.",
    tags=("analytics",),
)
def q_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.join(t1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.join(t2, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1, n2, n3 = t1.count(), t2.count(), t3.count()
    return spark.createDataFrame(
        [(n1, n2, n3, round(n3 / n1, 4))],
        "n_viewed bigint, n_clicked bigint, n_purchased bigint, "
        "view_to_purchase double",
    )


@register(
    "retention_cohorts",
    """
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', f.cohort, a.w) / 7 AS INT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM first_seen f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Retention cohort matrix: cohort = first-seen week, one row per "
    "(cohort, week offset) with active-user counts. Both aggregations key "
    "on user_id (shared shuffle); the distinct collapses activity to "
    "(user, week) pairs before the join — no event-grain join ever.",
    tags=("analytics",),
)
def q_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


@register(
    "vocab_coverage",
    """
    WITH toks AS (
      SELECT lower(t.tok) AS tok
      FROM documents,
           UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    tc AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    ranked AS (
      SELECT c,
             row_number() OVER (ORDER BY c DESC, tok) AS rn,
             sum(c) OVER (ORDER BY c DESC, tok) AS cum
      FROM tc
    ),
    tot AS (SELECT sum(c) AS t, count(*) AS v FROM tc)
    SELECT CAST(t AS BIGINT) AS total_tokens,
           CAST(v AS BIGINT) AS vocab_size,
           CAST((SELECT min(rn) FROM ranked WHERE cum >= 0.9 * t)
                AS BIGINT) AS vocab_for_90pct
    FROM tot
    """,
    doc="Vocabulary coverage curve (tokenizer-design diagnostic): rank "
    "tokens by frequency, cumulative share, smallest vocab reaching 90% "
    "token coverage. The corpus-sized work is ONE map-side-combined "
    "count; the ranked cumsum runs over the vocabulary (bounded, orders "
    "of magnitude smaller than the corpus — distributed_cumsum is the "
    "swap-in if a vocabulary ever outgrows one reducer).",
    tags=("ext",),
)
def q_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.trim(F.col("text"))), "\\s+"),
                     lambda t: t != "")
        ).alias("tok")
    )
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.desc("c"), F.col("tok"))
    ranked = tc.select(
        "c",
        F.row_number().over(w).alias("rn"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    tot = tc.agg(
        F.sum("c").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    ).first()
    v90 = (
        ranked.filter(F.col("cum") >= 0.9 * tot["t"])
        .agg(F.min("rn").cast("bigint"))
        .first()[0]
    )
    return spark.createDataFrame(
        [(tot["t"], tot["v"], v90)],
        "total_tokens bigint, vocab_size bigint, vocab_for_90pct bigint",
    )


@register(
    "cdc_apply_tombstones",
    f"""
    WITH state AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ),
    latest AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value
      FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts > TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT COALESCE(s.user_id, l.user_id) AS user_id,
           round(CASE WHEN l.op IS NOT NULL THEN l.value
                      ELSE s.value END, 6) AS value
    FROM state s FULL OUTER JOIN latest l ON s.user_id = l.user_id
    WHERE l.op IS NULL OR l.op <> 'D'
    """,
    doc="CDC apply with delete tombstones (state.apply_cdc): the reference "
    "cache can only upsert/expire (cache.js:50-67); a CDC feed carries "
    "explicit deletes TTL can't express. Latest change per key wins "
    "(WindowGroupLimit prunes map-side), a final D removes the key, the "
    "state side joins on its own key (bucket-able). Here: post-cutoff "
    "events as the feed, 'error' mapped to D.",
    tags=("ext",),
)
def q_cdc_apply_tombstones(spark: SparkSession, sf: str) -> DataFrame:
    from .state import apply_cdc

    ev = read_sf_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    state = (
        ev.filter(F.col("ts") <= F.lit(CUTOFF).cast("timestamp"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "value")
    )
    changes = ev.filter(F.col("ts") > F.lit(CUTOFF).cast("timestamp")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
    )
    nxt = apply_cdc(
        state, changes, "user_id", "ts", tiebreak="event_id",
        payload_cols=["value"],
    )
    return nxt.select("user_id", F.round("value", 6).alias("value"))


@register(
    "event_type_cooccurrence",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n_users AS (SELECT count(DISTINCT user_id) AS n FROM events),
    singles AS (SELECT event_type, count(*) AS c FROM ut GROUP BY event_type)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_both,
           round(count(*) / min(n_users.n), 4) AS support,
           round(CAST(count(*) AS DOUBLE) * min(n_users.n)
                 / (min(sa.c) * min(sb.c)), 4) AS lift
    FROM ut a
    JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    JOIN singles sa ON sa.event_type = a.event_type
    JOIN singles sb ON sb.event_type = b.event_type
    CROSS JOIN n_users
    GROUP BY a.event_type, b.event_type
    """,
    doc="Co-occurrence / frequent-pair mining over user baskets: collapse "
    "to DISTINCT (user, type) first — the self-join then multiplies only "
    "basket sizes (bounded by the type vocabulary), never raw event "
    "counts; support and lift from broadcast singletons. The pair "
    "explode routes through ext.graph.within_group_pairs so "
    "max_basket_size can cap whale users (registry runs uncapped).",
    tags=("analytics",),
)
def q_event_type_cooccurrence(
    spark: SparkSession,
    sf: str,
    *,
    max_basket_size: int | None = None,
    observation=None,
) -> DataFrame:
    from .ext.graph import within_group_pairs

    ev = read_sf_table(spark, sf, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ev.select(F.countDistinct("user_id").alias("n"))
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("c").alias("ca")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("c").alias("cb")
    )
    return (
        within_group_pairs(
            ut,
            "user_id",
            "event_type",
            item_a="type_a",
            item_b="type_b",
            max_group_size=max_basket_size,
            observation=observation,
            dropped_metric="etc_rows_in_dropped_users",
            max_metric="etc_max_user_types",
        )
        .join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_both"),
            F.round(F.count(F.lit(1)) / F.min("n"), 4).alias("support"),
            F.round(
                F.count(F.lit(1)).cast("double")
                * F.min("n")
                / (F.min("ca") * F.min("cb")),
                4,
            ).alias("lift"),
        )
        .select("type_a", "type_b", "n_both", "support", "lift")
    )


# ---------------------------------------------------------------------------
# TPC-H decision-support shapes (round 2 continued): outer-join count
# distributions, agg-view scalar subqueries, distinct-count rollups with
# anti-join exclusions, global-threshold anti-join aggregates — the
# Catalyst patterns (decorrelation, null-preserving outer agg, broadcast
# scalar) a migrating analytics user exercises daily.
# ---------------------------------------------------------------------------


@register(
    "q13_custdist",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: customer order-count distribution via a "
    "null-preserving left outer join (customers with zero orders must "
    "surface as c_count=0) + two-level aggregation. The second agg's "
    "domain is tiny (distinct counts), so the heavy shuffle is only the "
    "custkey join — AQE coalesces the rest.",
    tags=("analytics",),
)
def q_q13_custdist(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_sf_table(spark, sf, "customer")
    orders = read_sf_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q15_top_supplier",
    """
    -- MATERIALIZED: the CTE is referenced twice (join + scalar max);
    -- without it DuckDB re-evaluates the parallel double sum in a
    -- different row order per reference, and at sf1 the two evaluations
    -- of a supplier's revenue can differ at the ulp — the equality then
    -- matches nothing (observed: intermittent 0 rows). One evaluation
    -- makes the within-engine comparison deterministic again.
    WITH revenue AS MATERIALIZED (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 2) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: top supplier by revenue — a scalar subquery over "
    "a derived aggregate view. Catalyst evaluates the 1-row max as a "
    "broadcast subquery; the view is aggregated once (reused, not "
    "recomputed per row). Within-engine double comparison, so summation "
    "order differences between engines cannot flip the winner.",
    tags=("analytics",),
)
def q_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    sup = read_sf_table(spark, sf, "supplier")
    li.createOrReplaceTempView("q15_lineitem")
    sup.createOrReplaceTempView("q15_supplier")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(l_extendedprice * (1 - l_discount)) AS total_revenue
          FROM q15_lineitem GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name,
               round(r.total_revenue, 2) AS total_revenue
        FROM q15_supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        """
    )


@register(
    "q16_part_supplier_variety",
    """
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'ECONOMY%'
      AND p.p_size IN (5, 11, 17, 23, 29)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (lineitem's (partkey,suppkey) pairs stand in for "
    "partsupp): supplier variety per part segment, excluding flagged "
    "suppliers via NOT IN -> left-anti against a broadcast-sized dim. "
    "distinct-before-join shrinks the fact side; part + supplier both "
    "broadcast at every scale where they fit (they are dims).",
    tags=("analytics",),
)
def q_q16_part_supplier_variety(spark: SparkSession, sf: str) -> DataFrame:
    ps = (
        read_sf_table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = read_sf_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("ECONOMY%"))
        & (F.col("p_size").isin(5, 11, 17, 23, 29))
    )
    bad = read_sf_table(spark, sf, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("bigint").alias("p_size"),
            "supplier_cnt",
        )
    )


@register(
    "q22_rich_idle_customers",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no urgent "
    "orders — a global scalar-average threshold (broadcast 1-row "
    "subquery; rounded to cents so both engines agree at the boundary) "
    "+ NOT EXISTS decorrelated into a left-anti join on custkey. (The "
    "anti-join side is pre-filtered to urgent orders so the result is "
    "non-empty at every SF — all testdata customers have some order.)",
    tags=("analytics",),
)
def q_q22_rich_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    cust = read_sf_table(spark, sf, "customer")
    orders = read_sf_table(spark, sf, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("__avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg_bal")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    idle = rich.join(
        urgent, rich.c_custkey == urgent.o_custkey, "left_anti"
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


@register(
    "hll_sketch_merge_daily",
    """
    SELECT event_type, true AS merged_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="Mergeable HLL sketch state (Datasketches HllSketch, Spark 4 "
    "built-ins): per-(event_type, day) hll_sketch_agg partials -> "
    "hll_union_agg rollup -> estimate vs the exact distinct count, "
    "asserted within 5%. THE incremental-distinct pattern at 100 TB: "
    "daily partials are tiny, persistable, and re-mergeable, so a "
    "90-day uniques rollup touches 90 sketch rows instead of 90 days "
    "of raw events (contrast: approx_distinct_users re-scans raw). "
    "Decidable oracle per VERDICT r1 item 2: the epsilon bound is the "
    "result, so DuckDB pins it relationally.",
    tags=("ext", "sketch"),
)
def q_hll_sketch_merge_daily(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("__day")
    ).agg(F.hll_sketch_agg("user_id").alias("__sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("__exact")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            (
                F.abs(F.col("__est") - F.col("__exact"))
                / F.col("__exact")
                <= 0.05
            ).alias("merged_within_5pct"),
        )
    )


@register(
    "lateral_top_orders",
    """
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
    ) l
    WHERE c.c_mktsegment = 'MACHINERY'
    """,
    doc="Correlated LATERAL join (Spark 3.2+ JOIN LATERAL): top-3 orders "
    "per customer as a correlated ordered-limit subquery. Catalyst "
    "decorrelates to a window rank over the custkey join — same physical "
    "shape as the explicit row_number form, declared relationally. "
    "Deterministic tie-break on o_orderkey keeps both engines aligned.",
    tags=("analytics",),
)
def q_lateral_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    read_sf_table(spark, sf, "customer").createOrReplaceTempView(
        "lat_customer"
    )
    read_sf_table(spark, sf, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM lat_customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) l
        WHERE c.c_mktsegment = 'MACHINERY'
        """
    )


@register(
    "timestamp_arithmetic_funcs",
    f"""
    SELECT event_id,
           strftime(ts + INTERVAL 90 MINUTE, '{DUCK_TS_FMT}') AS plus_90m,
           strftime(ts - INTERVAL 7 DAY, '{DUCK_TS_FMT}') AS minus_7d,
           (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
             // 3600000000 AS hours_since_t0,
           (epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY) - epoch_us(ts))
             // 60000000 AS minutes_to_midnight,
           strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start
    FROM events WHERE event_id < 3000
    """,
    doc="Timestamp arithmetic on TIMESTAMP_NTZ (post-tsutil coverage): "
    "interval add/subtract, timestampdiff in two units, week trunc — all "
    "field-space operations that stay tz-free on NTZ inputs (no epoch "
    "cast anywhere, so no session-tz hazard).",
    tags=("functions",),
)
def q_timestamp_arithmetic_funcs(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(F.col("event_id") < 3000)
    return ev.select(
        "event_id",
        _ts_str(F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("plus_90m"),
        _ts_str(F.col("ts") - F.expr("INTERVAL 7 DAY")).alias("minus_7d"),
        # elapsed-unit diffs in exact integer micros (floor division), NOT
        # timestampdiff: DuckDB's date_diff counts *boundary crossings*
        # while Spark's timestampdiff counts *complete units* — epoch-micros
        # floor division is the one semantic both engines state identically
        # floor (not truncate-toward-zero): the DuckDB oracle uses //, and
        # the two diverge for timestamps before t0 (negative diffs)
        F.floor(
            (
                tsutil.epoch_micros("ts")
                - F.lit(1704067200_000000)  # 2024-01-01T00:00 naive micros
            )
            / F.lit(3_600_000_000)
        )
        .cast("bigint")
        .alias("hours_since_t0"),
        F.floor(
            (
                tsutil.epoch_micros(
                    F.date_trunc("day", F.col("ts")) + F.expr("INTERVAL 1 DAY")
                )
                - tsutil.epoch_micros("ts")
            )
            / F.lit(60_000_000)
        )
        .cast("bigint")
        .alias("minutes_to_midnight"),
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias(
            "week_start"
        ),
    )


_PAGERANK_EDGE_SQL = """
    SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                    's' || CAST(l.l_suppkey AS VARCHAR) AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    UNION
    SELECT DISTINCT 's' || CAST(l.l_suppkey AS VARCHAR) AS src,
                    'c' || CAST(o.o_custkey AS VARCHAR) AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


@register(
    "pagerank_customer_supplier",
    f"""
    WITH edges AS ({_PAGERANK_EDGE_SQL}),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    n AS (SELECT count(DISTINCT src) AS n FROM edges),
    r0 AS (SELECT src AS node, 1.0 / n.n AS rank FROM deg, n),
    r1 AS (
      SELECT e.dst AS node,
             0.15 / min(n.n) + 0.85 * sum(r.rank / d.outdeg) AS rank
      FROM edges e JOIN r0 r ON e.src = r.node
                   JOIN deg d ON e.src = d.src, n
      GROUP BY e.dst),
    r2 AS (
      SELECT e.dst AS node,
             0.15 / min(n.n) + 0.85 * sum(r.rank / d.outdeg) AS rank
      FROM edges e JOIN r1 r ON e.src = r.node
                   JOIN deg d ON e.src = d.src, n
      GROUP BY e.dst),
    r3 AS (
      SELECT e.dst AS node,
             0.15 / min(n.n) + 0.85 * sum(r.rank / d.outdeg) AS rank
      FROM edges e JOIN r2 r ON e.src = r.node
                   JOIN deg d ON e.src = d.src, n
      GROUP BY e.dst)
    SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           round(sum(rank), 4) AS rank_mass,
           round(max(rank) * 1000, 4) AS max_rank_x1000
    FROM r3
    """,
    doc="Iterative PageRank (3 fixed power iterations, damping 0.85) over "
    "the customer<->supplier transaction graph — the iterative-algorithm "
    "pattern on DataFrames: each iteration is one hash join (edges x "
    "ranks, co-partitioned on the join key across iterations) + one "
    "aggregation; lineage grows linearly so long runs localCheckpoint "
    "every ~10 iters. Summary projection (mass + max) keeps the oracle "
    "float-stable; the oracle unrolls the same 3 iterations as CTEs. "
    "Symmetrized edges mean no dangling nodes.",
    tags=("ext", "graph"),
)
def q_pagerank_customer_supplier(spark: SparkSession, sf: str) -> DataFrame:
    orders = read_sf_table(spark, sf, "orders")
    li = read_sf_table(spark, sf, "lineitem")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.selectExpr("c AS src", "s AS dst").unionByName(
        pairs.selectExpr("s AS src", "c AS dst")
    )
    # one shuffle on src shared by degree + every iteration's join
    edges = edges.repartition("src").localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = deg.count()  # node count (symmetric edges: every node has outdeg)
    contrib_base = edges.join(deg, "src")  # (src, dst, outdeg)
    ranks = deg.select(
        F.col("src").alias("node"), (F.lit(1.0) / n).alias("rank")
    )
    for _ in range(3):
        ranks = (
            contrib_base.join(
                ranks, contrib_base.src == ranks.node
            )
            .groupBy("dst")
            .agg(
                (
                    F.lit(0.15) / n
                    + F.lit(0.85) * F.sum(F.col("rank") / F.col("outdeg"))
                ).alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
        )
    return ranks.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.round(F.sum("rank"), 4).alias("rank_mass"),
        F.round(F.max("rank") * 1000, 4).alias("max_rank_x1000"),
    )


@register(
    "video_frame_features",
    """
    SELECT vec_id,
           CAST(6 AS INT) AS n_frames,
           CAST(3 AS INT) AS n_sampled,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           round(list_sum(list_transform(embedding,
             x -> greatest(least(floor((CAST(x AS DOUBLE) + 1) / 2 * 255
                                       + 0.5), 255), 0)))
                 / len(embedding), 6) AS mean_sampled_pixel
    FROM embeddings
    """,
    doc="E5 video: embeddings -> VID0 frame containers (6 rotated 8x8 "
    "grayscale planes) -> real header parse + keyframe sampling (every "
    "2nd frame) + per-clip stats (ext/video.py). Map-only Arrow pass; "
    "blobs never shuffle. Frames differ byte-wise but rotation preserves "
    "the pixel population, so the oracle re-derives the sampled mean "
    "from the source floats through the exact byte quantization.",
    tags=("ext",),
)
def q_video_frame_features(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.video import sample_frame_features, synthesize_video

    emb = read_sf_table(spark, sf, "embeddings")
    return sample_frame_features(synthesize_video(emb))


@register(
    "sql_udf_funcs",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           round(sum(l_extendedprice * (1.0 - l_discount)
                     * (1.0 + l_tax)), 2) AS revenue_taxed
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Declarative SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN expr): "
    "business logic named once, inlined by Catalyst into the aggregate — "
    "zero call overhead, full codegen, pushdown-transparent; the "
    "scale-safe alternative to a Python UDF for pure expressions. The "
    "oracle states the same expressions inline (which is also exactly "
    "what the optimized plan contains).",
    tags=("functions",),
)
def q_sql_udf_funcs(spark: SparkSession, sf: str) -> DataFrame:
    read_sf_table(spark, sf, "lineitem").createOrReplaceTempView(
        "udf_lineitem"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION taxed(p DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(disc_price(l_extendedprice, l_discount)), 2)
                 AS revenue,
               round(sum(taxed(disc_price(l_extendedprice, l_discount),
                               l_tax)), 2) AS revenue_taxed
        FROM udf_lineitem GROUP BY l_returnflag
        """
    )


@register(
    "percentile_exact_funcs",
    """
    SELECT event_type,
           round(median(value), 6) AS med,
           round(quantile_cont(value, 0.25), 6) AS p25_cont,
           round(quantile_disc(value, 0.75), 6) AS p75_disc
    FROM events GROUP BY event_type
    """,
    doc="Exact percentile family (vs the approx sketch twin "
    "percentile_value_by_type): median + percentile_cont interpolation + "
    "percentile_disc (smallest value at cumulative rank >= p). Exact "
    "percentiles need a per-group sort — the approx sketch is the 100 TB "
    "path; this is the auditable oracle twin.",
    tags=("functions",),
)
def q_percentile_exact_funcs(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("median(value)"), 6).alias("med"),
        F.round(
            F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY value)"), 6
        ).alias("p25_cont"),
        F.round(
            F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)"), 6
        ).alias("p75_disc"),
    )


@register(
    "xml_roundtrip",
    """
    SELECT doc_id, lang AS xml_lang, source AS xml_source
    FROM documents WHERE doc_id < 2000
    """,
    doc="XML surface (Spark 4 to_xml/from_xml): serialize document "
    "metadata to XML, parse it back with an explicit schema, project the "
    "parsed struct — the schema-on-read pattern for XML feeds. The "
    "round trip is the oracle: parse(serialize(x)) == x.",
    tags=("functions",),
)
def q_xml_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents").filter(
        F.col("doc_id") < 2000
    )
    xml = docs.select(
        "doc_id",
        F.to_xml(
            F.struct("lang", "source"), {"rootTag": "meta"}
        ).alias("x"),
    )
    parsed = xml.select(
        "doc_id",
        F.from_xml(F.col("x"), "lang STRING, source STRING").alias("m"),
    )
    return parsed.select(
        "doc_id",
        F.col("m.lang").alias("xml_lang"),
        F.col("m.source").alias("xml_source"),
    )


@register(
    "collation_case_insensitive",
    """
    SELECT lower(p_type) AS p_type_ci, CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN p_brand = 'Brand#3' THEN 1 END) AS BIGINT)
             AS n_brand3
    FROM part GROUP BY 1
    """,
    doc="Collation-aware grouping (Spark 4 COLLATE UTF8_LCASE): group on "
    "a case-insensitive collated column — the engine-level alternative "
    "to lower()-normalizing every comparison site. Oracle states the "
    "same grouping via lower(); results align because UTF8_LCASE on "
    "ASCII equals lowercase folding.",
    tags=("functions",),
)
def q_collation_case_insensitive(spark: SparkSession, sf: str) -> DataFrame:
    part = read_sf_table(spark, sf, "part")
    ci = part.withColumn(
        "p_type_ci", F.expr("CAST(p_type AS STRING COLLATE UTF8_LCASE)")
    )
    return (
        ci.groupBy("p_type_ci")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("p_brand") == "Brand#3", 1)).alias(
                "n_brand3"
            ),
        )
        # collated group keys render with original casing of an arbitrary
        # member; normalize the OUTPUT to lower AND cast back to plain
        # string — the collated dtype ('string collate UTF8_LCASE') would
        # fail a schema comparison against the oracle's plain VARCHAR
        .select(
            F.lower("p_type_ci").cast("string").alias("p_type_ci"),
            "n",
            "n_brand3",
        )
    )


@register(
    "table_fingerprint_audit",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(CAST(concat('0x', substr(md5(
             concat_ws('|', CAST(o_orderkey AS VARCHAR),
                       CAST(o_custkey AS VARCHAR), o_orderstatus,
                       CAST(round(o_totalprice, 2) AS VARCHAR),
                       strftime(o_orderdate, '%Y-%m-%d'),
                       o_orderpriority)), 1, 15)) AS BIGINT))
             AS xor_fingerprint
    FROM orders
    """,
    doc="Cross-engine table fingerprint: an order-independent XOR of "
    "per-row md5 digests over a canonical text rendering — how a user "
    "audits that a migrated table is byte-equal to the legacy system "
    "without sorting or moving it (map-side partial XOR, one 16-byte "
    "row to the driver; at 100 TB this is the only whole-table equality "
    "check that costs one scan and no shuffle). md5 + explicit casts "
    "keep the digest engine-portable; xor needs no overflow arithmetic. "
    "This is also the engine's own parity harness made into an operator.",
    tags=("ext",),
)
def q_table_fingerprint_audit(spark: SparkSession, sf: str) -> DataFrame:
    o = read_sf_table(spark, sf, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice"), 2).cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    digest = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")
    return o.select(digest.alias("__d")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(__d)").alias("xor_fingerprint"),
    )


@register(
    "embedding_int8_quantize",
    """
    WITH stats AS (
      SELECT min(u.x) AS lo, max(u.x) AS hi
      FROM embeddings e, unnest(e.embedding) AS u(x)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           round(min(s.lo), 6) AS lo,
           round(max(s.hi), 6) AS hi,
           true AS recon_error_bounded
    FROM embeddings, stats s
    """,
    doc="Scalar int8 quantization for embedding storage (the 4x memory "
    "cut that decides whether a 100 TB vector corpus fits executor RAM "
    "for ANN): global [min,max] from one aggregate (broadcast back), "
    "codes = round((x-lo)/(hi-lo)*255)-128 as tinyint, reconstruction "
    "error <= step/2 by construction — asserted per element and "
    "reported as a decidable boolean the oracle can pin. All column "
    "expressions (transform/aggregate lambdas), no UDF.",
    tags=("ext",),
)
def q_embedding_int8_quantize(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_sf_table(spark, sf, "embeddings")
    flat = emb.select(F.explode("embedding").alias("x"))
    stats = flat.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    q = emb.crossJoin(F.broadcast(stats))
    step = (F.col("hi") - F.col("lo")) / F.lit(255.0)
    # CAST x to double BEFORE the subtraction: float32 (x - lo) loses
    # ~1e-7 relative precision, enough to push an element sitting near a
    # half-step boundary onto the other code — the reconstruction then
    # exceeds step/2 by ~1e-7*step, far beyond the 1e-12 slack (observed
    # as a false recon_error_bounded at the sf1 rehearsal). Double
    # subtraction of two exactly-representable floats is exact.
    codes = F.expr(
        "transform(embedding, x -> CAST(round((CAST(x AS DOUBLE) - CAST(lo"
        " AS DOUBLE)) / ((CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) / 255.0))"
        " - 128 AS TINYINT))"
    )
    # same double-first discipline for the step used in reconstruction
    # and in the bound — a float32 (hi - lo) here would disagree with
    # the code computation's step at the 1e-7 level
    recon = F.expr(
        "transform(codes, c -> CAST(lo AS DOUBLE) + (CAST(c AS DOUBLE)"
        " + 128.0) * ((CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) / 255.0))"
    )
    checked = (
        q.withColumn("codes", codes)
        .withColumn("recon", recon)
        .withColumn(
            "ok",
            F.expr(
                "forall(zip_with(embedding, recon, (x, r) -> "
                "abs(CAST(x AS DOUBLE) - r) <= ((CAST(hi AS DOUBLE)"
                " - CAST(lo AS DOUBLE)) / 255.0) / 2.0 + 1e-12), b -> b)"
            ),
        )
    )
    return checked.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.min("lo"), 6).alias("lo"),
        F.round(F.max("hi"), 6).alias("hi"),
        F.min("ok").alias("recon_error_bounded"),
    )


@register(
    "length_bucket_padding",
    """
    WITH toks AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT *, CAST(ceil(n_tokens / 16.0) AS BIGINT) AS bucket FROM toks
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tokens) AS BIGINT) AS bucket_max,
           CAST(sum(n_tokens) AS BIGINT) AS actual_tokens,
           CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
             AS padding_waste
    FROM b GROUP BY bucket
    """,
    doc="Length-bucketed batching (padding-efficiency op for training / "
    "inference): docs grouped into width-16 token-length buckets; per "
    "bucket, padded cost = n_docs x bucket_max vs the actual token mass. "
    "Bucketing by length is what turns O(max_len) padding waste into "
    "O(bucket_width) — the standard dynamic-batching prep. One scan, one "
    "shuffle on a small key; token counting shares ext/text's whitespace "
    "semantics so the oracle restates it verbatim.",
    tags=("ext",),
)
def q_length_bucket_padding(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.text import token_count

    docs = read_sf_table(spark, sf, "documents")
    b = docs.select(
        token_count(F.col("text")).alias("n_tokens")
    ).withColumn("bucket", F.ceil(F.col("n_tokens") / 16.0).cast("bigint"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").alias("bucket_max"),
        F.sum("n_tokens").cast("bigint").alias("actual_tokens"),
        (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens"))
        .cast("bigint")
        .alias("padding_waste"),
    )


@register(
    "kfold_assignment",
    """
    SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                            1, 8)) AS BIGINT) % 5 AS INT) AS fold,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
    """,
    doc="Deterministic k-fold CV assignment (ext/sampling.kfold_assignment): "
    "fold = md5-bucket mod k — engine-portable, layout-stable (a doc's "
    "fold never changes as the corpus grows), map-only. Oracle recomputes "
    "the identical md5 arithmetic.",
    tags=("ext",),
)
def q_kfold_assignment(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.sampling import kfold_assignment

    docs = read_sf_table(spark, sf, "documents")
    return kfold_assignment(docs, "doc_id", k=5).groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "temporal_split_embargo",
    """
    SELECT CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00'
                THEN 'train' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
    FROM events
    WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
       OR ts >= TIMESTAMP '2024-01-20 00:00:00' + INTERVAL 1 DAY
    GROUP BY 1
    """,
    doc="Temporal train/test split with a 1-day embargo gap "
    "(ext/sampling.temporal_split_embargo): rows inside [cutoff, cutoff+"
    "embargo) are dropped so trailing-window features on early test rows "
    "cannot overlap train data — time-series leakage control. Pure "
    "filters on the event-time column (partition-prunable); NTZ-safe "
    "literal comparison.",
    tags=("ext",),
)
def q_temporal_split_embargo(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.sampling import temporal_split_embargo

    ev = read_sf_table(spark, sf, "events")
    cutoff = F.to_timestamp_ntz(F.lit("2024-01-20 00:00:00"))
    split = temporal_split_embargo(ev, "ts", cutoff, "INTERVAL 1 DAY")
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        _ts_str(F.min("ts")).alias("first_ts"),
        _ts_str(F.max("ts")).alias("last_ts"),
    )


@register(
    "nucleus_top_p_events",
    """
    WITH ranked AS (
      SELECT event_type, value,
             sum(value) OVER (PARTITION BY event_type
                              ORDER BY value DESC, event_id
                              ROWS UNBOUNDED PRECEDING) AS cum_v,
             sum(value) OVER (PARTITION BY event_type) AS tot_v
      FROM events WHERE value > 0
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(max(cum_v / tot_v), 6) AS covered_share
    FROM ranked
    WHERE cum_v - value < 0.9 * tot_v
    GROUP BY event_type
    """,
    doc="Group-wise nucleus (top-p) selection: per event type keep the "
    "largest values until 90% of the mass is covered — the cumulative-"
    "share gate used for nucleus sampling / heavy-hitter truncation. One "
    "running-sum window + a share predicate ('cum before this row < p * "
    "total' keeps the boundary row), deterministic tie-break on event_id.",
    tags=("analytics",),
)
def q_nucleus_top_p_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(F.col("value") > 0)
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy(F.col("value").desc(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.sum("value").over(w_cum).alias("cum_v"),
        F.sum("value").over(w_all).alias("tot_v"),
    )
    return (
        ranked.filter(
            F.col("cum_v") - F.col("value") < 0.9 * F.col("tot_v")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.max(F.col("cum_v") / F.col("tot_v")), 6).alias(
                "covered_share"
            ),
        )
    )


@register(
    "user_event_paths",
    """
    SELECT user_id,
           array_to_string((array_agg(event_type
                            ORDER BY ts, event_id))[1:8], '>') AS path,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    doc="Per-user event-path extraction (sequence mining prep): the first "
    "8 event types in strict (ts, event_id) order joined into a path "
    "string. Deterministic ordered collect: sort-within-window then "
    "slice — the behavioral-sequence feature for funnel/Markov analysis. "
    "One shuffle on user_id.",
    tags=("analytics",),
)
def q_user_event_paths(spark: SparkSession, sf: str) -> DataFrame:
    # ONE aggregation: collect (ts, event_id, event_type) structs per user,
    # sort_array gives the strict (ts, event_id) order (struct comparison
    # is lexicographic by field position), then slice+transform projects
    # the first 8 types. The unbounded-window + first() form would carry
    # the full per-user sequence on EVERY row (O(n²) state) — this carries
    # it once per user.
    ev = read_sf_table(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("__seq"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.array_join(
                F.transform(
                    F.slice("__seq", 1, 8), lambda s: s["event_type"]
                ),
                ">",
            ).alias("path"),
            "n_events",
        )
    )


@register(
    "q7_nation_trade_flows",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE ((sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
        OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18'))
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations by "
    "ship year — a 6-table join tree where every dimension (customer, "
    "supplier, nation x2) broadcasts and only the lineitem-orders join "
    "shuffles; the nation predicate prunes through the join before the "
    "fact scan aggregates. The breadth test for join reordering.",
    tags=("analytics",),
)
def q_q7_nation_trade_flows(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    o = read_sf_table(spark, sf, "orders")
    c = read_sf_table(spark, sf, "customer")
    s = read_sf_table(spark, sf, "supplier")
    n = read_sf_table(spark, sf, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_18")
                & (F.col("cust_nation") == "NATION_19")
            )
            | (
                (F.col("supp_nation") == "NATION_19")
                & (F.col("cust_nation") == "NATION_18")
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@register(
    "cumulative_distinct_users",
    """
    WITH firsts AS (
      SELECT event_type, user_id,
             min(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY event_type, user_id
    ),
    daily AS (
      SELECT event_type, first_day AS day,
             CAST(count(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY event_type, first_day
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day_str, new_users,
           CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_users
    FROM daily
    """,
    doc="Cumulative distinct users per event type by day — COUNT(DISTINCT) "
    "OVER is unsupported in both engines, so this is the standard "
    "rewrite: first-occurrence day per (type, user) -> daily new-user "
    "counts -> running sum. Two aggs + one window, every stage partial-"
    "aggregable; the direct window form would be quadratic state.",
    tags=("analytics",),
)
def q_cumulative_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily = firsts.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day_str"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias(
            "cum_distinct_users"
        ),
    )


@register(
    "q11_important_stock",
    """
    -- MATERIALIZED: pv is referenced twice (rows + threshold scalar);
    -- one evaluation keeps the parallel double sums identical on both
    -- sides of the comparison (the q15 ulp-wobble class)
    WITH pv AS MATERIALIZED (
      SELECT l_partkey,
             sum(l_extendedprice * l_quantity) AS part_value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, round(part_value, 2) AS part_value
    FROM pv
    WHERE part_value > (SELECT sum(part_value) * 0.0005 FROM pv)
    """,
    doc="TPC-H Q11 shape: parts whose traded value exceeds a fraction of "
    "the global total — a HAVING against a scalar subquery over the same "
    "aggregate view. The per-part aggregate shuffles once; the global "
    "total is a 1-row broadcast; with AQE the exchange under both "
    "branches is reused, so the fact scan runs once.",
    tags=("analytics",),
)
def q_q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    li.createOrReplaceTempView("q11_lineitem")
    return spark.sql(
        """
        WITH pv AS (
          SELECT l_partkey,
                 sum(l_extendedprice * l_quantity) AS part_value
          FROM q11_lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, round(part_value, 2) AS part_value
        FROM pv
        WHERE part_value > (SELECT sum(part_value) * 0.0005 FROM pv)
        """
    )


@register(
    "q19_disjunctive_predicates",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 11 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 21 AND 30
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: a disjunction of conjunctive (brand, size, "
    "quantity) windows across the join. Catalyst extracts the common "
    "per-side implications (brand IN-set + size bounds push to the part "
    "scan, quantity bounds to lineitem) BEFORE the join, then applies "
    "the full OR after — the predicate-decomposition stress test.",
    tags=("analytics",),
)
def q_q19_disjunctive_predicates(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    p = read_sf_table(spark, sf, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(11, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(21, 30)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "metadata_file_provenance",
    """
    SELECT 'events.parquet' AS file_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
    doc="Hidden _metadata file-provenance columns: per-source-file row "
    "accounting straight from the scan (no input_file_name() UDF call, "
    "no extra pass) — the lineage/audit primitive for multi-file "
    "ingestion; at 100 TB per-file counts localize corrupt or "
    "short-loaded files. Single file at test SF, so the oracle pins the "
    "name literally.",
    tags=("ext",),
)
def q_metadata_file_provenance(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    return (
        ev.select(
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("file_name"),
            "user_id",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@register(
    "q14_promo_revenue_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                   THEN l.l_extendedprice * (1 - l.l_discount) END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS promo_share_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14 shape: promo revenue share — a conditional-aggregate "
    "ratio over one broadcast join, with the ship-date window pushed to "
    "the lineitem scan (row-group pruning on the sort-adjacent column). "
    "CASE-inside-sum computes both numerator and denominator in one "
    "pass, one shuffle.",
    tags=("analytics",),
)
def q_q14_promo_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp_ntz(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1996-04-01")))
    )
    p = read_sf_table(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate_str,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): segment-filtered customer "
    "dim broadcasts, both date windows push to their scans, one fact "
    "shuffle on l_orderkey, TakeOrderedAndProject caps the result. "
    "Deterministic tie-break on l_orderkey.",
    tags=("analytics",),
)
def q_q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    c = read_sf_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_sf_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp_ntz(F.lit("1998-01-01"))
    )
    li = read_sf_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp_ntz(F.lit("1998-01-01"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate_str"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate_str", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q5 shape (local supplier volume): six-table join where the "
    "supplier join carries the EXTRA equality s_nationkey = c_nationkey "
    "(local-to-local trade) — every dim broadcasts, the fact shuffles "
    "once on l_orderkey, region filter prunes through nation before "
    "touching the fact.",
    tags=("analytics",),
)
def q_q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    c = read_sf_table(spark, sf, "customer")
    o = read_sf_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp_ntz(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp_ntz(F.lit("1998-01-01")))
    )
    li = read_sf_table(spark, sf, "lineitem")
    s = read_sf_table(spark, sf, "supplier")
    n = read_sf_table(spark, sf, "nation")
    r = read_sf_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): the canonical pushdown "
    "benchmark — all four predicates reach the parquet scan "
    "(PushedFilters), no join, no shuffle beyond the final 1-row "
    "aggregate merge; whole-stage codegen end to end.",
    tags=("analytics",),
)
def q_q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp_ntz(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1997-01-01")))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q8_market_share",
    """
    WITH all_lines AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END) / sum(volume), 6) AS mkt_share
    FROM all_lines GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): an eight-table join tree "
    "— nation joined TWICE under different roles — collapsing to a "
    "conditional-aggregate ratio per year. All dims broadcast; one fact "
    "shuffle; the region+type filters prune through the joins.",
    tags=("analytics",),
)
def q_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    p = read_sf_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    s = read_sf_table(spark, sf, "supplier")
    o = read_sf_table(spark, sf, "orders")
    c = read_sf_table(spark, sf, "customer")
    n = read_sf_table(spark, sf, "nation")
    r = read_sf_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        0.0
                    )
                )
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    """
    -- profit rides DECIMAL end-to-end, FACTOR-WISE: the stored doubles
    -- are exact 2-dec money / 2-dec discount values, so casting each
    -- factor to decimal recovers them exactly in both engines, and the
    -- decimal product+sum are exact — no double product whose 10th
    -- decimal is engine-conversion-dependent, no ordering drift (sf1
    -- sweep finding: the double sum flipped the 2-dec grid)
    -- final 2-dec quantize via floor(x*100 + 0.5): the 4-dec exact sums
    -- tie at .XX50, where Spark's decimal down-cast HALF_UPs but
    -- DuckDB's TRUNCATES — floor arithmetic on the exact decimal is the
    -- portable half-up
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(floor(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(12,4))
                             - CAST(l.l_discount AS DECIMAL(12,4))))
                      * 100 + 0.5) AS DOUBLE) / 100 AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-type profit by supplier nation/year; "
    "supplycost term omitted — no partsupp table in the harness data): "
    "LIKE-filtered part dim broadcasts, profit aggregates per "
    "(nation, year). The substring filter cannot push to parquet "
    "statistics but prunes before the join.",
    tags=("analytics",),
)
def q_q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    p = read_sf_table(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    s = read_sf_table(spark, sf, "supplier")
    o = read_sf_table(spark, sf, "orders")
    n = read_sf_table(spark, sf, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (
                F.floor(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,4)")
                        * (
                            F.lit(1).cast("decimal(12,4)")
                            - F.col("l_discount").cast("decimal(12,4)")
                        )
                    )
                    * 100
                    # decimal literal: a double 0.5 would coerce the
                    # exact decimal sum to double before the floor
                    + F.lit("0.5").cast("decimal(2,1)")
                ).cast("double")
                / 100
            ).alias("profit")
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): returnflag filter "
    "pushes to the fact scan, date window to orders; top-20 lost "
    "customers via TakeOrderedAndProject with a deterministic "
    "tie-break.",
    tags=("analytics",),
)
def q_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    c = read_sf_table(spark, sf, "customer")
    o = read_sf_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp_ntz(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp_ntz(F.lit("1998-01-01")))
    )
    li = read_sf_table(spark, sf, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = read_sf_table(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c.c_custkey, o.o_orderkey,
           round(o.o_totalprice, 2) AS totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q18 shape (large-volume customers): IN over a grouped "
    "HAVING subquery — Catalyst plans the membership test as a left-semi "
    "join against the re-aggregated lineitem, reusing the l_orderkey "
    "shuffle for both the semi-join build and the outer aggregate.",
    tags=("analytics",),
)
def q_q18_large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    read_sf_table(spark, sf, "customer").createOrReplaceTempView("q18_c")
    read_sf_table(spark, sf, "orders").createOrReplaceTempView("q18_o")
    read_sf_table(spark, sf, "lineitem").createOrReplaceTempView("q18_l")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey,
               round(o.o_totalprice, 2) AS totalprice,
               round(sum(l.l_quantity), 2) AS total_qty
        FROM q18_c c
        JOIN q18_o o ON o.o_custkey = c.c_custkey
        JOIN q18_l l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM q18_l
          GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        )
        GROUP BY c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2)
        """
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY 1
    ORDER BY numwait DESC, s.s_name
    LIMIT 15
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting; lateness "
    "restated as ship > order date + 60d — the harness lineitem has no "
    "commit/receipt dates): the EXISTS + correlated NOT EXISTS pair — "
    "the hardest decorrelation in the suite — becomes a left-semi and a "
    "left-anti join on l_orderkey; the NOT EXISTS correlates on the "
    "OUTER query's o_orderdate.",
    tags=("analytics",),
)
def q_q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    read_sf_table(spark, sf, "supplier").createOrReplaceTempView("q21_s")
    read_sf_table(spark, sf, "orders").createOrReplaceTempView("q21_o")
    read_sf_table(spark, sf, "lineitem").createOrReplaceTempView("q21_l")
    return spark.sql(
        """
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM q21_s s
        JOIN q21_l l1 ON l1.l_suppkey = s.s_suppkey
        JOIN q21_o o  ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
            SELECT 1 FROM q21_l l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM q21_l l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 15
        """
    )


@register(
    "profile_table",
    """
    -- one profile row per column, stated as a UNION of per-column
    -- aggregates; the Spark side computes ALL columns in ONE aggregate
    -- pass (map-side combined) and unpivots — same result, one scan
    SELECT 'o_orderkey' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o_orderkey) AS BIGINT) AS n_non_null,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_str,
           CAST(max(o_orderkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(min(o_orderstatus) AS VARCHAR),
           CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(round(min(o_totalprice), 2) AS VARCHAR),
           CAST(round(max(o_totalprice), 2) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(min(o_orderpriority) AS VARCHAR),
           CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
    doc="Data-profiling operator (the ingestion-audit primitive): per-"
    "column row/non-null/distinct counts and min/max, computed for ALL "
    "columns in ONE aggregate scan (each stat is a separate map-side-"
    "combined aggregate expression) then unpivoted to a row per column. "
    "The oracle states the same stats as per-column UNION branches — "
    "n_distinct here is exact; at 100 TB swap approx_count_distinct "
    "into the same single-pass shape.",
    tags=("analytics",),
)
def q_profile_table(spark: SparkSession, sf: str) -> DataFrame:
    o = read_sf_table(spark, sf, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    num = {"o_totalprice"}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__nd"))
        mn, mx = F.min(F.col(c)), F.max(F.col(c))
        if c in num:
            mn, mx = F.round(mn, 2), F.round(mx, 2)
        aggs.append(mn.cast("string").alias(f"{c}__mn"))
        aggs.append(mx.cast("string").alias(f"{c}__mx"))
    one = o.agg(*aggs)
    profile = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_non_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_str"),
                F.col(f"{c}__mx").alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(profile).alias("p")).select("p.*")


@register(
    "bpe_learn_merges",
    r"""
    -- the same two BPE steps unrolled: pair counts -> argmax (scalar
    -- subqueries) -> GREEDY merge rewrite -> recount. The rewrite is a
    -- string fold (list_reduce): append, or fuse into the accumulator's
    -- last token when it equals l and the symbol is r — last-token-is-l
    -- is suffix-decidable because a merged l||r can never equal l. This
    -- is exactly Sennrich's left-to-right non-overlapping scan (runs
    -- included: a a a a -> (aa)(aa)); a flat replace(' l r ') is NOT
    -- (the match consumes the separator the next occurrence needs).
    WITH words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
            FROM documents)
      WHERE length(w) >= 2 GROUP BY w
    ),
    s0 AS (
      SELECT string_split(trim(regexp_replace(w, '(.)', '\1 ', 'g')), ' ')
               AS syms, freq
      FROM words
    ),
    p1 AS (
      SELECT syms[i] AS l, syms[i + 1] AS r, freq
      FROM s0, UNNEST(range(1, len(syms))) AS t(i)
    ),
    c1 AS (SELECT l, r, sum(freq) AS cnt FROM p1 GROUP BY l, r),
    m1 AS (SELECT l, r, cnt FROM c1 ORDER BY cnt DESC, l, r LIMIT 1),
    s1 AS (
      SELECT string_split(list_reduce(syms, (acc, x) -> CASE
               WHEN x = m.r AND (acc = m.l OR
                    right(acc, length(m.l) + 1) = ' ' || m.l)
               THEN left(acc, length(acc) - length(m.l)) || m.l || m.r
               ELSE acc || ' ' || x END), ' ') AS syms, freq
      FROM s0, m1 m
    ),
    p2 AS (
      SELECT syms[i] AS l, syms[i + 1] AS r, freq
      FROM s1, UNNEST(range(1, len(syms))) AS t(i)
    ),
    c2 AS (SELECT l, r, sum(freq) AS cnt FROM p2 GROUP BY l, r),
    m2 AS (SELECT l, r, cnt FROM c2 ORDER BY cnt DESC, l, r LIMIT 1)
    SELECT CAST(1 AS INT) AS step, l AS left_sym, r AS right_sym,
           CAST(cnt AS BIGINT) AS pair_count FROM m1
    UNION ALL
    SELECT CAST(2 AS INT), l, r, CAST(cnt AS BIGINT) FROM m2
    """,
    doc="E4 distributed BPE merge learning (ext/bpe.py, Sennrich et al.): "
    "each step = weighted adjacent-pair explode+groupBy (map-side "
    "combined) for the argmax pair, then a map-only greedy merge fold "
    "over the symbol arrays (exact left-to-right non-overlapping scan, "
    "hypothesis-pinned vs the reference model). Only the 1-row argmax "
    "reaches the driver per step; the word table never moves. Oracle "
    "unrolls the identical two steps, folding via list_reduce.",
    tags=("ext",),
)
def q_bpe_learn_merges(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.bpe import learn_bpe_merges

    docs = read_sf_table(spark, sf, "documents")
    return learn_bpe_merges(docs, n_merges=2)


@register(
    "theta_sketch_set_ops",
    """
    -- decidable claims: the exact cohort cardinalities both engines
    -- compute, plus 5%-relative-error gates on each sketch estimate
    -- (theta sketches at default lgK=12 are exact far beyond this
    -- cardinality, but the gate states the contract, not the luck)
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
           CAST((SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
                AS BIGINT) AS n_union,
           CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
                AS BIGINT) AS n_intersect,
           CAST((SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
                AS BIGINT) AS n_diff,
           true AS union_ok, true AS intersect_ok, true AS diff_ok
    """,
    doc="E6 theta sketches (Spark 4 Datasketches): DISTINCT-SET ALGEBRA on "
    "sketches — union/intersection/difference cardinality estimates from "
    "two per-cohort theta sketches, no re-scan of raw data. The 100 TB "
    "primitive for audience overlap: build one mergeable sketch per "
    "cohort partition, combine with theta_union/intersection/difference. "
    "Gates assert 5% relative error vs the exact cardinalities the "
    "oracle also computes.",
    tags=("ext",),
)
def q_theta_sketch_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "click").agg(
        F.theta_sketch_agg("user_id").alias("sk_a"),
        F.countDistinct("user_id").alias("n_a"),
    )
    b = ev.filter(F.col("event_type") == "purchase").agg(
        F.theta_sketch_agg("user_id").alias("sk_b"),
        F.countDistinct("user_id").alias("n_b"),
    )
    both = a.crossJoin(b)  # 1 row x 1 row: two scalar sketches meet

    def est(col: "F.Column") -> "F.Column":
        return F.theta_sketch_estimate(col)

    def gate(estimate: "F.Column", exact: "F.Column") -> "F.Column":
        return (
            F.abs(estimate - exact)
            <= 0.05 * F.greatest(exact.cast("double"), F.lit(1.0))
        )

    out = both.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        # exact set cardinalities re-derived from sketch algebra estimates
        # would be circular; compute exact via the inclusion-exclusion of
        # the two exact counts is impossible without the overlap — so the
        # overlap exacts come from a second aggregate below
        est(F.theta_union(F.col("sk_a"), F.col("sk_b"))).alias("__e_union"),
        est(F.theta_intersection(F.col("sk_a"), F.col("sk_b"))).alias(
            "__e_int"
        ),
        est(F.theta_difference(F.col("sk_a"), F.col("sk_b"))).alias(
            "__e_diff"
        ),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    exact = spark.createDataFrame(
        [
            (
                clicks.union(purch).distinct().count(),
                clicks.intersect(purch).count(),
                clicks.subtract(purch).count(),  # set EXCEPT, not bag
            )
        ],
        "n_union bigint, n_intersect bigint, n_diff bigint",
    )
    return out.crossJoin(exact).select(
        "n_a",
        "n_b",
        "n_union",
        "n_intersect",
        "n_diff",
        gate(F.col("__e_union"), F.col("n_union")).alias("union_ok"),
        gate(F.col("__e_int"), F.col("n_intersect")).alias("intersect_ok"),
        gate(F.col("__e_diff"), F.col("n_diff")).alias("diff_ok"),
    )


@register(
    "kll_quantile_sketch_merge",
    """
    -- mergeable-quantile contract: per-day KLL sketches merged into a
    -- global sketch; the gate bounds the merged-sketch quantile against
    -- the exact percentile within 2% RANK error (KLL's guarantee is on
    -- rank, not value: the estimate's true rank must be within eps of
    -- the target rank — stated here via the exact values at rank±2%)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           true AS p50_ok, true AS p95_ok
    FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
    """,
    doc="E6 KLL quantile sketches (Spark 4 Datasketches): one mergeable "
    "sketch per day (the rollup-maintenance shape — partials live beside "
    "the daily aggregates), kll_merge_agg combines them, and the merged "
    "sketch answers global quantiles without re-scanning history. Gate: "
    "merged-sketch p50/p95 fall between the exact values at rank ±2% "
    "(KLL guarantees rank error, not value error).",
    tags=("ext",),
)
def q_kll_quantile_sketch_merge(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.kll_merge_agg_double("sk").alias("sk"),
    ).select(
        "n_days",
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)).alias(
            "__p50"
        ),
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.95)).alias(
            "__p95"
        ),
    )
    bounds = ev.agg(
        F.expr("percentile(value, 0.48)").alias("p50_lo"),
        F.expr("percentile(value, 0.52)").alias("p50_hi"),
        F.expr("percentile(value, 0.93)").alias("p95_lo"),
        F.expr("percentile(value, 0.97)").alias("p95_hi"),
    )
    return merged.crossJoin(bounds).select(
        F.col("n_days").cast("bigint").alias("n_days"),
        (
            (F.col("__p50") >= F.col("p50_lo"))
            & (F.col("__p50") <= F.col("p50_hi"))
        ).alias("p50_ok"),
        (
            (F.col("__p95") >= F.col("p95_lo"))
            & (F.col("__p95") <= F.col("p95_hi"))
        ).alias("p95_ok"),
    )


@register(
    "media_file_ingest",
    """
    -- same oracle family as audio_wav_features, over the staged subset:
    -- the decoded features re-derived from the source floats through the
    -- exact int16 quantization the WAV files carry
    SELECT vec_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(len(embedding) AS INT) AS n_samples,
           round(sqrt(list_sum(list_transform(embedding,
             x -> pow(greatest(least(floor(CAST(x AS DOUBLE) * 32767 + 0.5),
                               32767), -32768), 2))) / len(embedding)), 6)
             AS rms,
           CAST(list_max(list_transform(embedding,
             x -> abs(greatest(least(floor(CAST(x AS DOUBLE) * 32767 + 0.5),
                               32767), -32768)))) AS INT) AS peak_abs
    FROM embeddings WHERE vec_id < 100
    """,
    doc="E5 media ingest from FILES (the production path): WAV blobs land "
    "as individual files, spark.read.format('binaryFile') scans them "
    "executor-parallel (path, content, length), the id parses from the "
    "filename, and the real RIFF decoder (ext/audio.py) extracts "
    "features — blobs never shuffle, features only from the first map. "
    "Staging writes the files executor-side (no driver materialization), "
    "mtime-versioned like the REST page fixture.",
    tags=("ext",),
)
def q_media_file_ingest(spark: SparkSession, sf: str) -> DataFrame:
    import os as _os

    from .ext.audio import decode_wav_features, synthesize_wav

    tag = _os.path.basename(sf.rstrip("/"))
    src_file = _os.path.join(sf, "embeddings.parquet")
    try:
        ver = int(_os.path.getmtime(src_file))
    except OSError:
        ver = 0
    media_dir = f"/tmp/spark_graft_media_{tag}_{ver}"
    done = _os.path.join(media_dir, "_STAGED")
    if not _os.path.exists(done):
        _os.makedirs(media_dir, exist_ok=True)
        emb = read_sf_table(spark, sf, "embeddings").filter(
            F.col("vec_id") < 100
        )
        wavs = synthesize_wav(emb)

        def _write(it):
            for row in it:
                tmp = _os.path.join(media_dir, f".{row['vec_id']}.tmp")
                with open(tmp, "wb") as fh:
                    fh.write(bytes(row["wav"]))
                _os.replace(
                    tmp, _os.path.join(media_dir, f"clip_{row['vec_id']}.wav")
                )

        wavs.foreachPartition(_write)
        open(done, "w").close()

    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(media_dir)
        .select(
            F.regexp_extract(F.col("path"), r"clip_(\d+)\.wav$", 1)
            .cast("long")
            .alias("vec_id"),
            F.col("content").alias("wav"),
        )
    )
    return decode_wav_features(blobs)


@register(
    "minhash_dedup_incremental",
    r"""
    -- exact-Jaccard restatement of the incremental policy: a batch doc
    -- (id >= 250) drops iff it has an exact pair (J >= 0.5) with ANY
    -- smaller-id doc. LSH recall near the threshold is probabilistic
    -- (r5 sf1 finding), so the decidable claims are: the engine NEVER
    -- wrongly drops (every drop is exact-verified — n_wrong_drops = 0),
    -- and its extra keeps (missed near-threshold pairs) stay within a
    -- pinned fraction of the exact drop count.
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      WHERE b.doc_id >= 250
      GROUP BY 1, 2
    ),
    losers AS (
      SELECT DISTINCT doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    )
    SELECT CAST((SELECT count(*) FROM documents WHERE doc_id >= 250)
                AS BIGINT) AS n_batch,
           CAST((SELECT count(*) FROM documents WHERE doc_id >= 250)
                - (SELECT count(*) FROM losers) AS BIGINT) AS n_exact_kept,
           CAST(0 AS BIGINT) AS n_wrong_drops,
           true AS extra_keeps_ok
    """,
    doc="E2 incremental MinHash near-dup dedup "
    "(ext/dedup.minhash_dedup_incremental): dedup a new batch against "
    "the accumulated corpus via persisted SIGNATURE state — batch "
    "signatures map-side, LSH band join on longs, bodies fetched only "
    "for candidate docs. The near-dup twin of dedup_exact_incremental. "
    "Contract (r6, embedding_ivf_topk precedent): survivors are compared "
    "in-query against the exact-pair policy — wrong drops are impossible "
    "(0), extra keeps (LSH misses near the threshold) gated at <= "
    "max(2, 0.4 x exact drop count). The exact-recall incremental twin "
    "is exact_neardup_dedup_incremental (streaming_neardup_prep).",
    tags=("ext",),
)
def q_minhash_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import jaccard_pairs, minhash_dedup_incremental

    docs = read_sf_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 250)
    batch = docs.filter(F.col("doc_id") >= 250)
    kept, _sigs = minhash_dedup_incremental(corpus, batch)
    exact_losers = (
        jaccard_pairs(docs, "doc_id", "text", 3, 0.5)
        .filter(F.col("doc_b") >= 250)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    e = batch.select("doc_id").join(exact_losers, "doc_id", "left_anti")
    flags = (
        batch.select("doc_id")
        .join(e.withColumn("__e", F.lit(1)), "doc_id", "left")
        .join(
            kept.select("doc_id").withColumn("__k", F.lit(1)),
            "doc_id",
            "left",
        )
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batch"),
        F.count("__e").cast("bigint").alias("n_exact_kept"),
        F.count(F.when(F.col("__e").isNotNull() & F.col("__k").isNull(), 1))
        .cast("bigint")
        .alias("n_wrong_drops"),
        (
            F.count(
                F.when(F.col("__k").isNotNull() & F.col("__e").isNull(), 1)
            )
            <= F.greatest(
                F.lit(2),
                0.4 * (F.count(F.lit(1)) - F.count("__e")),
            )
        ).alias("extra_keeps_ok"),
    )


@register(
    "asof_join_cogroup",
    f"""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '{DUCK_TS_FMT}') AS purchase_ts,
           strftime(s.ts, '{DUCK_TS_FMT}') AS last_signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of join via COGROUP (FlatMapCoGroupsInPandas): both sides "
    "shuffle once on user_id, each group pair meets in one Arrow batch, "
    "pandas merge_asof does the per-key backward search. The two-sided "
    "custom-merge surface — same oracle as the window-composed asof_join, "
    "so the two physical strategies are pinned equal. Use the window "
    "form when the JVM can express it; cogroup when the per-pair logic "
    "needs real Python (model scoring, complex alignment).",
    tags=("custom",),
)
def q_asof_join_cogroup(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    ev = read_sf_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )

    def merge(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        if len(left) == 0:
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "signup_ts"]
            )
        left = left.sort_values("ts", kind="mergesort")
        if len(right) == 0:
            out = left.copy()
            out["signup_ts"] = pd.NaT
            return out[["event_id", "user_id", "ts", "signup_ts"]]
        right = right.sort_values("signup_ts", kind="mergesort")
        out = pd.merge_asof(
            left,
            right[["signup_ts"]],
            left_on="ts",
            right_on="signup_ts",
            direction="backward",
        )
        return out[["event_id", "user_id", "ts", "signup_ts"]]

    joined = (
        purchases.groupBy("user_id")
        .cogroup(signups.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, ts timestamp_ntz, "
            "signup_ts timestamp_ntz",
        )
    )
    return joined.select(
        "event_id",
        "user_id",
        _ts_str(F.col("ts")).alias("purchase_ts"),
        _ts_str(F.col("signup_ts")).alias("last_signup_ts"),
    )


@register(
    "ewma_per_user",
    """
    SELECT user_id,
           round(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> 0.5 * x + 0.5 * acc), 6) AS ewma,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    doc="Exponentially weighted moving average per key (alpha=0.5, "
    "s1=x1): the inherently-sequential time-series smoother as ONE "
    "aggregation — sort_array(collect_list(struct)) fixes the (ts, "
    "event_id) order, then a higher-order fold runs the recurrence "
    "inside codegen. Same left fold, same operand order in both engines "
    "-> bit-identical doubles. One shuffle on user_id; per-user state "
    "bounded by that user's history (no per-row unbounded-window state).",
    tags=("analytics",),
)
def q_ewma_per_user(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    vals = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: 0.5 * x + 0.5 * acc,
    )
    return ev.groupBy("user_id").agg(
        F.round(ewma, 6).alias("ewma"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "skew_diagnosis",
    """
    WITH pk AS (SELECT event_type AS key, count(*) AS n
                FROM events GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_rows,
           round(CAST(max(n) AS DOUBLE) / avg(n), 4) AS skew_factor,
           (SELECT key FROM pk ORDER BY n DESC, key LIMIT 1)
             AS heaviest_key
    FROM pk
    """,
    doc="Skew diagnosis (the operator you run BEFORE choosing salting / "
    "AQE skew-join): per-key cardinalities in one map-side-combined "
    "aggregate, reduced to key count, heaviest key, and the max/mean "
    "skew factor. At 100 TB this is the cheap pre-flight that decides "
    "whether operators.salted_join / salted_aggregate are needed.",
    tags=("analytics",),
)
def q_skew_diagnosis(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    pk = ev.groupBy(F.col("event_type").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    heaviest = pk.orderBy(F.desc("n"), "key").limit(1).select(
        F.col("key").alias("heaviest_key")
    )
    stats = pk.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_rows"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_factor"),
    )
    return stats.crossJoin(heaviest).select(
        "n_keys", "max_rows", "skew_factor", "heaviest_key"
    )


@register(
    "table_snapshot_diff",
    """
    -- v2 derived deterministically from orders: drop keys %7==0, bump
    -- price on keys %11==0 — the oracle and the operator both see the
    -- same two snapshots
    WITH v1 AS (
      SELECT o_orderkey AS k,
             md5(concat_ws('|', o_orderstatus,
                           CAST(round(o_totalprice, 2) AS VARCHAR))) AS h
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey AS k,
             md5(concat_ws('|', o_orderstatus,
                 CAST(round(CASE WHEN o_orderkey % 11 = 0
                            THEN o_totalprice + 1 ELSE o_totalprice END,
                 2) AS VARCHAR))) AS h
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT CASE WHEN v2.k IS NULL THEN 'removed'
                WHEN v1.k IS NULL THEN 'added'
                WHEN v1.h <> v2.h THEN 'changed'
                ELSE 'same' END AS status,
           CAST(count(*) AS BIGINT) AS n
    FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
    GROUP BY 1
    """,
    doc="Snapshot diff (the migration/CDC validation operator, and the "
    "symmetric generalization of O5 changed-row detection): two table "
    "versions reduce to (key, content-hash), one full-outer join "
    "classifies every key as added/removed/changed/same. Hashes compute "
    "map-side so the shuffle carries (key, 32-byte hash), never rows — "
    "the same slim-exchange discipline as delta.changed_rows; at 100 TB "
    "bucket both snapshots by key and the join is exchange-free.",
    tags=("analytics",),
)
def q_table_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    o = read_sf_table(spark, sf, "orders")

    def hashed(df, price_col):
        return df.select(
            F.col("o_orderkey").alias("k"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderstatus"),
                    F.round(price_col, 2).cast("string"),
                )
            ).alias("h"),
        )

    v1 = hashed(o, F.col("o_totalprice"))
    v2 = hashed(
        o.filter(F.col("o_orderkey") % 7 != 0),
        F.when(
            F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer"
    )
    status = (
        F.when(F.col("b.k").isNull(), "removed")
        .when(F.col("a.k").isNull(), "added")
        .when(F.col("a.h") != F.col("b.h"), "changed")
        .otherwise("same")
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "repeated_substring_spans_cdc",
    """
    WITH g AS (
      SELECT doc_id, i AS p, substring(text, CAST(i AS INT), 20) AS w
      FROM documents,
           UNNEST(range(1, greatest(length(text) - 19, 0) + 1)) AS t(i)
      WHERE length(text) >= 20
    ),
    fps AS (
      SELECT doc_id, CAST(p AS BIGINT) AS p, w FROM g
      WHERE CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) % 8 = 0
    ),
    ok AS (
      SELECT w FROM (SELECT w, count(DISTINCT doc_id) AS nd
                     FROM fps GROUP BY w)
      WHERE nd BETWEEN 2 AND 50
    ),
    rep AS (SELECT fps.* FROM fps JOIN ok USING (w)),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.p AS pa, b.p AS pb, a.p - b.p AS diag,
             da.text AS ta, db.text AS tb
      FROM rep a JOIN rep b ON a.w = b.w AND a.doc_id < b.doc_id
      JOIN documents da ON da.doc_id = a.doc_id
      JOIN documents db ON db.doc_id = b.doc_id
    ),
    lagged AS (
      SELECT *,
             lag(pa) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa)
               AS prev_pa,
             lag(pb) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa)
               AS prev_pb
      FROM cand
    ),
    flagged AS (
      -- a link chains only when the WHOLE stretch between consecutive
      -- fingerprints matches on both docs (a differing gap splits the
      -- chain into two valid spans instead of poisoning one glued span)
      SELECT *, CASE WHEN pa - prev_pa <= 64
                      AND substring(ta, CAST(prev_pa AS INT),
                                    CAST(pa - prev_pa + 20 AS INT))
                        = substring(tb, CAST(prev_pb AS INT),
                                    CAST(pa - prev_pa + 20 AS INT))
                THEN 0 ELSE 1 END AS new_chain
      FROM lagged
    ),
    chains AS (
      SELECT *, sum(new_chain) OVER
                  (PARTITION BY doc_a, doc_b, diag ORDER BY pa
                   ROWS UNBOUNDED PRECEDING) AS chain_id
      FROM flagged
    ),
    spans AS (
      SELECT doc_a, doc_b,
             CAST(min(pa) AS BIGINT) AS start_a,
             CAST(min(pb) AS BIGINT) AS start_b,
             CAST(20 + max(pa) - min(pa) AS BIGINT) AS span_len
      FROM chains GROUP BY doc_a, doc_b, diag, chain_id
    )
    SELECT s.doc_a, s.doc_b, s.start_a, s.start_b, s.span_len
    FROM spans s
    JOIN documents da ON da.doc_id = s.doc_a
    JOIN documents db ON db.doc_id = s.doc_b
    WHERE substring(da.text, CAST(s.start_a AS INT), CAST(s.span_len AS INT))
        = substring(db.text, CAST(s.start_b AS INT), CAST(s.span_len AS INT))
    """,
    doc="E1/E2 ALIGNMENT-FREE repeated spans "
    "(ext/dedup.repeated_substring_spans_cdc): content-defined "
    "fingerprint selection (winnowing 0-mod-w, Schleimer et al.) picks "
    "k-gram positions by hash, so repeated blocks match wherever they "
    "sit — no grid-congruence blind spot; chained per (pair, diagonal) "
    "and VERIFIED by direct substring equality, so every emitted span "
    "is an exact repeat. Portable md5 selection keeps the oracle "
    "digit-exact.",
    tags=("ext",),
)
def q_repeated_substring_spans_cdc(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import repeated_substring_spans_cdc

    docs = read_sf_table(spark, sf, "documents")
    return repeated_substring_spans_cdc(docs, k=20, w=8, max_df=50)


@register(
    "bitmap_distinct_users",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="E6 EXACT mergeable distinct via Spark 4 bitmap aggregates: "
    "bitmap_bucket_number/bitmap_bit_position shard the id space into "
    "32k-bit bitmaps, bitmap_construct_agg builds per-(group, bucket) "
    "partials map-side, and the rollup is a bitwise OR — the same "
    "mergeable-partial-state shape as the HLL sketch rollup "
    "(hll_sketch_merge_daily) but EXACT: incremental distinct-count "
    "state at 100 TB without a distinct shuffle of raw ids, because "
    "the exchange carries fixed-size bitmaps, not rows. Oracle: plain "
    "COUNT(DISTINCT).",
    tags=("ext",),
)
def q_bitmap_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    partials = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    return partials.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_users")
    )


_BM25_TERMS = ("spark", "vector", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "bm25_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents,
           UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    gl AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks
      WHERE tok IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}',
                    '{_BM25_TERMS[2]}')
      GROUP BY doc_id, tok
    ),
    idf AS (
      SELECT tok, ln(1 + (gl.n_docs - df + 0.5) / (df + 0.5)) AS idf
      FROM (SELECT tok, count(*) AS df FROM tf GROUP BY tok), gl
    ),
    scored AS (
      SELECT tf.doc_id,
             round(sum(idf.idf * tf.tf * ({_BM25_K1} + 1) /
                       (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B}
                        * dl.dl / gl.avgdl))), 6) AS score
      FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id), gl
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= 10
    """,
    doc="Lexical retrieval: Okapi/Lucene BM25 top-k over the corpus for a "
    "fixed query-term set — the full-text-search twin of the ANN "
    "operators (E3). Scale shape: term filter applied BEFORE the tf "
    "aggregation (only query-term postings shuffle), doc lengths are one "
    "map-side-combined pass, (n_docs, avgdl) and the per-term idf table "
    "are scalar/tiny broadcasts, and the top-k is TakeOrderedAndProject "
    "on the ROUNDED score with doc_id tie-break (deterministic across "
    "engines — ranking on raw doubles would flip on last-ulp sum-order "
    "wobble).",
    tags=("ext", "bench2"),
)
def q_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    gl = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(gl))
        .select(
            "tok",
            F.log(
                1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(gl))
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
    )
    top = scored.orderBy(F.desc("score"), "doc_id").limit(10)
    w = Window.orderBy(F.desc("score"), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


@register(
    "inverted_index_postings",
    """
    WITH dt AS (
      SELECT DISTINCT doc_id, t.tok
      FROM documents,
           UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    n AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_docs
          FROM dt GROUP BY tok),
    p AS (
      SELECT tok,
             array_to_string(list_slice(list_sort(list(doc_id)), 1, 20),
                             ',') AS postings_head
      FROM dt GROUP BY tok
    )
    SELECT tok, n_docs, postings_head FROM n JOIN p USING (tok)
    """,
    doc="Inverted-index build (the batch side of lexical retrieval): "
    "per-token document-frequency plus the first 20 postings, sorted. "
    "Scale shape: the posting list is CAPPED BEFORE aggregation — a "
    "rank<=20 window filter (Spark compiles it to WindowGroupLimit, "
    "which truncates each group map-side before the sort spills) feeds "
    "collect_list, so no unbounded per-token list is ever materialized; "
    "a stop-word token touching every doc costs 20 rows, not |corpus|. "
    "df counts aggregate the slim (tok, doc_id) pairs with map-side "
    "combine. Rendered as a CSV string so the value hash is "
    "engine-stable.",
    tags=("ext",),
)
def q_inverted_index_postings(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    dt = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    ).distinct()
    n = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    w = Window.partitionBy("tok").orderBy("doc_id")
    p = (
        dt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .groupBy("tok")
        .agg(
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "postings_head"
            )
        )
    )
    return n.join(p, "tok")


@register(
    "deterministic_shuffle_rank",
    """
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
    doc="Global training-epoch shuffle: a reproducible corpus permutation "
    "(md5 of a seeded key) ranked WITHOUT the single-reducer global "
    "window the oracle uses — operators.distributed_shuffle_rank "
    "range-buckets the hash's known uniform domain map-side (no stats "
    "pass), ranks within balanced buckets, and adds broadcast bucket "
    "offsets. Row-for-row equal to ORDER BY md5; the widest exchange "
    "spreads over n_buckets reducers instead of 1.",
    tags=("ext",),
)
def q_deterministic_shuffle_rank(spark: SparkSession, sf: str) -> DataFrame:
    from .operators import distributed_shuffle_rank

    docs = read_sf_table(spark, sf, "documents")
    return distributed_shuffle_rank(
        docs.select("doc_id"), "doc_id", seed="42"
    ).select("doc_id", "shuffle_rank")


_BPE_MERGES = (("a", "g"), ("ag", "g"), ("s", "p"), ("sp", "a"))


@register(
    "bpe_encode_tokens",
    r"""
    -- the same merge chain applied in SQL: fold each vocab word through
    -- the 4 merges (list_reduce, identical greedy-scan semantics as the
    -- bpe_learn_merges oracle), then join token counts back per doc.
    WITH wf AS (
      SELECT doc_id, w
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
            FROM documents)
      WHERE w <> ''
    ),
    s0 AS (
      SELECT w, string_split(trim(regexp_replace(w, '(.)', '\1 ', 'g')), ' ')
               AS syms
      FROM (SELECT DISTINCT w FROM wf)
    ),
    s1 AS (SELECT w, string_split(list_reduce(syms, (acc, x) -> CASE
             WHEN x = 'g' AND (acc = 'a' OR right(acc, 2) = ' a')
             THEN left(acc, length(acc) - 1) || 'ag'
             ELSE acc || ' ' || x END), ' ') AS syms FROM s0),
    s2 AS (SELECT w, string_split(list_reduce(syms, (acc, x) -> CASE
             WHEN x = 'g' AND (acc = 'ag' OR right(acc, 3) = ' ag')
             THEN left(acc, length(acc) - 2) || 'agg'
             ELSE acc || ' ' || x END), ' ') AS syms FROM s1),
    s3 AS (SELECT w, string_split(list_reduce(syms, (acc, x) -> CASE
             WHEN x = 'p' AND (acc = 's' OR right(acc, 2) = ' s')
             THEN left(acc, length(acc) - 1) || 'sp'
             ELSE acc || ' ' || x END), ' ') AS syms FROM s2),
    s4 AS (SELECT w, string_split(list_reduce(syms, (acc, x) -> CASE
             WHEN x = 'a' AND (acc = 'sp' OR right(acc, 3) = ' sp')
             THEN left(acc, length(acc) - 2) || 'spa'
             ELSE acc || ' ' || x END), ' ') AS syms FROM s3),
    wtok AS (SELECT w, len(syms) AS w_tokens FROM s4),
    counts AS (
      SELECT wf.doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(w_tokens) AS BIGINT) AS n_tokens
      FROM wf JOIN wtok USING (w)
      GROUP BY wf.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(c.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(c.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents d LEFT JOIN counts c ON c.doc_id = d.doc_id
    """,
    doc="E4 tokenizer APPLICATION (ext/bpe.apply_bpe_merges — the encode "
    "side of bpe_learn_merges): segment every word by a 4-entry merge "
    "table (chained merges incl. a second-level 'ag'+'g' fuse), count "
    "tokens per document. The greedy fold runs over the DISTINCT "
    "vocabulary only; per-word token counts equi-join back to the slim "
    "(doc, word) stream — at 100 TB the fold is |vocab|-sized, the "
    "corpus pays one explode + one map-side-combined agg.",
    tags=("ext", "bench2"),
)
def q_bpe_encode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.bpe import apply_bpe_merges

    docs = read_sf_table(spark, sf, "documents")
    return apply_bpe_merges(docs, list(_BPE_MERGES))


@register(
    "neardup_keep_best",
    r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2) i
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    groups AS MATERIALIZED (
      SELECT u AS doc, CAST(least(u, min(v)) AS BIGINT) AS group_rep
      FROM reach GROUP BY u
    ),
    gk AS MATERIALIZED (
      SELECT g.doc AS doc_id, g.group_rep,
             row_number() OVER (PARTITION BY g.group_rep
                                ORDER BY d.n_chars DESC, g.doc) = 1 AS kept
      FROM groups g JOIN documents d ON d.doc_id = g.doc
    )
    SELECT doc_id, group_rep, kept FROM gk
    UNION ALL
    SELECT doc_id, CAST(doc_id AS BIGINT) AS group_rep, true AS kept
    FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM gk)
    """,
    doc="E2 dedup CANONICAL SELECTION — the stage that turns near-dup "
    "groups into a kept/dropped corpus decision: within each connected "
    "component keep the best document (longest, doc_id tie-break), "
    "singletons keep themselves. Scale shape: the argmax window runs "
    "only over grouped docs (a small fraction of the corpus — near-dup "
    "groups, not all rows); ungrouped docs join the result via a "
    "left-anti join, map-side after the slim group table broadcast. "
    "Oracle extends the neardup_groups recursive-CTE closure with the "
    "same per-group argmax.",
    tags=("ext", "bench2"),
)
def q_neardup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import jaccard_pairs
    from .ext.graph import keep_best_per_group, near_dup_groups

    docs = read_sf_table(spark, sf, "documents")
    # exact pair source (r6: was LSH — its sub-100% recall near the
    # threshold broke kept-flag parity at sf1; a canonical-selection
    # policy pinned to a threshold needs the exact pair set). The join
    # partial-aggregates pair counts map-side; with input spread across
    # cores it runs ~2 s at sf0.1 / ~30 s at sf1.
    pairs = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    grouped = near_dup_groups(pairs)
    d = docs.select("doc_id", "n_chars")
    g = grouped.join(d, grouped["doc"] == d["doc_id"]).select(
        "doc_id", "group_rep", "n_chars"
    )
    # min_by hash-agg argmax, not a row_number window: an all-identical
    # mega-group would funnel the window's sort into one task; the agg
    # partial-combines map-side (ext/graph.keep_best_per_group)
    gk = keep_best_per_group(g)
    rest = d.join(gk.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id",
        F.col("doc_id").alias("group_rep"),
        F.lit(True).alias("kept"),
    )
    return gk.unionByName(rest)


@register(
    "neardup_keep_best_prod",
    f"""
    -- PRODUCTION twin of neardup_keep_best (VERDICT r7 item 4): the
    -- pair source is capped banded MinHash-LSH (linear at any SF; the
    -- exact shingle equi-join is ~25G rows at sf10 on this corpus's
    -- ~uniform shingle df), then the same connected-component closure
    -- and keep-longest policy over the LSH pair set.
    WITH RECURSIVE {_MINHASH_CAPPED_CTES},
    edges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM vpairs
      UNION SELECT doc_b, doc_a FROM vpairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    groups AS MATERIALIZED (
      SELECT u AS doc, CAST(least(u, min(v)) AS BIGINT) AS group_rep
      FROM reach GROUP BY u
    ),
    gk AS MATERIALIZED (
      SELECT g.doc AS doc_id, g.group_rep,
             row_number() OVER (PARTITION BY g.group_rep
                                ORDER BY d.n_chars DESC, g.doc) = 1 AS kept
      FROM groups g JOIN documents d ON d.doc_id = g.doc
    )
    SELECT doc_id, group_rep, kept FROM gk
    UNION ALL
    SELECT doc_id, CAST(doc_id AS BIGINT) AS group_rep, true AS kept
    FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM gk)
    """,
    doc="E2 canonical selection, production profile: the keep-best "
    "policy (longest doc per connected component, doc_id tie-break) "
    "over the CAPPED MinHash-LSH pair set instead of the exact shingle "
    "join — the linear at-scale alternative recorded for the sf10 "
    "exclusion of neardup_keep_best (which stays exact by contract). "
    "Same portable md5 family as the minhash_near_dups oracle, so the "
    "whole pipeline incl. the hot-bucket cap restates relationally.",
    tags=("ext", "bench2"),
)
def q_neardup_keep_best_prod(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Observation

    from .ext.dedup import minhash_near_dups
    from .ext.graph import keep_best_per_group, near_dup_groups

    docs = read_sf_table(spark, sf, "documents")
    pairs = minhash_near_dups(
        docs,
        "doc_id",
        "text",
        num_hashes=64,
        bands=16,
        verify_threshold=0.5,
        hash_fn="md5",
        max_bucket_size=2000,
        observation=Observation("nkb_prod_drops"),
    )
    grouped = near_dup_groups(pairs)
    d = docs.select("doc_id", "n_chars")
    g = grouped.join(d, grouped["doc"] == d["doc_id"]).select(
        "doc_id", "group_rep", "n_chars"
    )
    gk = keep_best_per_group(g)
    rest = d.join(gk.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id",
        F.col("doc_id").alias("group_rep"),
        F.lit(True).alias("kept"),
    )
    return gk.unionByName(rest)


@register(
    "curriculum_quality_buckets",
    r"""
    -- same pinned classifier score as quality_classifier_gate; bucket
    -- boundaries are exact interpolated quartiles of the ROUNDED score
    -- (rounding first makes every boundary comparison engine-stable).
    WITH scored AS (
      SELECT doc_id,
             round(1.0 / (1.0 + exp(-(CASE WHEN len(ws) > 0
                 THEN list_sum(ws) / len(ws) ELSE 0.0 END))), 6)
               AS quality_prob
      FROM (
        SELECT doc_id,
               list_transform(
                 list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             t -> t <> ''),
                 t -> ((((CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT)
                          % 64) * 37 + 11) % 64) - 32) / 64.0
               ) AS ws
        FROM documents)
    ),
    qs AS (
      SELECT round(quantile_cont(quality_prob, 0.25), 6) AS q1,
             round(quantile_cont(quality_prob, 0.50), 6) AS q2,
             round(quantile_cont(quality_prob, 0.75), 6) AS q3
      FROM scored
    )
    SELECT doc_id, quality_prob,
           CAST(1 + CASE WHEN quality_prob > q1 THEN 1 ELSE 0 END
                  + CASE WHEN quality_prob > q2 THEN 1 ELSE 0 END
                  + CASE WHEN quality_prob > q3 THEN 1 ELSE 0 END
                AS INT) AS bucket
    FROM scored, qs
    """,
    doc="Curriculum-learning prep: assign every document a difficulty/"
    "quality bucket (quartiles of the pinned classifier score) so the "
    "training loader can schedule easy->hard. Scale shape: scoring is "
    "the map-only codegen scan of quality_classifier_gate; the quartile "
    "boundaries are ONE exact-percentile aggregate broadcast back as 3 "
    "scalars (approx_percentile is the 100 TB swap-in, same dataflow); "
    "assignment is a map-side comparison — no global sort, no ntile "
    "single-reducer window.",
    tags=("ext",),
)
def q_curriculum_quality_buckets(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.classifier import quality_score

    docs = read_sf_table(spark, sf, "documents")
    scored = docs.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("quality_prob"),
    )
    qs = scored.agg(
        F.round(
            F.expr(
                "percentile_cont(0.25) WITHIN GROUP (ORDER BY quality_prob)"
            ),
            6,
        ).alias("q1"),
        F.round(
            F.expr(
                "percentile_cont(0.50) WITHIN GROUP (ORDER BY quality_prob)"
            ),
            6,
        ).alias("q2"),
        F.round(
            F.expr(
                "percentile_cont(0.75) WITHIN GROUP (ORDER BY quality_prob)"
            ),
            6,
        ).alias("q3"),
    )
    bucket = (
        F.lit(1)
        + (F.col("quality_prob") > F.col("q1")).cast("int")
        + (F.col("quality_prob") > F.col("q2")).cast("int")
        + (F.col("quality_prob") > F.col("q3")).cast("int")
    )
    return (
        scored.join(F.broadcast(qs))
        .select("doc_id", "quality_prob", bucket.cast("int").alias("bucket"))
    )


@register(
    "linear_regression_funcs",
    """
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
           round(regr_avgy(l_extendedprice, l_quantity), 2) AS avg_y
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Per-group OLS via the SQL-standard regr_* aggregate family "
    "(slope/intercept/R^2 of price on quantity) — the closed-form "
    "sufficient-statistics path: one partial+final hash aggregation, no "
    "iteration, no driver math. The distributed-ML gateway drug: any "
    "single-feature trend fit at 100 TB is this one scan.",
    tags=("functions",),
)
def q_linear_regression_funcs(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        F.expr(f"regr_count({y}, {x})").cast("bigint").alias("n"),
        F.round(F.expr(f"regr_slope({y}, {x})"), 4).alias("slope"),
        F.round(F.expr(f"regr_intercept({y}, {x})"), 2).alias("intercept"),
        F.round(F.expr(f"regr_r2({y}, {x})"), 6).alias("r2"),
        F.round(F.expr(f"regr_avgx({y}, {x})"), 4).alias("avg_x"),
        F.round(F.expr(f"regr_avgy({y}, {x})"), 2).alias("avg_y"),
    )


@register(
    "ab_test_welch",
    """
    -- Welch's unequal-variance t statistic from per-arm sufficient
    -- statistics (mean/var/count) — identical closed form both engines.
    WITH arms AS (
      SELECT event_type,
             count(*) AS n, avg(value) AS m, var_samp(value) AS v
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
      GROUP BY event_type
    ),
    ab AS (
      SELECT
        (SELECT n FROM arms WHERE event_type = 'click') AS n_a,
        (SELECT m FROM arms WHERE event_type = 'click') AS m_a,
        (SELECT v FROM arms WHERE event_type = 'click') AS v_a,
        (SELECT n FROM arms WHERE event_type = 'purchase') AS n_b,
        (SELECT m FROM arms WHERE event_type = 'purchase') AS m_b,
        (SELECT v FROM arms WHERE event_type = 'purchase') AS v_b
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(m_a - m_b, 6) AS mean_diff,
           round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 6) AS t_stat,
           round(pow(v_a / n_a + v_b / n_b, 2) /
                 (pow(v_a / n_a, 2) / (n_a - 1)
                  + pow(v_b / n_b, 2) / (n_b - 1)), 2) AS dof_welch
    FROM ab
    """,
    doc="A/B experiment readout: Welch's unequal-variance t statistic + "
    "Welch-Satterthwaite degrees of freedom between two event-type arms. "
    "Scale shape: ONE grouped aggregation reduces each arm to 3 "
    "sufficient statistics; the test itself is scalar arithmetic on a "
    "2-row broadcast — the experimentation-platform query at any corpus "
    "size.",
    tags=("ext",),
)
def q_ab_test_welch(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    arms = (
        ev.filter(
            F.col("event_type").isin("click", "purchase")
            & F.col("value").isNotNull()
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    a = arms.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"), F.col("v").alias("v_a")
    )
    b = arms.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"), F.col("v").alias("v_b")
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    return a.join(b).select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(F.col("m_a") - F.col("m_b"), 6).alias("mean_diff"),
        F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se2), 6).alias(
            "t_stat"
        ),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
                + F.pow(F.col("v_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
            ),
            2,
        ).alias("dof_welch"),
    )


@register(
    "vector_norms_arrow",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 6) AS norm
    FROM embeddings
    """,
    doc="E3 mapInArrow seam (ext/features.vector_norms_arrow): per-vector "
    "L2 norm where RecordBatches cross the Python boundary as RAW ARROW "
    "(no pandas object step) and the list values buffer reshapes "
    "zero-copy into one (n, dim) numpy reduction per batch — the "
    "lowest-overhead escape hatch when vector math outgrows SQL "
    "expressions. Oracle is the JVM higher-order form; both compute in "
    "float64.",
    tags=("ext",),
)
def q_vector_norms_arrow(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.features import vector_norms_arrow

    emb = read_sf_table(spark, sf, "embeddings")
    return vector_norms_arrow(emb)


@register(
    "incremental_agg_retractions",
    f"""
    -- oracle = full recompute over (base MINUS deletes) UNION inserts;
    -- the Spark side never rescans base, it adjusts the aggregate state.
    WITH base AS (
      SELECT * FROM events WHERE ts <= TIMESTAMP '{CUTOFF}'
    ),
    inserts AS (
      SELECT * FROM events WHERE ts > TIMESTAMP '{CUTOFF}'
    ),
    deletes AS (SELECT * FROM base WHERE event_id % 20 = 0),
    current_rows AS (
      SELECT * FROM base WHERE event_id % 20 <> 0
      UNION ALL SELECT * FROM inserts
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM current_rows GROUP BY event_type
    """,
    doc="Retraction-aware incremental aggregate maintenance (the "
    "materialized-view DELTA pattern): the standing per-type (count, "
    "sum) state absorbs a CDC batch of inserts AND deletes by sign — "
    "deletes contribute (-1, -value) — in ONE aggregation over the "
    "(small) change batch merged with the (grouped, tiny) state; the "
    "100 TB base table is never rescanned. Groups whose count reaches "
    "zero drop out. Oracle recomputes from scratch.",
    tags=("ext",),
)
def q_incremental_agg_retractions(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    cutoff = F.lit(CUTOFF).cast("timestamp_ntz")
    base = ev.filter(F.col("ts") <= cutoff)
    # standing aggregate state (normally persisted; derived here)
    state = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value")
    )
    # CDC batch: inserts after the cutoff, deletes of some base rows
    inserts = ev.filter(F.col("ts") > cutoff).select(
        "event_type", F.lit(1).alias("sgn"), F.col("value")
    )
    deletes = base.filter(F.col("event_id") % 20 == 0).select(
        "event_type", F.lit(-1).alias("sgn"), F.col("value")
    )
    delta = (
        inserts.unionByName(deletes)
        .groupBy("event_type")
        .agg(
            F.sum("sgn").alias("dn"),
            F.sum(F.col("sgn") * F.col("value")).alias("dsum"),
        )
    )
    merged = (
        state.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias(
                "n"
            ),
            (
                F.coalesce("sum_value", F.lit(0.0))
                + F.coalesce("dsum", F.lit(0.0))
            ).alias("sum_value"),
        )
        .filter(F.col("n") > 0)
    )
    return merged.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round("sum_value", 2).alias("sum_value"),
    )


@register(
    "per_source_quota",
    r"""
    -- same pinned classifier score as quality_classifier_gate
    WITH scored AS (
      SELECT doc_id, source,
             round(1.0 / (1.0 + exp(-(CASE WHEN len(ws) > 0
                 THEN list_sum(ws) / len(ws) ELSE 0.0 END))), 6)
               AS quality_prob
      FROM (
        SELECT doc_id, source,
               list_transform(
                 list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             t -> t <> ''),
                 t -> ((((CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT)
                          % 64) * 37 + 11) % 64) - 32) / 64.0
               ) AS ws
        FROM documents)
    )
    SELECT doc_id, source, quality_prob
    FROM (SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY quality_prob DESC, doc_id)
                      AS rn
          FROM scored)
    WHERE rn <= 10
    """,
    doc="Per-source quota capping (the anti-domination step of pretraining "
    "mixtures: no domain may exceed K docs, best-quality first): rank by "
    "the pinned classifier score within each source, keep the top 10. "
    "Scale shape: Spark compiles the rank<=K filter to WindowGroupLimit "
    "— each source's candidate set truncates to K map-side BEFORE the "
    "exchange/sort materializes the full group, so a 10-billion-doc "
    "domain costs K rows of window state, not |domain|.",
    tags=("ext",),
)
def q_per_source_quota(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.classifier import quality_score

    docs = read_sf_table(spark, sf, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.round(quality_score(F.col("text")), 6).alias("quality_prob"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_prob"), "doc_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


@register(
    "boilerplate_segment_removal",
    r"""
    -- 10-word segments stand in for lines (the corpus has no newlines);
    -- semantics are the MassiveText/CCNet line-dedup pair: first
    -- occurrence wins WITHIN a doc, segments seen in > 20% of a
    -- source's docs are boilerplate and drop everywhere.
    WITH segs AS (
      SELECT doc_id, source, CAST(t.i AS BIGINT) AS pos,
             array_to_string(w[t.i * 10 + 1 : t.i * 10 + 10], ' ') AS seg
      FROM (SELECT doc_id, source,
                   list_filter(regexp_split_to_array(lower(trim(text)),
                                                     '\s+'), x -> x <> '')
                     AS w
            FROM documents),
           UNNEST(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS t(i)
    ),
    intra AS (
      SELECT doc_id, source, seg, min(pos) AS pos
      FROM segs GROUP BY doc_id, source, seg
    ),
    src_docs AS (
      SELECT source, count(DISTINCT doc_id) AS nd FROM segs GROUP BY source
    ),
    seg_df AS (
      SELECT source, seg, count(*) AS df FROM intra GROUP BY source, seg
    ),
    kept AS (
      SELECT i.* FROM intra i
      JOIN seg_df d ON d.source = i.source AND d.seg = i.seg
      JOIN src_docs n ON n.source = i.source
      WHERE d.df <= 0.2 * n.nd
    ),
    rebuilt AS (
      SELECT doc_id,
             count(*) AS n_kept,
             md5(string_agg(seg, ' ' ORDER BY pos)) AS text_md5
      FROM kept GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, count(*) AS n_seg FROM segs GROUP BY doc_id)
    SELECT t.doc_id, CAST(t.n_seg AS BIGINT) AS n_seg,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           r.text_md5
    FROM totals t LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
    """,
    doc="Line-level dedup + boilerplate removal (the MassiveText/CCNet "
    "preprocessing pair, over 10-word segments since the corpus has no "
    "newlines): within-doc first-occurrence dedup, then segments "
    "appearing in > 20% of a source's docs (headers, nav, legal "
    "boilerplate) drop corpus-wide; docs reassemble in original segment "
    "order (md5-pinned). Scale shape: segments are slim (doc, pos, seg) "
    "rows; the df aggregation is map-side combined per (source, seg); "
    "the boilerplate table joins back keyed — no doc ever compares to "
    "another doc directly.",
    tags=("ext", "bench2"),
)
def q_boilerplate_segment_removal(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    w = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    nseg = F.ceil(F.size("w") / F.lit(10.0)).cast("int")
    segs = (
        docs.select("doc_id", "source", w.alias("w"))
        # zero-token docs have no segments (F.sequence(0, -1) would emit a
        # DESCENDING [0, -1] — phantom segments the oracle's range() lacks)
        .filter(F.size("w") > 0)
        .select(
            "doc_id",
            "source",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), nseg - 1),
                    lambda i: F.array_join(
                        F.slice(F.col("w"), i * 10 + 1, 10), " "
                    ),
                )
            ).alias("pos", "seg"),
        )
        .select("doc_id", "source", F.col("pos").cast("bigint").alias("pos"), "seg")
    )
    intra = segs.groupBy("doc_id", "source", "seg").agg(
        F.min("pos").alias("pos")
    )
    src_docs = segs.groupBy("source").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    seg_df = intra.groupBy("source", "seg").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        intra.join(seg_df, ["source", "seg"])
        .join(F.broadcast(src_docs), "source")
        .filter(F.col("df") <= 0.2 * F.col("nd"))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "seg"))
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            )
        ).alias("text_md5"),
    )
    totals = segs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_seg"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.col("n_seg").cast("bigint").alias("n_seg"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        "text_md5",
    )


@register(
    "value_histogram",
    """
    WITH bounds AS (
      SELECT min(value) AS lo, max(value) AS hi FROM events
      WHERE value IS NOT NULL
    )
    -- DuckDB has no width_bucket; the SQL-standard closed form
    SELECT CAST(CASE WHEN value < lo THEN 0
                     WHEN value >= hi THEN 21
                     ELSE 1 + floor((value - lo) * 20 / (hi - lo)) END
                AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 6) AS lo_val,
           round(max(value), 6) AS hi_val
    FROM events, bounds
    WHERE value IS NOT NULL
    GROUP BY bucket
    """,
    doc="Equi-width histogram via the SQL-standard width_bucket: one "
    "stats pass for (min, max) broadcast as scalars, one "
    "map-side-combined count per bucket — the numeric-profiling query "
    "(data-quality dashboards, drift detection) at any scale. The "
    "max value lands in the overflow bucket n+1 per the standard.",
    tags=("functions",),
)
def q_value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        F.col("value").isNotNull()
    )
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    return (
        ev.join(F.broadcast(bounds))
        .groupBy(
            F.expr("width_bucket(value, lo, hi, 20)")
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("value"), 6).alias("lo_val"),
            F.round(F.max("value"), 6).alias("hi_val"),
        )
    )


@register(
    "decimal_arithmetic_funcs",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS VARCHAR)
             AS sum_price_dec,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(1 - l_discount AS DECIMAL(18, 6)))
                AS DECIMAL(38, 8)) :: VARCHAR AS disc_price_dec,
           CAST(avg(CAST(l_quantity AS DECIMAL(12, 2))) :: DECIMAL(16, 6)
                AS VARCHAR) AS avg_qty_dec,
           CAST(round(CAST(l_tax AS DECIMAL(8, 4)), 2) AS VARCHAR) AS tax_r
    FROM lineitem
    GROUP BY l_returnflag, round(CAST(l_tax AS DECIMAL(8, 4)), 2)
    """,
    doc="Exact DECIMAL arithmetic semantics — the money-math surface "
    "(doubles drift under reordered 100 TB partial sums; decimals are "
    "exact and associative, so the distributed aggregation is "
    "bit-reproducible regardless of partitioning). Exercises precision/"
    "scale propagation through sum, multiply (scale adds), avg (scale "
    "widens), and round; results rendered as strings so the value hash "
    "compares exact digits, not float re-parses.",
    tags=("functions",),
)
def q_decimal_arithmetic_funcs(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_dec = (F.lit(1) - F.col("l_discount")).cast("decimal(18,6)")
    return (
        li.groupBy(
            "l_returnflag",
            F.round(F.col("l_tax").cast("decimal(8,4)"), 2).alias("__taxr"),
        )
        .agg(
            F.sum(price_dec).cast("string").alias("sum_price_dec"),
            F.sum(price_dec * disc_dec)
            .cast("decimal(38,8)")
            .cast("string")
            .alias("disc_price_dec"),
            F.avg(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(16,6)")
            .cast("string")
            .alias("avg_qty_dec"),
        )
        .select(
            "l_returnflag",
            "sum_price_dec",
            "disc_price_dec",
            "avg_qty_dec",
            F.col("__taxr").cast("string").alias("tax_r"),
        )
    )


@register(
    "data_quality_checks",
    """
    SELECT
      CAST((SELECT count(*) FROM events
            WHERE event_id IS NULL OR user_id IS NULL) AS BIGINT)
        AS ev_null_keys,
      CAST((SELECT count(*) FROM events
            WHERE event_type NOT IN
              ('click', 'view', 'purchase', 'signup', 'refund'))
           AS BIGINT) AS ev_bad_type,
      CAST((SELECT count(*) FROM orders
            WHERE o_totalprice < 0 OR o_totalprice > 1e9) AS BIGINT)
        AS ord_price_range,
      CAST((SELECT coalesce(sum(n - 1), 0) FROM
              (SELECT count(*) AS n FROM events GROUP BY event_id))
           AS BIGINT) AS ev_dup_ids,
      CAST((SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
           AS BIGINT) AS ord_orphans,
      CAST((SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
           AS BIGINT) AS li_orphans
    """,
    doc="Declarative data-quality audit (ext/expectations.py — the "
    "dbt-test/Deequ pattern): NOT NULL + accepted-values + range checks "
    "fuse into ONE aggregate pass per table (analyzer-batch shape, not "
    "one job per rule); key uniqueness is a grouped surplus count "
    "(map-side combined); referential integrity is a counted left-anti "
    "join per FK edge (parent broadcast at dimension size). The whole "
    "audit ships 6 integers to the driver.",
    tags=("ext",),
)
def q_data_quality_checks(spark: SparkSession, sf: str) -> DataFrame:
    from .ext import expectations as X

    ev = read_sf_table(spark, sf, "events")
    orders = read_sf_table(spark, sf, "orders")
    li = read_sf_table(spark, sf, "lineitem")
    cust = read_sf_table(spark, sf, "customer")
    ev_checks = X.run_checks(
        ev,
        {
            "ev_null_keys": X.not_null(["event_id", "user_id"]),
            "ev_bad_type": X.accepted_values(
                "event_type",
                ["click", "view", "purchase", "signup", "refund"],
            ),
        },
    )
    ord_checks = X.run_checks(
        orders,
        {"ord_price_range": X.in_range("o_totalprice", 0, 1e9)},
    )
    dup = X.unique_violations(ev, ["event_id"]).withColumnRenamed(
        "surplus_rows", "ev_dup_ids"
    )
    ord_orphans = X.fk_violations(
        orders, "o_custkey", cust, "c_custkey"
    ).withColumnRenamed("orphan_rows", "ord_orphans")
    li_orphans = X.fk_violations(
        li, "l_orderkey", orders, "o_orderkey"
    ).withColumnRenamed("orphan_rows", "li_orphans")
    return (
        ev_checks.join(ord_checks)
        .join(dup)
        .join(ord_orphans)
        .join(li_orphans)
        .select(
            "ev_null_keys",
            "ev_bad_type",
            "ord_price_range",
            "ev_dup_ids",
            "ord_orphans",
            "li_orphans",
        )
    )


@register(
    "transpose_type_stats",
    """
    -- the transposed layout restated: one row per metric, one column per
    -- event_type (pivot of a 5-row aggregate — driver-sized by design)
    WITH s AS (
      SELECT event_type, round(avg(value), 4) AS avg_v,
             round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT 'avg_v' AS key,
           max(CASE WHEN event_type = 'click' THEN avg_v END) AS click,
           max(CASE WHEN event_type = 'purchase' THEN avg_v END) AS purchase,
           max(CASE WHEN event_type = 'error' THEN avg_v END) AS error,
           max(CASE WHEN event_type = 'signup' THEN avg_v END) AS signup,
           max(CASE WHEN event_type = 'view' THEN avg_v END) AS view
    FROM s
    UNION ALL
    SELECT 'max_v',
           max(CASE WHEN event_type = 'click' THEN max_v END),
           max(CASE WHEN event_type = 'purchase' THEN max_v END),
           max(CASE WHEN event_type = 'error' THEN max_v END),
           max(CASE WHEN event_type = 'signup' THEN max_v END),
           max(CASE WHEN event_type = 'view' THEN max_v END)
    FROM s
    UNION ALL
    SELECT 'min_v',
           max(CASE WHEN event_type = 'click' THEN min_v END),
           max(CASE WHEN event_type = 'purchase' THEN min_v END),
           max(CASE WHEN event_type = 'error' THEN min_v END),
           max(CASE WHEN event_type = 'signup' THEN min_v END),
           max(CASE WHEN event_type = 'view' THEN min_v END)
    FROM s
    """,
    doc="Spark 4 DataFrame.transpose over a per-type stats aggregate — "
    "rows become columns (the metrics-dashboard layout). Correctly used "
    "ONLY on an aggregate: transpose materializes the input to derive "
    "the output schema, so the transposed relation must be "
    "driver-sized; the corpus-scale work is the grouped aggregation "
    "that precedes it. Oracle restates the pivot with conditional "
    "aggregates.",
    tags=("functions",),
)
def q_transpose_type_stats(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        F.col("value").isNotNull()
    )
    s = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_v"),
        F.round(F.min("value"), 4).alias("min_v"),
        F.round(F.max("value"), 4).alias("max_v"),
    )
    return s.transpose("event_type")


@register(
    "hourly_seasonal_anomalies",
    f"""
    -- hour-of-day profile per event_type -> residual z-score -> anomaly
    -- flag; tsutil-equivalent hour extraction is just hour() (no epoch
    -- math needed, NTZ-safe in both engines)
    WITH hourly AS (
      SELECT event_type, date_part('hour', ts) AS hod,
             CAST(date_trunc('hour', ts) AS DATE) AS day,
             sum(value) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, date_part('hour', ts),
               CAST(date_trunc('hour', ts) AS DATE)
    ),
    profile AS (
      SELECT event_type, hod, avg(v) AS mu, stddev_samp(v) AS sigma
      FROM hourly GROUP BY event_type, hod
    )
    SELECT h.event_type, CAST(h.hod AS INT) AS hod,
           CAST(h.day AS VARCHAR) AS day,
           round(h.v, 4) AS v,
           round((h.v - p.mu) / nullif(p.sigma, 0), 4) AS z,
           coalesce(abs(round((h.v - p.mu) / nullif(p.sigma, 0), 4)) > 2.5,
                    false) AS is_anomaly
    FROM hourly h JOIN profile p
      ON p.event_type = h.event_type AND p.hod = h.hod
    """,
    doc="Seasonal anomaly detection (the ops-dashboard query): per-type "
    "hour-of-day seasonal profile (mu, sigma over daily observations of "
    "that hour) joined back for residual z-scores; |z| > 2.5 flags. "
    "Scale shape: the corpus reduces to (type, hour, day) partial sums "
    "in ONE map-side-combined aggregation; the profile is |types|x24 "
    "rows broadcast back — seasonal baselines at 100 TB cost one scan.",
    tags=("ext",),
)
def q_hourly_seasonal_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        F.col("value").isNotNull()
    )
    hourly = ev.groupBy(
        "event_type",
        F.hour("ts").alias("hod"),
        F.to_date(F.date_trunc("hour", F.col("ts"))).alias("day"),
    ).agg(F.sum("value").alias("v"))
    profile = hourly.groupBy("event_type", "hod").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sigma")
    )
    z = (F.col("v") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0))
    return (
        hourly.join(F.broadcast(profile), ["event_type", "hod"])
        .select(
            "event_type",
            F.col("hod").cast("int").alias("hod"),
            F.col("day").cast("string").alias("day"),
            F.round("v", 4).alias("v"),
            F.round(z, 4).alias("z"),
            # flag on the ROUNDED z so the boolean is engine-stable
            F.coalesce(F.abs(F.round(z, 4)) > 2.5, F.lit(False)).alias(
                "is_anomaly"
            ),
        )
    )


@register(
    "cusum_drift_detection",
    """
    -- one-sided CUSUM S_t = max(0, S_{t-1} + (x_t - mu - slack)) unrolled
    -- to window algebra: S_t = P_t - min(0, min_{i<=t} P_i) with P the
    -- running sum of (x - mu - slack) — the max(0,...) recursion is
    -- exactly "prefix sum minus its running minimum INCLUDING the empty
    -- prefix P_0 = 0" (without the least(...,0) a series whose first
    -- deviations are positive would be under-reported)
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             sum(value) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    mu AS (SELECT event_type, avg(v) AS mu FROM daily GROUP BY event_type),
    p AS (
      SELECT d.event_type, d.day, d.v,
             sum(d.v - m.mu - 5.0) OVER
               (PARTITION BY d.event_type ORDER BY d.day
                ROWS UNBOUNDED PRECEDING) AS pref
      FROM daily d JOIN mu m ON m.event_type = d.event_type
    )
    SELECT event_type, day, round(v, 4) AS v,
           round(pref - least(min(pref) OVER
                   (PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING), 0.0), 4) AS cusum,
           round(pref - least(min(pref) OVER
                   (PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING), 0.0), 4) > 50.0
             AS drift_alarm
    FROM p
    """,
    doc="CUSUM drift detection (Page's test — the data-drift monitor for "
    "a production pipeline): one-sided CUSUM of daily value sums per "
    "event type against the type mean with slack 5, alarm above 50. The "
    "max(0, ...) recursion unrolls to prefix-sum minus running-min — "
    "two frames over ONE per-type sort, no recursion, no UDF. Scale "
    "shape: the corpus reduces to (type, day) partials map-side; the "
    "windows run over |types| x |days| rows only.",
    tags=("ext",),
)
def q_cusum_drift_detection(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        F.col("value").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("__d")
    ).agg(F.sum("value").alias("v"))
    mu = daily.groupBy("event_type").agg(F.avg("v").alias("mu"))
    w = Window.partitionBy("event_type").orderBy("__d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = daily.join(F.broadcast(mu), "event_type").withColumn(
        "pref", F.sum(F.col("v") - F.col("mu") - 5.0).over(w)
    )
    cusum = F.col("pref") - F.least(F.min("pref").over(w), F.lit(0.0))
    return p.select(
        "event_type",
        F.col("__d").cast("string").alias("day"),
        F.round("v", 4).alias("v"),
        F.round(cusum, 4).alias("cusum"),
        # alarm on the ROUNDED value so the boolean is engine-stable
        (F.round(cusum, 4) > 50.0).alias("drift_alarm"),
    )


@register(
    "seasonal_naive_backtest",
    """
    -- forecast v(d) := v(d - 7 days) (seasonal-naive, the canonical
    -- baseline every forecasting system must beat), scored by MAE/MAPE
    -- per event type; the 7-day lag is an exact date self-join, not a
    -- row lag, so calendar gaps cannot misalign the season
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_scored,
           round(avg(abs(d.v - p.v)), 4) AS mae,
           round(avg(abs(d.v - p.v) / nullif(abs(d.v), 0)), 6) AS mape
    FROM daily d
    JOIN daily p ON p.event_type = d.event_type
                AND p.day = d.day - INTERVAL 7 DAY
    GROUP BY d.event_type
    """,
    doc="Seasonal-naive forecast backtest (the baseline MAE/MAPE every "
    "forecasting deployment reports): predict each day's per-type total "
    "with the value 7 days earlier via an exact date self-join (row-lag "
    "would misalign across calendar gaps), score in one aggregation. "
    "Scale shape: the corpus reduces to (type, day) partials map-side; "
    "the self-join and scoring run over |types| x |days| rows.",
    tags=("ext",),
)
def q_seasonal_naive_backtest(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        F.col("value").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("v"))
    d = daily.alias("d")
    p = daily.alias("p")
    err = F.abs(F.col("d.v") - F.col("p.v"))
    return (
        d.join(
            p,
            (F.col("p.event_type") == F.col("d.event_type"))
            & (F.col("p.day") == F.date_sub(F.col("d.day"), 7)),
        )
        .groupBy(F.col("d.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.round(F.avg(err), 4).alias("mae"),
            F.round(
                F.avg(err / F.nullif(F.abs(F.col("d.v")), F.lit(0.0))), 6
            ).alias("mape"),
        )
    )


@register(
    "entity_resolution_customers",
    """
    -- the same deterministic corruption + block + score + rank-1 match
    WITH dirty AS (
      SELECT c_custkey AS dirty_id, c_nationkey,
             concat(substring(c_name, 1, CAST(c_custkey % 10 + 3 AS INT) - 1),
                    substring(c_name, CAST(c_custkey % 10 + 3 AS INT) + 1))
               AS dname
      FROM customer
    ),
    cand AS (
      -- blocking: nation + the corruption-surviving right(name, 6)
      -- (a single deletion at position 3..12 of 'Customer#%09d' always
      -- preserves the last 6 chars — 100% recall, ~1-row blocks)
      SELECT d.dirty_id, d.dname, c.c_custkey AS cid, c.c_name AS cname
      FROM dirty d JOIN customer c
        ON c.c_nationkey = d.c_nationkey
       AND right(c.c_name, 6) = right(d.dname, 6)
      WHERE abs(length(d.dname) - length(c.c_name)) <= 1
    ),
    best AS (
      SELECT dirty_id, cid, dist FROM (
        SELECT dirty_id, cid, levenshtein(dname, cname) AS dist,
               row_number() OVER (PARTITION BY dirty_id
                                  ORDER BY levenshtein(dname, cname), cid)
                 AS rk
        FROM cand)
      WHERE rk = 1
    ),
    resolved AS (
      -- left-join back: zero-candidate records count as misses
      SELECT d.dirty_id, b.cid, b.dist
      FROM dirty d LEFT JOIN best b ON b.dirty_id = d.dirty_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_records,
           CAST(count(cid) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN cid = dirty_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(avg(CASE WHEN cid = dirty_id THEN 1.0 ELSE 0.0 END), 4)
             AS accuracy,
           round(avg(dist), 4) AS avg_edit_dist
    FROM resolved
    """,
    doc="Entity resolution end-to-end (ext/er.py — block -> score -> "
    "rank-1 match): every customer name is deterministically corrupted "
    "(one char deleted at a key-derived position), then resolved back "
    "against the clean list WITHOUT the key — blocking equi-join on "
    "nation + a name-length band prunes candidates, levenshtein scores "
    "map-side, WindowGroupLimit keeps each record's best match. Ground "
    "truth is known by construction, so the output is the match "
    "accuracy report every MDM deployment watches. Scale: cost is "
    "sum-over-blocks |L_b|x|R_b|; blocking-key choice is the knob.",
    tags=("ext",),
)
def q_entity_resolution_customers(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.er import resolve_entities

    cust = read_sf_table(spark, sf, "customer")
    dirty = cust.select(
        F.col("c_custkey").alias("dirty_id"),
        "c_nationkey",
        F.concat(
            F.expr("substring(c_name, 1, CAST(c_custkey % 10 + 3 AS INT) - 1)"),
            F.expr("substring(c_name, CAST(c_custkey % 10 + 3 AS INT) + 1)"),
        ).alias("dname"),
    )
    # corruption-tolerant second blocking key: a single deletion at
    # position 3..12 of 'Customer#%09d' always preserves the LAST 6
    # chars, so right(name, 6) has 100% recall by construction while
    # shrinking blocks from |nation| (6,000 rows at sf1 -> 900M
    # levenshtein pairs, the full sf1 sweep's slowest task by an hour)
    # to ~1 row. Blocking-key choice is the documented cost knob; this
    # is the knob turned.
    best = resolve_entities(
        dirty.withColumn("__sfx", F.expr("right(dname, 6)")),
        cust.withColumn("__sfx", F.expr("right(c_name, 6)")),
        block_cols=["c_nationkey", "__sfx"],
        dirty_id="dirty_id",
        clean_id="c_custkey",
        dirty_name="dname",
        clean_name="c_name",
    )
    hit = F.coalesce(
        (F.col("matched_id") == F.col("dirty_id")).cast("int"), F.lit(0)
    )
    return best.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.count("matched_id").cast("bigint").alias("n_matched"),
        F.sum(hit).cast("bigint").alias("n_correct"),
        F.round(F.avg(hit.cast("double")), 4).alias("accuracy"),
        F.round(F.avg("edit_dist"), 4).alias("avg_edit_dist"),
    )


@register(
    "markov_event_transitions",
    """
    -- first-order Markov chain over each user's event stream
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type, count(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE) /
                 sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM cnt
    """,
    doc="First-order Markov transition matrix over per-user event "
    "streams (the sequence-model / next-event-prediction baseline): "
    "lead() pairs consecutive events within each user (deterministic "
    "(ts, event_id) order), transition counts aggregate map-side, and "
    "row-normalization is a window over the |types|^2 count matrix. "
    "Scale shape: ONE shuffle keyed by user for the sequencing; the "
    "matrix itself is tiny.",
    tags=("ext",),
)
def q_markov_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wnorm = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wnorm), 6
        ).alias("p"),
    )


@register(
    "gini_value_concentration",
    """
    -- Gini coefficient per event type from the sorted-cumulative form:
    -- G = (2 * sum(i * x_i)) / (n * sum(x)) - (n + 1) / n
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS i
      FROM events WHERE value IS NOT NULL AND value >= 0
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(2.0 * sum(i * value) / (count(*) * sum(value))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked GROUP BY event_type
    """,
    doc="Gini concentration of value per event type (the inequality "
    "metric behind revenue-concentration and whale-detection "
    "dashboards): the sorted-cumulative closed form needs one rank "
    "window per type plus one aggregation — no pairwise |x_i - x_j| "
    "comparison (the naive definition is O(n^2)). Deterministic "
    "(value, event_id) rank order keeps tied values engine-stable.",
    tags=("ext",),
)
def q_gini_value_concentration(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type", "value", F.row_number().over(w).alias("i")
    )
    n = F.count(F.lit(1))
    return ranked.groupBy("event_type").agg(
        n.cast("bigint").alias("n"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("value")) / (n * F.sum("value"))
            - (n + 1.0) / n,
            6,
        ).alias("gini"),
    )


@register(
    "benford_first_digit",
    """
    -- observed first-significant-digit distribution vs Benford's law,
    -- chi-square statistic per event type
    -- first significant digit by scanning the shortest-roundtrip string
    -- for the first nonzero digit: float math (v / 10^floor(log10 v))
    -- rounds values like 0.7 to 6.999... and misbins them; the string
    -- scan is exact and engine-portable (both engines print the same
    -- significand for the same double)
    WITH digits AS (
      SELECT event_type,
             CAST(regexp_extract(CAST(value AS VARCHAR), '[1-9]', 0)
                  AS INT) AS d
      FROM events WHERE value IS NOT NULL AND value > 0
    ),
    obs AS (
      SELECT event_type, d, count(*) AS n FROM digits GROUP BY event_type, d
    ),
    tot AS (SELECT event_type, sum(n) AS tn FROM obs GROUP BY event_type)
    SELECT o.event_type,
           CAST(sum(o.n) AS BIGINT) AS n_values,
           round(sum(pow(o.n - t.tn * log10(1.0 + 1.0 / o.d), 2)
                     / (t.tn * log10(1.0 + 1.0 / o.d))), 4) AS chi2
    FROM obs o JOIN tot t ON t.event_type = o.event_type
    GROUP BY o.event_type
    """,
    doc="Benford first-digit test per event type (the forensic-audit "
    "screen for fabricated numeric data): first significant digit via "
    "log10 normalization, observed counts vs the Benford expectation "
    "log10(1 + 1/d), Pearson chi-square statistic. One "
    "map-side-combined count over the corpus; the test itself runs on "
    "|types| x 9 rows.",
    tags=("ext",),
)
def q_benford_first_digit(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    digits = ev.select(
        "event_type",
        # first nonzero digit of the shortest-roundtrip string — exact,
        # unlike v / 10^floor(log10 v), which rounds 0.7 to 6.999...
        F.regexp_extract(F.col("value").cast("string"), "[1-9]", 0)
        .cast("int")
        .alias("d"),
    )
    obs = digits.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = obs.groupBy("event_type").agg(F.sum("n").alias("tn"))
    exp = F.col("tn") * F.log10(1.0 + 1.0 / F.col("d"))
    return (
        obs.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_values"),
            F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 4).alias(
                "chi2"
            ),
        )
    )


@register(
    "token_entropy_by_source",
    r"""
    WITH toks AS (
      SELECT source, t.tok
      FROM documents,
           UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    tc AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok),
    tt AS (SELECT source, sum(c) AS n FROM tc GROUP BY source)
    SELECT tc.source,
           CAST(tt.n AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           round(-sum((c / CAST(tt.n AS DOUBLE))
                      * ln(c / CAST(tt.n AS DOUBLE))), 6) AS entropy_nats
    FROM tc JOIN tt ON tt.source = tc.source
    GROUP BY tc.source, tt.n
    """,
    doc="Shannon token entropy per source (the mixture-design diversity "
    "metric: low-entropy sources are repetitive/templated, high-entropy "
    "ones carry more information per token): one explode + one "
    "map-side-combined (source, token) count; the entropy sum runs over "
    "the vocabulary, orders of magnitude smaller than the corpus.",
    tags=("ext",),
)
def q_token_entropy_by_source(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    tc = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    tt = tc.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    return (
        tc.join(tt, "source")
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
        )
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_tokens"),
            "vocab",
            "entropy_nats",
        )
    )


@register(
    "zipf_slope_fit",
    r"""
    -- rank-frequency log-log OLS slope (natural language ~ -1)
    WITH tc AS (
      SELECT tok, count(*) AS c
      FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
              AS tok FROM documents)
      WHERE tok <> '' GROUP BY tok
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM tc
    )
    SELECT CAST(count(*) AS BIGINT) AS vocab,
           round(regr_slope(ln(c), ln(r)), 4) AS zipf_slope,
           round(regr_r2(ln(c), ln(r)), 4) AS r2
    FROM ranked
    """,
    doc="Zipf's-law fit over the corpus rank-frequency curve (corpus-QA "
    "diagnostic: natural language fits slope ~ -1; templated or "
    "synthetic text deviates): token counts aggregate map-side, the "
    "log-log OLS runs via regr_* sufficient statistics over the "
    "vocabulary only. The rank window sorts |vocab| rows — "
    "distributed_shuffle_rank is the swap-in if a vocabulary ever "
    "outgrows one reducer.",
    tags=("ext",),
)
def q_zipf_slope_fit(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    tc = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy(F.desc("c"), "tok")
    ranked = tc.withColumn("r", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.round(F.expr("regr_slope(ln(c), ln(r))"), 4).alias("zipf_slope"),
        F.round(F.expr("regr_r2(ln(c), ln(r))"), 4).alias("r2"),
    )


@register(
    "daily_autocorrelation",
    """
    -- lag-1 and lag-7 autocorrelation of the daily value series per type
    -- via exact date self-joins (gap-safe) + the corr aggregate
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT d.event_type,
           round(corr(d.v, l1.v), 6) AS acf_lag1,
           round(corr(d.v, l7.v), 6) AS acf_lag7
    FROM daily d
    LEFT JOIN daily l1 ON l1.event_type = d.event_type
                      AND l1.day = d.day - INTERVAL 1 DAY
    LEFT JOIN daily l7 ON l7.event_type = d.event_type
                      AND l7.day = d.day - INTERVAL 7 DAY
    GROUP BY d.event_type
    """,
    doc="Daily autocorrelation (lag 1 and 7) of per-type value series — "
    "the seasonality screen that justifies seasonal_naive_backtest's "
    "weekly lag: exact date self-joins (row-lag would misalign across "
    "calendar gaps) feed the corr sufficient-statistics aggregate. "
    "Corpus reduces to (type, day) partials map-side; joins run over "
    "|types| x |days| rows.",
    tags=("ext",),
)
def q_daily_autocorrelation(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        F.col("value").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("v"))
    d, l1, l7 = daily.alias("d"), daily.alias("l1"), daily.alias("l7")
    return (
        d.join(
            l1,
            (F.col("l1.event_type") == F.col("d.event_type"))
            & (F.col("l1.day") == F.date_sub(F.col("d.day"), 1)),
            "left",
        )
        .join(
            l7,
            (F.col("l7.event_type") == F.col("d.event_type"))
            & (F.col("l7.day") == F.date_sub(F.col("d.day"), 7)),
            "left",
        )
        .groupBy(F.col("d.event_type").alias("event_type"))
        .agg(
            F.round(F.corr(F.col("d.v"), F.col("l1.v")), 6).alias(
                "acf_lag1"
            ),
            F.round(F.corr(F.col("d.v"), F.col("l7.v")), 6).alias(
                "acf_lag7"
            ),
        )
    )


@register(
    "ks_two_sample_test",
    """
    -- two-sample Kolmogorov-Smirnov D between the click and purchase
    -- value distributions: per DISTINCT value, both groups' counts ->
    -- running CDFs -> max |F1 - F2| (evaluating at distinct values
    -- AFTER ties are grouped makes D tie-order-insensitive)
    WITH vals AS (
      SELECT value,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
      GROUP BY value
    ),
    tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM vals),
    cdf AS (
      SELECT sum(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
               / CAST(t.n1 AS DOUBLE) AS f1,
             sum(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
               / CAST(t.n2 AS DOUBLE) AS f2,
             t.n1, t.n2
      FROM vals, tot t
    )
    SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
           round(max(abs(f1 - f2)), 6) AS ks_d,
           round(max(abs(f1 - f2))
                 * sqrt(max(n1) * max(n2) / (max(n1) + max(n2) + 0.0)),
                 6) AS ks_stat
    FROM cdf
    """,
    doc="Two-sample Kolmogorov-Smirnov test (distribution-shift detector "
    "between two event-type arms — the nonparametric sibling of "
    "ab_test_welch): grouping ties into distinct values FIRST makes the "
    "running-CDF difference order-insensitive; D is one window + one "
    "max. The global-ordered window runs over |distinct values| rows — "
    "operators.distributed_cumsum is the documented swap-in when that "
    "outgrows one reducer; at 100 TB a KLL-sketch CDF comparison is the "
    "approximate path.",
    tags=("ext",),
)
def q_ks_two_sample_test(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("click", "purchase")
    )
    vals = ev.groupBy("value").agg(
        F.sum((F.col("event_type") == "click").cast("int")).alias("c1"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("c2"),
    )
    tot = vals.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = vals.join(F.broadcast(tot)).select(
        (F.sum("c1").over(w) / F.col("n1").cast("double")).alias("f1"),
        (F.sum("c2").over(w) / F.col("n2").cast("double")).alias("f2"),
        "n1",
        "n2",
    )
    d = F.max(F.abs(F.col("f1") - F.col("f2")))
    return cdf.agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.round(d, 6).alias("ks_d"),
        F.round(
            d
            * F.sqrt(
                F.max("n1") * F.max("n2")
                / (F.max("n1") + F.max("n2") + F.lit(0.0))
            ),
            6,
        ).alias("ks_stat"),
    )


@register(
    "split_leakage_neardups",
    r"""
    -- exact near-dup pairs (same threshold as the minhash oracle) with
    -- each side's deterministic split; cross-split pairs are leakage
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2) i
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ),
    splits AS (
      SELECT doc_id,
             CASE WHEN u < 0.1 THEN 'test'
                  WHEN u < 0.2 THEN 'val' ELSE 'train' END AS split
      FROM (SELECT doc_id,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8)) AS BIGINT)
                     / 4294967296.0 AS u
            FROM documents)
    )
    SELECT least(sa.split, sb.split) AS split_x,
           greatest(sa.split, sb.split) AS split_y,
           CAST(count(*) AS BIGINT) AS n_pairs,
           (sa.split <> sb.split) AS is_leakage
    FROM pairs p
    JOIN splits sa ON sa.doc_id = p.doc_a
    JOIN splits sb ON sb.doc_id = p.doc_b
    GROUP BY least(sa.split, sb.split), greatest(sa.split, sb.split),
             sa.split <> sb.split
    """,
    doc="Cross-split near-dup LEAKAGE audit (the eval-integrity check "
    "fuzzy decontamination exists for: a test doc whose near-duplicate "
    "sits in train inflates eval): exact near-dup pairs "
    "join each side's deterministic split assignment; pairs "
    "straddling splits are leakage, reported per split pair. This is "
    "the diagnostic that motivates grouped_split (assign by CONTENT "
    "group, and leakage pairs become structurally impossible). Oracle "
    "restates the exact pair set + the md5 split arithmetic.",
    tags=("ext",),
)
def q_split_leakage_neardups(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import jaccard_pairs
    from .ext.sampling import train_val_test_split

    docs = read_sf_table(spark, sf, "documents")
    # exact pair source (r6): the leakage COUNTS are oracle-compared
    # exactly, so the pair set must be the exact one at any SF — LSH
    # misses near the threshold undercount leakage pairs
    pairs = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    splits = train_val_test_split(docs.select("doc_id"), "doc_id").select(
        "doc_id", "split"
    )
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("__sa")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("__sb")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("__sa", "__sb").alias("split_x"),
            F.greatest("__sa", "__sb").alias("split_y"),
            (F.col("__sa") != F.col("__sb")).alias("is_leakage"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select("split_x", "split_y", "n_pairs", "is_leakage")
    )


@register(
    "sessionized_ordered_funnel",
    f"""
    -- funnel constrained WITHIN a session: steps must occur in order
    -- inside one 30-minute-gap session (funnel_conversion is the
    -- lifetime variant; this is the per-visit one)
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 30 * 60 * 1000000 OR lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    ),
    steps AS (
      SELECT user_id, sid,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM sess GROUP BY user_id, sid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS s_view,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS s_view_click,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         AND t_buy > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS s_full_funnel
    FROM steps
    """,
    doc="Per-SESSION ordered funnel (view -> click -> purchase inside one "
    "30-min-gap session — the per-visit conversion twin of the lifetime "
    "funnel_conversion): sessionization and step extraction share ONE "
    "user-keyed shuffle; per-session first-step timestamps reduce via "
    "conditional mins; the ordering constraint is pure column "
    "comparison. NULL comparisons make missing steps fall out of the "
    "ordered counts without explicit guards.",
    tags=("ext",),
)
def q_sessionized_ordered_funnel(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = tsutil.epoch_micros(F.col("ts")) - tsutil.epoch_micros(
        F.lag("ts").over(w)
    )
    ordered = ev.withColumn(
        "new_s",
        F.when(
            gap_us > 30 * 60 * 1_000_000, 1
        ).when(F.lag("ts").over(w).isNull(), 1).otherwise(0),
    )
    # (ts, event_id) on BOTH the flag and the running-sum windows: a
    # ts-only ROWS frame would assign sids nondeterministically when two
    # same-ts events straddle a session boundary.
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ordered.withColumn("sid", F.sum("new_s").over(ws))
    steps = sess.groupBy("user_id", "sid").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_buy"),
    )
    return steps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.col("t_view").isNotNull().cast("int"))
        .cast("bigint")
        .alias("s_view"),
        F.sum(
            (
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
            ).cast("int")
        )
        .cast("bigint")
        .alias("s_view_click"),
        F.sum(
            (
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_buy") > F.col("t_click"))
            ).cast("int")
        )
        .cast("bigint")
        .alias("s_full_funnel"),
    )


@register(
    "interarrival_time_stats",
    """
    -- per-user inter-event gap distribution, summarized per event count
    -- band (engagement analytics: do heavy users act in bursts?)
    WITH gaps AS (
      SELECT user_id,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)) / 1e6
               AS gap_s
      FROM events
    ),
    per_user AS (
      SELECT user_id, count(*) + 1 AS n_events,
             avg(gap_s) AS mean_gap, median(gap_s) AS med_gap
      FROM gaps WHERE gap_s IS NOT NULL GROUP BY user_id
    )
    SELECT CASE WHEN n_events < 10 THEN 'light'
                WHEN n_events < 50 THEN 'mid' ELSE 'heavy' END AS band,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(mean_gap), 2) AS avg_mean_gap_s,
           round(avg(med_gap), 2) AS avg_median_gap_s
    FROM per_user GROUP BY 1
    """,
    doc="Inter-arrival time analysis (burstiness / engagement cadence): "
    "per-user event gaps via one lag window (tsutil NTZ-safe epochs), "
    "per-user mean/median gap, rolled up into activity bands. One "
    "user-keyed shuffle; the exact per-user median sorts only each "
    "user's gaps (bounded partitions), and the band rollup is "
    "map-side-combined.",
    tags=("ext",),
)
def q_interarrival_time_stats(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (
        tsutil.epoch_micros(F.col("ts"))
        - tsutil.epoch_micros(F.lag("ts").over(w))
    ) / 1e6
    gaps = ev.select("user_id", gap_s.alias("gap_s")).filter(
        F.col("gap_s").isNotNull()
    )
    per_user = gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.avg("gap_s").alias("mean_gap"),
        F.expr("median(gap_s)").alias("med_gap"),
    )
    band = (
        F.when(F.col("n_events") < 10, "light")
        .when(F.col("n_events") < 50, "mid")
        .otherwise("heavy")
    )
    return per_user.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg("mean_gap"), 2).alias("avg_mean_gap_s"),
        F.round(F.avg("med_gap"), 2).alias("avg_median_gap_s"),
    )


# ---------------------------------------------------------------------------
# Round 4: TPC-H completion (q2/q4/q12/q17/q20 shapes on the slimmed schema)
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    -- floor(x*1e4 + 0.5)/1e4, NOT round(): both engines compute the
    -- identical IEEE quotient+min, but round()-on-double diverges on
    -- shortest-decimal-repr ties (the conditional_agg 129.10875 case);
    -- the floor form is pure double arithmetic, bit-identical anywhere
    SELECT eu.s_acctbal, eu.s_name, eu.n_name,
           p.p_partkey, p.p_name,
           floor(c.unit_cost * 10000 + 0.5) / 10000 AS unit_cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN eu    ON eu.s_suppkey = c.l_suppkey
    WHERE p.p_size <= 5
      AND c.unit_cost = (
        SELECT min(c2.unit_cost)
        FROM cost c2 JOIN eu e2 ON e2.s_suppkey = c2.l_suppkey
        WHERE c2.l_partkey = p.p_partkey
      )
    ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier) adapted to the slimmed "
    "schema: partsupp's ps_supplycost is derived as the min observed unit "
    "price per (part, supplier) from lineitem, and the correlated min "
    "subquery is decorrelated into a per-part regional-min join. Scale "
    "shape: the (part, supplier) cost table shuffles once on l_partkey + "
    "l_suppkey; the EU supplier dim (supplier JOIN nation JOIN region) is "
    "a broadcast; the per-part min is a second map-side-combinable agg "
    "reusing the cost exchange under AQE; TakeOrderedAndProject caps the "
    "output. unit_cost equality-joins on the raw double (both engines "
    "compute the identical IEEE division + min), rounding only at output.",
    tags=("analytics",),
)
def q_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem").filter(F.col("l_quantity") > 0)
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = read_sf_table(spark, sf, "supplier")
    n = read_sf_table(spark, sf, "nation")
    r = read_sf_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_cost = cost.join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey)
    part_min = eu_cost.groupBy("l_partkey").agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = read_sf_table(spark, sf, "part").filter(F.col("p_size") <= 5)
    return (
        eu_cost.join(part_min, "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            (F.floor(F.col("unit_cost") * 10000 + 0.5) / 10000).alias(
                "unit_cost"
            ),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): the spec's "
    "commitdate<receiptdate late-line EXISTS becomes shipped-more-than-"
    "60-days-after-order on the slimmed schema — still a correlated "
    "EXISTS on both the key and the outer row's date. Scale shape: the "
    "quarter window pushes to the orders scan, Catalyst decorrelates the "
    "EXISTS to a left-semi hash join on l_orderkey (the date predicate "
    "rides the join condition), and the priority rollup is a tiny "
    "map-side-combined agg.",
    tags=("analytics",),
)
def q_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = read_sf_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp_ntz(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp_ntz(F.lit("1997-04-01")))
    )
    li = read_sf_table(spark, sf, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.timestamp_add("DAY", F.lit(60), o.o_orderdate)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_ship_latency_priority",
    """
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                THEN 'FAST' ELSE 'SLOW' END AS ship_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
    doc="TPC-H Q12 shape (shipping modes & order priority): l_shipmode "
    "doesn't exist on the slimmed schema, so the mode dimension becomes "
    "a derived ship-latency bucket (<=30 days FAST else SLOW) — the "
    "operator under test is unchanged: conditional two-way CASE-sum "
    "pivot over a fact-fact join. Scale shape: the year window pushes to "
    "the lineitem scan, the join shuffles on orderkey only (AQE may "
    "broadcast the filtered side at small SF), and the 2-row rollup is "
    "map-side-combined.",
    tags=("analytics",),
)
def q_q12_ship_latency_priority(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp_ntz(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1998-01-01")))
    )
    o = read_sf_table(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.date_diff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30, "FAST"
    ).otherwise("SLOW")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@register(
    "q17_small_qty_avg_revenue",
    """
    WITH pa AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    -- the money sum rides DECIMAL(38,10) partials (exact and
    -- order-independent — a distributed double sum's last ulp can cross
    -- a .005 boundary; the conditional_agg lesson), and the final
    -- quantization is a DECIMAL(38,2) cast, HALF_UP in both engines
    SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,10))) / 7
                AS DECIMAL(38,2)) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < pa.qty_threshold
    """,
    doc="TPC-H Q17 (small-quantity-order revenue), per-spec form: the "
    "correlated avg-quantity subquery decorrelated into a per-part "
    "aggregate joined back to the fact (the sibling "
    "small_quantity_revenue entry exercises the spark.sql correlated "
    "surface; this one is the canonical DataFrame decorrelation). Scale "
    "shape: brand filter broadcasts the part dim; the per-part avg and "
    "the probe reuse one l_partkey exchange under AQE; single scalar "
    "output row.",
    tags=("analytics",),
)
def q_q17_small_qty_avg_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = read_sf_table(spark, sf, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    p = read_sf_table(spark, sf, "part").filter(
        F.col("p_brand") == "Brand#13"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(38,10)")) / F.lit(7))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q20_dominant_suppliers",
    """
    WITH shipped AS (
      SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS supp_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'large %'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
    ),
    dominant AS (
      SELECT DISTINCT l_suppkey FROM shipped s1
      WHERE s1.supp_qty > 0.5 * (
        SELECT sum(s2.supp_qty) FROM shipped s2
        WHERE s2.l_partkey = s1.l_partkey
      )
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape (potential part promotion): partsupp's "
    "ps_availqty>half-of-shipped test becomes supplier-dominates-part "
    "(supplied >50% of a part's shipped quantity in the year) — the "
    "nested IN + correlated-sum structure is preserved. Scale shape: "
    "name-prefix part filter broadcasts; the (supp, part) and per-part "
    "totals share one l_partkey-keyed exchange (window-sum over the "
    "grouped table, no second fact scan); the supplier probe is a "
    "left-semi broadcast of the tiny dominant-supplier set.",
    tags=("analytics",),
)
def q_q20_dominant_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    p = read_sf_table(spark, sf, "part").filter(
        F.col("p_name").like("large %")
    )
    li = read_sf_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp_ntz(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1998-01-01")))
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    part_total = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn(
            "part_qty", F.sum("supp_qty").over(part_total)
        )
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = read_sf_table(spark, sf, "supplier")
    n = read_sf_table(spark, sf, "nation")
    return (
        s.join(F.broadcast(dominant), s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Round 4: statistical tests + keyword extraction
# ---------------------------------------------------------------------------


@register(
    "chi_square_independence",
    """
    WITH obs AS (
      SELECT event_type, dayofweek(ts) AS dow, count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, sum(o) AS ri FROM obs GROUP BY 1),
    ct AS (SELECT dow, sum(o) AS cj FROM obs GROUP BY 1),
    tot AS (SELECT sum(o) AS n FROM obs)
    SELECT round(tot.n * (sum(obs.o * obs.o / (rt.ri * ct.cj)) - 1), 4)
             AS chi2,
           CAST((SELECT count(*) - 1 FROM rt)
                * (SELECT count(*) - 1 FROM ct) AS BIGINT) AS dof,
           CAST(tot.n AS BIGINT) AS n
    FROM obs
    JOIN rt ON obs.event_type = rt.event_type
    JOIN ct ON obs.dow = ct.dow
    CROSS JOIN tot
    GROUP BY tot.n
    """,
    doc="Chi-squared test of independence (event_type x day-of-week): "
    "uses the identity chi2 = N * (sum o^2/(r_i*c_j) - 1), which needs "
    "only the OBSERVED cells — absent (zero) cells contribute nothing, "
    "so no dense grid materialization. Scale shape: one tiny "
    "(type, dow) contingency agg (map-side combined), row/col totals "
    "re-aggregate the 35-row cell table, everything after the first agg "
    "is broadcast-sized. The dow label convention differs across "
    "engines but chi2 is invariant under relabeling; counts use "
    "DuckDB's dayofweek for the oracle and Spark's dayofweek for the "
    "engine, which only permutes columns of the contingency table.",
    tags=("ext",),
)
def q_chi_square_independence(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("ri"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("cj"))
    tot = obs.agg(F.sum("o").alias("n"))
    r_cnt = rt.agg((F.count(F.lit(1)) - 1).alias("r1"))
    c_cnt = ct.agg((F.count(F.lit(1)) - 1).alias("c1"))
    return (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .join(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.round(
                F.col("n")
                * (
                    F.sum(
                        F.col("o") * F.col("o") / (F.col("ri") * F.col("cj"))
                    )
                    - 1
                ),
                4,
            ).alias("chi2")
        )
        .join(F.broadcast(r_cnt))
        .join(F.broadcast(c_cnt))
        .select(
            "chi2",
            (F.col("r1") * F.col("c1")).cast("bigint").alias("dof"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


@register(
    "mann_whitney_u",
    """
    WITH vals AS (
      -- NULL observations are excluded outright: they carry no rank, and
      -- the engines disagree on NULL sort placement (Spark first,
      -- DuckDB last), which would silently skew b_below
      SELECT value AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE event_type IN ('click', 'error') AND value IS NOT NULL
    ),
    pv AS (
      SELECT v, sum(is_a) AS a_cnt, sum(1 - is_a) AS b_cnt,
             count(*) AS t_cnt
      FROM vals GROUP BY v
    ),
    cum AS (
      SELECT v, a_cnt, b_cnt, t_cnt,
             coalesce(sum(b_cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS b_below
      FROM pv
    ),
    agg AS (
      SELECT sum(a_cnt) AS n1, sum(b_cnt) AS n2,
             sum(a_cnt * (b_below + 0.5 * b_cnt)) AS u1,
             sum(t_cnt * t_cnt * t_cnt - t_cnt) AS tie_term
      FROM cum
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(u1, 2) AS u1,
           round((u1 - n1 * n2 / 2.0)
                 / sqrt((n1 * n2 / 12.0)
                        * ((n1 + n2 + 1)
                           - tie_term / ((n1 + n2) * (n1 + n2 - 1.0)))),
                 4) AS z
    FROM agg
    """,
    doc="Mann-Whitney U rank-sum test (click vs error event values), in "
    "the distributed per-value-count form: instead of globally ranking "
    "every row (an unbounded single-partition sort), rows collapse to "
    "per-distinct-value (a_cnt, b_cnt) first, U1 = sum a_cnt * "
    "(cum_b_below + b_cnt/2) over the ordered DISTINCT values, with the "
    "normal approximation z tie-corrected. Scale shape: the only "
    "ordered window runs over distinct values (bounded cardinality for "
    "fixed-precision metrics), not rows; everything else is map-side "
    "combinable aggregation.",
    tags=("ext",),
)
def q_mann_whitney_u(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_sf_table(spark, sf, "events").filter(
        F.col("event_type").isin("click", "error")
        & F.col("value").isNotNull()
    )
    is_a = F.when(F.col("event_type") == "click", 1).otherwise(0)
    pv = ev.select(F.col("value").alias("v"), is_a.alias("is_a")).groupBy(
        "v"
    ).agg(
        F.sum("is_a").alias("a_cnt"),
        F.sum(1 - F.col("is_a")).alias("b_cnt"),
        F.count(F.lit(1)).alias("t_cnt"),
    )
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = pv.withColumn(
        "b_below", F.coalesce(F.sum("b_cnt").over(w), F.lit(0))
    )
    agg = cum.agg(
        F.sum("a_cnt").alias("n1"),
        F.sum("b_cnt").alias("n2"),
        F.sum(F.col("a_cnt") * (F.col("b_below") + 0.5 * F.col("b_cnt"))).alias(
            "u1"
        ),
        F.sum(
            F.col("t_cnt") * F.col("t_cnt") * F.col("t_cnt") - F.col("t_cnt")
        ).alias("tie_term"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    sigma = F.sqrt(
        (n1 * n2 / 12.0)
        * ((n1 + n2 + 1) - F.col("tie_term") / ((n1 + n2) * (n1 + n2 - 1.0)))
    )
    return agg.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        F.round("u1", 2).alias("u1"),
        F.round((F.col("u1") - n1 * n2 / 2.0) / sigma, 4).alias("z"),
    )


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents,
           UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    df AS (
      SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
    ),
    nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks
      WHERE doc_id % 100 = 0 GROUP BY doc_id, tok
    ),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * (ln((1.0 + nd.n_docs) / (1.0 + df.df)) + 1), 6)
               AS score
      FROM tf JOIN df USING (tok) CROSS JOIN nd
    )
    SELECT doc_id, tok AS term, score, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, tok) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    doc="TF-IDF keyword extraction: top-3 terms per document by smoothed "
    "tf-idf (sklearn's ln((1+N)/(1+df))+1), idf computed over the FULL "
    "corpus while per-doc tf is computed only for the reported doc "
    "sample — the standard fit-on-all/report-on-some split. Scale "
    "shape: df is one map-side-combinable distinct-agg over (tok, "
    "doc_id); the idf table is vocabulary-sized and broadcasts to the "
    "tf probe; the per-doc top-3 is a WindowGroupLimit (rank pushdown), "
    "ranked on the ROUNDED score with a term tie-break so cross-engine "
    "ulp wobble in ln cannot flip ranks.",
    tags=("ext",),
)
def q_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    docs = read_sf_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    df = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )
    nd = toks.agg(F.countDistinct("doc_id").alias("n_docs"))
    tf = (
        toks.filter(F.col("doc_id") % 100 == 0)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * (
                    F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df")))
                    + 1
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            F.col("tok").alias("term"),
            "score",
            F.col("rn").cast("int").alias("rank"),
        )
    )


@register(
    "triangle_count_copurchase",
    """
    WITH pairs AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                      greatest(a.l_partkey, b.l_partkey) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ),
    tri AS (
      SELECT count(*) AS n_tri
      FROM pairs e1
      JOIN pairs e2 ON e2.u = e1.v
      JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    degstats AS (
      SELECT count(*) AS n_nodes, sum(d * (d - 1)) / 2.0 AS n_wedges
      FROM deg
    )
    -- floor form, not round(): both engines hold the identical IEEE
    -- quotient; round()-on-double diverges on shortest-repr ties
    SELECT CAST(degstats.n_nodes AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges,
           CAST(tri.n_tri AS BIGINT) AS n_triangles,
           floor(3.0 * tri.n_tri / degstats.n_wedges * 1000000 + 0.5)
             / 1000000 AS clustering_coeff
    FROM tri, degstats
    """,
    doc="Distributed triangle counting + global clustering coefficient "
    "over the co-purchase graph (parts are nodes; an edge = the two "
    "parts share an order). The compact-forward pattern: edges are "
    "oriented toward their higher-degree endpoint, wedges form by a "
    "same-source self-join (fan-out sum C(outdeg,2), outdeg O(sqrt(m)) "
    "under degree orientation — hub-proof) and close with one hash-join "
    "probe — never an NLJ (the per-order "
    "pair explode is C(items-per-order, 2) via ext.graph."
    "within_group_pairs — max_order_items caps whale orders with "
    "Observation accounting, the same contract as the LSH bucket caps; "
    "registry runs uncapped for oracle parity). Pre-flights the exact "
    "wedge-join volume (one linear agg over the pinned oriented edges) "
    "and raises above 2e9 wedges with the DOULION pointer instead of "
    "dying on shuffle spill — feasibility envelope measured in SCALE.md. "
    "Degree stats and the wedge denominator reuse the edge table. The "
    "extension-family recommendation/graph twin of pagerank (E-family, "
    "SURVEY §2.3).",
    tags=("ext", "bench2"),
)
def q_triangle_count_copurchase(
    spark: SparkSession,
    sf: str,
    *,
    max_order_items: int | None = None,
    observation=None,
    max_wedges: int | None = None,
) -> DataFrame:
    from .ext.graph import _WEDGE_GUARD_DEFAULT, _wedge_preflight, within_group_pairs

    # None = the measured-envelope default (see ext.graph._wedge_preflight);
    # <= 0 = explicit opt-out for clusters with aggregate disk for the spill
    if max_wedges is None:
        max_wedges = _WEDGE_GUARD_DEFAULT
    elif max_wedges <= 0:
        max_wedges = None

    li = read_sf_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    pairs = (
        within_group_pairs(
            li,
            "l_orderkey",
            "l_partkey",
            item_a="u",
            item_b="v",
            max_group_size=max_order_items,
            observation=observation,
            dropped_metric="tri_rows_in_dropped_orders",
            max_metric="tri_max_order_items",
        )
        .select("u", "v")
        .distinct()
        # three self-join consumers (e1/e2/e3) + degrees: pin the edge
        # table so the per-order pair explode runs once
        .localCheckpoint(eager=True)
    )
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionByName(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        # consumed by the orientation join AND degstats: pin the (node, d)
        # table (|V| rows) so the union+shuffle degree pipeline runs once
        .localCheckpoint(eager=True)
    )
    # Degree-ordered orientation (compact-forward; cf. Suri &
    # Vassilvitskii, "Counting triangles and the curse of the last
    # reducer"): orient every edge toward its higher-(degree, id)
    # endpoint. The wedge self-join below fans out as sum C(outdeg, 2),
    # and under degree orientation outdeg is O(sqrt(m)) — id-ordering
    # behaves like a random orientation, whose hub wedges (popular parts
    # co-purchased with thousands of others) dominate the join at scale.
    # The triangle COUNT is orientation-invariant, so the oracle is
    # untouched: each triangle's nodes have a unique rank order r1<r2<r3
    # and exactly one wedge (r1->r2, r1->r3) closed by r2->r3.
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    e_dir = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("dst_d"),
        )
        # three self-join consumers (a/b/c): pin so the orientation joins
        # run once
        .localCheckpoint(eager=True)
    )
    # pre-flight (r8): one linear agg over the pinned oriented edges
    # computes the EXACT wedge-join volume and raises with the DOULION
    # pointer instead of dying on disk — the r7 sf10 attempt spilled
    # ~70 GB and killed the JVM at 4.15G wedges; sf1's 415M ran in 45 s
    _wedge_preflight(e_dir, max_wedges)
    dst_rank_lt = (F.col("a.dst_d") < F.col("b.dst_d")) | (
        (F.col("a.dst_d") == F.col("b.dst_d"))
        & (F.col("a.dst") < F.col("b.dst"))
    )
    tri = (
        e_dir.alias("a")
        .join(
            e_dir.alias("b"),
            (F.col("a.src") == F.col("b.src")) & dst_rank_lt,
        )
        .join(
            e_dir.alias("c"),
            (F.col("c.src") == F.col("a.dst"))
            & (F.col("c.dst") == F.col("b.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    # one pass over deg yields both stats (two separate aggs would plan
    # the union+shuffle degree pipeline twice and cost a third scalar
    # broadcast join)
    degstats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2.0).alias("n_wedges"),
    )
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    # floor form, not F.round: both engines hold the identical IEEE
    # quotient; round()-on-double diverges on shortest-repr ties.
    # NULL when the graph has no wedges (degenerate/capped input) —
    # under ANSI mode an unguarded divide would abort the job
    coeff = F.when(
        F.col("n_wedges") > 0,
        F.floor(3.0 * F.col("n_tri") / F.col("n_wedges") * 1000000 + 0.5)
        / 1000000,
    )
    return (
        tri.join(F.broadcast(degstats))
        .join(F.broadcast(n_edges))
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_tri").cast("bigint").alias("n_triangles"),
            coeff.alias("clustering_coeff"),
        )
    )


@register(
    "triangle_count_doulion",
    """
    -- DOULION (Tsourakakis et al., KDD'09): sparsify by a DETERMINISTIC
    -- portable edge coin (md5 32-bit uniform < floor(0.25*2^32)), exact
    -- triangle count on the sample, scale by 1/p^3 = 64. The coin makes
    -- the estimate itself restatable verbatim — this oracle replays the
    -- full estimator, not a tolerance band; the measured-error contract
    -- vs the exact count is pinned in tests (exact query = ground truth)
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                      greatest(a.l_partkey, b.l_partkey) AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    samp AS MATERIALIZED (
      SELECT u, v FROM pairs
      WHERE CAST(('0x' || substring(md5(u || '_' || v || '_doulion'), 1, 8))
                 AS BIGINT) < 1073741824
    ),
    tri AS (
      SELECT count(*) AS n_tri
      FROM samp e1
      JOIN samp e2 ON e2.u = e1.v
      JOIN samp e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT count(*) FROM samp) AS BIGINT) AS n_edges_sampled,
           CAST(tri.n_tri AS BIGINT) AS n_tri_sampled,
           CAST(floor(tri.n_tri * 64.0 + 0.5) AS BIGINT) AS est_triangles
    FROM tri
    """,
    doc="DOULION approximate triangle count over the co-purchase graph "
    "(ext/graph.doulion_triangle_estimate): keep each edge with p=0.25 "
    "via a deterministic portable md5 coin, exact-count the sampled "
    "graph (compact-forward, hub-proof), scale by 1/p^3. The ~linear "
    "100 TB twin of triangle_count_copurchase — wedge fan-out (the one "
    "inherently superlinear term) shrinks by p^2 and p can shrink as "
    "the graph grows (relative std ~ sqrt(64/T)); measured error vs the "
    "exact count is pinned in tests/test_ext_round7.py.",
    tags=("ext", "bench2"),
)
def q_triangle_count_doulion(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.graph import (
        doulion_triangle_estimate,
        sample_edges_portable,
        within_group_pairs,
    )

    li = read_sf_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    raw_pairs = within_group_pairs(
        li,
        "l_orderkey",
        "l_partkey",
        item_a="u",
        item_b="v",
        dropped_metric="tri_rows_in_dropped_orders",
        max_metric="tri_max_order_items",
    ).select("u", "v")
    # the coin is deterministic per (u,v), hence idempotent: applying it
    # BEFORE the distinct drops ~(1-p) of the pair-explode output ahead
    # of the dedup shuffle (the estimator re-applies it as a no-op)
    edges = sample_edges_portable(raw_pairs, p=0.25).distinct()
    return doulion_triangle_estimate(edges, p=0.25)


@register(
    "item_item_cosine_topk",
    """
    WITH cp AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    support AS (SELECT p, count(*) AS n FROM cp GROUP BY p),
    co AS (
      SELECT a.p AS pa, b.p AS pb, count(*) AS n_co
      FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
      GROUP BY a.p, b.p
    ),
    scored AS (
      -- floor form: n_co/sqrt(na*nb) is the identical IEEE double in
      -- both engines, but round() diverges on shortest-repr ties (e.g.
      -- 41/640 = 0.0640625 rounds up in Spark, down in DuckDB)
      SELECT co.pa, co.pb, co.n_co,
             floor(co.n_co / sqrt(sa.n * sb.n) * 1000000 + 0.5)
               / 1000000 AS cosine
      FROM co
      JOIN support sa ON sa.p = co.pa
      JOIN support sb ON sb.p = co.pb
      WHERE co.n_co >= 3
    )
    SELECT pa, pb, CAST(n_co AS BIGINT) AS n_co, cosine,
           CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER
            (ORDER BY cosine DESC, pa, pb) AS rn
          FROM scored)
    WHERE rn <= 20
    """,
    doc="Item-item collaborative similarity: parts as binary "
    "customer-incidence vectors, cosine = co-purchase count / "
    "sqrt(support_a * support_b), top-20 pairs with a min-support "
    "floor. The co-occurrence join is keyed by customer, so its fan-out "
    "is sum over customers of C(basket, 2) via ext.graph."
    "within_group_pairs — max_basket_size caps whale baskets with "
    "Observation accounting (registry runs uncapped for oracle "
    "parity); supports are a broadcast-sized dim; ranking is "
    "on the ROUNDED cosine with (pa, pb) tie-break so cross-engine "
    "sqrt ulp can't flip the top-k; TakeOrderedAndProject caps output.",
    tags=("ext", "bench2"),
)
def q_item_item_cosine_topk(
    spark: SparkSession,
    sf: str,
    *,
    max_basket_size: int | None = None,
    observation=None,
) -> DataFrame:
    from .ext.graph import within_group_pairs

    li = read_sf_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    o = read_sf_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        # consumed by the self-join's two sides and the support agg
        .localCheckpoint(eager=True)
    )
    support = cp.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    co = (
        within_group_pairs(
            cp,
            "c",
            "p",
            item_a="pa",
            item_b="pb",
            max_group_size=max_basket_size,
            observation=observation,
            dropped_metric="ii_rows_in_dropped_baskets",
            max_metric="ii_max_basket_size",
        )
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 3)
    )
    sa = support.select(F.col("p").alias("pa"), F.col("n").alias("na"))
    sb = support.select(F.col("p").alias("pb"), F.col("n").alias("nb"))
    scored = (
        co.join(F.broadcast(sa), "pa")
        .join(F.broadcast(sb), "pb")
        .select(
            "pa",
            "pb",
            "n_co",
            (
                F.floor(
                    F.col("n_co")
                    / F.sqrt(F.col("na") * F.col("nb"))
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("cosine"),
        )
    )
    w = Window.orderBy(F.col("cosine").desc(), "pa", "pb")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(
            "pa",
            "pb",
            F.col("n_co").cast("bigint").alias("n_co"),
            "cosine",
            F.col("rn").cast("int").alias("rank"),
        )
    )


@register(
    "item_item_cosine_topk_capped",
    """
    -- the PRODUCTION-PROFILE twin: whale customers (baskets over the cap)
    -- are dropped whole BEFORE the pair explode — cap_hot_groups
    -- semantics, restated here as a HAVING filter on basket size. Cap 40
    -- = this corpus's ~p50: it keeps 53% of customers carrying 28% of the
    -- uncapped 1.32G-row fan-out at sf10 (measured), which is what turns
    -- the r7 one-box memory-wall breach (208 s, sort-spill on ~800M
    -- unique keys) into an in-ceiling run. Supports stay UNCAPPED —
    -- cosine denominators are true item supports, so kept-pair scores
    -- are exact; only pairs whose co-count lived in dropped baskets are
    -- missing, and those are Observation-accounted in the engine run.
    WITH cp AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    support AS (SELECT p, count(*) AS n FROM cp GROUP BY p),
    kept AS (SELECT c FROM cp GROUP BY c HAVING count(*) <= 40),
    cpk AS (SELECT cp.* FROM cp JOIN kept USING (c)),
    co AS (
      SELECT a.p AS pa, b.p AS pb, count(*) AS n_co
      FROM cpk a JOIN cpk b ON a.c = b.c AND a.p < b.p
      GROUP BY a.p, b.p
    ),
    scored AS (
      SELECT co.pa, co.pb, co.n_co,
             floor(co.n_co / sqrt(sa.n * sb.n) * 1000000 + 0.5)
               / 1000000 AS cosine
      FROM co
      JOIN support sa ON sa.p = co.pa
      JOIN support sb ON sb.p = co.pb
      WHERE co.n_co >= 3
    )
    SELECT pa, pb, CAST(n_co AS BIGINT) AS n_co, cosine,
           CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER
            (ORDER BY cosine DESC, pa, pb) AS rn
          FROM scored)
    WHERE rn <= 20
    """,
    doc="Production-profile item-item similarity (VERDICT r7 item 2): "
    "identical scoring/ranking to item_item_cosine_topk but whale "
    "baskets above max_basket_size=40 drop whole (within_group_pairs -> "
    "cap_hot_groups, Observation drop accounting) before the pair "
    "explode, bounding the co-occurrence agg's unique-key working set "
    "on one box. The uncapped exact contract stays in the registry; "
    "this twin is the recorded at-scale alternative for the sf10 "
    "memory-wall breach. Oracle restates the cap as a HAVING filter on "
    "basket size, so the capped output is fully relationally pinned.",
    tags=("ext", "bench2"),
)
def q_item_item_cosine_topk_capped(
    spark: SparkSession, sf: str
) -> DataFrame:
    from pyspark.sql import Observation

    return q_item_item_cosine_topk(
        spark,
        sf,
        max_basket_size=40,
        observation=Observation("ii_capped_drops"),
    )


@register(
    "embedding_label_probe_accuracy",
    """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    -- DECIMAL partials: centroid components are averages over many
    -- doubles, and a double sum's order (Spark partial agg vs DuckDB
    -- sequential) moves the last ulp; decimal addition is exact and
    -- order-independent, so both engines hold BIT-IDENTICAL centroids
    cent AS (
      SELECT label, t.ord,
             CAST(sum(CAST(e.v[t.ord] AS DECIMAL(38,12))) / count(*)
                  AS DOUBLE) AS c
      FROM e, UNNEST(range(1, len(e.v) + 1)) AS t(ord)
      GROUP BY label, t.ord
    ),
    cvec AS (
      SELECT label AS clabel, list(c ORDER BY ord) AS cv
      FROM cent GROUP BY label
    ),
    scored AS (
      SELECT e.vec_id, e.label, c.clabel,
             round(list_cosine_similarity(e.v, c.cv), 6) AS s
      FROM e, cvec c
    ),
    pred AS (
      SELECT vec_id, label, clabel AS pred_label FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY s DESC, clabel) AS rn
        FROM scored)
      WHERE rn = 1
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4) AS accuracy
    FROM pred GROUP BY label ORDER BY label
    """,
    doc="Embedding-quality probe: nearest-label-centroid classification "
    "accuracy per label — the standard cheap eval for whether an "
    "embedding space separates known classes (clustering-quality twin "
    "of the recall gates in E3). Scale shape: centroids are one "
    "posexplode + (label, pos) agg with DECIMAL partials (exact and "
    "order-independent, so both engines hold bit-identical centroids "
    "— the conditional_agg lesson applied to vector math); the "
    "n_labels x dim centroid table is a tiny broadcast; scoring is "
    "map-side zip_with/aggregate cosine (JVM, no UDF) against all "
    "centroids; argmax is a WindowGroupLimit on the ROUNDED score "
    "with a label tie-break.",
    tags=("ext",),
)
def q_embedding_label_probe_accuracy(spark: SparkSession, sf: str) -> DataFrame:
    emb = read_sf_table(spark, sf, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            (F.sum(F.col("x").cast("decimal(38,12)")) / F.count(F.lit(1)))
            .cast("double")
            .alias("c")
        )
    )
    cvec = cent.groupBy(F.col("label").alias("clabel")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("cv")
    )
    dot = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(col, lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = emb.join(F.broadcast(cvec)).select(
        "vec_id",
        "label",
        "clabel",
        F.round(dot / (norm(F.col("v")) * norm(F.col("cv"))), 6).alias("s"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("s").desc(), "clabel")
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("clabel").alias("pred_label"))
    )
    correct = F.sum(
        F.when(F.col("pred_label") == F.col("label"), 1).otherwise(0)
    )
    return (
        pred.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            correct.cast("bigint").alias("n_correct"),
            F.round(correct * 1.0 / F.count(F.lit(1)), 4).alias("accuracy"),
        )
        .orderBy("label")
    )


@register(
    "dsir_importance_sample",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, source, t.tok
      FROM documents,
           UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    hist AS (
      SELECT doc_id, lang, source,
             CAST(('0x' || substring(md5(tok), 1, 8))::UBIGINT % 256
                  AS BIGINT) AS bkt,
             count(*) AS c
      FROM toks GROUP BY 1, 2, 3, 4
    ),
    raw AS (SELECT bkt, sum(c) AS c_r FROM hist GROUP BY 1),
    tgt AS (SELECT bkt, sum(c) AS c_t FROM hist WHERE lang = 'en' GROUP BY 1),
    n_r AS (SELECT sum(c_r) AS n_r FROM raw),
    n_t AS (SELECT coalesce(sum(c_t), 0) AS n_t FROM tgt),
    lr AS (
      SELECT raw.bkt,
             ln((coalesce(c_t, 0) + 1.0) / (n_t + 256.0))
             - ln((c_r + 1.0) / (n_r + 256.0)) AS lr
      FROM raw LEFT JOIN tgt USING (bkt) CROSS JOIN n_r CROSS JOIN n_t
    ),
    scored AS (
      SELECT h.doc_id, h.lang, h.source,
             CAST(sum(h.c) AS BIGINT) AS n_tokens,
             sum(h.c * lr.lr) / sum(h.c) AS score
      FROM hist h JOIN lr ON lr.bkt = h.bkt
      WHERE h.lang <> 'en'
      GROUP BY 1, 2, 3
    ),
    keyed AS (
      SELECT *,
             score - ln(-ln(CAST(('0x' || substring(
                 md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS DOUBLE)
                 / 4294967296.0)) AS key
      FROM scored
    )
    SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT)
             AS rnk,
           doc_id, lang, source, n_tokens,
           round(score, 4) + 0.0 AS dsir_logratio
    FROM keyed
    ORDER BY key DESC, doc_id LIMIT 100
    """,
    doc="DSIR data selection (Xie et al 2023, arXiv:2302.03169): "
    "hashed-unigram importance weights ln p_target/p_raw (target = "
    "lang='en' docs, add-one smoothing over 256 md5 buckets) score every "
    "non-target doc; Gumbel-top-k with the md5-derived uniform draws a "
    "deterministic weighted sample without replacement "
    "(ext/lm.dsir_importance_sample). Scale: both 'LMs' are 256-row "
    "broadcast tables at ANY corpus size (the point of DSIR's hashed "
    "features); one explode scan pinned into a map-side-combined "
    "(doc, bucket) histogram feeds counts and scoring; top-k is "
    "TakeOrderedAndProject, never a global sort.",
    tags=("ext",),
)
def q_dsir_importance_sample(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.lm import dsir_importance_sample

    docs = read_sf_table(spark, sf, "documents")
    return dsir_importance_sample(docs, target_lang="en", n_buckets=256, k=100)


# one source of truth for the count-min oracle replay (4 rows x width
# 512, md5 "j:" salt) — shared by countmin_heavy_hitters and
# streaming_countmin_state so the sketch parameters cannot drift between
# the two SQL twins
_CM_ORACLE_CTE = r"""
    WITH toks AS (
      SELECT t.tok
      FROM documents,
           UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    exact AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
    top AS (SELECT tok, c FROM exact ORDER BY c DESC, tok LIMIT 20),
    cells AS (
      SELECT d.j,
             CAST(('0x' || substring(md5(CAST(d.j AS VARCHAR) || ':' || tok),
                                     1, 8))::UBIGINT % 512 AS BIGINT) AS bkt,
             count(*) AS c
      FROM toks CROSS JOIN UNNEST([0, 1, 2, 3]) AS d(j)
      GROUP BY 1, 2
    ),
    est AS (
      SELECT t.tok, min(cells.c) AS est
      FROM top t
      CROSS JOIN UNNEST([0, 1, 2, 3]) AS d(j)
      JOIN cells
        ON cells.j = d.j
       AND cells.bkt = CAST(('0x' || substring(
             md5(CAST(d.j AS VARCHAR) || ':' || t.tok), 1, 8))::UBIGINT % 512
             AS BIGINT)
      GROUP BY 1
    )
"""


@register(
    "countmin_heavy_hitters",
    _CM_ORACLE_CTE
    + """
    SELECT t.tok, CAST(t.c AS BIGINT) AS exact_c,
           CAST(e.est AS BIGINT) AS cm_est,
           e.est >= t.c AS is_overestimate
    FROM top t JOIN est e USING (tok)
    """,
    doc="Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005; "
    "ext/sketches.build_countmin): a 4x512 counter grid probed for the "
    "exact top-20 tokens. The verification form builds the sketch from "
    "the exact (tok, count) table via the weighted build — bit-identical "
    "to sketching the raw stream (count-min is additive in weights) but "
    "O(distinct tokens) instead of O(corpus positions), so the token "
    "scan has ONE consumer and needs no pin. md5-salted rows make the "
    "sketch bit-identical in DuckDB: estimates compare EXACTLY, and the "
    "min-of-rows overestimate invariant is asserted per token. At 100 TB "
    "only the sketch path runs, from raw tokens, with map-side partials "
    "as per-partition sketches (streaming_countmin_state shows that "
    "form).",
    tags=("ext",),
)
def q_countmin_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import nonempty_tokens
    from .ext.sketches import build_countmin, estimate_countmin

    docs = read_sf_table(spark, sf, "documents")
    toks = docs.select(F.explode(nonempty_tokens("text")).alias("tok"))
    # two consumers (top + sketch build): pin the O(distinct tokens)
    # count table, NOT the O(corpus positions) token stream
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    top = exact.orderBy(F.desc("c"), "tok").limit(20)
    # weighted build over the exact counts == sketching the raw stream
    sketch = build_countmin(exact, "tok", depth=4, width=512, weight_col="c")
    est = estimate_countmin(top, "tok", sketch, depth=4, width=512)
    return est.select(
        "tok",
        F.col("c").cast("bigint").alias("exact_c"),
        F.col("cm_est").alias("cm_est"),
        (F.col("cm_est") >= F.col("c")).alias("is_overestimate"),
    )


@register(
    "streaming_dedup_watermark",
    """
    -- dropDuplicatesWithinWatermark with a horizon exceeding the data
    -- span: every (user_id, event_type) key emits EXACTLY once across
    -- all micro-batches. The oracle pins that contract literally —
    -- n_emitted must be 1 per key; any cross-batch re-emission (state
    -- lost between batches) or missed suppression hash-mismatches.
    SELECT user_id, event_type, CAST(1 AS BIGINT) AS n_emitted
    FROM events
    GROUP BY user_id, event_type
    """,
    doc="Streaming dedup within the watermark horizon "
    "(dropDuplicatesWithinWatermark, SURVEY 2.2 streaming-stateful row; "
    "the reference's at-least-once redelivery suppression cache.js:75-80 "
    "restated as the built-in operator): keyed state bounded by the "
    "watermark — at 100 TB the horizon caps state size, and keys recur "
    "after expiry without unbounded growth. The feed replays "
    "time-ordered micro-batches (maxFilesPerTrigger=1); emitted rows are "
    "re-aggregated to assert the exactly-once-per-key contract.",
    tags=("streaming", "bench2"),
)
def q_streaming_dedup_watermark(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming import run_available_now

    events = read_sf_table(spark, sf, "events")
    sides = events.select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type"
    )
    base = tempfile.mkdtemp(prefix="stream_dedupwm_")
    atexit.register(shutil.rmtree, base, True)
    in_dir, schema = _stage_ts_ordered_batches(spark, sides, base, 3)
    deduped = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "365 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    emit_dir = os.path.join(base, "emit")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(emit_dir)

    run_available_now(
        deduped, os.path.join(base, "ckpt"), sink, timeout_sec=600.0
    )
    out_schema = "ts timestamp, user_id bigint, event_type string"
    return (
        spark.read.schema(out_schema)
        .parquet(emit_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_emitted"))
    )


@register(
    "streaming_countmin_state",
    _CM_ORACLE_CTE
    + """
    -- the INCREMENTALLY maintained sketch (3 micro-batches, one
    -- idempotent cell table per batch, merged on read) must equal the
    -- one-shot sketch over the whole corpus bit-for-bit, because
    -- count-min merge is an exact cell-wise sum.
    SELECT t.tok, CAST(t.c AS BIGINT) AS exact_c,
           CAST(e.est AS BIGINT) AS cm_est
    FROM top t JOIN est e USING (tok)
    """,
    doc="Incremental count-min maintenance under Structured Streaming "
    "(ext/sketches.run_streaming_countmin): each micro-batch overwrites "
    "its own <= 4x512 cell table at state/batch=<id> (O(sketch) per "
    "batch, idempotent under at-least-once foreachBatch replay); reading "
    "merges cells by sum. Count-min merge is exact, so the streamed "
    "state's estimates must equal the one-shot corpus sketch the oracle "
    "replays — any lost batch, double-applied batch, or merge bug "
    "hash-mismatches. The 100 TB shape: per-day sketches compose into "
    "arbitrary windows without touching raw data.",
    tags=("streaming", "bench2",),
)
def q_streaming_countmin_state(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from .ext.dedup import nonempty_tokens
    from .ext.sketches import read_countmin_state, run_streaming_countmin

    docs = read_sf_table(spark, sf, "documents")
    n_docs = docs.count()
    base = tempfile.mkdtemp(prefix="stream_cm_")
    atexit.register(shutil.rmtree, base, True)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    bcol = F.least(F.lit(2), F.floor(F.col("doc_id") * 3.0 / n_docs)).cast(
        "int"
    )
    _stage_bucketed_batches(base, in_dir, docs.withColumn("__b", bcol), 3)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )

    def batch_to_keys(batch_df: DataFrame) -> DataFrame:
        return batch_df.select(F.explode(nonempty_tokens("text")).alias("tok"))

    state_dir = os.path.join(base, "state")
    run_streaming_countmin(
        spark,
        stream,
        state_dir,
        os.path.join(base, "ckpt"),
        batch_to_keys=batch_to_keys,
        depth=4,
        width=512,
        timeout_sec=600.0,
    )
    sketch = read_countmin_state(spark, state_dir)

    from .ext.sketches import estimate_countmin

    toks = batch_to_keys(docs)
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    top = exact.orderBy(F.desc("c"), "tok").limit(20)
    est = estimate_countmin(top, "tok", sketch, depth=4, width=512)
    return est.select(
        "tok",
        F.col("c").cast("bigint").alias("exact_c"),
        F.col("cm_est").alias("cm_est"),
    )


@register(
    "containment_near_dups",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM toks, UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(n_inter AS DOUBLE) / sa.n_sh, 6) AS containment_a,
           round(CAST(n_inter AS DOUBLE) / sb.n_sh, 6) AS containment_b,
           round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)
             AS max_containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.8
    """,
    doc="E2 exact n-gram (k=3) CONTAINMENT pairs (max directed containment "
    ">= 0.8): the asymmetric complement to Jaccard — a short doc quoted "
    "inside a long one is near-1.0 containment but low Jaccard, the "
    "subsumption case Jaccard-threshold dedup misses (CCNet/Gopher use "
    "this). Same single shingle-keyed shuffle as ngram_jaccard_pairs.",
    tags=("ext", "bench2"),
)
def q_containment_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.dedup import containment_pairs

    docs = read_sf_table(spark, sf, "documents")
    return containment_pairs(docs, "doc_id", "text", k=3, threshold=0.8)


@register(
    "gopher_quality_gate",
    r"""
    WITH base AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         t -> t <> '') AS w,
             list_filter(string_split(text, chr(10)),
                         l -> trim(l) <> '') AS lines
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_tokens,
             round(CAST(coalesce(list_sum(list_transform(w, t -> len(t))), 0)
                        AS DOUBLE) / greatest(len(w), 1), 4) AS mean_word_len,
             round(CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE)
                   / greatest(len(w), 1), 6) AS hash_word_ratio,
             round(CAST(len(list_filter(lines,
                     l -> ends_with(trim(l), '...') OR ends_with(trim(l), '…')))
                   AS DOUBLE) / greatest(len(lines), 1), 6)
               AS ellipsis_line_frac,
             round(CAST(len(list_filter(lines,
                     l -> starts_with(trim(l), '- ')
                       OR starts_with(trim(l), '* ')
                       OR starts_with(trim(l), '•')))
                   AS DOUBLE) / greatest(len(lines), 1), 6)
               AS bullet_line_frac,
             CAST((CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(w, 'be') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(w, 'that') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(w, 'have') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(w, 'with') THEN 1 ELSE 0 END)
                AS BIGINT) AS required_word_hits
      FROM base
    ),
    rules AS (
      SELECT *,
             (n_tokens >= 20 AND n_tokens <= 100000) AS rule_token_count,
             (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
               AS rule_mean_word_len,
             (hash_word_ratio <= 0.1) AS rule_hash_ratio,
             (ellipsis_line_frac <= 0.3) AS rule_ellipsis_lines,
             (bullet_line_frac <= 0.9) AS rule_bullet_lines,
             (required_word_hits >= 2) AS rule_required_words
      FROM feat
    )
    SELECT *,
           (rule_token_count AND rule_mean_word_len AND rule_hash_ratio
            AND rule_ellipsis_lines AND rule_bullet_lines
            AND rule_required_words) AS keep
    FROM rules
    """,
    doc="E4 Gopher-rules hard quality gate (Rae et al. 2021 A1.1) as one "
    "map-only codegen'd pass: token count, mean word length, '#'/word "
    "ratio, ellipsis-line and bullet-line fractions, required-word hits "
    "— per-rule booleans plus the composite keep. The cheap pre-shuffle "
    "filter a pre-training pipeline runs FIRST at 100 TB.",
    tags=("ext",),
)
def q_gopher_quality_gate(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.text import gopher_gate

    docs = read_sf_table(spark, sf, "documents")
    return gopher_gate(docs, "doc_id", "text")


@register(
    "kmeans_assign_embeddings",
    """
    WITH cent AS (
      SELECT vec_id AS cluster, CAST(embedding AS DOUBLE[]) AS c
      FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
      SELECT e.vec_id, cent.cluster,
             round(list_sum(list_transform(
                     list_zip(CAST(e.embedding AS DOUBLE[]), c),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS dist2
      FROM embeddings e, cent
    )
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist2 FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dist2, cluster) AS rn
      FROM scored)
    WHERE rn = 1
    """,
    doc="E3/E6 k-means ASSIGNMENT step (Lloyd's iteration inner loop) as a "
    "zero-shuffle map-only plan: k=8 deterministic seed centroids "
    "(vec_id < 8) inlined as a literal array, per-row squared-L2 argmin "
    "inside one codegen'd expression — no cross join, no groupBy. At "
    "100 TB assignment is a pure map over the corpus; only the tiny "
    "centroid update aggregates. Ties break to the lowest cluster id.",
    tags=("ext",),
)
def q_kmeans_assign_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.similarity import assign_nearest_centroid

    emb = read_sf_table(spark, sf, "embeddings")
    seeds = (
        emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()  # k = 8 rows — Lloyd's-state scalar probe, not data
    )
    centroids = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in seeds
    )
    out = assign_nearest_centroid(emb, centroids, "vec_id", "embedding")
    return out.select(
        "vec_id", F.col("cluster").cast("bigint").alias("cluster"), "dist2"
    )


@register(
    "kmeans_lloyd_2iter",
    """
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cluster, e AS c FROM emb WHERE vec_id < 8),
    s1 AS (
      SELECT emb.vec_id, c0.cluster,
             round(list_sum(list_transform(list_zip(e, c),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS dist2
      FROM emb, c0
    ),
    a1 AS (
      SELECT vec_id, cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist2, cluster) AS rn
        FROM s1) WHERE rn = 1
    ),
    u1 AS (
      SELECT cluster, list(av ORDER BY i) AS c FROM (
        SELECT a1.cluster, t.i, round(avg(e[t.i + 1]), 9) AS av
        FROM a1 JOIN emb USING (vec_id),
             (SELECT unnest(range(64)) AS i) t
        GROUP BY a1.cluster, t.i)
      GROUP BY cluster
    ),
    s2 AS (
      SELECT emb.vec_id, u1.cluster,
             round(list_sum(list_transform(list_zip(e, c),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS dist2
      FROM emb, u1
    )
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist2 FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dist2, cluster) AS rn
      FROM s2) WHERE rn = 1
    """,
    doc="E3/E6 Lloyd's k-means, 2 iterations UNROLLED RELATIONALLY in both "
    "engines (assign -> per-(cluster,dim) mean -> re-assign): iterative "
    "ML with a full value-hash oracle, not a rows-only check. Each "
    "iteration = one map-only assignment over inlined centroid literals "
    "+ one tiny (cluster,dim) aggregation (k x dim scalars - Lloyd's "
    "state, not data). Updated coordinates round to 9 decimals so both "
    "engines re-assign from the identical double.",
    tags=("ext", "bench2"),
)
def q_kmeans_lloyd_2iter(spark: SparkSession, sf: str) -> DataFrame:
    from .ext.similarity import kmeans_lloyd

    emb = read_sf_table(spark, sf, "embeddings")
    seeds = (
        emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()  # k = 8 seed rows
    )
    centroids = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in seeds
    )
    out = kmeans_lloyd(emb, centroids, n_iter=2, id_col="vec_id", vec_col="embedding")
    return out.select(
        "vec_id", F.col("cluster").cast("bigint").alias("cluster"), "dist2"
    )


@register(
    "streaming_kmeans_state",
    """
    -- Online (running-mean) k-means replayed relationally: 3 micro-
    -- batches (vec_id terciles), each assigned against the centroids
    -- implied by the cumulative per-(cluster,dim) DECIMAL sums BEFORE
    -- it, then folded in. Decimal sums are exact and order-independent,
    -- so the streamed state and this unrolled replay hold bit-identical
    -- centroids; any lost/double-folded batch hash-mismatches.
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             CAST(least(2, CAST(floor(vec_id * 3.0 /
                  (SELECT count(*) FROM embeddings)) AS BIGINT)) AS INT)
               AS b
      FROM embeddings
    ),
    dims AS (SELECT unnest(range(64)) AS i),
    seedg AS (
      SELECT vec_id AS cluster, i, e[i + 1] AS sv
      FROM emb, dims WHERE vec_id < 8
    ),
    c1 AS (SELECT vec_id AS cluster, e AS c FROM emb WHERE vec_id < 8),
    a1 AS (
      SELECT vec_id, cluster FROM (
        SELECT s.*, row_number() OVER (PARTITION BY vec_id
                        ORDER BY dist2, cluster) AS rn
        FROM (SELECT emb.vec_id, c1.cluster,
                     round(list_sum(list_transform(list_zip(e, c),
                             p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)
                       AS dist2
              FROM emb, c1 WHERE emb.b = 0) s) WHERE rn = 1
    ),
    p1 AS (
      SELECT a.cluster, t.i,
             sum(CAST(e[t.i + 1] AS DECIMAL(38,12))) AS s,
             CAST(count(*) AS BIGINT) AS m
      FROM a1 a JOIN emb USING (vec_id), dims t GROUP BY 1, 2
    ),
    c2 AS (
      SELECT g.cluster,
             list(CASE WHEN p.m IS NOT NULL
                       THEN CAST(p.s AS DOUBLE) / p.m
                       ELSE g.sv END ORDER BY g.i) AS c
      FROM seedg g LEFT JOIN p1 p ON p.cluster = g.cluster AND p.i = g.i
      GROUP BY g.cluster
    ),
    a2 AS (
      SELECT vec_id, cluster FROM (
        SELECT s.*, row_number() OVER (PARTITION BY vec_id
                        ORDER BY dist2, cluster) AS rn
        FROM (SELECT emb.vec_id, c2.cluster,
                     round(list_sum(list_transform(list_zip(e, c),
                             p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)
                       AS dist2
              FROM emb, c2 WHERE emb.b = 1) s) WHERE rn = 1
    ),
    n2 AS (
      SELECT a.cluster, t.i,
             sum(CAST(e[t.i + 1] AS DECIMAL(38,12))) AS s,
             CAST(count(*) AS BIGINT) AS m
      FROM a2 a JOIN emb USING (vec_id), dims t GROUP BY 1, 2
    ),
    p2 AS (
      SELECT coalesce(p.cluster, n.cluster) AS cluster,
             coalesce(p.i, n.i) AS i,
             coalesce(p.s, CAST(0 AS DECIMAL(38,12)))
               + coalesce(n.s, CAST(0 AS DECIMAL(38,12))) AS s,
             coalesce(p.m, 0) + coalesce(n.m, 0) AS m
      FROM p1 p FULL OUTER JOIN n2 n
        ON p.cluster = n.cluster AND p.i = n.i
    ),
    c3 AS (
      SELECT g.cluster,
             list(CASE WHEN p.m IS NOT NULL
                       THEN CAST(p.s AS DOUBLE) / p.m
                       ELSE g.sv END ORDER BY g.i) AS c
      FROM seedg g LEFT JOIN p2 p ON p.cluster = g.cluster AND p.i = g.i
      GROUP BY g.cluster
    ),
    a3 AS (
      SELECT vec_id, cluster FROM (
        SELECT s.*, row_number() OVER (PARTITION BY vec_id
                        ORDER BY dist2, cluster) AS rn
        FROM (SELECT emb.vec_id, c3.cluster,
                     round(list_sum(list_transform(list_zip(e, c),
                             p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)
                       AS dist2
              FROM emb, c3 WHERE emb.b = 2) s) WHERE rn = 1
    ),
    n3 AS (
      SELECT a.cluster, t.i,
             sum(CAST(e[t.i + 1] AS DECIMAL(38,12))) AS s,
             CAST(count(*) AS BIGINT) AS m
      FROM a3 a JOIN emb USING (vec_id), dims t GROUP BY 1, 2
    ),
    p3 AS (
      SELECT coalesce(p.cluster, n.cluster) AS cluster,
             coalesce(p.i, n.i) AS i,
             coalesce(p.s, CAST(0 AS DECIMAL(38,12)))
               + coalesce(n.s, CAST(0 AS DECIMAL(38,12))) AS s,
             coalesce(p.m, 0) + coalesce(n.m, 0) AS m
      FROM p2 p FULL OUTER JOIN n3 n
        ON p.cluster = n.cluster AND p.i = n.i
    ),
    cf AS (
      SELECT g.cluster,
             list(CASE WHEN p.m IS NOT NULL
                       THEN CAST(p.s AS DOUBLE) / p.m
                       ELSE g.sv END ORDER BY g.i) AS c
      FROM seedg g LEFT JOIN p3 p ON p.cluster = g.cluster AND p.i = g.i
      GROUP BY g.cluster
    )
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist2 FROM (
      SELECT s.*, row_number() OVER (PARTITION BY vec_id
                      ORDER BY dist2, cluster) AS rn
      FROM (SELECT emb.vec_id, cf.cluster,
                   round(list_sum(list_transform(list_zip(e, c),
                           p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)
                     AS dist2
            FROM emb, cf) s) WHERE rn = 1
    """,
    doc="E3/E6 + streaming: ONLINE k-means maintained incrementally under "
    "Structured Streaming (ext/similarity.run_streaming_kmeans) — each "
    "micro-batch assigns against the centroids implied by the cumulative "
    "per-(cluster,dim) DECIMAL sums before it (exact, order-independent), "
    "folds its sums in, and writes the cumulative state idempotently at "
    "state/batch=<id> (replay recomputes from the same prior state). The "
    "oracle unrolls the same 3-batch sequence relationally, so streaming "
    "ML state gets a full value-hash check: lost batches, double-folds, "
    "or engine-divergent centroid math all hash-mismatch. Output: final "
    "full-corpus assignment against the post-stream centroids. 100 TB "
    "shape: per batch one map-only assignment + one k x dim aggregation; "
    "state is sketch-sized, never the data.",
    tags=("streaming", "bench2",),
)
def q_streaming_kmeans_state(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from .ext.similarity import (
        _km_centroids,
        assign_nearest_centroid,
        read_kmeans_state,
        run_streaming_kmeans,
    )

    emb = read_sf_table(spark, sf, "embeddings")
    n = emb.count()
    base = tempfile.mkdtemp(prefix="stream_km_")
    atexit.register(shutil.rmtree, base, True)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    bcol = F.least(
        F.lit(2), F.floor(F.col("vec_id") * 3.0 / n)
    ).cast("int")
    _stage_bucketed_batches(base, in_dir, emb.withColumn("__b", bcol), 3)
    seeds = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    state_dir = os.path.join(base, "state")
    run_streaming_kmeans(
        spark,
        stream,
        state_dir,
        os.path.join(base, "ckpt"),
        seeds=seeds,
        vec_col="embedding",
        timeout_sec=600.0,
    )
    cents = _km_centroids(read_kmeans_state(spark, state_dir), seeds)
    out = assign_nearest_centroid(emb, cents, "vec_id", "embedding")
    return out.select(
        "vec_id",
        F.col("cluster").cast("bigint").alias("cluster"),
        F.col("dist2").alias("dist2"),
    )


@register(
    "streaming_bloom_state",
    """
    -- Decidable contracts of the streamed Bloom filter, restated
    -- relationally (the bloom_membership_prefilter pattern): the exact
    -- member count; zero false negatives (OR-merge cannot lose a bit);
    -- and word-table EQUALITY with the one-shot filter over everything
    -- streamed (OR is associative + commutative + idempotent, so the
    -- per-batch merge must be bit-for-bit the one-shot build — any lost
    -- batch or layout drift flips the boolean and hash-mismatches).
    SELECT CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN event_id END) AS BIGINT) AS n_exact,
           true AS no_false_negatives,
           true AS merged_equals_oneshot
    FROM events
    """,
    doc="E6 + streaming: Bloom filter maintained incrementally under "
    "Structured Streaming (ext/bloom.run_streaming_bloom) — each "
    "micro-batch overwrites its own <= n_bits/64 word table at "
    "state/batch=<id> (idempotent under at-least-once replay); reading "
    "merges words by bit_or. The third exactly-mergeable streaming-state "
    "family after count-min (count sums) and online k-means (coordinate "
    "sums): the monoid here is 64-bit OR, so the streamed filter must "
    "equal the one-shot filter bit-for-bit — asserted in-query along "
    "with the no-false-negative contract. 100 TB shape: per-day filters "
    "compose into arbitrary windows without touching raw keys.",
    tags=("streaming", "bench2",),
)
def q_streaming_bloom_state(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from .ext.bloom import (
        build_bloom,
        probe_bloom,
        read_bloom_state,
        run_streaming_bloom,
    )

    ev = read_sf_table(spark, sf, "events")
    # cached: members feeds the count, the staging write, the one-shot
    # build, and the coverage semi-join — uncached that is 4 scans of
    # events plus 4 distincts
    members = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id")
        .distinct()
        .cache()
    )
    n_members = members.count()
    # pinned layout sized for the TOTAL member count (~1% fp target)
    n_bits = max(64, ((10 * max(n_members, 1) + 63) // 64) * 64)
    k = 5
    base = tempfile.mkdtemp(prefix="stream_bloom_")
    atexit.register(shutil.rmtree, base, True)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    # stage the MEMBER ids (the filter's build side) in 3 batches; the
    # tercile rule is on the dense member rank, not raw event_id
    ranked = members.withColumn(
        "__r",
        F.row_number().over(Window.orderBy("event_id")) - 1,
    )
    staged = ranked.withColumn(
        "__b",
        F.least(F.lit(2), F.floor(F.col("__r") * 3.0 / n_members)).cast(
            "int"
        ),
    ).select("event_id", "__b")
    _stage_bucketed_batches(base, in_dir, staged, 3)
    stream = (
        spark.readStream.schema("event_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    state_dir = os.path.join(base, "state")
    run_streaming_bloom(
        spark,
        stream,
        state_dir,
        os.path.join(base, "ckpt"),
        batch_to_keys=lambda b: b,
        key_col="event_id",
        n_bits=n_bits,
        k=k,
        timeout_sec=600.0,
    )
    streamed = read_bloom_state(spark, state_dir, n_bits, k)
    oneshot = build_bloom(members, "event_id", n_bits=n_bits, k=k)
    # word-table equality: full outer join, every (word_idx, bits) pair
    # present and equal on both sides
    a = streamed.words.select(
        "word_idx", F.col("bits").alias("__sb")
    )
    b = oneshot.words.select("word_idx", F.col("bits").alias("__ob"))
    diff = (
        a.join(b, "word_idx", "full_outer")
        .filter(
            F.col("__sb").isNull()
            | F.col("__ob").isNull()
            | (F.col("__sb") != F.col("__ob"))
        )
        .count()
    )
    probable = probe_bloom(
        ev.select("event_id").distinct(), "event_id", streamed
    )
    covered = probable.join(members, "event_id", "left_semi").count()
    members.unpersist()
    return spark.createDataFrame(
        [(n_members, covered == n_members, diff == 0)],
        "n_exact bigint, no_false_negatives boolean, "
        "merged_equals_oneshot boolean",
    )


@register(
    "streaming_topk_state",
    """
    -- One-shot exact top-k over the whole corpus: partial top-k is a
    -- monoid (a global top-k row is necessarily in its own batch's
    -- top-k), so the streamed per-batch partials merged by re-ranking
    -- must equal this exactly — any lost batch or rank drift
    -- hash-mismatches.
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), qe), 6)
               AS score
      FROM embeddings c, q WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, score, rnk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """,
    doc="E3 + streaming: exact top-k cosine neighbors maintained over a "
    "STREAMED corpus (ext/similarity.run_streaming_topk) — each "
    "micro-batch writes its own |queries| x k batch-local top-k at "
    "state/batch=<id> (idempotent slot overwrite); reads merge by "
    "re-ranking the union, which is EXACTLY the one-shot answer because "
    "partial top-k is a monoid under rank-merge. The fourth "
    "exactly-mergeable streaming-state family (counts, sums, bits, "
    "ranks). 100 TB shape: arriving vectors are scored map-side against "
    "the broadcast query set once, never re-scored; state is "
    "|queries| x k per batch, never the corpus.",
    tags=("streaming", "bench2"),
)
def q_streaming_topk_state(spark: SparkSession, sf: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from .ext.similarity import read_topk_state, run_streaming_topk

    emb = read_sf_table(spark, sf, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 10).select(
        "vec_id", "embedding"
    )
    base = tempfile.mkdtemp(prefix="stream_topk_")
    atexit.register(shutil.rmtree, base, True)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    bcol = F.least(F.lit(2), F.floor(F.col("vec_id") * 3.0 / n)).cast("int")
    _stage_bucketed_batches(base, in_dir, emb.withColumn("__b", bcol), 3)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    state_dir = os.path.join(base, "state")
    run_streaming_topk(
        spark,
        stream,
        state_dir,
        os.path.join(base, "ckpt"),
        queries=queries,
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        timeout_sec=600.0,
    )
    return read_topk_state(spark, state_dir, k=5)
