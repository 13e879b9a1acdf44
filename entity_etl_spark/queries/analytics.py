from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._base import (
    CUTOFF,
    DUCK_TS_FMT,
    SPARK_TS_FMT,
    Q,
    REGISTRY,
    _ts_str,
    changed_rows,
    read_sf_table,
    register,
    tsutil,
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


