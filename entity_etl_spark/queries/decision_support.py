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
from .ext_dedup_sim import _MINHASH_CAPPED_CTES


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
    -- MATERIALIZED per-iteration temps (r9, VERDICT r8 item 5): the
    -- plain unrolled CTE chain re-inlines edges/deg into every
    -- iteration, blowing DuckDB's 24 GB temp cap at sf10; pinning each
    -- iteration (the neardup_groups precedent) keeps the oracle inside
    -- the cap — measured 471 s at sf10 on this box
    WITH edges AS MATERIALIZED ({_PAGERANK_EDGE_SQL}),
    deg AS MATERIALIZED (
      SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    n AS (SELECT count(DISTINCT src) AS n FROM edges),
    r0 AS MATERIALIZED (
      SELECT src AS node, 1.0 / n.n AS rank FROM deg, n),
    r1 AS MATERIALIZED (
      SELECT e.dst AS node,
             0.15 / min(n.n) + 0.85 * sum(r.rank / d.outdeg) AS rank
      FROM edges e JOIN r0 r ON e.src = r.node
                   JOIN deg d ON e.src = d.src, n
      GROUP BY e.dst),
    r2 AS MATERIALIZED (
      SELECT e.dst AS node,
             0.15 / min(n.n) + 0.85 * sum(r.rank / d.outdeg) AS rank
      FROM edges e JOIN r1 r ON e.src = r.node
                   JOIN deg d ON e.src = d.src, n
      GROUP BY e.dst),
    r3 AS MATERIALIZED (
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
    from ..ext.video import sample_frame_features, synthesize_video

    emb = read_sf_table(spark, sf, "embeddings")
    return sample_frame_features(synthesize_video(emb))


@register(
    "sql_udf_funcs",
    """
    -- money sums ride exact DECIMAL (the q9/q1 pattern): the widened r8
    -- sf10 spot caught this query's double sums crossing the 2-dec grid
    -- at 1e12 magnitudes (one-cent drift, summation order). The UDFs
    -- themselves are decimal-exact: (14,2)x(8,4) -> (22,6) and
    -- (22,6)x(8,4) -> (30,10), both within 38 digits, so every product
    -- and the sums are exact in both engines; portable floor quantize.
    SELECT l_returnflag,
           CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(14,2))
                          * (CAST(1 AS DECIMAL(8,4))
                             - CAST(l_discount AS DECIMAL(8,4))))
                      * 100 + 0.5) AS DOUBLE) / 100 AS revenue,
           CAST(floor(sum((CAST(l_extendedprice AS DECIMAL(14,2))
                           * (CAST(1 AS DECIMAL(8,4))
                              - CAST(l_discount AS DECIMAL(8,4))))
                          * (CAST(1 AS DECIMAL(8,4))
                             + CAST(l_tax AS DECIMAL(8,4))))
                      * 100 + 0.5) AS DOUBLE) / 100 AS revenue_taxed
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Declarative SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN expr): "
    "business logic named once, inlined by Catalyst into the aggregate — "
    "zero call overhead, full codegen, pushdown-transparent; the "
    "scale-safe alternative to a Python UDF for pure expressions. The "
    "UDFs compute exact DECIMAL money factors (r8 sf10 spot finding: "
    "the double form drifted one cent across engines at sf10 sums). "
    "The oracle states the same expressions inline (which is also "
    "exactly what the optimized plan contains).",
    tags=("functions",),
)
def q_sql_udf_funcs(spark: SparkSession, sf: str) -> DataFrame:
    read_sf_table(spark, sf, "lineitem").createOrReplaceTempView(
        "udf_lineitem"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DECIMAL(22,6) RETURN CAST(p AS DECIMAL(14,2)) "
        "* (CAST(1 AS DECIMAL(8,4)) - CAST(d AS DECIMAL(8,4)))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION taxed(p DECIMAL(22,6), "
        "t DOUBLE) RETURNS DECIMAL(31,10) RETURN p "
        "* (CAST(1 AS DECIMAL(8,4)) + CAST(t AS DECIMAL(8,4)))"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(floor(sum(disc_price(l_extendedprice, l_discount))
                          * 100 + 0.5) AS DOUBLE) / 100 AS revenue,
               CAST(floor(sum(taxed(disc_price(l_extendedprice, l_discount),
                                    l_tax)) * 100 + 0.5) AS DOUBLE) / 100
                 AS revenue_taxed
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
    from ..ext.text import token_count

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
    from ..ext.sampling import kfold_assignment

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
    from ..ext.sampling import temporal_split_embargo

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
    from ..ext.bpe import learn_bpe_merges

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

    from ..ext.audio import decode_wav_features, synthesize_wav

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
    from ..ext.dedup import jaccard_pairs, minhash_dedup_incremental

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
    from ..ext.dedup import repeated_substring_spans_cdc

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
    # ONE tokenize pass: dl and the per-term tfs come out of a single
    # groupBy(doc_id) with 1 + |terms| aggregates (partial map-side, the
    # exchange carries one slim row per doc) — the dl/tf split used to
    # re-scan and re-explode the corpus once per branch (r11, guide
    # §2.3 aggregate-before-you-shuffle). The per-doc table is tiny and
    # multi-consumed (gl, melt), so it pins once; dl rides the melted
    # rows, removing the dl re-join.
    per_doc = (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.count(F.when(F.col("tok") == t, 1)).alias(f"__tf{i}")
                for i, t in enumerate(_BM25_TERMS)
            ],
        )
        .localCheckpoint(eager=True)
    )
    gl = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    stack_args = ", ".join(
        f"'{t}', __tf{i}" for i, t in enumerate(_BM25_TERMS)
    )
    tf = per_doc.selectExpr(
        "doc_id",
        "dl",
        f"stack({len(_BM25_TERMS)}, {stack_args}) as (tok, tf)",
    ).filter(F.col("tf") > 0)
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
    from ..operators import distributed_shuffle_rank

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
    from ..ext.bpe import apply_bpe_merges

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
    from ..ext.dedup import jaccard_pairs
    from ..ext.graph import keep_best_per_group, near_dup_groups

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

    from ..ext.dedup import minhash_near_dups
    from ..ext.graph import keep_best_per_group, near_dup_groups

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
    from ..ext.classifier import quality_score

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
    from ..ext.features import vector_norms_arrow

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
    from ..ext.classifier import quality_score

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
    # NOTE (r11): pinning intra with localCheckpoint was tried and
    # measured SLOWER at sf1 (2.9-4.5 s -> 4.9-5.4 s): the two intra
    # consumers share one ReusedExchange already, so the pin only added
    # a segment-table materialization. Left as-is deliberately.
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
    from ..ext import expectations as X

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
    from ..ext.er import resolve_entities

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
    from ..ext.dedup import jaccard_pairs
    from ..ext.sampling import train_val_test_split

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


