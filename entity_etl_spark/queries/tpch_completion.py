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


