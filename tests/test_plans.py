"""Plan-quality regression tests: the physical properties the engine
depends on at scale must survive refactors."""

import re


def plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df, spark):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_incremental_scan_predicate_reaches_parquet(spark):
    """The checkpoint predicate must be pushed into the events scan even
    though the ts column needs a nanos->micros conversion (monotonic
    rewrite, sources.read_events_since)."""
    from entity_etl_spark.sources import read_events_since

    df = read_events_since(spark, "/root/testdata/sf0.001", 1_705_708_800_000_000)
    plan = formatted_plan(df, spark)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    assert "GreaterThan(ts" in m.group(1)


def test_q1_scan_prunes_columns(spark):
    """Group-by aggregate must not read columns it does not use."""
    from entity_etl_spark.queries import REGISTRY

    plan = formatted_plan(
        REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001"), spark
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "l_orderkey" not in read_cols     # unused columns pruned
    assert "l_comment" not in read_cols
    assert {"l_quantity", "l_returnflag"} <= read_cols


def test_top_orders_broadcasts_dimension(spark):
    """The filtered customer dimension must broadcast, not shuffle."""
    from entity_etl_spark.queries import REGISTRY

    plan = formatted_plan(
        REGISTRY["top_orders_revenue"].fn(spark, "/root/testdata/sf0.001"), spark
    )
    assert "BroadcastHashJoin" in plan
    # top-k must not global-sort: TakeOrderedAndProject caps it
    assert "TakeOrderedAndProject" in plan


def test_asof_join_single_exchange(spark):
    """asof_join is one window over one shuffle — no join operator, no
    second exchange."""
    from entity_etl_spark.operators import asof_join
    from entity_etl_spark.sources import read_sf_table

    ev = read_sf_table(spark, "/root/testdata/sf0.001", "events")
    purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    signups = ev.filter("event_type = 'signup'").select(
        "user_id", ev.ts.alias("signup_ts")
    )
    plan = formatted_plan(
        asof_join(purchases, signups, "user_id", "ts", "signup_ts", ["signup_ts"]),
        spark,
    )
    body = plan.split("== Physical Plan ==")[-1]
    n_exchanges = len(re.findall(r"\bExchange\b", body.split("===== Subqueries")[0]))
    assert "Join" not in body or "SortMergeJoin" not in body
    assert n_exchanges <= 2  # one shuffle (plan text may repeat the node)
