"""Custom-operator tests: as-of join, bucketed range join, salted
aggregation, time rollup."""

from pyspark.sql import functions as F


def ts(s):
    return F.lit(s).cast("timestamp")


def test_asof_join_basic(spark):
    from entity_etl_spark.operators import asof_join

    quotes = spark.createDataFrame(
        [("A", "2024-01-01 00:00:10", 10.0),
         ("A", "2024-01-01 00:00:20", 11.0),
         ("B", "2024-01-01 00:00:15", 5.0)],
        "sym string, qts string, px double",
    ).select("sym", F.col("qts").cast("timestamp").alias("qts"), "px")
    trades = spark.createDataFrame(
        [("A", "2024-01-01 00:00:05"),   # before any quote -> NULL
         ("A", "2024-01-01 00:00:10"),   # tie -> matches 10.0 (<= semantics)
         ("A", "2024-01-01 00:00:25"),   # after both -> 11.0
         ("B", "2024-01-01 00:00:30"),   # -> 5.0
         ("C", "2024-01-01 00:00:30")],  # no quotes for key -> NULL
        "sym string, tts string",
    ).select("sym", F.col("tts").cast("timestamp").alias("tts"))

    out = asof_join(trades, quotes, "sym", "tts", "qts", ["px"])
    got = {(r["sym"], str(r["tts"])): r["px"] for r in out.collect()}
    assert got[("A", "2024-01-01 00:00:05")] is None
    assert got[("A", "2024-01-01 00:00:10")] == 10.0
    assert got[("A", "2024-01-01 00:00:25")] == 11.0
    assert got[("B", "2024-01-01 00:00:30")] == 5.0
    assert got[("C", "2024-01-01 00:00:30")] is None
    assert out.count() == 5  # every left row survives


def test_range_join_bucketed(spark):
    from entity_etl_spark.operators import range_join_bucketed

    points = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (1, "2024-01-01 02:30:00"),
         (2, "2024-01-01 00:30:00")],
        "uid long, pts string",
    ).select("uid", F.col("pts").cast("timestamp").alias("pts"))
    ivals = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-01 01:00:00", "w1"),
         (1, "2024-01-01 02:00:00", "2024-01-01 05:00:00", "w2"),
         (2, "2024-01-01 01:00:00", "2024-01-01 02:00:00", "w3")],
        "uid long, s string, e string, name string",
    ).select("uid", F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"), "name")

    out = range_join_bucketed(points, ivals, "uid", "pts", "s", "e", 3600)
    got = {(r["uid"], str(r["pts"])): r["name"] for r in out.collect()}
    assert got[(1, "2024-01-01 00:30:00")] == "w1"
    assert got[(1, "2024-01-01 02:30:00")] == "w2"   # multi-bucket interval
    assert (2, "2024-01-01 00:30:00") not in got      # outside w3


def test_salted_aggregate_matches_plain(spark):
    from entity_etl_spark.operators import salted_aggregate

    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 7).alias("v")
    )
    salted = salted_aggregate(
        df, ["k"],
        {"total": ("sum", "v"), "n": ("count", "v"), "vmax": ("max", "v")},
        salt_buckets=8,
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count("v").alias("n"), F.max("v").alias("vmax")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_time_rollup_two_granularities(spark):
    from entity_etl_spark.operators import time_rollup

    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", 1.0), ("2024-01-01 00:50:00", 2.0),
         ("2024-01-01 01:10:00", 4.0)],
        "t string, v double",
    ).select(F.col("t").cast("timestamp").alias("t"), "v")
    out = time_rollup(df, "t", ["hour", "day"], [], [F.sum("v").alias("total")])
    got = {(r["gran"], str(r["bucket_start"])): r["total"] for r in out.collect()}
    assert got[("hour", "2024-01-01 00:00:00")] == 3.0
    assert got[("hour", "2024-01-01 01:00:00")] == 4.0
    assert got[("day", "2024-01-01 00:00:00")] == 7.0


def test_salted_join_matches_plain_join(spark):
    from entity_etl_spark.operators import salted_join

    facts = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 11), (2, "c", 12), (9, "d", 13)],
        "k int, tag string, fid int",
    )
    dim = spark.createDataFrame([(1, "one"), (2, "two"), (3, "three")],
                                "k int, name string")
    for how in ("inner", "left"):
        got = salted_join(facts, dim, ["k"], salt_buckets=4, how=how,
                          salt_on="fid")
        want = facts.join(dim, ["k"], how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())), how


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest

    from entity_etl_spark.operators import salted_join

    df = spark.range(1).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="full_outer")


def test_distributed_cumsum_equals_global_window(spark):
    from entity_etl_spark.operators import distributed_cumsum
    from pyspark.sql import Window as W

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 101).cast("double").alias("v"),
    )
    got = distributed_cumsum(df, "k", "v", n_buckets=16)
    want = df.withColumn(
        "running_total", F.sum("v").over(W.orderBy("k"))
    )
    g = {r.k: r.running_total for r in got.collect()}
    w = {r.k: r.running_total for r in want.collect()}
    assert all(abs(g[k] - w[k]) < 1e-6 for k in w)


def test_distributed_cumsum_big_side_not_single_partition(spark):
    from entity_etl_spark.operators import distributed_cumsum
    from tests.test_plans import plan_of

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v"))
    plan = plan_of(distributed_cumsum(df, "k", "v", n_buckets=16))
    # the row-bearing window shuffles on the bucket key; single-partition
    # exchanges exist only on metadata-sized sides (min/max bounds, the
    # n_buckets-row offsets cumsum), never under the row-carrying Window
    assert "hashpartitioning(__bkt" in plan, plan
    row_window = next(
        ln for ln in plan.splitlines()
        if "Window" in ln and "running" not in ln and "__local" in ln
    )
    assert "__bkt" in row_window, row_window


def test_interpolate_linear_fills_and_clamps(spark):
    from entity_etl_spark.operators import interpolate_linear

    df = spark.createDataFrame(
        [("a", 0, None), ("a", 1, 10.0), ("a", 2, None), ("a", 3, None),
         ("a", 4, 40.0), ("a", 5, None), ("b", 0, 7.0)],
        "k string, t long, v double",
    )
    got = {(r.k, r.t): r.v_filled
           for r in interpolate_linear(df, ["k"], "t", "v").collect()}
    assert got[("a", 0)] == 10.0   # leading edge clamps forward
    assert got[("a", 2)] == 20.0   # linear between 10@1 and 40@4
    assert got[("a", 3)] == 30.0
    assert got[("a", 5)] == 40.0   # trailing edge clamps back
    assert got[("b", 0)] == 7.0


def test_robust_outliers_flags_tail_not_bulk(spark):
    from entity_etl_spark.operators import robust_outliers

    rows = [("g", float(x)) for x in [10, 11, 12, 13, 14, 1000]] + [
        ("const", 5.0)] * 4
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_outliers(df, "v", ["g"], z=3.0)
    flagged = {(r.g, r.v) for r in out.filter("is_outlier").collect()}
    assert flagged == {("g", 1000.0)}
    assert out.filter("g = 'const' and is_outlier").count() == 0  # MAD=0 guard


def test_distributed_shuffle_rank_equals_global_window(spark):
    from entity_etl_spark.operators import distributed_shuffle_rank
    from pyspark.sql import Window as W

    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    got = distributed_shuffle_rank(df, "k", seed="s", n_buckets=16)
    h = F.md5(F.concat(F.lit("s:"), F.col("k").cast("string")))
    want = df.withColumn(
        "shuffle_rank", F.row_number().over(W.orderBy(h, "k"))
    )
    g = {r.k: r.shuffle_rank for r in got.collect()}
    w = {r.k: r.shuffle_rank for r in want.collect()}
    assert g == w
    # a permutation: every rank 1..n exactly once
    assert sorted(g.values()) == list(range(1, 5001))


def test_distributed_shuffle_rank_not_single_partition(spark):
    from entity_etl_spark.operators import distributed_shuffle_rank
    from tests.test_plans import plan_of

    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    plan = plan_of(distributed_shuffle_rank(df, "k", n_buckets=16))
    # row-bearing window is partitioned by bucket; the only
    # single-partition window runs over the n_buckets-row offsets side
    assert "hashpartitioning(__bkt" in plan, plan
    row_window = next(
        ln for ln in plan.splitlines()
        if "Window" in ln and "__local" in ln
    )
    assert "__bkt" in row_window, row_window
