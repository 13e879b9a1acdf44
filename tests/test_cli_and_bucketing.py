"""CLI entry point (EP2/EP3) and bucketed-layout tests."""

import os

from pyspark.sql import functions as F


def test_cli_help_exits_before_io(capsys):
    from entity_etl_spark.__main__ import main

    assert main(["-h"]) == 0
    out = capsys.readouterr().out
    assert "Usage:" in out
    # reference app.js:15: ANY arg containing -h triggers usage
    assert main(["--helpful-table"]) == 0


def test_cli_two_runs_incremental(tmp_path, monkeypatch, capsys):
    from entity_etl_spark.__main__ import main

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("ENGINE_STATE_DIR", str(tmp_path / "state"))
    monkeypatch.setenv("ENGINE_OUT_DIR", str(tmp_path / "out"))
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")

    assert main(["events"]) == 0
    first = capsys.readouterr().out
    assert "emitted=1000" in first

    assert main(["events"]) == 0
    second = capsys.readouterr().out
    assert "emitted=0" in second  # checkpoint + state suppress everything

    assert os.path.isdir(tmp_path / "out" / "bodies")


def test_bucketed_state_join_has_no_shuffle(spark, tmp_path):
    from entity_etl_spark.sinks import write_bucketed

    warehouse_df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    # force a non-broadcast join so the bucketed layout is what avoids the
    # shuffle (a broadcast join would sidestep bucketing for a tiny table);
    # disable AQE so the printed plan is the final static plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    write_bucketed(warehouse_df, "bucketed_state_test", ["k"], n_buckets=4)
    try:
        t = spark.table("bucketed_state_test")
        other = spark.table("bucketed_state_test").withColumnRenamed("v", "v2")
        plan = (
            t.join(other, "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # both sides pre-bucketed on the join key: no Exchange in the plan
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.sql("DROP TABLE IF EXISTS bucketed_state_test")


def test_parameterized_sql_named_args(spark):
    """Spark 4 parameterized SQL: named placeholders bind server-side
    (no string interpolation — the injection-safe templating the
    reference's config layer would map onto)."""
    df = spark.sql(
        "SELECT :lo AS lo, id FROM range(10) WHERE id BETWEEN :lo AND :hi",
        args={"lo": 2, "hi": 4},
    )
    assert [r.id for r in df.orderBy("id").collect()] == [2, 3, 4]


def test_parameterized_sql_identifier_clause(spark):
    """IDENTIFIER(:name) parameterizes table/column NAMES safely —
    the dynamic-table-list pattern (reference: CLI table args)."""
    spark.range(5).createOrReplaceTempView("param_t")
    try:
        df = spark.sql(
            "SELECT count(*) AS n FROM IDENTIFIER(:t)",
            args={"t": "param_t"},
        )
        assert df.first().n == 5
    finally:
        spark.catalog.dropTempView("param_t")
