"""Execution-profile contract (VERDICT r6 item 3).

parity = no implicit caps anywhere (the pre-profile behavior the oracle
gate verifies); production = every hot-group cap resolves to a concrete
bound when the caller leaves it unset; explicit arguments always win.
"""

import pytest

from entity_etl_spark.batch import assign_batches
from entity_etl_spark.ext.graph import within_group_pairs
from entity_etl_spark.model import EngineConfig
from entity_etl_spark.profile import (
    PARITY,
    PRODUCTION,
    Profile,
    activate_profile,
    active_profile,
    profile_ctx,
    resolve_cap,
)


def test_parity_is_default_and_uncapped():
    assert active_profile().name == "parity"
    assert resolve_cap(None, "pairs_max_group_size") is None
    assert resolve_cap(None, "lsh_max_bucket_size") is None


def test_production_resolves_every_lsh_family_cap():
    with profile_ctx("production"):
        for knob in (
            "lsh_max_bucket_size",
            "jac_max_shingle_df",
            "cont_max_shingle_df",
            "simhash_max_block_size",
            "lshtopk_max_bucket_size",
            "pairs_max_group_size",
            "er_max_block_size",
        ):
            assert resolve_cap(None, knob) > 0, knob
    assert active_profile() is PARITY  # ctx restores


def test_explicit_cap_beats_profile():
    with profile_ctx(PRODUCTION):
        assert resolve_cap(123, "pairs_max_group_size") == 123


def test_unknown_profile_raises():
    with pytest.raises(ValueError, match="unknown profile"):
        activate_profile("nope")


def test_engineconfig_carries_profile(tmp_path):
    assert EngineConfig().profile == "parity"
    from entity_etl_spark.config import load_config

    p = tmp_path / "cfg.json"
    p.write_text('{"profile": "production", "maxBatchSize": 7}')
    cfg = load_config(str(p))
    assert cfg.profile == "production"
    assert cfg.max_batch_size == 7


def test_production_caps_whale_group_without_kwargs(spark):
    # one whale group of 60 items + one small group of 3: production's
    # pairs cap (5000) won't trip, so use a scoped custom profile with a
    # tiny cap to prove the resolution path end-to-end
    rows = [("whale", f"i{i:03d}") for i in range(60)]
    rows += [("ok", "a"), ("ok", "b"), ("ok", "c")]
    df = spark.createDataFrame(rows, "g string, item string")

    exact = within_group_pairs(df, "g", "item").count()
    assert exact == 60 * 59 // 2 + 3

    tiny = Profile(name="tiny", caps={"pairs_max_group_size": 10})
    with profile_ctx(tiny):
        capped = within_group_pairs(df, "g", "item").count()
    assert capped == 3  # whale dropped, small group intact

    # production profile itself: whale of 60 is under its 5000 cap
    with profile_ctx(PRODUCTION):
        assert within_group_pairs(df, "g", "item").count() == exact


def test_assign_batches_guard_fails_job_over_profile_limit(spark):
    """The guard is an in-job raise_error on the window's own row_number
    (no extra action, upstream lineage never evaluated twice — r7
    review), so the failure surfaces when the plan EXECUTES."""
    from pyspark.sql import functions as F

    from entity_etl_spark.batch import BATCH_COL

    df = spark.range(50).selectExpr("id", "cast(id as string) as s")
    guarded = Profile(name="guarded", assign_batches_max_rows=10)
    with profile_ctx(guarded):
        batched = assign_batches(df, 5, ["id"])  # plan builds fine
        with pytest.raises(Exception, match="assign_batches_distributed"):
            # consume the batch column (as every real caller does —
            # a bare count() would prune the window away entirely)
            batched.agg(F.max(BATCH_COL)).collect()
    # parity's generous guard passes small inputs untouched
    assert (
        assign_batches(df, 5, ["id"]).agg(F.max(BATCH_COL)).collect()[0][0]
        == 9
    )


def test_pipeline_scopes_config_profile(spark, tmp_path):
    """The config profile is active DURING the run and restored after —
    a production pipeline must not leak capped defaults into later
    same-process parity calls (r7 review)."""
    from entity_etl_spark.model import TableSpec
    from entity_etl_spark.pipeline import run_incremental

    spec = TableSpec("t1", "id", "ts")
    src = spark.createDataFrame(
        [(1, 10, "a")], "id long, ts long, v string"
    )
    cfg = EngineConfig(state_dir=str(tmp_path), profile="production")
    seen_during = []
    run_incremental(
        spark,
        spec,
        src,
        [{"target": "id", "source": "id"}],
        cfg,
        sink=lambda d: seen_during.append(
            (active_profile().name, d.count())
        ),
    )
    assert seen_during and seen_during[0][0] == "production"
    assert active_profile() is PARITY


def test_production_caps_cover_every_pinned_metric_name():
    """Cap resolution is keyed by the max_metric name each call site
    passes; a pinned name missing from PRODUCTION.caps silently never
    caps (r7 review finding). Scan the package source for every pinned
    name and assert coverage."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).parent.parent / "entity_etl_spark"
    names = set()
    for p in pkg.rglob("*.py"):
        names |= set(
            re.findall(r'max_metric="([a-z_]+)"', p.read_text())
        )
    assert names, "no pinned max_metric names found — scan broke?"
    missing = names - set(PRODUCTION.caps)
    assert not missing, f"pinned cap names without production defaults: {missing}"


def test_activation_is_thread_local():
    """Concurrent runs on threads sharing one SparkSession must each
    resolve caps under their OWN profile (r7 ADVICE: a process-global
    slot raced). Threads that never activate read the parity default."""
    import threading

    results = {}

    def worker(profile_name: str, key: str):
        if profile_name:
            activate_profile(profile_name)
        barrier.wait()  # both threads hold their profile simultaneously
        results[key] = (
            active_profile().name,
            resolve_cap(None, "lsh_max_bucket_size"),
        )

    barrier = threading.Barrier(3)
    threads = [
        threading.Thread(target=worker, args=("production", "prod")),
        threading.Thread(target=worker, args=("parity", "par")),
        threading.Thread(target=worker, args=("", "none")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["prod"] == ("production", 2_000)
    assert results["par"] == ("parity", None)
    assert results["none"] == ("parity", None)  # untouched default
    # the main thread's slot is unaffected by the workers
    assert active_profile() is PARITY


def test_assign_batches_guard_explicit_override_and_opt_out(spark):
    """guard_rows=<int> overrides the profile threshold for one call;
    guard_rows=None is the documented explicit opt-out (r7 ADVICE: the
    parity guard is a behavior change for callers that previously
    succeeded slowly)."""
    from pyspark.sql import functions as F

    from entity_etl_spark.batch import BATCH_COL

    df = spark.range(50).withColumnRenamed("id", "id")
    # explicit tighter guard fires even under parity
    with pytest.raises(Exception, match="caller's explicit 10-row"):
        assign_batches(df, 5, ["id"], guard_rows=10).agg(
            F.max(BATCH_COL)
        ).collect()
    # explicit opt-out never fires, even under a tight profile
    tight = Profile(name="tight", assign_batches_max_rows=10)
    with profile_ctx(tight):
        n = (
            assign_batches(df, 5, ["id"], guard_rows=None)
            .agg(F.max(BATCH_COL))
            .collect()[0][0]
        )
    assert n == 9
