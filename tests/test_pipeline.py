"""End-to-end incremental-run test (reference EP1 shape, app.js:13-60):
two consecutive runs over a growing source; the second run must emit only
new/changed rows, advance the checkpoint, and respect batching."""

import json

from entity_etl_spark.model import EngineConfig, TableSpec
from entity_etl_spark.pipeline import run_incremental

SPEC = TableSpec(name="entities", id_field="id", ts_field="updatedOnMs")
PROJ = [
    {"target": "cmdb_ci", "source": "id", "string": True},
    {"target": "value", "source": "x", "string": True},
    {"target": "vendor", "value": "Amazon"},
]
COLS = ["id", "x", "updatedOnMs"]


def make_sink(captured):
    def sink(bodies):
        for r in bodies.collect():
            captured.extend(json.loads(r["body"]))
    return sink


def test_two_incremental_runs(spark, tmp_path):
    cfg = EngineConfig(max_batch_size=2, state_dir=str(tmp_path / "state"))

    run1_src = spark.createDataFrame([(1, 11, 10), (2, 12, 20), (3, 13, 30)], COLS)
    sent1: list = []
    r1 = run_incremental(spark, SPEC, run1_src, PROJ, cfg, make_sink(sent1))
    assert r1.emitted_rows == 3
    assert r1.checkpoint_ms == 30
    assert r1.batches == 2  # 3 rows / max_batch_size 2
    assert sorted(e["cmdb_ci"] for e in sent1) == ["1", "2", "3"]
    assert all(e["vendor"] == "Amazon" for e in sent1)

    # run 2: source now also contains rows at/below the checkpoint (must be
    # skipped by the incremental scan), one changed row, one identical row
    # re-stamped, and one new row
    run2_src = spark.createDataFrame(
        [(1, 11, 10), (2, 12, 20), (3, 13, 30),   # old, below checkpoint
         (2, 24, 31),                              # changed
         (3, 13, 32),                              # same content, new ts
         (4, 14, 40)],                             # new id
        COLS,
    )
    sent2: list = []
    r2 = run_incremental(spark, SPEC, run2_src, PROJ, cfg, make_sink(sent2))
    assert r2.input_rows == 3          # incremental scan saw only ts>30
    assert r2.emitted_rows == 2        # changed (2) + new (4); 3 suppressed
    assert r2.checkpoint_ms == 40
    assert sorted(e["cmdb_ci"] for e in sent2) == ["2", "4"]
    got2 = {e["cmdb_ci"]: e["value"] for e in sent2}
    assert got2["2"] == "24"
