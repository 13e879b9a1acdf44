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


def test_run_incremental_with_reference_hbs_template(spark, tmp_path):
    """Migration mode: the projection is an UNMODIFIED reference .hbs
    template string — the pipeline renders entities byte-faithfully through
    the Handlebars compiler instead of a spec list."""
    import json
    import os

    from pyspark.sql import functions as F

    from entity_etl_spark.model import EngineConfig, TableSpec
    from entity_etl_spark.pipeline import run_incremental

    ref = "/root/reference/templates/awsElb.hbs"
    if os.path.exists(ref):
        template = open(ref).read()
    else:
        template = (
            '{\n"cmdb_ci": "{{entity.aws_arn}}",\n"asset": "{{entity.AWSUniqueId}}",\n'
            '"install_date": "{{entity.aws_create_time}}",\n'
            '"name": "{{#with entity.aws_tag_Name}}{{.}}{{else}}'
            '{{entity.AWSUniqueId}}{{/with}}",\n"type": "ELB"\n}'
        )

    src = spark.createDataFrame(
        [
            (1, "arn-1", "uid-1", "2020-05-12", "elb-one", 1000),
            (2, "arn-2", "uid-2", "2020-05-13", "", 2000),
        ],
        "id long, aws_arn string, AWSUniqueId string, aws_create_time string,"
        " aws_tag_Name string, updatedOnMs long",
    )
    spec = TableSpec(name="elb", id_field="id", ts_field="updatedOnMs")
    collected = []
    res = run_incremental(
        spark,
        spec,
        src,
        template,
        EngineConfig(state_dir=str(tmp_path)),
        lambda bodies: collected.extend(r["body"] for r in bodies.collect()),
    )
    assert res.emitted_rows == 2 and res.batches >= 1
    # each body is a JSON array whose elements are the rendered objects
    rendered = [x for body in collected for x in json.loads(body)]
    by_ci = {r["cmdb_ci"]: r for r in rendered}
    assert by_ci["arn-1"]["name"] == "elb-one"
    assert by_ci["arn-2"]["name"] == "uid-2"  # "" falsy -> fallback
