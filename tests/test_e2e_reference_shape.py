"""Full reference-shaped integration: paginated REST source -> incremental
pipeline -> batched HTTP sink, across two simulated cron ticks
(reference EP1, app.js:13-60 + crontab:1).

Everything the reference does in one run happens here: type discovery from
a catalog, paginated incremental fetch, changed-row suppression against
persisted state, template projection, batch assembly, HTTP PUT per batch,
state+checkpoint persistence after the send."""

import glob
import json
import os

from entity_etl_spark.checkpoint import load_checkpoint
from entity_etl_spark.mapping import load_projection_specs
from entity_etl_spark.model import EngineConfig, TableSpec
from entity_etl_spark.pipeline import run_incremental
from entity_etl_spark.sinks import http_sink
from entity_etl_spark.sources import rest_source

SPEC = TableSpec(name="awsEc2", id_field="AWSUniqueId", ts_field="updatedOnMs")


def entity(uid, name_tag, state, ts):
    return {
        "AWSUniqueId": uid,
        "aws_arn": f"arn:aws:ec2::instance/{uid}",
        "aws_instance_id": uid.split("_")[0],
        "aws_tag_Name": name_tag,
        "aws_state": state,
        "updatedOnMs": ts,
    }


class FakeApi:
    """Paginated incremental source (reference README.md:205-256)."""

    def __init__(self, entities, page_size=2):
        self.entities = entities
        self.page_size = page_size
        self.calls = 0

    def fetch(self, updated_from_ms):
        self.calls += 1
        newer = sorted(
            (e for e in self.entities if e["updatedOnMs"] > updated_from_ms),
            key=lambda e: e["updatedOnMs"],
        )
        page = newer[: self.page_size]
        return {"items": page, "partialResults": len(newer) > self.page_size}


def run_tick(spark, api, cfg, capture_dir):
    src, saw_partial = rest_source(spark, api.fetch, load_checkpoint(cfg.state_dir, SPEC.name))
    if "aws_tag_Name" not in src.columns:  # ragged page without tags
        from pyspark.sql import functions as F

        src = src.withColumn("aws_tag_Name", F.lit(None).cast("string"))

    os.makedirs(capture_dir, exist_ok=True)

    def sink(bodies):
        # the post callable runs on executors — capture via the filesystem,
        # the same boundary a real HTTP target sits behind
        def post(body):
            path = os.path.join(capture_dir, f"{abs(hash(body))}.json")
            with open(path, "w") as f:
                f.write(body)
            return 200
        http_sink(bodies, post)

    return run_incremental(
        spark, SPEC, src, load_projection_specs()["awsEc2"], cfg, sink,
        partial_results=saw_partial,
    )


def read_bodies(capture_dir):
    return [json.load(open(p)) for p in glob.glob(os.path.join(capture_dir, "*.json"))]


def test_two_cron_ticks_end_to_end(spark, tmp_path):
    cfg = EngineConfig(max_batch_size=2, state_dir=str(tmp_path / "state"))

    # tick 1: three entities, page size 2 -> two pages drained in one tick
    api = FakeApi([
        entity("i-1_acc", "frontend", "running", 100),
        entity("i-2_acc", "", "running", 200),
        entity("i-3_acc", "db", "stopped", 300),
    ])
    r1 = run_tick(spark, api, cfg, str(tmp_path / "sent1"))
    sent1 = read_bodies(str(tmp_path / "sent1"))
    assert api.calls == 2                      # do…while(partialResults)
    assert r1.emitted_rows == 3
    assert r1.checkpoint_ms == 300
    items1 = [it for body in sent1 for it in body]
    assert len(items1) == 3
    by_id = {it["asset"]: it for it in items1}
    assert by_id["i-1_acc"]["name"] == "frontend"      # tag wins
    assert by_id["i-2_acc"]["name"] == "i-2"           # empty tag -> fallback
    assert by_id["i-1_acc"]["type"] == "VM"
    assert by_id["i-1_acc"]["cmdb_ci"] == "arn:aws:ec2::instance/i-1_acc"
    assert all(len(b) <= 2 for b in sent1)             # maxBatchSize respected

    # tick 2: one entity re-stamped unchanged, one changed, one new
    api2 = FakeApi([
        entity("i-1_acc", "frontend", "running", 400),   # unchanged content
        entity("i-3_acc", "db", "running", 500),         # state changed
        entity("i-4_acc", "cache", "running", 600),      # new
    ])
    r2 = run_tick(spark, api2, cfg, str(tmp_path / "sent2"))
    sent2 = read_bodies(str(tmp_path / "sent2"))
    assert r2.emitted_rows == 2
    assert r2.checkpoint_ms == 600
    ids2 = sorted(it["asset"] for body in sent2 for it in body)
    assert ids2 == ["i-3_acc", "i-4_acc"]

    # tick 3: nothing new at the source -> no fetch beyond one empty page,
    # nothing sent, checkpoint stays
    api3 = FakeApi([])
    r3 = run_tick(spark, api3, cfg, str(tmp_path / "sent3"))
    sent3 = read_bodies(str(tmp_path / "sent3"))
    assert r3.emitted_rows == 0
    assert sent3 == []
    assert r3.checkpoint_ms == 600
