"""CLI entry point (reference EP1/EP2/EP3, app.js:13-42).

    python -m entity_etl_spark [table ...]

Runs one incremental pipeline pass for every configured table (or only the
requested ones — reference `node app awsEc2 gce`, app.js:62-69). Any
argument containing ``-h`` prints usage and exits before any I/O
(app.js:15,33-42).

The demo catalog processes the test-harness ``events`` table from
$SPARK_GRAFT_SF_DIR into JSON batch bodies under ./data/out; state and
checkpoint live under ./data/state, so consecutive runs are incremental —
run it twice and the second pass emits 0 rows.
"""

from __future__ import annotations

import os
import sys

USAGE = """\
Usage: python -m entity_etl_spark [options] [table1 table2 ...]

Runs the incremental ETL pipeline for the named tables (all configured
tables when none given).

Options:
  -h, --help    print this help and exit

Environment:
  SPARK_GRAFT_SF_DIR   source directory (default /root/testdata/sf0.001)
  SPARK_GRAFT_CPUS     local parallelism (default 32)
  ENGINE_STATE_DIR     state/checkpoint directory (default ./data/state)
  ENGINE_OUT_DIR       sink output directory (default ./data/out)
"""

EVENTS_PROJECTION = [
    {"target": "cmdb_ci", "source": "event_id", "string": True},
    {"target": "name", "first_nonempty": ["event_name", "event_type"]},
    {"target": "type", "value": "Event"},
    {"target": "user", "source": "user_id", "string": True},
    {"target": "comments", "template": "value={value} props={props}"},
]


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if any("-h" in a for a in argv):  # reference app.js:15 substring match
        print(USAGE)
        return 0

    from .log import setup_logger
    from .model import EngineConfig, TableSpec
    from .pipeline import run_all
    from .session import get_spark
    from .sinks import write_json
    from .sources import read_sf_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    state_dir = os.environ.get("ENGINE_STATE_DIR", "data/state")
    out_dir = os.environ.get("ENGINE_OUT_DIR", "data/out")

    from pyspark.sql import SparkSession

    setup_logger(os.environ.get("ENGINE_LOG_LEVEL", "info"))
    owns_session = SparkSession.getActiveSession() is None
    # key the AQE start width on the input size (session.py policy): a
    # big input starts shuffles wide so no final agg outgrows one task's
    # hash map; a small one keeps the plain core count
    from .session import estimate_input_bytes

    spark = get_spark(
        app_name="entity-etl-spark-cli",
        input_bytes=estimate_input_bytes(sf_dir),
    )
    spark.sparkContext.setLogLevel("WARN")

    specs = [TableSpec(name="events", id_field="event_id", ts_field="ts")]
    sources = {"events": read_sf_table(spark, sf_dir, "events")}
    projections = {"events": EVENTS_PROJECTION}
    config = EngineConfig(state_dir=state_dir)

    def sink(bodies):
        write_json(bodies, os.path.join(out_dir, "bodies"), mode="append")

    results = run_all(
        spark, specs, sources, projections, config, sink, requested=argv
    )
    for r in results:
        print(
            f"{r.table}: input={r.input_rows} emitted={r.emitted_rows} "
            f"batches={r.batches} checkpoint={r.checkpoint_ms}"
        )
    if owns_session:  # don't tear down a session some host process owns
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
