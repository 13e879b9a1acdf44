"""Per-query Spark job/stage/task counter: fresh JVM, bench-identical
config, one query per job group.

Usage: python tools/count_jobs.py SF_DIR QUERY [QUERY...]
Env: CJ_CPUS (default 32), CJ_MEM (default 16g).

Prints one JSON line {query: {"sec": s, "jobs": n, "stages": n,
"tasks": n}, ...}. Job/stage/task counts come from the public
StatusTracker keyed by a per-query job group — the evidence layer for
"this change removed N Spark jobs per micro-batch" claims, where
wall-clock alone is noise-bound at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    from entity_etl_spark.queries import REGISTRY

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    cpus = os.environ.get("CJ_CPUS", "32")
    mem = os.environ.get("CJ_MEM", "16g")

    spark = (
        SparkSession.builder.appName("cj")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.driver.memory", mem)
        .config("spark.ui.enabled", "false")
        # job history must cover one whole query's jobs/stages so the
        # counter reads complete groups (bench queries run hundreds of
        # jobs in streaming harnesses)
        .config("spark.ui.retainedJobs", "20000")
        .config("spark.ui.retainedStages", "20000")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    REGISTRY["incremental_scan"].fn(spark, sf_dir).count()  # warm-up

    def next_job_id() -> int:
        # job-group attribution is thread-local and misses jobs submitted
        # by Structured Streaming's micro-batch thread; the DAGScheduler's
        # monotonically increasing job counter sees every job regardless
        # of submitting thread
        v = sc._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else int(v.get())

    out = {}
    for name in names:
        j0 = next_job_id()
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        sec = time.perf_counter() - t0
        j1 = next_job_id()
        # status store updates asynchronously; give it a beat
        time.sleep(0.5)
        tracker = sc.statusTracker()
        stages: set[int] = set()
        for jid in range(j0, j1):
            info = tracker.getJobInfo(jid)
            if info is not None:
                stages.update(info.stageIds)
        tasks = 0
        for sid in stages:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                tasks += sinfo.numTasks
        out[name] = {
            "sec": round(sec, 3),
            "jobs": j1 - j0,
            "stages": len(stages),
            "tasks": tasks,
        }
        print(f"## {name}: {json.dumps(out[name])}", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
