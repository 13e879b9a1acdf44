"""Complete the r7 sf10 bench after the exact-triangle disk-exhaustion
abort: run the not-yet-measured bench2 queries under bench.py's exact
session config, merge with the per-query timings the aborted run already
printed (## lines on stderr), and emit the full BENCH JSON with the gate
fields computed by bench.py's committed rules.

One-shot round-7 tool; the artifact records its provenance in a "note".

Usage: python tools/finish_bench_sf10.py DONE_TIMINGS.json OUT.json [NOTE]
  DONE_TIMINGS.json: {"queries": {...}, "heavy_queries": {...}} parsed
  from the aborted run's ## lines.
  NOTE: provenance sentence for the artifact's "note" field (r8: the
  note must describe THIS merge, not the r7 abort it was written for).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# single source of truth for the gate definitions (r7 ADVICE: the two
# copies here could drift from bench.py's and produce inconsistent
# artifacts) — import all three from bench
from bench import (  # noqa: E402
    QUADRATIC_CONTRACT,
    SF1_REF_BESTS_R7,
    SF10_EXCLUDED,
)

SF_DIR = "/root/repo/testdata_gen/sf10"


def main() -> None:
    done = json.load(open(sys.argv[1]))
    out_path = sys.argv[2]

    from pyspark.sql import SparkSession

    from entity_etl_spark.queries import REGISTRY

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("entity-etl-spark-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # mirror bench.py's sf10 AQE sizing (wide initial, coalesce down)
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            "512",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "64g"),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    bench_names = [n for n, q in REGISTRY.items() if "bench" in q.tags
                   and n not in SF10_EXCLUDED]
    bench2_names = [n for n, q in REGISTRY.items() if "bench2" in q.tags
                    and n not in SF10_EXCLUDED]

    timings = dict(done.get("queries", {}))
    timings2 = dict(done.get("heavy_queries", {}))
    todo = [n for n in bench_names if n not in timings] + [
        n for n in bench2_names if n not in timings2
    ]
    print(f"remaining: {todo}", file=sys.stderr, flush=True)

    REGISTRY[bench_names[0]].fn(spark, SF_DIR).count()  # warm-up
    for name in todo:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        tgt = timings if name in bench_names else timings2
        tgt[name] = round(best, 3)
        print(f"## {name}: {tgt[name]}s", file=sys.stderr, flush=True)

    ref = dict(SF1_REF_BESTS_R7)

    def ceiling(name: str) -> float:
        factor = 110.0 if name in QUADRATIC_CONTRACT else 15.0
        return factor * ref[name] + 3.0

    allt = {**timings, **timings2}
    breaches = {
        n: {"sec": t, "factor_ceiling": round(ceiling(n), 1)}
        for n, t in allt.items()
        if n in ref and t > ceiling(n)
    }
    ungated = sorted(set(allt) - set(ref))
    total = round(sum(timings.values()), 3)
    artifact = {
        "metric": "headline-queries-total-sec",
        "value": total,
        "unit": "sec",
        "frozen18_subtotal_sec": round(
            total
            - timings.get("minhash_near_dups", 0.0)
            - timings.get("minhash_near_dups_xxh64_pairs", 0.0),
            3,
        ),
        "queries": timings,
        "heavy_total_sec": round(sum(timings2.values()), 3),
        "heavy_queries": timings2,
        "heavy_ceiling_breaches": {},
        "sf1_factor_breaches": {},
        "sf1_ratchet_ungated": [],
        "sf10_factor_breaches": breaches,
        "sf10_ratchet_ungated": ungated,
        "sf10_excluded": SF10_EXCLUDED,
        "sf": "10",
        "note": sys.argv[3]
        if len(sys.argv) > 3
        else "timings merged from an aborted run plus a same-config "
        "completion run in a fresh JVM; gate fields computed with "
        "bench.py's committed rules.",
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(artifact) + "\n")
    print(json.dumps(artifact))
    spark.stop()


if __name__ == "__main__":
    main()
