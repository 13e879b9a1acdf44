"""Assemble a full bench artifact from per-query timing fragments.

The r9 sf10 situation: this round's box has less RAM than r8's, and the
kernel OOM-kills one 48-64g bench JVM at semantic_dedup_pairs' Python
BLAS stage (32 workers' block matrices on top of the heap) — twice,
reproducibly. The committed recovery pattern (finish_bench_sf10.py, r7)
is: keep the ## per-query lines the aborted runs already printed, run
the missing queries in FRESH bench-config JVMs (tools/time_query.py),
and emit one artifact with the gate fields computed by bench.py's
committed rules.

This tool generalizes that merge: it takes any number of {name: sec}
JSON fragments (aborted-run parses, time_query outputs), min-merges
them, splits headline vs heavy by the registry's bench/bench2 tags, and
computes every gate field from the bench.py module-level definitions.

Usage: python tools/assemble_bench.py SF OUT.json FRAG1.json [...] [--note TEXT]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import (  # noqa: E402
    HEAVY_CEILINGS_SF01,
    QUADRATIC_CONTRACT,
    SF01_REF_BESTS,
    SF1_REF_BESTS,
    SF10_EXCLUDED,
)


def main() -> None:
    args = sys.argv[1:]
    note = ""
    if "--note" in args:
        i = args.index("--note")
        note = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf, out_path, frag_paths = args[0], args[1], args[2:]

    merged: dict[str, float] = {}
    for p in frag_paths:
        for n, t in json.load(open(p)).items():
            t = float(t)
            merged[n] = min(merged.get(n, 9e9), t)

    from entity_etl_spark.queries import REGISTRY

    excluded = dict(SF10_EXCLUDED) if sf == "10" else {}
    bench1 = [
        n for n, q in REGISTRY.items()
        if "bench" in q.tags and n not in excluded
    ]
    bench2 = [
        n for n, q in REGISTRY.items()
        if "bench2" in q.tags and n not in excluded
    ]
    missing = [n for n in bench1 + bench2 if n not in merged]
    if missing:
        raise SystemExit(f"fragments missing queries: {missing}")
    timings = {n: round(merged[n], 3) for n in bench1}
    timings2 = {n: round(merged[n], 3) for n in bench2}
    both = {**timings, **timings2}

    breaches = (
        {
            n: {"sec": t, "ceiling": HEAVY_CEILINGS_SF01[n]}
            for n, t in timings2.items()
            if n in HEAVY_CEILINGS_SF01 and t > HEAVY_CEILINGS_SF01[n]
        }
        if sf == "0.1"
        else {}
    )

    def ceil_sf1(n):
        return (110.0 if n in QUADRATIC_CONTRACT else 15.0) * SF01_REF_BESTS[n] + 2.0

    def ceil_sf10(n):
        return (110.0 if n in QUADRATIC_CONTRACT else 15.0) * SF1_REF_BESTS[n] + 3.0

    sf1_breaches = (
        {
            n: {"sec": t, "factor_ceiling": round(ceil_sf1(n), 1)}
            for n, t in both.items()
            if n in SF01_REF_BESTS and t > ceil_sf1(n)
        }
        if sf == "1"
        else {}
    )
    sf1_ungated = sorted(set(both) - set(SF01_REF_BESTS)) if sf == "1" else []
    sf10_breaches = (
        {
            n: {"sec": t, "factor_ceiling": round(ceil_sf10(n), 1)}
            for n, t in both.items()
            if n in SF1_REF_BESTS and t > ceil_sf10(n)
        }
        if sf == "10"
        else {}
    )
    sf10_ungated = (
        sorted(set(both) - set(SF1_REF_BESTS)) if sf == "10" else []
    )

    total = round(sum(timings.values()), 3)
    frozen18 = round(
        total
        - timings.get("minhash_near_dups", 0.0)
        - timings.get("minhash_near_dups_xxh64_pairs", 0.0),
        3,
    )
    artifact = {
        "metric": "headline-queries-total-sec",
        "value": total,
        "unit": "sec",
        "frozen18_subtotal_sec": frozen18,
        "queries": timings,
        "heavy_total_sec": round(sum(timings2.values()), 3),
        "heavy_queries": timings2,
        "heavy_ceiling_breaches": breaches,
        "sf1_factor_breaches": sf1_breaches,
        "sf1_ratchet_ungated": sf1_ungated,
        "sf10_factor_breaches": sf10_breaches,
        "sf10_ratchet_ungated": sf10_ungated,
        "sf10_excluded": excluded,
        "sf": sf,
        "note": note
        or (
            "assembled from "
            + ", ".join(os.path.basename(p) for p in frag_paths)
            + " (per-query min); gate fields recomputed from bench.py's "
            "committed rules"
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({k: artifact[k] for k in (
        "value", "frozen18_subtotal_sec", "heavy_total_sec",
        "sf1_factor_breaches", "sf10_factor_breaches",
        "sf10_ratchet_ungated")}))


if __name__ == "__main__":
    main()
