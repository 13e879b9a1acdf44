"""Merge N bench.py JSON artifacts into one per-query-MIN artifact.

The r8-close practice made explicit tooling: quiet-box bench numbers on
this shared-tenant host carry transient 3-30x contention spikes that
move BETWEEN runs (the SF1_AB_r8 diagnosis) — the per-query minimum
across repeated quiet runs is the committed reference form ("per-query
MIN of the round-8 quiet runs", bench.py). This tool recomputes every
gate field (heavy ceilings, sf1/sf10 factor ratchets, ungated lists)
from bench.py's COMMITTED rule definitions, so the merged artifact is
bit-compatible with a single-run artifact and cannot drift from the
gates (the r7 ADVICE lesson behind finish_bench_sf10.py).

Usage: python tools/merge_bench_min.py OUT.json RUN1.json RUN2.json [...]
The sf field must agree across inputs. Provenance (input run list) is
recorded in a "note" field.
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
    SF1_REF_BESTS_R8,
    SF10_EXCLUDED,
)


def main() -> None:
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in run_paths]
    sfs = {r["sf"] for r in runs}
    if len(sfs) != 1:
        raise SystemExit(f"sf mismatch across inputs: {sfs}")
    sf = sfs.pop()

    def min_group(key: str) -> dict[str, float]:
        names = runs[0][key]
        for r in runs[1:]:
            if set(r[key]) != set(names):
                raise SystemExit(f"query-set mismatch in {key}")
        return {
            n: round(min(r[key][n] for r in runs), 3) for n in names
        }

    timings = min_group("queries")
    timings2 = min_group("heavy_queries")
    merged = {**timings, **timings2}

    breaches = (
        {
            n: {"sec": t, "ceiling": HEAVY_CEILINGS_SF01[n]}
            for n, t in timings2.items()
            if n in HEAVY_CEILINGS_SF01 and t > HEAVY_CEILINGS_SF01[n]
        }
        if sf == "0.1"
        else {}
    )

    def _sf1_ceiling(n: str) -> float:
        f = 110.0 if n in QUADRATIC_CONTRACT else 15.0
        return f * SF01_REF_BESTS[n] + 2.0

    def _sf10_ceiling(n: str) -> float:
        f = 110.0 if n in QUADRATIC_CONTRACT else 15.0
        return f * SF1_REF_BESTS_R8[n] + 3.0

    sf1_breaches = (
        {
            n: {"sec": t, "factor_ceiling": round(_sf1_ceiling(n), 1)}
            for n, t in merged.items()
            if n in SF01_REF_BESTS and t > _sf1_ceiling(n)
        }
        if sf == "1"
        else {}
    )
    sf1_ungated = (
        sorted(set(merged) - set(SF01_REF_BESTS)) if sf == "1" else []
    )
    sf10_breaches = (
        {
            n: {"sec": t, "factor_ceiling": round(_sf10_ceiling(n), 1)}
            for n, t in merged.items()
            if n in SF1_REF_BESTS_R8 and t > _sf10_ceiling(n)
        }
        if sf == "10"
        else {}
    )
    sf10_ungated = (
        sorted(set(merged) - set(SF1_REF_BESTS_R8)) if sf == "10" else []
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
        "sf10_excluded": dict(SF10_EXCLUDED) if sf == "10" else {},
        "sf": sf,
        "note": (
            "per-query MIN of "
            + str(len(runs))
            + " quiet runs ("
            + ", ".join(os.path.basename(p) for p in run_paths)
            + "); gate fields recomputed from bench.py's committed rules"
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({k: artifact[k] for k in (
        "value", "frozen18_subtotal_sec", "heavy_total_sec",
        "sf1_factor_breaches", "sf10_factor_breaches")}))


if __name__ == "__main__":
    main()
