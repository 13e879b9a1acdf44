"""Shared gate-recomputation + artifact assembly for the bench merge
tools (ADVICE r9: merge_bench_min.py and assemble_bench.py each carried
a copy of this logic, which could silently diverge on the next gate-rule
change). Every rule constant comes from bench.py's committed module-level
definitions, so merged artifacts stay bit-compatible with single-run
artifacts.
"""

from __future__ import annotations

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


def factor_ceiling(name: str, refs: dict[str, float], pad: float) -> float:
    """The cross-decade scaling gate: quadratic-contract queries may
    scale ~110x per decade, everything else 15x, plus a fixed-cost
    pad."""
    return (110.0 if name in QUADRATIC_CONTRACT else 15.0) * refs[name] + pad


def build_artifact(
    sf: str,
    timings: dict[str, float],
    timings2: dict[str, float],
    note: str,
) -> dict:
    """Assemble the bench.py-shaped artifact dict: headline + heavy
    groups, heavy ceilings (sf0.1), factor ratchets vs the committed
    previous-decade reference bests (sf1 vs sf0.1 refs, sf10 vs sf1
    refs), ungated lists, and the frozen-18 subtotal."""
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
    sf1_breaches = (
        {
            n: {
                "sec": t,
                "factor_ceiling": round(
                    factor_ceiling(n, SF01_REF_BESTS, 2.0), 1
                ),
            }
            for n, t in both.items()
            if n in SF01_REF_BESTS
            and t > factor_ceiling(n, SF01_REF_BESTS, 2.0)
        }
        if sf == "1"
        else {}
    )
    sf1_ungated = (
        sorted(set(both) - set(SF01_REF_BESTS)) if sf == "1" else []
    )
    sf10_breaches = (
        {
            n: {
                "sec": t,
                "factor_ceiling": round(
                    factor_ceiling(n, SF1_REF_BESTS, 3.0), 1
                ),
            }
            for n, t in both.items()
            if n in SF1_REF_BESTS
            and t > factor_ceiling(n, SF1_REF_BESTS, 3.0)
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
    return {
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
        "note": note,
    }
