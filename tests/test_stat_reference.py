"""Independent reference implementations for the round-4 statistical
operators (chi-squared independence, Mann-Whitney U).

The DuckDB oracles share each query's algebra (the observed-cells
identity, the per-value-count U form), so parity alone cannot catch a
formula bug — these tests recompute each statistic the textbook way
(dense contingency table with expected counts; average ranks over the
pooled sample) on a small fixture and drive the ACTUAL registry entries
over a temp parquet sf_dir.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

from entity_etl_spark.queries import REGISTRY


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_chi_square_matches_dense_table_reference(spark, tmp_path):
    # 3 event types x 3 weekdays, with one (type, dow) cell intentionally
    # EMPTY: the dense-table reference still charges that cell its full
    # expected count, and the observed-cells-only identity must agree.
    base = dt.datetime(2024, 1, 1)  # a Monday
    plan = [
        ("click", 0, 5), ("click", 1, 3), ("click", 2, 2),
        ("error", 0, 1), ("error", 1, 7),  # ("error", 2) empty
        ("error", 2, 0),
        ("view", 0, 2), ("view", 1, 2), ("view", 2, 6),
    ]
    rows, eid = [], 0
    for etype, day, cnt in plan:
        for _ in range(cnt):
            rows.append(
                (eid, base + dt.timedelta(days=day), eid % 7, etype, 1.0, "{}")
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)

    # textbook chi2 over the DENSE r x c table
    types = sorted({p[0] for p in plan})
    days = sorted({p[1] for p in plan})
    obs = {(t, d): 0 for t in types for d in days}
    for t, d, c in plan:
        obs[(t, d)] += c
    n = sum(obs.values())
    ri = {t: sum(obs[(t, d)] for d in days) for t in types}
    cj = {d: sum(obs[(t, d)] for t in types) for d in days}
    want = 0.0
    for t in types:
        for d in days:
            e = ri[t] * cj[d] / n
            want += (obs[(t, d)] - e) ** 2 / e
    got = REGISTRY["chi_square_independence"].fn(spark, sf).first()
    assert got["n"] == n
    assert got["dof"] == (len(types) - 1) * (len(days) - 1)
    assert got["chi2"] == pytest.approx(round(want, 4), abs=1e-4)


def test_mann_whitney_matches_rank_reference(spark, tmp_path):
    # Cross-group ties included: 2.0 appears in both samples, 5.0 twice
    # within one sample — exercises both the 0.5*b_cnt tie credit and the
    # sum(t^3 - t) variance correction.
    a = [1.0, 2.0, 2.0, 5.0, 5.0, 7.0]   # click
    b = [2.0, 3.0, 5.0, 6.0, 8.0]        # error
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i, v in enumerate(a):
        rows.append((i, base, i, "click", v, "{}"))
    for i, v in enumerate(b):
        rows.append((100 + i, base, i, "error", v, "{}"))
    # a third event type that must be EXCLUDED from the test entirely
    rows.append((999, base, 0, "view", 100.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)

    # textbook U via average ranks over the pooled sample
    pooled = sorted(a + b)
    first = {}
    for idx, v in enumerate(pooled, start=1):
        first.setdefault(v, idx)
    cnt = {v: pooled.count(v) for v in set(pooled)}
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    r1 = sum(avg_rank[v] for v in a)
    n1, n2 = len(a), len(b)
    nn = n1 + n2
    want_u1 = r1 - n1 * (n1 + 1) / 2.0
    tie = sum(c**3 - c for c in cnt.values())
    sigma = math.sqrt(
        (n1 * n2 / 12.0) * ((nn + 1) - tie / (nn * (nn - 1.0)))
    )
    want_z = (want_u1 - n1 * n2 / 2.0) / sigma

    got = REGISTRY["mann_whitney_u"].fn(spark, sf).first()
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["u1"] == pytest.approx(round(want_u1, 2), abs=1e-9)
    assert got["z"] == pytest.approx(round(want_z, 4), abs=1e-4)
