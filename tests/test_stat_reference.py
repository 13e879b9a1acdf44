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


# --------------------------------------------------------------- round 5
# Hand-computable fixtures for the round-4 graph/recommendation/embedding
# analytics (the Benford lesson: shared-formula parity can pass on a
# shared misunderstanding — each test below states the expected numbers
# from first principles and drives the ACTUAL registry entries).


def test_triangle_count_k4_reference(spark, tmp_path):
    """One order holding parts {1,2,3,4} is the complete graph K4:
    6 edges, C(4,3) = 4 triangles, every degree 3 so
    wedges = 4 * C(3,2) = 12 and clustering = 3*4/12 = 1.0. A pendant
    edge (order 2: parts {4, 9}) then breaks perfection — expected
    values derived inline below."""
    li = [(1, p) for p in (1, 2, 3, 4)] + [(2, 4), (2, 9)]
    spark.createDataFrame(
        li, "l_orderkey bigint, l_partkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = REGISTRY["triangle_count_copurchase"].fn(
        spark, str(tmp_path)
    ).first()
    # K4 + pendant: nodes {1,2,3,4,9}; edges = 6 + 1 = 7; triangles
    # stay 4 (the pendant closes nothing); degrees 3,3,3,4,1 ->
    # wedges = (3*2)*3/2 *... sum d(d-1) = 6+6+6+12+0 = 30, /2 = 15;
    # clustering = 3*4/15 = 0.8
    assert got["n_nodes"] == 5
    assert got["n_edges"] == 7
    assert got["n_triangles"] == 4
    assert got["clustering_coeff"] == pytest.approx(0.8, abs=1e-6)


def test_item_item_cosine_reference(spark, tmp_path):
    """3 customers: all buy parts 101 and 102; customers 1,2 also buy
    103. Binary-incidence cosine: support(101)=support(102)=3,
    support(103)=2; co(101,102)=3 -> 3/sqrt(3*3)=1.0 passes the
    min-support-3 floor; co(101,103)=co(102,103)=2 are filtered."""
    orders = [(10 * c, c) for c in (1, 2, 3)]
    li = []
    for c in (1, 2, 3):
        li += [(10 * c, 101), (10 * c, 102)]
    for c in (1, 2):
        li.append((10 * c, 103))
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(
        li, "l_orderkey bigint, l_partkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    rows = REGISTRY["item_item_cosine_topk"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.pa, r.pb, r.n_co, r.rank) == (101, 102, 3, 1)
    assert r.cosine == pytest.approx(1.0, abs=1e-6)


def test_embedding_label_probe_reference(spark, tmp_path):
    """2 separable labels in 2D: label 0 hugs the x-axis, label 1 the
    y-axis, except vector 5 (label 1 but x-aligned) which must be
    MISclassified — accuracy 1.0 for label 0, 2/3 for label 1.

    Centroids: label 0 = (0.95, 0.05); label 1 = mean of (0.1,0.9),
    (0,1),(0.8,0.2) = (0.3, 0.7). Vector 5 = (0.8,0.2):
    cos(c0) ~ 0.9994 > cos(c1) ~ 0.8137 -> predicted 0."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.1, 0.9], 1),
        (4, [0.0, 1.0], 1),
        (5, [0.8, 0.2], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = {
        r.label: r
        for r in REGISTRY["embedding_label_probe_accuracy"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got[0].n == 2 and got[0].n_correct == 2
    assert got[0].accuracy == pytest.approx(1.0, abs=1e-4)
    assert got[1].n == 3 and got[1].n_correct == 2
    assert got[1].accuracy == pytest.approx(round(2 / 3, 4), abs=1e-4)


def test_containment_pairs_against_python_reference(spark):
    """Independent brute-force reference (plain Python sets) for the
    containment operator over a randomized corpus with planted overlaps —
    catches shared-formula bugs the SQL oracle cannot (both sides could
    encode the same wrong ratio)."""
    import random
    from decimal import ROUND_HALF_UP, Decimal

    rng = random.Random(42)
    vocab = ["w%d" % i for i in range(30)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))))
    # planted: exact copies, prefixes (subsumption), and padded supersets
    docs.append((100, docs[3][1]))
    docs.append((101, " ".join(docs[5][1].split()[:8])))
    docs.append((102, docs[7][1] + " " + " ".join(rng.choice(vocab) for _ in range(20))))

    def shingles(text, k=3):
        toks = text.lower().split()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    def r6(x):
        return float(
            Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    expected = {}
    for i, (ida, ta) in enumerate(docs):
        for idb, tb in docs[i + 1 :]:
            a, b = sorted((ida, idb))
            sa = shingles(ta if a == ida else tb)
            sb = shingles(tb if b == idb else ta)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter / min(len(sa), len(sb)) >= 0.5:
                expected[(a, b)] = (
                    r6(inter / len(sa)),
                    r6(inter / len(sb)),
                    r6(inter / min(len(sa), len(sb))),
                )

    from entity_etl_spark.ext.dedup import containment_pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.containment_a, r.containment_b, r.max_containment)
        for r in containment_pairs(df, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    assert got == expected
    assert expected, "fixture must plant at least one qualifying pair"


def test_gopher_gate_against_python_reference(spark):
    """Independent Python re-implementation of every Gopher rule over a
    randomized corpus exercising newlines, bullets, ellipses, '#' runs,
    and unicode markers."""
    import random
    from decimal import ROUND_HALF_UP, Decimal

    rng = random.Random(7)
    words = ["the", "be", "to", "of", "and", "alpha", "beta", "gamma",
             "deltaeps", "x", "yy", "zzz", "####", "supercalifragilistic"]

    def rand_line():
        prefix = rng.choice(["", "", "", "- ", "* ", "• "])
        suffix = rng.choice(["", "", "", " ...", "…"])
        body = " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
        return prefix + body + suffix

    docs = [
        (i, "\n".join(rand_line() for _ in range(rng.randint(1, 6))))
        for i in range(60)
    ]

    def rhu(x, places):
        q = Decimal("1." + "0" * places)
        return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))

    def ref(text):
        import re

        toks = [t for t in re.split(r"[ \t\n\x0b\f\r]+", text.strip(" ").lower()) if t]
        n = len(toks)
        safe = max(n, 1)
        mean_wl = rhu(sum(len(t) for t in toks) / safe, 4)
        hashes = text.count("#")
        hash_ratio = rhu(hashes / safe, 6)
        lines = [ln for ln in text.split("\n") if ln.strip(" ") != ""]
        nl = max(len(lines), 1)
        ell = sum(
            1
            for ln in lines
            if ln.strip(" ").endswith("...") or ln.strip(" ").endswith("…")
        )
        bul = sum(
            1
            for ln in lines
            if ln.strip(" ").startswith("- ")
            or ln.strip(" ").startswith("* ")
            or ln.strip(" ").startswith("•")
        )
        req = sum(
            1
            for w in ("the", "be", "to", "of", "and", "that", "have", "with")
            if w in toks
        )
        rules = {
            "rule_token_count": 20 <= n <= 100_000,
            "rule_mean_word_len": 3.0 <= mean_wl <= 10.0,
            "rule_hash_ratio": hash_ratio <= 0.1,
            "rule_ellipsis_lines": rhu(ell / nl, 6) <= 0.3,
            "rule_bullet_lines": rhu(bul / nl, 6) <= 0.9,
            "rule_required_words": req >= 2,
        }
        return (
            n,
            mean_wl,
            hash_ratio,
            rhu(ell / nl, 6),
            rhu(bul / nl, 6),
            req,
            *rules.values(),
            all(rules.values()),
        )

    from entity_etl_spark.ext.text import gopher_gate

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (
            r.n_tokens,
            r.mean_word_len,
            r.hash_word_ratio,
            r.ellipsis_line_frac,
            r.bullet_line_frac,
            r.required_word_hits,
            r.rule_token_count,
            r.rule_mean_word_len,
            r.rule_hash_ratio,
            r.rule_ellipsis_lines,
            r.rule_bullet_lines,
            r.rule_required_words,
            r.keep,
        )
        for r in gopher_gate(df).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == ref(text), (doc_id, text, got[doc_id], ref(text))
