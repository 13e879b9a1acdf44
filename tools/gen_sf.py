"""Deterministic synthetic testdata generator — scale rehearsal beyond
the driver-provided SFs.

Replicates the schema and observed distributions of the driver's
/root/testdata tables (TESTDATA.md; stats sampled from sf0.1) at any
scale factor, into a directory the repo owns (the driver's testdata is
read-only). Parity at a generated SF is still a REAL correctness check:
check_parity runs Spark and DuckDB on the same parquet, so agreement is
engine-vs-oracle regardless of who wrote the files. Bench numbers at a
generated SF are comparable only qualitatively (data is distributionally
similar, not identical).

Usage: python tools/gen_sf.py SF [OUT_DIR]
       python tools/gen_sf.py 1            # -> testdata_gen/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE = "/root/testdata/sf0.1"  # source of the scale-free dims

US_PER_DAY = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_us(start_day: str, days: np.ndarray) -> pa.Array:
    base = np.datetime64(start_day, "us").astype("int64")
    return pa.array(base + (days * US_PER_DAY).astype("int64"),
                    type=pa.timestamp("us"))


def generate(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    # scale-free dims: copy the driver's exact region/nation tables
    for dim in ("region", "nation"):
        t = pq.read_table(os.path.join(BASE, f"{dim}.parquet"))
        _write(out_dir, dim, t)

    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    # ---- customer
    keys = np.arange(n_cust)
    _write(out_dir, "customer", pa.table({
        "c_custkey": keys,
        "c_name": pa.array([f"Customer#{k:09d}" for k in keys]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
            n_cust)),
    }))

    # ---- part
    adjs = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
    nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
    keys = np.arange(n_part)
    a_i = rng.integers(0, 8, n_part)
    n_i = rng.integers(0, 8, n_part)
    _write(out_dir, "part", pa.table({
        "p_partkey": keys,
        "p_name": pa.array([f"{adjs[a]} {nouns[b]}" for a, b in zip(a_i, n_i)]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(rng.choice(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"],
            n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    # ---- supplier
    keys = np.arange(n_supp)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": keys,
        "s_name": pa.array([f"Supplier#{k:09d}" for k in keys]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # ---- orders (orderdate uniform 1995-01-01 .. 2001-08-01, midnight)
    okeys = np.arange(n_orders)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": okeys,
        "o_custkey": rng.integers(0, n_cust, n_orders),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], n_orders)),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_orders), 2),
        "o_orderdate": _ts_us("1995-01-01",
                              rng.integers(0, 2405, n_orders).astype("int64")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            n_orders)),
    }))

    # ---- lineitem (1..7 lines per order, every order present)
    lines = rng.integers(1, 8, n_orders)
    lkey = np.repeat(okeys, lines)
    n_li = lkey.size
    lnum = np.concatenate([np.arange(1, c + 1) for c in lines]).astype("int32")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": lkey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": pa.array(lnum, type=pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
        "l_shipdate": _ts_us("1995-01-02",
                             rng.integers(0, 2499, n_li).astype("int64")),
    }))

    # ---- events (ts ascending with event_id across 30 days of 2024-01)
    ekeys = np.arange(n_events)
    secs = np.sort(rng.uniform(0, 30 * 86400, n_events))
    base_us = np.datetime64("2024-01-01", "us").astype("int64")
    _write(out_dir, "events", pa.table({
        "event_id": ekeys,
        "ts": pa.array(base_us + (secs * 1e6).astype("int64"),
                       type=pa.timestamp("us")),
        "user_id": rng.integers(0, n_users, n_events),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], n_events)),
        "value": np.round(rng.exponential(50, n_events), 2),
        "props": pa.array([f'{{"k": {k}}}'
                           for k in rng.integers(0, 100, n_events)]),
    }))

    # ---- documents: word salad over the observed 31-token vocab, with
    # planted near-dup (~2.5% of docs, ~10% token perturbation) and
    # exact-dup (~0.2%) copies of earlier docs — matches the ~256 pairs /
    # 5000 docs >=0.5-Jaccard rate sampled from the driver's sf0.1
    vocab = np.array([
        "spark", "query", "table", "join", "scan", "filter", "group",
        "agg", "sort", "hash", "merge", "stream", "batch", "window",
        "column", "row", "key", "value", "data", "line", "order", "part",
        "customer", "vector", "big", "small", "fast", "slow", "the", "a",
        "sterling",
    ])
    dkeys = np.arange(n_docs)
    tok_counts = rng.integers(10, 101, n_docs)
    texts: list[str] = []
    for c in tok_counts:
        texts.append(" ".join(vocab[rng.integers(0, vocab.size, c)]))
    n_near = int(n_docs * 0.025)
    for i in rng.choice(np.arange(10, n_docs), n_near, replace=False):
        src_toks = np.array(texts[int(rng.integers(0, i))].split())
        flip = rng.random(src_toks.size) < 0.1
        src_toks[flip] = vocab[rng.integers(0, vocab.size, int(flip.sum()))]
        texts[i] = " ".join(src_toks)
    for i in rng.choice(np.arange(10, n_docs), max(int(n_docs * 0.002), 1),
                        replace=False):
        texts[i] = texts[int(rng.integers(0, i))]
    langs = rng.choice(["en", "de", "es", "fr", "zh"], n_docs,
                       p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    _write(out_dir, "documents", pa.table({
        "doc_id": dkeys,
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{k % 20}" for k in dkeys]),
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    }))

    # ---- embeddings: ADVERSARIAL distribution (r7, VERDICT r6 item 5).
    # The driver's testdata embeddings are near-uniform on the sphere —
    # the easy regime for IVF/PQ (cells evenly filled) and the DOCUMENTED
    # weak regime for SRP-LSH. Real embedding corpora are clustered and
    # anisotropic, so the generated twins plant:
    #  - 10 label-aligned clusters (unit centroid + 0.4 noise -> same-
    #    label cosine ~0.7, cross-label ~0): IVF/PQ centroids must now
    #    track real density, SemDeDup cells are meaningfully unbalanced
    #  - a decaying per-dim noise spectrum 1/sqrt(1+i) (anisotropy: PQ
    #    subspaces carry unequal variance, JL projections see correlated
    #    mass)
    #  - ~1% near-identical clone pairs (cosine ~0.999): the planted
    #    positives semantic/near-dup gates should recover
    # Hierarchy: a weak 10-label macro layer (cos ~0.07 — enough signal
    # for the label-centroid probe, too weak to flood threshold queries)
    # over TIGHT micro-clusters (cos ~0.84) whose COUNT scales with n
    # (constant ~20 members) — so density-sensitive operators see real
    # cluster structure at every SF while pair-listing queries
    # (embedding_neardup_pairs' exact all-pairs ground truth) keep
    # LINEAR output: above-threshold pairs live inside micro-clusters.
    n_sub = max(n_emb // 20, 10)
    sub_of = rng.integers(0, n_sub, n_emb)
    sub_label = rng.integers(0, 10, n_sub).astype("int32")
    labels = sub_label[sub_of]
    macro = rng.standard_normal((10, 64))
    macro /= np.linalg.norm(macro, axis=1, keepdims=True)
    micro = rng.standard_normal((n_sub, 64))
    micro /= np.linalg.norm(micro, axis=1, keepdims=True)
    spectrum = 1.0 / np.sqrt(1.0 + np.arange(64))
    noise = rng.standard_normal((n_emb, 64)) * spectrum
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    vecs = 0.2 * macro[labels] + 0.65 * micro[sub_of] + 0.3 * noise
    n_clone = max(int(n_emb * 0.01), 1)
    dst = rng.choice(np.arange(1, n_emb), n_clone, replace=False)
    # per-clone random earlier source (src < dst). NOT a polynomial in
    # dst mod dst — any such form collapses to its constant term (the r7
    # review caught (dst*7919+13)%dst == 13: every clone copied vector
    # 13, one mega-clique whose pair count grows quadratically with SF
    # instead of the intended scattered clone PAIRS, linear in n)
    src = rng.integers(0, dst)
    vecs[dst] = vecs[src] + 0.02 * rng.standard_normal((n_clone, 64))
    labels[dst] = labels[src]
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        "float32")
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb),
        "embedding": pa.array(list(vecs),
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    sf_name = sys.argv[1]
    default = os.path.join(os.path.dirname(__file__), "..",
                           "testdata_gen", f"sf{sf_name}")
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.normpath(default)
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
