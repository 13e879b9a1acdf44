"""Property-based tests (hypothesis) for the engine's pure kernels:
checkpoint rules, config interpolation, and content-hash invariants."""

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_etl_spark.checkpoint import next_checkpoint
from entity_etl_spark.config import render_config_template

ts_values = st.integers(min_value=0, max_value=2**53)


@given(new=st.one_of(st.none(), ts_values), prev=ts_values, partial=st.booleans())
@settings(max_examples=200)
def test_checkpoint_never_regresses(new, prev, partial):
    out = next_checkpoint(new, prev, partial)
    assert out >= prev


@given(new=ts_values, prev=ts_values)
@settings(max_examples=200)
def test_checkpoint_monotone_in_input(new, prev):
    # larger observed max can never produce a smaller checkpoint
    assert next_checkpoint(new + 1, prev) >= next_checkpoint(new, prev)


@given(prev=ts_values)
@settings(max_examples=100)
def test_checkpoint_partial_tie_always_advances(prev):
    # forward progress under partialResults (reference cache.js:114-117)
    assert next_checkpoint(prev, prev, partial_results=True) == prev + 1


@given(
    name=st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=0, max_size=20)
)
@settings(max_examples=100)
def test_config_template_plain_text_identity(name):
    # text without {{ }} references passes through unchanged
    assert render_config_template(name) == name


@given(val=st.text(min_size=0, max_size=30).filter(lambda s: "{{" not in s and "}}" not in s))
@settings(max_examples=100)
def test_config_template_ctx_substitution(val):
    assert render_config_template("x={{v}}", {"v": val}) == f"x={val}"


# ---- pure-kernel properties of the round-2 operators ----


def _pack_spans(sizes, capacity):
    """Reference model of concat-and-chunk packing for one shard (mirrors
    ext/packing.py's window arithmetic in plain Python)."""
    spans, off = [], 0
    for doc, n in enumerate(sizes):
        first = off // capacity
        last = (off + max(n, 1) - 1) // capacity
        for s in range(first, last + 1):
            spans.append(
                (doc, s, min((s + 1) * capacity, off + n) - max(s * capacity, off))
            )
        off += n
    return spans


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
    capacity=st.integers(min_value=1, max_value=300),
)
@settings(max_examples=200)
def test_packing_model_invariants(sizes, capacity):
    spans = _pack_spans(sizes, capacity)
    # every token lands exactly once
    per_doc = {}
    for doc, _s, tk in spans:
        per_doc[doc] = per_doc.get(doc, 0) + tk
    assert per_doc == {i: n for i, n in enumerate(sizes)}
    # every sequence but the last is exactly full
    per_seq = {}
    for _doc, s, tk in spans:
        per_seq[s] = per_seq.get(s, 0) + tk
    seqs = sorted(per_seq)
    assert seqs == list(range(len(seqs)))
    for s in seqs[:-1]:
        assert per_seq[s] == capacity
    assert 0 <= per_seq[seqs[-1]] <= capacity


@given(
    a=st.integers(min_value=0, max_value=2**64 - 1),
    flips=st.sets(st.integers(min_value=0, max_value=63), max_size=3),
)
@settings(max_examples=300)
def test_simhash_blocked_join_never_misses(a, flips):
    """The pigeonhole guarantee behind ext/dedup.simhash_near_dups: any
    pair within Hamming distance 3 shares at least one of the 4 16-bit
    blocks exactly, so the blocked equi-join can never drop a true pair."""
    b = a
    for bit in flips:
        b ^= 1 << bit
    blocks_a = [(a >> (16 * i)) & 0xFFFF for i in range(4)]
    blocks_b = [(b >> (16 * i)) & 0xFFFF for i in range(4)]
    assert any(x == y for x, y in zip(blocks_a, blocks_b))


@settings(max_examples=200, deadline=None)
@given(
    st.datetimes(
        min_value=__import__("datetime").datetime(1970, 1, 1),
        max_value=__import__("datetime").datetime(2100, 1, 1),
    ),
    st.integers(min_value=0, max_value=999_999),
)
def test_tsutil_epoch_model(dt, micros):
    """The field-arithmetic epoch model (pure-Python mirror of the tsutil
    column expressions) equals Python's own naive-UTC epoch math for every
    datetime — the invariant the Spark-side test_tsutil pins on samples."""
    import datetime as _dt

    d = dt.replace(microsecond=micros)
    # mirror of tsutil.epoch_micros: days + h/m fields, then decimal seconds
    days = (d.date() - _dt.date(1970, 1, 1)).days
    whole_min = days * 86400 + d.hour * 3600 + d.minute * 60
    # date_part('SECOND') is DECIMAL(8,6): model it as exact integer micros
    frac_us = d.second * 1_000_000 + d.microsecond
    want_us = (d - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)
    assert whole_min * 1_000_000 + frac_us == want_us
    # epoch_millis: decimal*1000 then truncating cast == integer floor-div
    assert whole_min * 1000 + frac_us // 1000 == want_us // 1000
    assert whole_min + d.second == want_us // 1_000_000


@given(
    syms=st.lists(
        st.sampled_from(["a", "b", "ab", "ba"]), min_size=1, max_size=12
    ),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "ba"]),
        st.sampled_from(["a", "b", "ab", "ba"]),
    ),
)
@settings(max_examples=300)
def test_bpe_fold_equals_greedy_merge(syms, pair):
    """The string-accumulator fold used by ext/bpe._greedy_merge (and its
    DuckDB list_reduce oracle) must equal the canonical greedy
    left-to-right BPE merge — including overlap runs like (a,a) on
    'a a a a' -> '(aa) (aa)', which a flat space-wrapped replace gets
    wrong (it consumes the separator the next match needs)."""
    l, r = pair

    def greedy_merge(seq):
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        return out

    # pure-python mirror of the fold expression
    acc = syms[0]
    for x in syms[1:]:
        if x == r and (acc == l or acc.endswith(" " + l)):
            acc = acc[: len(acc) - len(l)] + l + r
        else:
            acc = acc + " " + x
    assert acc.split(" ") == greedy_merge(syms)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        unique=True, min_size=2, max_size=50,
    ),
    st.integers(min_value=2, max_value=64),
)
def test_shuffle_rank_bucket_monotone_in_hash_order(keys, n_buckets):
    """Pure-Python mirror of distributed_shuffle_rank's bucket arithmetic:
    bucket assignment (double division of the 60-bit hash prefix) must be
    monotone non-decreasing in the full md5-hex sort order — the invariant
    that makes per-bucket ranks globally consistent. Double rounding of
    the prefix is fine BECAUSE it is monotone; a value at the very top of
    the domain may round into an extra bucket index == n_buckets, which
    is harmless (buckets are partition labels, not positions)."""
    import hashlib

    domain = 16 ** 15
    rows = []
    for k in keys:
        h = hashlib.md5(f"42:{k}".encode()).hexdigest()
        hnum = int(h[:15], 16)
        bkt = int(hnum / (domain / n_buckets))  # same IEEE math as the expr
        rows.append((h, bkt))
    rows.sort()
    bkts = [b for _, b in rows]
    assert bkts == sorted(bkts)
    assert all(0 <= b <= n_buckets for b in bkts)
