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
