"""OPERATORS.md freshness: the committed index must be exactly what the
generator renders from the live REGISTRY — a stale doc (new query, moved
impl, edited docstring) fails here with the regen command in the
message."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_operators_md_is_fresh():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_operators_md

    with open(os.path.join(REPO, "OPERATORS.md"), encoding="utf-8") as fh:
        committed = fh.read()
    assert committed == gen_operators_md.render(), (
        "OPERATORS.md is stale — run `python tools/gen_operators_md.py` "
        "and commit the result"
    )


def test_operators_md_covers_registry():
    from entity_etl_spark.queries import REGISTRY

    with open(os.path.join(REPO, "OPERATORS.md"), encoding="utf-8") as fh:
        committed = fh.read()
    for name in REGISTRY:
        assert f"`{name}`" in committed, name
