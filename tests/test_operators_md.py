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


def test_queries_package_has_no_cross_module_name_collisions():
    """The queries/ package hoists every submodule's top-level names into
    the package namespace via globals().update (round-8 split); a name
    defined in two submodules would resolve silently last-import-wins.
    Pin that no two submodules export the same non-dunder name (names
    re-exported FROM _base — register, REGISTRY, F, read_sf_table, … —
    are shared plumbing, identical objects, and excluded by identity)."""
    import entity_etl_spark.queries as qpkg
    from entity_etl_spark.queries import _base

    submodules = [
        getattr(qpkg, n)
        for n in dir(qpkg)
        if n.startswith("_m_")
    ]
    assert len(submodules) >= 8, "expected the 8 split submodules"
    base_names = {
        k: id(v) for k, v in vars(_base).items() if not k.startswith("__")
    }
    owner: dict[str, str] = {}
    dupes = []
    for m in submodules:
        for k, v in vars(m).items():
            if k.startswith("__"):
                continue
            # identical object shared from _base (or module imports like
            # F/Window that resolve to the same module object) — not a
            # collision
            if base_names.get(k) == id(v):
                continue
            if k in owner and owner[k][1] != id(v):
                dupes.append((k, owner[k][0], m.__name__))
            else:
                owner.setdefault(k, (m.__name__, id(v)))
    assert not dupes, f"cross-submodule name collisions: {dupes}"


def test_driver_gate_window_is_stable():
    """The driver's correctness gate runs the registry's FIRST 50 names;
    an innocently-placed new @register can silently push a gated query
    out of the window (round 10 nearly did). Pin the window to the r9
    gate set: new queries must register AFTER the first 50."""
    import json
    import os

    from entity_etl_spark.queries import REGISTRY

    gate_path = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r09.json"
    )
    with open(gate_path, encoding="utf-8") as fh:
        gate_names = list(json.load(fh))[:50]
    assert list(REGISTRY)[:50] == gate_names
