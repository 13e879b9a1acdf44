"""Engine execution profiles: parity (verification) vs production (scale).

Every LSH-family pair generator in this repo carries a hot-group cap
(``ext.caps.cap_hot_groups``) so one degenerate bucket/shingle/block
cannot make a self-join O(B²) — but the registry/parity default leaves
every cap OFF so oracle comparisons see the complete output. A
deployment at 100 TB must not depend on callers remembering
``max_shingle_df`` / ``max_bucket_size`` / ``max_block_size`` per call
site, so profiles centralize the defaults:

- ``parity`` (the module default): no implicit caps anywhere — bitwise
  the pre-profile behavior, what check_parity and the driver gate run.
- ``production``: every cap knob resolves to a concrete bound when the
  caller leaves it unset, and ``batch.assign_batches``'s global-window
  guard tightens. Explicit caller arguments ALWAYS win over the profile.

Caps are keyed by each call site's pinned ``max_metric`` name (the same
name its Observation reports), so the mapping is auditable one-to-one
against drop accounting in production logs.

Activation is per-thread (``activate_profile`` sets a thread-local,
falling back to the parity default on threads that never activated)
because cap resolution happens deep inside operators that deliberately
do not take an EngineConfig; ``pipeline.run_incremental``/``run_all``
activate the profile named by their EngineConfig on entry. Thread-local
scope means concurrent runs on threads sharing one SparkSession — a
normal Spark pattern — each resolve caps under their OWN profile
instead of racing on a process global. Caps resolve at plan-BUILD time
on the driver, so the thread that builds the plan is the thread whose
profile applies; a plan built on one thread and executed on another
keeps the builder's caps (they are baked into the plan). Tests use the
``profile_ctx`` context manager to avoid leaking state.
"""

from __future__ import annotations

import contextlib
import threading
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Profile:
    name: str
    # cap per call site, keyed by the site's pinned max_metric name;
    # a site absent from the map resolves to None (uncapped)
    caps: dict = field(default_factory=dict)
    # assign_batches raises above this many rows (its global row_number
    # window funnels one partition; the distributed variant is the scale
    # path). None = unguarded.
    assign_batches_max_rows: int | None = None
    # warn when minhash signature materialization falls back to
    # localCheckpoint (signature_path=None): fine for parity runs, a
    # durability smell in production (executor loss recomputes the fold)
    warn_unmaterialized_signatures: bool = False

    def cap_for(self, max_metric: str) -> int | None:
        return self.caps.get(max_metric)


PARITY = Profile(
    name="parity",
    caps={},
    # even parity gets a (generous) guard: the single-partition window is
    # wrong long before 5M rows, and an oracle run never needs that many
    assign_batches_max_rows=5_000_000,
)

PRODUCTION = Profile(
    name="production",
    caps={
        # banded-LSH bucket self-join (ext/dedup.lsh_candidate_pairs)
        "lsh_max_bucket_size": 2_000,
        # shingle-inverted-index counting joins (jaccard_pairs /
        # containment_pairs): df cap per shingle
        "jac_max_shingle_df": 10_000,
        "cont_max_shingle_df": 10_000,
        # SimHash pigeonhole block join (ext/dedup.simhash_near_dups)
        "simhash_max_block_size": 2_000,
        # hyperplane-LSH top-k corpus buckets (ext/similarity.lsh_topk)
        "lshtopk_max_bucket_size": 10_000,
        # generic within-group pair explode (ext/graph.within_group_pairs:
        # default name, plus every call site that pins its OWN metric
        # name — resolution is keyed by the name actually passed, so each
        # pinned name needs its own entry or the cap silently never
        # applies (r7 review finding)
        "pairs_max_group_size": 5_000,
        "tri_max_order_items": 5_000,       # co-purchase whale orders
        "ii_max_basket_size": 5_000,        # item-item whale baskets
        "etc_max_user_types": 5_000,        # co-occurrence whale users
        # entity-resolution clean-side blocks (ext/er.resolve_entities)
        "er_max_block_size": 2_000,
    },
    assign_batches_max_rows=1_000_000,
    warn_unmaterialized_signatures=True,
)

_PROFILES = {p.name: p for p in (PARITY, PRODUCTION)}

# Per-thread activation (r8, ADVICE): a process-global Profile raced when
# concurrent run_incremental calls on threads sharing one SparkSession
# activated different profiles — caps could resolve under the WRONG
# thread's profile at plan-build time. Each thread now owns its slot;
# threads that never activate read the parity default.
_local = threading.local()


def activate_profile(name_or_profile: str | Profile) -> Profile:
    """Set the CURRENT THREAD's active profile; returns the Profile."""
    if isinstance(name_or_profile, Profile):
        _local.profile = name_or_profile
    else:
        try:
            _local.profile = _PROFILES[name_or_profile]
        except KeyError:
            raise ValueError(
                f"unknown profile {name_or_profile!r}; "
                f"choose from {sorted(_PROFILES)}"
            ) from None
    return _local.profile


def active_profile() -> Profile:
    return getattr(_local, "profile", PARITY)


@contextlib.contextmanager
def profile_ctx(name_or_profile: str | Profile):
    """Temporarily activate a profile (tests; scoped production runs)."""
    prev = active_profile()
    try:
        yield activate_profile(name_or_profile)
    finally:
        activate_profile(prev)


def resolve_cap(explicit: int | None, max_metric: str) -> int | None:
    """An explicitly passed cap always wins; an unset (None) cap falls
    back to the active profile's default for this call site."""
    if explicit is not None:
        return explicit
    return active_profile().cap_for(max_metric)
