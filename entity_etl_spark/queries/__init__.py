"""Query registry package (split from the former single-file
queries.py in round 8 — mechanical, behavior-preserving; registration
order is pinned by the submodule import order below, so REGISTRY
iteration order is unchanged).

Every public and private top-level name of every submodule is hoisted
into this namespace so `from entity_etl_spark.queries import X` keeps
working for everything the single file used to export."""

from . import _base
from ._base import *  # noqa: F401,F403
from ._base import Q, REGISTRY, register, _ts_str  # noqa: F401

from . import core as _m_core
from . import analytics as _m_analytics
from . import ext_dedup_sim as _m_ext_dedup_sim
from . import composed_functions as _m_composed_functions
from . import training_pipeline as _m_training_pipeline
from . import decision_support as _m_decision_support
from . import tpch_completion as _m_tpch_completion
from . import stats_rounds as _m_stats_rounds

for _m in (_base, _m_core, _m_analytics, _m_ext_dedup_sim, _m_composed_functions, _m_training_pipeline, _m_decision_support, _m_tpch_completion, _m_stats_rounds):
    globals().update(
        {k: v for k, v in vars(_m).items() if not k.startswith("__")}
    )
del _m
