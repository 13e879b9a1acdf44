"""Engine configuration with template interpolation (O17).

The reference renders ``{{env.X}}`` and context variables inside config
strings at request time (templates.js:36-40 ``renderTemplate`` merges
``{env: process.env}``; used for endpoints app.js:78 and headers
http.js:22-28, config.json:6,15). Same contract here: ``{{name}}`` resolves
from the supplied context, ``{{env.X}}`` from process environment, unknown
references render as empty string (Handlebars default)."""

from __future__ import annotations

import json
import os
import re
from collections.abc import Mapping
from typing import Any

from .model import EngineConfig

_REF = re.compile(r"\{\{\s*([A-Za-z0-9_.]+)\s*\}\}")


def render_config_template(text: str, ctx: Mapping[str, Any] | None = None) -> str:
    """Interpolate ``{{name}}`` / ``{{env.X}}`` references (reference
    templates.js:36-40). Missing references render as ''."""
    ctx = dict(ctx or {})

    def resolve(m: re.Match) -> str:
        path = m.group(1)
        if path.startswith("env."):
            return os.environ.get(path[4:], "")
        cur: Any = ctx
        for part in path.split("."):
            if isinstance(cur, Mapping) and part in cur:
                cur = cur[part]
            else:
                return ""
        return str(cur)

    return _REF.sub(resolve, text)


def _render_deep(value: Any, ctx: Mapping[str, Any]) -> Any:
    if isinstance(value, str):
        return render_config_template(value, ctx)
    if isinstance(value, dict):
        return {k: _render_deep(v, ctx) for k, v in value.items()}
    if isinstance(value, list):
        return [_render_deep(v, ctx) for v in value]
    return value


def load_config(path: str, ctx: Mapping[str, Any] | None = None) -> EngineConfig:
    """Load an engine config JSON (reference config.json shape), rendering
    env/context references in every string value."""
    with open(path) as f:
        raw = json.load(f)
    raw = _render_deep(raw, ctx or {})
    # reference index.js boot order: logger first, from config.json:2
    from .log import setup_logger

    setup_logger(str(raw.get("logLevel", "info")))
    return EngineConfig(
        max_batch_size=int(raw.get("maxBatchSize", 10_000)),
        state_ttl_hours=float(raw.get("entitiesCacheTtlInHours", 8)),
        initial_checkpoint_ms=int(raw.get("initialCheckpointMs", 1)),
        state_dir=str(raw.get("stateDir", "data/state")),
        profile=str(raw.get("profile", "parity")),
        extra={k: v for k, v in raw.items() if k not in {
            "maxBatchSize", "entitiesCacheTtlInHours",
            "initialCheckpointMs", "stateDir", "profile"}},
    )
