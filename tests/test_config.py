"""Config interpolation tests — port of reference test/templates.test.js:45-48
(env-var interpolation) plus deep-config rendering."""

import json

from entity_etl_spark.config import load_config, render_config_template


def test_env_and_ctx_interpolation(monkeypatch):
    # reference test: renderTemplate('name={{name}}&foo={{env.foo}}')
    monkeypatch.setenv("foo", "bar")
    out = render_config_template(
        "name={{name}}&foo={{env.foo}}", {"name": "qux"}
    )
    assert out == "name=qux&foo=bar"


def test_missing_refs_render_empty(monkeypatch):
    monkeypatch.delenv("NOPE", raising=False)
    assert render_config_template("a={{missing}} b={{env.NOPE}}") == "a= b="


def test_nested_ctx_path():
    assert render_config_template("t={{type.name}}", {"type": {"name": "vm"}}) == "t=vm"


def test_load_config_renders_strings(tmp_path, monkeypatch):
    monkeypatch.setenv("TOKEN", "s3cr3t")
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps({
        "maxBatchSize": 500,
        "entitiesCacheTtlInHours": 2,
        "stateDir": "/tmp/state",
        "target": {"headers": {"Authorization": "Bearer {{env.TOKEN}}"}},
    }))
    cfg = load_config(str(cfg_path))
    assert cfg.max_batch_size == 500
    assert cfg.state_ttl_hours == 2.0
    assert cfg.extra["target"]["headers"]["Authorization"] == "Bearer s3cr3t"
