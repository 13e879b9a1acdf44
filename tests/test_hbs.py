"""Golden tests for the Handlebars-dialect compiler (hbs.py) against the
reference's own template + fixture (reference test/templates.test.js:24-43,
templates/awsElb.hbs)."""

import os

import pytest

from entity_etl_spark.hbs import compile_hbs, render_hbs

# templates/awsElb.hbs, byte-for-byte (fixture data, cited above)
AWS_ELB_HBS = (
    '{\n'
    '"cmdb_ci": "{{entity.aws_arn}}",\n'
    '"asset": "{{entity.AWSUniqueId}}",\n'
    '"install_date": "{{entity.aws_create_time}}",\n'
    '"name": "{{#with entity.aws_tag_Name}}{{.}}{{else}}'
    '{{entity.AWSUniqueId}}{{/with}}",\n'
    '"type": "ELB"\n'
    '}'
)

REF_PATH = "/root/reference/templates/awsElb.hbs"


def _fixture_df(spark, tag_name):
    return spark.createDataFrame(
        [("arn-1", "awsuid-2", "2020-05-12T12:34:56.123Z", tag_name)],
        "aws_arn string, AWSUniqueId string, aws_create_time string, "
        "aws_tag_Name string",
    )


def test_template_matches_reference_file():
    if not os.path.exists(REF_PATH):
        pytest.skip("reference checkout not present")
    with open(REF_PATH) as f:
        assert f.read() == AWS_ELB_HBS


def test_awselb_render_byte_identical(spark):
    # reference fixture entity (test/templates.test.js:26-33) renders to the
    # template text with refs substituted — newlines and all
    out = render_hbs(_fixture_df(spark, "name-3"), AWS_ELB_HBS).first()["rendered"]
    assert out == (
        '{\n'
        '"cmdb_ci": "arn-1",\n'
        '"asset": "awsuid-2",\n'
        '"install_date": "2020-05-12T12:34:56.123Z",\n'
        '"name": "name-3",\n'
        '"type": "ELB"\n'
        '}'
    )
    import json

    assert json.loads(out) == {
        "cmdb_ci": "arn-1",
        "asset": "awsuid-2",
        "install_date": "2020-05-12T12:34:56.123Z",
        "name": "name-3",
        "type": "ELB",
    }


def test_with_fallback_on_empty_and_null(spark):
    for tag in ("", None):
        out = render_hbs(_fixture_df(spark, tag), AWS_ELB_HBS).first()["rendered"]
        assert '"name": "awsuid-2"' in out


def test_mustache_escapes_html_triple_does_not(spark):
    df = _fixture_df(spark, 'a&b<c>"d\'e`f=g')
    esc = render_hbs(df, "{{entity.aws_tag_Name}}").first()["rendered"]
    assert esc == "a&amp;b&lt;c&gt;&quot;d&#x27;e&#x60;f&#x3D;g"
    raw = render_hbs(df, "{{{entity.aws_tag_Name}}}").first()["rendered"]
    assert raw == 'a&b<c>"d\'e`f=g'


def test_with_numeric_zero_is_falsy(spark):
    df = spark.createDataFrame([(0, "fb"), (7, "fb")], ["n", "alt"])
    tpl = "{{#with entity.n}}{{.}}{{else}}{{entity.alt}}{{/with}}"
    rows = render_hbs(df.orderBy("n"), tpl).collect()
    assert [r["rendered"] for r in rows] == ["fb", "7"]


def test_missing_column_renders_empty_and_env(spark):
    df = _fixture_df(spark, "x")
    assert render_hbs(df, "[{{entity.nope}}]").first()["rendered"] == "[]"
    os.environ["HBS_TEST_FOO"] = "bar"
    assert (
        render_hbs(df, "foo={{env.HBS_TEST_FOO}}").first()["rendered"] == "foo=bar"
    )


def test_each_rejected(spark):
    df = _fixture_df(spark, "x")
    with pytest.raises(ValueError, match="each"):
        compile_hbs("{{#each entities}}{{{.}}}{{/each}}", df)


def _collect_entity_refs(parts):
    from entity_etl_spark.hbs import _WithNode

    refs = []
    for p in parts:
        if isinstance(p, _WithNode):
            if p.subject.startswith("entity."):
                refs.append(p.subject[len("entity."):])
            refs += _collect_entity_refs(p.then_parts)
            refs += _collect_entity_refs(p.else_parts)
        elif p[0] == "ref":
            expr = p[1].strip()
            if expr.startswith("entity."):
                refs.append(expr[len("entity."):])
    return refs


def test_every_reference_template_renders_through_hbs(spark):
    """Migration guarantee: every shipped reference entity template
    compiles and renders through hbs.py with all fields populated — and
    the two templates with known invalid-JSON bugs (awsS3 trailing comma,
    awsDynamoDb missing comma; documented in specs/) reproduce EXACTLY
    those bugs, because the compiler is byte-faithful."""
    import glob
    import json

    from entity_etl_spark.hbs import _parse, render_hbs

    tdir = "/root/reference/templates"
    if not os.path.isdir(tdir):
        pytest.skip("reference checkout not present")
    files = [
        f for f in sorted(glob.glob(tdir + "/*.hbs"))
        if not f.endswith("targetBody.hbs")
    ]
    assert len(files) == 19  # the 19 entity-type templates (minus targetBody)
    broken = {"awsS3.hbs", "awsDynamoDb.hbs"}
    rendered_ok = 0
    for path in files:
        text = open(path).read()
        refs = sorted(set(_collect_entity_refs(_parse(text))))
        assert refs, path  # every template references entity fields
        row = tuple(f"v_{r}" for r in refs)
        schema = ", ".join(f"`{r}` string" for r in refs)
        df = spark.createDataFrame([row], schema)
        out = render_hbs(df, text).first()["rendered"]
        name = os.path.basename(path)
        if name in broken:
            with pytest.raises(json.JSONDecodeError):
                json.loads(out)
        else:
            obj = json.loads(out)
            assert obj and all(isinstance(v, str) for v in obj.values()), name
            rendered_ok += 1
    assert rendered_ok == len(files) - len(broken)
