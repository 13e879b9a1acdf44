"""Projection-spec compiler tests — port of reference test/templates.test.js
golden render (:24-43) plus Handlebars edge semantics (SURVEY §7.5.1)."""

import json

from entity_etl_spark.mapping import apply_mapping, to_json_rows

# The awsElb golden fixture (test/templates.test.js:26-39) — an ELB entity
# projected to the CMDB shape of templates/awsElb.hbs.
ELB_SPEC = [
    {"target": "cmdb_ci", "source": "AWSUniqueId"},
    {"target": "name", "first_nonempty": ["aws_tag_Name", "aws_dns_name"]},
    {"target": "type", "value": "LoadBalancer"},
    {"target": "vendor", "value": "Amazon"},
    {"target": "location", "source": "aws_region"},
    {"target": "fqdn", "source": "aws_dns_name"},
]


def test_golden_projection(spark):
    entity = {
        "AWSUniqueId": "elb-1",
        "aws_dns_name": "my-elb.example.com",
        "aws_region": "us-east-1",
        "aws_tag_Name": "frontend",
    }
    df = spark.createDataFrame([entity])
    out = apply_mapping(df, ELB_SPEC).first().asDict()
    assert out == {
        "cmdb_ci": "elb-1",
        "name": "frontend",
        "type": "LoadBalancer",
        "vendor": "Amazon",
        "location": "us-east-1",
        "fqdn": "my-elb.example.com",
    }


def test_missing_field_renders_empty_string(spark):
    # Handlebars: a field absent from the row renders as "" (SURVEY §7.5.1)
    df = spark.createDataFrame([{"AWSUniqueId": "elb-2"}])
    out = apply_mapping(df, ELB_SPEC).first().asDict()
    assert out["location"] == ""
    assert out["fqdn"] == ""
    assert out["name"] == ""  # both fallback candidates absent


def test_first_nonempty_treats_empty_string_as_falsy(spark):
    # {{#with entity.aws_tag_Name}} — "" is falsy (templates/awsEc2.hbs:8)
    df = spark.createDataFrame(
        [{"aws_tag_Name": "", "aws_instance_id": "i-123"}]
    )
    spec = [{"target": "name", "first_nonempty": ["aws_tag_Name", "aws_instance_id"]}]
    assert apply_mapping(df, spec).first()["name"] == "i-123"


def test_first_nonempty_null_falsy(spark):
    df = spark.createDataFrame(
        [(None, "i-9")], "aws_tag_Name string, aws_instance_id string"
    )
    spec = [{"target": "name", "first_nonempty": ["aws_tag_Name", "aws_instance_id"]}]
    assert apply_mapping(df, spec).first()["name"] == "i-9"


def test_template_interpolation(spark):
    # templates/awsLambda.hbs:6-style composite
    df = spark.createDataFrame([{"v": "7", "sha": "abc"}])
    spec = [{"target": "comments", "template": "Version: {v} Code SHA256: {sha}"}]
    assert apply_mapping(df, spec).first()["comments"] == "Version: 7 Code SHA256: abc"


def test_template_missing_ref_and_brace_escape(spark):
    df = spark.createDataFrame([{"a": "x"}])
    spec = [{"target": "t", "template": "{{literal}} {a}{missing}!"}]
    assert apply_mapping(df, spec).first()["t"] == "{literal} x!"


def test_concat_parts(spark):
    # templates/azureVm.hbs:8: offer + " " + sku + "/" + version
    df = spark.createDataFrame([{"offer": "Ubuntu", "sku": "20.04", "ver": "latest"}])
    spec = [{"target": "version", "concat": [
        {"source": "offer"}, {"value": " "}, {"source": "sku"},
        {"value": "/"}, {"source": "ver"}]}]
    assert apply_mapping(df, spec).first()["version"] == "Ubuntu 20.04/latest"


def test_to_json_rows(spark):
    df = spark.createDataFrame([{"b": "x", "a": 1}])
    row = to_json_rows(df, ["a", "b"]).first()["json"]
    assert json.loads(row) == {"a": 1, "b": "x"}


def test_load_projection_specs_compile(spark):
    """All 19 shipped per-type specs load and compile to select lists."""
    from entity_etl_spark.mapping import compile_mapping, load_projection_specs

    specs = load_projection_specs()
    assert len(specs) == 19
    assert {"awsEc2", "azureVm", "gce", "awsElb"} <= set(specs)
    for name, spec in specs.items():
        cols = compile_mapping(spec, schema_fields=set())
        assert len(cols) == len(spec), name


def test_awsEc2_spec_golden_render(spark):
    """Reference awsEc2 template semantics over the documented sample
    entity (README.md:209-228)."""
    from entity_etl_spark.mapping import apply_mapping, load_projection_specs

    entity = {
        "AWSUniqueId": "i-0abc_us-east-1_123",
        "aws_arn": "arn:aws:ec2:us-east-1:123:instance/i-0abc",
        "aws_architecture": "x86_64",
        "aws_state": "{Code: 80,Name: stopped}",
        "aws_instance_id": "i-0abc",
        "aws_instance_type": "t2.micro",
        "aws_image_id": "ami-123",
        "aws_hypervisor": "xen",
        "aws_launch_time": "Tue Feb 18 18:14:10 UTC 2020",
    }
    df = spark.createDataFrame([entity])
    out = apply_mapping(df, load_projection_specs()["awsEc2"]).first().asDict()
    assert out["cmdb_ci"] == entity["aws_arn"]
    assert out["asset"] == entity["AWSUniqueId"]
    assert out["name"] == "i-0abc"          # no aws_tag_Name -> fallback
    assert out["type"] == "VM"
    assert out["vendor"] == "AWS/EC2"
    assert out["hardware_status"] == entity["aws_state"]
    assert out["hardware_substatus"] == ""  # absent field renders empty
