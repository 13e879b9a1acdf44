"""Pure-Python Avro OCF (entity_etl_spark/avro_format.py, round 9).

Codec internals against the Avro 1.11 spec (zigzag varints, union
branching, block framing, sync markers, deflate) plus the Spark
DataSource surface: write -> read equality row-for-row, schema
inference from the embedded writer schema, temp/commit atomicity.
"""

import datetime
import io
import os

import pytest

from entity_etl_spark import avro_format as av


def test_zigzag_spec_vectors():
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
    assert av.zigzag_encode(0) == b"\x00"
    assert av.zigzag_encode(-1) == b"\x01"
    assert av.zigzag_encode(1) == b"\x02"
    assert av.zigzag_encode(-2) == b"\x03"
    assert av.zigzag_encode(64) == b"\x80\x01"
    for n in (0, 1, -1, 63, -64, 300, -300, 2**62, -(2**62)):
        assert av.zigzag_decode(io.BytesIO(av.zigzag_encode(n))) == n


_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "long"}},
        {"name": "ts", "type": ["null", {
            "type": "long", "logicalType": "local-timestamp-micros"}]},
    ],
}
_ROWS = [
    (1, "alice", 1.5, True, [1, 2, 3],
     datetime.datetime(2024, 3, 1, 12, 30, 0, 123456)),
    (2, None, -2.25, False, [], None),
    (3, "bob", 0.0, True, [7],
     datetime.datetime(1969, 12, 31, 23, 59, 59)),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    assert av.write_container(
        p, _SCHEMA, iter(_ROWS), codec=codec, block_rows=2
    ) == 3
    assert list(av.read_container(p)) == _ROWS
    schema, got_codec, sync, _ = av.read_header(p)
    assert got_codec == codec and len(sync) == 16
    assert [f["name"] for f in schema["fields"]] == [
        "id", "name", "score", "ok", "tags", "ts",
    ]


def test_corrupt_sync_marker_detected(tmp_path):
    p = str(tmp_path / "t.avro")
    av.write_container(p, _SCHEMA, iter(_ROWS))
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF  # last byte is part of the trailing sync marker
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="sync"):
        list(av.read_container(p))


def test_not_avro_rejected(tmp_path):
    p = str(tmp_path / "x.avro")
    open(p, "wb").write(b"PAR1not-avro")
    with pytest.raises(ValueError, match="container"):
        av.read_header(p)


def test_spark_schema_mapping_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5, True, [1, 2])],
        "id long, name string, score double, ok boolean, tags array<bigint>",
    )
    avro = av.spark_schema_to_avro(df.schema)
    back = av.avro_schema_to_spark(avro)
    assert [f.name for f in back.fields] == [f.name for f in df.schema.fields]
    assert [type(f.dataType) for f in back.fields] == [
        type(f.dataType) for f in df.schema.fields
    ]


def test_spark_write_read_roundtrip(spark, tmp_path):
    av.register_avro(spark)
    out = str(tmp_path / "avro_out")
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    src.write.format("avro_py").option("path", out).option(
        "codec", "deflate"
    ).mode("append").save()
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert files and not [f for f in os.listdir(out) if f.endswith(".tmp")]
    back = spark.read.format("avro_py").option("path", out).load()
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b  # exact row-for-row equality incl. NTZ timestamps


def test_spark_overwrite_replaces_dataset(spark, tmp_path):
    av.register_avro(spark)
    out = str(tmp_path / "avro_ow")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    df2 = spark.createDataFrame([(9, "z")], "id long, s string")
    df1.write.format("avro_py").option("path", out).mode("append").save()
    df2.write.format("avro_py").option("path", out).mode("overwrite").save()
    back = spark.read.format("avro_py").option("path", out).load()
    assert [tuple(r) for r in back.collect()] == [(9, "z")]


# ---- round 10: schema resolution + decimal/date logical types

V1 = {
    "type": "record", "name": "row",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "price", "type": {
            "type": "bytes", "logicalType": "decimal",
            "precision": 12, "scale": 2}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "legacy", "type": "string"},
    ],
}
V2 = {
    "type": "record", "name": "row",
    "fields": [
        {"name": "id", "type": "long"},          # int -> long promotion
        {"name": "price", "type": {
            "type": "bytes", "logicalType": "decimal",
            "precision": 12, "scale": 2}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "category", "type": "string", "default": "unknown"},
        # legacy: dropped
    ],
}


def _v1_file(tmp_path):
    from decimal import Decimal

    rows = [
        (1, Decimal("19.99"), datetime.date(2024, 3, 1), "a"),
        (2, Decimal("-0.05"), datetime.date(1969, 12, 31), "b"),
        (3, Decimal("1234567890.12"), datetime.date(1970, 1, 1), "c"),
    ]
    p = os.path.join(str(tmp_path), "v1.avro")
    av.write_container(p, V1, iter(rows))
    return p, rows


def test_decimal_date_logicals_roundtrip(tmp_path):
    p, rows = _v1_file(tmp_path)
    assert list(av.read_container(p)) == rows


def test_decimal_twos_complement_encoding():
    from decimal import Decimal

    # -0.05 at scale 2 -> unscaled -5 -> single byte 0xFB
    assert av._decimal_encode(Decimal("-0.05"), 2) == b"\xfb"
    assert av._decimal_decode(b"\xfb", 2) == Decimal("-0.05")
    # 1.28 -> 128 needs a leading zero byte in two's complement
    enc = av._decimal_encode(Decimal("1.28"), 2)
    assert enc == b"\x00\x80"
    assert av._decimal_decode(enc, 2) == Decimal("1.28")


def test_schema_resolution_promote_drop_default(tmp_path):
    from decimal import Decimal

    p, rows = _v1_file(tmp_path)
    back = list(av.read_container(p, reader_schema=V2))
    assert back == [
        (i, pr, d, "unknown") for (i, pr, d, _legacy) in rows
    ]
    assert all(isinstance(r[0], int) for r in back)


def test_schema_resolution_missing_default_raises(tmp_path):
    p, _ = _v1_file(tmp_path)
    bad = {
        "type": "record", "name": "row",
        "fields": [{"name": "added", "type": "string"}],
    }
    with pytest.raises(ValueError, match="no default"):
        list(av.read_container(p, reader_schema=bad))


def test_schema_resolution_incompatible_promotion_raises(tmp_path):
    p, _ = _v1_file(tmp_path)
    bad = {
        "type": "record", "name": "row",
        "fields": [{"name": "id", "type": "string"}],
    }
    with pytest.raises(ValueError, match="cannot resolve"):
        list(av.read_container(p, reader_schema=bad))


def test_resolution_through_null_unions(tmp_path):
    # writer nullable int resolves to reader nullable long branch-wise
    w = {
        "type": "record", "name": "row",
        "fields": [{"name": "x", "type": ["null", "int"]}],
    }
    r = {
        "type": "record", "name": "row",
        "fields": [{"name": "x", "type": ["null", "long"]}],
    }
    p = os.path.join(str(tmp_path), "u.avro")
    av.write_container(p, w, iter([(None,), (7,)]))
    assert list(av.read_container(p, reader_schema=r)) == [(None,), (7,)]


def test_spark_reader_schema_option(spark, tmp_path):
    import json

    from pyspark.sql import functions as F

    out = os.path.join(str(tmp_path), "evo")
    av.register_avro(spark)
    df = spark.createDataFrame(
        [(1, "x"), (2, "y")], schema=["id", "legacy"]
    ).select(F.col("id").cast("int"), "legacy")
    df.coalesce(1).write.format("avro_py").mode("append").option(
        "path", out
    ).save()
    r2 = {
        "type": "record", "name": "row",
        "fields": [
            {"name": "id", "type": ["null", "long"]},
            {"name": "category", "type": "string", "default": "unknown"},
        ],
    }
    back = (
        spark.read.format("avro_py")
        .option("path", out)
        .option("reader_schema", json.dumps(r2))
        .load()
    )
    assert back.schema.simpleString() == "struct<id:bigint,category:string>"
    got = {(r.id, r.category) for r in back.collect()}
    assert got == {(1, "unknown"), (2, "unknown")}


def test_union_resolution_deferred_to_datum(tmp_path):
    # ["null","int"] writer under a plain "long" reader must read fine
    # when no null datum appears (Avro 1.11: branch mismatch is an
    # error only when encountered), and raise only on an actual null
    w = {
        "type": "record", "name": "row",
        "fields": [{"name": "x", "type": ["null", "int"]}],
    }
    r = {
        "type": "record", "name": "row",
        "fields": [{"name": "x", "type": "long"}],
    }
    p1 = os.path.join(str(tmp_path), "nonull.avro")
    av.write_container(p1, w, iter([(1,), (2,)]))
    assert list(av.read_container(p1, reader_schema=r)) == [(1,), (2,)]
    p2 = os.path.join(str(tmp_path), "withnull.avro")
    av.write_container(p2, w, iter([(1,), (None,)]))
    with pytest.raises(ValueError, match="cannot resolve"):
        list(av.read_container(p2, reader_schema=r))


def test_decimal_minimal_twos_complement_boundaries():
    from decimal import Decimal

    # Java BigInteger.toByteArray boundary semantics
    assert av._decimal_encode(Decimal("-1.28"), 2) == b"\x80"
    assert av._decimal_encode(Decimal("1.28"), 2) == b"\x00\x80"
    assert av._decimal_encode(Decimal("1.27"), 2) == b"\x7f"
    assert av._decimal_encode(Decimal("-1.29"), 2) == b"\xff\x7f"
    assert av._decimal_encode(Decimal("0.00"), 2) == b"\x00"
    for v in ("-1.28", "1.28", "-327.68", "327.68", "-0.01"):
        assert av._decimal_decode(
            av._decimal_encode(Decimal(v), 2), 2
        ) == Decimal(v)
