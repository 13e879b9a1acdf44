"""tsutil: tz-free epoch extraction for TIMESTAMP_NTZ columns.

The driver's parquet testdata is naive micros (Spark 4 reads TIMESTAMP_NTZ),
which rejects cast-to-bigint / unix_micros. These tests pin that the
field-arithmetic helpers (a) agree with Python's own naive-UTC epoch math to
the microsecond, and (b) return identical values under different session
time zones — the property an NTZ->TIMESTAMP cast would violate.
"""

import datetime

from pyspark.sql import functions as F

from entity_etl_spark import tsutil

ROWS = [
    datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
    datetime.datetime(2024, 3, 10, 2, 30, 0, 1),  # inside a US DST gap
    datetime.datetime(2024, 11, 3, 1, 30, 59, 999999),  # US DST overlap
    datetime.datetime(1970, 1, 1, 0, 0, 0, 0),
    datetime.datetime(2038, 1, 19, 3, 14, 7, 500000),
]

_EPOCH = datetime.datetime(1970, 1, 1)


def _ntz_df(spark):
    df = spark.createDataFrame([(d,) for d in ROWS], "ts timestamp")
    # force NTZ regardless of createDataFrame's default timestamp type
    return spark.createDataFrame(
        [(d,) for d in ROWS], schema="ts timestamp_ntz"
    )


def _expected_micros(d):
    return (d - _EPOCH) // datetime.timedelta(microseconds=1)


def test_epoch_fields_match_naive_python(spark):
    df = _ntz_df(spark).select(
        tsutil.epoch_seconds("ts").alias("s"),
        tsutil.epoch_millis("ts").alias("ms"),
        tsutil.epoch_micros("ts").alias("us"),
    )
    got = df.collect()
    for row, d in zip(got, ROWS):
        us = _expected_micros(d)
        assert row["us"] == us
        assert row["ms"] == us // 1000
        assert row["s"] == us // 1_000_000


def test_tz_independent(spark):
    """Same NTZ input, three session time zones -> identical epochs.

    America/New_York has DST transitions at two of the fixture rows; an
    NTZ->TIMESTAMP cast would shift those, field arithmetic must not."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    results = []
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            results.append(
                _ntz_df(spark)
                .select(tsutil.epoch_micros("ts").alias("us"))
                .collect()
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert results[0] == results[1] == results[2]
    assert [r["us"] for r in results[0]] == [_expected_micros(d) for d in ROWS]


def test_micros_to_ntz_literal_roundtrip(spark):
    df = _ntz_df(spark)
    for d in (ROWS[0], ROWS[2]):
        us = _expected_micros(d)
        n = df.filter(F.col("ts") > tsutil.micros_to_ntz_literal(us)).count()
        assert n == sum(1 for r in ROWS if _expected_micros(r) > us)


def test_epoch_micros_any_dispatch(spark):
    ntz = _ntz_df(spark)
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"
    long_df = spark.createDataFrame([(1_705_708_800_123,)], "ts bigint")
    assert (
        long_df.select(tsutil.epoch_micros_any(long_df, "ts").alias("v"))
        .first()["v"]
        == 1_705_708_800_123
    )
    ltz = spark.createDataFrame([(ROWS[0],)], "ts timestamp")
    assert dict(ltz.dtypes)["ts"] == "timestamp"
    # session tz is UTC in tests: LTZ epoch == naive epoch for this fixture
    assert (
        ltz.select(tsutil.epoch_micros_any(ltz, "ts").alias("v")).first()["v"]
        == _expected_micros(ROWS[0])
    )
