"""Timezone-free epoch extraction for TIMESTAMP_NTZ event-time columns.

The driver's parquet testdata stores *naive* microsecond timestamps
(``isAdjustedToUTC=false``), which Spark 4 reads as TIMESTAMP_NTZ. NTZ
columns reject ``CAST(ts AS BIGINT)`` and ``unix_micros`` (both defined on
TIMESTAMP only), and converting NTZ->TIMESTAMP first injects the session
time zone — a silent correctness hazard when the harness session is not
UTC (and non-monotone across DST transitions). These helpers compute the
epoch directly from the physical local-micros value (NTZ minus an NTZ
epoch-origin literal), so the result is identical under every session
time zone and matches DuckDB's naive ``epoch(ts)`` / ``epoch_ms(ts)``
exactly.

All expressions are built-ins, 2-3 JVM expressions per extraction, inside
whole-stage codegen — no UDF, no Python boundary.

Assumes timestamps >= 1970-01-01 (truncation = floor only for
non-negative values); the driver testdata starts at 2024.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# NTZ - NTZ subtraction (SubtractTimestamps) operates directly on the
# physical local-micros values — no session-zone read anywhere in its
# evaluation (unlike ``timestampdiff``, whose analyzer rule casts NTZ
# operands through the session zone and silently shifts local times
# inside a DST spring-forward gap — rejected for exactly that reason,
# see the tz-independence + DST-gap tests). The resulting day-time
# interval casts to BIGINT in end-field units (whole seconds, truncated)
# and to DECIMAL(20,6) exactly (seconds with the microsecond fraction),
# so each epoch extraction is 2-3 JVM expressions instead of the previous
# 8-expression datediff+hour+minute+date_part chain (~2x lower marginal
# scan cost at sf0.1 — A/B in BASELINE.md). The origin literal is
# foldable, so comparisons against derived epochs still push down.


def _since_epoch(c: Column) -> Column:
    return c - F.expr("TIMESTAMP_NTZ'1970-01-01 00:00:00'")


def epoch_seconds(col: Column | str) -> Column:
    """Whole epoch seconds (floor), tz-free. == DuckDB ``CAST(epoch(ts) AS BIGINT)``."""
    return _since_epoch(_c(col)).cast("bigint")


def epoch_millis(col: Column | str) -> Column:
    """Epoch milliseconds (floor), tz-free. == DuckDB ``epoch_ms(ts)``.

    Decimal seconds * 1000 is exact; the truncating cast equals floor for
    the supported (>= 1970) domain."""
    return (
        (_since_epoch(_c(col)).cast("decimal(20,6)") * 1000).cast("bigint")
    )


def epoch_micros(col: Column | str) -> Column:
    """Epoch microseconds (exact — parquet stores micros), tz-free."""
    return (
        (_since_epoch(_c(col)).cast("decimal(20,6)") * 1_000_000).cast("bigint")
    )


def epoch_micros_any(df: DataFrame, field: str) -> Column:
    """Event-time ordering key in native units for *any* column type:

    - TIMESTAMP_NTZ  -> tz-free field arithmetic (this module)
    - TIMESTAMP      -> ``unix_micros`` (already an absolute instant)
    - numeric        -> the raw value (the reference's epoch-ms ``updatedOnMs``)
    """
    dtype = dict(df.dtypes)[field]
    c = F.col(field)
    if dtype == "timestamp_ntz":
        return epoch_micros(c)
    if dtype.startswith("timestamp"):
        return F.unix_micros(c)
    return c.cast("long")


def micros_to_ntz_literal(micros: int) -> Column:
    """A TIMESTAMP_NTZ literal from epoch micros, built via a *string* so no
    session-tz conversion ever happens. Foldable -> comparisons against it
    push down to the parquet scan."""
    import datetime as _dt

    naive = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=int(micros))
    return F.to_timestamp_ntz(F.lit(naive.strftime("%Y-%m-%d %H:%M:%S.%f")))
