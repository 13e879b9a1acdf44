"""Timezone-free epoch extraction for TIMESTAMP_NTZ event-time columns.

The driver's parquet testdata stores *naive* microsecond timestamps
(``isAdjustedToUTC=false``), which Spark 4 reads as TIMESTAMP_NTZ. NTZ
columns reject ``CAST(ts AS BIGINT)`` and ``unix_micros`` (both defined on
TIMESTAMP only), and converting NTZ->TIMESTAMP first injects the session
time zone — a silent correctness hazard when the harness session is not
UTC (and non-monotone across DST transitions). These helpers compute the
epoch purely from the datetime *fields* (datediff + hour/minute/second),
so the result is identical under every session time zone and matches
DuckDB's naive ``epoch(ts)`` / ``epoch_ms(ts)`` exactly.

All expressions are built-ins (datediff / hour / minute / date_part), so
they stay inside whole-stage codegen — no UDF, no Python boundary.

Assumes timestamps >= 1970-01-01 (truncation = floor only for
non-negative values); the driver testdata starts at 2024.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _days(c: Column) -> Column:
    """Whole days since the epoch (tz-free: NTZ -> DATE drops time fields)."""
    return F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")


def _minute_floor_seconds(c: Column) -> Column:
    """Epoch seconds truncated to the minute (all whole-field arithmetic)."""
    return (
        _days(c) * 86400
        + F.hour(c).cast("long") * 3600
        + F.minute(c).cast("long") * 60
    )


def epoch_seconds(col: Column | str) -> Column:
    """Whole epoch seconds (floor), tz-free. == DuckDB ``CAST(epoch(ts) AS BIGINT)``."""
    c = _c(col)
    return _minute_floor_seconds(c) + F.second(c).cast("long")


def _frac_seconds(c: Column) -> Column:
    # date_part('SECOND') returns DECIMAL(8,6) *including* the microsecond
    # fraction — the only built-in sub-second extractor that works on NTZ.
    return F.date_part(F.lit("SECOND"), c)


def epoch_millis(col: Column | str) -> Column:
    """Epoch milliseconds (floor), tz-free. == DuckDB ``epoch_ms(ts)``.

    Decimal*1000 then a truncating cast keeps the arithmetic exact — a
    double division (``micros/1000``) could round across the floor."""
    c = _c(col)
    return _minute_floor_seconds(c) * 1000 + (_frac_seconds(c) * 1000).cast("long")


def epoch_micros(col: Column | str) -> Column:
    """Epoch microseconds (exact — parquet stores micros), tz-free."""
    c = _c(col)
    return _minute_floor_seconds(c) * 1_000_000 + (
        _frac_seconds(c) * 1_000_000
    ).cast("long")


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
