"""Query registry: every SURVEY.md §2 operator as a (Spark DataFrame fn,
DuckDB oracle SQL) pair over the driver's test tables.

Conventions (driver contract, __spark_entry__.py):

- each Spark fn takes ``(spark, sf_dir)`` and returns a DataFrame;
- every computed column is aliased identically in Spark and SQL;
- timestamps are rendered to strings (µs precision) in BOTH engines —
  engine-native timestamp encodings differ, strings hash identically;
- double aggregates are ``round(x, N)``-ed in BOTH engines (Spark and DuckDB
  sum doubles in different orders; rounding absorbs the last-ulp wobble);
- DuckDB ``sum(BIGINT)`` returns INT128 — always cast back to BIGINT.

Reference citations (file:line into /root/reference) are on each entry; the
extension operators (E1-E6) cite SURVEY.md §2.3 instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import tsutil
from ..delta import changed_rows
from ..sources import read_sf_table

# event-time cutoff splitting `events` into "state so far" vs "incoming page"
CUTOFF = "2024-01-20 00:00:00"

SPARK_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


@dataclass
class Q:
    """One registered query: Spark impl + optional DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Q] = {}


def register(name: str, sql: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = Q(fn=fn, sql=sql, doc=doc, tags=tags)
        return fn

    return deco


def _ts_str(col):
    return F.date_format(col, SPARK_TS_FMT)


