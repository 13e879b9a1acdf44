"""Data-quality expectations (the dbt-test / Deequ pattern): declarative
constraint checks that compile to ONE aggregate per table and return
violation COUNTS (zero = pass), so a 100 TB audit costs one scan per
table and ships a few integers to the driver.

Checks provided:

- ``not_null(cols)`` — count of rows with a NULL in any listed column;
- ``unique(cols)`` — count of surplus rows beyond the first per key
  (0 = key is unique);
- ``accepted_values(col, values)`` — rows outside the allowed set;
- ``in_range(col, lo, hi)`` — rows outside [lo, hi];
- referential integrity (child key ⊆ parent key) via
  :func:`fk_violations` — a left-anti join counted, the only check that
  needs a second table (broadcast when the parent is dimension-sized).

Each in-table check is an aggregate EXPRESSION, so arbitrarily many
fuse into a single map-side-combined pass (``run_checks``) — the Deequ
"analyzer batch" shape, not one job per rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(cols: list[str]) -> Column:
    from functools import reduce

    any_null = reduce(lambda a, b: a | b, [F.col(c).isNull() for c in cols])
    return F.count(F.when(any_null, 1))


def accepted_values(col: str, values: list) -> Column:
    return F.count(F.when(~F.col(col).isin(values), 1))


def in_range(col: str, lo, hi) -> Column:
    return F.count(F.when((F.col(col) < lo) | (F.col(col) > hi), 1))


def run_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """All aggregate checks in ONE pass; returns a single row of counts."""
    return df.agg(
        *[expr.cast("bigint").alias(name) for name, expr in checks.items()]
    )


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Surplus-row count beyond the first per key (0 = unique). A grouped
    count with map-side combine — the shuffle carries one row per
    distinct key per partition, not the table."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
            .cast("bigint")
            .alias("surplus_rows")
        )
    )


def fk_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Orphaned-child count (referential integrity): left-anti join against
    the parent key set, counted. Broadcast the parent when it is
    dimension-sized; at fact-to-fact scale the anti join shuffles both
    sides on the key — still one exchange each."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).cast("bigint").alias("orphan_rows"))
