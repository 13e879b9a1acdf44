"""Deterministic sampling & dataset splitting (training-data pipeline ops).

Training corpora need *reproducible* selections: the same input must
produce the same sample/split on every run, on any cluster layout, with no
RNG state. Everything here keys on a content/id hash, so selection is a
pure function of the row — re-runs, retries, and scale-out cannot change
it (Spark's ``df.sample`` is seed-dependent per partition layout and NOT
stable across repartitioning).

- :func:`hash_sample` — keep ~fraction of rows by md5-bucket of the id.
- :func:`stratified_take` — deterministic first-n per group (md5 order).
- :func:`train_val_test_split` — stable split assignment from the id hash;
  fractions configurable; the split column is reproducible forever.

md5 (not xxhash64) so the semantics are portable across engines — the
DuckDB oracles compute the identical assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^8 buckets from the first 8 hex chars of md5 — plenty of resolution
_BUCKETS = 16**8


def _hash_unit(id_col: Column) -> Column:
    """Uniform [0,1) value derived from md5 of the id's string form."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(_BUCKETS))


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic ~fraction sample: row kept iff hash_unit(id) < f."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_hash_unit(F.col(id_col)) < fraction)


def stratified_take(
    df: DataFrame, group_col: str, id_col: str, n_per_group: int
) -> DataFrame:
    """Deterministic n rows per group: md5 order within the group (a
    reproducible shuffle), row_number ≤ n."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Stable split column: 'test' for hash < test_f, 'val' for the next
    val_f band, 'train' otherwise. Membership is a pure function of the id
    — adding new rows later never reassigns existing ones."""
    u = _hash_unit(F.col(id_col))
    return df.withColumn(
        split_col,
        F.when(u < test_fraction, "test")
        .when(u < test_fraction + val_fraction, "val")
        .otherwise("train"),
    )


def grouped_split(
    df: DataFrame,
    group_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe split: the assignment hashes the GROUP key, so every
    row of a group (same source/domain, one near-dup cluster, one user's
    documents) lands in the SAME split — val/test can't be contaminated by
    a train-set sibling. Same growth-stability as train_val_test_split:
    new groups never reassign old ones; map-only, no shuffle."""
    return train_val_test_split(
        df,
        id_col=group_col,
        val_fraction=val_fraction,
        test_fraction=test_fraction,
        split_col=split_col,
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    n_per_group: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement, ``n`` per group
    (Efraimidis–Spirakis A-ES): each row gets key ln(u)/w with u the
    md5-derived uniform of its id — the n LARGEST keys per group are an
    exact weighted sample. No RNG state: reruns, retries, and repartitions
    select identical rows (same portability argument as hash_sample), and
    the DuckDB oracle replays the identical arithmetic.

    One window shuffle on the group key; rows with weight <= 0 are
    excluded (zero probability mass)."""
    u = _hash_unit(F.col(id_col))
    key = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(group_col).orderBy(F.desc(key), id_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def kfold_assignment(
    df: DataFrame, id_col: str, k: int = 5, fold_col: str = "fold"
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold = md5-bucket
    of the id mod k. Same portability contract as :func:`hash_sample`
    (md5, engine-reproducible, layout-stable: a row's fold never changes
    when the corpus grows), map-only — no shuffle, no RNG state."""
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return df.withColumn(fold_col, (bucket % k).cast("int"))


def temporal_split_embargo(
    df: DataFrame,
    ts_col: str,
    train_until,
    embargo,
    split_col: str = "split",
) -> DataFrame:
    """Time-ordered train/test split with an embargo gap (leakage control
    for time-series features: rows inside ``[train_until, train_until +
    embargo)`` are DROPPED so trailing-window features computed on test
    rows can never see train-adjacent data). ``train_until`` is a literal
    Column (e.g. a TIMESTAMP_NTZ literal), ``embargo`` an INTERVAL
    expression string. Pure filters — partition-prunable at scale."""
    lo = train_until
    hi = train_until + F.expr(embargo)
    c = F.col(ts_col)
    return df.filter((c < lo) | (c >= hi)).withColumn(
        split_col, F.when(c < lo, "train").otherwise("test")
    )
