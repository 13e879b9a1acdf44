"""Hot-group capping shared by every LSH-family candidate stage.

One degenerate group (a stop-shingle band bucket, a SimHash pigeonhole
block, a hyperplane bucket full of near-identical vectors) makes the
downstream self-join O(B²) — the failure family the heavy bench caught
twice in round 3. The cap drops over-full groups BEFORE the join, with
Observation-based accounting so dropped work is reported, never silent.
Previously each call site hand-rolled this ~15-line construct; a fix to
the window/observe placement now lands once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cap_hot_groups(
    df: DataFrame,
    key_cols: list[str],
    cap: int | None,
    *,
    observation=None,
    dropped_metric: str,
    max_metric: str,
    repartition: bool = True,
) -> DataFrame:
    """Drop rows of groups larger than ``cap`` (None = no-op passthrough).

    The per-group count is a window over the group-keyed exchange the
    downstream self-join needs anyway (``repartition=True`` forces that
    exchange here so it is reused, not repeated). With an ``observation``,
    the first action records ``dropped_metric`` (rows living in dropped
    groups) and ``max_metric`` (largest group seen) — metric names are
    caller-supplied because each call site's names are pinned API.
    An ``observation`` is honored even when ``cap`` is None: the caller
    asked for accounting, so they get a real max-group-size reading and a
    zero drop count — an Observation left unattached would block forever
    on ``.get`` instead of reporting nothing was dropped.

    ``cap=None`` resolves through the active execution profile
    (``entity_etl_spark.profile``): parity (default) keeps it None —
    bitwise the historical behavior — while the production profile
    supplies a concrete bound keyed by this call site's ``max_metric``
    name. An explicit caller cap always wins.
    """
    from pyspark.sql import Window

    from ..profile import resolve_cap

    cap = resolve_cap(cap, max_metric)
    if repartition:
        df = df.repartition(*[F.col(c) for c in key_cols])
    if cap is None and observation is None:
        return df
    gsz = F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
    df = df.withColumn("__gsz", gsz)
    if observation is not None:
        over = (
            F.lit(False) if cap is None else (F.col("__gsz") > cap)
        )
        df = df.observe(
            observation,
            # coalesced so an EMPTY frame reports 0/0, not NULLs a
            # caller's accounting arithmetic would trip over
            F.coalesce(F.sum(over.cast("long")), F.lit(0)).alias(
                dropped_metric
            ),
            F.coalesce(F.max("__gsz"), F.lit(0)).alias(max_metric),
        )
    if cap is None:
        return df.drop("__gsz")
    return df.filter(F.col("__gsz") <= cap).drop("__gsz")
