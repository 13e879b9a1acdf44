"""Custom relational operators Spark lacks as built-ins, composed from
DataFrame primitives (SURVEY §2.2 ABSENT rows + north-star extensions).

- :func:`asof_join` — latest right row at-or-before each left row per key.
  Spark has no ASOF JOIN; the standard tricks are (a) union + last-value
  window (used here: ONE shuffle, no join at all) or (b) per-group
  merge_asof via applyInPandas (Python in the hot path — avoided).
- :func:`range_join_bucketed` — interval containment join without the
  BroadcastNestedLoopJoin trap: intervals are exploded to fixed-width
  buckets, the join is a plain equi-join on (key, bucket), then an exact
  range filter refines. Equi-join = shuffle/broadcast hash join, scalable.
- :func:`salted_aggregate` — two-phase aggregation for skewed group keys:
  partial agg on (key, salt) spreads a hot key over N reducers, final agg
  merges. AQE handles skewed *joins*; skewed *aggregations* still need this.
- :func:`time_rollup` — multi-granularity time-bucketed aggregates in one
  pass via grouping sets over pre-computed buckets (the "hypertable
  continuous aggregate" shape).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of the matching right row within the same
    key (NULLs when none) — ``direction="backward"``: the LATEST right row
    with ``right_ts <= left_ts``; ``"forward"``: the EARLIEST right row
    with ``right_ts >= left_ts`` (both inclusive, like pd.merge_asof
    directions / DuckDB ASOF JOIN's >= and <= forms).

    Union-and-window instead of a join: tag sides, sort by (ts, side) within
    key — descending for the forward direction — and carry the right payload
    with last(ignorenulls). Right rows at exactly left_ts sort before left
    rows, so ties match. One shuffle (the window partition), no join, no
    nested loop — at 100 TB this is the difference between a partition sort
    and a quadratic explosion."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction}")
    from .tsutil import epoch_micros_any

    lcols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        # long epoch micros: tz-free for NTZ inputs and type-uniform across
        # sides whatever flavor each ts column is (see tsutil)
        epoch_micros_any(left, left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_payload],
    )
    r = right.select(
        F.col(key).alias("__k"),
        epoch_micros_any(right, right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    order = (
        [F.col("__ts").asc(), F.col("__is_left").asc()]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__is_left").asc()]
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        "__is_left",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in right_payload
        ],
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__rv_{c}").alias(c) for c in right_payload],
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join each point to every interval of the same key containing it
    (``start <= point < end``) via bucketization.

    Intervals explode to ceil(len/width) bucket rows; points map to one
    bucket; the equi-join on (key, bucket) replaces the theta join. Output
    column set = points ∪ intervals (minus duplicated key)."""
    from .tsutil import epoch_micros_any

    # Bucketize in exact integer MICROS, not truncated seconds: with
    # sub-second timestamps, flooring to seconds before bucketing can drop
    # the interval's last bucket (end 7200.5s truncates to 7200, end-1 lands
    # in bucket 1, yet a point at 7200.3s lives in bucket 2 — a missed
    # match). micros are the parquet native unit, so [start, end) covers
    # buckets floor(start/W)..floor((end-1)/W) exactly. Also NTZ-safe.
    width = F.lit(int(bucket_seconds) * 1_000_000)
    p = points.withColumn(
        "__bucket", F.floor(epoch_micros_any(points, point_ts) / width)
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(epoch_micros_any(intervals, start_ts) / width),
                F.floor((epoch_micros_any(intervals, end_ts) - 1) / width),
            )
        ),
    )
    icols = [c for c in intervals.columns if c != key]
    joined = p.join(i.withColumnRenamed(key, "__ik"),
                    (F.col(key) == F.col("__ik"))
                    & (p["__bucket"] == i["__bucket"]))
    return (
        joined.filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) < F.col(end_ts))
        )
        .select(*points.columns, *icols)
        .drop("__bucket")
    )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    agg_exprs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: partial agg over (keys, salt), final merge
    over keys. ``agg_exprs`` maps output name -> (function, column) for the
    decomposable aggregates sum/count/min/max.

    A key receiving 1% of 100 TB funnels 1 TB through one reducer in a naive
    groupBy; salting spreads it over ``salt_buckets`` reducers and the final
    merge handles ``salt_buckets`` rows per key."""
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (fn, _col) in agg_exprs.items():
        if fn not in merge_fn:
            raise ValueError(f"{fn} is not decomposable; supported: sum/count/min/max")
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            partial_fn[fn](F.col(col)).alias(f"__p_{name}")
            for name, (fn, col) in agg_exprs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            merge_fn[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _col) in agg_exprs.items()
        ]
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    granularities: Sequence[str],
    group_cols: Sequence[str],
    agg_exprs: Sequence[Column],
) -> DataFrame:
    """Multi-granularity time aggregate in ONE scan: each row melts into
    (gran, bucket_start) pairs map-side (explode over a literal-sized
    array), then a single groupBy produces every rollup level. One scan, one
    shuffle — the hypertable/continuous-aggregate pattern without N passes.

    Output: (gran, bucket_start, *group_cols, *aggs)."""
    melted = df.withColumn(
        "__g",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).alias("gran"),
                        F.date_trunc(g, F.col(ts_col)).alias("bucket_start"),
                    )
                    for g in granularities
                ]
            )
        ),
    )
    return melted.groupBy(
        F.col("__g.gran").alias("gran"),
        F.col("__g.bucket_start").alias("bucket_start"),
        *group_cols,
    ).agg(*agg_exprs)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    *,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_on: str | None = None,
) -> DataFrame:
    """Skew-safe equi-join: the fact side gets a deterministic salt, the
    other side is replicated ``salt_buckets`` times, and the join runs on
    (keys..., salt) so one hot key spreads over ``salt_buckets`` reducers.

    This is the manual fallback for when AQE's skew-join split cannot help —
    e.g. the hot key lands in ONE map output partition (sorted input), or
    the join is sort-merge on a pre-AQE engine. ``salt_on`` names a
    high-cardinality fact column to derive the salt from (deterministic,
    re-runnable — no rand()); defaults to the first key, which is safe but
    spreads hot keys only when combined with a unique column, so pass the
    fact table's id column when one exists.

    Replication multiplies the dim side by ``salt_buckets`` — keep it for
    dim tables far below the broadcast threshold only when skew (not size)
    is the problem; at 100 TB the pattern is: broadcast if small, AQE skew
    split if it fires, salted join as the explicit big-dim escape hatch.

    Supported ``how``: inner / left (semantics preserved because every fact
    row carries exactly one salt and every (key, salt) pair exists on the
    replicated side).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics for inner/left only")
    salt_src = F.col(salt_on) if salt_on else F.col(keys[0])
    salted = facts.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)).cast("int")
    )
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted.join(replicated, [*keys, "__salt"], how)
    return out.drop("__salt")


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group quantile clipping (winsorization) — the outlier guard for
    metric columns before training-statistics aggregation.

    Exact percentiles per group (one partial-aggregating shuffle over the
    group keys — Spark's percentile is a typed ImperativeAggregate with a
    map-side partial), broadcast back onto the rows by an equi-join on the
    group keys, then clamp in codegen. Two scans of nothing: the stats side
    is |groups| rows, the clamp is map-only.

    At 100 TB swap percentile -> percentile_approx (mergeable sketch, same
    shape) when exactness can yield; the driver row keeps the exact form so
    the oracle can pin it.
    """
    out_col = out_col or f"{value_col}_w"
    stats = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {lower})").alias("__lo"),
        F.expr(f"percentile({value_col}, {upper})").alias("__hi"),
    )
    return (
        df.join(F.broadcast(stats), list(group_cols))
        .withColumn(
            out_col,
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    out_col: str = "running_total",
    n_buckets: int = 64,
) -> DataFrame:
    """Global running total ordered by ``order_col`` WITHOUT the
    single-reducer funnel of ``Window.orderBy`` (which drains every row
    through one task) — the distributed prefix-sum:

    1. bucket rows by range over ``order_col`` (map-side arithmetic against
       the broadcast min/max — one tiny agg);
    2. cumsum WITHIN each bucket (hash exchange on bucket: balanced, not a
       funnel; each reducer sorts only its slice);
    3. per-bucket totals (n_buckets rows) get their own prefix-sum on a
       driver-sized window, broadcast back, and added map-side.

    Equal to the naive global window row for row (the driver oracle pins
    it); the difference is purely physical: the widest exchange carries
    rows spread over ``n_buckets`` reducers instead of 1. Ties in
    ``order_col`` across buckets would make the split ambiguous — require
    a unique order column (ids; make one with monotonically_increasing_id).
    """
    bounds = df.agg(
        F.min(order_col).alias("__lo"), F.max(order_col).alias("__hi")
    )
    bucketed = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "__bkt",
            F.least(
                F.lit(n_buckets - 1),
                F.floor(
                    (F.col(order_col) - F.col("__lo"))
                    / ((F.col("__hi") - F.col("__lo") + 1) / n_buckets)
                ).cast("int"),
            ),
        )
        .drop("__lo", "__hi")
    )
    w_in = Window.partitionBy("__bkt").orderBy(order_col)
    local = bucketed.withColumn(
        "__local", F.sum(value_col).over(w_in)
    )
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        bucketed.groupBy("__bkt")
        .agg(F.sum(value_col).alias("__tot"))
        .withColumn("__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0.0)))
        .select("__bkt", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__bkt", "__local", "__off")
    )


def interpolate_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    v_col: str,
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Fill null gaps in a per-key time grid by linear interpolation between
    the nearest non-null neighbors (edge gaps clamp to the nearest value) —
    the standard repair step after a date-spine left join.

    Physical shape: two frames (running-last and running-first with
    ignorenulls) over ONE (key, t) sort — Catalyst plans a single Exchange;
    the ascending-order sort is shared, and everything else is codegen
    arithmetic. ``t_col`` must be numeric (epoch seconds / day number) so
    the interpolation fraction is well-defined.
    """
    out_col = out_col or f"{v_col}_filled"
    keys = [F.col(k) for k in key_cols]
    v, t = F.col(v_col), F.col(t_col)
    wb = (
        Window.partitionBy(*keys)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(t_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(wb)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wb)
    next_v = F.first(v, ignorenulls=True).over(wf)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wf)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(
            prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
        )
    )
    return df.withColumn(out_col, filled)


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    z: float = 3.0,
    out_col: str = "is_outlier",
) -> DataFrame:
    """Flag rows whose |value − group median| / MAD exceeds ``z`` — the
    outlier gate that survives heavy tails (mean/stddev z-scores blow up on
    the very outliers they're meant to catch; median/MAD don't).

    Two exact-percentile aggregations (median, then median absolute
    deviation — MAD needs the median first, so two passes are inherent),
    each a map-side-partial shuffle on the group keys; both stat tables are
    |groups| rows and broadcast back. Zero-MAD groups (constant values)
    flag nothing. percentile_approx is the one-line 100 TB swap-in.
    """
    gkeys = list(group_cols)
    med = df.groupBy(*gkeys).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    with_med = df.join(F.broadcast(med), gkeys)
    mad = (
        with_med.groupBy(*gkeys)
        .agg(
            F.expr(f"percentile(abs({value_col} - __med), 0.5)").alias("__mad")
        )
    )
    return (
        with_med.join(F.broadcast(mad), gkeys)
        .withColumn(
            out_col,
            (F.col("__mad") > 0)
            & (
                F.abs(F.col(value_col) - F.col("__med")) / F.col("__mad")
                > F.lit(z)
            ),
        )
        .drop("__med", "__mad")
    )


def distributed_shuffle_rank(
    df: DataFrame,
    key_col: str,
    *,
    seed: str = "42",
    out_col: str = "shuffle_rank",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic global training-shuffle order WITHOUT the
    single-reducer funnel of ``row_number() OVER (ORDER BY ...)``.

    Training-data pipelines need one global, reproducible permutation of
    the corpus (epoch shuffling, shard assignment). The order key is
    ``md5(seed || ':' || key)`` — portable across engines and stable
    across runs. A naive global window drains 100 TB through one task;
    here the hash's KNOWN uniform domain removes even the stats pass
    :func:`distributed_cumsum` needs:

    1. bucket = the hash's leading 60 bits divided into ``n_buckets``
       fixed ranges (map-side arithmetic, no min/max aggregation);
    2. row_number WITHIN each bucket ordered by (full hash hex, key) —
       a balanced hash exchange, each reducer sorts only its slice;
    3. per-bucket counts (``n_buckets`` rows) prefix-sum on a
       driver-sized window, broadcast back, added map-side. The keyed
       input is localCheckpoint-materialized once: the ranked-rows and
       bucket-count branches cannot share an exchange (column pruning
       differentiates their subtrees), so without it the full upstream
       lineage would execute twice.

    Fixed-width lowercase hex compares lexicographically exactly as its
    numeric value, so bucket-range order (numeric prefix) agrees with the
    within-bucket string order — ranks are globally consistent and equal
    row-for-row to the naive ``ORDER BY md5, key`` window (the driver
    oracle pins it).
    """
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string")))
    hnum = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    domain = 16 ** 15
    keyed = df.withColumn("__h", h).withColumn(
        "__bkt", (hnum / F.lit(domain / n_buckets)).cast("int")
    )
    # ranked rows and per-bucket counts are TWO consumers of `keyed`, and
    # column pruning gives each branch its own exchange subtree (no
    # ReusedExchange) — so materialize `keyed` once; without this the
    # full input lineage (e.g. a whole prep pipeline) executes twice.
    # Same pattern and rationale as the MinHash signature checkpoint.
    keyed = keyed.localCheckpoint(eager=False)
    w_in = Window.partitionBy("__bkt").orderBy("__h", key_col)
    local = keyed.withColumn("__local", F.row_number().over(w_in))
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        keyed.groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
        )
        .select("__bkt", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            out_col, (F.col("__local") + F.col("__off")).cast("bigint")
        )
        .drop("__bkt", "__h", "__local", "__off")
    )
