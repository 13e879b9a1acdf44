"""Count-min sketch as pure DataFrame ops (sketch surface E6, SURVEY.md
§2.3 — additive; cf. Cormode & Muthukrishnan 2005).

The 100 TB shape: the sketch is a (depth × width) counter grid — a tiny
DataFrame of ``depth*width`` cells regardless of stream size. Building it
is ONE aggregation whose map-side partial aggregates ARE per-partition
sketches; the shuffle that combines them is literally the count-min merge
(cell-wise sum), so executors ship ≤ depth×width rows each, never keys.
Point queries join a (key, j, bkt) probe table against the broadcast
sketch and take the min over rows — the classic estimate, upper-bounded
by true_count + εN with ε = e/width per row.

Hashing is the repo's portable md5-hex-prefix (row salt ``j:``), so the
DuckDB oracle replays the sketch bit-for-bit: estimates are DETERMINISTIC,
not just bounded — tests pin exact cell values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cm_bucket(key: Column, j: int, width: int) -> Column:
    """Row-j bucket: md5("j:key") hex prefix, engine-portable."""
    h = F.md5(F.concat(F.lit(f"{j}:"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width).alias(
        "bkt"
    )


def build_countmin(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: returns the (j, bkt, c) cell table
    (≤ depth*width rows). ``weight_col`` aggregates weighted frequencies;
    default counts occurrences."""
    key = F.col(key_col)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("j"), _cm_bucket(key, j, width)
                )
                for j in range(depth)
            ]
        )
    ).alias("e")
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.select(rows, w.alias("__w"))
        .groupBy(F.col("e.j").alias("j"), F.col("e.bkt").alias("bkt"))
        .agg(F.sum("__w").cast("bigint").alias("c"))
    )


def estimate_countmin(
    keys: DataFrame,
    key_col: str,
    sketch: DataFrame,
    *,
    depth: int = 4,
    width: int = 512,
    est_col: str = "cm_est",
) -> DataFrame:
    """Point-query estimates for every DISTINCT row of ``keys`` (duplicate
    probe rows collapse — the group-by that re-joins the depth cells is
    keyed on all of ``keys``' columns): min over the depth cells. The
    sketch rides a broadcast; the probe explode adds ``depth`` slim rows
    per key. Keys never seen by the sketch get 0."""
    key = F.col(key_col)
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        _cm_bucket(key, j, width),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__e"),
    ).select("*", F.col("__e.j").alias("__j"), F.col("__e.bkt").alias("__bkt"))
    cells = sketch.select(
        F.col("j").alias("__sj"), F.col("bkt").alias("__sbkt"),
        F.col("c").alias("__cmc"),
    )
    joined = probes.join(
        F.broadcast(cells),
        (F.col("__j") == F.col("__sj")) & (F.col("__bkt") == F.col("__sbkt")),
        "left",
    )
    group_cols = [c for c in keys.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.min(F.coalesce("__cmc", F.lit(0))).cast("bigint").alias(est_col)
        )
    )


def merge_countmin(sketches: list[DataFrame]) -> DataFrame:
    """Cell-wise sum — count-min's merge is EXACT: the merged sketch is
    bit-identical to one built over the concatenated streams, which is
    what makes per-partition / per-batch / per-day sketches composable."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("j", "bkt").agg(F.sum("c").cast("bigint").alias("c"))


CM_STATE_SCHEMA = "j int, bkt bigint, c bigint"


def run_streaming_countmin(
    spark,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    *,
    batch_to_keys,
    key_col: str = "tok",
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
    timeout_sec: float = 300.0,
) -> None:
    """Maintain a count-min sketch incrementally over a stream: each
    micro-batch writes ITS OWN ≤ depth×width cell table to
    ``state_dir/batch=<id>`` (O(sketch) per batch — never rewriting
    accumulated state); reading the state merges cells by sum. The
    per-batch-dir ``overwrite`` makes at-least-once foreachBatch replay
    IDEMPOTENT: a batch re-run after a crash-before-checkpoint replaces
    its own cells instead of double-counting them, so the merged sketch
    stays bit-identical to the one-shot batch sketch — the registry
    query's oracle pins that equivalence. ``batch_to_keys`` maps a raw
    micro-batch to the key rows to sketch (e.g. tokenize).

    Runs on the shared slot kernel (:func:`..streaming.run_slot_stream`);
    this op contributes only the sum-monoid partial (a batch-local
    ≤ depth×width cell table)."""
    from ..streaming import run_slot_stream

    def slot(batch_df: DataFrame, batch_id: int) -> DataFrame:
        keys = batch_to_keys(batch_df)
        return build_countmin(
            keys, key_col, depth=depth, width=width, weight_col=weight_col
        )

    run_slot_stream(
        spark, stream, state_dir, checkpoint_dir, slot,
        timeout_sec=timeout_sec, coalesce=None,
    )


def read_countmin_state(spark, state_dir: str) -> DataFrame:
    """Merged view of the per-batch sketches in ``state_dir``. A stream
    that never wrote state (all batches empty) yields the empty — i.e.
    all-zero — sketch rather than a missing-path error."""
    from ..streaming import read_state_slots

    cells = read_state_slots(spark, state_dir, CM_STATE_SCHEMA)
    return cells.groupBy("j", "bkt").agg(
        F.sum("c").cast("bigint").alias("c")
    )
