"""SparkSession factory with defaults tuned for this engine.

Local testing runs on ``local[N]``; the settings below are the ones that
matter identically on a real cluster:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- UTC session timezone (oracle comparison against DuckDB, whose timestamps
  are UTC-naive)
- Arrow execution for the few Pandas-UDF code paths
- shuffle partitions sized to the local core count (on a cluster this is
  overridden per-deployment; AQE coalesces downward at runtime anyway)
- SF-scaled AQE start width (``aqe_initial_partitions``): callers that
  know their input size pass ``input_bytes`` and big jobs start their
  shuffles wide enough that no final aggregation outgrows one task's
  hash map, while small jobs keep the plain core count — the r8 bench
  lesson promoted into the engine (see the policy's comment block)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# --- SF-scaled AQE start width (r9: promoted from bench.py, VERDICT r8
# item 3). The r8 measurement, both directions:
#   - at the sf10 input (~1.8 GB parquet) the biggest final aggregation
#     (~800M unique pair keys) at 32 shuffle partitions puts ~25M keys in
#     one task's hash map — past the execution-memory share — and the agg
#     degrades to sort-spill (capped cosine 80.7 -> 42.8 s and
#     training_data_prep 376 -> 314 s once started at 512 partitions);
#   - at the sf1 input (~170 MB) the SAME wide start measured ~3x HARMFUL
#     (item-item legs 5.1 -> 15.9 s / 6.4 -> 23.0 s at 128 initial): when
#     every agg already fits at `cores` partitions the extra tasks are
#     pure scheduling + tiny-partition overhead.
# So the policy is a threshold, not a ramp from zero: below
# _AQE_WIDE_START_THRESHOLD_BYTES of scanned input, start at `cores`
# (AQE has nothing to fix); above it, one initial partition per ~4 MiB of
# compressed parquet (~10-15x expansion puts the in-flight shuffle slice
# near AQE's 64 MB advisory target), rounded up to a power of two so
# AQE's coalescing folds partitions evenly, clamped to [cores, 2048].
# At the measured anchors this reproduces the r8 bench numbers exactly:
# 1.81 GB -> 512, 172 MB -> cores, 17.5 MB -> cores.
_AQE_WIDE_START_THRESHOLD_BYTES = 1 << 30
_AQE_BYTES_PER_INITIAL_PARTITION = 4 << 20
_AQE_INITIAL_PARTITION_CAP = 2048


def aqe_initial_partitions(input_bytes: int | None, cores: int) -> int:
    """AQE ``initialPartitionNum`` for a job scanning ``input_bytes`` of
    compressed input: ``cores`` below the wide-start threshold, else
    bytes/4MiB rounded up to a power of two, clamped [cores, 2048]."""
    if not input_bytes or input_bytes < _AQE_WIDE_START_THRESHOLD_BYTES:
        return cores
    raw = input_bytes // _AQE_BYTES_PER_INITIAL_PARTITION
    if raw <= cores:
        return cores
    p = 1
    while p < raw:
        p <<= 1
    return max(cores, min(p, _AQE_INITIAL_PARTITION_CAP))


def estimate_input_bytes(path: str) -> int:
    """Total on-disk bytes under ``path`` (a testdata SF dir or any input
    root) — the cheap driver-side estimate the AQE policy is keyed on.
    On a real deployment this is the catalog's table-size statistic; for
    file trees it is one os.walk."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def get_spark(
    app_name: str = "entity-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    input_bytes: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(
                aqe_initial_partitions(
                    input_bytes, shuffle_partitions
                )
            ),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (rest_datasource.py absorbs the
        # updatedOnMs time predicate source-side, O3 parity)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
