"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB, scan cost is dominated by how well the storage layout matches
the query predicates. Z-ordering interleaves the bits of several columns
into one sort key so that range predicates on ANY of them map to a small
number of contiguous key ranges — the standard multi-dimensional
clustering trick (Delta OPTIMIZE ZORDER, Iceberg sort orders) expressed as
a plain column expression here:

    df.repartitionByRange(N, z).sortWithinPartitions(z).write...

gives min/max parquet row-group statistics that prune on every
participating dimension. The key itself is pure bit arithmetic — codegen'd
JVM-side, no UDF, and identical in any engine (the driver oracle recomputes
it in SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns: result bit 2i = a's bit i, bit 2i+1 = b's bit i."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca, cb = ca.cast("long"), cb.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def cluster_by_zorder(
    df: DataFrame,
    a: str,
    b: str,
    n_partitions: int,
    bits: int = 16,
    key_name: str = "__z",
) -> DataFrame:
    """Range-partition + sort by the Morton key: each output partition
    covers one contiguous Z-range, so parquet row-group min/max stats prune
    range predicates on BOTH dimensions."""
    keyed = df.withColumn(key_name, zorder_key(a, b, bits))
    return keyed.repartitionByRange(n_partitions, key_name).sortWithinPartitions(
        key_name
    )


# ---------------------------------------------------------------------------
# Small-file compaction (round 10). The other half of layout hygiene:
# streaming/incremental jobs leave thousands of KB-scale files per
# table, and at 100 TB the per-file open/footer cost dominates scans.
# The Spark-first move is to NOT reimplement bin packing: the file-source
# scan planner already packs small files into size-bounded
# FilePartitions (first-fit over maxPartitionBytes with openCostInBytes
# as the per-file surcharge). Reading with those knobs pinned to the
# compaction target and writing straight back is therefore a
# ZERO-SHUFFLE compaction — each task concatenates one bin of small
# files into one output file, no repartition(), no exchange, and AQE
# has nothing to re-plan. Contrast with .repartition(n) compaction,
# which shuffles every byte once.


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
    open_cost_bytes: int = 4 << 20,
) -> DataFrame:
    """Compact a directory of small parquet files into ~``target_bytes``
    files at ``dst`` without a shuffle. Returns the compacted frame
    (read back from ``dst``). ``open_cost_bytes`` is the planner's
    per-file surcharge — raising it biases toward FEWER output files
    for directories of many tiny files (the surcharge models the real
    footer/open overhead being compacted away)."""
    # pin the knobs on an ISOLATED session (shared SparkContext, own
    # SQLConf): a concurrent query on the caller's session is never
    # planned under the compaction knobs, and nothing has to be
    # restored afterwards (the save/restore form also turned
    # previously-unset keys into explicitly-set defaults, because
    # conf.get returns the built-in default rather than raising)
    sess = spark.newSession()
    # newSession starts from builder-time confs only — runtime set()
    # values on the caller's session do NOT carry over. Copy the confs
    # that change what the compaction WRITES (codec, timestamp
    # encoding/rebase, file sizing, session zone), so the compacted
    # bytes match what the caller's own session would have produced.
    for key in (
        "spark.sql.parquet.compression.codec",
        "spark.sql.parquet.outputTimestampType",
        "spark.sql.parquet.datetimeRebaseModeInWrite",
        "spark.sql.parquet.int96RebaseModeInWrite",
        "spark.sql.files.maxRecordsPerFile",
        "spark.sql.session.timeZone",
    ):
        sess.conf.set(key, spark.conf.get(key))
    sess.conf.set("spark.sql.files.maxPartitionBytes", str(target_bytes))
    sess.conf.set("spark.sql.files.openCostInBytes", str(open_cost_bytes))
    sess.read.parquet(src).write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a parquet directory — the
    before/after observability for compaction."""
    import os

    n = tot = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                tot += os.path.getsize(os.path.join(root, f))
    return n, tot
