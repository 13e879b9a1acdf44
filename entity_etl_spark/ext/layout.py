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
