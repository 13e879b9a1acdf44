"""Changed-row detection — the reference's core operator (O5).

Reference semantics (cache.js:69-85 ``isNewOrUpdatedEntity``): an incoming
entity is emitted iff

1. its id is non-null (rows with null/missing id are dropped,
   cache.js:70-74), and
2. (a) the id is not in state, OR (b) deep equality against the stored copy
   fails, where the comparison IGNORES ``updatedOnMs`` (cache.js:16-17,53 —
   ``omit(entity, IGNORED_PROPS)``).

Spark-first design: the deep equality becomes a canonical **content hash** —
``sha2(to_json(struct(<sorted columns minus ignored>)), 256)`` — compared via
a single left join against the state table. ``to_json`` omits NULL fields,
which canonicalizes NULL and absent identically (the reference's lodash
``isEqual`` on ragged JSON objects behaves the same way for omitted keys;
SURVEY.md §7.5.2).

Scale notes (100 TB): the join shuffles both sides on the id unless the state
table is bucketed by id (then only incoming shuffles) or small enough to
broadcast. The hash is computed map-side before the shuffle, so only
(id, hash) plus carried columns move. AQE handles skewed ids.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_COL = "__content_hash"


def content_hash(
    columns: Sequence[str], exclude: Sequence[str] = ()
) -> Column:
    """Canonical content hash over ``columns`` minus ``exclude``.

    Columns are sorted by name so the hash is key-order-insensitive (lodash
    isEqual parity, SURVEY.md §7.5.2); values are serialized by ``to_json``
    (NULLs omitted). The column *set and types* must be stable across runs
    for state comparison — the engine persists hashes, not re-hashes.
    """
    excluded = set(exclude)
    kept = sorted(c for c in columns if c not in excluded)
    if not kept:
        raise ValueError("content_hash: no columns left after exclusions")
    return F.sha2(F.to_json(F.struct(*[F.col(c) for c in kept])), 256)


def with_content_hash(
    df: DataFrame, exclude: Sequence[str] = (), hash_col: str = HASH_COL
) -> DataFrame:
    return df.withColumn(hash_col, content_hash(df.columns, exclude))


def changed_rows(
    incoming: DataFrame,
    state: DataFrame | None,
    id_field: str,
    ignore: Sequence[str] = ("updatedOnMs",),
) -> DataFrame:
    """Rows of ``incoming`` that are new or changed relative to ``state``.

    ``state`` must carry ``(id_field, HASH_COL)`` (see state.py); pass None
    for a first run (everything with a non-null id is new — reference
    cache.js:75-77). Output column set == incoming's.

    The new-id half of the predicate is a left-anti join and the changed half
    a hash inequality, fused into one left join + filter so state is scanned
    once.
    """
    incoming = incoming.filter(F.col(id_field).isNotNull())
    if state is None:
        return incoming
    hashed = with_content_hash(incoming, exclude=ignore)
    st = state.select(
        F.col(id_field).alias("__state_id"), F.col(HASH_COL).alias("__state_hash")
    )
    joined = hashed.join(st, hashed[id_field] == st["__state_id"], "left")
    return (
        joined.filter(
            F.col("__state_id").isNull() | (F.col(HASH_COL) != F.col("__state_hash"))
        )
        .drop("__state_id", "__state_hash", HASH_COL)
    )


def seen_keys(incoming: DataFrame, id_field: str) -> DataFrame:
    """Distinct non-null ids observed this batch. The reference refreshes
    state TTL for every *seen* key, changed or not (cache.js:79 — a
    side-effecting filter predicate; here it is an explicit pure set)."""
    return (
        incoming.filter(F.col(id_field).isNotNull()).select(id_field).distinct()
    )
