"""Upsert (MERGE) semantics without a table format.

The reference loads with ``INSERT ... ON DUPLICATE KEY UPDATE``
(full-refresh in practice; see SURVEY.md §2.1 S4). On a lakehouse the
native answer is Delta/Iceberg ``MERGE INTO``; neither ships in this
container, so ``upsert`` implements the same row semantics as a pure
DataFrame transform the caller writes back out:

    result = target rows not matched by source   (kept)
           + source rows                         (insert or overwrite-match)

That is exactly MERGE with WHEN MATCHED THEN UPDATE SET * / WHEN NOT
MATCHED THEN INSERT * — the most common form.

Scale: one left-anti join on the key (both sides shuffle-partitioned by
key; broadcast when the source is dimension-sized) + a zero-shuffle
UNION ALL. Rewriting only affected partitions (dynamic partition
overwrite, ``partitionOverwriteMode=dynamic``) keeps the write
proportional to changed data rather than the full table — the
copy-on-write strategy table formats automate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    broadcast_source: bool = False,
) -> DataFrame:
    """MERGE: source rows replace key-matched target rows, others insert.

    Both inputs must share a schema (asserted — silent column
    misalignment is the classic UNION bug). If the source can hold
    duplicate keys, resolve them first (e.g. q57-style max_by per key);
    this function intentionally does not guess a winner.
    """
    t_cols, s_cols = target.columns, source.columns
    if set(t_cols) != set(s_cols):
        raise ValueError(
            f"upsert requires identical schemas; target has "
            f"{sorted(set(t_cols) - set(s_cols))} extra, source has "
            f"{sorted(set(s_cols) - set(t_cols))} extra"
        )
    probe = source.select(*keys)
    if broadcast_source:
        probe = F.broadcast(probe)
    kept = target.join(probe, on=list(keys), how="left_anti")
    return kept.unionByName(source)


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Derive the change stream between two snapshots: one row per
    changed key with ``op`` in {'insert','update','delete'} — the
    inverse of :func:`upsert` (q136 is the catalog's oracle-verified
    spelling of the same classification; this is the reusable operator
    form for pipelines).

    Same schema contract as upsert. Comparison is null-safe over the
    non-key columns packed into one struct, so a value→NULL transition
    classifies as an update, not a spurious match. Scale: one
    key-partitioned full outer join; on wide rows, pre-hash the value
    struct to a digest column and diff 16 bytes instead (same plan
    shape, documented in q136).
    """
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot_diff requires identical schemas; old has "
            f"{sorted(set(old.columns) - set(new.columns))} extra, new has "
            f"{sorted(set(new.columns) - set(old.columns))} extra"
        )
    vals = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.struct(*vals).alias("__ov"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        F.struct(*vals).alias("__nv"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    first_ok, first_nk = f"__ok_{keys[0]}", f"__nk_{keys[0]}"
    op = (
        F.when(F.col(first_ok).isNull(), F.lit("insert"))
        .when(F.col(first_nk).isNull(), F.lit("delete"))
        .when(~F.col("__ov").eqNullSafe(F.col("__nv")), F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
        for k in keys
    ]
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(*out_keys, "op")
    )
