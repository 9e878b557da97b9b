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
