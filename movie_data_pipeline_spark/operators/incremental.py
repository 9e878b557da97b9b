"""Incremental aggregate maintenance (materialized-view style).

A 100 TB warehouse cannot recompute its rollups from the base table on
every ingest; it folds each delta into the stored aggregate state. For
ALGEBRAIC aggregates (COUNT, SUM, and anything derivable from them —
AVG = SUM/COUNT, share-of-total, rates) the fold is exact: the state
stores the commutative-monoid components and merging is a keyed
full-outer join + componentwise addition, O(|state| + |delta|)
regardless of base-table size.

Non-algebraic aggregates (MIN/MAX under deletions, DISTINCT counts)
need either retraction logs or sketches (HLL union IS algebraic — the
documented swap from ``operators/approx.py``); this module keeps to the
exact algebraic core and REFUSES measures it cannot maintain soundly
rather than silently approximating.

Deletion support: deltas may carry negative multiplicities (a CDC
"remove" row, q136's diff shape) — COUNT components go negative during
the fold and groups whose count reaches zero drop out of the state.

Composes with the rest of the lakehouse-lite stack: read the delta from
``snapshot_diff`` (q136) or a streaming micro-batch, fold with
:func:`merge_aggregate_state`, commit the new state to a
``VersionedTable`` — snapshot-isolated, time-travelable rollups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

COUNT_COL = "__ivm_count"


def aggregate_state(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str],
    weight: str | None = None,
) -> DataFrame:
    """Build (or delta-build) the maintainable state: per key group,
    the row count (signed when ``weight`` supplies +1/-1 CDC
    multiplicities) and one exact DECIMAL(30,6) sum per measure.

    The same function builds the initial state from the base table AND
    each delta's partial state — incremental maintenance is merging
    partial aggregates, so one definition serves both (the map-side
    combine Catalyst already does, made storable).
    """
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    aggs = [F.sum(w).alias(COUNT_COL)] + [
        F.sum((F.col(c) * w).cast("decimal(30,6)")).alias(f"sum_{c}")
        for c in sums
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_state(
    state: DataFrame,
    delta_state: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Fold a delta's partial state into the stored state: keyed
    full-outer join, componentwise addition, drop zero-count groups.
    Exact for the algebraic components by construction (DECIMAL sums
    commute and associate); new keys appear, fully-retracted keys
    disappear."""
    measure_cols = [
        c for c in state.columns if c not in keys
    ]
    if measure_cols != [c for c in delta_state.columns if c not in keys]:
        raise ValueError(
            f"state/delta measure mismatch: {measure_cols} vs "
            f"{[c for c in delta_state.columns if c not in keys]}"
        )
    s = state.select(
        *keys, *[F.col(c).alias(f"s_{c}") for c in measure_cols]
    )
    d = delta_state.select(
        *keys, *[F.col(c).alias(f"d_{c}") for c in measure_cols]
    )
    merged = s.join(d, list(keys), "full_outer").select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"s_{c}"), F.lit(0))
                + F.coalesce(F.col(f"d_{c}"), F.lit(0))
            ).alias(c)
            for c in measure_cols
        ],
    )
    return merged.filter(F.col(COUNT_COL) != 0)


def state_to_report(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Render derived aggregates (counts, sums, means) from the state —
    the SELECT layer a dashboard reads. Means divide the exact decimal
    components, so a maintained report equals the full recompute
    bit-for-bit (asserted in tests)."""
    sum_cols = [c for c in state.columns if c.startswith("sum_")]
    return state.select(
        *keys,
        F.col(COUNT_COL).alias("n_rows"),
        *[F.col(c).cast("double").alias(c) for c in sum_cols],
        *[
            (F.col(c).cast("double") / F.col(COUNT_COL)).alias(
                c.replace("sum_", "avg_")
            )
            for c in sum_cols
        ],
    )
