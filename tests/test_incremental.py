"""Incremental aggregate maintenance: folding deltas (inserts and CDC
retractions) must equal the full recompute exactly, including after a
key fully retracts and after new keys appear."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_pipeline_spark.operators.incremental import (
    COUNT_COL,
    aggregate_state,
    merge_aggregate_state,
    state_to_report,
)


def _rows(df, keys):
    return {
        tuple(r[k] for k in keys): tuple(
            r[c] for c in df.columns if c not in keys
        )
        for r in df.collect()
    }


def test_fold_equals_full_recompute(spark):
    base = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], ["k", "v"]
    )
    delta = spark.createDataFrame(
        [("a", 3.0), ("c", 7.0)], ["k", "v"]
    )
    state = aggregate_state(base, ["k"], ["v"])
    folded = merge_aggregate_state(
        state, aggregate_state(delta, ["k"], ["v"]), ["k"]
    )
    full = aggregate_state(base.unionByName(delta), ["k"], ["v"])
    assert _rows(folded, ["k"]) == _rows(full, ["k"])
    rep = _rows(state_to_report(folded, ["k"]), ["k"])
    assert rep[("a",)] == (3, 6.0, 2.0)  # n, sum, avg
    assert rep[("c",)] == (1, 7.0, 7.0)


def test_retractions_remove_groups(spark):
    base = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 1), ("b", 10.0, 1)], ["k", "v", "m"]
    )
    # CDC delta: retract both 'a' rows, add one 'b'
    delta = spark.createDataFrame(
        [("a", 1.0, -1), ("a", 2.0, -1), ("b", 4.0, 1)], ["k", "v", "m"]
    )
    state = aggregate_state(base, ["k"], ["v"], weight="m")
    folded = merge_aggregate_state(
        state, aggregate_state(delta, ["k"], ["v"], weight="m"), ["k"]
    )
    got = _rows(folded, ["k"])
    assert ("a",) not in got  # fully retracted key is gone
    assert got[("b",)][0] == 2 and float(got[("b",)][1]) == 14.0


def test_maintained_rollup_on_versioned_table(spark, tmp_path):
    """End-to-end: hourly rollup maintained under appends on a
    VersionedTable equals the recompute from the table head."""
    from movie_data_pipeline_spark.sources.versioned import VersionedTable

    t = VersionedTable(str(tmp_path / "base"))
    s = VersionedTable(str(tmp_path / "state"))
    b0 = spark.createDataFrame([("x", 1.0), ("y", 2.0)], ["k", "v"])
    t.commit(b0)
    s.commit(aggregate_state(b0, ["k"], ["v"]))
    for batch in ([("x", 5.0)], [("y", 1.0), ("z", 9.0)]):
        d = spark.createDataFrame(batch, ["k", "v"])
        t.commit(d, mode="append")
        s.commit(
            merge_aggregate_state(
                s.read(spark), aggregate_state(d, ["k"], ["v"]), ["k"]
            )
        )
    maintained = _rows(s.read(spark), ["k"])
    recomputed = _rows(aggregate_state(t.read(spark), ["k"], ["v"]), ["k"])
    assert maintained == recomputed


def test_measure_mismatch_refused(spark):
    import pytest

    a = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    b = spark.createDataFrame([("a", 1.0)], ["k", "w"])
    with pytest.raises(ValueError):
        merge_aggregate_state(
            aggregate_state(a, ["k"], ["v"]),
            aggregate_state(b, ["k"], ["w"]),
            ["k"],
        )
