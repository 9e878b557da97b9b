"""Upsert/MERGE semantics: updates replace, inserts append, untouched
rows survive — checked against a directly-constructed expected state."""

from __future__ import annotations

import pytest

from movie_data_pipeline_spark.operators.merge import upsert


def test_upsert_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id LONG, name STRING, score DOUBLE",
    )
    source = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)],
        "id LONG, name STRING, score DOUBLE",
    )
    got = {r.id: (r.name, r.score) for r in upsert(target, source, ["id"]).collect()}
    assert got == {
        1: ("a", 10.0),   # untouched
        2: ("b2", 99.0),  # updated (source wins)
        3: ("c", 30.0),   # untouched
        4: ("d", 40.0),   # inserted
    }


def test_upsert_composite_key_and_broadcast(spark):
    target = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "k LONG, sub STRING, v DOUBLE"
    )
    source = spark.createDataFrame(
        [(1, "y", 9.0), (2, "z", 3.0)], "k LONG, sub STRING, v DOUBLE"
    )
    got = {
        (r.k, r.sub): r.v
        for r in upsert(target, source, ["k", "sub"], broadcast_source=True).collect()
    }
    assert got == {(1, "x"): 1.0, (1, "y"): 9.0, (2, "z"): 3.0}


def test_upsert_rejects_schema_mismatch(spark):
    target = spark.createDataFrame([(1, "a")], "id LONG, name STRING")
    source = spark.createDataFrame([(1, 2.0)], "id LONG, score DOUBLE")
    with pytest.raises(ValueError, match="identical schemas"):
        upsert(target, source, ["id"])


def test_upsert_is_idempotent(spark):
    target = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id LONG, v DOUBLE")
    source = spark.createDataFrame([(2, 9.0)], "id LONG, v DOUBLE")
    once = upsert(target, source, ["id"])
    twice = upsert(once, source, ["id"])
    assert sorted((r.id, r.v) for r in twice.collect()) == [(1, 1.0), (2, 9.0)]
