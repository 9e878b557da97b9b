"""Contract test for the JDBC warehouse sink: no RDBMS exists in the
sandbox, so the test intercepts ``DataFrameWriter.jdbc`` and asserts the
exact plumbing — table order, overwrite+truncate semantics, batchsize,
connection properties — that reproduces the reference's SQLAlchemy load
(etl1.py:380-406, 483-506)."""

from __future__ import annotations

import pytest
from pyspark.sql.readwriter import DataFrameWriter

from movie_data_pipeline_spark.pipeline.movies_etl import (
    WAREHOUSE_TABLES,
    Warehouse,
    write_warehouse_jdbc,
)


@pytest.fixture()
def tiny_warehouse(spark):
    one = spark.range(1).selectExpr("id AS movie_id")
    return Warehouse(movies=one, genres=one, movie_genres=one, ratings=one)


def test_jdbc_plumbing(monkeypatch, tiny_warehouse):
    calls = []

    def fake_jdbc(self, url, table, mode=None, properties=None):
        calls.append({"url": url, "table": table, "mode": mode,
                      "properties": dict(properties or {})})

    monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc)
    write_warehouse_jdbc(
        tiny_warehouse,
        "jdbc:postgresql://db:5432/movies",
        batchsize=500,
        num_partitions=4,
        properties={"user": "etl", "password": "x", "driver": "org.postgresql.Driver"},
    )
    # parent-first table order (FK constraints, schema.sql:29-31)
    assert [c["table"] for c in calls] == list(WAREHOUSE_TABLES)
    for c in calls:
        assert c["url"] == "jdbc:postgresql://db:5432/movies"
        # overwrite+truncate == the reference's DELETE-then-INSERT into
        # the existing DDL (etl1.py:380-383), never DROP/CREATE
        assert c["mode"] == "overwrite"
        assert c["properties"]["truncate"] == "true"
        # executeBatch flush == the 1000-row insert chunks (etl1.py:497)
        assert c["properties"]["batchsize"] == "500"
        assert c["properties"]["numPartitions"] == "4"
        assert c["properties"]["user"] == "etl"
        assert c["properties"]["driver"] == "org.postgresql.Driver"


def test_jdbc_defaults(monkeypatch, tiny_warehouse):
    calls = []
    monkeypatch.setattr(
        DataFrameWriter, "jdbc",
        lambda self, url, table, mode=None, properties=None: calls.append(properties),
    )
    write_warehouse_jdbc(tiny_warehouse, "jdbc:sqlite:movies.db")
    assert calls[0]["batchsize"] == "1000"  # reference default, etl1.py:497
    assert calls[0]["truncate"] == "true"
    assert "numPartitions" not in calls[0]
