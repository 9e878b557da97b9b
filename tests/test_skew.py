"""Salted aggregate/join must produce exactly the unsalted results on a
deliberately skewed dataset (one key holding ~90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_data_pipeline_spark.operators.skew import (
    deterministic_salt,
    salted_aggregate,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' dominates; ids unique
    rows = [(i, "hot" if i % 10 else "cold", float(i % 7)) for i in range(5000)]
    return spark.createDataFrame(rows, "id LONG, key STRING, v DOUBLE")


def test_salted_aggregate_matches_plain(skewed):
    plain = {
        (r.key): (r.n, r.s)
        for r in skewed.groupBy("key")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r.key): (r.n, r.s)
        for r in salted_aggregate(
            skewed,
            ["key"],
            partial_aggs=lambda: [
                F.count("*").alias("pn"),
                F.sum("v").alias("ps"),
            ],
            merge_aggs=lambda: [
                F.sum("pn").alias("n"),
                F.sum("ps").alias("s"),
            ],
            salt=deterministic_salt("id", 16),
        ).collect()
    }
    assert salted == plain


def test_salted_distinct_aggregate(skewed):
    plain = {
        r.key: r.n
        for r in skewed.groupBy("key")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    salted = {
        r.key: r.n
        for r in salted_aggregate(
            skewed,
            ["key"],
            partial_aggs=lambda: [F.collect_set("v").alias("vs")],
            merge_aggs=lambda: [
                F.size(F.array_distinct(F.flatten(F.collect_list("vs")))).alias("n")
            ],
            salt=deterministic_salt("id", 16),
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C")], "key STRING, label STRING"
    )
    plain = skewed.join(dim, "key").agg(F.count("*"), F.sum(F.length("label"))).collect()
    salted = (
        salted_join(skewed, dim, "key", "id", n_salts=8)
        .agg(F.count("*"), F.sum(F.length("label")))
        .collect()
    )
    assert plain == salted
