"""Distributed prefix-sum / global-rank operator vs single-partition
window references (the semantics it exists to replace at scale)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from movie_data_pipeline_spark.operators.prefix import (
    attach_global_row_number,
    attach_running_sums,
    ntile_from_row_number,
)


@pytest.fixture(scope="module")
def frame(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randint(0, 50), rng.random() * 10)
        for i in rng.sample(range(100_000), 2_000)
    ]
    return (
        spark.createDataFrame(rows, "id long, grp long, val double")
        .repartition(13)
        .persist()
    )


def test_running_sums_match_global_window(frame):
    res, n = attach_running_sums(
        frame,
        ["id"],
        {"cum_val": F.col("val"), "cum_n": F.lit(1).cast("long")},
        partitions=8,
    )
    assert n == 2_000
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    ref = frame.select(
        "id",
        F.sum("val").over(w).alias("cum_val"),
        F.count("*").over(w).alias("cum_n"),
    )
    got = {r["id"]: (r["cum_val"], r["cum_n"]) for r in res.collect()}
    for r in ref.collect():
        assert got[r["id"]][0] == pytest.approx(r["cum_val"], abs=1e-9)
        assert got[r["id"]][1] == r["cum_n"]


def test_running_sums_keeps_all_columns(frame):
    res, _ = attach_running_sums(frame, ["id"], {"c": F.col("val")})
    assert set(res.columns) == {"id", "grp", "val", "c"}


def test_empty_frame(spark):
    empty = spark.createDataFrame([], "id long, val double")
    res, n = attach_running_sums(empty, ["id"], {"c": F.col("val")})
    assert n == 0
    assert res.count() == 0


@pytest.mark.parametrize("k", [1, 4, 5, 7, 1_999, 2_000, 3_000])
def test_ntile_matches_builtin(frame, k):
    # Descending first key + tie-break, the q93 shape.
    ranked, n = attach_global_row_number(
        frame, [F.col("grp").desc(), "id"], "rn", partitions=8
    )
    mine = {
        r["id"]: r["b"]
        for r in ranked.select(
            "id", ntile_from_row_number(F.col("rn"), n, k).alias("b")
        ).collect()
    }
    w = Window.orderBy(F.col("grp").desc(), "id")
    ref = frame.select("id", F.ntile(k).over(w).alias("b"))
    for r in ref.collect():
        assert mine[r["id"]] == r["b"], (k, r["id"])


def test_row_number_is_dense_and_unique(frame):
    ranked, n = attach_global_row_number(frame, ["id"], "rn", partitions=8)
    rns = sorted(r["rn"] for r in ranked.select("rn").collect())
    assert rns == list(range(1, n + 1))


def test_running_sum_null_semantics_match_sql_window(spark):
    """SQL running-SUM nullability: NULL only while the whole inclusive
    prefix is null; a null value AFTER non-null carries must yield the
    carry (this is exactly the partition-head case the offset join must
    get right)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from movie_data_pipeline_spark.operators.prefix import attach_running_sums

    rows = [(1, None), (2, None), (3, 5.0), (4, None), (5, 2.0), (6, None)]
    df = spark.createDataFrame(rows, "k INT, v DOUBLE")
    got, n = attach_running_sums(df, ["k"], {"rs": F.col("v")}, partitions=3)
    assert n == 6
    want = {
        r.k: r.rs
        for r in df.withColumn(
            "rs",
            F.sum("v").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert {r.k: r.rs for r in got.collect()} == want
    assert want[1] is None and want[4] == 5.0  # the two tricky cases
