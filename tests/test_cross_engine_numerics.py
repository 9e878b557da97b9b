"""Batched cross-engine checks of the numeric discipline primitives.

Every oracle-compared double goes through ``plans.core.round4`` (Spark)
mirrored by ``r4`` (DuckDB), and order-sensitive sums go through
``exact_sum``/``exact_sum_sql``. These tests drive both engines over the
same adversarial value set — including half-boundary neighborhoods where
engine-native ROUND is known to disagree — and require bit equality.
One batch per engine (not per example): the property is checked on 20k
values for the cost of two queries.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from movie_data_pipeline_spark.plans.core import (
    exact_sum,
    exact_sum_sql,
    r4,
    round4,
)


@pytest.fixture(scope="module")
def values() -> np.ndarray:
    rng = np.random.default_rng(20260813)
    buckets = [
        rng.uniform(0, 1, 5000),
        rng.uniform(0, 1e7, 5000),
        # exact half-boundaries at the 4th decimal: x.00005-style points
        (np.arange(5000) * 2 + 1) / 2e4,
        # near-boundary ulp neighborhood
        (np.arange(5000) * 2 + 1) / 2e4 + rng.uniform(-1e-12, 1e-12, 5000),
    ]
    return np.concatenate(buckets)


def test_round4_bit_identical_across_engines(spark, values):
    pdf = pd.DataFrame({"x": values})
    got = (
        spark.createDataFrame(pdf)
        .select(round4(F.col("x")).alias("r"))
        .toPandas()["r"]
        .to_numpy()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"SELECT {r4('x')} AS r FROM t").df()["r"].to_numpy()
    # Bitwise equality, not approx: these are the values the driver hashes.
    assert np.array_equal(got, want), (
        f"round4 mismatch on {np.sum(got != want)} of {len(got)} values"
    )


def test_exact_sum_order_and_engine_independent(spark, values):
    pdf = pd.DataFrame({"x": values})
    shuffled = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    got_fwd = (
        spark.createDataFrame(pdf).agg(exact_sum(F.col("x")).alias("s")).collect()[0].s
    )
    got_shuf = (
        spark.createDataFrame(shuffled)
        .repartition(13)
        .agg(exact_sum(F.col("x")).alias("s"))
        .collect()[0]
        .s
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"SELECT {exact_sum_sql('x')} AS s FROM t").df()["s"][0]
    assert got_fwd == got_shuf == want
