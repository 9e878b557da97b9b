"""Property tests for the shared fixed-size md5-bucket sampler
(``operators.util.fixed_sample`` + its oracle twin
``fixed_sample_ctes``) — the one implementation of the modulus
arithmetic every sample-bounded registered plan now calls
(VERDICT r7 #6): q256 margin mining, q248 S-curve sweep, and the
q264/q272 ANN-audit ground-truth legs.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from movie_data_pipeline_spark.operators.util import (
    fixed_sample,
    fixed_sample_ctes,
)

TARGET = 64


def _ids_df(spark, n):
    return spark.range(n).selectExpr(
        "id AS doc_id", "CAST(id * 7 AS STRING) AS payload"
    )


def _expected_ids(n, target):
    m = max(1, n // target)
    return {
        i
        for i in range(n)
        if m == 1
        or int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % m == 0
    }


def test_small_input_returned_untouched(spark):
    """n < 2*target -> modulus 1 -> the frame is the SAME plan (no
    filter), so small-SF driver hashes cannot move."""
    df = _ids_df(spark, 2 * TARGET - 1)
    out = fixed_sample(df, "doc_id", TARGET)
    assert out is df


@pytest.mark.parametrize("n", [200, 1000, 10_000])
def test_membership_matches_pure_python(spark, n):
    df = _ids_df(spark, n)
    got = {
        r.doc_id for r in fixed_sample(df, "doc_id", TARGET).collect()
    }
    assert got == _expected_ids(n, TARGET)


def test_sample_size_is_fixed_not_proportional(spark):
    """The whole point: ~target rows at ANY corpus size. md5 buckets
    are uniform, so the realized size concentrates near n/m; assert a
    generous band that a proportional sampler (10x more rows at 10x
    data) would blow through."""
    sizes = {}
    for n in (1000, 10_000, 100_000):
        sizes[n] = fixed_sample(_ids_df(spark, n), "doc_id", TARGET).count()
        assert TARGET // 2 <= sizes[n] <= 2 * TARGET, (n, sizes[n])
    assert max(sizes.values()) < 2 * min(sizes.values())


def test_partitioning_invariance(spark):
    df = _ids_df(spark, 5000)
    a = {r.doc_id for r in fixed_sample(df, "doc_id", TARGET).collect()}
    b = {
        r.doc_id
        for r in fixed_sample(df.repartition(17), "doc_id", TARGET).collect()
    }
    assert a == b


@pytest.mark.parametrize("n", [100, 1000, 20_000])
def test_oracle_cte_selects_identical_rows(spark, n):
    """fixed_sample_ctes is the DuckDB twin: same rows, bit for bit."""
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE src AS SELECT range AS doc_id FROM range({n})"
    )
    ctes = fixed_sample_ctes("src", "doc_id", TARGET, "s")
    oracle = {
        r[0]
        for r in con.execute(
            f"WITH {ctes} SELECT doc_id FROM s"
        ).fetchall()
    }
    assert oracle == _expected_ids(n, TARGET)
