"""Similarity-operator tests on crafted vectors: exact top-k ordering,
near-dup flagging, and the LSH bucketed path finding a planted
near-duplicate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from movie_data_pipeline_spark.operators.similarity import (
    cosine,
    cosine_topk,
    cosine_topk_lsh,
)

DIM = 8


def _vec(*vals):
    return [float(v) for v in vals] + [0.0] * (DIM - len(vals))


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, _vec(1, 0)),  # query
        (1, _vec(0.99, 0.05)),  # planted near-duplicate of 0
        (2, _vec(0.5, 0.5)),  # moderately similar
        (3, _vec(0, 1)),  # orthogonal
        (4, _vec(-1, 0)),  # opposite
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_cosine_expression(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0])],
        "a ARRAY<FLOAT>, b ARRAY<FLOAT>",
    )
    got = [r.c for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(1.0)


def test_cosine_topk_exact(vectors):
    q = vectors.filter("vec_id = 0")
    out = cosine_topk(vectors, q, k=4).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [1, 2, 3, 4]
    assert out[0].cos_sim > 0.99
    assert out[0].rank == 1 and out[-1].cos_sim == pytest.approx(-1.0)


def test_cosine_topk_lsh_finds_near_dup(vectors):
    q = vectors.filter("vec_id = 0")
    out = cosine_topk_lsh(vectors, q, k=4, n_planes=4, dim=DIM).collect()
    by_rank = sorted(out, key=lambda r: r.rank)
    # The planted near-parallel vector must share the query's bucket and
    # surface as the top candidate; the opposite vector must not appear.
    assert by_rank and by_rank[0].neighbor_id == 1
    assert all(r.neighbor_id != 4 for r in out)
