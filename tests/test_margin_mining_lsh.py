"""Recall gate for q256b, the banded-LSH margin-mining plan: its
answer is graded against q256's exact (cross-join) answer the way q132
grades the ANN index against brute-force top-k — measured floors, not
aspirations (VERDICT r5 #1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_pipeline_spark.plans import REGISTRY
from movie_data_pipeline_spark.plans.similarity import (
    _MB_BANDS,
    _MB_RMAX,
    _MB_TARGET,
    _mb_rows_per_band,
)
from tests.conftest import TESTDATA_SF_DIR


def test_rows_per_band_ladder():
    """Integer ladder: smallest r with 2**r >= ceil(n/target), clamped
    to [2, _MB_RMAX] — spot values plus the exhaustive invariant."""
    assert _mb_rows_per_band(1) == 2
    assert _mb_rows_per_band(250) == 2      # sf0.001 / sf0.01 shards
    assert _mb_rows_per_band(1000) == 4     # sf0.1 shards
    assert _mb_rows_per_band(10_000) == 8   # 10x probe scale (capped)
    for n in range(1, 20_000, 37):
        r = _mb_rows_per_band(n)
        m = (n + _MB_TARGET - 1) // _MB_TARGET
        assert 2 <= r <= _MB_RMAX
        if r < _MB_RMAX:
            assert 2**r >= m
        if r > 2:
            assert 2 ** (r - 1) < m


def test_margin_lsh_recall_vs_exact(spark):
    """Every floor is the r6-measured value minus slack: recall 0.983,
    precision 0.975 at sf0.001. A drop below 0.9 means the banding or
    the plane table changed semantics, not noise (the plan is fully
    deterministic)."""
    exact = (
        REGISTRY["q256_margin_candidate_mining"]
        .build(spark, TESTDATA_SF_DIR)
        .select("x_id", "y_id")
        .persist()
    )
    approx = (
        REGISTRY["q256b_margin_mining_lsh"]
        .build(spark, TESTDATA_SF_DIR)
        .persist()
    )
    n_exact = exact.count()
    n_approx = approx.count()
    hits = approx.join(exact, ["x_id", "y_id"], "left_semi").count()
    assert n_exact > 0
    assert hits / n_exact >= 0.9, f"recall {hits}/{n_exact}"
    assert hits / n_approx >= 0.9, f"precision {hits}/{n_approx}"
    exact.unpersist()
    approx.unpersist()


def test_margin_lsh_candidate_volume_is_pruned(spark):
    """The band join must examine strictly fewer pairs than the cross
    product — the whole point of the plan. Re-derive the candidate set
    exactly as the query does and compare against |X| * |Y|."""
    from movie_data_pipeline_spark.operators.similarity import (
        _hyperplane,
        dot,
        _to_double,
    )
    from movie_data_pipeline_spark.plans.similarity import (
        _ANN_DIM,
        _MARGIN_X_PRED,
        _MARGIN_Y_PRED,
    )
    from movie_data_pipeline_spark.sources.registry import load_table

    emb = load_table(spark, TESTDATA_SF_DIR, "embeddings")
    x = emb.filter(F.expr(_MARGIN_X_PRED)).select(
        F.col("vec_id").alias("x_id"), _to_double("embedding").alias("v")
    )
    y = emb.filter(F.expr(_MARGIN_Y_PRED)).select(
        F.col("vec_id").alias("y_id"), _to_double("embedding").alias("v")
    )
    nx, ny = x.count(), y.count()
    r = _mb_rows_per_band((nx + ny) // 2)
    planes = [_hyperplane(_ANN_DIM, i) for i in range(_MB_BANDS * r)]

    def sig(side, idc):
        chars = [
            F.when(
                dot(F.col("v"), F.array(*[F.lit(c) for c in p])) >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in planes
        ]
        return (
            side.select(idc, F.concat(*chars).alias("s"))
            .select(
                idc,
                F.explode(F.sequence(F.lit(0), F.lit(_MB_BANDS - 1))).alias(
                    "b"
                ),
                "s",
            )
            .select(
                idc,
                "b",
                F.substring(F.col("s"), F.col("b") * r + 1, r).alias("sig"),
            )
        )

    n_cand = (
        sig(x, "x_id")
        .join(sig(y, "y_id"), ["b", "sig"])
        .select("x_id", "y_id")
        .distinct()
        .count()
    )
    assert n_cand < nx * ny, f"no pruning: {n_cand} vs {nx * ny}"
    # For an isotropic corpus the per-plane collision probability is
    # ~1/2, so the candidate fraction is ~1 - (1 - 2^-r)^bands (0.90
    # at r=2 — tiny corpora barely prune, by design: r grows with n
    # and the fraction falls to 0.03 at r=8; the 10x probe shows the
    # trend). Gate against the analytic bound plus slack so a banding
    # bug that silently admits everything still fails.
    frac_bound = 1.0 - (1.0 - 2.0**-r) ** _MB_BANDS
    assert n_cand <= (frac_bound + 0.05) * nx * ny, (
        f"{n_cand} vs bound {frac_bound:.3f} * {nx * ny}"
    )
