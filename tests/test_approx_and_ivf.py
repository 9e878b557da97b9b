"""Error-bound tests for the approximate operators: sketches are not
hash-comparable across engines, so the contract asserted here is the
estimator's guarantee versus the exact answer on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_pipeline_spark.operators.approx import (
    approx_distinct,
    approx_quantiles,
    frequent_items,
)
from movie_data_pipeline_spark.operators.similarity import (
    cell_centroids,
    cosine_topk,
    cosine_topk_ivf,
    ivf_assign,
)
from movie_data_pipeline_spark.sources.registry import load_table
from tests.conftest import TESTDATA_SF_DIR


def test_approx_distinct_within_bounds(spark):
    orders = load_table(spark, TESTDATA_SF_DIR, "orders")
    approx = {
        r.o_orderstatus: r.approx_distinct
        for r in approx_distinct(orders, ["o_orderstatus"], "o_custkey").collect()
    }
    exact = {
        r.o_orderstatus: r.n
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        # rsd=5% → 6 sigma margin; HLL++ is far tighter in practice
        assert abs(approx[k] - n) <= max(3, 0.30 * n), (k, approx[k], n)


def test_approx_quantiles_rank_error(spark):
    lineitem = load_table(spark, TESTDATA_SF_DIR, "lineitem")
    probs = [0.25, 0.5, 0.75]
    got = approx_quantiles(lineitem, "l_extendedprice", probs, accuracy=10_000)
    n = lineitem.count()
    vals = [r.l_extendedprice for r in lineitem.select("l_extendedprice").collect()]
    vals.sort()
    for p, g in zip(probs, got):
        # value must sit within +-2*n/accuracy ranks of the true quantile
        import bisect

        rank = bisect.bisect_left(vals, g)
        assert abs(rank - p * n) <= max(2, 2 * n / 10_000 + 1), (p, g, rank)


def test_frequent_items_finds_planted_hot_key(spark):
    lineitem = load_table(spark, TESTDATA_SF_DIR, "lineitem")
    # l_returnflag has ~3 values; all are heavy hitters at 1% support
    out = frequent_items(lineitem, ["l_returnflag"], support=0.25).collect()[0]
    freq = set(out[0])
    exact_top = {
        r.l_returnflag
        for r in lineitem.groupBy("l_returnflag").count().orderBy(F.desc("count")).limit(1).collect()
    }
    assert exact_top <= freq  # no false negatives above support


def _planted_clusters(spark, n_centers=8, per_center=40, dim=16):
    """Deterministic clustered vectors: md5-derived centers, tight
    md5-derived noise — real geometric structure, no RNG state."""
    import hashlib

    def unit(tag):
        vals = []
        for j in range(dim):
            h = hashlib.md5(f"{tag}:{j}".encode()).hexdigest()
            vals.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
        n = sum(v * v for v in vals) ** 0.5
        return [v / n for v in vals]

    rows = []
    vid = 0
    for c in range(n_centers):
        center = unit(f"center:{c}")
        for i in range(per_center):
            noise = unit(f"noise:{c}:{i}")
            vec = [cv + 0.15 * nv for cv, nv in zip(center, noise)]
            rows.append((vid, vec, c))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "true_cluster"])


def test_ivf_cell_centroids_match_direct_means(spark):
    emb = _planted_clusters(spark)
    assigned = ivf_assign(emb, n_cells=8)
    cents = {r.cell: r.centroid for r in cell_centroids(assigned).collect()}
    want = {
        r.cell: r.m
        for r in assigned.select(
            "cell", F.col("embedding").getItem(0).cast("double").alias("v0")
        )
        .groupBy("cell")
        .agg(F.avg("v0").alias("m"))
        .collect()
    }
    for cell, m in want.items():
        assert abs(cents[cell][0] - m) < 1e-9


def test_ivf_assign_is_total_and_deterministic(spark):
    emb = _planted_clusters(spark)
    a1 = ivf_assign(emb, n_cells=8)
    assert a1.count() == emb.count()  # every vector lands in exactly one cell
    m1 = {r.vec_id: r.cell for r in a1.collect()}
    m2 = {r.vec_id: r.cell for r in ivf_assign(emb, n_cells=8).collect()}
    assert m1 == m2


def test_ivf_recall_on_clustered_data(spark):
    emb = _planted_clusters(spark)
    queries = emb.orderBy("vec_id").limit(8)
    exact_pairs = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    ivf_pairs = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_ivf(emb, queries, k=5, n_cells=8, nprobe=2).collect()
    }
    recall = len(exact_pairs & ivf_pairs) / len(exact_pairs)
    # noise is 0.15 vs unit centers: clusters are tight, so 2 of 8
    # Voronoi cells must recover nearly all true neighbors
    assert recall >= 0.9, recall
    assert all(q != n for q, n in ivf_pairs)


def test_ivf_nprobe_all_cells_is_exact(spark):
    emb = load_table(spark, TESTDATA_SF_DIR, "embeddings")
    queries = emb.orderBy("vec_id").limit(4)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    full = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_ivf(
            emb, queries, k=5, n_cells=6, nprobe=6
        ).collect()
    }
    assert full == exact
