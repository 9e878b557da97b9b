"""Connected-components semantics on planted graphs."""

from __future__ import annotations

from movie_data_pipeline_spark.operators.graph import (
    connected_components,
    duplicate_clusters,
)


def test_chain_collapses_to_one_component(spark):
    # A long chain is the worst case for min-label propagation
    # (diameter = n-1); 6 nodes converge well inside max_rounds.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], ["src", "dst"]
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {(i, 1) for i in range(1, 7)}


def test_components_are_separated_and_singletons_kept(spark):
    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(n,) for n in (10, 11, 12, 20, 21, 30)], ["id"])
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
        (30, 30),  # isolated node is its own component
    }


def test_duplicate_clusters_drops_singletons(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], ["doc_id"])
    rows = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"])
        for r in duplicate_clusters(pairs, docs).collect()
    }
    assert rows == {(1, 1, 3), (2, 1, 3), (3, 1, 3)}
