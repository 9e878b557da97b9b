"""Distributed connected components — the clustering step of a
near-duplicate pipeline (candidate pairs → duplicate clusters →
canonical representative per cluster).

The reference pipeline has no graph operator (its dedup surface is the
pandas set-difference check at ``README.md:482-488``); this is part of
the LLM-training-data extension surface: after q18/q20 produce near-dup
*pairs*, a training pipeline must group them into *clusters* and keep
one canonical document per cluster.

Algorithm: minimum-label propagation. Every node starts labelled with
its own id; each round, every node takes the min of its own label and
its neighbours' labels; converged when no label changes. Rounds needed =
graph diameter. Near-duplicate graphs are unions of small dense
clusters (diameter 2-3 in practice), so propagation converges in a
handful of rounds. For adversarial high-diameter graphs (long chains)
the alternating large-star/small-star contraction of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SoCC '14), converges in
O(log² n) rounds with the same per-round shuffle shape — the loop below
is written so that swapping the round body for star contraction is a
local change.

Scale notes (100 TB discipline):

- Each round is two shuffles: messages are grouped by destination node,
  then unioned with the current labels and min-aggregated. Both hash on
  the node id — AQE coalesces the exchanges.
- ``localCheckpoint`` after every round truncates lineage; without it
  the logical plan doubles per iteration and the driver, not the
  cluster, becomes the bottleneck.
- The convergence test is a single aggregate over the changed-label
  join, not a ``collect()``.
- Only (node, label) pairs ever shuffle — never document text or
  signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _materialize(df: DataFrame) -> DataFrame:
    """Cut lineage between propagation rounds."""
    try:
        return df.localCheckpoint(eager=True)
    except Exception:  # pragma: no cover - Connect or checkpoint-less envs
        df.persist()
        df.count()
        return df


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every node with the smallest node id in its component.

    Parameters
    ----------
    edges:
        Undirected edge list (either orientation; duplicates fine).
    nodes:
        Optional single-column node universe. Nodes absent from
        ``edges`` become singleton components (their own id). Defaults
        to the nodes appearing in ``edges``.
    Returns ``DataFrame[node, component]``.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = _materialize(sym)

    if nodes is None:
        universe = sym.select(F.col("a").alias("node")).distinct()
    else:
        universe = nodes.toDF("node").distinct()
    labels = _materialize(universe.withColumn("component", F.col("node")))

    for _ in range(max_rounds):
        # Every node forwards its current label to each neighbour.
        msgs = sym.join(labels, sym.a == labels.node).select(
            F.col("b").alias("node"), "component"
        )
        new_labels = _materialize(
            labels.union(msgs).groupBy("node").agg(F.min("component").alias("component"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def duplicate_clusters(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Cluster near-duplicate pairs; return members of multi-doc clusters.

    ``pairs`` must carry ``doc_a``/``doc_b`` (e.g. from
    ``operators.dedup.jaccard_pairs`` or ``lsh_candidate_pairs``);
    ``docs`` supplies the node universe so isolated documents are
    (implicitly) singleton clusters. Output: one row per document that
    belongs to a cluster of ≥ 2 documents, with the cluster's canonical
    id (min doc_id) and size — exactly what a keep-one-per-cluster
    filter consumes downstream.
    """
    comp = connected_components(
        pairs.select("doc_a", "doc_b"),
        nodes=docs.select("doc_id"),
        src="doc_a",
        dst="doc_b",
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes.filter(F.col("cluster_size") > 1), "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
        )
    )
