"""Partition-pruning behavior on partitioned layouts (SURVEY §4: the
reference's B-tree indexes map to partition pruning + parquet min/max
in this engine).

Static pruning: a literal predicate on the partition column must reach
the scan as a PartitionFilter (only matching directories listed).
Dynamic partition pruning (DPP): joining the partitioned fact to a
*filtered* dimension on the partition column must inject a runtime
``dynamicpruning`` subquery into the fact scan — at 100 TB this is the
difference between scanning one date's partitions and the whole table
when the date filter lives on the dim side (the classic star-schema
pattern Catalyst handles without hints).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_data_pipeline_spark.sources.registry import load_table
from movie_data_pipeline_spark.sources.sinks import write_partitioned

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def part_orders_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_priority")
    orders = load_table(spark, SF_DIR, "orders")
    write_partitioned(orders, path, ["o_orderpriority"])
    return path


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_static_partition_pruning(spark, part_orders_path):
    df = spark.read.parquet(part_orders_path).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = _executed_plan(df)
    assert "PartitionFilters" in plan
    # The partition predicate must be a partition filter, not a post-scan
    # data filter.
    assert "1-URGENT" in plan.split("PartitionFilters")[1].split("]")[0]
    # And it must actually prune: only one directory's rows survive.
    full = spark.read.parquet(part_orders_path)
    expected = full.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert df.count() == expected > 0


def test_dynamic_partition_pruning(spark, part_orders_path):
    fact = spark.read.parquet(part_orders_path)
    dim = (
        fact.select("o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority").startswith("1-"))
    )
    joined = fact.join(dim, "o_orderpriority").groupBy("o_orderpriority").count()
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized, (
        "expected a DPP subquery on the partitioned fact scan:\n" + optimized
    )
    rows = {r["o_orderpriority"]: r["count"] for r in joined.collect()}
    assert set(rows) == {"1-URGENT"}


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime bloom-filter join pruning (on by default, thresholds
    sized for clusters: creation side ≤10MB, application side ≥10GB
    scan). At test scale the application side never qualifies, so this
    test lowers the thresholds to prove the mechanism: a selective dim
    filter must inject a BloomFilterMightContain probe into the fact
    scan side of a shuffle join."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            str(64 * 1024 * 1024),
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        lineitem = load_table(spark, SF_DIR, "lineitem")
        part = load_table(spark, SF_DIR, "part").filter(F.col("p_size") <= 2)
        joined = (
            lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .count()
        )
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in optimized.lower(), optimized
        assert joined.count() > 0
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
