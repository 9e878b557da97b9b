"""q160 proration invariants (per-order exactness) and q159's window
group-limit pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_pipeline_spark.plans import REGISTRY
from tests.conftest import TESTDATA_SF_DIR


def test_proration_sums_exactly_per_order(spark):
    out = REGISTRY["q160_rebate_proration"].build(spark, TESTDATA_SF_DIR)
    orders = spark.read.parquet(f"{TESTDATA_SF_DIR}/orders.parquet").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 10 + F.lit(0.5))
        .cast("long")
        .alias("rebate_cents"),
    )
    bad = (
        out.groupBy("l_orderkey")
        .agg(F.sum("alloc_cents").alias("s"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("s") != F.col("rebate_cents"))
        .count()
    )
    assert bad == 0


def test_proration_allocations_nonnegative_one_row_per_line(spark):
    out = REGISTRY["q160_rebate_proration"].build(spark, TESTDATA_SF_DIR)
    assert out.filter(F.col("alloc_cents") < 0).count() == 0
    li = spark.read.parquet(f"{TESTDATA_SF_DIR}/lineitem.parquet")
    # one allocation row per lineitem row (duplicate (okey, linenumber)
    # keys exist in this synthetic data — each still gets its own row)
    assert out.count() == li.count()


def test_diversified_topk_uses_window_group_limit(spark):
    df = REGISTRY["q159_diversified_top_orders"].build(spark, TESTDATA_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # per-partition prune before rank
    # quota honored
    per = df.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    assert per <= 2
