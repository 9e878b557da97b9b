"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the query catalog in
``movie_data_pipeline_spark.plans`` — every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extensions) registers there as a
(Spark builder, DuckDB oracle SQL) pair with aligned column names and
rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from movie_data_pipeline_spark.plans import REGISTRY

FLAGSHIP = "q02_region_revenue"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY[FLAGSHIP].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }
