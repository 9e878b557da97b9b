"""Parquet table registry for the driver-generated synthetic tables.

Mirrors the reference's warehouse-table registration step (schema.sql
applied via DDL, SURVEY.md §2.1 S6): every table is available both as a
DataFrame and as a named temp view for ``spark.sql``. Reads are plain
``spark.read.parquet`` — column pruning and predicate pushdown reach the
scan via Catalyst, so operators never pre-filter manually.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_pipeline_spark.schemas import TESTDATA_SCHEMAS

TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TESTDATA_TABLES}")
    # Explicit schema: no inference scan, and timestamps are pinned to NTZ
    # so semantics match the naive-timestamp oracle in any session timezone.
    df = spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(table_path(sf_dir, name))
    if name == "events":
        # Parquet TIMESTAMP(NANOS) is read as raw INT64 (see schemas.py);
        # rebuild a TIMESTAMP_NTZ by pure epoch arithmetic — truncation to
        # micros matches the oracle engine's ns→µs cast, and no session
        # timezone is involved.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (idempotent)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
