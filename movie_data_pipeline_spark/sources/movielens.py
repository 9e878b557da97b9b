"""MovieLens CSV sources (reference parity, SURVEY.md §2.1 S1/S2).

Explicit schemas (no inference scan), header row, quoted fields — the
format documented in the reference's data/README.txt. ``read_links``
falls back to an empty frame when the file is absent, matching
reference etl1.py:59-64.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from movie_data_pipeline_spark.schemas import (
    LINKS_CSV_SCHEMA,
    MOVIES_CSV_SCHEMA,
    RATINGS_CSV_SCHEMA,
)

_CSV_OPTIONS = {"header": "true", "quote": '"', "escape": '"', "encoding": "UTF-8"}


def _read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.options(**_CSV_OPTIONS).schema(schema).csv(path)


def read_movies(spark: SparkSession, data_dir: str) -> DataFrame:
    return _read_csv(spark, os.path.join(data_dir, "movies.csv"), MOVIES_CSV_SCHEMA)


def read_ratings(spark: SparkSession, data_dir: str) -> DataFrame:
    # Read as strings; numeric coercion (invalid → null → dropped) happens
    # in transform_ratings, mirroring pd.to_numeric(errors='coerce').
    return _read_csv(spark, os.path.join(data_dir, "ratings.csv"), RATINGS_CSV_SCHEMA)


def read_links(spark: SparkSession, data_dir: str) -> DataFrame:
    """links.csv is optional: missing file → empty frame (etl1.py:59-64)."""
    path = os.path.join(data_dir, "links.csv")
    if not os.path.exists(path):
        return spark.createDataFrame([], LINKS_CSV_SCHEMA)
    return _read_csv(spark, path, LINKS_CSV_SCHEMA)
