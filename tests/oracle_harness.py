"""Local replica of the driver's Spark-vs-DuckDB comparison.

The driver runs each ``queries()[name]`` and the matching
``oracle_sql()[name]`` at sf=0.01 and compares row count + schema +
order-insensitive value hash. This harness reproduces that check so
parity breaks surface in pytest before a round ends.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from movie_data_pipeline_spark.sources.registry import TESTDATA_TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns (order-insensitive)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> None:
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        try:
            pd.testing.assert_series_equal(
                g, w, check_dtype=False, check_names=False, check_exact=True
            )
        except AssertionError as e:
            raise AssertionError(f"{name}: column {col!r} differs: {e}") from e
