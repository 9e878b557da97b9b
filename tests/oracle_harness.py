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
    """Sort columns by name and rows by all columns (order-insensitive).

    Datetime columns are normalized to microsecond resolution: Spark
    collects ns-unit datetimes, DuckDB µs — with mixed units (and NaT
    present) pandas' exact comparison degrades to raw int64s and reports
    equal values as different. All engine data is µs-precision, so the
    cast is lossless.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> None:
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(oracle_df)
    # The driver hashes the CSV repr, so an int64-vs-float64 dtype skew
    # (e.g. DuckDB HUGEINT promotion) fails there even when values
    # compare equal — replicate that strictness here (caught live on
    # q160: oracle returned 399759.0 vs Spark 399759).
    import hashlib

    h_got = hashlib.sha256(got.to_csv(index=False).encode()).hexdigest()
    h_want = hashlib.sha256(want.to_csv(index=False).encode()).hexdigest()
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
    assert h_got == h_want, (
        f"{name}: values equal but CSV hash differs (dtype repr skew — "
        f"dtypes spark={dict(got.dtypes.astype(str))} "
        f"oracle={dict(want.dtypes.astype(str))})"
    )
