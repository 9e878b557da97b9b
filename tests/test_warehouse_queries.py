"""The 7 documented README queries, run through Spark SQL on a
warehouse built from fixture CSVs, cross-checked value-for-value
against DuckDB over the same written parquet — end-to-end parity of the
reference's whole analytics surface (SURVEY.md §2 A-series, P11, O-series).
"""

from __future__ import annotations

import duckdb
import pytest

from movie_data_pipeline_spark.pipeline.movies_etl import (
    build_warehouse,
    write_warehouse,
    WAREHOUSE_TABLES,
)
from movie_data_pipeline_spark.pipeline.queries import (
    WAREHOUSE_ORACLE_SQL,
    WAREHOUSE_QUERY_NAMES,
    run_warehouse_query,
)
from movie_data_pipeline_spark.sources.movielens import (
    read_links,
    read_movies,
    read_ratings,
)
from tests.oracle_harness import compare
from tests.test_movies_etl import ENRICH_ROWS, FIXTURE_DIR


@pytest.fixture(scope="module")
def warehouse_dir(spark, tmp_path_factory):
    from movie_data_pipeline_spark.pipeline.enrichment import ENRICHMENT_SCHEMA

    out = str(tmp_path_factory.mktemp("warehouse"))
    enrichment = spark.createDataFrame(ENRICH_ROWS, ENRICHMENT_SCHEMA)
    wh, _ = build_warehouse(
        spark,
        read_movies(spark, FIXTURE_DIR),
        read_ratings(spark, FIXTURE_DIR),
        read_links(spark, FIXTURE_DIR),
        enrichment,
        api_request_limit=6,
    )
    write_warehouse(wh, out)
    # register the *written* tables so Spark and DuckDB read identical data
    for name in WAREHOUSE_TABLES:
        spark.read.parquet(f"{out}/{name}").createOrReplaceTempView(name)
    return out


@pytest.fixture(scope="module")
def wh_con(warehouse_dir):
    con = duckdb.connect()
    for name in WAREHOUSE_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{warehouse_dir}/{name}/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", WAREHOUSE_QUERY_NAMES)
def test_readme_query_matches_duckdb(spark, warehouse_dir, wh_con, name):
    got = run_warehouse_query(spark, name)
    want = wh_con.execute(WAREHOUSE_ORACLE_SQL[name]).df()
    compare(got, want, name)


def test_movies_by_genre_semantics(spark, warehouse_dir):
    rows = run_warehouse_query(spark, "movies_by_genre").collect()
    # the reference's WHERE-before-GROUP_CONCAT means the concat holds
    # only the filtered genre
    assert rows and all(r.genres == "Action" for r in rows)
