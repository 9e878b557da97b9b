"""Reference-parity tests for the MovieLens pipeline on fixture CSVs
covering every FIXTURES.md edge case: trailing articles (all 6),
parenthesized foreign titles (article inside parens), no-year titles,
4-digit title that IS a year-suffixed number, embedded commas, accented
characters, the genre sentinel, dirty rating rows, short imdbIds.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from movie_data_pipeline_spark.functions.titles import (
    clean_title,
    imdb_tt_id,
    normalize_title,
    release_year,
)
from movie_data_pipeline_spark.pipeline.enrichment import enrich_movies
from movie_data_pipeline_spark.pipeline.movies_etl import (
    build_genres,
    build_movie_genres,
    build_warehouse,
    transform_movies,
    transform_ratings,
)
from movie_data_pipeline_spark.sources.movielens import (
    read_links,
    read_movies,
    read_ratings,
)
from tests import reference_oracle

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "movielens")


@pytest.fixture(scope="module")
def movies_raw(spark):
    return read_movies(spark, FIXTURE_DIR)


@pytest.fixture(scope="module")
def links_raw(spark):
    return read_links(spark, FIXTURE_DIR)


@pytest.fixture(scope="module")
def ratings_raw(spark):
    return read_ratings(spark, FIXTURE_DIR)


def test_title_expressions_match_reference_semantics(spark, movies_raw):
    """Column expressions == the reference's python, title by title."""
    got = movies_raw.select(
        "title",
        release_year(F.col("title")).alias("y"),
        clean_title(F.col("title")).alias("ct"),
        normalize_title(clean_title(F.col("title"))).alias("nt"),
    ).collect()
    assert len(got) == 18
    for r in got:
        exp_year, exp_clean = reference_oracle.extract_year_from_title(r.title)
        assert r.y == exp_year, r.title
        assert r.ct == exp_clean, r.title
        assert r.nt == reference_oracle.normalize_title(exp_clean), r.title


def test_title_edge_cases(spark, movies_raw):
    rows = {
        r.movieId: r
        for r in transform_movies(movies_raw)
        .withColumn("norm", normalize_title(F.col("clean_title")))
        .collect()
    }
    assert rows[2].norm == "The Shawshank Redemption"
    assert rows[3].norm == "The City of Lost Children"
    assert rows[4].norm == "Shanghai Triad"
    assert rows[5].norm == "An American President"
    assert rows[6].norm == "La Haine"
    assert rows[7].norm == "Les Misérables"
    assert rows[10].release_year is None  # no year suffix
    assert rows[10].clean_title == "Cloverfield Paradox"
    assert rows[11].release_year == 1956 and rows[11].clean_title == "1984"
    assert rows[12].clean_title == "Movie with, comma"
    assert rows[13].norm == "A Boy Named Charlie Brown"
    assert rows[14].norm == "Amélie"
    assert rows[8].clean_title == "2001: A Space Odyssey"


def test_imdb_tt_formatting(spark, links_raw):
    got = {
        r.movieId: r.tt
        for r in links_raw.select(
            "movieId", imdb_tt_id(F.col("imdbId")).alias("tt")
        ).collect()
    }
    assert got[1] == "tt0114709"  # zero-padded (CSV int loses the 0)
    assert got[8] == "tt0062622"
    assert got[9] == "tt1856101"  # already 7 digits


def test_genres_dimension(spark, movies_raw):
    movies = transform_movies(movies_raw)
    genres = build_genres(movies).orderBy("genre_id").collect()
    names = [g.genre_name for g in genres]
    # sentinel survives the split whole and sorts first (parenthesis)
    assert names[0] == "(no genres listed)"
    assert names == sorted(names)
    assert [g.genre_id for g in genres] == list(range(1, len(names) + 1))
    bridge = build_movie_genres(movies, build_genres(movies))
    # movie 1 has 5 genres; total pairs = sum of per-movie token counts
    assert bridge.filter("movie_id = 1").count() == 5
    assert bridge.count() == 43
    assert bridge.distinct().count() == bridge.count()


def test_transform_ratings_dirty_rows(spark, ratings_raw):
    out = transform_ratings(ratings_raw).collect()
    # 16 raw rows: 3 dropped (bad userId, empty movieId, empty rating)
    assert len(out) == 13
    by_id = {r.rating_id: r for r in out}
    # rating_id is the (user_id, movie_id) rank, 1-based and dense
    assert sorted(by_id) == list(range(1, 14))
    first = by_id[1]
    assert (first.user_id, first.movie_id) == (1, 1)
    # non-numeric timestamp kept as null (only keys force drops)
    assert [r.timestamp for r in out if r.user_id == 4] == [None]


ENRICH_ROWS = [
    # norm_title, year, imdb_id, director, plot, box_office, imdb_rating, runtime
    ("Toy Story", 1995, "tt0114709", "John Lasseter", "Toys come alive.", "$191,796,233", "8.3", "81 min"),
    # wrong year → only the Title Only strategy can match movie 2
    ("The Shawshank Redemption", 1950, "tt0111161", "Frank Darabont", "Hope.", "$16,000,000", "9.3", "142 min"),
    # no title row for movie 3; reachable only via links imdb id
    ("__unmatchable__", 1900, "tt0112682", "Jean-Pierre Jeunet", "Dreams.", "N/A", "7.5", "112 min"),
    # movie 5: N/A sentinel fields must coerce/display like the reference
    ("An American President", 1995, "tt0112346", "N/A", "Politics.", "N/A", "N/A", "106 min"),
]


@pytest.fixture(scope="module")
def enrichment(spark):
    from movie_data_pipeline_spark.pipeline.enrichment import ENRICHMENT_SCHEMA

    return spark.createDataFrame(ENRICH_ROWS, ENRICHMENT_SCHEMA)


def test_enrichment_strategies(spark, movies_raw, links_raw, enrichment):
    movies = transform_movies(movies_raw)
    enriched, missing = enrich_movies(movies, links_raw, enrichment, api_request_limit=6)
    rows = {r.movieId: r for r in enriched.collect()}
    assert rows[1].director == "John Lasseter"  # Title+Year
    assert rows[2].director == "Frank Darabont"  # Title Only (year mismatch)
    assert rows[3].director == "Jean-Pierre Jeunet"  # IMDb ID fallback
    assert rows[5].imdb_rating == "N/A"  # raw string until finalize
    assert rows[7].director is None  # beyond the budget → untouched
    miss = missing.collect()
    # budget movies 4 and 6 match nothing → missing log, 10 columns
    assert sorted(m.movie_id for m in miss) == [4, 6]
    m4 = next(m for m in miss if m.movie_id == 4)
    assert m4.original_title == "Shanghai Triad (Yao a yao yao dao waipo qiao) (1995)"
    assert m4.imdb_id_available == "Yes" and m4.imdb_id == "tt0113101"
    assert m4.strategies_attempted == "Title+Year,Title Only,IMDb ID"
    assert len(m4.asDict()) == 10


def test_build_warehouse_offline_and_enriched(
    spark, movies_raw, ratings_raw, links_raw, enrichment
):
    wh, missing = build_warehouse(
        spark, movies_raw, ratings_raw, links_raw, enrichment, api_request_limit=6
    )
    movies = wh.movies.collect()
    assert len(movies) == 18
    m5 = next(m for m in movies if m.movie_id == 5)
    assert m5.imdb_rating is None  # 'N/A' coerced to null (P7)
    assert m5.director == "N/A"  # strings keep the sentinel
    m1 = next(m for m in movies if m.movie_id == 1)
    assert m1.title == "Toy Story" and m1.imdb_rating == 8.3
    assert m1.created_at is not None
    # offline mode: no enrichment, no missing rows, same table shapes
    wh2, missing2 = build_warehouse(spark, movies_raw, ratings_raw, links_raw, None)
    assert missing2.count() == 0
    assert wh2.movies.filter("imdb_id IS NOT NULL").count() == 0
    assert wh2.movies.count() == 18


def test_links_missing_file_fallback(spark, tmp_path, movies_raw):
    empty = read_links(spark, str(tmp_path))  # no links.csv here
    assert empty.count() == 0
    movies = transform_movies(movies_raw)
    enriched, missing = enrich_movies(movies, empty, None, api_request_limit=5)
    assert enriched.count() == 18


def test_anti_join_movies_without_links(spark, movies_raw, links_raw):
    missing_links = (
        transform_movies(movies_raw)
        .join(links_raw, "movieId", "left_anti")
        .select("movieId")
        .orderBy("movieId")
        .collect()
    )
    assert [r.movieId for r in missing_links] == [17, 18]
