"""The reference's documented analytics surface (README.md:528-601,
675-687) as Spark SQL over the warehouse views, with the two dialect
fixes SURVEY.md §3 calls out:

- MySQL ``GROUP_CONCAT`` → sorted ``array_join(collect_list(...))``
  (MySQL's element order is nondeterministic; we sort for stable
  results);
- MySQL's lax ``GROUP BY m.movie_id`` with non-grouped SELECT columns →
  full grouping keys.

Each query returns a DataFrame; ``WAREHOUSE_ORACLE_SQL`` carries the
DuckDB-equivalent text used by tests to cross-check every query on a
warehouse built from fixture CSVs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# name -> (spark_sql, duckdb_sql); identical where the dialects agree.
_QUERIES: dict[str, tuple[str, str]] = {}


def _q(name: str, spark_sql: str, duck_sql: str | None = None) -> None:
    _QUERIES[name] = (spark_sql, duck_sql or spark_sql)


# Top 10 Highest Rated Movies (README.md:533-541) + movie_id tiebreak
# for determinism (the reference's bare LIMIT is order-ambiguous on
# rating ties).
_q(
    "top_rated_movies",
    """
    SELECT title, imdb_rating, release_year, director
    FROM movies
    WHERE imdb_rating IS NOT NULL
    ORDER BY imdb_rating DESC, title
    LIMIT 10
    """,
)

# Movies by Genre (README.md:545-556): the reference filters the join to
# 'Action' rows BEFORE GROUP_CONCAT, so the concat contains only the
# filtered genre — kept faithfully. GROUP_CONCAT → sorted array_join;
# non-grouped SELECT columns added to GROUP BY; ORDER BY added because
# a bare LIMIT 20 is row-nondeterministic (SURVEY §2.6 O2).
_q(
    "movies_by_genre",
    """
    SELECT m.title, m.release_year,
           array_join(sort_array(collect_list(g.genre_name)), ',') AS genres
    FROM movies m
    JOIN movie_genres mg ON m.movie_id = mg.movie_id
    JOIN genres g ON mg.genre_id = g.genre_id
    WHERE g.genre_name = 'Action'
    GROUP BY m.movie_id, m.title, m.release_year
    ORDER BY m.title
    LIMIT 20
    """,
    """
    SELECT m.title, m.release_year,
           string_agg(g.genre_name, ',' ORDER BY g.genre_name) AS genres
    FROM movies m
    JOIN movie_genres mg ON m.movie_id = mg.movie_id
    JOIN genres g ON mg.genre_id = g.genre_id
    WHERE g.genre_name = 'Action'
    GROUP BY m.movie_id, m.title, m.release_year
    ORDER BY m.title
    LIMIT 20
    """,
)

# Most Rated Movies (README.md:560-572).
_q(
    "most_rated_movies",
    """
    SELECT m.title, m.release_year,
           COUNT(r.rating_id) AS rating_count,
           floor(AVG(r.rating) * 10000 + 0.5) / 10000 AS avg_user_rating,
           m.imdb_rating
    FROM movies m JOIN ratings r ON m.movie_id = r.movie_id
    GROUP BY m.movie_id, m.title, m.release_year, m.imdb_rating
    ORDER BY rating_count DESC, m.title
    LIMIT 10
    """,
)

# Movies by Director (README.md:576-587).
_q(
    "movies_by_director",
    """
    SELECT director,
           COUNT(*) AS movie_count,
           floor(AVG(imdb_rating) * 10000 + 0.5) / 10000 AS avg_rating
    FROM movies
    WHERE director IS NOT NULL AND director != 'N/A'
    GROUP BY director
    HAVING COUNT(*) >= 3
    ORDER BY avg_rating DESC, director
    LIMIT 20
    """,
)

# Average Rating by User (README.md:591-601); HAVING threshold kept.
_q(
    "avg_rating_by_user",
    """
    SELECT user_id,
           COUNT(*) AS rating_count,
           floor(AVG(rating) * 10000 + 0.5) / 10000 AS avg_rating
    FROM ratings
    GROUP BY user_id
    HAVING COUNT(*) > 100
    ORDER BY avg_rating DESC, user_id
    LIMIT 10
    """,
)

# Data-quality null probe (README.md:675-681).
_q(
    "movies_null_probe",
    """
    SELECT COUNT(*) AS total_movies,
           COUNT(CASE WHEN imdb_id IS NULL THEN 1 END) AS missing_imdb_id,
           COUNT(CASE WHEN director IS NULL THEN 1 END) AS missing_director
    FROM movies
    """,
)

# Rating histogram (README.md:684-687).
_q(
    "rating_distribution",
    """
    SELECT rating, COUNT(*) AS count
    FROM ratings
    GROUP BY rating
    ORDER BY rating
    """,
)

WAREHOUSE_QUERY_NAMES = tuple(_QUERIES)
WAREHOUSE_ORACLE_SQL = {name: duck for name, (_, duck) in _QUERIES.items()}


def run_warehouse_query(spark: SparkSession, name: str) -> DataFrame:
    """Run a documented query against the registered warehouse views."""
    return spark.sql(_QUERIES[name][0])
