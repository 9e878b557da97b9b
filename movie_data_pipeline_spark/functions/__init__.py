from movie_data_pipeline_spark.functions.titles import (  # noqa: F401
    clean_title,
    imdb_tt_id,
    normalize_title,
    release_year,
)
