from movie_data_pipeline_spark.pipeline.movies_etl import (  # noqa: F401
    build_genres,
    build_movie_genres,
    build_warehouse,
    transform_movies,
    transform_ratings,
    write_warehouse,
    write_warehouse_jdbc,
)
