"""Query catalog: every operator from SURVEY.md §2 plus the LLM-pipeline
extensions, each exposed as a named (Spark builder, DuckDB oracle SQL)
pair consumed by ``__spark_entry__.py``.

Importing this package populates the registry.
"""

from movie_data_pipeline_spark.plans.core import REGISTRY, QuerySpec, query  # noqa: F401

# Side-effect imports: each module registers its queries.
from movie_data_pipeline_spark.plans import relational  # noqa: E402,F401
from movie_data_pipeline_spark.plans import dedup  # noqa: E402,F401
from movie_data_pipeline_spark.plans import text  # noqa: E402,F401
from movie_data_pipeline_spark.plans import similarity  # noqa: E402,F401
from movie_data_pipeline_spark.plans import multimodal  # noqa: E402,F401
from movie_data_pipeline_spark.plans import advanced  # noqa: E402,F401
from movie_data_pipeline_spark.plans import analytic  # noqa: E402,F401
from movie_data_pipeline_spark.plans import curation  # noqa: E402,F401
from movie_data_pipeline_spark.plans import behavior  # noqa: E402,F401
from movie_data_pipeline_spark.plans import corpus  # noqa: E402,F401
from movie_data_pipeline_spark.plans import ml  # noqa: E402,F401
from movie_data_pipeline_spark.plans import sketches  # noqa: E402,F401
from movie_data_pipeline_spark.plans import streaming_replay  # noqa: E402,F401
