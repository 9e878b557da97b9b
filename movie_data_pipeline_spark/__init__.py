"""movie_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ``pradeepsoftdev04/movie-data-pipeline`` (a pandas/SQL batch
ETL over MovieLens data; see SURVEY.md), extended with the operators a
large-scale LLM-training-data pipeline needs: deduplication (exact, MinHash
LSH, SimHash, n-gram Jaccard), similarity search over embeddings, text
analysis, and multimodal-column plumbing.

Design principles (see SURVEY.md §4, §7):

- Declarative DataFrame / Spark SQL plans; Catalyst chooses the physical
  strategy (broadcast vs sort-merge joins, partial aggregation, top-k via
  TakeOrderedAndProject, AQE skew handling).
- Explicit schemas everywhere — no inference scans at 100 TB.
- Built-in ``pyspark.sql.functions`` column expressions in hot paths; Pandas
  UDFs only where built-ins genuinely cannot express the semantics.
- No ``collect()``-driven control flow inside operators.
"""

__version__ = "0.1.0"

from movie_data_pipeline_spark.session import get_spark  # noqa: F401
