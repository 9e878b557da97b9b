"""Multimodal query: the Arrow-batched mapInPandas feature path over
blob columns, oracle-checked (the fake 'decode' computes byte stats the
oracle reproduces in SQL — integer byte sums are exact in float64, so
values match bit-for-bit before quantization)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_pipeline_spark.multimodal.binary import blob_features, make_blob_table
from movie_data_pipeline_spark.plans.core import query, r4, round4
from movie_data_pipeline_spark.sources.registry import load_table


@query(
    "q27_blob_features",
    oracle=f"""
    SELECT doc_id AS blob_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           {r4("list_sum(list_transform(generate_series(1, length(text)), i -> ascii(substr(text, i, 1)))) * 1.0 / strlen(text)")} AS byte_mean
    FROM documents
    ORDER BY blob_id
    """,
    tags=("extension", "multimodal", "pandas-udf"),
)
def q27_blob_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → opaque binary blobs → mapInPandas feature extraction.

    Exercises the full multimodal plumbing (binary column, Arrow
    batches, per-partition Python worker); a real image/audio decoder
    drops into the same operator shape (multimodal/binary.py). Entropy
    is computed too but projected out here (not cheaply
    SQL-expressible).
    """
    docs = load_table(spark, sf_dir, "documents")
    blobs = make_blob_table(docs)
    feats = blob_features(blobs)
    return feats.select(
        "blob_id",
        "n_bytes",
        "digest",
        round4(F.col("byte_mean")).alias("byte_mean"),
    ).orderBy("blob_id")
