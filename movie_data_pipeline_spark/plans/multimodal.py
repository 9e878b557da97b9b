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



# --------------------------------------------------------------------------
# q122 — multimodal dataset manifest (per-source blob accounting)
# --------------------------------------------------------------------------
@query(
    "q122_blob_manifest",
    oracle="""
    SELECT source AS modality_group,
           COUNT(*) AS n_blobs,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(MIN(strlen(text)) AS BIGINT) AS min_bytes,
           CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes,
           floor((CAST(SUM(strlen(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS avg_bytes
    FROM documents
    GROUP BY source
    ORDER BY modality_group
    """,
    tags=("extension", "multimodal", "manifest"),
)
def q122_blob_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset manifest over the blob table: per source group, blob
    count and byte-size distribution — the accounting every multimodal
    ingest job emits before training (shard planning, cost estimates,
    outlier detection on max_bytes).

    Runs on the binary column itself (octet_length of the blob), not on
    a separate metadata table — the blob table IS the source of truth.
    Pure JVM aggregate over binary lengths: no Python workers, no blob
    bytes ever shuffled (only lengths reach the aggregate). The oracle
    mirrors blobs as the text bytes they were built from (strlen ==
    octet_length for this ASCII corpus — the same identity
    make_blob_table relies on).
    """
    docs = load_table(spark, sf_dir, "documents")
    blobs = make_blob_table(docs)  # blob_id, modality, content, n_bytes
    src = docs.select(F.col("doc_id").alias("blob_id"), "source")
    sized = blobs.join(F.broadcast(src), "blob_id").select(
        F.col("source").alias("modality_group"),
        F.col("n_bytes").alias("nb"),
    )
    return (
        sized.groupBy("modality_group")
        .agg(
            F.count("*").alias("n_blobs"),
            F.sum("nb").cast("long").alias("total_bytes"),
            F.min("nb").cast("long").alias("min_bytes"),
            F.max("nb").cast("long").alias("max_bytes"),
            round4(
                F.sum("nb").cast("double") / F.count("*").cast("double")
            ).alias("avg_bytes"),
        )
        .orderBy("modality_group")
    )


# --------------------------------------------------------------------------
# q123 — blob shard assignment (size-budgeted sequential sharding)
# --------------------------------------------------------------------------
_SHARD_BYTES = 4096


@query(
    "q123_blob_shards",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id AS blob_id, CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents),
    runsum AS (
      SELECT blob_id, n_bytes,
             SUM(n_bytes) OVER (ORDER BY blob_id ROWS UNBOUNDED PRECEDING)
               AS cum_bytes
      FROM sized)
    SELECT blob_id, n_bytes,
           CAST((cum_bytes - n_bytes) // {_SHARD_BYTES} AS BIGINT) AS shard_id,
           CAST(cum_bytes AS BIGINT) AS cum_bytes
    FROM runsum
    ORDER BY blob_id
    """,
    tags=("extension", "multimodal", "sharding"),
)
def q123_blob_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign blobs to ~4 KiB shards by running byte budget in stable
    blob_id order — the WebDataset/TFRecord shard-manifest shape
    (training loaders want shards of bounded bytes, assignment must be
    reproducible across runs and reshards).

    shard_id = floor(bytes-before-me / budget): a distributed
    prefix-sum (``operators/prefix.py``: range-partition on blob_id,
    local running sums, broadcast partition offsets) computes it
    without a sequential loop or a single-partition window; shards can
    only split AFTER an oversized blob (never mid-blob), and appending
    new blobs never reassigns existing ones (same contract as
    q39/q106 sampling). The greedy bin-packing alternative that also
    respects a count budget is q72's applyInPandas fold.
    """
    from movie_data_pipeline_spark.operators.prefix import attach_running_sums

    docs = load_table(spark, sf_dir, "documents")
    sized = make_blob_table(docs).select("blob_id", "n_bytes")
    summed, _ = attach_running_sums(
        sized, ["blob_id"], {"cum_bytes": F.col("n_bytes")}
    )
    return (
        summed
        .select(
            "blob_id",
            "n_bytes",
            F.floor(
                (F.col("cum_bytes") - F.col("n_bytes")) / F.lit(_SHARD_BYTES)
            )
            .cast("long")
            .alias("shard_id"),
            F.col("cum_bytes").cast("long").alias("cum_bytes"),
        )
        .orderBy("blob_id")
    )
