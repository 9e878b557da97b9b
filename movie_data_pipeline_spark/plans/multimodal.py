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


# --------------------------------------------------------------------------
# q133 — image-header metadata extraction, closed-form oracle
# --------------------------------------------------------------------------
@query(
    "q133_image_metadata",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id AS blob_id,
             CAST(doc_id % 1000 + 16 AS INTEGER) AS width,
             CAST(doc_id % 700 + 9 AS INTEGER) AS height
      FROM documents)
    SELECT blob_id, 'png' AS img_format, width, height,
           {r4('width * height / 1000000.0')} AS megapixels,
           CASE WHEN width >= 256 AND height >= 256 THEN true ELSE false END
             AS train_eligible
    FROM dims ORDER BY blob_id
    """,
    tags=("extension", "multimodal", "image-metadata"),
)
def q133_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image metadata extraction, end to end and REAL on the Spark
    side: every document id is turned into an actual PNG byte stream
    (signature + IHDR, dimensions encoded big-endian via
    hex/unhex — all codegen), then ``image_header_expr`` parses the
    binary back and the size filter a training pipeline runs
    (``width/height >= 256``) is evaluated on the parsed columns.

    The oracle is the closed form of the same dimensions — it never
    parses bytes, so any error in the byte construction OR the header
    parser breaks the hash. This is the q27 pattern (fake decode,
    real plumbing) upgraded to a real format: the JVM-only parse path
    is also plan-asserted in tests/test_multimodal.py, and real PNG /
    GIF / BMP / JPEG fixtures are parsed in the same test file.

    Scale: construction + parse + filter all live in one codegen
    stage over a scan — blob metadata never needs a Python worker or
    a decoder, which is exactly why size/format pruning belongs
    BEFORE any decode stage at 100 TB.
    """
    from movie_data_pipeline_spark.multimodal.binary import image_header_expr

    docs = load_table(spark, sf_dir, "documents")
    w = (F.col("doc_id") % 1000 + 16).cast("int")
    h = (F.col("doc_id") % 700 + 9).cast("int")

    def be4(col):
        return F.unhex(F.lpad(F.hex(col), 8, "0"))

    png = F.concat(
        F.lit(bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])),
        be4(F.lit(13)),
        F.lit(b"IHDR"),
        be4(w),
        be4(h),
        F.lit(bytes([8, 2, 0, 0, 0])),
    )
    blobs = docs.select(F.col("doc_id").alias("blob_id"), png.alias("content"))
    parsed = blobs.select(
        "blob_id", image_header_expr(F.col("content")).alias("hd")
    )
    return (
        parsed.select(
            "blob_id",
            F.col("hd.img_format").alias("img_format"),
            F.col("hd.width").alias("width"),
            F.col("hd.height").alias("height"),
            round4(
                F.col("hd.width") * F.col("hd.height") / F.lit(1000000.0)
            ).alias("megapixels"),
            ((F.col("hd.width") >= 256) & (F.col("hd.height") >= 256)).alias(
                "train_eligible"
            ),
        )
        .orderBy("blob_id")
    )


# --------------------------------------------------------------------------
# q222 — frame-sample manifest (video-style stride sampling plan)
# --------------------------------------------------------------------------
_FRAME_BYTES = 64  # fake fixed-size frame: n_frames = n_bytes // 64
_FRAME_STRIDE = 8  # keep every 8th frame


@query(
    "q222_frame_sample_manifest",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id AS blob_id, CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents),
    frames AS (
      SELECT blob_id, n_bytes, n_bytes // {_FRAME_BYTES} AS n_frames
      FROM sized
      WHERE n_bytes // {_FRAME_BYTES} > 0)
    SELECT blob_id,
           CAST(unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT),
                                       {_FRAME_STRIDE})) AS BIGINT)
             AS frame_idx,
           CAST(unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT),
                                       {_FRAME_STRIDE}))
                * {_FRAME_BYTES} AS BIGINT) AS byte_offset,
           CAST(n_frames AS BIGINT) AS n_frames
    FROM frames
    ORDER BY blob_id, frame_idx
    """,
    tags=("extension", "multimodal", "frame-sampling"),
)
def q222_frame_sample_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stride frame-sampling plan for video-style blobs: treating each
    blob as a sequence of fixed-size frames (n_bytes // frame_size —
    the synthetic stand-in for a container index; a real pipeline reads
    the real index the same metadata-only way), emit the (blob_id,
    frame_idx, byte_offset) manifest of every 8th frame — the WORK LIST
    a decode stage consumes. This is the relational half of
    frame-sampling at 100 TB: the sampling plan is sequence+explode in
    codegen over per-blob integers (blob BYTES are never touched, never
    shuffled); only the manifest's chosen offsets are handed to the
    Arrow-batched decode UDF (stubbed in multimodal/binary.py, like the
    image codec), which then does range reads instead of full-blob
    scans.
    """
    docs = load_table(spark, sf_dir, "documents")
    blobs = make_blob_table(docs).select("blob_id", "n_bytes")
    frames = blobs.select(
        "blob_id",
        (F.col("n_bytes") / F.lit(_FRAME_BYTES))
        .cast("long")
        .alias("n_frames"),
    ).filter(F.col("n_frames") > 0)
    idx = F.explode(
        F.sequence(
            F.lit(0).cast("long"),
            F.col("n_frames") - 1,
            F.lit(_FRAME_STRIDE).cast("long"),
        )
    ).alias("frame_idx")
    return (
        frames.select("blob_id", "n_frames", idx)
        .select(
            "blob_id",
            "frame_idx",
            (F.col("frame_idx") * _FRAME_BYTES).alias("byte_offset"),
            "n_frames",
        )
        .orderBy("blob_id", "frame_idx")
    )
