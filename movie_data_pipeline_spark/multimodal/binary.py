"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The contract for image/audio/video at 100 TB: the payload is an opaque
``binary`` column; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (one Python worker per partition, whole-column batches —
never a row-at-a-time UDF); metadata travels in typed columns next to
the blob so filters/pruning stay JVM-side.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_image``/``sample_frames`` are STUBS raising NotImplementedError
with the integration point documented; everything Spark-side — schema,
batching, partitioning, UDF signatures, deterministic feature math — is
real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from movie_data_pipeline_spark.operators.util import spread

BLOB_SCHEMA = StructType(
    [
        StructField("blob_id", LongType()),
        StructField("modality", StringType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("blob_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_entropy", DoubleType()),
    ]
)


def make_blob_table(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text",
    modality: str = "text",
) -> DataFrame:
    """Wrap any column as an opaque-blob table (UTF-8 encode for text;
    image/audio ingestion would land bytes here unchanged)."""
    content = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("blob_id"),
        F.lit(modality).alias("modality"),
        content.alias("content"),
        F.lit(f"{modality}/plain").alias("media_type"),
        F.octet_length(content).cast("long").alias("n_bytes"),
    )


def blob_features(blobs: DataFrame, batch_hint: int = 0) -> DataFrame:
    """Deterministic per-blob features via Arrow-batched mapInPandas:
    size, md5 digest, byte mean, byte entropy.

    This is the real scale plumbing a decoder would use — same
    signature, same batch shape; only the inner numpy math would become
    a codec call. No shuffle: map-only over the blob partitions.
    """

    def extract(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                buf = bytes(r.content)
                arr = np.frombuffer(buf, dtype=np.uint8)
                if arr.size:
                    counts = np.bincount(arr, minlength=256)
                    p = counts[counts > 0] / arr.size
                    entropy = float(-(p * np.log2(p)).sum())
                    mean = float(arr.mean())
                else:
                    entropy, mean = 0.0, 0.0
                out.append(
                    {
                        "blob_id": r.blob_id,
                        "n_bytes": len(buf),
                        "digest": hashlib.md5(buf).hexdigest(),
                        "byte_mean": mean,
                        "byte_entropy": entropy,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return spread(blobs).mapInPandas(extract, schema=FEATURE_SCHEMA)


def decode_image(blobs: DataFrame, target_size: tuple[int, int] = (224, 224)) -> DataFrame:
    """STUB — image decode/resize to fixed-size float arrays.

    Integration point: replace ``_decode`` with PIL/turbojpeg inside the
    same mapInPandas shape as :func:`blob_features` (schema:
    blob_id LONG, pixels ARRAY<FLOAT>, height INT, width INT). The
    container ships no image codecs, so this raises by design.
    """
    raise NotImplementedError(
        "image codecs are not available in this environment; wire a "
        "decoder into the blob_features mapInPandas pattern "
        "(multimodal/binary.py)"
    )


def sample_frames(blobs: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """STUB — video frame sampling (one row per sampled frame).

    Integration point: ffmpeg/pyav inside mapInPandas, exploding each
    video blob into (blob_id, frame_idx, frame_ts, frame binary) rows;
    partitioning stays by blob so one worker decodes one video at a
    time. Raises by design in this environment.
    """
    raise NotImplementedError(
        "video codecs are not available in this environment; wire a "
        "frame sampler into the mapInPandas pattern (multimodal/binary.py)"
    )
