"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The contract for image/audio/video at 100 TB: the payload is an opaque
``binary`` column; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (one Python worker per partition, whole-column batches —
never a row-at-a-time UDF); metadata travels in typed columns next to
the blob so filters/pruning stay JVM-side.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_image``/``sample_frames`` take an injected ``decoder``/
``sampler`` callable (default ``None`` raises NotImplementedError with
the integration point documented); everything Spark-side — schema,
batching, partitioning, UDF signatures, deterministic feature math — is
real and exercised in tests through deterministic fake codecs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
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


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("blob_id", LongType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("pixels", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("blob_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts", DoubleType()),
        StructField("frame", BinaryType()),
    ]
)


def decode_image(
    blobs: DataFrame,
    target_size: tuple[int, int] = (224, 224),
    decoder=None,
) -> DataFrame:
    """Image decode/resize to fixed-size float arrays — codec injected.

    ``decoder(payload: bytes, target_size) -> (height, width,
    list[float])`` is the only codec-specific piece; everything
    Spark-side (Arrow-batched mapInPandas, output schema, map-only
    no-shuffle plan) is real and runs in tests via a deterministic fake
    decoder. The container ships no image codecs, so the default
    ``decoder=None`` raises with the integration point documented —
    wire PIL/turbojpeg here in a real deployment.
    """
    if decoder is None:
        raise NotImplementedError(
            "image codecs are not available in this environment; pass "
            "decoder= (e.g. PIL-based) into the mapInPandas plumbing "
            "(multimodal/binary.py)"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                h, w, px = decoder(bytes(r.content), target_size)
                out.append(
                    {"blob_id": r.blob_id, "height": h, "width": w, "pixels": px}
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODED_IMAGE_SCHEMA.fields]
            )

    return spread(blobs).mapInPandas(run, schema=DECODED_IMAGE_SCHEMA)


def sample_frames(
    blobs: DataFrame,
    every_n_seconds: float = 1.0,
    sampler=None,
) -> DataFrame:
    """Video frame sampling (one row per sampled frame) — codec injected.

    ``sampler(payload: bytes, every_n_seconds) -> iterable[(frame_idx,
    frame_ts, frame_bytes)]`` is the codec hook (ffmpeg/pyav in a real
    deployment); the Spark side explodes each video blob into frame rows
    inside mapInPandas, keeping partitioning by blob so one worker
    decodes one video at a time. Default ``sampler=None`` raises: no
    video codecs ship in this container.
    """
    if sampler is None:
        raise NotImplementedError(
            "video codecs are not available in this environment; pass "
            "sampler= — the frame sampler plugs into the mapInPandas "
            "pattern (multimodal/binary.py)"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                for idx, ts, frame in sampler(bytes(r.content), every_n_seconds):
                    out.append(
                        {
                            "blob_id": r.blob_id,
                            "frame_idx": idx,
                            "frame_ts": ts,
                            "frame": frame,
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return spread(blobs).mapInPandas(run, schema=FRAME_SCHEMA)
