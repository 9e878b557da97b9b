"""Small operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Ensure CPU-heavy narrow work downstream can use the cluster.

    A small source (one parquet file) arrives as a single partition, so
    per-row-expensive operators (shingling, hashing, per-char folds)
    would run on one core. Repartition round-robin to the session's
    default parallelism — but only when the input has materially fewer
    partitions, so at real scale (inputs already split into thousands of
    tasks) this is a no-op and adds no shuffle.
    """
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:
        # Environments without RDD access (e.g. Spark Connect): leave
        # the partitioning to the source — correctness is unaffected.
        return df
    if current * min_factor <= target:
        return df.repartition(target)
    return df
