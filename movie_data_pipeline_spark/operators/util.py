"""Small operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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


def fixed_sample(df: DataFrame, id_col: str, target: int) -> DataFrame:
    """Deterministic FIXED-SIZE md5-bucket sample: keep rows whose
    32-bit md5 bucket of ``id_col`` satisfies ``bucket % m == 0`` with
    ``m = max(1, n // target)`` — so the sample stays ~``target`` rows
    at ANY corpus size, and the registered plan that consumes it can
    never go quadratic with the corpus (the q256/q248 discipline that
    graduated them off the r7 scale-killer list).

    Contract (shared by :func:`fixed_sample_ctes`, the oracle side):
    - ``n`` is a driver-side scalar count (the codebook-collect
      pattern — one constant-size action, never a per-row collect);
    - at ``n < 2 * target`` the modulus degenerates to 1 and the frame
      is returned UNTOUCHED, so small-SF driver hashes are
      bit-identical to the unsampled answer;
    - membership depends only on the id value — reproducible across
      engines, runs, partitionings, and parquet layouts.
    """
    n = df.count()
    m = max(1, n // target)
    if m == 1:
        return df
    bucket = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        % m
    )
    return df.filter(bucket == 0)


def fixed_sample_ctes(
    table: str, id_col: str, target: int, alias: str
) -> str:
    """DuckDB-oracle twin of :func:`fixed_sample`: two CTE bodies
    (``{alias}_m`` computing the modulus, ``{alias}`` the filtered
    rows) that evaluate the identical md5-bucket rule, so the sampled
    Spark plan and its oracle select the exact same rows. Splice into
    a ``WITH`` list; ``table`` may itself be an earlier CTE.
    """
    return f"""{alias}_m AS (
      SELECT GREATEST(1, (SELECT COUNT(*) FROM {table}) // {target})
        AS m),
    {alias} AS (
      SELECT t.* FROM {table} t CROSS JOIN {alias}_m
      WHERE CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))
                 AS BIGINT) % m = 0)"""
