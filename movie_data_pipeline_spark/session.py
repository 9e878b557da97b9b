"""SparkSession factory tuned for this engine.

Local-mode settings mirror what we would set on a real cluster: AQE on
(runtime join-strategy switching, skew-join splitting, partition
coalescing), explicit shuffle parallelism, Arrow for any pandas-interop
path, UTC session timezone so timestamp semantics are stable across
engines (the DuckDB correctness oracle runs in naive/UTC time).

ANSI mode is disabled to match the reference's coercion semantics
(``pd.to_numeric(errors='coerce')`` → invalid becomes NULL, see
reference etl1.py:340-341); library code nevertheless always uses
``try_cast``/``try_*`` so every operator also runs correctly under an
ANSI-enabled session (e.g. the verification driver's own session).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "movie-data-pipeline-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (else 32) — the local[]
    thread count standing in for executor slots. ``shuffle_partitions``
    defaults to the same number: at local scale one shuffle partition per
    core; on a real cluster this would be sized so each partition is
    ~128-200 MB of shuffle data.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
