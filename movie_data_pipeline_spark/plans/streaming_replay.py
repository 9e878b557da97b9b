"""Driver-visible STREAMING queries: each builder runs a real
Structured Streaming pipeline (readStream → watermarked agg →
foreachBatch MERGE sink) to completion with an availableNow trigger,
then returns the maintained sink table — so the streaming machinery
itself, not a batch twin, is what the DuckDB oracle hash-verifies.

Rationale (VERDICT r2 #7): the foreachBatch upsert path in
``streaming/sinks.py`` was the least externally-verified component —
covered only by batch-twin equality tests. Replaying its output
through the driver's hash compare closes that: any divergence between
the streaming aggregate + MERGE maintenance and the equivalent batch
SQL fails the round's correctness gate.

Determinism: the upsert sink keeps, per key, the LAST update-mode
value emitted — which is the cumulative aggregate — so the final
table equals the batch aggregate REGARDLESS of how availableNow
sliced the input into micro-batches. Sums are per-term DECIMAL casts
(order-independent), and the hour key is epoch seconds (timezone-
independent under any driver session).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_pipeline_spark.plans.core import query, r4, round4


@query(
    "q204_streaming_hourly_upsert",
    oracle=f"""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ts_hour_epoch,
           event_type,
           COUNT(*) AS n_events,
           {r4("CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)")}
             AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY ts_hour_epoch, event_type
    """,
    tags=("extension", "streaming", "upsert", "foreachBatch"),
)
def q204_streaming_hourly_upsert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end streaming replay, hash-verified: stream the events
    table (availableNow), maintain per-(hour, event_type) counts and
    exact value totals through the update-mode watermarked aggregate
    (``streaming/events.hourly_type_totals_stream``) and the
    foreachBatch MERGE upsert sink (``streaming/sinks.
    start_upsert_stream`` — the same at-least-once-idempotent keyed
    maintenance a lakehouse ``MERGE INTO`` does), then return the
    final maintained table. The oracle is the plain batch SQL over
    events: equality proves the streaming path computes the same
    answer the batch engine does.

    Scale: state is one row per open (hour, event_type) window,
    evicted by the 2 h watermark; the sink write is proportional to
    per-batch key churn (see streaming/sinks.py). The returned frame
    is localCheckpoint-materialized so the temp sink directory can be
    removed before the driver consumes it.
    """
    from movie_data_pipeline_spark.streaming.events import (
        hourly_type_totals_stream,
        stream_events,
    )
    from movie_data_pipeline_spark.streaming.sinks import (
        start_upsert_stream,
    )

    base = tempfile.mkdtemp(prefix="mdp-q204-")
    table, ckpt = f"{base}/table", f"{base}/ckpt"
    try:
        stats = hourly_type_totals_stream(stream_events(spark, sf_dir))
        q = start_upsert_stream(
            stats, table, ckpt, keys=["ts_hour_epoch", "event_type"]
        )
        q.awaitTermination(600)
        result = (
            spark.read.parquet(table)
            .select(
                "ts_hour_epoch",
                "event_type",
                "n_events",
                round4(F.col("sum_value").cast("double")).alias("sum_value"),
            )
            .orderBy("ts_hour_epoch", "event_type")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
