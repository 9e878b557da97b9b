"""Structured Streaming over the events table.

The reference is pure batch (SURVEY.md §2.10) — this is the extension
surface for stream-shaped inputs, built so every streaming aggregation
has a batch twin with identical semantics (the batch q13 plan and
``hourly_event_stats_stream`` share the same window operator; the test
asserts equal results via an availableNow run).

Operators:
- ``hourly_event_stats_stream`` — tumbling-window counts/avg with a
  watermark for late data;
- ``stream_dedup`` — watermark + dropDuplicates on event_id: exactly-
  once-per-key within the lateness horizon, the streaming form of exact
  dedup;
- ``sessionize`` — custom stateful operator (gap-based sessions) via
  ``applyInPandasWithState``: the case built-ins genuinely cannot
  express (per-key gap timeout emitting closed sessions).
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from movie_data_pipeline_spark.schemas import TESTDATA_SCHEMAS
from movie_data_pipeline_spark.sources.registry import table_path

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (same NTZ conversion as
    the batch loader in sources/registry.py)."""
    # The streaming file source requires a directory; the testdata table
    # is a single file, so stream the parent dir with a glob filter.
    raw = (
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # Watermarks require TIMESTAMP (instant) — epoch-micros conversion;
    # with the session timezone pinned to UTC (session.py) the wall values
    # match the batch loader's NTZ timestamps.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_event_stats_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch q13 plan: tumbling 1-hour windows.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and dropped. Scale: state is one row per
    (window), partitioned by the window key across executors.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.avg("value").alias("avg_value"),
        )
        .select(F.col("w.start").alias("ts_hour"), "n_events", "avg_value")
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: first occurrence per event_id wins;
    dedup state expires with the watermark (bounded memory)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization per user — custom stateful operator.

    Events for a user belong to one session while consecutive gaps stay
    under ``gap_minutes``; a processing-time timeout flushes idle
    sessions. State per key is five scalars (start, end, count, sum) —
    thousands of bytes per million users, safely partitioned. This is
    the documented pattern for semantics Spark's built-in windows can't
    express (SURVEY.md §7 custom operators: applyInPandasWithState).
    """
    import pandas as pd

    gap = pd.Timedelta(minutes=gap_minutes)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable["pd.DataFrame"],
        state: GroupState,
    ) -> Iterable["pd.DataFrame"]:
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start, unit="us"),
                        "session_end": pd.Timestamp(end, unit="us"),
                        "n_events": n,
                        "total_value": total,
                    }
                ]
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            start_us, end_us, n, total = state.get
        else:
            start_us = end_us = None
            n, total = 0, 0.0

        out = []
        for r in rows.itertuples():
            ts_us = int(r.ts.value // 1_000)  # pandas ns → µs
            if end_us is not None and (ts_us - end_us) > gap.value // 1_000:
                out.append(
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start_us, unit="us"),
                        "session_end": pd.Timestamp(end_us, unit="us"),
                        "n_events": n,
                        "total_value": total,
                    }
                )
                start_us, n, total = ts_us, 0, 0.0
            if start_us is None:
                start_us = ts_us
            end_us = ts_us
            n += 1
            total += float(r.value)

        state.update((start_us, end_us, n, total))
        state.setTimeoutDuration(60_000)
        if out:
            yield pd.DataFrame(out)

    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
