"""Streaming chi-square mix-drift monitor: exact statistic per
micro-batch, novel-type alarm, end-to-end availableNow run."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_pipeline_spark.streaming import (
    mix_drift_batch_writer,
    start_mix_drift_stream,
)


def _baseline(spark, pairs):
    return spark.createDataFrame(pairs, "event_type STRING, share DOUBLE")


def test_matching_mix_scores_near_zero(spark, tmp_path):
    out = str(tmp_path / "log")
    base = _baseline(spark, [("view", 0.5), ("click", 0.5)])
    writer = mix_drift_batch_writer(base, out)
    batch = spark.createDataFrame(
        [("view",)] * 50 + [("click",)] * 50, "event_type STRING"
    )
    writer(batch, 0)
    row = spark.read.parquet(out).collect()[0]
    assert row["chi2"] == 0.0 and row["n_events"] == 100
    assert row["n_novel_types"] == 0


def test_skewed_mix_and_novel_type_flagged(spark, tmp_path):
    out = str(tmp_path / "log")
    base = _baseline(spark, [("view", 0.5), ("click", 0.5)])
    writer = mix_drift_batch_writer(base, out)
    batch = spark.createDataFrame(
        [("view",)] * 90 + [("click",)] * 5 + [("bot",)] * 5,
        "event_type STRING",
    )
    writer(batch, 1)
    row = spark.read.parquet(out).collect()[0]
    # exact: exp=50 each; (90-50)^2/50 + (5-50)^2/50 = 32 + 40.5
    assert abs(row["chi2"] - 72.5) < 1e-9
    assert row["n_novel_types"] == 1


def test_drift_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("view",)] * 30 + [("click",)] * 10, "event_type STRING"
    ).repartition(1).write.parquet(src)
    base = _baseline(spark, [("view", 0.75), ("click", 0.25)])
    stream = spark.readStream.schema("event_type STRING").parquet(src)
    q = start_mix_drift_stream(
        stream, base, str(tmp_path / "log"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "log")).collect()
    assert len(rows) == 1 and rows[0]["chi2"] == 0.0
