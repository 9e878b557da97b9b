"""Semantics tests for the behavior analytics queries (q76-q78) on
hand-built fixtures — the oracle parity tests prove engine agreement;
these prove the *intended* semantics on adversarial orderings.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movie_data_pipeline_spark.plans.core import round4


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), u, t)
            for i, (d, h, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )


def _funnel(ev):
    """Mirror of q77's stage pipeline on an arbitrary events frame."""
    viewers = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    clickers = (
        ev.filter(F.col("event_type") == "click")
        .join(viewers, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clickers, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return viewers, clickers, buyers


def test_funnel_strict_ordering(spark):
    ev = _events(
        spark,
        [
            # user 1: proper view -> click -> purchase
            (1, 1, 1, "view"),
            (1, 2, 1, "click"),
            (1, 3, 1, "purchase"),
            # user 2: clicks BEFORE ever viewing -> not a funnel click
            (2, 1, 2, "click"),
            (2, 2, 2, "view"),
            # user 3: purchase before click -> buyer not counted
            (3, 1, 3, "view"),
            (3, 2, 3, "purchase"),
            (3, 3, 3, "click"),
            # user 4: never views; click+purchase don't count at all
            (4, 1, 4, "click"),
            (4, 2, 4, "purchase"),
        ],
    )
    viewers, clickers, buyers = _funnel(ev)
    assert sorted(r.user_id for r in viewers.collect()) == [1, 2, 3]
    assert sorted(r.user_id for r in clickers.collect()) == [1, 3]
    assert sorted(r.user_id for r in buyers.collect()) == [1]


def test_funnel_click_after_view_same_second_excluded(spark):
    # strict > : a click at exactly the first-view timestamp is too early
    ev = _events(spark, [(1, 1, 1, "view"), (1, 1, 1, "click")])
    _, clickers, _ = _funnel(ev)
    assert clickers.count() == 0


def test_cohort_week_bucketing_and_weeks_since(spark):
    # 2024-01-01 is a Monday; day 8 is the next Monday
    ev = _events(
        spark,
        [
            (1, 0, 1, "view"),   # user 1 first seen week of Jan 1
            (8, 0, 1, "view"),   # active again week of Jan 8 -> weeks_since 1
            (7, 23, 2, "view"),  # user 2: Sunday Jan 7 still week of Jan 1
        ],
    )
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    got = {r.user_id: r.cohort_week for r in firsts.collect()}
    assert got[1] == dt.datetime(2024, 1, 1)
    assert got[2] == dt.datetime(2024, 1, 1)
    weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("activity_week")
    ).distinct()
    joined = weeks.join(firsts, "user_id").select(
        "user_id",
        F.expr("CAST(datediff(activity_week, cohort_week) div 7 AS BIGINT)").alias(
            "weeks_since"
        ),
    )
    got = sorted((r.user_id, r.weeks_since) for r in joined.collect())
    assert got == [(1, 0), (1, 1), (2, 0)]


def test_transition_shares_sum_to_one_per_source(spark):
    ev = _events(
        spark,
        [
            (1, 1, 1, "view"),
            (1, 2, 1, "click"),
            (1, 3, 1, "view"),
            (1, 4, 1, "purchase"),
            (2, 1, 2, "view"),
            (2, 2, 2, "click"),
        ],
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    share_w = Window.partitionBy("from_type")
    shares = pairs.select(
        "from_type",
        round4(F.col("n") * F.lit(1.0) / F.sum("n").over(share_w)).alias("share"),
    )
    sums = {
        r.from_type: r.total
        for r in shares.groupBy("from_type")
        .agg(F.sum("share").alias("total"))
        .collect()
    }
    # view -> {click: 2, purchase: 1}; shares 0.6667 + 0.3333 ~ 1.0
    assert abs(sums["view"] - 1.0) < 1e-3
    assert sums["click"] == 1.0
