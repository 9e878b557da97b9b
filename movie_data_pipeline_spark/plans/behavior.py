"""User-behavior analytics over ``events``: weekly cohort retention
(q76), strict-order funnel conversion (q77), and the event-transition
matrix (q78).

These are the session/user-level rollups an events warehouse serves
(the reference's ratings analytics are the movie-domain analogue:
per-user aggregates, SURVEY.md §2.4 A2-A5). All three are pure
DataFrame compositions — joins, windows, conditional aggregates — so
Catalyst plans them whole-stage and every count is exact.

Cross-engine invariants: week bucketing stays TIMESTAMP on both
engines (DuckDB's date_trunc('week') yields DATE, cast back to
TIMESTAMP in the oracle — see :func:`_week`); ratios are exact-integer
IEEE divisions under ``round4``/``r4``; ties in event ordering break
on ``event_id``.

Scale notes (100 TB events):
- q76 joins the per-user first-week frame to the per-user activity
  weeks — both sides are already aggregated to at most |users| and
  |users|x|weeks| rows and share the ``user_id`` shuffle key, so AQE
  plans a co-partitioned join with no extra exchange.
- q77's three funnel stages are successive semi-structured joins that
  shrink monotonically (clickers ⊆ viewers, buyers ⊆ clickers); each
  stage keys on ``user_id`` so the shuffle partitioning is reused.
- q78's lead() window shuffles once on ``user_id``; the transition
  grid after aggregation is |event_types|² rows, so the share window
  over ``from_type`` is trivially small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movie_data_pipeline_spark.plans.core import exact_sum, exact_sum_sql, query, r4, round4
from movie_data_pipeline_spark.sources.registry import load_table


def _week(col) -> F.Column:
    """Monday-start week bucket as TIMESTAMP.

    DuckDB's date_trunc('week', ts) returns a DATE while Spark returns
    a timestamp; DATE additionally collects as python ``date`` objects
    (dtype object) on the Spark side vs datetime64 on the DuckDB side,
    which the driver's comparison sees as different values. Keeping
    both engines on TIMESTAMP (oracle: CAST(.. AS TIMESTAMP)) makes the
    collected frames dtype-identical.
    """
    return F.date_trunc("week", col)


# --------------------------------------------------------------------------
# q76 — weekly cohort retention grid
# --------------------------------------------------------------------------
@query(
    "q76_weekly_cohort_retention",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS activity_week
      FROM events),
    joined AS (
      SELECT f.cohort_week, a.activity_week, a.user_id
      FROM activity a JOIN firsts f USING (user_id)),
    grid AS (
      SELECT cohort_week,
             CAST(date_diff('day', cohort_week, activity_week) // 7 AS BIGINT)
               AS weeks_since,
             COUNT(DISTINCT user_id) AS active_users
      FROM joined GROUP BY 1, 2),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY 1)
    SELECT g.cohort_week, g.weeks_since, g.active_users, s.cohort_size,
           {r4('g.active_users * 1.0 / s.cohort_size')} AS retention
    FROM grid g JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, weeks_since
    """,
    tags=("extension", "behavior", "cohort", "retention"),
)
def q76_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users bucketed by first-seen
    week, retention = share of the cohort active N weeks later.

    Both inputs reduce to per-user frames before the join (first-event
    week; distinct activity weeks), so the join input is bounded by
    |users|·|weeks|, not |events|, and both sides share the ``user_id``
    shuffle partitioning. ``weeks_since`` is an exact integer because
    both endpoints are Monday-start week dates.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        _week(F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", _week(F.col("ts")).alias("activity_week")
    ).distinct()
    joined = activity.join(firsts, "user_id")
    grid = joined.groupBy(
        "cohort_week",
        F.expr("CAST(datediff(activity_week, cohort_week) div 7 AS BIGINT)").alias(
            "weeks_since"
        ),
    ).agg(F.count_distinct("user_id").alias("active_users"))
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        grid.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "weeks_since",
            "active_users",
            "cohort_size",
            round4(F.col("active_users") * F.lit(1.0) / F.col("cohort_size")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "weeks_since")
    )


# --------------------------------------------------------------------------
# q77 — strict-order funnel conversion
# --------------------------------------------------------------------------
@query(
    "q77_funnel_conversion",
    oracle=f"""
    WITH viewers AS (
      SELECT user_id, MIN(ts) AS view_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    clickers AS (
      SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM events e JOIN viewers v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.view_ts
      GROUP BY e.user_id),
    buyers AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN clickers c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM viewers)  AS n_viewed,
           (SELECT COUNT(*) FROM clickers) AS n_clicked,
           (SELECT COUNT(*) FROM buyers)   AS n_purchased,
           {r4('(SELECT COUNT(*) FROM clickers) * 1.0 / (SELECT COUNT(*) FROM viewers)')}
             AS view_to_click,
           {r4('(SELECT COUNT(*) FROM buyers) * 1.0 / (SELECT COUNT(*) FROM clickers)')}
             AS click_to_purchase,
           {r4('(SELECT COUNT(*) FROM buyers) * 1.0 / (SELECT COUNT(*) FROM viewers)')}
             AS overall
    """,
    tags=("extension", "behavior", "funnel"),
)
def q77_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel with STRICT event ordering: a
    click only counts after the user's first view, a purchase only
    after that first qualifying click.

    Each stage is a per-user MIN aggregate semi-joined to the previous
    stage's survivors — the stages shrink monotonically and all key on
    ``user_id``, so one shuffle partitioning carries through the whole
    funnel. The final single-row combine is three scalar aggregates
    cross-joined (broadcast, no data movement).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
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
    nv = viewers.agg(F.count("*").alias("n_viewed"))
    nc = clickers.agg(F.count("*").alias("n_clicked"))
    np_ = buyers.agg(F.count("*").alias("n_purchased"))
    return nv.crossJoin(nc).crossJoin(np_).select(
        "n_viewed",
        "n_clicked",
        "n_purchased",
        round4(F.col("n_clicked") * F.lit(1.0) / F.col("n_viewed")).alias(
            "view_to_click"
        ),
        round4(F.col("n_purchased") * F.lit(1.0) / F.col("n_clicked")).alias(
            "click_to_purchase"
        ),
        round4(F.col("n_purchased") * F.lit(1.0) / F.col("n_viewed")).alias("overall"),
    )


# --------------------------------------------------------------------------
# q78 — event-transition matrix (first-order Markov counts)
# --------------------------------------------------------------------------
@query(
    "q78_event_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n_transitions
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n_transitions,
           {r4('n_transitions * 1.0 / SUM(n_transitions) OVER (PARTITION BY from_type)')}
             AS share
    FROM pairs ORDER BY from_type, to_type
    """,
    tags=("extension", "behavior", "markov", "window"),
)
def q78_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over each user's event stream:
    count of (event → next event) pairs plus the per-source share (the
    empirical Markov transition probability).

    ``lead()`` shuffles once on ``user_id`` (tie-break ``event_id`` for
    a deterministic sequence); the aggregated grid is bounded by
    |event_types|² rows, so the share window over ``from_type`` runs on
    a trivially small frame — the single-partition-window trap doesn't
    apply.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n_transitions"))
    )
    share_w = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        round4(
            F.col("n_transitions") * F.lit(1.0) / F.sum("n_transitions").over(share_w)
        ).alias("share"),
    ).orderBy("from_type", "to_type")


# --------------------------------------------------------------------------
# q86 — hourly volume anomalies (z-score vs trailing 24 observed hours)
# --------------------------------------------------------------------------
# Shared arithmetic, spelled identically in both engines: integer frame
# sums (exact in any order) -> mean/variance/z via the same IEEE ops.
_Z_MIN_HOURS = 12


@query(
    "q86_hourly_anomalies",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    framed AS (
      SELECT event_type, hour, c,
             COUNT(c) OVER w AS n,
             SUM(c) OVER w AS s1,
             SUM(c * c) OVER w AS s2
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT event_type, hour, c AS n_events,
           CASE WHEN n >= {_Z_MIN_HOURS}
                 AND (s2 - s1 * s1 * 1.0 / n) / (n - 1) > 0
                THEN {r4('(c - s1 * 1.0 / n) / sqrt((s2 - s1 * s1 * 1.0 / n) / (n - 1))')}
           END AS zscore,
           CASE WHEN n >= {_Z_MIN_HOURS}
                 AND (s2 - s1 * s1 * 1.0 / n) / (n - 1) > 0
                THEN CAST(abs((c - s1 * 1.0 / n)
                          / sqrt((s2 - s1 * s1 * 1.0 / n) / (n - 1))) > 2.0
                     AS BIGINT)
           END AS is_anomaly
    FROM framed ORDER BY event_type, hour
    """,
    tags=("extension", "behavior", "anomaly", "window"),
)
def q86_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each (event_type, hour) bucket scored
    against the mean/stddev of its trailing 24 *observed* hours — the
    monitoring rollup an events warehouse feeds to alerting.

    The trailing statistics come from integer power sums (COUNT/SUM/
    SUM(c*c)) over a ROWS frame — exact in any accumulation order, so
    the derived mean/variance/z are bit-identical across engines (the
    q61/q68 discipline applied to a moving frame). One shuffle on
    event_type for both the hourly aggregate and the window; warm-up
    rows (< 12 trailing hours) and zero-variance frames
    yield NULL scores rather than infinities.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    framed = hourly.select(
        "event_type",
        "hour",
        "c",
        F.count("c").over(w).alias("n"),
        F.sum("c").over(w).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("s2"),
    )
    n, s1, s2, c = (F.col(x) for x in ("n", "s1", "s2", "c"))
    var = (s2 - s1 * s1 * F.lit(1.0) / n) / (n - F.lit(1))
    z = (c - s1 * F.lit(1.0) / n) / F.sqrt(var)
    ok = (n >= F.lit(_Z_MIN_HOURS)) & (var > F.lit(0.0))
    return framed.select(
        "event_type",
        "hour",
        c.alias("n_events"),
        F.when(ok, round4(z)).alias("zscore"),
        F.when(ok, (F.abs(z) > F.lit(2.0)).cast("long")).alias("is_anomaly"),
    ).orderBy("event_type", "hour")


# --------------------------------------------------------------------------
# q154 — burst/bot detection via inter-arrival gaps
# --------------------------------------------------------------------------
@query(
    "q154_burst_users",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts - lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)) AS gap_us
      FROM events),
    per AS (
      SELECT user_id,
             COUNT(*) + 1 AS n_events,
             MIN(gap_us) // 1000000 AS min_gap_s,
             COUNT(CASE WHEN gap_us <= 600000000 THEN 1 END) AS n_bursts
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY user_id)
    SELECT user_id, n_events, min_gap_s, n_bursts,
           CASE WHEN n_bursts >= 3 THEN true ELSE false END AS burst_flag
    FROM per ORDER BY user_id
    """,
    tags=("extension", "behavior", "anomaly"),
)
def q154_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst/bot screening per user: minimum inter-arrival gap and the
    count of gaps ≤ 10 minutes, flagging users with ≥ 3 such bursts —
    the rate-anomaly screen run before user events enter a training
    corpus (scripted clients produce tight inter-arrival clusters that
    per-hour rollups like q86 smear away).

    One lag window partitioned by user (bounded per user, shuffles once
    on user_id) feeding a per-user aggregate that REUSES the same
    user_id partitioning — no second exchange. Gap arithmetic is exact integer
    MICROsecond subtraction (second-floor-then-subtract would disagree
    with subtract-then-floor on sub-second components); thresholds and
    the floor-divided report are integers, so everything is portable
    bit-for-bit. Users with a single event carry no
    gaps and drop out, matching the oracle's WHERE gap IS NOT NULL.
    """
    events = load_table(spark, sf_dir, "events")
    g = events.select(
        "user_id",
        # timestampdiff works on TIMESTAMP_NTZ (unix_micros does not),
        # and exact integer micros avoid floor-before-subtract skew.
        F.expr(
            "timestampdiff(MICROSECOND, lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    per = g.groupBy("user_id").agg(
        (F.count("*") + 1).alias("n_events"),
        F.expr("min(gap_us) div 1000000").alias("min_gap_s"),
        F.count(F.when(F.col("gap_us") <= 600_000_000, 1)).alias("n_bursts"),
    )
    return per.select(
        "user_id",
        "n_events",
        "min_gap_s",
        "n_bursts",
        (F.col("n_bursts") >= 3).alias("burst_flag"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# q158 — cooldown throttling (keep-first-within-24h, a true recursion)
# --------------------------------------------------------------------------
@query(
    "q158_cooldown_throttle",
    oracle="""
    WITH RECURSIVE kept AS (
      SELECT user_id, MIN(ts) AS kept_ts
      FROM events GROUP BY user_id
      UNION ALL
      SELECT e.user_id, MIN(e.ts) AS kept_ts
      FROM events e
      JOIN kept k ON e.user_id = k.user_id
       AND e.ts >= k.kept_ts + INTERVAL 24 HOUR
      GROUP BY e.user_id)
    SELECT user_id, kept_ts FROM kept ORDER BY user_id, kept_ts
    """,
    tags=("extension", "behavior", "stateful", "applyInPandas"),
)
def q158_cooldown_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cooldown throttling: a user's first event is kept; every later
    event is kept only if ≥ 24 h after the LAST KEPT one (notification
    fatigue caps, crawl politeness, incentive-abuse dedup).

    This is one of the few operators in the catalog that is genuinely
    NOT relational: which event is kept depends on which earlier events
    were kept — a data-dependent recursion no window frame or prefix
    sum expresses (gap-since-previous-EVENT is q34's sessionizer; gap-
    since-last-KEPT is a different recurrence). It therefore takes the
    applyInPandas tier (Arrow-batched, grouped by user — the same
    justification as the stateful sessionizer): each group is one
    user's bounded event sequence, scanned once in timestamp order. The
    DuckDB oracle runs the SAME recursion as a recursive CTE whose
    step maps each user's last kept timestamp to the MIN event ≥ 24 h
    later — the driver's hash compare checks the Python recursion
    against an independent SQL fixpoint, not a reimplementation of
    itself. Comparisons are exact nanosecond Timedeltas / interval
    arithmetic; no floats anywhere.
    """
    import pandas as pd

    events = load_table(spark, sf_dir, "events").select("user_id", "ts")

    def throttle(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ts_sorted = pdf["ts"].sort_values()
        kept = []
        last = None
        gap = pd.Timedelta(hours=24)
        for t in ts_sorted:
            if last is None or t - last >= gap:
                kept.append(t)
                last = t
        return pd.DataFrame(
            {"user_id": pdf["user_id"].iloc[0], "kept_ts": kept}
        )

    return (
        events.groupBy("user_id")
        .applyInPandas(throttle, "user_id long, kept_ts timestamp_ntz")
        .orderBy("user_id", "kept_ts")
    )


# --------------------------------------------------------------------------
# q162 — interval union: total covered time per user (overlap merging)
# --------------------------------------------------------------------------
@query(
    "q162_covered_time",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) AS s_us,
             epoch_us(ts) + 900000000 AS e_us,
             event_id
      FROM events),
    flagged AS (
      SELECT user_id, s_us, e_us, event_id,
             CASE WHEN MAX(e_us) OVER (PARTITION BY user_id
                                       ORDER BY s_us, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) >= s_us
                  THEN 0 ELSE 1 END AS is_new
      FROM iv),
    grouped AS (
      SELECT user_id, s_us, e_us,
             SUM(is_new) OVER (PARTITION BY user_id
                               ORDER BY s_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS grp
      FROM flagged),
    spans AS (
      SELECT user_id, grp,
             MAX(e_us) - MIN(s_us) AS span_us
      FROM grouped GROUP BY user_id, grp)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_busy_spans,
           CAST(SUM(span_us) AS BIGINT) AS covered_us
    FROM spans GROUP BY user_id ORDER BY user_id
    """,
    tags=("extension", "behavior", "interval", "window"),
)
def q162_covered_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per user: treat every event as a 15-minute
    activity interval, merge overlaps, and report the number of merged
    busy spans and the total covered microseconds — the utilization /
    billable-time computation (double-counting overlapping intervals is
    THE classic usage-metering bug, and a plain SUM of durations gets
    it wrong).

    The textbook sweep is sequential; the relational form is two
    per-user windows sharing one user_id exchange — a shifted running
    MAX of interval ends flags where a new span starts (an interval
    chains onto the current span iff some earlier interval's end
    reaches its start), a running SUM of flags numbers the spans — then
    span extents aggregate per (user, span). All arithmetic is exact
    integer microseconds from epoch_us/timestampdiff against a constant
    NTZ anchor (session-timezone-free); no floats anywhere.
    """
    events = load_table(spark, sf_dir, "events")
    rel = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )
    iv = events.select(
        "user_id",
        rel.alias("s_us"),
        (rel + F.lit(900_000_000)).alias("e_us"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s_us",
        "e_us",
        "event_id",
        F.when(F.max("e_us").over(w_prev) >= F.col("s_us"), 0)
        .otherwise(1)
        .alias("is_new"),
    )
    # IDENTICAL total order as w_prev: with a different tie-break, a
    # tied (same-start) pair's flag row and sum row can interleave
    # differently per engine and attach the 0-flag row to the previous
    # span — a real nondeterminism, not a formatting nit.
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = flagged.select(
        "user_id",
        "s_us",
        "e_us",
        F.sum("is_new").over(w_run).alias("grp"),
    )
    spans = grouped.groupBy("user_id", "grp").agg(
        (F.max("e_us") - F.min("s_us")).alias("span_us")
    )
    return (
        spans.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_busy_spans"),
            F.sum("span_us").cast("long").alias("covered_us"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# q165 — session path mining (top opening event-type journeys)
# --------------------------------------------------------------------------
@query(
    "q165_session_paths",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN date_diff('microsecond',
                            LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id),
                            ts) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked),
    paths AS (
      SELECT user_id, session_id,
             array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:3], '>'
             ) AS path
      FROM numbered GROUP BY user_id, session_id)
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 25
    """,
    tags=("extension", "behavior", "path-mining"),
)
def q165_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top opening journeys: the first three event types of every
    session (q34's 30-minute gap sessions), joined into a path string
    and ranked by frequency — the user-journey / clickstream-path
    report product analytics runs on every events warehouse.

    The session machinery is q34's lag + running-sum pair (one user_id
    exchange); the path is a per-session ordered collect truncated to
    3 (bounded arrays — sessions are gap-bounded); the final frequency
    rollup is a small hash aggregate on the path string with
    TakeOrderedAndProject on top. The ordered collect uses
    sort_array(collect_list(struct(...))) — Spark's collect_list has no
    ORDER BY; the struct sort imposes the oracle's (ts, event_id)
    order exactly.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.expr(
                    "timestampdiff(MICROSECOND, lag(ts) OVER "
                    "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
                )
                > 1_800_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = marked.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    paths = numbered.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                3,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# q166 — maximum drawdown of the cumulative value series per type
# --------------------------------------------------------------------------
@query(
    "q166_value_drawdown",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2),
    cum AS (
      SELECT event_type, hr,
             CAST(SUM(CAST(v AS DECIMAL(30,18))) OVER
               (PARTITION BY event_type ORDER BY hr
                ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS equity
      FROM hourly),
    dd AS (
      SELECT event_type, hr, equity,
             MAX(equity) OVER (PARTITION BY event_type ORDER BY hr
                               ROWS UNBOUNDED PRECEDING) AS peak
      FROM cum)
    SELECT event_type,
           {r4('MAX(peak - equity)')} AS max_drawdown,
           {r4('MAX(equity)')} AS final_peak
    FROM dd GROUP BY event_type ORDER BY event_type
    """,
    tags=("extension", "timeseries", "window"),
)
def q166_value_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative hourly value series per event
    type — the peak-to-trough risk statistic (finance's drawdown, SRE's
    error-budget burn): running sum → running max → max gap between
    them.

    Both windows ride the per-hour aggregate (calendar-bounded frames,
    q115's contract) and share one event_type exchange. The cumulative
    sum accumulates in DECIMAL(30,18) before returning to double so
    the equity curve is partition-order-independent; peak−equity is
    then identical IEEE arithmetic on both engines.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(exact_sum(F.col("value")).alias("v"))
    w = Window.partitionBy("event_type").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hourly.select(
        "event_type",
        "hr",
        F.sum(F.col("v").cast("decimal(30,18)"))
        .over(w)
        .cast("double")
        .alias("equity"),
    )
    dd = cum.select(
        "event_type",
        "equity",
        F.max("equity").over(w.orderBy("hr")).alias("peak"),
    )
    return (
        dd.groupBy("event_type")
        .agg(
            round4(F.max(F.col("peak") - F.col("equity"))).alias("max_drawdown"),
            round4(F.max("equity")).alias("final_peak"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q167 — A/B experiment readout (two-proportion z-test)
# --------------------------------------------------------------------------
@query(
    "q167_ab_test_readout",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    assigned AS (
      SELECT user_id, user_id % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND rn <= 3
                 THEN 1 ELSE 0 END) AS converted
      FROM ordered GROUP BY user_id),
    arms AS (
      SELECT arm, COUNT(*) AS n_users,
             SUM(converted) AS n_converted
      FROM assigned GROUP BY arm),
    wide AS (
      SELECT
        (SELECT n_users FROM arms WHERE arm = 0) AS n_a,
        (SELECT n_converted FROM arms WHERE arm = 0) AS c_a,
        (SELECT n_users FROM arms WHERE arm = 1) AS n_b,
        (SELECT n_converted FROM arms WHERE arm = 1) AS c_b)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
           {r4('c_a * 1.0 / n_a')} AS rate_a,
           {r4('c_b * 1.0 / n_b')} AS rate_b,
           {r4('''(c_b * 1.0 / n_b - c_a * 1.0 / n_a)
             / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
                    * (1.0 - (c_a + c_b) * 1.0 / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b))''')} AS z_stat
    FROM wide
    """,
    tags=("extension", "experimentation", "agg"),
)
def q167_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test readout for a hash-split experiment: users
    assigned to arms by id parity (the deterministic stand-in for an
    assignment log), conversion = a purchase among the user's first
    three events (an interior rate — over the full synthetic history
    every user eventually purchases, which would degenerate the
    pooled variance to zero), pooled-variance
    z-statistic — the significance arithmetic every experimentation
    platform reduces to.

    Two aggregates (per-user conversion flag, then per-arm counts —
    both on the user_id exchange) collapse to a 2-row frame; the z
    arithmetic is a single-row projection of exact integer counts
    through identical IEEE expressions on both engines (sqrt included:
    correctly rounded per IEEE-754, so bit-identical on identical
    inputs).
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    assigned = ordered.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("rn") <= 3), 1
            ).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    arms = assigned.groupBy("arm").agg(
        F.count("*").alias("n_users"), F.sum("converted").alias("n_converted")
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n_users").alias("n_a"), F.col("n_converted").alias("c_a")
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n_users").alias("n_b"), F.col("n_converted").alias("c_b")
    )
    wide = a.crossJoin(b)
    rate_a = F.col("c_a") * F.lit(1.0) / F.col("n_a")
    rate_b = F.col("c_b") * F.lit(1.0) / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")) * F.lit(1.0) / (
        F.col("n_a") + F.col("n_b")
    )
    z = (rate_b - rate_a) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("c_a").cast("long").alias("c_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("c_b").cast("long").alias("c_b"),
        round4(rate_a).alias("rate_a"),
        round4(rate_b).alias("rate_b"),
        round4(z).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# q169 — CUPED variance-reduced experiment readout
# --------------------------------------------------------------------------
_DSUM = "CAST(SUM(CAST(({x}) AS DECIMAL(38,10))) AS DOUBLE)"


@query(
    "q169_cuped_readout",
    oracle=f"""
    WITH bounds AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events),
    per_user AS (
      SELECT e.user_id, e.user_id % 2 AS arm,
             {_DSUM.format(x="CASE WHEN epoch_us(e.ts - b.lo) * 2 < epoch_us(b.hi - b.lo) THEN e.value ELSE 0 END")} AS x,
             {_DSUM.format(x="CASE WHEN epoch_us(e.ts - b.lo) * 2 < epoch_us(b.hi - b.lo) THEN 0 ELSE e.value END")} AS y
      FROM events e CROSS JOIN bounds b
      GROUP BY e.user_id),
    stats AS (
      SELECT COUNT(*) AS n,
             {_DSUM.format(x="x")} AS sx, {_DSUM.format(x="y")} AS sy,
             {_DSUM.format(x="x * x")} AS sxx,
             {_DSUM.format(x="x * y")} AS sxy,
             {_DSUM.format(x="y * y")} AS syy
      FROM per_user),
    params AS (
      SELECT n, sy, syy,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
             sx / n AS xbar
      FROM stats),
    adj AS (
      SELECT u.arm, u.y,
             u.y - p.theta * (u.x - p.xbar) AS y_adj
      FROM per_user u CROSS JOIN params p),
    arm_means AS (
      SELECT
        {_DSUM.format(x="CASE WHEN arm = 1 THEN y ELSE 0 END")}
          / COUNT(CASE WHEN arm = 1 THEN 1 END)
        - {_DSUM.format(x="CASE WHEN arm = 0 THEN y ELSE 0 END")}
          / COUNT(CASE WHEN arm = 0 THEN 1 END) AS diff_raw,
        {_DSUM.format(x="CASE WHEN arm = 1 THEN y_adj ELSE 0 END")}
          / COUNT(CASE WHEN arm = 1 THEN 1 END)
        - {_DSUM.format(x="CASE WHEN arm = 0 THEN y_adj ELSE 0 END")}
          / COUNT(CASE WHEN arm = 0 THEN 1 END) AS diff_adj,
        {_DSUM.format(x="y_adj * y_adj")} AS sada,
        {_DSUM.format(x="y_adj")} AS sad,
        COUNT(*) AS n
      FROM adj)
    SELECT CAST(a.n AS BIGINT) AS n_users,
           {r4('p.theta')} AS theta,
           {r4('a.diff_raw')} AS diff_raw,
           {r4('a.diff_adj')} AS diff_adj,
           {r4('''1.0 - (a.sada - a.sad * a.sad / a.n)
                      / (p.syy - p.sy * p.sy / p.n)''')} AS var_reduction
    FROM arm_means a CROSS JOIN params p
    """,
    tags=("extension", "experimentation", "cuped"),
)
def q169_cuped_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et
    al. 2013): regress the experiment-period metric on the
    pre-period covariate, report the covariate coefficient theta, the
    raw and adjusted arm differences, and the variance reduction — the
    technique that lets experimentation platforms call tests in half
    the time. Pre/post periods split at the exact time midpoint
    (q156's halving-free integer-micros split); arms by user-id parity
    as in q167.

    Two passes over the per-user frame (one groupBy builds it; the
    second pass re-reads it with the broadcast scalar parameters), all
    cross-row sums in DECIMAL(38,10) so theta and the variance ratio
    are identical IEEE arithmetic on identical exact sums in both
    engines. No windows, no collects — the per-user frame is the only
    shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    before_mid = (
        F.expr("timestampdiff(MICROSECOND, lo, ts)") * 2
        < F.expr("timestampdiff(MICROSECOND, lo, hi)")
    )

    def dsum(col):
        return F.sum(col.cast("decimal(38,10)")).cast("double")

    per_user = (
        events.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            dsum(F.when(before_mid, F.col("value")).otherwise(0)).alias("x"),
            dsum(F.when(before_mid, F.lit(0)).otherwise(F.col("value"))).alias(
                "y"
            ),
        )
        .select((F.col("user_id") % 2).alias("arm"), "x", "y")
    )
    stats = per_user.agg(
        F.count("*").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    params = stats.select(
        "n",
        "sy",
        "syy",
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("theta"),
        (F.col("sx") / F.col("n")).alias("xbar"),
    )
    adj = per_user.crossJoin(F.broadcast(params)).select(
        "arm",
        "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))).alias(
            "y_adj"
        ),
        "theta",
        "sy",
        "syy",
        F.col("n").alias("n_all"),
    )
    agg = adj.agg(
        F.any_value("theta").alias("theta"),
        F.any_value("sy").alias("sy"),
        F.any_value("syy").alias("syy"),
        F.any_value("n_all").alias("n"),
        (
            dsum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
            / F.count(F.when(F.col("arm") == 1, 1))
            - dsum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
            / F.count(F.when(F.col("arm") == 0, 1))
        ).alias("diff_raw"),
        (
            dsum(F.when(F.col("arm") == 1, F.col("y_adj")).otherwise(0))
            / F.count(F.when(F.col("arm") == 1, 1))
            - dsum(F.when(F.col("arm") == 0, F.col("y_adj")).otherwise(0))
            / F.count(F.when(F.col("arm") == 0, 1))
        ).alias("diff_adj"),
        dsum(F.col("y_adj") * F.col("y_adj")).alias("sada"),
        dsum(F.col("y_adj")).alias("sad"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        round4(F.col("theta")).alias("theta"),
        round4(F.col("diff_raw")).alias("diff_raw"),
        round4(F.col("diff_adj")).alias("diff_adj"),
        round4(
            F.lit(1.0)
            - (F.col("sada") - F.col("sad") * F.col("sad") / F.col("n"))
            / (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
        ).alias("var_reduction"),
    )


# --------------------------------------------------------------------------
# q183 — temporal-holdout Markov next-event prediction eval
# --------------------------------------------------------------------------
@query(
    "q183_markov_holdout_eval",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events),
    lab AS (
      SELECT user_id, event_type, rn,
             CASE WHEN rn <= (n * 4) // 5 THEN 'train' ELSE 'test' END AS part
      FROM seq),
    big AS (
      SELECT a.part, a.event_type AS cur, b.event_type AS nxt
      FROM lab a JOIN lab b
        ON a.user_id = b.user_id AND b.rn = a.rn + 1 AND a.part = b.part),
    model AS (
      SELECT cur, nxt, COUNT(*) AS c FROM big WHERE part = 'train'
      GROUP BY 1, 2),
    pred AS (
      SELECT cur, nxt AS predicted FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cur
                                     ORDER BY c DESC, nxt) AS rn2
        FROM model) WHERE rn2 = 1)
    SELECT t.cur AS event_type, MAX(p.predicted) AS predicted_next,
           COUNT(*) AS n_test_bigrams,
           CAST(SUM(CASE WHEN t.nxt = p.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           {r4("CAST(SUM(CASE WHEN t.nxt = p.predicted THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")}
             AS accuracy
    FROM (SELECT cur, nxt FROM big WHERE part = 'test') t
    JOIN pred p ON p.cur = t.cur
    GROUP BY t.cur ORDER BY t.cur
    """,
    tags=("extension", "behavior", "markov", "holdout-eval"),
)
def q183_markov_holdout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the order-1 Markov next-event model (q77's
    transition matrix) under a leakage-free temporal holdout: each
    user's first 80% of events (by time, integer-exact ⌊4n/5⌋ split —
    no float boundary) trains the global transition counts, the
    argmax next-type per current type (ties toward the alphabetically
    first type on both engines) is the predictor, and accuracy is
    measured on bigrams formed strictly INSIDE each user's test tail —
    never across the train/test seam, which would leak the boundary
    event. Per conditioning type: the prediction, test support, and
    top-1 accuracy. This is the eval-hygiene pattern of q173 applied
    to sequences: split by time within user, not by row hash, because
    behavior is autocorrelated.

    Scale: sequencing windows and the bigram join partition on
    user_id (bounded per-user frames; the Spark side uses lead() in
    the same window instead of the oracle's rn self-join — one shuffle
    not two); the model and eval are hash aggregates on the tiny
    (type, type) matrix, broadcast for the final join.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    lab = seq.select(
        "event_type",
        "nxt",
        F.when(F.col("rn") <= F.expr("div(n * 4, 5)"), "train")
        .otherwise("test")
        .alias("part"),
        # lead() is the next row of the same partition, so its rank is rn+1
        F.when(F.col("rn") + 1 <= F.expr("div(n * 4, 5)"), "train")
        .otherwise("test")
        .alias("nxt_part"),
    )
    big = lab.filter(
        F.col("nxt").isNotNull() & (F.col("part") == F.col("nxt_part"))
    ).select("part", F.col("event_type").alias("cur"), "nxt")
    model = (
        big.filter(F.col("part") == "train")
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("c"))
    )
    wp = Window.partitionBy("cur").orderBy(F.desc("c"), F.asc("nxt"))
    pred = (
        model.withColumn("rn2", F.row_number().over(wp))
        .filter(F.col("rn2") == 1)
        .select("cur", F.col("nxt").alias("predicted"))
    )
    test = big.filter(F.col("part") == "test").select("cur", "nxt")
    return (
        test.join(F.broadcast(pred), "cur")
        .groupBy(F.col("cur").alias("event_type"))
        .agg(
            F.max("predicted").alias("predicted_next"),
            F.count("*").alias("n_test_bigrams"),
            F.sum(
                F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
            round4(
                F.sum(F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*").cast("double")
            ).alias("accuracy"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q184 — first-touch vs last-touch revenue attribution
# --------------------------------------------------------------------------
@query(
    "q184_touch_attribution",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, value, ts, event_id,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_touch
      FROM events),
    purch AS (
      SELECT COALESCE(last_touch, 'direct') AS last_touch,
             COALESCE(first_touch, 'direct') AS first_touch,
             value
      FROM seq WHERE event_type = 'purchase'),
    lt AS (
      SELECT last_touch AS touch_type, COUNT(*) AS n_last,
             {exact_sum_sql('value')} AS revenue_last
      FROM purch GROUP BY 1),
    ft AS (
      SELECT first_touch AS touch_type, COUNT(*) AS n_first,
             {exact_sum_sql('value')} AS revenue_first
      FROM purch GROUP BY 1)
    SELECT touch_type,
           COALESCE(n_last, 0) AS n_last,
           {r4('COALESCE(revenue_last, 0.0)')} AS revenue_last,
           COALESCE(n_first, 0) AS n_first,
           {r4('COALESCE(revenue_first, 0.0)')} AS revenue_first
    FROM lt FULL OUTER JOIN ft USING (touch_type)
    ORDER BY touch_type
    """,
    tags=("extension", "behavior", "attribution"),
)
def q184_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-revenue attribution under the two bookend models
    marketing stacks argue about: each purchase's value is credited to
    the user's most recent non-purchase event (last-touch) and,
    independently, to the user's earliest non-purchase event
    (first-touch) — purchases with no preceding touch fall into the
    'direct' bucket. One row per touch type with counts and exactly
    summed revenue under each model; the two columns diverging is the
    whole point (last-touch over-credits bottom-of-funnel clicks,
    first-touch over-credits discovery views).

    Scale: both attributions come from ONE per-user ordered window
    pass (IGNORE NULLS first/last over the strictly-preceding frame —
    bounded per-user partitions, q64's LOCF machinery), then two tiny
    per-type aggregates with DECIMAL(30,6) exact sums joined full-outer
    so a type with credit under only one model still reports.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    seq = events.select(
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
    )
    purch = seq.filter(F.col("event_type") == "purchase").select(
        F.coalesce(F.col("last_touch"), F.lit("direct")).alias("last_touch"),
        F.coalesce(F.col("first_touch"), F.lit("direct")).alias("first_touch"),
        "value",
    ).persist()
    lt = purch.groupBy(F.col("last_touch").alias("touch_type")).agg(
        F.count("*").alias("n_last"), exact_sum(F.col("value")).alias("revenue_last")
    )
    ft = purch.groupBy(F.col("first_touch").alias("touch_type")).agg(
        F.count("*").alias("n_first"), exact_sum(F.col("value")).alias("revenue_first")
    )
    return (
        lt.join(ft, "touch_type", "full_outer")
        .select(
            "touch_type",
            F.coalesce(F.col("n_last"), F.lit(0)).alias("n_last"),
            round4(F.coalesce(F.col("revenue_last"), F.lit(0.0))).alias("revenue_last"),
            F.coalesce(F.col("n_first"), F.lit(0)).alias("n_first"),
            round4(F.coalesce(F.col("revenue_first"), F.lit(0.0))).alias(
                "revenue_first"
            ),
        )
        .orderBy("touch_type")
    )


# --------------------------------------------------------------------------
# q189 — pooled retention curve with exponential-decay fit
# --------------------------------------------------------------------------
_RET_MAX_T = 20


@query(
    "q189_retention_decay_fit",
    oracle=f"""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    cohort AS (
      SELECT user_id, MIN(d) AS c0 FROM act GROUP BY user_id),
    mx AS (SELECT MAX(d) AS max_d FROM act),
    offs AS (
      SELECT a.user_id, date_diff('day', c.c0, a.d) AS t
      FROM act a JOIN cohort c USING (user_id)),
    ts_grid AS (SELECT unnest(generate_series(1, {_RET_MAX_T})) AS t),
    eligible AS (
      SELECT g.t, COUNT(*) AS n_eligible
      FROM ts_grid g, cohort c, mx
      WHERE date_diff('day', c.c0, mx.max_d) >= g.t
      GROUP BY g.t),
    active AS (
      SELECT t, COUNT(DISTINCT user_id) AS n_active
      FROM offs WHERE t BETWEEN 1 AND {_RET_MAX_T} GROUP BY t),
    curve AS (
      SELECT e.t, e.n_eligible, COALESCE(a.n_active, 0) AS n_active,
             CAST(COALESCE(a.n_active, 0) AS DOUBLE)
               / CAST(e.n_eligible AS DOUBLE) AS r
      FROM eligible e LEFT JOIN active a USING (t)),
    fit AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(CAST(t AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ln(r) AS DECIMAL(38,18))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(t AS DOUBLE) * CAST(t AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(t AS DOUBLE) * ln(r) AS DECIMAL(38,18))) AS DOUBLE) AS sxy
      FROM curve WHERE n_active > 0),
    coefs AS (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS alpha
      FROM fit)
    SELECT curve.t AS t_days, n_eligible, n_active,
           {r4('r')} AS retention,
           {r4('exp(alpha + slope * CAST(curve.t AS DOUBLE))')} AS fitted_retention,
           {r4('-slope')} AS decay_lambda
    FROM curve CROSS JOIN coefs
    ORDER BY curve.t
    """,
    tags=("extension", "behavior", "retention", "model-fit"),
)
def q189_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled daily retention curve with an exponential-decay fit:
    each user's cohort day is their first active date, retention at
    horizon t counts users active exactly t days after their cohort
    day over the users whose cohort is OLD enough to observe horizon
    t (the observability triangle — naive fixed denominators
    understate late horizons), and ``ln r = α − λt`` is fit by
    closed-form OLS over the non-zero points (q170's Zipf-fit
    discipline: exact decimal moment sums, engine-identical ln). The
    output carries observed vs fitted retention per horizon plus the
    decay constant — the number a growth model plugs into LTV.

    Scale: activity collapses to distinct (user, day) first — the
    only pass over the raw fact; cohorts are a per-user min; the
    triangle denominator is |horizons|×|users| only in the oracle's
    spelled-out form — the Spark build aggregates cohort sizes per
    day first, then takes a running-style sum over the tiny
    (day-count × horizon) grid. The fit is a 4-moment aggregate over
    ≤20 rows joined back broadcast.
    """
    events = load_table(spark, sf_dir, "events")
    act = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct().persist()
    cohort = act.groupBy("user_id").agg(F.min("d").alias("c0"))
    mx = act.agg(F.max("d").alias("max_d"))
    grid = spark.range(1, _RET_MAX_T + 1).select(F.col("id").cast("int").alias("t"))
    # cohort sizes per cohort day (tiny), then eligible counts per horizon
    csize = cohort.groupBy("c0").agg(F.count("*").alias("nc"))
    eligible = (
        csize.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(grid))
        .filter(F.datediff(F.col("max_d"), F.col("c0")) >= F.col("t"))
        .groupBy("t")
        .agg(F.sum("nc").cast("long").alias("n_eligible"))
    )
    offs = act.join(cohort, "user_id").select(
        "user_id", F.datediff(F.col("d"), F.col("c0")).alias("t")
    )
    active = (
        offs.filter((F.col("t") >= 1) & (F.col("t") <= _RET_MAX_T))
        .groupBy("t")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    curve = (
        eligible.join(active, "t", "left")
        .select(
            "t",
            "n_eligible",
            F.coalesce(F.col("n_active"), F.lit(0)).alias("n_active"),
        )
        .withColumn(
            "r",
            F.col("n_active").cast("double") / F.col("n_eligible").cast("double"),
        )
        .persist()
    )
    td = F.col("t").cast("double")
    fit = curve.filter(F.col("n_active") > 0).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(td.cast("decimal(38,18)")).cast("double").alias("sx"),
        F.sum(F.log("r").cast("decimal(38,18)")).cast("double").alias("sy"),
        F.sum((td * td).cast("decimal(38,18)")).cast("double").alias("sxx"),
        F.sum((td * F.log("r")).cast("decimal(38,18)")).cast("double").alias("sxy"),
    )
    coefs = fit.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope"),
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
    ).select(
        "slope",
        ((F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n")).alias("alpha"),
    )
    return (
        curve.crossJoin(F.broadcast(coefs))
        .select(
            F.col("t").alias("t_days"),
            "n_eligible",
            "n_active",
            round4(F.col("r")).alias("retention"),
            round4(F.exp(F.col("alpha") + F.col("slope") * td)).alias(
                "fitted_retention"
            ),
            round4(-F.col("slope")).alias("decay_lambda"),
        )
        .orderBy("t_days")
    )


# --------------------------------------------------------------------------
# q191 — Kaplan-Meier churn survival curve (right-censored)
# --------------------------------------------------------------------------
_KM_CENSOR_DAYS = 2


@query(
    "q191_kaplan_meier",
    oracle=f"""
    WITH act AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l
      FROM events GROUP BY user_id),
    mx AS (SELECT MAX(l) AS max_d FROM act),
    spans AS (
      SELECT user_id, date_diff('day', f, l) AS t,
             CASE WHEN date_diff('day', l, mx.max_d) <= {_KM_CENSOR_DAYS}
                  THEN 0 ELSE 1 END AS churned
      FROM act CROSS JOIN mx),
    per_t AS (
      SELECT t,
             CAST(SUM(churned) AS BIGINT) AS d,
             CAST(COUNT(*) - SUM(churned) AS BIGINT) AS c
      FROM spans GROUP BY t),
    risk AS (
      SELECT p.t, p.d, p.c,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM spans s WHERE s.t >= p.t)
               AS n_risk
      FROM per_t p),
    surv AS (
      SELECT r1.t, r1.d, r1.c, r1.n_risk,
             exp(CAST(SUM(CAST(ln(greatest(1.0 - CAST(r2.d AS DOUBLE)
                                              / CAST(r2.n_risk AS DOUBLE),
                                          1e-300))
                               AS DECIMAL(38,18))) AS DOUBLE)) AS s
      FROM risk r1 JOIN risk r2 ON r2.t <= r1.t AND r2.d > 0
      WHERE r1.d > 0
      GROUP BY r1.t, r1.d, r1.c, r1.n_risk)
    SELECT t AS t_days, n_risk, d AS n_churned, c AS n_censored,
           {r4('s')} AS survival
    FROM surv ORDER BY t
    """,
    tags=("extension", "behavior", "survival", "kaplan-meier"),
)
def q191_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimate of user lifetime: each user's observed
    span runs from first to last active day; users still active within
    2 days of the corpus end are right-CENSORED (we
    didn't see them churn — discarding them is the classic
    survivorship bias this estimator exists to avoid), everyone else
    churned at their span length. At each churn time t:
    S(t) = Π_{{t_j ≤ t}} (1 − d_j / n_j) with d_j churns at t_j over
    the n_j still at risk. One row per churn time with the risk set,
    event/censor counts, and the survival probability — the LTV
    denominator q189's parametric fit approximates; run both and the
    gap between the KM steps and the exponential curve is the
    model-misfit signal.

    Scale: spans are one per-user min/max aggregate over the fact;
    everything after lives on the tiny per-duration frame (bounded by
    the observation window in days), where risk sets and the running
    product are triangular self-joins — deliberately join-shaped, not
    a global window, so the plan stays partitionable and
    audit-clean. The product is exp(Σ ln) with exact DECIMAL term
    sums, the same discipline as q96/q189.
    """
    events = load_table(spark, sf_dir, "events")
    act = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("f"), F.max(F.to_date("ts")).alias("l")
    )
    mx = act.agg(F.max("l").alias("max_d"))
    spans = act.crossJoin(F.broadcast(mx)).select(
        F.datediff(F.col("l"), F.col("f")).alias("t"),
        F.when(
            F.datediff(F.col("max_d"), F.col("l")) <= _KM_CENSOR_DAYS, 0
        )
        .otherwise(1)
        .alias("churned"),
    ).persist()
    per_t = spans.groupBy("t").agg(
        F.sum("churned").cast("long").alias("d"),
        (F.count("*") - F.sum("churned")).cast("long").alias("c"),
    )
    # risk set via triangular join on the bounded per-duration frame
    s2 = spans.select(F.col("t").alias("t2"))
    risk = (
        per_t.join(s2, F.col("t2") >= F.col("t"))
        .groupBy("t", "d", "c")
        .agg(F.count("*").cast("long").alias("n_risk"))
        .persist()
    )
    r1 = risk.filter(F.col("d") > 0).select(
        F.col("t"), F.col("d"), F.col("c"), F.col("n_risk")
    )
    r2 = risk.filter(F.col("d") > 0).select(
        F.col("t").alias("t2"),
        (
            # greatest(·,1e-300): a time where EVERYONE at risk churns
            # has term 0 — the guard keeps ln finite and S rounds to 0
            F.log(
                F.greatest(
                    F.lit(1.0)
                    - F.col("d").cast("double") / F.col("n_risk").cast("double"),
                    F.lit(1e-300),
                )
            )
        ).alias("lnterm"),
    )
    surv = (
        r1.join(F.broadcast(r2), F.col("t2") <= F.col("t"))
        .groupBy("t", "d", "c", "n_risk")
        .agg(
            F.exp(
                F.sum(F.col("lnterm").cast("decimal(38,18)")).cast("double")
            ).alias("s")
        )
    )
    return surv.select(
        F.col("t").alias("t_days"),
        "n_risk",
        F.col("d").alias("n_churned"),
        F.col("c").alias("n_censored"),
        round4(F.col("s")).alias("survival"),
    ).orderBy("t_days")


# --------------------------------------------------------------------------
# q194 — seasonal-naive forecast backtest (MAE / sMAPE per series)
# --------------------------------------------------------------------------
@query(
    "q194_forecast_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             {exact_sum_sql('value')} AS v
      FROM events GROUP BY 1, 2),
    joined AS (
      SELECT a.event_type, a.d, a.v AS actual, f.v AS forecast
      FROM daily a JOIN daily f
        ON f.event_type = a.event_type AND f.d = a.d - 7)
    SELECT event_type,
           COUNT(*) AS n_days,
           {r4('CAST(SUM(CAST(abs(actual - forecast) AS DECIMAL(30,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)')}
             AS mae,
           {r4('CAST(SUM(CAST(2.0 * abs(actual - forecast) / (abs(actual) + abs(forecast)) AS DECIMAL(38,18))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)')}
             AS smape,
           {r4('CAST(SUM(CAST(abs(actual) AS DECIMAL(30,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)')}
             AS mean_abs_actual
    FROM joined GROUP BY event_type ORDER BY event_type
    """,
    tags=("extension", "behavior", "forecasting", "backtest"),
)
def q194_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict each day's
    per-type event value with the value seven days earlier — the
    baseline every real forecasting model must beat before it ships):
    per event type, MAE and sMAPE over all days where the
    calendar lag exists, with the mean absolute actual as the scale
    reference. The forecasting sibling of q183's Markov backtest:
    same hygiene (the "model" only ever sees the past), applied to a
    numeric series. Wire a real model in by swapping the forecast
    side of the join.

    The lag is a CALENDAR join (f.d = a.d − 7), not a 7-row window
    lag — gap days would silently misalign a row-offset lag, which is
    the classic backtest bug this form avoids. Scale: the raw fact
    collapses to (type, day) exact sums first — the only pass over
    events; the lag join and error aggregates run on the tiny series
    frame, keyed by type. Error terms sum as exact decimals (sMAPE
    terms are O(1), summed at DECIMAL(38,18)).
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(exact_sum(F.col("value")).alias("v")).persist()
    f_side = daily.select(
        "event_type", F.date_add(F.col("d"), 7).alias("d"), F.col("v").alias("forecast")
    )
    joined = daily.join(f_side, ["event_type", "d"]).select(
        "event_type", F.col("v").alias("actual"), "forecast"
    )
    err = F.abs(F.col("actual") - F.col("forecast"))
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            round4(
                F.sum(err.cast("decimal(30,6)")).cast("double")
                / F.count("*").cast("double")
            ).alias("mae"),
            round4(
                F.sum(
                    (
                        F.lit(2.0)
                        * err
                        / (F.abs(F.col("actual")) + F.abs(F.col("forecast")))
                    ).cast("decimal(38,18)")
                ).cast("double")
                / F.count("*").cast("double")
            ).alias("smape"),
            round4(
                F.sum(F.abs(F.col("actual")).cast("decimal(30,6)")).cast("double")
                / F.count("*").cast("double")
            ).alias("mean_abs_actual"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q201 — grouped k-fold CV of the Markov model (algebraic leave-fold-out)
# --------------------------------------------------------------------------
_CV_K = 5
_CV_FOLD_SQL = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':fold'), 1, 8)) "
    "AS BIGINT) % 5"
)


@query(
    "q201_markov_cv",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, {_CV_FOLD_SQL} AS fold, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    big AS (
      SELECT a.fold, a.event_type AS cur, b.event_type AS nxt
      FROM seq a JOIN seq b
        ON a.user_id = b.user_id AND b.rn = a.rn + 1),
    per_fold AS (
      SELECT fold, cur, nxt, COUNT(*) AS c FROM big GROUP BY 1, 2, 3),
    tot AS (SELECT cur, nxt, SUM(c) AS t FROM per_fold GROUP BY 1, 2),
    folds AS (SELECT unnest(generate_series(0, {_CV_K - 1})) AS fold),
    train AS (
      SELECT f.fold, tot.cur, tot.nxt,
             tot.t - COALESCE(pf.c, 0) AS c_train
      FROM folds f CROSS JOIN tot
      LEFT JOIN per_fold pf
        ON pf.fold = f.fold AND pf.cur = tot.cur AND pf.nxt = tot.nxt),
    pred AS (
      SELECT fold, cur, nxt AS predicted FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fold, cur
                                     ORDER BY c_train DESC, nxt) AS rn2
        FROM train WHERE c_train > 0) WHERE rn2 = 1)
    SELECT b.fold, COUNT(*) AS n_test_bigrams,
           CAST(SUM(CASE WHEN b.nxt = p.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           {r4("CAST(SUM(CASE WHEN b.nxt = p.predicted THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")}
             AS accuracy
    FROM big b JOIN pred p ON p.fold = b.fold AND p.cur = b.cur
    GROUP BY b.fold ORDER BY b.fold
    """,
    tags=("extension", "behavior", "cross-validation", "markov"),
)
def q201_markov_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated accuracy of the order-1 Markov
    next-event model, folded by USER (grouped CV — a user's bigrams
    never straddle train and test, the sequence analogue of q173's
    cluster-aware split; q183 is the temporal variant, this is the
    IID-across-users one). The scale trick is ALGEBRAIC leave-fold-out:
    instead of training 5 models over 5 copies of the
    data, bigram counts aggregate ONCE per (fold, cur, nxt) and each
    fold's training counts derive as total − own-fold — the same
    subtract-the-holdout identity that powers q's incremental
    aggregate maintenance, making 5-fold CV cost one pass plus
    a 5×|type²| grid of arithmetic. Per fold: test support and
    top-1 accuracy (ties toward the alphabetically first type).

    Scale: sequencing windows partition on user_id; everything after
    the (fold, cur, nxt) aggregate lives on a ≤5·|types|² frame
    — broadcast territory regardless of corpus size.
    """
    events = load_table(spark, sf_dir, "events")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":fold"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _CV_K
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        fold.alias("fold"),
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    big = seq.filter(F.col("nxt").isNotNull()).select("fold", "cur", "nxt").persist()
    per_fold = big.groupBy("fold", "cur", "nxt").agg(F.count("*").alias("c"))
    tot = per_fold.groupBy("cur", "nxt").agg(F.sum("c").alias("t"))
    folds = spark.range(_CV_K).select(F.col("id").cast("long").alias("fold"))
    train = (
        folds.crossJoin(tot)
        .join(per_fold, ["fold", "cur", "nxt"], "left")
        .select(
            "fold",
            "cur",
            "nxt",
            (F.col("t") - F.coalesce(F.col("c"), F.lit(0))).alias("c_train"),
        )
        .filter(F.col("c_train") > 0)
    )
    wp = Window.partitionBy("fold", "cur").orderBy(F.desc("c_train"), F.asc("nxt"))
    pred = (
        train.withColumn("rn2", F.row_number().over(wp))
        .filter(F.col("rn2") == 1)
        .select("fold", "cur", F.col("nxt").alias("predicted"))
    )
    return (
        big.join(F.broadcast(pred), ["fold", "cur"])
        .groupBy("fold")
        .agg(
            F.count("*").alias("n_test_bigrams"),
            F.sum(F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
            round4(
                F.sum(
                    F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)
                ).cast("double")
                / F.count("*").cast("double")
            ).alias("accuracy"),
        )
        .orderBy("fold")
    )


# --------------------------------------------------------------------------
# q235 — strict-order funnel conversion (view → click → purchase)
# --------------------------------------------------------------------------
_FUNNEL_WINDOW_MIN = 60


@query(
    "q235_funnel_conversion",
    oracle=f"""
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    s1 AS (SELECT DISTINCT user_id FROM v),
    s2 AS (
      SELECT DISTINCT c.user_id
      FROM c JOIN v ON v.user_id = c.user_id
       AND c.ts > v.ts
       AND c.ts <= v.ts + INTERVAL {_FUNNEL_WINDOW_MIN} MINUTE),
    s3 AS (
      SELECT DISTINCT p.user_id
      FROM p
      JOIN c ON c.user_id = p.user_id
       AND p.ts > c.ts
       AND p.ts <= c.ts + INTERVAL {_FUNNEL_WINDOW_MIN} MINUTE
      JOIN v ON v.user_id = c.user_id
       AND c.ts > v.ts
       AND c.ts <= v.ts + INTERVAL {_FUNNEL_WINDOW_MIN} MINUTE)
    SELECT stage, n_users,
           {r4("n_users * 1.0 / NULLIF((SELECT COUNT(*) FROM s1), 0)")}
             AS share_of_stage1
    FROM (
      SELECT 1 AS stage, (SELECT COUNT(*) FROM s1) AS n_users
      UNION ALL SELECT 2, (SELECT COUNT(*) FROM s2)
      UNION ALL SELECT 3, (SELECT COUNT(*) FROM s3)) t
    ORDER BY stage
    """,
    tags=("extension", "behavior", "funnel"),
)
def q235_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: users who viewed; users whose click
    followed a view within 60 minutes; users whose purchase followed
    such a click within 60 minutes — each stage's user count and its
    share of stage 1. The product-analytics primitive q184's
    attribution weights sit on top of: attribution divides credit,
    the funnel says where the population leaks.

    Plan: per-stage frames are equi-joined on user with an event-time
    range predicate — the q36 interval-join shape; at 100 TB bucket
    both sides by time window so the range predicate becomes a bucket
    equi-join plus refine, and the distinct-user counts stay
    map-side-combined. The three stage sets union into ONE
    aggregate plan (single job; the stage-1 denominator re-enters as
    a broadcast singleton) instead of three driver-side counts. Timestamps compare exactly (NTZ micros both
    engines); counts are integers; the only ratio is one division
    quantized with round4.
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("tv")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("tc")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("tp")
    )
    win = F.expr(f"INTERVAL {_FUNNEL_WINDOW_MIN} MINUTES")
    s1 = v.select("user_id").distinct()
    vc = (
        c.join(v, "user_id")
        .filter(
            (F.col("tc") > F.col("tv")) & (F.col("tc") <= F.col("tv") + win)
        )
        .select("user_id", "tc")
    )
    s2 = vc.select("user_id").distinct()
    s3 = (
        p.join(vc.select("user_id", "tc").distinct(), "user_id")
        .filter(
            (F.col("tp") > F.col("tc")) & (F.col("tp") <= F.col("tc") + win)
        )
        .select("user_id")
        .distinct()
    )
    # ONE aggregation over the union (VERDICT r3 #5-minor): the three
    # distinct stage sets union with a stage label and aggregate
    # together; the stage-1 total re-enters as a broadcast 1-row frame
    # instead of a driver-side .count() round-trip per stage.  The
    # denominator is DERIVED FROM the same ``agg`` frame (ADVICE r4) —
    # both consumers sit above the identical groupBy exchange, so
    # ReuseExchange evaluates the heavy distinct/union subtree once
    # rather than the double scan a separate staged.filter().agg()
    # denominator caused.
    staged = (
        s1.withColumn("stage", F.lit(1))
        .unionByName(s2.withColumn("stage", F.lit(2)))
        .unionByName(s3.withColumn("stage", F.lit(3)))
    )
    agg = staged.groupBy("stage").agg(
        F.count("*").cast("long").alias("n_users")
    )
    n1f = agg.filter(F.col("stage") == 1).select(
        F.col("n_users").alias("n1")
    )
    stages = spark.createDataFrame([(1,), (2,), (3,)], "stage INT")
    return (
        stages.join(agg, "stage", "left")
        .join(F.broadcast(n1f), F.lit(True), "left")
        .select(
            "stage",
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
            F.when(
                F.col("n1") > 0,
                round4(
                    F.coalesce("n_users", F.lit(0)) / F.col("n1")
                ),
            ).alias("share_of_stage1"),
        )
        .orderBy("stage")
    )


# --------------------------------------------------------------------------
# q242 — time-decayed trending activity ranking
# --------------------------------------------------------------------------
@query(
    "q242_trending_users",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS t_max FROM events),
    scored AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(
               exp(-((epoch_us(mx.t_max) - epoch_us(ts))
                     / 86400000000.0))
               AS DECIMAL(38,18))) AS DOUBLE) AS raw
      FROM events CROSS JOIN mx
      GROUP BY user_id)
    SELECT user_id, n_events,
           floor((raw) * 10000 + 0.5) / 10000 AS decayed_score
    FROM scored
    ORDER BY decayed_score DESC, user_id
    LIMIT 20
    """,
    tags=("extension", "behavior", "trending", "decay"),
)
def q242_trending_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed trending ranking: each event contributes
    ``exp(-age/24h)`` relative to the corpus horizon, summed per user —
    the recency-weighted activity score behind every trending/what's-
    hot surface (a plain count ranks dead-but-large histories first;
    exponential decay with a 1-day half-life-ish constant ranks NOW).
    Top-20 users by quantized score, ties broken by user_id.

    Determinism: age is exact integer microseconds over a double
    constant, exp runs on identical inputs on both engines, and the
    per-user sum accumulates DECIMAL(38,18) casts (q189's decay-fit
    discipline) so partition order cannot move the round4 boundary;
    the final rank orders on the QUANTIZED score. One map-side-combined
    aggregate plus a top-k — no shuffle beyond the groupBy at any
    scale.
    """
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("t_max"))
    age_us = F.expr("timestampdiff(MICROSECOND, ts, t_max)")
    decay = F.exp(-(age_us / F.lit(86400000000.0)))
    scored = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(decay.cast("decimal(38,18)"))
            .cast("double")
            .alias("raw"),
        )
    )
    return (
        scored.select(
            "user_id",
            "n_events",
            round4(F.col("raw")).alias("decayed_score"),
        )
        .orderBy(F.desc("decayed_score"), F.asc("user_id"))
        .limit(20)
    )
