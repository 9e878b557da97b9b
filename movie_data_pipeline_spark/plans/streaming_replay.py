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
from movie_data_pipeline_spark.plans.dedup import _MINHASH_LONG_CTES
from movie_data_pipeline_spark.operators.dedup import LSH_BAND_ROWS


def _await(q, what: str, timeout: int = 600) -> None:
    """Block until the stream finishes; FAIL LOUDLY on timeout.

    ``awaitTermination(timeout)`` returns False when the stream is
    still running — ignoring that (pre-round-4 behavior) would read a
    partially-written sink and rmtree directories under a live stream,
    silently corrupting the replay result (ADVICE r3)."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise RuntimeError(
            f"{what}: streaming replay did not finish within {timeout}s"
        )


def _one_part(out_dir: str, what: str) -> str:
    """Path of the single part file a ``coalesce(1)`` write produced.
    An EMPTY half (tiny or filtered corpus) writes no part file at all
    — the old ``glob(...)[0]`` raised a bare IndexError there (ADVICE
    r10); fail with the same explicit vacuous-case message q295 uses."""
    import glob as _glob

    parts = _glob.glob(f"{out_dir}/part-*.parquet")
    if not parts:
        raise AssertionError(
            f"{what}: an input half wrote no rows — the replay would "
            "be vacuous on this corpus (empty or fully filtered half)"
        )
    return parts[0]


def _assert_single_file(path: str, what: str) -> None:
    """q205/q210's oracles pin SINGLE-micro-batch semantics; the batch
    count follows the source file count under availableNow.  The
    testdata tables are one parquet file today, but ``stream_table``
    also accepts directory layouts — if the layout ever grows more
    part files these oracles would silently diverge (ADVICE r3), so a
    layout change must fail loudly instead."""
    import glob as _glob
    import os as _os

    if _os.path.isdir(path):
        parts = [
            p
            for p in _glob.glob(_os.path.join(path, "**", "*.parquet"),
                                recursive=True)
            if _os.path.isfile(p)
        ]
    else:
        parts = [path]
    if len(parts) != 1:
        raise AssertionError(
            f"{what}: oracle pins single-batch semantics but source "
            f"{path} has {len(parts)} parquet files (≥2 micro-batches); "
            "use the multi-batch replay (q244) for that layout"
        )


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
        _await(q, "q204")
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


@query(
    "q205_streaming_dedup_gate",
    oracle=f"""
    WITH {_MINHASH_LONG_CTES},
    bands AS (
      SELECT doc_id, h_idx // {LSH_BAND_ROWS} AS band,
             string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY h_idx)
               AS band_sig
      FROM sigs GROUP BY doc_id, band),
    dupes AS (
      SELECT DISTINCT y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig
       AND x.doc_id < y.doc_id)
    SELECT d.doc_id, d.source
    FROM documents d LEFT JOIN dupes ON d.doc_id = dupes.doc_b
    WHERE dupes.doc_b IS NULL
    ORDER BY d.doc_id
    """,
    tags=("extension", "streaming", "dedup", "ingest-gate"),
)
def q205_streaming_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming NEAR-DUP INGEST GATE replay, hash-verified:
    stream the documents table through ``streaming/sinks.
    start_dedup_gate_stream`` (per-micro-batch MinHash signing,
    within-batch keep-first, (band, band_sig) join against the stored
    corpus index, docs-then-index VersionedTable commits) and return
    the accepted corpus. The oracle is the gate's single-batch
    semantics in pure SQL: a document is accepted iff it is not the
    HIGHER id of any LSH band collision — exactly the greedy
    min-representative policy the gate applies within a batch.

    The testdata table is one parquet file, so availableNow runs ONE
    micro-batch and the oracle is exact; on a multi-file source the
    gate's output is arrival-order-dependent by design (that is its
    production contract — first-seen wins), which is why the
    hash-verified replay pins the single-batch case and the multi-batch
    behavior is covered by the ordering-aware unit tests
    (tests/test_dedup_gate.py).
    """
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.events import stream_table
    from movie_data_pipeline_spark.streaming.sinks import (
        start_dedup_gate_stream,
    )

    from movie_data_pipeline_spark.sources.registry import table_path

    _assert_single_file(table_path(sf_dir, "documents"), "q205")
    base = tempfile.mkdtemp(prefix="mdp-q205-")
    acc, idx, ckpt = f"{base}/acc", f"{base}/idx", f"{base}/ckpt"
    try:
        docs = stream_table(spark, sf_dir, "documents")
        q = start_dedup_gate_stream(docs, acc, idx, ckpt)
        _await(q, "q205")
        result = (
            VersionedTable(acc)
            .read(spark)
            .select("doc_id", "source")
            .orderBy("doc_id")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q220_streaming_join_replay",
    oracle="""
    WITH c AS (
      SELECT user_id, ts AS click_ts, event_id AS click_id
      FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase')
    SELECT c.click_id, p.purchase_id,
           CAST(epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS BIGINT)
             AS lag_us,
           floor((p.purchase_value) * 10000 + 0.5) / 10000
             AS purchase_value
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND p.purchase_ts >= c.click_ts
     AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
    ORDER BY click_id, purchase_id
    """,
    tags=("extension", "streaming", "stream-stream-join"),
)
def q220_streaming_join_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end STREAM-STREAM JOIN replay, hash-verified: split the
    event stream into a click stream and a purchase stream (two
    independent watermarked readers of the same source), run the real
    streaming interval join (``streaming/events.
    click_purchase_join_stream`` — equi-key on user, event-time bounded
    both ends so state expires), land the matches append-mode, and
    return them. The oracle is the equivalent batch interval join in
    SQL — equality proves the streaming state machine buffers,
    matches, and emits exactly the relational join result.

    Determinism: an append-mode stream-stream inner join emits exactly
    the predicate-satisfying pairs whatever the micro-batch slicing;
    output rows carry only integer ids, an exact microsecond lag
    (second-granularity epoch would round vs floor differently across
    engines on sub-second timestamps), and a round4-quantized value,
    and the presentation sort is applied after reading the sink back.
    """
    from movie_data_pipeline_spark.streaming.events import (
        click_purchase_join_stream,
        stream_table,
    )

    base = tempfile.mkdtemp(prefix="mdp-q220-")
    out, ckpt = f"{base}/out", f"{base}/ckpt"
    try:
        ev = stream_table(spark, sf_dir, "events")
        # NTZ→instant conversion matches stream_events (footer-sniffed)
        from movie_data_pipeline_spark.sources.registry import (
            _events_ts_is_nanos,
            table_path,
        )

        micros = (
            "ts div 1000"
            if _events_ts_is_nanos(table_path(sf_dir, "events"))
            else "ts"
        )
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr(micros)))
        joined = click_purchase_join_stream(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _await(q, "q220")
        result = (
            spark.read.parquet(out)
            .select(
                "click_id",
                "purchase_id",
                (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
                .cast("long")
                .alias("lag_us"),
                round4(F.col("purchase_value")).alias("purchase_value"),
            )
            .orderBy("click_id", "purchase_id")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q221_streaming_session_replay",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR date_diff('microsecond', LAG(ts) OVER w, ts)
                       >= 900000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts, value,
             -- same (ts, event_id) tiebreak as the gap-marking window:
             -- ts-only ordering could assign two same-ts events
             -- different sids depending on engine tie order (ADVICE r3)
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(MAX(ts) + INTERVAL 15 MINUTE) AS BIGINT)
             AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           floor((CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS total_value
    FROM numbered
    GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
    tags=("extension", "streaming", "session-window"),
)
def q221_streaming_session_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end NATIVE SESSION WINDOW replay, hash-verified: stream
    the events table through the engine-owned session aggregation
    (``F.session_window`` with a 15-minute gap — state merges inside
    the streaming aggregation, no hand-rolled timeout bookkeeping) in
    COMPLETE mode (the output mode session-window streaming
    aggregations support besides append; append would withhold every
    session the watermark hasn't passed at end-of-input, and update is
    rejected by the planner), land each batch's full result via
    foreachBatch overwrite — last batch wins, so the final table
    equals the total aggregate under ANY micro-batch slicing — and
    return the final sessions. The oracle derives the identical
    sessions relationally (LAG gap-marking + running session id —
    q95's batch spelling). Equality proves the streaming session-merge
    state machine produces exactly the relational gap-sessionization.
    Session bounds are emitted as epoch micros (timezone-safe under
    any driver session); the value sum is per-term DECIMAL(30,6)
    casts.
    """
    from movie_data_pipeline_spark.sources.registry import (
        _events_ts_is_nanos,
        table_path,
    )
    from movie_data_pipeline_spark.streaming.events import stream_table

    base = tempfile.mkdtemp(prefix="mdp-q221-")
    out, ckpt = f"{base}/out", f"{base}/ckpt"
    try:
        ev = stream_table(spark, sf_dir, "events")
        micros = (
            "ts div 1000"
            if _events_ts_is_nanos(table_path(sf_dir, "events"))
            else "ts"
        )
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr(micros)))
        sessions = (
            ev.withWatermark("ts", "2 hours")
            .groupBy("user_id", F.session_window("ts", "15 minutes"))
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.sum(F.col("value").cast("decimal(30,6)")).alias("sv"),
            )
            .select(
                "user_id",
                F.unix_micros(F.col("session_window.start")).alias(
                    "session_start_us"
                ),
                F.unix_micros(F.col("session_window.end")).alias(
                    "session_end_us"
                ),
                "n_events",
                "sv",
            )
        )

        def _overwrite(batch_df, batch_id) -> None:
            # complete mode: each batch carries the FULL result
            batch_df.localCheckpoint(eager=True).write.mode(
                "overwrite"
            ).parquet(out)

        q = (
            sessions.writeStream.foreachBatch(_overwrite)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await(q, "q221")
        result = (
            spark.read.parquet(out)
            .select(
                "user_id",
                "session_start_us",
                "session_end_us",
                "n_events",
                round4(F.col("sv").cast("double")).alias("total_value"),
            )
            .orderBy("user_id", "session_start_us")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q210_streaming_drift_replay",
    oracle="""
    WITH base AS (
      SELECT event_type,
             COUNT(*) * 1.0 / (SELECT COUNT(*) FROM events
                               WHERE user_id % 2 = 0) AS share
      FROM events WHERE user_id % 2 = 0
      GROUP BY event_type),
    n AS (SELECT COUNT(*) AS n_events FROM events),
    obs AS (SELECT event_type, COUNT(*) AS cnt FROM events
            GROUP BY event_type),
    terms AS (
      SELECT b.share, COALESCE(o.cnt, 0) AS obs_cnt
      FROM base b LEFT JOIN obs o USING (event_type)),
    chi AS (
      SELECT SUM((obs_cnt - share * n_events)
                 * (obs_cnt - share * n_events)
                 / (share * n_events)) AS chi2
      FROM terms CROSS JOIN n),
    novel AS (
      SELECT COUNT(*) AS n_novel_types
      FROM obs WHERE event_type NOT IN (SELECT event_type FROM base))
    SELECT CAST(0 AS BIGINT) AS batch_id,
           CAST(n.n_events AS BIGINT) AS n_events,
           floor((chi.chi2) * 10000 + 0.5) / 10000 AS chi2,
           CAST(novel.n_novel_types AS BIGINT) AS n_novel_types
    FROM n CROSS JOIN chi CROSS JOIN novel
    """,
    tags=("extension", "streaming", "drift", "monitoring"),
)
def q210_streaming_drift_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end streaming DRIFT-MONITOR replay, hash-verified: fit
    the baseline event-type mix on the even-user half of the corpus
    (the 'history' a monitor is calibrated on), stream ALL events
    through ``streaming/sinks.start_mix_drift_stream`` (per-micro-batch
    chi-square goodness-of-fit vs the collected baseline, one log row
    per batch), and return the monitoring log. The oracle recomputes
    the same chi-square in SQL over the raw table — equality proves
    the Python-side writer math (the one foreachBatch sink whose score
    is computed driver-side on metadata-sized aggregates) matches the
    relational definition.

    Determinism: one micro-batch (single-file source), baseline shares
    are single IEEE divisions, chi2 terms are identical elementary ops
    on both engines and the ~|event types| terms are round4-quantized
    after summing (term count is tiny; cross-engine sum-order noise is
    ~1e-16 against a 5e-5 quantum).
    """
    from movie_data_pipeline_spark.sources.registry import load_table
    from movie_data_pipeline_spark.streaming.events import stream_table
    from movie_data_pipeline_spark.streaming.sinks import (
        start_mix_drift_stream,
    )

    from movie_data_pipeline_spark.sources.registry import table_path

    _assert_single_file(table_path(sf_dir, "events"), "q210")
    events = load_table(spark, sf_dir, "events")
    half = events.filter(F.col("user_id") % 2 == 0)
    n_half = half.count()
    baseline = half.groupBy("event_type").agg(
        (F.count("*") / F.lit(float(n_half))).alias("share")
    )

    base = tempfile.mkdtemp(prefix="mdp-q210-")
    out, ckpt = f"{base}/log", f"{base}/ckpt"
    try:
        q = start_mix_drift_stream(
            stream_table(spark, sf_dir, "events"), baseline, out, ckpt
        )
        _await(q, "q210")
        result = spark.read.parquet(out).select(
            "batch_id",
            "n_events",
            round4(F.col("chi2")).alias("chi2"),
            "n_novel_types",
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q244_streaming_multibatch_gate",
    oracle=f"""
    WITH {_MINHASH_LONG_CTES},
    bands AS (
      SELECT doc_id, h_idx // {LSH_BAND_ROWS} AS band,
             string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY h_idx)
               AS band_sig
      FROM sigs GROUP BY doc_id, band),
    b0 AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
    b1 AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
    d0 AS (
      SELECT DISTINCT y.doc_id
      FROM b0 x JOIN b0 y
        ON x.band = y.band AND x.band_sig = y.band_sig
       AND x.doc_id < y.doc_id),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 0
        AND doc_id NOT IN (SELECT doc_id FROM d0)),
    idx0 AS (
      SELECT band, band_sig FROM b0 JOIN acc0 USING (doc_id)),
    d1 AS (
      SELECT DISTINCT y.doc_id
      FROM b1 x JOIN b1 y
        ON x.band = y.band AND x.band_sig = y.band_sig
       AND x.doc_id < y.doc_id),
    hit1 AS (
      SELECT DISTINCT b1.doc_id
      FROM b1 JOIN idx0 USING (band, band_sig)),
    acc1 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT doc_id FROM d1)
        AND doc_id NOT IN (SELECT doc_id FROM hit1))
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN (SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1) a
      USING (doc_id)
    ORDER BY d.doc_id
    """,
    tags=("extension", "streaming", "dedup", "ingest-gate", "multi-batch"),
)
def q244_streaming_multibatch_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTI-batch ingest-gate replay, hash-verified (VERDICT r3 #7):
    q205 pins the single-batch case, so the cross-batch path — batch 2
    joined against the VersionedTable LSH index that batch 1 committed
    — was only unit-tested. Here the documents table is split into two
    deterministic source files (even doc_ids, then odd doc_ids, with
    strictly increasing mtimes so the file-stream source orders them),
    streamed with ``maxFilesPerTrigger=1`` under availableNow — two
    micro-batches, ASSERTED from the index table's commit count, so a
    silent single-batch run fails loudly instead of vacuously passing.
    The oracle spells the gate's two-step semantics in SQL: batch-0
    docs survive within-batch keep-first; batch-1 docs must ALSO miss
    every (band, band_sig) the accepted batch-0 docs committed to the
    index. Equality proves the stored-index equi-join — the O(batch)
    incremental path a continuous crawl runs — computes exactly the
    greedy first-seen-wins corpus the batch SQL defines.

    The two-file split is replay scaffolding (a production crawl is
    already multi-file); the distributed write stays in Spark and the
    driver only renames the part files.
    """
    import glob as _glob
    import os as _os

    from movie_data_pipeline_spark.sources.registry import load_table
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.sinks import (
        start_dedup_gate_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="mdp-q244-")
    src = f"{base}/src"
    acc, idx, ckpt = f"{base}/acc", f"{base}/idx", f"{base}/ckpt"
    _os.makedirs(src)
    try:
        for i, half in enumerate(
            (
                docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1),
            )
        ):
            out = f"{base}/half{i}"
            half.coalesce(1).write.parquet(out)
            part = _one_part(out, "q244")
            dest = f"{src}/{i}_half.parquet"
            _os.rename(part, dest)
            # strictly increasing mtimes: the file-stream source lists
            # oldest-first, so evens form batch 0, odds batch 1
            _os.utime(dest, (1_000_000 + i * 100, 1_000_000 + i * 100))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_dedup_gate_stream(stream, acc, idx, ckpt)
        _await(q, "q244")
        # Multi-batch assertion from the QUERY'S OWN progress, not the
        # index commit count (ADVICE r4): dedup_gate_batch_writer skips
        # the index commit for a zero-survivor micro-batch, so a
        # legitimately all-duplicate batch would false-alarm an
        # index-commit assertion even though two batches ran.
        fed = {
            p["batchId"]
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        }
        if len(fed) < 2:
            raise AssertionError(
                f"q244: expected >=2 data-carrying micro-batches, got "
                f"batchIds {sorted(fed)} — the stream did not run "
                f"multi-batch"
            )
        result = (
            VersionedTable(acc)
            .read(spark)
            .select("doc_id", "source")
            .orderBy("doc_id")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q267_streaming_closed_window_ledger",
    oracle=f"""
    WITH fwm AS (
      SELECT (epoch_us(MAX(ts)) // 1000 - 7200000) * 1000 AS wm_us
      FROM events),
    closed AS (
      SELECT e.ts, e.event_type, e.value
      FROM events e, fwm
      WHERE epoch_us(date_trunc('hour', e.ts)) + 3600000000 <= fwm.wm_us)
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ts_hour_epoch,
           event_type,
           COUNT(*) AS n_events,
           {r4("CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)")}
             AS sum_value
    FROM closed
    GROUP BY 1, 2
    ORDER BY ts_hour_epoch, event_type
    """,
    tags=("extension", "streaming", "watermark", "append-mode"),
)
def q267_streaming_closed_window_ledger(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """APPEND-mode watermark replay, hash-verified: the emit-on-close
    ledger. q204 verifies update-mode (every batch re-publishes
    cumulative rows); this verifies the OTHER production contract —
    each (hour, event_type) window is published EXACTLY ONCE, when the
    watermark passes its end, and windows still open at shutdown are
    withheld (the q221 lesson, here as the verified semantic instead
    of the avoided one). The events table streams as two
    deterministic mtime-ordered files (even user_ids then odd,
    ``maxFilesPerTrigger=1``) so the watermark genuinely advances
    across batches and the final empty availableNow batch flushes the
    last closed tranche.

    Empirically pinned semantics (Spark 4.1, measured before writing
    the oracle): late batch-1 rows belonging to still-unclosed windows
    MERGE into state before eviction — numRowsDroppedByWatermark stays
    0 in this layout — so the ledger equals the batch aggregate over
    every event whose hour-window end <= the FINAL watermark, where
    the watermark is max event time floored to MILLISECONDS minus the
    2 h delay (Spark tracks event-time stats in ms), mirrored as exact
    integer microseconds in the oracle. Guards: >=2 data-carrying
    batches asserted from query progress, and the withheld-open-tail
    property asserted (the sink must contain FEWER window rows than
    the unrestricted aggregate — a run that published open windows is
    not append semantics and fails loudly).

    Scale: state is bounded by open windows x event types; each sink
    append commit is one closed tranche — the versioned-table commit
    ledger (q244's machinery) gives readers snapshot isolation over
    exactly-once-published windows.
    """
    import glob as _glob
    import os as _os

    from movie_data_pipeline_spark.schemas import TESTDATA_SCHEMAS
    from movie_data_pipeline_spark.sources.registry import (
        _events_ts_is_nanos,
        table_path,
    )
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.events import (
        hourly_type_totals_stream,
    )
    from movie_data_pipeline_spark.streaming.sinks import (
        start_versioned_append_stream,
    )

    src_path = table_path(sf_dir, "events")
    raw = spark.read.schema(TESTDATA_SCHEMAS["events"]).parquet(src_path)
    # normalize the physical encoding ONCE at split time (the replay
    # files then always carry micros longs, whatever the driver shipped)
    us = "ts div 1000" if _events_ts_is_nanos(src_path) else "ts"
    raw = raw.withColumn("ts", F.expr(us))

    base = tempfile.mkdtemp(prefix="mdp-q267-")
    src = f"{base}/src"
    table, ckpt = f"{base}/table", f"{base}/ckpt"
    _os.makedirs(src)
    try:
        for i, half in enumerate(
            (
                raw.filter(F.col("user_id") % 2 == 0),
                raw.filter(F.col("user_id") % 2 == 1),
            )
        ):
            out = f"{base}/half{i}"
            half.coalesce(1).write.parquet(out)
            part = _one_part(out, "q267")
            dest = f"{src}/{i}_half.parquet"
            _os.rename(part, dest)
            _os.utime(dest, (1_000_000 + i * 100, 1_000_000 + i * 100))
        stream = (
            spark.readStream.schema(TESTDATA_SCHEMAS["events"])
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumn("ts", F.timestamp_micros(F.col("ts")))
        )
        stats = hourly_type_totals_stream(stream)
        q = start_versioned_append_stream(stats, table, ckpt)
        _await(q, "q267")
        # The oracle reproduces the sink only if NO late input row was
        # dropped pre-aggregation (merge-before-evict, the r6 empirical
        # finding this plan relies on). Assert it loudly per ADVICE r6:
        # a Spark-version or layout change that starts dropping batch-1
        # stragglers must fail HERE, not as a downstream driver hash
        # mismatch.
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
        if dropped:
            raise AssertionError(
                f"q267: {dropped} input rows dropped by watermark — the "
                "merge-before-evict premise no longer holds and the "
                "batch oracle cannot mirror this sink"
            )
        fed = {
            p["batchId"]
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        }
        if len(fed) < 2:
            raise AssertionError(
                f"q267: expected >=2 data-carrying micro-batches, got "
                f"batchIds {sorted(fed)}"
            )
        sink = VersionedTable(table).read(spark)
        n_sink = sink.count()
        n_all = (
            raw.select(
                F.expr("ts div 3600000000").alias("h"), "event_type"
            )
            .distinct()
            .count()
        )
        if not n_sink < n_all:
            raise AssertionError(
                f"q267: sink published {n_sink} windows but the "
                f"unrestricted aggregate has {n_all} — open windows "
                "were not withheld; this is not append semantics"
            )
        result = sink.select(
            "ts_hour_epoch",
            "event_type",
            "n_events",
            round4(F.col("sum_value").cast("double")).alias("sum_value"),
        ).orderBy("ts_hour_epoch", "event_type")
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q287 — SimHash INCREMENTAL INDEX GATE replay (round 9, VERDICT r8 #4)
# --------------------------------------------------------------------------
def _q287_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CTES,
        _render_simhash_band_ctes,
    )

    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_band_ctes(forced_rung=1)},
    cand AS (
      SELECT DISTINCT b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 5)
    SELECT d.doc_id, d.source
    FROM documents d LEFT JOIN cand ON d.doc_id = cand.doc_b
    WHERE cand.doc_b IS NULL
    ORDER BY d.doc_id
    """


@query(
    "q287_simhash_index_gate",
    oracle=_q287_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "ingest-gate"),
)
def q287_simhash_index_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming SIMHASH ingest gate replay, hash-verified
    (round 9, VERDICT r8 #4): stream the documents table through
    ``streaming/sinks.start_simhash_gate_stream`` — per-micro-batch
    60-bit fingerprinting, within-batch keep-first over ladder-banded
    Hamming<=5 pairs, (band_idx, band_val) join against the stored
    (doc_id, simhash, band_idx, band_val) index with exact XOR-popcount
    verification, docs-then-index VersionedTable commits — and return
    the accepted corpus. q205 is the same contract on the MinHash
    index; this exercises the round-9 band ladder the way production
    ingest would: candidates from the pinned-rung band join, novelty
    decided by the exact Hamming bar, the index growing by exactly the
    accepted documents' band rows.

    The oracle is the gate's single-batch semantics in pure SQL
    (forced rung 1 — the gate's pinned index rung): a document is
    accepted iff it is not the HIGHER id of any Hamming<=5 banded
    collision — the greedy min-representative policy. Single-batch
    pinning and the multi-file caveat are q205's verbatim
    (_assert_single_file); crash/replay idempotency is covered by the
    ordering-aware unit tests (tests/test_simhash_gate.py), which
    prove convergence across a crash planted between the two commits.
    """
    from movie_data_pipeline_spark.sources.registry import table_path
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.events import stream_table
    from movie_data_pipeline_spark.streaming.sinks import (
        start_simhash_gate_stream,
    )

    _assert_single_file(table_path(sf_dir, "documents"), "q287")
    base = tempfile.mkdtemp(prefix="mdp-q287-")
    acc, idx, ckpt = f"{base}/acc", f"{base}/idx", f"{base}/ckpt"
    try:
        docs = stream_table(spark, sf_dir, "documents")
        q = start_simhash_gate_stream(docs, acc, idx, ckpt, rung=1)
        _await(q, "q287")
        result = (
            VersionedTable(acc)
            .read(spark)
            .select("doc_id", "source")
            .orderBy("doc_id")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q292 — MULTI-batch SimHash gate replay (round 9; q244's twin)
# --------------------------------------------------------------------------
def _q292_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CTES,
        _render_simhash_band_ctes,
    )

    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_band_ctes(forced_rung=1)},
    b0 AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
    b1 AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
    d0 AS (
      SELECT DISTINCT y.doc_id
      FROM b0 x JOIN b0 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 0
        AND doc_id NOT IN (SELECT doc_id FROM d0)),
    idx0 AS (
      SELECT band_idx, band_val, simhash
      FROM b0 JOIN acc0 USING (doc_id)),
    d1 AS (
      SELECT DISTINCT y.doc_id
      FROM b1 x JOIN b1 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    hit1 AS (
      SELECT DISTINCT b1.doc_id
      FROM b1 JOIN idx0 USING (band_idx, band_val)
      WHERE bit_count(xor(b1.simhash, idx0.simhash)) <= 5),
    acc1 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT doc_id FROM d1)
        AND doc_id NOT IN (SELECT doc_id FROM hit1))
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN (SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1) a
      USING (doc_id)
    ORDER BY d.doc_id
    """


@query(
    "q292_simhash_multibatch_gate",
    oracle=_q292_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "ingest-gate",
          "multi-batch"),
)
def q292_simhash_multibatch_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTI-batch SimHash gate replay, hash-verified (round 9): q287
    pins the single-batch case; here the documents table splits into
    two deterministic source files (even then odd doc_ids, strictly
    increasing mtimes) streamed with ``maxFilesPerTrigger=1`` — two
    micro-batches asserted from the query's own progress — so the
    CROSS-BATCH path is what the driver verifies: batch-1 docs joined
    against the (band_idx, band_val, simhash) index that batch 0
    committed, with exact Hamming<=5 verification at the join. The
    oracle spells both steps in SQL at the gate's pinned rung. q244 is
    the same contract on the MinHash index; equality here proves the
    stored SimHash band index — the O(batch) incremental path of the
    round-9 ladder — computes exactly the greedy first-seen-wins
    corpus the batch SQL defines.
    """
    import glob as _glob
    import os as _os

    from movie_data_pipeline_spark.sources.registry import load_table
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.sinks import (
        start_simhash_gate_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="mdp-q292-")
    src = f"{base}/src"
    acc, idx, ckpt = f"{base}/acc", f"{base}/idx", f"{base}/ckpt"
    _os.makedirs(src)
    try:
        for i, half in enumerate(
            (
                docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1),
            )
        ):
            out = f"{base}/half{i}"
            half.coalesce(1).write.parquet(out)
            part = _one_part(out, "q292")
            dest = f"{src}/{i}_half.parquet"
            _os.rename(part, dest)
            _os.utime(dest, (1_000_000 + i * 100, 1_000_000 + i * 100))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_simhash_gate_stream(stream, acc, idx, ckpt, rung=1)
        _await(q, "q292")
        fed = {
            p["batchId"]
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        }
        if len(fed) < 2:
            raise AssertionError(
                f"q292: expected >=2 data-carrying micro-batches, got "
                f"batchIds {sorted(fed)} — the stream did not run "
                f"multi-batch"
            )
        result = (
            VersionedTable(acc)
            .read(spark)
            .select("doc_id", "source")
            .orderBy("doc_id")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q295 — index ERASURE lifecycle audit (round 10, VERDICT r9 #1a)
# --------------------------------------------------------------------------
def _q295_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CTES,
        _render_simhash_band_ctes,
    )

    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_band_ctes(forced_rung=1)},
    cand AS (
      SELECT DISTINCT b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_b FROM cand)),
    erased AS (SELECT doc_id FROM acc0 WHERE doc_id % 7 = 3),
    m(metric, value) AS (
      SELECT 'n_accepted_final',
             (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_accepted_initial',
             (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_erased',
             (SELECT COUNT(*) FROM erased)
      UNION ALL SELECT 'n_index_rows_after_scrub',
             6 * ((SELECT COUNT(*) FROM acc0)
                  - (SELECT COUNT(*) FROM erased))
      UNION ALL SELECT 'n_index_rows_before_scrub',
             6 * (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_index_rows_final',
             6 * (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_phantom_rows_after_scrub', 0
      UNION ALL SELECT 'n_phantom_rows_before_scrub',
             6 * (SELECT COUNT(*) FROM erased)
      UNION ALL SELECT 'n_reaccepted',
             (SELECT COUNT(*) FROM erased))
    SELECT metric, CAST(value AS BIGINT) AS value
    FROM m ORDER BY metric
    """


@query(
    "q295_index_erasure_audit",
    oracle=_q295_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "lifecycle",
          "erasure"),
)
def q295_index_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure LIFECYCLE audit over a gated corpus and its
    stored SimHash band index (round 10, VERDICT r9 #1a) — the full
    cadence, driver-verified end to end:

    1. stream the documents table through the rung-1 SimHash ingest
       gate (q287's replay) → accepted corpus v0 + band index v0;
    2. ``operators/index_lifecycle.erase_documents``: delete every
       accepted doc with ``doc_id % 7 = 3`` from the corpus AND scrub
       its band rows from the index in the same commit cadence —
       before round 10 those signatures lived in the index forever,
       leaving 64-bit fingerprint residue after an erasure and
       suppressing future near-duplicates as phantom hits;
    3. re-submit exactly the erased documents (time-travel read of
       corpus v0) through the same gate: with the index scrubbed they
       are accepted AGAIN — the suppression is provably gone.

    The returned audit is nine (metric, value) rows computed purely by
    TIME TRAVEL over the lifecycle's committed snapshots — counts and
    anti-join phantom counts at each version — so what the oracle
    verifies is the versioned history the machinery actually wrote.
    The oracle derives every number from first principles: acc0 is
    the rung-1 gate's greedy min-representative corpus (rung 1 is
    pigeonhole-EXACT for the Hamming<=5 bar, so any two accepted docs
    are > 5 bits apart — which also proves the re-submitted erased
    set collides with nothing and re-enters whole), each accepted doc
    contributes exactly 6 rung-1 band rows, and the post-scrub
    phantom count is identically zero.

    Scale: every leg is the gate's audited machinery plus constant-
    version VersionedTable reads; the scrub itself is one semi-join
    rewrite, linear in index size (operators/index_lifecycle).
    """
    from functools import reduce

    from movie_data_pipeline_spark.operators.index_lifecycle import (
        erase_documents,
    )
    from movie_data_pipeline_spark.sources.registry import table_path
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.events import stream_table
    from movie_data_pipeline_spark.streaming.sinks import (
        simhash_gate_batch_writer,
        start_simhash_gate_stream,
    )

    _assert_single_file(table_path(sf_dir, "documents"), "q295")
    base = tempfile.mkdtemp(prefix="mdp-q295-")
    acc, idx, ckpt = f"{base}/acc", f"{base}/idx", f"{base}/ckpt"
    try:
        docs = stream_table(spark, sf_dir, "documents")
        q = start_simhash_gate_stream(docs, acc, idx, ckpt, rung=1)
        _await(q, "q295")

        acc_t, idx_t = VersionedTable(acc), VersionedTable(idx)
        # Snapshot the to-be-erased rows BEFORE the delete (they are
        # re-submitted in step 3); materialized because the temp dir
        # is removed in finally.
        resub = (
            acc_t.read(spark)
            .filter(F.expr("doc_id % 7 = 3"))
            .localCheckpoint(eager=True)
        )
        if resub.isEmpty():
            raise AssertionError(
                "q295: erase condition matched no accepted documents — "
                "the lifecycle audit would be vacuous"
            )
        erase_documents(spark, acc, [idx], "doc_id % 7 = 3")
        # corpus/index versions: v0 initial, v1 post-erase/post-scrub
        simhash_gate_batch_writer(acc, idx, rung=1)(resub, 99)
        # v2: re-submission commit on both tables

        acc0 = acc_t.read(spark, version=0).select("doc_id")
        acc1 = acc_t.read(spark, version=1).select("doc_id")
        acc2 = acc_t.read(spark, version=2).select("doc_id")
        idx0 = idx_t.read(spark, version=0)
        idx1 = idx_t.read(spark, version=1)
        idx2 = idx_t.read(spark, version=2)

        def metric(name: str, frame: DataFrame) -> DataFrame:
            return frame.agg(
                F.count("*").cast("long").alias("value")
            ).select(F.lit(name).alias("metric"), "value")

        rows = [
            metric("n_accepted_final", acc2),
            metric("n_accepted_initial", acc0),
            metric("n_erased", acc0.join(acc1, "doc_id", "left_anti")),
            metric("n_index_rows_after_scrub", idx1),
            metric("n_index_rows_before_scrub", idx0),
            metric("n_index_rows_final", idx2),
            metric(
                "n_phantom_rows_after_scrub",
                idx1.join(acc1, "doc_id", "left_anti"),
            ),
            metric(
                "n_phantom_rows_before_scrub",
                idx0.join(acc1, "doc_id", "left_anti"),
            ),
            metric("n_reaccepted", acc2.join(acc1, "doc_id", "left_anti")),
        ]
        result = reduce(DataFrame.unionByName, rows).orderBy("metric")
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q296 — SimHash index RUNG MIGRATION replay (round 10, VERDICT r9 #1b)
# --------------------------------------------------------------------------
def _q296_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CTES,
        _render_simhash_allrung_ctes,
    )

    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_allrung_ctes()},
    b0 AS (
      SELECT a.doc_id, f.simhash, a.band_idx, a.band_val
      FROM allbands a JOIN fingerprints f USING (doc_id)
      WHERE a.rung = 1 AND a.doc_id % 2 = 0),
    d0 AS (
      SELECT DISTINCT y.doc_id
      FROM b0 x JOIN b0 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 0
        AND doc_id NOT IN (SELECT doc_id FROM d0)),
    idxmig AS (
      SELECT a.doc_id, f.simhash, a.band_idx, a.band_val
      FROM allbands a
      JOIN fingerprints f USING (doc_id)
      JOIN acc0 USING (doc_id)
      WHERE a.rung = 2),
    b1 AS (
      SELECT a.doc_id, f.simhash, a.band_idx, a.band_val
      FROM allbands a JOIN fingerprints f USING (doc_id)
      WHERE a.rung = 2 AND a.doc_id % 2 = 1),
    d1 AS (
      SELECT DISTINCT y.doc_id
      FROM b1 x JOIN b1 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    hit1 AS (
      SELECT DISTINCT b1.doc_id
      FROM b1 JOIN idxmig
        ON b1.band_idx = idxmig.band_idx
       AND b1.band_val = idxmig.band_val
      WHERE bit_count(xor(b1.simhash, idxmig.simhash)) <= 5),
    acc1 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT doc_id FROM d1)
        AND doc_id NOT IN (SELECT doc_id FROM hit1))
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN (SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1) a
      USING (doc_id)
    ORDER BY d.doc_id
    """


@query(
    "q296_simhash_rung_migration",
    oracle=_q296_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "lifecycle",
          "migration"),
)
def q296_simhash_rung_migration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SimHash index RUNG MIGRATION across a live gate boundary
    (round 10, VERDICT r9 #1b): before this round, a SimHash index
    whose corpus outgrew its pinned band rung had only a documented
    failure mode — band rows from different rungs never join, so a
    resized writer either raised (after the r9 validation) or, unfixed,
    silently accepted every duplicate. The missing operator is
    ``operators/index_lifecycle.migrate_simhash_index``: re-band the
    index's own stored fingerprints at the next rung — NO text
    re-fingerprinting, one map-only overwrite commit that updates the
    manifest's pinned ``simhash_rung`` in the same snapshot.

    The replay drives the whole boundary: even doc_ids stream through
    a rung-1 gate (batch 0 → corpus + rung-1 index), the index is
    MIGRATED to rung 2, then odd doc_ids stream through a rung-2 gate
    whose manifest validation now passes — its within-batch keep-first
    and its (band_idx, band_val) corpus join both run on rung-2 bands
    against the MIGRATED rows. The oracle spells out both batches at
    their respective rungs from one all-rung band table: batch-1
    novelty is decided by rung-2 banded candidates (guaranteed
    complete for Hamming<=4; band-sampled at 5 — exactly what the
    production layout computes) verified at the exact <=5 bar against
    batch-0's accepted fingerprints. Equality proves the migrated
    index is byte-equivalent to an index BUILT at rung 2 over the same
    corpus — the migration loses nothing and invents nothing.
    """
    import glob as _glob
    import os as _os

    from movie_data_pipeline_spark.operators.index_lifecycle import (
        migrate_simhash_index,
    )
    from movie_data_pipeline_spark.sources.registry import load_table
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.sinks import (
        start_simhash_gate_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="mdp-q296-")
    acc, idx = f"{base}/acc", f"{base}/idx"
    try:
        streams = []
        for i, half in enumerate(
            (
                docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1),
            )
        ):
            src = f"{base}/src{i}"
            _os.makedirs(src)
            out = f"{base}/half{i}"
            half.coalesce(1).write.parquet(out)
            part = _one_part(out, "q296")
            _os.rename(part, f"{src}/{i}_half.parquet")
            streams.append(
                spark.readStream.schema(docs.schema).parquet(src)
            )

        q0 = start_simhash_gate_stream(
            streams[0], acc, idx, f"{base}/ckpt0", rung=1
        )
        _await(q0, "q296 batch 0")
        migrate_simhash_index(spark, idx, 2)
        q1 = start_simhash_gate_stream(
            streams[1], acc, idx, f"{base}/ckpt1", rung=2
        )
        _await(q1, "q296 batch 1")

        result = (
            VersionedTable(acc)
            .read(spark)
            .select("doc_id", "source")
            .orderBy("doc_id")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q299 — erasure + VACUUM retention compliance audit (round 10)
# --------------------------------------------------------------------------
def _q299_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CTES,
        _render_simhash_band_ctes,
    )

    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_band_ctes(forced_rung=1)},
    cand AS (
      SELECT DISTINCT b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_b FROM cand)),
    erased AS (SELECT doc_id FROM acc0 WHERE doc_id % 5 = 1),
    m(metric, value) AS (
      SELECT 'n_accepted_final',
             (SELECT COUNT(*) FROM acc0) - (SELECT COUNT(*) FROM erased)
      UNION ALL SELECT 'n_accepted_initial',
             (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_data_dirs_corpus', 1
      UNION ALL SELECT 'n_data_dirs_index', 1
      UNION ALL SELECT 'n_erased',
             (SELECT COUNT(*) FROM erased)
      UNION ALL SELECT 'n_erased_leaks_corpus', 0
      UNION ALL SELECT 'n_erased_leaks_index', 0
      UNION ALL SELECT 'n_versions_retained_corpus', 1
      UNION ALL SELECT 'n_versions_retained_index', 1)
    SELECT metric, CAST(value AS BIGINT) AS value
    FROM m ORDER BY metric
    """


@query(
    "q299_erasure_vacuum_compliance",
    oracle=_q299_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "lifecycle",
          "erasure", "vacuum"),
)
def q299_erasure_vacuum_compliance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Erasure + VACUUM retention COMPLIANCE audit (round 10): q295
    proves the scrub removes phantom index rows from the CURRENT
    snapshot while deliberately retaining history; strict
    right-to-erasure additionally requires that NO RETAINED snapshot —
    corpus or index — still references the erased documents, which is
    the ``erase_documents(..., vacuum_keep_last=1)`` cadence. The
    replay: rung-1 SimHash gate over the documents stream, then one
    compliance-mode erasure of every accepted doc with
    ``doc_id % 5 = 1`` (corpus delete_where + index scrub + vacuum of
    BOTH tables down to the single post-erasure version).

    The audit proves physical retirement, not just logical deletion:
    exactly one manifest version and one data directory remain per
    table (delete_where and the scrub each rewrite into one fresh dir;
    vacuum unlinked every pre-erasure manifest AND deleted the data
    dirs they referenced — counted from the filesystem), and scanning
    every retained version of both tables for the erased doc_ids finds
    zero rows. The oracle derives the expected corpus from the gate's
    greedy min-representative semantics (rung 1 exact at Hamming<=5)
    and pins the leak counts at identically zero and the retention
    counts at identically one.
    """
    import os as _os

    from movie_data_pipeline_spark.operators.index_lifecycle import (
        erase_documents,
    )
    from movie_data_pipeline_spark.sources.registry import table_path
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.events import stream_table
    from movie_data_pipeline_spark.streaming.sinks import (
        start_simhash_gate_stream,
    )

    _assert_single_file(table_path(sf_dir, "documents"), "q299")
    base = tempfile.mkdtemp(prefix="mdp-q299-")
    acc, idx, ckpt = f"{base}/acc", f"{base}/idx", f"{base}/ckpt"
    try:
        docs = stream_table(spark, sf_dir, "documents")
        q = start_simhash_gate_stream(docs, acc, idx, ckpt, rung=1)
        _await(q, "q299")

        acc_t, idx_t = VersionedTable(acc), VersionedTable(idx)
        # Pre-erasure observation, materialized: vacuum will retire
        # the snapshot these rows come from.
        initial_ids = (
            acc_t.read(spark).select("doc_id").localCheckpoint(eager=True)
        )
        erased_ids = initial_ids.filter(
            F.expr("doc_id % 5 = 1")
        ).localCheckpoint(eager=True)
        if erased_ids.isEmpty():
            raise AssertionError(
                "q299: erase condition matched no accepted documents"
            )
        erase_documents(
            spark, acc, [idx], "doc_id % 5 = 1", vacuum_keep_last=1
        )

        def count_metric(name: str, frame: DataFrame) -> DataFrame:
            return frame.agg(
                F.count("*").cast("long").alias("value")
            ).select(F.lit(name).alias("metric"), "value")

        def lit_metric(name: str, value: int) -> DataFrame:
            return spark.range(1).select(
                F.lit(name).alias("metric"),
                F.lit(int(value)).cast("long").alias("value"),
            )

        def data_dirs(t: VersionedTable) -> int:
            return len(_os.listdir(_os.path.join(t.path, "data")))

        # leak scan: every RETAINED version of both tables
        leaks_corpus = [
            acc_t.read(spark, version=v).select("doc_id")
            .join(erased_ids, "doc_id", "left_semi")
            for v in acc_t.versions()
        ]
        leaks_index = [
            idx_t.read(spark, version=v).select("doc_id")
            .join(erased_ids, "doc_id", "left_semi")
            for v in idx_t.versions()
        ]
        from functools import reduce

        rows = [
            count_metric("n_accepted_final", acc_t.read(spark)),
            count_metric("n_accepted_initial", initial_ids),
            lit_metric("n_data_dirs_corpus", data_dirs(acc_t)),
            lit_metric("n_data_dirs_index", data_dirs(idx_t)),
            count_metric("n_erased", erased_ids),
            count_metric(
                "n_erased_leaks_corpus",
                reduce(DataFrame.unionByName, leaks_corpus),
            ),
            count_metric(
                "n_erased_leaks_index",
                reduce(DataFrame.unionByName, leaks_index),
            ),
            lit_metric(
                "n_versions_retained_corpus", len(acc_t.versions())
            ),
            lit_metric("n_versions_retained_index", len(idx_t.versions())),
        ]
        result = reduce(DataFrame.unionByName, rows).orderBy("metric")
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q301 — MinHash index erasure audit (round 10; q295's twin on the
# OTHER stored index)
# --------------------------------------------------------------------------
@query(
    "q301_minhash_index_erasure",
    oracle=f"""
    WITH {_MINHASH_LONG_CTES},
    bands AS (
      SELECT doc_id, h_idx // {LSH_BAND_ROWS} AS band,
             string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY h_idx)
               AS band_sig
      FROM sigs GROUP BY doc_id, band),
    dupes AS (
      SELECT DISTINCT y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig
       AND x.doc_id < y.doc_id),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_b FROM dupes)),
    erased AS (SELECT doc_id FROM acc0 WHERE doc_id % 6 = 2),
    m(metric, value) AS (
      SELECT 'n_accepted_final',
             (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_accepted_initial',
             (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_erased',
             (SELECT COUNT(*) FROM erased)
      UNION ALL SELECT 'n_index_rows_after_scrub',
             4 * ((SELECT COUNT(*) FROM acc0)
                  - (SELECT COUNT(*) FROM erased))
      UNION ALL SELECT 'n_index_rows_before_scrub',
             4 * (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_index_rows_final',
             4 * (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_phantom_rows_after_scrub', 0
      UNION ALL SELECT 'n_phantom_rows_before_scrub',
             4 * (SELECT COUNT(*) FROM erased)
      UNION ALL SELECT 'n_reaccepted',
             (SELECT COUNT(*) FROM erased))
    SELECT metric, CAST(value AS BIGINT) AS value
    FROM m ORDER BY metric
    """,
    tags=("extension", "streaming", "dedup", "minhash", "lifecycle",
          "erasure"),
)
def q301_minhash_index_erasure(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash-index erasure lifecycle audit (round 10) — q295's exact
    cadence driven through the OTHER stored band index (the q205/q126
    MinHash LSH gate), so BOTH index layouts VERDICT r9 #1 names carry
    a driver-green erasure proof: gate the documents stream (16-hash
    MinHash signatures, 4 bands of 4 rows), erase every accepted doc
    with ``doc_id % 6 = 2`` via ``erase_documents`` (corpus
    delete_where + same-cadence index scrub — the scrub operator is
    layout-agnostic because both indexes key rows by doc_id), then
    re-submit the erased rows and prove they are ACCEPTED again. Nine
    time-travel metrics over the committed snapshots, each derived in
    the oracle from the gate's greedy min-representative semantics:
    any two accepted docs share NO band signature (a shared band would
    have dropped the higher id), so the scrubbed index cannot hit a
    re-submitted erased doc and each accepted doc contributes exactly
    4 band rows.
    """
    from functools import reduce

    from movie_data_pipeline_spark.operators.index_lifecycle import (
        erase_documents,
    )
    from movie_data_pipeline_spark.sources.registry import table_path
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.events import stream_table
    from movie_data_pipeline_spark.streaming.sinks import (
        dedup_gate_batch_writer,
        start_dedup_gate_stream,
    )

    _assert_single_file(table_path(sf_dir, "documents"), "q301")
    base = tempfile.mkdtemp(prefix="mdp-q301-")
    acc, idx, ckpt = f"{base}/acc", f"{base}/idx", f"{base}/ckpt"
    try:
        docs = stream_table(spark, sf_dir, "documents")
        q = start_dedup_gate_stream(docs, acc, idx, ckpt)
        _await(q, "q301")

        acc_t, idx_t = VersionedTable(acc), VersionedTable(idx)
        resub = (
            acc_t.read(spark)
            .filter(F.expr("doc_id % 6 = 2"))
            .localCheckpoint(eager=True)
        )
        if resub.isEmpty():
            raise AssertionError(
                "q301: erase condition matched no accepted documents"
            )
        erase_documents(spark, acc, [idx], "doc_id % 6 = 2")
        dedup_gate_batch_writer(acc, idx)(resub, 99)

        acc0 = acc_t.read(spark, version=0).select("doc_id")
        acc1 = acc_t.read(spark, version=1).select("doc_id")
        acc2 = acc_t.read(spark, version=2).select("doc_id")
        idx0 = idx_t.read(spark, version=0)
        idx1 = idx_t.read(spark, version=1)
        idx2 = idx_t.read(spark, version=2)

        def metric(name: str, frame: DataFrame) -> DataFrame:
            return frame.agg(
                F.count("*").cast("long").alias("value")
            ).select(F.lit(name).alias("metric"), "value")

        rows = [
            metric("n_accepted_final", acc2),
            metric("n_accepted_initial", acc0),
            metric("n_erased", acc0.join(acc1, "doc_id", "left_anti")),
            metric("n_index_rows_after_scrub", idx1),
            metric("n_index_rows_before_scrub", idx0),
            metric("n_index_rows_final", idx2),
            metric(
                "n_phantom_rows_after_scrub",
                idx1.join(acc1, "doc_id", "left_anti"),
            ),
            metric(
                "n_phantom_rows_before_scrub",
                idx0.join(acc1, "doc_id", "left_anti"),
            ),
            metric("n_reaccepted", acc2.join(acc1, "doc_id", "left_anti")),
        ]
        result = reduce(DataFrame.unionByName, rows).orderBy("metric")
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q302 — MID-STREAM erasure between micro-batches (round 10)
# --------------------------------------------------------------------------
def _q302_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CTES,
        _render_simhash_band_ctes,
    )

    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_band_ctes(forced_rung=1)},
    b0 AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
    b1 AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
    d0 AS (
      SELECT DISTINCT y.doc_id
      FROM b0 x JOIN b0 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 0
        AND doc_id NOT IN (SELECT doc_id FROM d0)),
    kept AS (SELECT doc_id FROM acc0 WHERE doc_id % 10 <> 0),
    idx1 AS (
      SELECT band_idx, band_val, simhash
      FROM b0 JOIN kept USING (doc_id)),
    d1 AS (
      SELECT DISTINCT y.doc_id
      FROM b1 x JOIN b1 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    hit1 AS (
      SELECT DISTINCT b1.doc_id
      FROM b1 JOIN idx1 USING (band_idx, band_val)
      WHERE bit_count(xor(b1.simhash, idx1.simhash)) <= 5),
    acc1 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT doc_id FROM d1)
        AND doc_id NOT IN (SELECT doc_id FROM hit1))
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN (SELECT doc_id FROM kept UNION ALL SELECT doc_id FROM acc1) a
      USING (doc_id)
    ORDER BY d.doc_id
    """


@query(
    "q302_midstream_erasure_gate",
    oracle=_q302_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "lifecycle",
          "erasure", "multi-batch"),
)
def q302_midstream_erasure_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MID-STREAM erasure replay (round 10): the erasure lifecycle run
    where production runs it — BETWEEN micro-batches of a live ingest
    gate, not on a quiesced table. Batch 0 (even doc_ids) flows
    through the rung-1 SimHash gate; every accepted doc with
    ``doc_id % 10 = 0`` is then erased (corpus delete_where + index
    scrub in one ``erase_documents`` cadence); batch 1 (odd doc_ids)
    flows through the SAME gate against the scrubbed index.

    What the hash-compare proves: (a) the gate keeps operating
    correctly across an erasure — batch 1 is still deduped against
    every REMAINING indexed doc with exact Hamming<=5 verification;
    (b) the erasure's operational consequence is visible end to end —
    an odd near-duplicate of an ERASED even doc is now ACCEPTED
    (before the scrub its phantom band rows would have rejected it),
    and erased docs stay OUT of the final corpus unless re-submitted.
    The oracle spells all four steps in SQL at the pinned rung: the
    batch-0 greedy corpus, the erased subset, batch-1 novelty decided
    against the KEPT docs' bands only, and the final union.
    """
    import glob as _glob
    import os as _os

    from movie_data_pipeline_spark.operators.index_lifecycle import (
        erase_documents,
    )
    from movie_data_pipeline_spark.sources.registry import load_table
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.sinks import (
        start_simhash_gate_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="mdp-q302-")
    acc, idx = f"{base}/acc", f"{base}/idx"
    try:
        streams = []
        for i, half in enumerate(
            (
                docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1),
            )
        ):
            src = f"{base}/src{i}"
            _os.makedirs(src)
            out = f"{base}/half{i}"
            half.coalesce(1).write.parquet(out)
            part = _one_part(out, "q302")
            _os.rename(part, f"{src}/{i}_half.parquet")
            streams.append(
                spark.readStream.schema(docs.schema).parquet(src)
            )

        q0 = start_simhash_gate_stream(
            streams[0], acc, idx, f"{base}/ckpt0", rung=1
        )
        _await(q0, "q302 batch 0")
        erase_documents(spark, acc, [idx], "doc_id % 10 = 0")
        q1 = start_simhash_gate_stream(
            streams[1], acc, idx, f"{base}/ckpt1", rung=1
        )
        _await(q1, "q302 batch 1")

        result = (
            VersionedTable(acc)
            .read(spark)
            .select("doc_id", "source")
            .orderBy("doc_id")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q307 — balanced-banding + rung migration across a live gate (round 11,
# VERDICT r10 #1 — the mitigation's lifecycle leg)
# --------------------------------------------------------------------------
def _q307_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CTES,
        _render_simhash_allrung_ctes,
    )

    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_allrung_ctes()},
    b0 AS (
      SELECT a.doc_id, f.simhash, a.band_idx, a.band_val
      FROM allbands a JOIN fingerprints f USING (doc_id)
      WHERE a.rung = 1 AND a.doc_id % 2 = 0),
    d0 AS (
      SELECT DISTINCT y.doc_id
      FROM b0 x JOIN b0 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 0
        AND doc_id NOT IN (SELECT doc_id FROM d0)),
    bitgrid AS (SELECT j AS bit_idx FROM generate_series(0, 59) t(j)),
    pb AS (
      SELECT bit_idx,
             SUM((simhash // CAST(2 ** bit_idx AS BIGINT)) % 2) AS n_set,
             COUNT(*) AS n
      FROM fingerprints JOIN acc0 USING (doc_id)
      CROSS JOIN bitgrid GROUP BY bit_idx),
    asg AS (
      SELECT bit_idx,
             ROW_NUMBER() OVER (ORDER BY ABS(2 * n_set - n) DESC,
                                bit_idx) - 1 AS r
      FROM pb),
    asg2 AS (
      SELECT bit_idx,
             (CASE WHEN (r // 6) % 2 = 0 THEN r % 6
                   ELSE 5 - (r % 6) END) * 10 + (r // 6) AS newpos
      FROM asg),
    permuted AS (
      SELECT f.doc_id,
             CAST(SUM(((f.simhash // CAST(2 ** a.bit_idx AS BIGINT)) % 2)
                      * CAST(2 ** a.newpos AS BIGINT)) AS BIGINT) AS simhash
      FROM fingerprints f CROSS JOIN asg2 a
      GROUP BY f.doc_id),
    {_render_simhash_allrung_ctes(src="permuted", out="pallbands",
                                  blks="pblks", with_combos=False)},
    idxmig AS (
      SELECT a.doc_id, p.simhash, a.band_idx, a.band_val
      FROM pallbands a
      JOIN permuted p USING (doc_id)
      JOIN acc0 USING (doc_id)
      WHERE a.rung = 2),
    b1 AS (
      SELECT a.doc_id, p.simhash, a.band_idx, a.band_val
      FROM pallbands a JOIN permuted p USING (doc_id)
      WHERE a.rung = 2 AND a.doc_id % 2 = 1),
    d1 AS (
      SELECT DISTINCT y.doc_id
      FROM b1 x JOIN b1 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    hit1 AS (
      SELECT DISTINCT b1.doc_id
      FROM b1 JOIN idxmig
        ON b1.band_idx = idxmig.band_idx
       AND b1.band_val = idxmig.band_val
      WHERE bit_count(xor(b1.simhash, idxmig.simhash)) <= 5),
    acc1 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT doc_id FROM d1)
        AND doc_id NOT IN (SELECT doc_id FROM hit1))
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN (SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1) a
      USING (doc_id)
    ORDER BY d.doc_id
    """


@query(
    "q307_banding_migration_gate",
    oracle=_q307_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "lifecycle",
          "migration", "skew", "mitigation"),
)
def q307_banding_migration_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Entropy-balanced BANDING migration across a live gate boundary
    (round 11, VERDICT r10 #1): the operational leg of the skew
    mitigation — an index built under the naive band layout is
    re-banded under the measured balanced assignment WITHOUT touching
    document text, and the gate keeps deduplicating correctly across
    the boundary.

    The replay: even doc_ids stream through a rung-1 gate (naive
    banding); the balanced assignment is MEASURED from the index's own
    stored fingerprints (operators/dedup.measure_balanced_bit_blocks —
    one 61-column aggregate, no text access); ONE
    ``migrate_simhash_index`` commit re-bands at rung 2 under that
    assignment and atomically pins both ``simhash_rung`` and
    ``simhash_bit_blocks`` in the manifest; odd doc_ids then stream
    through a rung-2 gate pinned to the same assignment — its manifest
    validation passes, and its within-batch keep-first and index join
    both run on PERMUTED band values with the exact Hamming<=5 bar
    (permutation-invariant) against the migrated rows.

    The oracle derives everything from first principles: batch-0's
    greedy rung-1 corpus, the per-bit counts of exactly those accepted
    fingerprints, the integer snake assignment (the same arithmetic as
    the Python operator, rank by |2*n_set - n| DESC then bit_idx),
    the permuted fingerprints, and batch-1 novelty via permuted rung-2
    bands verified at the exact bar. Equality proves the migrated
    index is byte-equivalent to one BUILT balanced at rung 2 — the
    banding migration loses nothing, invents nothing, and the gate's
    pinned-assignment validation holds across it.
    """
    import os as _os

    from movie_data_pipeline_spark.operators.dedup import (
        measure_balanced_bit_blocks,
    )
    from movie_data_pipeline_spark.operators.index_lifecycle import (
        migrate_simhash_index,
    )
    from movie_data_pipeline_spark.sources.registry import load_table
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.sinks import (
        start_simhash_gate_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="mdp-q307-")
    acc, idx = f"{base}/acc", f"{base}/idx"
    try:
        streams = []
        for i, half in enumerate(
            (
                docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1),
            )
        ):
            src = f"{base}/src{i}"
            _os.makedirs(src)
            out = f"{base}/half{i}"
            half.coalesce(1).write.parquet(out)
            part = _one_part(out, "q307")
            _os.rename(part, f"{src}/{i}_half.parquet")
            streams.append(
                spark.readStream.schema(docs.schema).parquet(src)
            )

        q0 = start_simhash_gate_stream(
            streams[0], acc, idx, f"{base}/ckpt0", rung=1
        )
        _await(q0, "q307 batch 0")
        blocks = measure_balanced_bit_blocks(
            VersionedTable(idx)
            .read(spark)
            .select("doc_id", "simhash")
            .distinct()
        )
        migrate_simhash_index(spark, idx, 2, bit_blocks=blocks)
        q1 = start_simhash_gate_stream(
            streams[1], acc, idx, f"{base}/ckpt1", rung=2,
            bit_blocks=blocks,
        )
        _await(q1, "q307 batch 1")

        result = (
            VersionedTable(acc)
            .read(spark)
            .select("doc_id", "source")
            .orderBy("doc_id")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q308 — partitioned-index erasure: the scrub that PRUNES (round 11,
# VERDICT r10 #2)
# --------------------------------------------------------------------------
def _q308_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CTES,
        _render_simhash_band_ctes,
    )

    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_band_ctes(forced_rung=1)},
    cand AS (
      SELECT DISTINCT b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_b FROM cand)),
    erased AS (SELECT doc_id FROM acc0 WHERE doc_id % 16 = 3),
    m(metric, value) AS (
      SELECT 'n_accepted_final', (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_accepted_initial', (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_buckets_touched',
             (SELECT COUNT(DISTINCT doc_id % 8) FROM erased)
      UNION ALL SELECT 'n_erased', (SELECT COUNT(*) FROM erased)
      UNION ALL SELECT 'n_index_rows_after_scrub',
             6 * ((SELECT COUNT(*) FROM acc0)
                  - (SELECT COUNT(*) FROM erased))
      UNION ALL SELECT 'n_index_rows_before_scrub',
             6 * (SELECT COUNT(*) FROM acc0)
      UNION ALL SELECT 'n_parts_inherited',
             (SELECT COUNT(DISTINCT doc_id % 8) FROM acc0)
             - (SELECT COUNT(DISTINCT doc_id % 8) FROM erased)
      UNION ALL SELECT 'n_phantom_rows_after_scrub', 0
      UNION ALL SELECT 'n_reaccepted', (SELECT COUNT(*) FROM erased))
    SELECT metric, CAST(value AS BIGINT) AS value
    FROM m ORDER BY metric
    """


@query(
    "q308_partitioned_index_erasure",
    oracle=_q308_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "lifecycle",
          "erasure", "partitioning"),
)
def q308_partitioned_index_erasure(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITIONED-index erasure replay (round 11, VERDICT r10 #2):
    q295 proved the erasure scrub's semantics; its cost model was a
    full-index rewrite per commit. This replay drives the same cadence
    through a BUCKETED index (``index_bucket_k=8``: band rows
    Hive-partitioned by ``doc_id mod 8``, layout pinned in the
    manifest's ``partition_by``/``bucket_k`` properties and validated
    per batch) and proves the scrub now PRUNES:

    1. documents stream through the rung-1 SimHash gate with the
       bucketed index layout;
    2. ``erase_documents`` with ``doc_id % 16 = 3`` — a predicate that
       by construction touches exactly ONE bucket (16 is a multiple of
       8), the worst case for a full rewrite and the best case for
       pruning;
    3. the scrub's ``overwrite_partitions`` commit rewrites only the
       touched bucket; every other bucket is inherited BY REFERENCE
       from the parent data dir — ``n_parts_inherited`` is read from
       the committed MANIFEST itself (physical proof, not a plan
       claim), and ``n_buckets_touched`` is the complement against the
       pre-scrub bucket census;
    4. the erased docs are re-submitted and accepted again — phantom
       suppression gone, exactly as on the unpartitioned layout.

    The oracle derives every number from the gate's greedy rung-1
    semantics and integer bucket arithmetic: erased ids ≡ 3 (mod 16)
    all fall in bucket 3, so exactly one bucket is touched and the
    other occupied buckets are inherited. Scale: the scrub's cost is
    one ≤8-row bucket census + a rewrite of the touched bucket —
    proportional to the erased fraction, not the index
    (tools/lifecycle_probe.py measures the scaling).
    """
    import json as _json
    import os as _os
    from functools import reduce

    from movie_data_pipeline_spark.operators.index_lifecycle import (
        erase_documents,
    )
    from movie_data_pipeline_spark.sources.registry import table_path
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.events import stream_table
    from movie_data_pipeline_spark.streaming.sinks import (
        simhash_gate_batch_writer,
        start_simhash_gate_stream,
    )

    _assert_single_file(table_path(sf_dir, "documents"), "q308")
    base = tempfile.mkdtemp(prefix="mdp-q308-")
    acc, idx, ckpt = f"{base}/acc", f"{base}/idx", f"{base}/ckpt"
    try:
        docs = stream_table(spark, sf_dir, "documents")
        q = start_simhash_gate_stream(
            docs, acc, idx, ckpt, rung=1, index_bucket_k=8
        )
        _await(q, "q308")

        acc_t, idx_t = VersionedTable(acc), VersionedTable(idx)
        resub = (
            acc_t.read(spark)
            .filter(F.expr("doc_id % 16 = 3"))
            .localCheckpoint(eager=True)
        )
        if resub.isEmpty():
            raise AssertionError(
                "q308: erase condition matched no accepted documents — "
                "the lifecycle audit would be vacuous"
            )
        pre_buckets = (
            idx_t.read(spark).select("pbucket").distinct().count()
        )
        erase_documents(spark, acc, [idx], "doc_id % 16 = 3")
        # physical pruning proof: the post-scrub manifest inherits the
        # untouched buckets from the parent dir by reference
        with open(
            _os.path.join(idx, "_manifests",
                          f"{idx_t.current_version():012d}.json")
        ) as fh:
            post = _json.load(fh)
        assert post["mode"] == "overwrite_partitions", post["mode"]
        n_inherited = sum(
            len(e["parts"]) for e in post["data_dirs"] if isinstance(e, dict)
        )
        n_touched = pre_buckets - n_inherited
        simhash_gate_batch_writer(acc, idx, rung=1, index_bucket_k=8)(
            resub, 99
        )

        acc0 = acc_t.read(spark, version=0).select("doc_id")
        acc1 = acc_t.read(spark, version=1).select("doc_id")
        acc2 = acc_t.read(spark, version=2).select("doc_id")
        idx0 = idx_t.read(spark, version=0)
        idx1 = idx_t.read(spark, version=1)

        def metric(name: str, frame: DataFrame) -> DataFrame:
            return frame.agg(
                F.count("*").cast("long").alias("value")
            ).select(F.lit(name).alias("metric"), "value")

        def const(name: str, value: int) -> DataFrame:
            return spark.createDataFrame(
                [(name, int(value))], "metric STRING, value LONG"
            )

        rows = [
            metric("n_accepted_final", acc2),
            metric("n_accepted_initial", acc0),
            const("n_buckets_touched", n_touched),
            metric("n_erased", acc0.join(acc1, "doc_id", "left_anti")),
            metric("n_index_rows_after_scrub", idx1),
            metric("n_index_rows_before_scrub", idx0),
            const("n_parts_inherited", n_inherited),
            metric(
                "n_phantom_rows_after_scrub",
                idx1.join(acc1, "doc_id", "left_anti"),
            ),
            metric("n_reaccepted", acc2.join(acc1, "doc_id", "left_anti")),
        ]
        result = reduce(DataFrame.unionByName, rows).orderBy("metric")
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q311 — centered-fingerprint gate with index-pinned thresholds
# (round 11; the operational leg of q305/q306)
# --------------------------------------------------------------------------
def _q311_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_VOTE_CTES,
        _render_simhash_band_ctes,
    )

    return f"""
    WITH {_SIMHASH_VOTE_CTES},
    vtot AS (
      SELECT bit_idx, SUM(vote) AS s, COUNT(*) AS n
      FROM votes WHERE doc_id % 2 = 0 GROUP BY bit_idx),
    fingerprints AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN vote * n > s THEN pow2 ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM votes JOIN vtot USING (bit_idx) GROUP BY doc_id),
    {_render_simhash_band_ctes(forced_rung=1)},
    b0 AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
    b1 AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
    d0 AS (
      SELECT DISTINCT y.doc_id
      FROM b0 x JOIN b0 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 0
        AND doc_id NOT IN (SELECT doc_id FROM d0)),
    idx1 AS (
      SELECT band_idx, band_val, simhash
      FROM b0 JOIN acc0 USING (doc_id)),
    d1 AS (
      SELECT DISTINCT y.doc_id
      FROM b1 x JOIN b1 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    hit1 AS (
      SELECT DISTINCT b1.doc_id
      FROM b1 JOIN idx1 USING (band_idx, band_val)
      WHERE bit_count(xor(b1.simhash, idx1.simhash)) <= 5),
    acc1 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT doc_id FROM d1)
        AND doc_id NOT IN (SELECT doc_id FROM hit1))
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN (SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1) a
      USING (doc_id)
    ORDER BY d.doc_id
    """


@query(
    "q311_centered_gate_replay",
    oracle=_q311_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "lifecycle",
          "mitigation", "centered"),
)
def q311_centered_gate_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CENTERED-fingerprint ingest gate with INDEX-PINNED thresholds
    (round 11): q305/q306 prove centered fingerprints restore bit
    balance and collapse the band-collision floor to ~1x; their
    operational contract — the per-bit thresholds are corpus
    statistics that must be FROZEN at index build, exactly like the
    band rung — is what this replay drives end to end:

    1. even doc_ids stream through the centered rung-1 gate; the FIRST
       batch measures the thresholds from its own documents
       (operators/dedup.measure_center_thresholds) and the index
       commit pins them in the manifest
       (``simhash_center_s``/``simhash_center_n``);
    2. odd doc_ids stream through the SAME gate: it reads the PINNED
       thresholds from the manifest and fingerprints batch 1 in the
       same space (re-measuring from batch 1 would silently fork the
       fingerprint space — the rung failure mode again; a
       zero-threshold writer on this index fails the manifest
       validation loudly, unit-tested);
    3. the accepted corpus is returned.

    The oracle derives the thresholds from the even documents' votes
    alone, fingerprints ALL documents under them, and replays both
    batches at rung 1 with exact Hamming<=5 verification — equality
    proves the pinned-threshold space is consistent across batches and
    the gate's greedy semantics are unchanged by the centered family.
    """
    import os as _os

    from movie_data_pipeline_spark.sources.registry import load_table
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.sinks import (
        start_simhash_gate_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="mdp-q311-")
    acc, idx = f"{base}/acc", f"{base}/idx"
    try:
        streams = []
        for i, half in enumerate(
            (
                docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1),
            )
        ):
            src = f"{base}/src{i}"
            _os.makedirs(src)
            out = f"{base}/half{i}"
            half.coalesce(1).write.parquet(out)
            part = _one_part(out, "q311")
            _os.rename(part, f"{src}/{i}_half.parquet")
            streams.append(
                spark.readStream.schema(docs.schema).parquet(src)
            )

        q0 = start_simhash_gate_stream(
            streams[0], acc, idx, f"{base}/ckpt0", rung=1, centered=True
        )
        _await(q0, "q311 batch 0")
        meta = VersionedTable(idx).manifest()["meta"]
        assert "simhash_center_s" in meta, "thresholds not pinned"
        q1 = start_simhash_gate_stream(
            streams[1], acc, idx, f"{base}/ckpt1", rung=1, centered=True
        )
        _await(q1, "q311 batch 1")
        # batch 1 must NOT have re-pinned: thresholds unchanged
        meta2 = VersionedTable(idx).manifest()["meta"]
        assert meta2["simhash_center_s"] == meta["simhash_center_s"]
        assert meta2["simhash_center_n"] == meta["simhash_center_n"]

        result = (
            VersionedTable(acc)
            .read(spark)
            .select("doc_id", "source")
            .orderBy("doc_id")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q312 — small-file COMPACTION under a live gate (round 11; the OPTIMIZE
# cadence for per-batch append commits)
# --------------------------------------------------------------------------
def _q312_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CTES,
        _render_simhash_band_ctes,
    )

    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_band_ctes(forced_rung=1)},
    b0 AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
    b1 AS (SELECT * FROM bands WHERE doc_id % 3 = 1),
    b2 AS (SELECT * FROM bands WHERE doc_id % 3 = 2),
    d0 AS (
      SELECT DISTINCT y.doc_id
      FROM b0 x JOIN b0 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 3 = 0
        AND doc_id NOT IN (SELECT doc_id FROM d0)),
    idx0 AS (SELECT band_idx, band_val, simhash
             FROM b0 JOIN acc0 USING (doc_id)),
    d1 AS (
      SELECT DISTINCT y.doc_id
      FROM b1 x JOIN b1 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    hit1 AS (
      SELECT DISTINCT b1.doc_id
      FROM b1 JOIN idx0 USING (band_idx, band_val)
      WHERE bit_count(xor(b1.simhash, idx0.simhash)) <= 5),
    acc1 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 3 = 1
        AND doc_id NOT IN (SELECT doc_id FROM d1)
        AND doc_id NOT IN (SELECT doc_id FROM hit1)),
    idx01 AS (
      SELECT band_idx, band_val, simhash FROM idx0
      UNION ALL
      SELECT band_idx, band_val, simhash
      FROM b1 JOIN acc1 USING (doc_id)),
    d2 AS (
      SELECT DISTINCT y.doc_id
      FROM b2 x JOIN b2 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    hit2 AS (
      SELECT DISTINCT b2.doc_id
      FROM b2 JOIN idx01 USING (band_idx, band_val)
      WHERE bit_count(xor(b2.simhash, idx01.simhash)) <= 5),
    acc2 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 3 = 2
        AND doc_id NOT IN (SELECT doc_id FROM d2)
        AND doc_id NOT IN (SELECT doc_id FROM hit2)),
    acc AS (
      SELECT doc_id FROM acc0
      UNION ALL SELECT doc_id FROM acc1
      UNION ALL SELECT doc_id FROM acc2),
    m(metric, value) AS (
      SELECT 'n_accepted_after_resubmit', (SELECT COUNT(*) FROM acc)
      UNION ALL SELECT 'n_accepted_final', (SELECT COUNT(*) FROM acc)
      UNION ALL SELECT 'n_commits_corpus_before_compact',
             (SELECT COUNT(DISTINCT doc_id % 3) FROM acc)
      UNION ALL SELECT 'n_data_dirs_corpus_after_compact', 1
      UNION ALL SELECT 'n_data_dirs_index_after_compact', 1
      UNION ALL SELECT 'n_index_rows_final',
             6 * (SELECT COUNT(*) FROM acc)
      UNION ALL SELECT 'n_reaccepted_after_compact', 0
      UNION ALL SELECT 'n_resubmitted', (SELECT COUNT(*) FROM acc))
    SELECT metric, CAST(value AS BIGINT) AS value
    FROM m ORDER BY metric
    """


@query(
    "q312_gate_compaction_replay",
    oracle=_q312_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "lifecycle",
          "compaction", "multi-batch"),
)
def q312_gate_compaction_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Small-file COMPACTION under a live ingest gate (round 11): the
    gates land one append commit — one data directory — per
    micro-batch, which is exactly the small-file problem OPTIMIZE
    exists for in every lakehouse; ``VersionedTable.compact`` had only
    a unit test. The replay drives the full operational cadence:

    1. three deterministic micro-batches (doc_id mod 3, ordered by
       file mtime, ``maxFilesPerTrigger=1``) through the rung-1
       SimHash gate — ASSERTED >=3 data-carrying batches from the
       query's own progress, and the pre-compaction commit count is
       read from the manifests (one dir per batch with >=1 survivor);
    2. ``compact(target_files=1)`` on corpus AND index — one fresh
       data dir each (pinned in the hashed output), table properties
       (the pinned rung) inherited through the rewrite;
    3. the proof compaction changed NOTHING: every accepted document
       is re-submitted (same text, shifted ids) through the same gate
       against the COMPACTED index — rung 1 is exact at Hamming<=5
       and the copies are Hamming-0 hits, so ALL are rejected
       (``n_reaccepted_after_compact = 0``) and the corpus is
       byte-identical to the three-batch greedy result the oracle
       derives from first principles.

    Scale: compaction is one linear rewrite per table (coalesced);
    at deployment it runs between batches on whatever cadence the
    file-count SLO demands, and on a partitioned index it rewrites
    per partition (commit auto-partitions from the inherited table
    property). The gate keeps operating across it — snapshot
    isolation means a reader or the next batch sees pre- or
    post-compaction, never a mix.
    """
    import os as _os
    from functools import reduce

    from movie_data_pipeline_spark.sources.registry import load_table
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.sinks import (
        simhash_gate_batch_writer,
        start_simhash_gate_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="mdp-q312-")
    src = f"{base}/src"
    acc, idx, ckpt = f"{base}/acc", f"{base}/idx", f"{base}/ckpt"
    _os.makedirs(src)
    try:
        for i in range(3):
            out = f"{base}/third{i}"
            docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                out
            )
            part = _one_part(out, "q312")
            dest = f"{src}/{i}_third.parquet"
            _os.rename(part, dest)
            _os.utime(dest, (1_000_000 + i * 100, 1_000_000 + i * 100))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_simhash_gate_stream(stream, acc, idx, ckpt, rung=1)
        _await(q, "q312")
        fed = {
            p["batchId"]
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        }
        if len(fed) < 3:
            raise AssertionError(
                f"q312: expected >=3 data-carrying micro-batches, got "
                f"batchIds {sorted(fed)}"
            )
        acc_t, idx_t = VersionedTable(acc), VersionedTable(idx)
        n_commits_before = len(acc_t.manifest()["data_dirs"])
        accepted_before = acc_t.read(spark).localCheckpoint(eager=True)

        # Corpus and index compactions target DIFFERENT tables — two
        # independent eager rewrites, overlapped from driver threads so
        # each one's straggler tail back-fills the other (guide §2.6,
        # the q288 pattern; deterministic — separate directories).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            fa = pool.submit(acc_t.compact, spark, 1)
            fb = pool.submit(idx_t.compact, spark, 1)
            fa.result(), fb.result()
        dirs_acc = len(acc_t.manifest()["data_dirs"])
        dirs_idx = len(idx_t.manifest()["data_dirs"])
        # rung property must survive the compaction rewrite
        assert idx_t.manifest()["meta"]["simhash_rung"] == 1

        resub = accepted_before.withColumn(
            "doc_id", F.col("doc_id") + F.lit(1_000_000_000)
        ).localCheckpoint(eager=True)
        simhash_gate_batch_writer(acc, idx, rung=1)(resub, 99)

        acc_after = acc_t.read(spark)
        n_final = accepted_before.count()
        n_after = acc_after.count()
        reaccepted = acc_after.join(
            accepted_before.select("doc_id"), "doc_id", "left_anti"
        ).count()

        def const(metric: str, value: int) -> DataFrame:
            return spark.createDataFrame(
                [(metric, int(value))], "metric STRING, value LONG"
            )

        rows = [
            const("n_accepted_after_resubmit", n_after),
            const("n_accepted_final", n_final),
            const("n_commits_corpus_before_compact", n_commits_before),
            const("n_data_dirs_corpus_after_compact", dirs_acc),
            const("n_data_dirs_index_after_compact", dirs_idx),
            const(
                "n_index_rows_final",
                idx_t.read(spark).count(),
            ),
            const("n_reaccepted_after_compact", reaccepted),
            const("n_resubmitted", resub.count()),
        ]
        result = reduce(DataFrame.unionByName, rows).orderBy("metric")
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q313 — the RECOMMENDED gate: every scale mitigation by default (round 12,
# VERDICT r11 #1)
# --------------------------------------------------------------------------
def _q313_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_VOTE_CTES,
        _render_simhash_allrung_ctes,
    )

    return f"""
    WITH {_SIMHASH_VOTE_CTES},
    vtot AS (
      SELECT bit_idx, SUM(vote) AS s, COUNT(*) AS n
      FROM votes WHERE doc_id % 2 = 0 GROUP BY bit_idx),
    fingerprints AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN vote * n > s THEN pow2 ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM votes JOIN vtot USING (bit_idx) GROUP BY doc_id),
    bitgrid AS (SELECT j AS bit_idx FROM generate_series(0, 59) t(j)),
    pb AS (
      SELECT bit_idx,
             SUM((simhash // CAST(2 ** bit_idx AS BIGINT)) % 2) AS n_set,
             COUNT(*) AS n
      FROM fingerprints CROSS JOIN bitgrid
      WHERE doc_id % 2 = 0 GROUP BY bit_idx),
    asg AS (
      SELECT bit_idx,
             ROW_NUMBER() OVER (ORDER BY ABS(2 * n_set - n) DESC,
                                bit_idx) - 1 AS r
      FROM pb),
    asg2 AS (
      SELECT bit_idx,
             (CASE WHEN (r // 6) % 2 = 0 THEN r % 6
                   ELSE 5 - (r % 6) END) * 10 + (r // 6) AS newpos
      FROM asg),
    permuted AS (
      SELECT f.doc_id,
             CAST(SUM(((f.simhash // CAST(2 ** a.bit_idx AS BIGINT)) % 2)
                      * CAST(2 ** a.newpos AS BIGINT)) AS BIGINT) AS simhash
      FROM fingerprints f CROSS JOIN asg2 a
      GROUP BY f.doc_id),
    {_render_simhash_allrung_ctes(src="permuted", out="pallbands",
                                  blks="pblks")},
    b0 AS (
      SELECT a.doc_id, p.simhash, a.band_idx, a.band_val
      FROM pallbands a JOIN permuted p USING (doc_id)
      WHERE a.rung = 1 AND a.doc_id % 2 = 0),
    d0 AS (
      SELECT DISTINCT y.doc_id
      FROM b0 x JOIN b0 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 0
        AND doc_id NOT IN (SELECT doc_id FROM d0)),
    idx1 AS (
      SELECT band_idx, band_val, simhash
      FROM b0 JOIN acc0 USING (doc_id)),
    b1 AS (
      SELECT a.doc_id, p.simhash, a.band_idx, a.band_val
      FROM pallbands a JOIN permuted p USING (doc_id)
      WHERE a.rung = 1 AND a.doc_id % 2 = 1),
    d1 AS (
      SELECT DISTINCT y.doc_id
      FROM b1 x JOIN b1 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    hit1 AS (
      SELECT DISTINCT b1.doc_id
      FROM b1 JOIN idx1 USING (band_idx, band_val)
      WHERE bit_count(xor(b1.simhash, idx1.simhash)) <= 5),
    acc1 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT doc_id FROM d1)
        AND doc_id NOT IN (SELECT doc_id FROM hit1))
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN (SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1) a
      USING (doc_id)
    WHERE NOT (d.doc_id % 5 = 3)
    ORDER BY d.doc_id
    """


@query(
    "q313_recommended_gate_replay",
    oracle=_q313_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "lifecycle",
          "mitigation", "default"),
)
def q313_recommended_gate_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The RECOMMENDED gate end to end (round 12, VERDICT r11 #1):
    round 11 proved every scale mitigation — centered fingerprints
    (q306: collision-floor inflation ~1x vs 404x), entropy-balanced
    banding (q304/q307), bucketed index layout with pruned scrubs
    (q308: 115x less write volume) — but every one was an opt-in
    kwarg; a default-built 2026 index would rebuild round 10's
    problems. ``streaming/sinks.recommended_simhash_gate_batch_writer``
    makes the proven layout the default build path, and this replay is
    the "zero explicit tuning" proof:

    1. even doc_ids stream through
       ``start_recommended_simhash_gate_stream`` — NO tuning
       arguments. The first batch measures the centered thresholds
       AND the balanced banding assignment from itself and the first
       commit pins thresholds + assignment + bucket layout + rung in
       the manifest (asserted);
    2. odd doc_ids stream through another default-constructed gate:
       the whole configuration is ADOPTED from the manifest (asserted
       unchanged — no re-measurement fork);
    3. a right-to-erasure pass (``doc_id % 5 = 3``) runs
       ``erase_documents``: the index scrub must take the PRUNED
       overwrite_partitions path (asserted from the manifest mode)
       and leave zero phantom rows (asserted);
    4. the post-erasure corpus is returned and hash-verified.

    The oracle derives the full cadence from first principles: pinned
    thresholds from the even half's votes, the snake banding
    assignment from the even half's centered fingerprints (measured
    PRE-gate, exactly when the writer measures it), permuted rung-1
    bands with exact Hamming<=5 for both batches, then the erasure
    filter. Equality proves the default-constructed gate computes the
    same corpus as the explicitly-tuned mitigated stack.

    Scale: identical plan shapes to q311 (centered) + q307 (balanced
    banding) + q308 (pruned scrub) — one fingerprint pass per batch,
    one band equi-join per batch, erasure cost proportional to the
    erased fraction. Reference: the reference has no dedup/index story
    (etl1.py full-refresh loads only); this is the extension surface's
    default build path.
    """
    import os as _os

    from movie_data_pipeline_spark.operators.index_lifecycle import (
        count_phantom_index_rows,
        erase_documents,
    )
    from movie_data_pipeline_spark.sources.registry import load_table
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.sinks import (
        RECOMMENDED_INDEX_BUCKET_K,
        start_recommended_simhash_gate_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="mdp-q313-")
    acc, idx = f"{base}/acc", f"{base}/idx"
    try:
        streams = []
        for i, half in enumerate(
            (
                docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1),
            )
        ):
            src = f"{base}/src{i}"
            _os.makedirs(src)
            out = f"{base}/half{i}"
            half.coalesce(1).write.parquet(out)
            part = _one_part(out, "q313")
            _os.rename(part, f"{src}/{i}_half.parquet")
            streams.append(
                spark.readStream.schema(docs.schema).parquet(src)
            )

        q0 = start_recommended_simhash_gate_stream(
            streams[0], acc, idx, f"{base}/ckpt0"
        )
        _await(q0, "q313 batch 0")
        meta = VersionedTable(idx).manifest()["meta"]
        assert "simhash_center_s" in meta, "thresholds not pinned"
        assert sorted(meta["simhash_bit_blocks"]) == list(range(60))
        assert meta["bucket_k"] == RECOMMENDED_INDEX_BUCKET_K
        assert meta["partition_by"] == "pbucket"
        assert meta["simhash_rung"] == 1

        q1 = start_recommended_simhash_gate_stream(
            streams[1], acc, idx, f"{base}/ckpt1"
        )
        _await(q1, "q313 batch 1")
        meta2 = VersionedTable(idx).manifest()["meta"]
        assert meta2["simhash_center_s"] == meta["simhash_center_s"]
        assert meta2["simhash_bit_blocks"] == meta["simhash_bit_blocks"]

        erase_documents(spark, acc, [idx], "doc_id % 5 = 3")
        assert (
            VersionedTable(idx).manifest()["mode"] == "overwrite_partitions"
        ), "erasure scrub did not take the pruned path"
        assert count_phantom_index_rows(spark, idx, acc) == 0

        result = (
            VersionedTable(acc)
            .read(spark)
            .select("doc_id", "source")
            .orderBy("doc_id")
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# q317 — PRUNED compaction under a live BUCKETED gate (round 12, VERDICT
# r11 #5; q312's partitioned sibling)
# --------------------------------------------------------------------------
def _q317_oracle() -> str:
    from movie_data_pipeline_spark.plans.dedup import (
        _SIMHASH_CTES,
        _render_simhash_band_ctes,
    )

    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_band_ctes(forced_rung=1)},
    b0 AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
    b1 AS (SELECT * FROM bands WHERE doc_id % 3 = 1),
    b2 AS (SELECT * FROM bands WHERE doc_id % 3 = 2),
    d0 AS (
      SELECT DISTINCT y.doc_id
      FROM b0 x JOIN b0 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    acc0 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 3 = 0
        AND doc_id NOT IN (SELECT doc_id FROM d0)),
    idx0 AS (SELECT band_idx, band_val, simhash
             FROM b0 JOIN acc0 USING (doc_id)),
    d1 AS (
      SELECT DISTINCT y.doc_id
      FROM b1 x JOIN b1 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    hit1 AS (
      SELECT DISTINCT b1.doc_id
      FROM b1 JOIN idx0 USING (band_idx, band_val)
      WHERE bit_count(xor(b1.simhash, idx0.simhash)) <= 5),
    acc1 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 3 = 1
        AND doc_id NOT IN (SELECT doc_id FROM d1)
        AND doc_id NOT IN (SELECT doc_id FROM hit1)),
    idx01 AS (
      SELECT band_idx, band_val, simhash FROM idx0
      UNION ALL
      SELECT band_idx, band_val, simhash
      FROM b1 JOIN acc1 USING (doc_id)),
    d2 AS (
      SELECT DISTINCT y.doc_id
      FROM b2 x JOIN b2 y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.simhash, y.simhash)) <= 5),
    hit2 AS (
      SELECT DISTINCT b2.doc_id
      FROM b2 JOIN idx01 USING (band_idx, band_val)
      WHERE bit_count(xor(b2.simhash, idx01.simhash)) <= 5),
    acc2 AS (
      SELECT doc_id FROM documents
      WHERE doc_id % 3 = 2
        AND doc_id NOT IN (SELECT doc_id FROM d2)
        AND doc_id NOT IN (SELECT doc_id FROM hit2)),
    acc AS (
      SELECT doc_id FROM acc0
      UNION ALL SELECT doc_id FROM acc1
      UNION ALL SELECT doc_id FROM acc2),
    m(metric, value) AS (
      SELECT 'max_files_per_bucket_after_compact', 1
      UNION ALL SELECT 'n_accepted_final', (SELECT COUNT(*) FROM acc)
      UNION ALL SELECT 'n_data_dirs_corpus_after_compact', 1
      UNION ALL SELECT 'n_index_rows_final',
             6 * (SELECT COUNT(*) FROM acc)
      UNION ALL SELECT 'n_reaccepted_after_compact', 0
      UNION ALL SELECT 'n_resubmitted', (SELECT COUNT(*) FROM acc))
    SELECT metric, CAST(value AS BIGINT) AS value
    FROM m ORDER BY metric
    """


@query(
    "q317_bucketed_gate_compaction",
    oracle=_q317_oracle(),
    tags=("extension", "streaming", "dedup", "simhash", "lifecycle",
          "compaction", "partitioned", "multi-batch"),
)
def q317_bucketed_gate_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PRUNED compaction under a live BUCKETED gate (round 12, VERDICT
    r11 #5): q312 proved compaction under a live gate, but
    ``VersionedTable.compact`` was a full rewrite even on partitioned
    tables — a 100 TB bucketed index compaction rewrote every
    partition including single-file ones. ``compact`` now prunes: a
    per-partition file census from the manifest finds the fragmented
    partitions, only those are rewritten via ``overwrite_partitions``
    (one file per partition), single-file partitions are inherited BY
    REFERENCE, and an already-compact table is a version-preserving
    no-op. The replay is q312's cadence on the bucketed layout:

    1. three deterministic micro-batches (doc_id mod 3) through a
       rung-1 gate with ``index_bucket_k=8`` — per-batch append
       commits fragment the hot buckets;
    2. ``compact`` on corpus (unpartitioned → one data dir) AND index
       (bucketed → pruned): asserted from the manifests that the
       index compaction took the ``overwrite_partitions`` path when
       fragmentation existed, that every single-file bucket kept its
       exact physical file by reference, that every bucket holds at
       most one file after, and that the pinned rung + bucket layout
       survived;
    3. the proof compaction changed nothing: every accepted document
       re-submitted with shifted ids is REJECTED against the
       compacted index (Hamming-0 hits), and the corpus equals the
       three-batch greedy result the oracle derives from first
       principles.

    Scale: the compaction cost is proportional to the FRAGMENTED
    partition count, not the index (tools/lifecycle_probe.py carries
    the scaling row); the census is driver-side manifest metadata
    bounded by the 4096-partition fallback.
    """
    import os as _os
    from functools import reduce

    from movie_data_pipeline_spark.sources.registry import load_table
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.sinks import (
        simhash_gate_batch_writer,
        start_simhash_gate_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="mdp-q317-")
    src = f"{base}/src"
    acc, idx, ckpt = f"{base}/acc", f"{base}/idx", f"{base}/ckpt"
    _os.makedirs(src)
    try:
        for i in range(3):
            out = f"{base}/third{i}"
            docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                out
            )
            part = _one_part(out, "q317")
            dest = f"{src}/{i}_third.parquet"
            _os.rename(part, dest)
            _os.utime(dest, (1_000_000 + i * 100, 1_000_000 + i * 100))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_simhash_gate_stream(
            stream, acc, idx, ckpt, rung=1, index_bucket_k=8
        )
        _await(q, "q317")
        acc_t, idx_t = VersionedTable(acc), VersionedTable(idx)
        accepted_before = acc_t.read(spark).localCheckpoint(eager=True)

        def files_per_bucket() -> dict[str, list[str]]:
            m = idx_t.manifest()
            out: dict[str, list[str]] = {}
            for e in m["data_dirs"]:
                d = e if isinstance(e, str) else e["dir"]
                root = _os.path.join(idx, "data", d)
                parts = (
                    e["parts"]
                    if isinstance(e, dict)
                    else [
                        p
                        for p in _os.listdir(root)
                        if p.startswith("pbucket=")
                    ]
                )
                for p in parts:
                    out.setdefault(p, []).extend(
                        _os.path.join(d, p, f)
                        for f in _os.listdir(_os.path.join(root, p))
                        if f.endswith(".parquet")
                    )
            return out

        pre = files_per_bucket()
        had_fragmentation = any(len(fs) > 1 for fs in pre.values())
        v_before = idx_t.current_version()

        # Independent tables — overlap the two compaction rewrites
        # (guide §2.6, same as q312).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            fa = pool.submit(acc_t.compact, spark, 1)
            fb = pool.submit(idx_t.compact, spark, 1)
            fa.result(), fb.result()

        post = files_per_bucket()
        max_after = max(len(fs) for fs in post.values())
        assert max_after == 1, post
        if had_fragmentation:
            assert idx_t.manifest()["mode"] == "overwrite_partitions"
            # single-file buckets kept their exact physical files
            for p, fs in pre.items():
                if len(fs) == 1:
                    assert post[p] == fs, (p, fs, post[p])
        else:
            assert idx_t.current_version() == v_before
        # pinned layout survives the pruned rewrite
        meta = idx_t.manifest()["meta"]
        assert meta["simhash_rung"] == 1 and meta["bucket_k"] == 8

        resub = accepted_before.withColumn(
            "doc_id", F.col("doc_id") + F.lit(2_999_999_997)
        ).localCheckpoint(eager=True)
        simhash_gate_batch_writer(acc, idx, rung=1, index_bucket_k=8)(
            resub, 99
        )
        acc_after = acc_t.read(spark)
        reaccepted = acc_after.join(
            accepted_before.select("doc_id"), "doc_id", "left_anti"
        ).count()

        def const(metric: str, value: int) -> DataFrame:
            return spark.createDataFrame(
                [(metric, int(value))], "metric STRING, value LONG"
            )

        rows = [
            const("max_files_per_bucket_after_compact", max_after),
            const("n_accepted_final", accepted_before.count()),
            const(
                "n_data_dirs_corpus_after_compact",
                len(acc_t.manifest()["data_dirs"]),
            ),
            const("n_index_rows_final", idx_t.read(spark).count()),
            const("n_reaccepted_after_compact", reaccepted),
            const("n_resubmitted", resub.count()),
        ]
        result = reduce(DataFrame.unionByName, rows).orderBy("metric")
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
