"""Streaming sinks beyond the built-ins: incremental upsert into a
parquet key-value table via ``foreachBatch``.

Structured Streaming's file sink is append-only; maintaining a *keyed*
table (latest aggregate per key, latest row per entity) needs MERGE.
On a lakehouse that is Delta/Iceberg ``MERGE INTO`` inside
``foreachBatch``; without a table format the same row semantics come
from :func:`operators.merge.upsert` — each micro-batch's rows replace
key-matched rows and insert the rest.

Scale/consistency notes:

- ``foreachBatch`` gives at-least-once batch delivery; the upsert is
  idempotent per (key, value) so replays converge — the standard
  recipe for exactly-once *effects* on a keyed sink.
- The merged frame is materialized (``localCheckpoint``) BEFORE the
  overwrite: the plan reads the same files the write replaces, and
  overwriting a lazily-read input is the classic self-overwrite
  corruption. A table format does this with snapshot isolation; a real
  deployment at 100 TB should also partition the table and use
  dynamic-partition overwrite so each batch rewrites only touched
  partitions (see operators/merge.py).
- With an update-mode aggregation upstream, each batch carries only
  keys whose aggregate changed — the write is proportional to churn,
  not table size (modulo the no-format full-file rewrite above).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from movie_data_pipeline_spark.operators.merge import upsert


def upsert_batch_writer(
    path: str, keys: Sequence[str]
) -> Callable[[DataFrame, int], None]:
    """The per-micro-batch MERGE: returns the function ``foreachBatch``
    invokes with (batch_df, batch_id). Exposed separately so tests can
    drive it with hand-built batches."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(path)
        except AnalysisException:  # first batch: table does not exist yet
            existing = None
        merged = (
            batch_df
            if existing is None
            else upsert(existing, batch_df, keys)
        )
        # Materialize before overwriting the files the plan reads.
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(path)

    return _apply


def start_upsert_stream(
    updates: DataFrame,
    path: str,
    checkpoint: str,
    keys: Sequence[str],
) -> StreamingQuery:
    """Continuously maintain a keyed parquet table from a streaming
    update-mode DataFrame (e.g. a watermarked aggregation)."""
    return (
        updates.writeStream.foreachBatch(upsert_batch_writer(path, keys))
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def versioned_append_writer(
    table_path: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer that lands every micro-batch as an APPEND
    commit on a :class:`sources.versioned.VersionedTable` — streaming
    ingestion with snapshot isolation and time travel, no table format.

    Semantics: readers only ever see manifest-committed snapshots, so a
    crash mid-batch leaves at worst an orphan data dir (cleaned by
    vacuum), never a torn table. foreachBatch is at-least-once; a
    replayed batch appends twice, so exactly-once EFFECTS need either
    the keyed upsert sink above or a batch_id high-water mark stored in
    the manifest — both documented trade-offs of real lakehouse sinks.
    A CommitConflict (concurrent writer) is re-raised: the streaming
    query fails fast rather than silently dropping a batch; restart
    resumes from the checkpoint and retries on the new head.
    """
    from movie_data_pipeline_spark.sources.versioned import VersionedTable

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        VersionedTable(table_path).commit(batch_df, mode="append")

    return _apply


def start_versioned_append_stream(
    df: DataFrame,
    table_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Stream → versioned table: each micro-batch is one append commit."""
    writer = (
        df.writeStream.foreachBatch(versioned_append_writer(table_path))
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_gate_batch_writer(
    accepted_path: str,
    index_path: str,
    index_bucket_k: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer implementing a streaming NEAR-DUPLICATE
    INGEST GATE — the continuous-crawl front door of an LLM data
    pipeline: every micro-batch of documents is MinHash-signed, checked
    against the accumulated corpus LSH index, and only novel documents
    are committed; the index grows by exactly the accepted documents'
    band signatures.

    Per batch (all relational — one signing pass over the batch, one
    (band, band_sig) equi-join against the stored index; the corpus is
    never re-signed):

    1. ``minhash_signatures_wide`` over the batch (16 hashes, one pass);
    2. within-batch keep-first: ``lsh_candidate_pairs_wide`` pairs drop
       the higher doc_id of each colliding pair (greedy min-
       representative — deterministic, and transitively safe because
       the kept minimum itself is checked against the corpus);
    3. corpus check: batch band signatures ⋈ index on (band, band_sig)
       — the same storable-index join as
       ``operators.dedup.incremental_lsh_matches``;
    4. survivors are committed append-mode to ``accepted_path``, then
       their band signatures to ``index_path``.

    Commit ordering is documents-first: a crash between the two commits
    can leave accepted docs unindexed (a later duplicate may slip
    through — benign, dedup is best-effort by construction at
    at-least-once semantics), never the reverse (index-first would
    permanently reject content that was never stored). Both commits are
    snapshot-isolated appends on :class:`VersionedTable`. Replay
    idempotency does NOT rely on the index alone: a crash between the
    accepted-docs commit and the index commit followed by an
    at-least-once replay would find the index unchanged, so survivors
    are additionally anti-joined against the accepted table's existing
    ``doc_id`` set before committing — already-landed documents are
    never appended twice, and the replay's index commit back-fills the
    missing band signatures. (The accepted-side check reads only the
    ``doc_id`` column — column-pruned at the parquet scan; at corpus
    scale the same check is a bloom-filter or key-manifest lookup.)
    """
    from movie_data_pipeline_spark.operators.dedup import (
        band_signatures,
        lsh_candidate_pairs_wide,
        minhash_signatures_wide,
    )
    from movie_data_pipeline_spark.sources.versioned import VersionedTable

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        sigs = minhash_signatures_wide(batch_df)
        sigs.persist()
        try:
            # Materialize the signature cache BEFORE the multi-leaf
            # consumers (round 13): the within-batch pair self-join and
            # the corpus check scan sigs at several plan leaves inside
            # one job — on a cold cache those leaves race and each
            # recomputes the signing subtree (guide §5). One cheap
            # count populates the cache once.
            sigs.count()
            bands = band_signatures(sigs)
            batch_dupes = (
                lsh_candidate_pairs_wide(sigs)
                .select(F.col("doc_b").alias("doc_id"))
                .distinct()
            )
            survivors = batch_df.join(batch_dupes, "doc_id", "left_anti")

            index = VersionedTable(index_path)
            if index.current_version() is not None:
                stored_k = (index.manifest().get("meta") or {}).get(
                    "bucket_k"
                )
                if stored_k != index_bucket_k:
                    raise ValueError(
                        f"dedup gate: index at {index_path} uses bucket "
                        f"layout k={stored_k} but this writer is pinned "
                        f"to k={index_bucket_k}; appending under a "
                        "different layout would tear the partitioned "
                        "table"
                    )
                corpus_bands = index.read(spark).select("band", "band_sig")
                corpus_hits = (
                    bands.join(corpus_bands, ["band", "band_sig"])
                    .select("doc_id")
                    .distinct()
                )
                survivors = survivors.join(corpus_hits, "doc_id", "left_anti")

            survivors = survivors.persist()
            try:
                # count() instead of isEmpty(): the emptiness guard is
                # needed either way (an all-duplicate batch must not
                # commit), and a full count materializes the survivors
                # cache completely, so the accepted anti-join, the
                # docs commit, and the index semi-join below read
                # blocks instead of recomputing the partitions the
                # early-exit probe never touched (round 13, guide §5).
                if survivors.count() == 0:
                    return
                # Replay idempotency: docs that already landed in the
                # accepted table (crash before the index commit, then
                # at-least-once replay) must not append twice — but
                # their band signatures still need the index back-fill.
                accepted = VersionedTable(accepted_path)
                new_docs = survivors
                if accepted.current_version() is not None:
                    # Persisted across the emptiness probe + commit
                    # (round 13): the anti-join re-reads the accepted
                    # table's doc_id column, and without a cache the
                    # isEmpty probe and the commit write each ran it.
                    landed_ids = accepted.read(spark).select("doc_id")
                    new_docs = survivors.join(
                        landed_ids, "doc_id", "left_anti"
                    ).persist()
                try:
                    if not new_docs.isEmpty():
                        accepted.commit(new_docs, mode="append")
                finally:
                    if new_docs is not survivors:
                        new_docs.unpersist()
                idx_rows = bands.join(
                    survivors.select("doc_id"), "doc_id", "left_semi"
                )
                idx_meta = None
                if index_bucket_k is not None:
                    # Bucketed index layout (round 11): see the SimHash
                    # gate — erasure scrubs prune to touched buckets.
                    # Bucket-keyed REBALANCE before the write (round
                    # 13; was a fixed repartition(k) in round 12):
                    # without clustering every task writes a file into
                    # every bucket it touches (tasks x k tiny files PER
                    # BATCH); a fixed k-way exchange fixed that but
                    # cost k near-empty reduce tasks per micro-batch at
                    # small scale. REBALANCE keeps the one-file-per-
                    # bucket clustering (hash routing is by pbucket
                    # alone) while AQE coalesces the tiny batch to few
                    # tasks and, at 100 TB, splits an oversized bucket
                    # into advisory-sized files (guide §6) — the
                    # scale-adaptive width a constant can't give.
                    idx_rows = idx_rows.withColumn(
                        "pbucket",
                        F.expr(
                            f"CAST(pmod(doc_id, {int(index_bucket_k)})"
                            " AS INT)"
                        ),
                    ).hint("rebalance", "pbucket")
                    idx_meta = {
                        "partition_by": "pbucket",
                        "bucket_k": int(index_bucket_k),
                    }
                index.commit(idx_rows, mode="append", meta=idx_meta)
            finally:
                survivors.unpersist()
        finally:
            sigs.unpersist()

    return _apply


def start_dedup_gate_stream(
    docs: DataFrame,
    accepted_path: str,
    index_path: str,
    checkpoint: str,
    index_bucket_k: int | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Document stream → near-dup-gated versioned corpus + LSH index."""
    writer = (
        docs.writeStream.foreachBatch(
            dedup_gate_batch_writer(
                accepted_path, index_path, index_bucket_k=index_bucket_k
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def mix_drift_batch_writer(
    baseline: DataFrame,
    out_path: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer scoring every micro-batch's event-type mix
    against a precomputed baseline distribution with a chi-square
    goodness-of-fit statistic — q157's drift monitor moved onto the
    stream, where it belongs operationally (you want the alarm DURING
    ingestion, not at the next batch audit).

    ``baseline`` is a static (event_type, share) frame (shares sum to
    1) computed once from history; it is collected to a plain dict at
    writer-construction time (|types| rows — metadata, same licence as
    the IVF codebook) so each micro-batch pays one aggregate and zero
    joins. Per batch: observed counts, expected = share * n_batch,
    chi2 = sum (obs-exp)^2 / exp over baseline types (types unseen in
    the baseline contribute their own alarm column instead of a
    division by zero). One (batch_id, n_events, chi2, n_novel_types)
    row appends to ``out_path`` — the monitoring log a dashboard tails.
    """
    rows = baseline.select("event_type", "share").collect()
    shares = {r["event_type"]: float(r["share"]) for r in rows}

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        counts = {
            r["event_type"]: r["cnt"]
            for r in batch_df.groupBy("event_type")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        n = sum(counts.values())
        chi2 = 0.0
        # sorted: a fixed summation order makes chi2 bit-deterministic
        # across runs (dict order follows collect order otherwise)
        for t, share in sorted(shares.items()):
            exp = share * n
            if exp > 0:
                obs = counts.get(t, 0)
                chi2 += (obs - exp) * (obs - exp) / exp
        n_novel = sum(1 for t in counts if t not in shares)
        spark.createDataFrame(
            [(batch_id, n, chi2, n_novel)],
            "batch_id LONG, n_events LONG, chi2 DOUBLE, n_novel_types LONG",
        ).coalesce(1).write.mode("append").parquet(out_path)

    return _apply


def start_mix_drift_stream(
    events: DataFrame,
    baseline: DataFrame,
    out_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Event stream → per-micro-batch chi-square drift log."""
    writer = (
        events.writeStream.foreachBatch(
            mix_drift_batch_writer(baseline, out_path)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def simhash_gate_batch_writer(
    accepted_path: str,
    index_path: str,
    rung: int = 1,
    max_hamming: int = 5,
    bit_blocks: list[int] | None = None,
    index_bucket_k: int | None = None,
    centered: bool = False,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer: streaming near-dup ingest gate over the
    60-bit SimHash family (round 9, VERDICT r8 #4) — the q205 MinHash
    gate's contract re-run on the OTHER fingerprint index: 1 BIGINT
    per doc instead of a 16-hash signature, with exact Hamming
    verification at the index join.

    Per batch (one fingerprint pass over the batch, one
    (band_idx, band_val) equi-join against the stored index; the
    corpus is never re-fingerprinted):

    1. ``simhash`` over the batch (one 60-bit fingerprint per doc);
    2. within-batch keep-first: ``simhash_hamming_pairs`` at the
       pinned ``rung`` — drop the higher doc_id of each Hamming <=
       ``max_hamming`` pair (greedy min-representative, same
       transitive-safety argument as the MinHash gate);
    3. corpus check: the batch's band rows ⋈ stored index rows on
       (band_idx, band_val), then exact XOR-popcount <= ``max_hamming``
       against the indexed fingerprint — banding only generates
       candidates, the verify bar is exact;
    4. survivors commit docs-first, then their (doc_id, simhash,
       band_idx, band_val, rung) rows into the index.

    ``rung`` is an INDEX-BUILD parameter, pinned for the life of the
    index: band rows created under different rungs never join (band_idx
    is globally unique per rung — operators/dedup.simhash_band_combos),
    so re-banding each batch by its own size would silently stop
    matching the stored index. The rung is therefore PERSISTED — in the
    manifest's table properties (``meta.simhash_rung``) and in every
    index row — and validated on every batch from the manifest (one
    JSON read, no index scan): a writer restarted with the wrong rung
    raises instead of silently accepting duplicates. Size the rung for
    the TARGET corpus (rung 3 carries ~10^9 docs at ~8
    collisions/band), and migrate an index by re-banding its stored
    fingerprints (:func:`operators.index_lifecycle.
    migrate_simhash_index`) — a map-only rewrite, no text re-hash.

    Crash/replay discipline is the MinHash gate's verbatim: commits
    are docs-first (a crash between commits may let a later duplicate
    through — benign under at-least-once — never permanently rejects
    unstored content); replays anti-join survivors against the
    accepted table's doc_ids so nothing lands twice, and the replay's
    index commit back-fills missing band rows.

    ``centered`` (round 11, VERDICT r10 #1): fingerprint with the
    CENTERED operator family instead of the zero threshold — on the
    FIRST batch the per-bit thresholds are measured from that batch
    (operators/dedup.measure_center_thresholds) and pinned in the
    manifest (``simhash_center_s``/``simhash_center_n``); every later
    batch fingerprints against the PINNED thresholds
    (simhash_centered_pinned), so all fingerprints live in one
    consistent space (re-measuring per batch would fork it — the rung
    failure mode again). A centered writer on an uncentered index, or
    vice versa, fails the manifest validation loudly. The centered
    space keeps the band floor near uniform on template corpora
    (q305/q306: skew_inflation ~1x vs 404x), at the cost that the
    thresholds are corpus statistics frozen at build — re-center by
    re-fingerprinting (a text re-hash), or rescue an existing
    zero-threshold index map-only with ``bit_blocks``.

    ``bit_blocks`` (round 11, VERDICT r10 #1): the entropy-balanced
    banding permutation (operators/dedup.balanced_bit_blocks) under
    which the index's band rows were built. Like the rung it is an
    INDEX-BUILD parameter — band values from different assignments
    never join meaningfully — so it is persisted in the manifest
    (``meta.simhash_bit_blocks``) and validated per batch with the
    same one-JSON-read discipline; a writer restarted with a different
    assignment fails loudly. Exact Hamming verification uses the
    ORIGINAL fingerprints (permutation-invariant), so the accept/
    reject bar is unchanged — only the band-collision floor drops.
    """
    from movie_data_pipeline_spark.operators.dedup import (
        measure_center_thresholds,
        simhash,
        simhash_band_rows,
        simhash_centered_pinned,
        simhash_hamming_pairs,
    )
    from movie_data_pipeline_spark.sources.versioned import VersionedTable

    blocks_meta = None if bit_blocks is None else [int(b) for b in bit_blocks]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        thresholds = None
        if centered:
            idx0 = VersionedTable(index_path)
            stored_meta = (
                idx0.manifest().get("meta") or {}
                if idx0.current_version() is not None
                else {}
            )
            if "simhash_center_s" in stored_meta:
                thresholds = {
                    "s": stored_meta["simhash_center_s"],
                    "n": stored_meta["simhash_center_n"],
                }
            elif idx0.current_version() is not None:
                # A committed index with no pinned thresholds was NOT
                # built centered (legacy/pre-meta, or zero-threshold).
                # Re-measuring from this batch would fingerprint each
                # batch in its own space — duplicates of indexed docs
                # silently pass, the exact fork the thresholds exist to
                # prevent (ADVICE r11). Fail loudly: rebuild required.
                raise ValueError(
                    f"simhash gate: index at {index_path} has committed "
                    "versions but no pinned centered thresholds "
                    "(simhash_center_s) — it was not built centered and "
                    "the two fingerprint spaces never match; rebuild "
                    "the index centered or run this writer with "
                    "centered=False"
                )
            else:
                # index build: measure once, pinned by the first commit
                thresholds = measure_center_thresholds(batch_df)
            fp = simhash_centered_pinned(batch_df, thresholds).persist()
        else:
            fp = simhash(batch_df).persist()
        try:
            # Materialize the fingerprint cache BEFORE the multi-leaf
            # consumers (round 13): the Hamming-pair self-join and the
            # corpus band join scan fp at several plan leaves inside
            # one job — on a cold cache those leaves race and each
            # recomputes the whole fingerprint subtree (measured 2-3x
            # the batch cost at sf0.1; guide §5). One cheap count
            # populates the cache once.
            fp.count()
            bands = simhash_band_rows(
                fp, rung=rung, bit_blocks=bit_blocks
            ).withColumn("rung", F.lit(int(rung)))
            batch_dupes = (
                simhash_hamming_pairs(
                    fp, max_hamming=max_hamming, rung=rung,
                    bit_blocks=bit_blocks,
                )
                .select(F.col("doc_b").alias("doc_id"))
                .distinct()
            )
            survivors = batch_df.join(batch_dupes, "doc_id", "left_anti")

            index = VersionedTable(index_path)
            if index.current_version() is not None:
                idx_df = index.read(spark)
                # Rung is pinned per-index and validated on every
                # batch: band rows written under a different rung would
                # silently never join (global band_idx disambiguates
                # rungs), letting duplicates of indexed docs through —
                # a misconfigured writer must fail loudly instead. The
                # stored rung comes from the manifest's table
                # properties (one JSON read — ADVICE r9: the old
                # min/max agg scanned the whole index per batch), with
                # a single-row fallback for indexes committed before
                # manifests carried ``meta``; every commit path writes
                # a constant rung column, and migration rewrites all
                # rows in one snapshot, so one row is authoritative. An
                # EMPTY committed index has no rung to validate — it is
                # treated as unvalidated, same as no version at all.
                meta = index.manifest().get("meta") or {}
                stored = meta.get("simhash_rung")
                if stored is None:
                    # Legacy fallback (pre-meta indexes only): aggregate
                    # min/max over the rung column — deterministic, and
                    # a corrupted mixed-rung index fails loudly instead
                    # of nondeterministically passing on an arbitrary
                    # row (ADVICE r10). Paid once per legacy index: the
                    # next commit backfills the manifest property.
                    row = idx_df.agg(
                        F.min("rung").alias("lo"), F.max("rung").alias("hi")
                    ).first()
                    if row["lo"] is not None and row["lo"] != row["hi"]:
                        raise ValueError(
                            f"simhash gate: index at {index_path} holds "
                            f"mixed rungs {row['lo']}..{row['hi']} — "
                            "corrupted index; rebuild or migrate it"
                        )
                    stored = row["lo"]
                if stored is not None and stored != rung:
                    raise ValueError(
                        f"simhash gate: index at {index_path} was built "
                        f"at rung {stored} but this writer is pinned to "
                        f"rung {rung}; migrate the index (re-band its "
                        "stored fingerprints — operators/"
                        "index_lifecycle.migrate_simhash_index) or pin "
                        "the matching rung"
                    )
                # The banding permutation is pinned the same way: rows
                # banded under a different bit assignment produce band
                # values this writer's batches would never match —
                # duplicates of indexed docs would silently pass. Only
                # validated when the manifest carries meta (a pre-meta
                # index predates permuted banding entirely).
                if "simhash_rung" in meta:
                    stored_blocks = meta.get("simhash_bit_blocks")
                    if stored_blocks != blocks_meta:
                        raise ValueError(
                            f"simhash gate: index at {index_path} was "
                            f"banded under bit assignment "
                            f"{stored_blocks} but this writer is pinned "
                            f"to {blocks_meta}; migrate the index "
                            "(operators/index_lifecycle."
                            "migrate_simhash_index with bit_blocks) or "
                            "pin the matching assignment"
                        )
                    stored_k = meta.get("bucket_k")
                    if stored_k != index_bucket_k:
                        raise ValueError(
                            f"simhash gate: index at {index_path} uses "
                            f"bucket layout k={stored_k} but this "
                            f"writer is pinned to k={index_bucket_k}; "
                            "appending under a different layout would "
                            "tear the partitioned table"
                        )
                    stored_centered = "simhash_center_s" in meta
                    if stored_centered != centered:
                        raise ValueError(
                            f"simhash gate: index at {index_path} holds "
                            f"{'centered' if stored_centered else 'zero-threshold'} "
                            f"fingerprints but this writer is "
                            f"{'centered' if centered else 'zero-threshold'}; "
                            "the two fingerprint spaces never match — "
                            "rebuild the index or match the writer"
                        )
                corpus_bands = idx_df.select(
                    "band_idx",
                    "band_val",
                    F.col("simhash").alias("idx_simhash"),
                )
                corpus_hits = (
                    bands.join(corpus_bands, ["band_idx", "band_val"])
                    .filter(
                        F.expr(
                            "CAST(bit_count(simhash ^ idx_simhash)"
                            f" AS BIGINT) <= {int(max_hamming)}"
                        )
                    )
                    .select("doc_id")
                    .distinct()
                )
                survivors = survivors.join(
                    corpus_hits, "doc_id", "left_anti"
                )

            survivors = survivors.persist()
            try:
                # count() instead of isEmpty(): the emptiness guard is
                # needed either way (an all-duplicate batch must not
                # commit), and a full count materializes the survivors
                # cache completely, so the accepted anti-join, the
                # docs commit, and the index semi-join below read
                # blocks instead of recomputing the partitions the
                # early-exit probe never touched (round 13, guide §5).
                if survivors.count() == 0:
                    return
                accepted = VersionedTable(accepted_path)
                new_docs = survivors
                if accepted.current_version() is not None:
                    # Persisted across the emptiness probe + commit
                    # (round 13): the anti-join re-reads the accepted
                    # table's doc_id column, and without a cache the
                    # isEmpty probe and the commit write each ran it.
                    landed_ids = accepted.read(spark).select("doc_id")
                    new_docs = survivors.join(
                        landed_ids, "doc_id", "left_anti"
                    ).persist()
                try:
                    if not new_docs.isEmpty():
                        accepted.commit(new_docs, mode="append")
                finally:
                    if new_docs is not survivors:
                        new_docs.unpersist()
                idx_rows = bands.join(
                    survivors.select("doc_id"), "doc_id", "left_semi"
                )
                idx_meta = {
                    "simhash_rung": int(rung),
                    "simhash_bit_blocks": blocks_meta,
                }
                if centered:
                    idx_meta["simhash_center_s"] = [
                        int(x) for x in thresholds["s"]
                    ]
                    idx_meta["simhash_center_n"] = int(thresholds["n"])
                if index_bucket_k is not None:
                    # Bucketed index layout (round 11, VERDICT r10 #2):
                    # rows Hive-partitioned by id mod k, so an erasure
                    # scrub rewrites only touched buckets
                    # (scrub_index_to_corpus's pruned path). Bucket-
                    # keyed REBALANCE (round 13; was repartition(k) in
                    # round 12): keeps each batch's append at one file
                    # per bucket while AQE sizes the exchange — tiny
                    # batches coalesce to few tasks instead of k
                    # near-empty ones, oversized buckets split into
                    # advisory-sized files at scale (guide §6).
                    idx_rows = idx_rows.withColumn(
                        "pbucket",
                        F.expr(
                            f"CAST(pmod(doc_id, {int(index_bucket_k)})"
                            " AS INT)"
                        ),
                    ).hint("rebalance", "pbucket")
                    idx_meta["partition_by"] = "pbucket"
                    idx_meta["bucket_k"] = int(index_bucket_k)
                index.commit(idx_rows, mode="append", meta=idx_meta)
            finally:
                survivors.unpersist()
        finally:
            fp.unpersist()

    return _apply


RECOMMENDED_INDEX_BUCKET_K = 64


def recommended_simhash_gate_batch_writer(
    accepted_path: str,
    index_path: str,
    rung: int = 1,
    max_hamming: int = 5,
    index_bucket_k: int = RECOMMENDED_INDEX_BUCKET_K,
) -> Callable[[DataFrame, int], None]:
    """The DEFAULT build path for a NEW SimHash gate index (round 12,
    VERDICT r11 #1): every scale mitigation round 11 proved is applied
    with zero tuning arguments, so a fresh 2026 deployment gets the
    mitigated collision floor and pruned maintenance instead of
    rebuilding round 10's problems.

    On a FRESH index (no committed version) the first batch measures
    and pins the full recommended layout in one cadence:

    - **centered fingerprints** (``simhash_center_s/n`` pinned in the
      manifest; q306: band-collision skew inflation ~1x vs 404x raw);
    - **entropy-balanced banding** (``simhash_bit_blocks`` measured
      over the first batch's centered fingerprints — insurance against
      template-burst skew the centering can't see, q304);
    - **bucketed partition layout** (``bucket_k`` — erasure scrubs and
      deletes prune to touched buckets, q308: 115x less write volume).

    On an EXISTING index the ENTIRE configuration is adopted from the
    manifest's table properties — rung, banding assignment, bucket
    layout, centered thresholds — so a restarted writer needs no
    arguments and can never fail its own index's validation. (The
    explicit :func:`simhash_gate_batch_writer` kwargs remain the
    legacy/tuning path; a pre-meta legacy index has no stored
    configuration to adopt and must use it.) ``rung``/``max_hamming``/
    ``index_bucket_k`` only shape a FRESH build.

    Measurement cost: one extra 61-sum aggregate + one fingerprint
    pass on the first batch only; every later batch pays exactly what
    the explicit writer pays (one manifest JSON read).
    """
    from movie_data_pipeline_spark.operators.dedup import (
        measure_balanced_bit_blocks,
        measure_center_thresholds,
        simhash_centered_pinned,
    )
    from movie_data_pipeline_spark.sources.versioned import VersionedTable

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = VersionedTable(index_path)
        if idx.current_version() is not None:
            meta = idx.manifest().get("meta") or {}
            if "simhash_rung" not in meta:
                raise ValueError(
                    f"recommended simhash gate: index at {index_path} "
                    "is a legacy pre-meta index with no stored "
                    "configuration to adopt — use "
                    "simhash_gate_batch_writer with explicit arguments "
                    "or migrate the index first"
                )
            inner = simhash_gate_batch_writer(
                accepted_path,
                index_path,
                rung=int(meta["simhash_rung"]),
                max_hamming=max_hamming,
                bit_blocks=meta.get("simhash_bit_blocks"),
                index_bucket_k=meta.get("bucket_k"),
                centered="simhash_center_s" in meta,
            )
        else:
            # Fresh build: measure the recommended layout from this
            # batch. The inner writer re-measures the thresholds
            # (deterministic — same batch, same aggregate) and pins
            # them with the first commit.
            thresholds = measure_center_thresholds(batch_df)
            blocks = measure_balanced_bit_blocks(
                simhash_centered_pinned(batch_df, thresholds)
            )
            inner = simhash_gate_batch_writer(
                accepted_path,
                index_path,
                rung=rung,
                max_hamming=max_hamming,
                bit_blocks=blocks,
                index_bucket_k=int(index_bucket_k),
                centered=True,
            )
        inner(batch_df, batch_id)

    return _apply


def start_recommended_simhash_gate_stream(
    docs: DataFrame,
    accepted_path: str,
    index_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Document stream → SimHash-gated corpus + index under the
    recommended scale-safe layout, zero tuning arguments."""
    writer = (
        docs.writeStream.foreachBatch(
            recommended_simhash_gate_batch_writer(accepted_path, index_path)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def recommended_dedup_gate_batch_writer(
    accepted_path: str,
    index_path: str,
    index_bucket_k: int = RECOMMENDED_INDEX_BUCKET_K,
) -> Callable[[DataFrame, int], None]:
    """Recommended MinHash gate (round 12, VERDICT r11 #1): a fresh
    index gets the bucketed partition layout (pruned erasure scrubs);
    an existing index's layout is adopted from its manifest so a
    restarted writer needs no arguments. The MinHash family has no
    centered/banding axis — bucket layout is its one scale knob."""
    from movie_data_pipeline_spark.sources.versioned import VersionedTable

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = VersionedTable(index_path)
        if idx.current_version() is not None:
            k = (idx.manifest().get("meta") or {}).get("bucket_k")
        else:
            k = int(index_bucket_k)
        dedup_gate_batch_writer(
            accepted_path, index_path, index_bucket_k=k
        )(batch_df, batch_id)

    return _apply


def start_simhash_gate_stream(
    docs: DataFrame,
    accepted_path: str,
    index_path: str,
    checkpoint: str,
    rung: int = 1,
    bit_blocks: list[int] | None = None,
    index_bucket_k: int | None = None,
    centered: bool = False,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Document stream → SimHash-gated versioned corpus + band index."""
    writer = (
        docs.writeStream.foreachBatch(
            simhash_gate_batch_writer(
                accepted_path, index_path, rung=rung,
                bit_blocks=bit_blocks, index_bucket_k=index_bucket_k,
                centered=centered,
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
