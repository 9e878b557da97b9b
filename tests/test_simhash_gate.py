"""Streaming SimHash ingest gate (round 9, VERDICT r8 #4): novelty,
within-batch keep-first, cross-batch index growth, replay convergence
incl. a crash planted between the two commits, pinned-rung index
discipline, and the end-to-end availableNow stream."""

from __future__ import annotations

import os

import pytest

from movie_data_pipeline_spark.sources.versioned import VersionedTable
from movie_data_pipeline_spark.streaming import (
    simhash_gate_batch_writer,
    start_simhash_gate_stream,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill near the garden gate"
)
NEAR = BASE.replace("lazy", "sleepy")
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines"
)
THIRD = (
    "yet another unrelated document describing streaming watermarks "
    "state stores and exactly once sinks in great detail today"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _accepted_ids(spark, path):
    return {r.doc_id for r in VersionedTable(path).read(spark).collect()}


def test_gate_accepts_novel_drops_batch_dups(spark, tmp_path):
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = simhash_gate_batch_writer(acc, idx)
    # doc 1 is an exact dup of doc 0 (Hamming 0) -> keep-first
    writer(_docs(spark, [(0, BASE), (1, BASE), (2, OTHER)]), 0)
    assert _accepted_ids(spark, acc) == {0, 2}
    idx_rows = VersionedTable(idx).read(spark).collect()
    # index holds exactly the accepted docs' band rows: 6 per doc (rung 1)
    assert {r.doc_id for r in idx_rows} == {0, 2}
    assert len(idx_rows) == 12
    assert {r.band_idx for r in idx_rows} == set(range(6))


def test_gate_rejects_cross_batch_near_dup(spark, tmp_path):
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = simhash_gate_batch_writer(acc, idx)
    writer(_docs(spark, [(0, BASE)]), 0)
    # NEAR is within Hamming<=5 of BASE (one-word substitution on a
    # 20-word doc); THIRD is novel
    writer(_docs(spark, [(10, NEAR), (11, THIRD)]), 1)
    assert _accepted_ids(spark, acc) == {0, 11}


def test_gate_replay_converges(spark, tmp_path):
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = simhash_gate_batch_writer(acc, idx)
    batch = _docs(spark, [(0, BASE), (1, OTHER)])
    writer(batch, 0)
    writer(batch, 0)  # at-least-once replay
    assert _accepted_ids(spark, acc) == {0, 1}
    assert len(VersionedTable(acc).versions()) == 1


def test_gate_replay_after_crash_between_commits(spark, tmp_path):
    """Crash AFTER the accepted-docs commit but BEFORE the index commit,
    then an at-least-once replay: the accepted-table anti-join must
    prevent a double append, and the replay must back-fill the missing
    band rows into the index."""
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = simhash_gate_batch_writer(acc, idx)
    batch = _docs(spark, [(0, BASE), (1, OTHER)])

    writer(batch, 0)
    index = VersionedTable(idx)
    for v in index.versions():
        os.unlink(index._manifest_path(v))

    writer(batch, 0)  # replay across the crash boundary
    rows = VersionedTable(acc).read(spark).collect()
    assert sorted(r.doc_id for r in rows) == [0, 1]
    assert len(VersionedTable(acc).versions()) == 1
    assert {
        r.doc_id for r in VersionedTable(idx).read(spark).collect()
    } == {0, 1}


def test_gate_rung_is_pinned_not_batch_sized(spark, tmp_path):
    """A rung-3 gate must store 20 band rows per accepted doc even for
    a 2-doc batch — banding is an index-build parameter, never the
    batch's own size (band rows from different rungs never join)."""
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = simhash_gate_batch_writer(acc, idx, rung=3)
    writer(_docs(spark, [(0, BASE), (1, OTHER)]), 0)
    idx_rows = VersionedTable(idx).read(spark).collect()
    assert len(idx_rows) == 40  # 2 docs x C(6,3) bands
    # global band_idx: rung 3 occupies 21-40
    assert {r.band_idx for r in idx_rows} == set(range(21, 41))
    assert {r.rung for r in idx_rows} == {3}
    # and the rung-3 gate still rejects a cross-batch near-dup
    # (Hamming<=3 guaranteed; this pair is typically <=5 with errors
    # clustered, caught via the exact verify on banded candidates)
    writer(_docs(spark, [(10, BASE)]), 1)  # exact dup -> always caught
    assert _accepted_ids(spark, acc) == {0, 1}


@pytest.mark.slow
def test_gate_rejects_rung_mismatch_against_stored_index(spark, tmp_path):
    """A writer restarted with a different rung must FAIL LOUDLY: its
    band rows would never join the stored index (global band_idx), so
    silent acceptance would let exact duplicates through."""
    import pytest

    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    simhash_gate_batch_writer(acc, idx, rung=1)(
        _docs(spark, [(0, BASE)]), 0
    )
    with pytest.raises(ValueError, match="rung"):
        simhash_gate_batch_writer(acc, idx, rung=3)(
            _docs(spark, [(1, OTHER)]), 1
        )


def test_gate_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    _docs(
        spark, [(0, BASE), (1, BASE), (2, OTHER), (3, NEAR), (4, THIRD)]
    ).repartition(1).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_simhash_gate_stream(
        stream,
        str(tmp_path / "acc"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = _accepted_ids(spark, str(tmp_path / "acc"))
    # 1 dups 0; 3 near-dups 0; exactly one of {0,1,3} survives + 2, 4
    assert 2 in got and 4 in got
    assert len(got & {0, 1, 3}) == 1


def test_centered_writer_refuses_uncentered_index(spark, tmp_path):
    """ADVICE r11: centered=True against an index that has committed
    versions but no pinned thresholds used to RE-MEASURE thresholds
    from every batch — each batch fingerprinting in its own space, so
    duplicates of indexed docs silently passed. It must raise."""
    import pytest

    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    # build zero-threshold (meta carries simhash_rung but no center_s)
    simhash_gate_batch_writer(acc, idx, rung=1)(
        _docs(spark, [(0, BASE), (1, OTHER)]), 0
    )
    writer_c = simhash_gate_batch_writer(acc, idx, rung=1, centered=True)
    with pytest.raises(ValueError, match="not built centered"):
        writer_c(_docs(spark, [(2, THIRD)]), 1)
    # and a legacy pre-meta index (no meta at all) raises the same way
    idx2, acc2 = str(tmp_path / "idx2"), str(tmp_path / "acc2")
    VersionedTable(idx2).commit(
        VersionedTable(idx).read(spark), meta={}
    )
    writer_c2 = simhash_gate_batch_writer(acc2, idx2, rung=1, centered=True)
    with pytest.raises(ValueError, match="not built centered"):
        writer_c2(_docs(spark, [(3, THIRD)]), 0)


# --- round 12: recommended (default scale-safe) gate -----------------------


@pytest.mark.slow
def test_recommended_gate_pins_full_scale_safe_layout(spark, tmp_path):
    """VERDICT r11 #1: a default-constructed gate must land EVERY
    round-11 mitigation — centered thresholds, balanced banding,
    bucketed layout — pinned in the manifest with zero tuning args."""
    from movie_data_pipeline_spark.streaming.sinks import (
        RECOMMENDED_INDEX_BUCKET_K,
        recommended_simhash_gate_batch_writer,
    )

    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = recommended_simhash_gate_batch_writer(acc, idx)
    writer(_docs(spark, [(0, BASE), (1, OTHER), (2, BASE)]), 0)
    meta = VersionedTable(idx).manifest()["meta"]
    assert "simhash_center_s" in meta and "simhash_center_n" in meta
    assert sorted(meta["simhash_bit_blocks"]) == list(range(60))
    assert meta["bucket_k"] == RECOMMENDED_INDEX_BUCKET_K
    assert meta["partition_by"] == "pbucket"
    assert meta["simhash_rung"] == 1
    # doc 2 is an exact within-batch duplicate of BASE (identical
    # votes -> identical centered fingerprint, Hamming 0) -> dropped
    assert _accepted_ids(spark, acc) == {0, 1}

    # a restarted recommended writer adopts the stored config wholesale
    # (no re-measurement: thresholds and blocks unchanged) and keeps
    # gating against the stored index
    writer2 = recommended_simhash_gate_batch_writer(acc, idx)
    writer2(_docs(spark, [(5, BASE), (6, THIRD)]), 1)
    meta2 = VersionedTable(idx).manifest()["meta"]
    assert meta2["simhash_center_s"] == meta["simhash_center_s"]
    assert meta2["simhash_bit_blocks"] == meta["simhash_bit_blocks"]
    assert _accepted_ids(spark, acc) == {0, 1, 6}


@pytest.mark.slow
def test_recommended_gate_erasure_scrub_prunes(spark, tmp_path):
    """The q308 bar with zero tuning: an erasure on a recommended-built
    index must go down the PRUNED overwrite_partitions path."""
    from movie_data_pipeline_spark.operators.index_lifecycle import (
        count_phantom_index_rows,
        erase_documents,
    )
    from movie_data_pipeline_spark.streaming.sinks import (
        recommended_simhash_gate_batch_writer,
    )

    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = recommended_simhash_gate_batch_writer(acc, idx)
    writer(_docs(spark, [(0, BASE), (1, OTHER), (2, THIRD)]), 0)
    erase_documents(spark, acc, [idx], "doc_id = 1")
    assert count_phantom_index_rows(spark, idx, acc) == 0
    assert VersionedTable(idx).manifest()["mode"] == "overwrite_partitions"
    assert _accepted_ids(spark, acc) == {0, 2}


def test_recommended_gate_refuses_legacy_index(spark, tmp_path):
    import pytest

    from movie_data_pipeline_spark.streaming.sinks import (
        recommended_simhash_gate_batch_writer,
    )

    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    simhash_gate_batch_writer(acc, idx, rung=1)(_docs(spark, [(0, BASE)]), 0)
    # strip the meta -> legacy pre-meta index
    legacy = str(tmp_path / "legacy")
    VersionedTable(legacy).commit(VersionedTable(idx).read(spark), meta={})
    w = recommended_simhash_gate_batch_writer(str(tmp_path / "acc2"), legacy)
    with pytest.raises(ValueError, match="legacy pre-meta"):
        w(_docs(spark, [(1, OTHER)]), 0)


@pytest.mark.slow
def test_recommended_minhash_gate_buckets_fresh_index(spark, tmp_path):
    from movie_data_pipeline_spark.streaming.sinks import (
        RECOMMENDED_INDEX_BUCKET_K,
        recommended_dedup_gate_batch_writer,
    )

    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = recommended_dedup_gate_batch_writer(acc, idx)
    writer(_docs(spark, [(0, BASE), (1, OTHER)]), 0)
    meta = VersionedTable(idx).manifest()["meta"]
    assert meta["bucket_k"] == RECOMMENDED_INDEX_BUCKET_K
    assert meta["partition_by"] == "pbucket"
    # restart adopts the stored layout; an UNBUCKETED legacy index is
    # adopted as unbucketed (k=None) rather than torn
    writer2 = recommended_dedup_gate_batch_writer(acc, idx)
    writer2(_docs(spark, [(2, THIRD)]), 1)
    assert _accepted_ids(spark, acc) == {0, 1, 2}
    acc3, idx3 = str(tmp_path / "acc3"), str(tmp_path / "idx3")
    from movie_data_pipeline_spark.streaming.sinks import (
        dedup_gate_batch_writer,
    )

    dedup_gate_batch_writer(acc3, idx3)(_docs(spark, [(0, BASE)]), 0)
    recommended_dedup_gate_batch_writer(acc3, idx3)(
        _docs(spark, [(1, OTHER)]), 1
    )
    assert _accepted_ids(spark, acc3) == {0, 1}
