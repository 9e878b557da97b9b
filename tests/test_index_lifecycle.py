"""Dedup-index lifecycle (round 10, VERDICT r9 #1): right-to-erasure
scrub of the stored MinHash and SimHash band indexes, phantom-hit
behavior before vs after the scrub, manifest-property preservation,
and SimHash rung migration across an index's life."""

from __future__ import annotations

import pytest

from movie_data_pipeline_spark.operators.index_lifecycle import (
    count_phantom_index_rows,
    erase_documents,
    migrate_simhash_index,
    scrub_index_to_corpus,
)
from movie_data_pipeline_spark.sources.versioned import VersionedTable
from movie_data_pipeline_spark.streaming import (
    dedup_gate_batch_writer,
    simhash_gate_batch_writer,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill near the garden gate"
)
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


def _ids(spark, path):
    return {r.doc_id for r in VersionedTable(path).read(spark).collect()}


# --- erasure scrub: SimHash index ------------------------------------------


def test_simhash_scrub_removes_phantom_rows(spark, tmp_path):
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = simhash_gate_batch_writer(acc, idx, rung=1)
    writer(_docs(spark, [(0, BASE), (1, OTHER), (2, THIRD)]), 0)
    assert _ids(spark, acc) == {0, 1, 2}

    VersionedTable(acc).delete_where(spark, "doc_id = 1")
    assert count_phantom_index_rows(spark, idx, acc) == 6  # rung-1 bands

    v, n = scrub_index_to_corpus(spark, idx, acc)
    assert n == 6
    assert count_phantom_index_rows(spark, idx, acc) == 0
    assert _ids(spark, idx) == {0, 2}
    # the pinned rung survives the overwrite (table-level property)
    assert VersionedTable(idx).manifest().get("meta", {}).get(
        "simhash_rung"
    ) == 1


def test_simhash_resubmission_accepted_only_after_scrub(spark, tmp_path):
    """The phantom-suppression bug the scrub exists to fix: an erased
    document's band rows keep rejecting re-submissions of its content
    until the index is scrubbed."""
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = simhash_gate_batch_writer(acc, idx, rung=1)
    writer(_docs(spark, [(0, BASE), (1, OTHER)]), 0)

    VersionedTable(acc).delete_where(spark, "doc_id = 0")
    # Phantom index rows still suppress the re-submitted content...
    writer(_docs(spark, [(10, BASE)]), 1)
    assert 10 not in _ids(spark, acc)

    scrub_index_to_corpus(spark, idx, acc)
    # ...and after the scrub the same content is accepted again.
    writer(_docs(spark, [(11, BASE)]), 2)
    assert 11 in _ids(spark, acc)
    # its band rows re-entered the index
    assert 11 in _ids(spark, idx)


# --- erasure scrub: MinHash index ------------------------------------------


def test_minhash_scrub_and_resubmission(spark, tmp_path):
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer = dedup_gate_batch_writer(acc, idx)
    writer(_docs(spark, [(0, BASE), (1, OTHER)]), 0)
    assert _ids(spark, acc) == {0, 1}

    VersionedTable(acc).delete_where(spark, "doc_id = 0")
    assert count_phantom_index_rows(spark, idx, acc) > 0
    # phantom suppression on the MinHash side too
    writer(_docs(spark, [(10, BASE)]), 1)
    assert 10 not in _ids(spark, acc)

    v, n = scrub_index_to_corpus(spark, idx, acc)
    assert n > 0
    assert count_phantom_index_rows(spark, idx, acc) == 0
    writer(_docs(spark, [(11, BASE)]), 2)
    assert 11 in _ids(spark, acc)


# --- erase_documents: one-call cadence --------------------------------------


def test_erase_documents_scrubs_all_indexes_and_vacuums(spark, tmp_path):
    acc = str(tmp_path / "acc")
    mh_idx, sh_idx = str(tmp_path / "mh"), str(tmp_path / "sh")
    dedup_gate_batch_writer(acc, mh_idx)(
        _docs(spark, [(0, BASE), (1, OTHER)]), 0
    )
    simhash_gate_batch_writer(acc, sh_idx, rung=1)(
        _docs(spark, [(2, THIRD)]), 1
    )

    stats = erase_documents(
        spark, acc, [mh_idx, sh_idx], "doc_id IN (0, 2)",
        vacuum_keep_last=1,
    )
    assert stats["n_docs_deleted"] == 2
    assert _ids(spark, acc) == {1}
    assert count_phantom_index_rows(spark, mh_idx, acc) == 0
    assert count_phantom_index_rows(spark, sh_idx, acc) == 0
    # vacuum(1): only the post-erasure snapshot remains anywhere
    for p in (acc, mh_idx, sh_idx):
        assert len(VersionedTable(p).versions()) == 1


def test_erase_documents_null_condition_retains(spark, tmp_path):
    """Three-valued logic: rows where the condition is NULL survive."""
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    simhash_gate_batch_writer(acc, idx, rung=1)(
        spark.createDataFrame(
            [(0, BASE, None), (1, OTHER, "cc")],
            "doc_id LONG, text STRING, source STRING",
        ),
        0,
    )
    stats = erase_documents(spark, acc, [idx], "source = 'cc'")
    assert stats["n_docs_deleted"] == 1
    assert _ids(spark, acc) == {0}


def test_scrub_empty_corpus_drops_everything(spark, tmp_path):
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    simhash_gate_batch_writer(acc, idx, rung=1)(
        _docs(spark, [(0, BASE)]), 0
    )
    VersionedTable(acc).delete_where(spark, "TRUE")
    v, n = scrub_index_to_corpus(spark, idx, acc)
    assert n == 6
    assert VersionedTable(idx).read(spark).count() == 0


# --- rung migration ----------------------------------------------------------


def test_migrate_simhash_index_rebands_and_updates_meta(spark, tmp_path):
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    writer1 = simhash_gate_batch_writer(acc, idx, rung=1)
    writer1(_docs(spark, [(0, BASE), (1, OTHER)]), 0)
    before = VersionedTable(idx).read(spark).collect()
    assert len(before) == 12  # 6 bands/doc at rung 1

    migrate_simhash_index(spark, idx, 2)
    rows = VersionedTable(idx).read(spark).collect()
    assert len(rows) == 30  # 15 bands/doc at rung 2
    assert {r.rung for r in rows} == {2}
    # global band_idx space: rung 2 occupies 6-20
    assert {r.band_idx for r in rows} == set(range(6, 21))
    assert VersionedTable(idx).manifest()["meta"]["simhash_rung"] == 2
    # fingerprints preserved exactly (no re-hash)
    assert {(r.doc_id, r.simhash) for r in rows} == {
        (r.doc_id, r.simhash) for r in before
    }

    # a writer pinned to the OLD rung now fails loudly...
    with pytest.raises(ValueError, match="rung"):
        writer1(_docs(spark, [(5, THIRD)]), 1)
    # ...and a rung-2 writer keeps gating correctly across the boundary:
    writer2 = simhash_gate_batch_writer(acc, idx, rung=2)
    writer2(_docs(spark, [(6, BASE), (7, THIRD)]), 2)
    assert _ids(spark, acc) == {0, 1, 7}  # 6 is a dup of migrated 0


def test_migrate_rejects_noop_and_bad_rung(spark, tmp_path):
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    simhash_gate_batch_writer(acc, idx, rung=1)(
        _docs(spark, [(0, BASE)]), 0
    )
    with pytest.raises(ValueError, match="already at rung"):
        migrate_simhash_index(spark, idx, 1)
    with pytest.raises(ValueError, match="must be 1, 2 or 3"):
        migrate_simhash_index(spark, idx, 4)


def test_migration_preserved_by_scrub(spark, tmp_path):
    """Scrub after migration must keep the migrated rung property —
    the inheritance rule VersionedTable.commit documents."""
    acc, idx = str(tmp_path / "acc"), str(tmp_path / "idx")
    simhash_gate_batch_writer(acc, idx, rung=1)(
        _docs(spark, [(0, BASE), (1, OTHER)]), 0
    )
    migrate_simhash_index(spark, idx, 2)
    VersionedTable(acc).delete_where(spark, "doc_id = 1")
    scrub_index_to_corpus(spark, idx, acc)
    assert VersionedTable(idx).manifest()["meta"]["simhash_rung"] == 2
    assert _ids(spark, idx) == {0}
