"""Semantics tests for the round-5 queries on CRAFTED data — the
synthetic corpus drives the oracle hash checks; these prove the
detection logic fires on planted structure with known answers:
q246 must report exactly the planted verbatim span (length, run count),
q247 must flag exactly the planted near-benchmark vectors.
"""

from __future__ import annotations

import pytest

from movie_data_pipeline_spark.plans import REGISTRY

# fillers are pairwise word-DISJOINT so the only shared 5-gram between
# any two documents is the planted span
FILLER_A = "alpha beta gamma delta epsilon zeta eta theta"
FILLER_B = "omicron pi rho sigma upsilon phi chi psi"
FILLER_C = "amber birch cedar dahlia elder fennel ginger hazel"
FILLER_D = "iris jasper kelp lotus maple nettle oak poplar"
SHARED8 = "one two three four five six seven eight"  # 8-word span
UNRELATED = (
    "columnar execution engines schedule vectorized operators across "
    "partitioned storage with adaptive shuffles and runtime pruning"
)


@pytest.fixture(scope="module")
def crafted_docs_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("r5docs")
    rows = [
        (1, f"{FILLER_A} {SHARED8} {FILLER_B}"),
        (2, f"{FILLER_C} {SHARED8} {FILLER_D}"),
        (3, UNRELATED),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "crafted", len(t)) for i, t in rows],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    df.coalesce(1).write.parquet(str(base / "documents.parquet"))
    return str(base)


def test_substring_runs_finds_planted_span(spark, crafted_docs_dir):
    """Docs 1 and 2 share EXACTLY one verbatim 8-word span at different
    offsets and share nothing else contiguous: the report must contain
    exactly the (1,2) pair with max_run_words == 8 and a single run of
    8-5+1 = 4 aligned shingle positions. Doc 3 shares words but no
    5-gram, so it must not appear."""
    out = REGISTRY["q246_substring_runs"].build(spark, crafted_docs_dir)
    rows = {(r.doc_a, r.doc_b): r for r in out.collect()}
    assert set(rows) == {(1, 2)}
    r = rows[(1, 2)]
    assert r.max_run_words == 8
    assert r.n_runs == 1
    assert r.n_shared_positions == 4


def test_substring_runs_exact_dup_full_length(spark, tmp_path):
    """An exact duplicate pair's run spans the whole document: with a
    12-word doc, max_run_words == 12 (8 aligned 5-gram positions)."""
    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    df = spark.createDataFrame(
        [(1, text, "en", "s", len(text)), (2, text, "en", "s", len(text))],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = REGISTRY["q246_substring_runs"].build(spark, str(tmp_path))
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].doc_a == 1 and rows[0].doc_b == 2
    assert rows[0].max_run_words == 12
    assert rows[0].n_runs == 1
    assert rows[0].n_shared_positions == 8


def test_embedding_decontamination_flags_planted(spark, tmp_path):
    """vec 0 and vec 20 are benchmark rows (vec_id % 20 == 0). Planted
    train vectors: vec 1 is a scaled copy of vec 0 (cosine 1.0 → must
    be flagged with nearest 0), vec 3 is nearly vec 20 (flagged,
    nearest 20), vec 2 is orthogonal to both (must NOT be flagged)."""
    e0 = [1.0, 0.0, 0.0, 0.0]
    e20 = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, e0, 0),
        (20, e20, 0),
        (1, [2.0, 0.0, 0.0, 0.0], 1),  # cos(·, e0) = 1.0
        (2, [0.0, 0.0, 1.0, 1.0], 1),  # orthogonal to both
        (3, [0.1, 1.0, 0.0, 0.0], 1),  # cos(·, e20) ≈ 0.995
    ]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = REGISTRY["q247_embedding_decontamination"].build(
        spark, str(tmp_path)
    )
    got = {r.vec_id: r for r in out.collect()}
    assert set(got) == {1, 3}
    assert got[1].nearest_eval_id == 0
    assert got[1].max_cos == 1.0
    assert got[1].n_eval_hits == 1
    assert got[3].nearest_eval_id == 20
    assert got[3].max_cos > 0.99
