"""Semantics tests for the sketch family (q251-q254), the decontam
n-gram sweep (q257), the KS drift test (q258), and weighted sampling
(q259) on CRAFTED data — the synthetic corpus drives the oracle hash
checks; these prove the estimator/gate math against independently
computed (pure-Python) expectations and planted structure.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from movie_data_pipeline_spark.plans import REGISTRY
from movie_data_pipeline_spark.plans.sketches import (
    KMV_K,
    KMV_NUM,
)

DOC_SCHEMA = (
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
)


def _h48_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _r4_py(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _shingles3(text: str) -> set[str]:
    t = text.lower().split()
    if len(t) < 3:
        return {" ".join(t)}
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


def _write_docs(spark, base, rows):
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    df.coalesce(1).write.parquet(str(base / "documents.parquet"))
    return str(base)


# 120 distinct words -> a single 120-word doc has 118 distinct shingles
WORDS = [f"w{i:03d}" for i in range(120)]
BIG_TEXT = " ".join(WORDS)
SMALL_TEXT = "a b c d"  # 2 shingles


@pytest.fixture(scope="module")
def kmv_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("kmvdocs")
    rows = [
        (1, BIG_TEXT, "en", "many", len(BIG_TEXT)),
        (2, SMALL_TEXT, "en", "few", len(SMALL_TEXT)),
    ]
    return _write_docs(spark, base, rows)


def test_kmv_formula_branch_matches_python_mirror(spark, kmv_dir):
    """Source 'many' holds 118 > k distinct shingles: the engine's
    estimate must equal (k-1)*2^48 / h_(k) computed independently in
    Python from the same md5 hashes; 'few' (2 < k shingles) must take
    the exact fallback with rel_err == 0."""
    out = REGISTRY["q251_kmv_distinct_audit"].build(spark, kmv_dir)
    rows = {r.source: r for r in out.collect()}
    assert set(rows) == {"many", "few"}

    hashes = sorted(_h48_py(sh) for sh in _shingles3(BIG_TEXT))
    assert len(hashes) == 118
    expected = _r4_py(KMV_NUM / hashes[KMV_K - 1])
    assert rows["many"].exact_distinct == 118
    assert rows["many"].kmv_est == expected

    assert rows["few"].exact_distinct == 2
    assert rows["few"].kmv_est == 2.0
    assert rows["few"].rel_err == 0.0


def test_countmin_never_undercounts(spark, tmp_path):
    """CM point estimates are >= the true count by construction; with a
    vocabulary far below the bucket count, collisions are absent and
    every audited estimate is exact."""
    base = tmp_path / "cmdocs"
    base.mkdir()
    text = "x x x y y z"
    rows = [(i, text, "en", "s", len(text)) for i in range(5)]
    d = _write_docs(spark, base, rows)
    out = REGISTRY["q252_countmin_heavy_hitters"].build(spark, d)
    got = {r.token: r for r in out.collect()}
    assert set(got) == {"x", "y", "z"}
    assert got["x"].true_cnt == 15 and got["y"].true_cnt == 10
    for r in got.values():
        assert r.overcount >= 0
        assert r.cm_est == r.true_cnt  # 3 tokens over 512 buckets


def test_bloom_probe_accounting(spark, tmp_path):
    """Probes are exactly the NON-inserted distinct shingles of each
    other source: a clone of the insert source contributes zero probes
    (absent from the report); a disjoint source's probe count is its
    own distinct-shingle count; FPR stays within [0, 1]. The insert
    set is the lexicographically-smallest source (ADVICE r5), so
    '0-insert' sorts first here."""
    base = tmp_path / "bloomdocs"
    base.mkdir()
    other = " ".join(f"v{i:03d}" for i in range(50))
    rows = [
        (1, BIG_TEXT, "en", "0-insert", len(BIG_TEXT)),
        (2, BIG_TEXT, "en", "clone", len(BIG_TEXT)),
        (3, other, "en", "fresh", len(other)),
    ]
    d = _write_docs(spark, base, rows)
    out = REGISTRY["q253_bloom_fpr_audit"].build(spark, d)
    rows_by_src = {r.source: r for r in out.collect()}
    assert "clone" not in rows_by_src  # every shingle is a true member
    fresh = rows_by_src["fresh"]
    assert fresh.n_probes == len(_shingles3(other))
    assert fresh.n_inserted == 118
    assert 0.0 <= fresh.fpr <= 1.0
    assert fresh.n_false_pos <= fresh.n_probes


def test_kmv_overlap_identical_and_disjoint(spark, tmp_path):
    """Identical sources: exact and estimated Jaccard are both 1.0
    (their sketches coincide). Disjoint sources: exact intersection 0
    and the common-hash count is 0, so est_jaccard == 0.0."""
    base = tmp_path / "ovdocs"
    base.mkdir()
    other = " ".join(f"u{i:03d}" for i in range(80))
    rows = [
        (1, BIG_TEXT, "en", "sa", len(BIG_TEXT)),
        (2, BIG_TEXT, "en", "sb", len(BIG_TEXT)),
        (3, other, "en", "sc", len(other)),
    ]
    d = _write_docs(spark, base, rows)
    out = REGISTRY["q254_kmv_overlap_estimates"].build(spark, d)
    got = {(r.source_a, r.source_b): r for r in out.collect()}
    assert set(got) == {("sa", "sb"), ("sa", "sc"), ("sb", "sc")}
    ab = got[("sa", "sb")]
    assert ab.exact_jaccard == 1.0 and ab.est_jaccard == 1.0
    assert ab.exact_inter == 118
    for pair in (("sa", "sc"), ("sb", "sc")):
        r = got[pair]
        assert r.exact_inter == 0
        assert r.est_jaccard == 0.0


def test_decontam_sweep_planted_gram_lengths(spark, tmp_path):
    """Bench doc (doc_id 25 = 0 mod 25) plants an 8-word span copied
    into train doc 1; train doc 2 shares exactly ONE adjacent word
    pair; train doc 3 shares nothing. Expected flags: n=2 -> docs 1+2,
    n=3/5/8 -> doc 1 only (a shared n-gram requires n adjacent shared
    words)."""
    base = tmp_path / "swdocs"
    base.mkdir()
    span8 = "one two three four five six seven eight"
    rows = [
        (25, f"qa qb {span8} qc qd", "en", "bench", 40),
        (1, f"ta tb {span8} tc td", "en", "train", 40),
        (2, "ua one two ub uc ud ue uf ug uh", "en", "train", 30),
        (3, "za zb zc zd ze zf zg zh zi zj", "en", "train", 30),
    ]
    d = _write_docs(spark, base, rows)
    out = REGISTRY["q257_decontam_ngram_sweep"].build(spark, d)
    by_n = {r.ngram_n: r for r in out.collect()}
    assert set(by_n) == {2, 3, 5, 8}
    assert all(r.n_train_docs == 3 for r in by_n.values())
    assert by_n[2].n_flagged == 2
    assert by_n[3].n_flagged == 1
    assert by_n[5].n_flagged == 1
    assert by_n[8].n_flagged == 1
    # the 8-word span contributes exactly (8 - n + 1) shared n-grams
    assert by_n[8].mean_shared_grams == 1.0
    assert by_n[5].mean_shared_grams == 4.0


def test_ks_drift_flags_shifted_source_only(spark, tmp_path):
    """Sources 'a' and 'b' draw the same n_chars values; tiny source
    'c' sits entirely outside their range. KS(c vs rest) == 1.0 and
    must flag; a and b must not."""
    base = tmp_path / "ksdocs"
    base.mkdir()
    rows = []
    i = 0
    for v in range(100, 140):
        rows.append((i, "t", "en", "a", v)); i += 1
        rows.append((i, "t", "en", "b", v)); i += 1
    for v in (9000, 9001, 9002, 9003):
        rows.append((i, "t", "en", "c", v)); i += 1
    d = _write_docs(spark, base, rows)
    out = REGISTRY["q258_ks_source_drift"].build(spark, d)
    got = {r.source: r for r in out.collect()}
    assert got["c"].ks_stat == 1.0
    assert got["c"].drift_flag == 1
    assert got["a"].drift_flag == 0
    assert got["b"].drift_flag == 0
    assert got["a"].ks_stat == got["b"].ks_stat


def test_weighted_sample_matches_python_mirror(spark, tmp_path):
    """The A-ES selection is a pure function of (doc_id, n_chars): the
    engine's per-source selected counts must equal a pure-Python mirror
    of key = round8(ln(u)/w), top-100 by (key desc, doc_id)."""
    from movie_data_pipeline_spark.plans.curation import (
        AES_N,
        AES_SALT,
        AES_SPACE,
    )

    base = tmp_path / "aesdocs"
    base.mkdir()
    rows = []
    for i in range(150):
        src = "heavy" if i < 50 else "light"
        w = 1_000_000 if i < 50 else 3
        rows.append((i, "t", "en", src, w))
    d = _write_docs(spark, base, rows)
    out = REGISTRY["q259_weighted_sample_audit"].build(spark, d)
    got = {r.source: r for r in out.collect()}

    def key(i, w):
        h = _h48_py(f"{AES_SALT}{i}")
        u = (h + 1) / AES_SPACE
        return math.floor(math.log(u) / w * 1e8 + 0.5) / 1e8

    ranked = sorted(rows, key=lambda r: (-key(r[0], r[4]), r[0]))
    sel = ranked[:AES_N]
    exp_heavy = sum(1 for r in sel if r[3] == "heavy")
    assert got["heavy"].n_selected == exp_heavy
    assert got["light"].n_selected == AES_N - exp_heavy
    # weight-proportionality: the heavy source must dominate selection
    assert got["heavy"].n_selected == 50
    assert got["heavy"].expected_share > 0.99
