"""Deduplication queries over the ``documents`` table, each with an
exact DuckDB oracle (the MinHash/SimHash hashing is md5-based precisely
so the oracle can reproduce signatures bit-for-bit in SQL).

Shared SQL fragments mirror movie_data_pipeline_spark/functions/text.py
and operators/dedup.py; the MinHash coefficient VALUES are rendered from
the same Python constants the Spark builders use, so there is a single
source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movie_data_pipeline_spark.operators.dedup import (
    JACCARD_MAX_SHINGLE_DF,
    LSH_BAND_ROWS,
    MINHASH_P,
    NUM_HASHES,
    containment_pairs,
    doc_shingles,
    exact_duplicates,
    incremental_lsh_matches,
    jaccard_pairs,
    lsh_candidate_pairs,
    lsh_candidate_pairs_wide,
    minhash_coeffs,
    minhash_signatures_long,
    minhash_signatures_wide,
    ppjoin_pairs,
    simhash,
    simhash_centered,
    simhash_hamming_pairs,
)
from movie_data_pipeline_spark.functions.text import base_hash32, tokens, word_shingles
from movie_data_pipeline_spark.operators.graph import (
    connected_components,
    duplicate_clusters,
)
from movie_data_pipeline_spark.operators.util import (
    fixed_sample,
    fixed_sample_ctes,
)
from movie_data_pipeline_spark.plans.core import query, r4, round4
from movie_data_pipeline_spark.sources.registry import load_table

# DuckDB mirrors of the shared text expressions. Slices are 1-based and
# end-inclusive in DuckDB (t[i:i+n-1] == Spark slice(t, i, n)).
_TOKS_SQL = "string_split_regex(lower(trim(text)), '\\s+')"
_SHINGLES_CTE = f"""
  toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
  shingles AS (
    SELECT DISTINCT doc_id, sh FROM (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
               THEN unnest(list_transform(generate_series(1, len(t) - 2),
                                          i -> array_to_string(t[i:i+2], ' ')))
               ELSE array_to_string(t, ' ')
             END AS sh
      FROM toks))
"""
# Document-frequency cap (operators/dedup.JACCARD_MAX_SHINGLE_DF) as a
# CTE pair: every Jaccard-family oracle computes counts/common over the
# capped shingle set, mirroring ``jaccard_pairs(max_shingle_df=...)``
# exactly (sizes are measured AFTER the cap in both engines).  MinHash
# CTEs intentionally keep reading the uncapped ``shingles`` — the LSH
# operators don't df-cap.
_CAPPED_CTES = f"""sh_keep AS (
      SELECT sh FROM shingles GROUP BY sh
      HAVING COUNT(*) <= {JACCARD_MAX_SHINGLE_DF}),
    shingles_c AS (
      SELECT s.doc_id, s.sh FROM shingles s JOIN sh_keep USING (sh))"""

_BH_SQL = "CAST(('0x' || substr(md5({col}), 1, 8)) AS BIGINT)"

_COEFF_VALUES = ", ".join(f"({i}, {a}, {b})" for i, a, b in minhash_coeffs())
_MINHASH_LONG_CTES = f"""
  {_SHINGLES_CTE},
  coeffs(h_idx, a, b) AS (VALUES {_COEFF_VALUES}),
  hashed AS (SELECT doc_id, {_BH_SQL.format(col='sh')} AS bh FROM shingles),
  sigs AS (
    SELECT doc_id, CAST(h_idx AS BIGINT) AS h_idx,
           MIN((a * bh + b) % {MINHASH_P}) AS min_hash
    FROM hashed CROSS JOIN coeffs
    GROUP BY doc_id, h_idx)
"""


@query(
    "q17_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    ORDER BY rep_doc_id
    """,
    tags=("extension", "dedup"),
)
def q17_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via digest-groupBy: representative id + copy count.

    Scale: the shuffle key is a 16-byte digest, never the document text
    (see operators.dedup.exact_duplicates).
    """
    docs = load_table(spark, sf_dir, "documents")
    return exact_duplicates(docs).orderBy("rep_doc_id")


@query(
    "q18_ngram_jaccard_dupes",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           {r4('n_common * 1.0 / (ca.n + cb.n - n_common)')} AS jaccard
    FROM common
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.2
    ORDER BY doc_a, doc_b
    """,
    tags=("extension", "dedup", "similarity-join"),
)
def q18_ngram_jaccard_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard ≥ 0.2.

    The synthetic corpus plants real near-duplicates (jaccard up to
    ~0.99), so the result is non-trivial. The ratio inside the filter is
    exact integer arithmetic (counts), so thresholding is portable; only
    the reported jaccard is rounded.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=0.2)
    return pairs.select(
        "doc_a", "doc_b", round4(F.col("jaccard")).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


@query(
    "q19_minhash_signatures",
    oracle=f"""
    WITH {_MINHASH_LONG_CTES}
    SELECT doc_id, h_idx, min_hash FROM sigs
    ORDER BY doc_id, h_idx
    """,
    tags=("extension", "dedup", "minhash"),
)
def q19_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-hash MinHash signature per document, long format.

    Bit-for-bit reproducible across engines (md5-based base hash +
    affine family with fixed coefficients). Scale: all 16 mins are
    computed as parallel aggregates in ONE pass over the shingles — the
    shuffle carries k+1-column wide rows, not k-fold exploded rows; the
    long format is restored map-side afterwards.
    """
    docs = load_table(spark, sf_dir, "documents")
    # no trailing global sort: the driver compare is order-insensitive
    return minhash_signatures_long(docs)


@query(
    "q20_minhash_lsh_candidates",
    oracle=f"""
    WITH {_MINHASH_LONG_CTES},
    bands AS (
      SELECT doc_id, h_idx // {LSH_BAND_ROWS} AS band,
             string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY h_idx) AS band_sig
      FROM sigs GROUP BY doc_id, band)
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id
    ORDER BY doc_a, doc_b
    """,
    tags=("extension", "dedup", "minhash", "lsh"),
)
def q20_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidate pairs (4 bands × 4 rows) from q19 signatures.

    Scale: this is the sub-quadratic path — docs only meet inside a
    band bucket. The Spark build takes the WIDE signature frame: band
    signatures are map-side column concats (no re-aggregation of the
    stacked rows), buckets are one groupBy, and pairs are generated
    from each bucket's sorted id array in codegen — no self-join, so
    the MinHash pipeline is computed once. The oracle keeps the
    textbook band self-join spelling as the semantic spec.
    """
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures_wide(docs)
    return lsh_candidate_pairs_wide(sigs).orderBy("doc_a", "doc_b")


# 60-bit fingerprint (round-8 migration, VERDICT r7 #2): 15 hex chars
# of the md5 per token — one independent hash bit per fingerprint bit,
# positive BIGINT on both engines.
_BH60_SQL = "CAST(('0x' || substr(md5({col}), 1, 15)) AS BIGINT)"
_SIMHASH_MAX_HAMMING = 5


def _simhash_combo_sql() -> tuple[str, str, str]:
    """THE one rendered form of the ladder's combo table — the SQL twin
    of ``operators/dedup._band_explode``, shared by every SimHash
    oracle renderer below: (VALUES rows, blk-list expr, band_val expr
    over a ``combos``-joined ``blk`` list). One source means the layout
    the q290 planner's oracle prices can never diverge from the layout
    q79/q287/q292's oracles join on."""
    from movie_data_pipeline_spark.operators.dedup import (
        _SIMHASH_BLOCK_BITS,
        _SIMHASH_BLOCKS,
        simhash_band_combos,
    )

    vals = ",\n      ".join(
        f"({m}, {i}, {c[0]}, "
        f"{c[1] if len(c) > 1 else -1}, {c[2] if len(c) > 2 else -1})"
        for (m, i, c) in simhash_band_combos()
    )
    bb = _SIMHASH_BLOCK_BITS
    blk = ", ".join(
        f"(simhash // {1 << (bb * j)}) % {1 << bb}"
        for j in range(_SIMHASH_BLOCKS)
    )
    band_val = f"""blk[j1 + 1]
             + CASE WHEN j2 >= 0 THEN blk[j2 + 1] * {1 << bb}
                    ELSE 0 END
             + CASE WHEN j3 >= 0 THEN blk[j3 + 1] * {1 << (2 * bb)}
                    ELSE 0 END"""
    return vals, blk, band_val


def _render_simhash_band_ctes(forced_rung: int | None = None) -> str:
    """DuckDB twin of ``operators/dedup.simhash_hamming_pairs``'s band
    ladder (round 9, VERDICT r8 #1): rung from the IN-QUERY fingerprint
    count, the C(6, m) block-combination table rendered from the SAME
    Python helper the Spark plan compiles its structs from, band values
    by identical integer shift-free arithmetic. Expects a
    ``fingerprints(doc_id, simhash)`` CTE in scope; emits ``bands``.

    ``forced_rung`` mirrors the operator's ``rung`` override: an INDEX
    pins its rung at build time (q287's gate), so its oracle must band
    at that pinned rung rather than the corpus-size rung."""
    from movie_data_pipeline_spark.operators.dedup import (
        simhash_rung_thresholds,
    )

    t1, t2 = simhash_rung_thresholds()
    vals, blk, band_val = _simhash_combo_sql()
    rung_sql = (
        f"SELECT {int(forced_rung)} AS m"
        if forced_rung is not None
        else f"""SELECT CASE WHEN n <= {t1} THEN 1
                         WHEN n <= {t2} THEN 2 ELSE 3 END AS m
             FROM (SELECT COUNT(*) AS n FROM fingerprints)"""
    )
    return f"""rung AS ({rung_sql}),
    combos(m, band_idx, j1, j2, j3) AS (VALUES
      {vals}),
    blks AS (SELECT doc_id, simhash, [{blk}] AS blk FROM fingerprints),
    bands AS (
      SELECT doc_id, simhash, band_idx,
             {band_val} AS band_val
      FROM blks, combos, rung WHERE combos.m = rung.m)"""


_SIMHASH_BAND_CTES = _render_simhash_band_ctes()
# Vote CTEs shared by the zero-threshold fingerprint (``_SIMHASH_CTES``,
# the r8 family) and the round-11 CENTERED fingerprint — one rendered
# source so the two can only differ in the threshold.
_SIMHASH_VOTE_CTES = f"""
  toks AS (
    SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
  ),
  hashed AS (SELECT doc_id, {_BH60_SQL.format(col='token')} AS bh FROM toks),
  bits AS (SELECT j AS bit_idx, CAST(2 ** j AS BIGINT) AS pow2
           FROM generate_series(0, 59) t(j)),
  votes AS (
    SELECT doc_id, bit_idx, pow2,
           SUM(CASE WHEN (bh // pow2) % 2 = 1 THEN 1 ELSE -1 END) AS vote
    FROM hashed CROSS JOIN bits
    GROUP BY doc_id, bit_idx, pow2)"""
_SIMHASH_CTES = f"""{_SIMHASH_VOTE_CTES},
  fingerprints AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0 THEN pow2 ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id)
"""
# Centered fingerprint (operators/dedup.simhash_centered): bit j set
# iff the doc's vote exceeds the CORPUS MEAN vote for bit j — the
# comparison is exact integer (vote * n > sum of votes), no float mean.
_SIMHASH_CENTERED_CTES = f"""{_SIMHASH_VOTE_CTES},
  vtot AS (
    SELECT bit_idx, SUM(vote) AS s, COUNT(*) AS n
    FROM votes GROUP BY bit_idx),
  fingerprints AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote * n > s THEN pow2 ELSE 0 END) AS BIGINT) AS simhash
    FROM votes JOIN vtot USING (bit_idx) GROUP BY doc_id)
"""


@query(
    "q21_simhash",
    oracle=f"""
    WITH {_SIMHASH_CTES}
    SELECT doc_id, simhash FROM fingerprints ORDER BY doc_id
    """,
    tags=("extension", "dedup", "simhash"),
)
def q21_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit occurrence-weighted SimHash fingerprint per document
    (migrated from 32 bits in round 8, VERDICT r7 #2 — the 32-bit
    fingerprint's 4 x 8-bit LSH bands saturated at corpus scale; the
    fingerprints, and every pair set derived from them, changed)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs).orderBy("doc_id")


@query(
    "q74_winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
               THEN list_transform(generate_series(1, len(t) - 2),
                                   i -> array_to_string(t[i:i+2], ' '))
               ELSE [array_to_string(t, ' ')] END AS gs
      FROM toks),
    hashed AS (
      SELECT doc_id,
             list_transform(gs, g -> {_BH_SQL.format(col='g')}) AS hs
      FROM grams),
    pairs AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(hs)),
                            i -> {{'h': hs[i], 'p': i}}) AS ps,
             len(hs) AS n
      FROM hashed),
    sel AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(1, n - 3)),
               k -> list_reduce(ps[k:k+3],
                     (a, e) -> CASE WHEN e.h < a.h
                                      OR (e.h = a.h AND e.p > a.p)
                                    THEN e ELSE a END)) AS fps
      FROM pairs)
    SELECT DISTINCT doc_id, u.fp.h AS fp_hash, CAST(u.fp.p AS BIGINT) AS gram_pos
    FROM sel, unnest(fps) u(fp)
    ORDER BY doc_id, gram_pos
    """,
    tags=("extension", "dedup", "fingerprint", "winnowing"),
)
def q74_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed document fingerprints: per sliding window of 4
    consecutive word-3-gram hashes, select the minimum hash (rightmost
    on ties), dedup selections — the local fingerprinting algorithm of
    Schleimer/Wilkerson/Aiken (SIGMOD '03, the MOSS detector), which
    guarantees any shared run of ≥ 6 words produces a shared selected
    fingerprint while keeping ~2/(w+1) ≈ 40% of grams.

    This is the positional complement of MinHash (q19): MinHash
    estimates whole-document similarity; winnowing finds *where*
    overlap occurs (plagiarism spans, quote detection, partial-overlap
    dedup). Everything is array lambdas inside codegen — tokenize,
    hash, window-fold, dedup all happen within each row; the only
    shuffles are the output distinct and presentation sort. The
    rightmost-tie rule is one struct comparison: minimizing (h, -p)
    lexicographically IS "smallest hash, then rightmost position".
    """
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    grams = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda i: F.array_join(F.slice(t, i, 3), " "),
        ),
    ).otherwise(F.array(F.array_join(t, " ")))
    hs = F.transform(grams, base_hash32)
    pairs = F.transform(
        hs,
        lambda x, i: F.struct(
            x.alias("h"), (i + 1).cast("long").alias("p")
        ),
    )
    n = F.size(hs)
    init = F.struct(
        F.lit(2**63 - 1).cast("long").alias("h"),
        F.lit(0).cast("long").alias("p"),
    )
    sel = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), n - 3)),
        lambda k: F.aggregate(
            F.slice(pairs, k, 4),
            init,
            lambda a, e: F.when(
                (e["h"] < a["h"]) | ((e["h"] == a["h"]) & (e["p"] > a["p"])),
                e,
            ).otherwise(a),
        ),
    )
    return (
        docs.select("doc_id", F.explode(sel).alias("fp"))
        .select(
            "doc_id",
            F.col("fp.h").alias("fp_hash"),
            F.col("fp.p").alias("gram_pos"),
        )
        .distinct()
        .orderBy("doc_id", "gram_pos")
    )


# Recursive-CTE transitive closure of the >= 0.2-Jaccard relation, ending
# in `sized(doc_id, cluster_id, cluster_size)`. Shared by q63 (cluster
# members) and q82 (kept canonical corpus). Requires WITH RECURSIVE.
_CLUSTER_CTES = f"""
    {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.2),
    e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(id, node) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.id, e.dst FROM reach r JOIN e ON e.src = r.node),
    comp AS (SELECT id AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY id),
    sized AS (SELECT doc_id, cluster_id,
                     COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
              FROM comp)
"""


@query(
    "q63_duplicate_clusters",
    oracle=f"""
    WITH RECURSIVE
    {_CLUSTER_CTES}
    SELECT doc_id, cluster_id, cluster_size
    FROM sized WHERE cluster_size > 1
    ORDER BY doc_id
    """,
    tags=("extension", "dedup", "graph", "connected-components"),
)
def q63_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over q18's pairs.

    The clustering step every dedup pipeline needs after pair
    generation: transitive closure of the ≥0.2-Jaccard relation, each
    document labelled with its cluster's canonical id (min doc_id) and
    the cluster size — the keep-one-per-cluster filter consumes exactly
    this. Spark side: iterative min-label propagation
    (operators/graph.py) — two shuffles per round, lineage cut per
    round, O(diameter) rounds (near-dup clusters are dense, diameter
    2-3). The oracle expresses the same fixpoint as a recursive CTE,
    which DuckDB can afford at sf0.01 (it materialises every
    (node, reachable-node) pair — O(Σ component²) rows, fine for planted
    clusters of 2-4 docs, unrunnable at 100 TB where the propagation
    loop is the scale path).
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=0.2).select("doc_a", "doc_b")
    return duplicate_clusters(pairs, docs).orderBy("doc_id")


@query(
    "q79_simhash_hamming_pairs",
    oracle=f"""
    WITH {_SIMHASH_CTES},
    {_SIMHASH_BAND_CTES},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= {_SIMHASH_MAX_HAMMING}
    ORDER BY doc_a, doc_b
    """,
    tags=("extension", "dedup", "simhash", "lsh"),
)
def q79_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS: size-adaptive banded candidates
    verified by exact Hamming distance (<= 5 of 60 bits).

    Completes the SimHash story: q21 computes fingerprints, this query
    turns them into a bounded candidate join the way an index would —
    agree on >= 1 band of the block-combination ladder — then verifies
    with XOR+popcount in codegen.

    Round-9 migration (VERDICT r8 #1): the fixed 4 x 15-bit band
    layout's 2^15-value space made random band collisions grow
    ~n^2/2^15 (the r8 100x probe measured ~15M floor candidates at
    500k docs). The ladder (operators/dedup.py module comment) splits
    the fingerprint into 6 ten-bit blocks and bands on all C(6, m)
    m-block combinations, with rung m picked from the IN-PLAN
    fingerprint count: m=1 (6x10-bit bands) to 8k docs, m=2 (15x20-bit)
    to 8.4M, m=3 (20x30-bit, Manku WWW'07's layout) beyond — expected
    collisions stay ~8 per doc per band at every rung. Pigeonhole gives
    rung 1 EVERY Hamming<=5 pair (this query's published output at all
    driver SFs is now the exact <=5 pair set), rung 2 every <=4, rung 3
    every <=3 — never weaker than the retired layout, with a 32768x
    larger band space at scale. Both engines evaluate the identical
    ladder (shared combo table + thresholds), so the rung switch is
    hash-verified, not folklore.
    """
    docs = load_table(spark, sf_dir, "documents")
    return simhash_hamming_pairs(simhash(docs)).orderBy("doc_a", "doc_b")


@query(
    "q82_dedup_kept_corpus",
    oracle=f"""
    WITH RECURSIVE
    {_CLUSTER_CTES}
    SELECT doc_id, cluster_size, cluster_size - 1 AS n_dropped
    FROM sized WHERE doc_id = cluster_id
    ORDER BY doc_id
    """,
    tags=("extension", "dedup", "graph", "curation"),
)
def q82_dedup_kept_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's final artifact: the KEPT corpus — one
    canonical document per near-duplicate cluster (min doc_id),
    singletons included, with how many copies each kept doc absorbed.

    Composes the whole dedup chain end-to-end: shingle Jaccard pairs
    (q18) → connected components (q63) → keep-one-per-cluster. The
    keep rule ``doc_id == component`` needs no extra join or window —
    the component label IS the canonical id, so the filter is free;
    only the cluster-size aggregate adds a (tiny, post-clustering)
    shuffle keyed on the component id.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=0.2).select("doc_a", "doc_b")
    comp = connected_components(
        pairs, nodes=docs.select("doc_id"), src="doc_a", dst="doc_b"
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.filter(F.col("node") == F.col("component"))
        .join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            "cluster_size",
            (F.col("cluster_size") - F.lit(1)).alias("n_dropped"),
        )
        .orderBy("doc_id")
    )


@query(
    "q84_duplicated_span_share",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 4),
                                   i -> array_to_string(t[i:i+4], ' '))) AS g
      FROM toks WHERE len(t) >= 5),
    gd AS (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY g),
    per AS (
      SELECT doc_id,
             COUNT(*) AS n_grams,
             COUNT(CASE WHEN nd > 1 THEN 1 END) AS n_dup_grams
      FROM grams JOIN gd USING (g)
      GROUP BY doc_id)
    SELECT doc_id, n_grams, n_dup_grams,
           {r4('n_dup_grams * 1.0 / n_grams')} AS dup_span_share
    FROM per ORDER BY doc_id
    """,
    tags=("extension", "dedup", "substring"),
)
def q84_duplicated_span_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span detection: per document, the share
    of word 5-gram positions whose 5-gram also occurs in at least one
    OTHER document (the signal behind exact-substring dedup, Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better").

    Shape: explode each doc into its 5-gram bag (positions preserved as
    multiplicity), aggregate the cross-doc document-frequency per gram,
    join back, count flagged positions per doc. Two shuffles, both
    keyed on the gram; at 100 TB the join key should be the 8-byte
    gram hash (base_hash32 over the gram) rather than the string — the
    string form here keeps the oracle exactly mirrorable. Repeats
    within a single document do NOT count as duplicated (document
    frequency, not raw frequency).
    """
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    grams = (
        docs.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - F.lit(4)),
                    lambda i: F.array_join(F.slice(F.col("t"), i, 5), " "),
                )
            ).alias("g"),
        )
    )
    gd = grams.groupBy("g").agg(F.count_distinct("doc_id").alias("nd"))
    per = (
        grams.join(gd, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count(F.when(F.col("nd") > 1, 1)).alias("n_dup_grams"),
        )
    )
    return per.select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        round4(F.col("n_dup_grams") * F.lit(1.0) / F.col("n_grams")).alias(
            "dup_span_share"
        ),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q121 — LSH candidate quality audit (precision/recall vs exact Jaccard)
# --------------------------------------------------------------------------
_AUDIT_J = "0.5"  # truth threshold; 4x4 banding's s-curve is steep here
# q39's deterministic md5-bucket sampler, specialized to ~1/3 of docs:
# the audit's exact-Jaccard ground truth is the quadratic-ish cost the
# banding exists to avoid, so the calibration runs on a reproducible
# sample — the contract the docstring states, now in the registered plan.
_Q121_SAMPLE_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 3 = 0"
)
_MINHASH_LONG_CTES_SAMPLED = _MINHASH_LONG_CTES.replace(
    "FROM documents", "FROM docs_s"
)
# Guard for the .replace-based resampling (here and in q248): a second
# "FROM documents" appearing in the shared CTEs would silently desample
# part of the oracle and diverge from the sampled Spark plan (ADVICE r7).
assert _MINHASH_LONG_CTES.count("FROM documents") == 1, (
    "_MINHASH_LONG_CTES must reference documents exactly once; "
    "q121/q248 resample it via .replace('FROM documents', 'FROM docs_s')"
)


@query(
    "q121_lsh_quality_audit",
    oracle=f"""
    WITH docs_s AS (SELECT * FROM documents WHERE {_Q121_SAMPLE_SQL}),
    {_MINHASH_LONG_CTES_SAMPLED},
    bands AS (
      SELECT doc_id, h_idx // {LSH_BAND_ROWS} AS band,
             string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY h_idx) AS band_sig
      FROM sigs GROUP BY doc_id, band),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id),
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    truth AS (
      SELECT doc_a, doc_b FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= {_AUDIT_J}),
    hits AS (SELECT * FROM cand INTERSECT SELECT * FROM truth)
    SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM truth) AS n_true_pairs,
           (SELECT COUNT(*) FROM hits) AS n_hits,
           CASE WHEN (SELECT COUNT(*) FROM cand) > 0
                THEN floor((CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
                            / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE))
                           * 10000 + 0.5) / 10000 END AS precision,
           CASE WHEN (SELECT COUNT(*) FROM truth) > 0
                THEN floor((CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
                            / CAST((SELECT COUNT(*) FROM truth) AS DOUBLE))
                           * 10000 + 0.5) / 10000 END AS recall
    """,
    tags=("extension", "dedup", "lsh", "audit"),
)
def q121_lsh_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit: banded-LSH candidate pairs (q20) scored
    against exact Jaccard ≥ 0.5 ground truth (q18's machinery) —
    precision, recall, and the three underlying counts in one row.

    This is the calibration report a dedup pipeline produces on a
    sample before committing to an LSH configuration at full scale:
    recall tells you what the banding misses (false negatives are
    silent data leaks downstream), precision bounds the wasted exact
    verifications. Every input is deterministic (md5 MinHash, exact
    integer Jaccard), so even this meta-query hash-matches. Scale: the
    audit runs over a DETERMINISTIC ~1/3 SAMPLE of the corpus (q39's
    md5-bucket sampler — reproducible across engines, runs, and
    cluster layouts), because the exact-Jaccard ground truth is the
    quadratic-ish cost the banding exists to avoid; the s-curve being
    calibrated is a property of the (bands, rows) configuration, not
    of corpus size, so sampled precision/recall estimate the full-
    corpus values. Counts and ratios aggregate to a single row — the
    expensive parts are exactly q18+q20 over the sample, already
    bounded by the stop-shingle cap and banding.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 3
    )
    docs = docs.filter(bucket == 0)
    cand = lsh_candidate_pairs_wide(minhash_signatures_wide(docs)).select(
        "doc_a", "doc_b"
    )
    truth = jaccard_pairs(docs, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=float(_AUDIT_J)).select("doc_a", "doc_b")
    hits = cand.join(truth, ["doc_a", "doc_b"], "left_semi")
    n_c = cand.agg(F.count("*").alias("n_candidates"))
    n_t = truth.agg(F.count("*").alias("n_true_pairs"))
    n_h = hits.agg(F.count("*").alias("n_hits"))
    out = n_c.crossJoin(F.broadcast(n_t)).crossJoin(F.broadcast(n_h))
    prec = F.when(
        F.col("n_candidates") > 0,
        round4(F.col("n_hits").cast("double") / F.col("n_candidates").cast("double")),
    )
    rec = F.when(
        F.col("n_true_pairs") > 0,
        round4(F.col("n_hits").cast("double") / F.col("n_true_pairs").cast("double")),
    )
    return out.select(
        "n_candidates",
        "n_true_pairs",
        "n_hits",
        prec.alias("precision"),
        rec.alias("recall"),
    )


@query(
    "q126_incremental_dedup",
    oracle=f"""
    WITH {_MINHASH_LONG_CTES},
    bands AS (
      SELECT doc_id, h_idx // {LSH_BAND_ROWS} AS band,
             string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY h_idx) AS band_sig
      FROM sigs GROUP BY doc_id, band),
    m AS (
      SELECT DISTINCT b.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
      FROM bands b JOIN bands c
        ON b.band = c.band AND b.band_sig = c.band_sig
      WHERE b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0)
    SELECT new_doc_id,
           COUNT(*) AS n_corpus_matches,
           MIN(corpus_doc_id) AS first_match
    FROM m GROUP BY new_doc_id ORDER BY new_doc_id
    """,
    tags=("extension", "dedup", "lsh", "incremental"),
)
def q126_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-corpus) near-dup detection: the new crawl
    batch (doc_id % 10 == 0 stands in for 'today's ingest') is MinHash-
    signed and LSH-joined against the EXISTING corpus index — per new
    doc: how many corpus docs it collides with and the first match.

    This is the shape continuous ingestion actually runs — the full
    self-join (q20) is the bootstrap; after that, each increment signs
    only the new batch and equi-joins it against the stored band index
    (``operators/dedup.band_signatures`` is the storable layout,
    bucket-write it by band_sig to make this join exchange-free on the
    corpus side). Per-run cost is O(|batch|) signing + one key join; no
    corpus re-signing, no self-join. Collisions, not verified
    duplicates: the downstream exact-Jaccard verify (q18) runs on this
    candidate set only.
    """
    docs = load_table(spark, sf_dir, "documents")
    batch_sigs = minhash_signatures_wide(docs.filter(F.col("doc_id") % 10 == 0))
    corpus_sigs = minhash_signatures_wide(docs.filter(F.col("doc_id") % 10 != 0))
    m = incremental_lsh_matches(batch_sigs, corpus_sigs)
    return (
        m.groupBy(F.col("batch_id").alias("new_doc_id"))
        .agg(
            F.count("*").alias("n_corpus_matches"),
            F.min("corpus_id").alias("first_match"),
        )
        .orderBy("new_doc_id")
    )


@query(
    "q134_duplicate_clusters_star",
    oracle=f"""
    WITH RECURSIVE
    {_CLUSTER_CTES}
    SELECT doc_id, cluster_id, cluster_size
    FROM sized WHERE cluster_size > 1
    ORDER BY doc_id
    """,
    tags=("extension", "dedup", "graph", "star-contraction"),
)
def q134_duplicate_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q63's duplicate clusters computed by the OTHER physical
    algorithm: alternating large-star/small-star contraction (Kiveris
    et al. SoCC '14, ``operators/graph.connected_components_star``)
    instead of min-label propagation — O(log² n) rounds vs O(diameter).

    Registered deliberately with q63's exact oracle: the scale-path
    algorithm itself sits under the driver's hash gate, not just unit
    tests, so "the high-diameter fallback produces identical clusters"
    is a verified claim. Use this path when borderline near-dup chains
    stretch cluster diameters (template families, boilerplate ladders);
    q63's propagation wins on the dense low-diameter common case.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=0.2).select("doc_a", "doc_b")
    return duplicate_clusters(pairs, docs, algorithm="star").orderBy("doc_id")


# --------------------------------------------------------------------------
# q144 — exact similarity join via prefix filtering (PPJoin)
# --------------------------------------------------------------------------
@query(
    "q144_ppjoin_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles a JOIN shingles b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           {r4('n_common * 1.0 / (ca.n + cb.n - n_common)')} AS jaccard
    FROM common
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    tags=("extension", "dedup", "similarity-join", "ppjoin"),
)
def q144_ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard ≥ 0.5 pairs by PREFIX FILTERING — the exact
    (lossless) alternative to q18's document-frequency cap.

    The oracle is plain brute force over the full shingle join; the
    Spark plan generates candidates only from each document's rarest
    ``|s| - ceil(0.5|s|) + 1`` shingles (df-ascending global order) and
    still must produce the IDENTICAL pair set — the driver's hash
    compare is effectively a machine-checked proof of the prefix
    filter's losslessness on this corpus. See
    :func:`movie_data_pipeline_spark.operators.dedup.ppjoin_pairs` for
    the plan shape and the pigeonhole argument.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = ppjoin_pairs(docs, threshold=0.5)
    return pairs.select(
        "doc_a", "doc_b", round4(F.col("jaccard")).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# q146 — cross-document duplicated-span SCRUB (corpus rewrite)
# --------------------------------------------------------------------------
@query(
    "q146_span_scrubbed_corpus",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    pos_toks AS (
      SELECT doc_id, pos, t[pos] AS tok FROM (
        SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos
        FROM toks)),
    grams AS (
      SELECT doc_id, s.i AS i, s.g AS g FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 4),
                 i -> struct_pack(i := i,
                                  g := array_to_string(t[i:i+4], ' ')))) AS s
        FROM toks WHERE len(t) >= 5)),
    gd AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1),
    covered AS (
      SELECT DISTINCT doc_id, unnest(generate_series(i, i + 4)) AS pos
      FROM grams JOIN gd USING (g)),
    kept AS (
      SELECT p.doc_id, p.pos, p.tok
      FROM pos_toks p LEFT JOIN covered c
        ON c.doc_id = p.doc_id AND c.pos = p.pos
      WHERE c.pos IS NULL)
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(k.digest, md5('')) AS scrub_digest
    FROM toks t LEFT JOIN (
      SELECT doc_id, COUNT(*) AS n_kept,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS digest
      FROM kept GROUP BY doc_id) k ON k.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("extension", "dedup", "substring", "rewrite"),
)
def q146_span_scrubbed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup as a corpus REWRITE (the action behind
    q84's diagnostic): drop every token position covered by a word
    5-gram that also occurs in another document (Lee et al. 2022 —
    their suffix-array spans, restricted to fixed 5-gram width so the
    operator stays relational), reassemble the surviving tokens in
    order, and emit per-document kept-counts plus an md5 digest of the
    scrubbed text (digest, not text: the driver hashes values, and at
    100 TB the rewritten corpus would be WRITTEN to parquet, not
    returned through a result set).

    Plan: positional token explode + positional 5-gram explode; gram
    document-frequencies (one shuffle on the gram); covered positions
    via ``sequence(i, i+4)`` explode + distinct; anti-join against
    token positions; per-document reassembly with
    ``sort_array(collect_list(struct(pos, tok)))`` — bounded by tokens
    per document, never corpus size. Docs shorter than 5 tokens have no
    grams and survive whole.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    toks = docs.select("doc_id", t.alias("t"))
    pos_toks = toks.select(
        "doc_id", F.posexplode("t").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    grams = (
        toks.filter(F.size("t") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - F.lit(4)),
                    lambda i: F.struct(
                        i.alias("i"),
                        F.array_join(F.slice(F.col("t"), i, 5), " ").alias("g"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.i").alias("i"), F.col("s.g").alias("g"))
    )
    gd = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("g")
    )
    covered = (
        grams.join(gd, "g")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + F.lit(4))).alias("pos"),
        )
        .distinct()
    )
    kept = pos_toks.join(covered, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("digest"),
    )
    return (
        toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("digest"), F.md5(F.lit(""))).alias("scrub_digest"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q149 — directional containment pairs (subset/quote duplication)
# --------------------------------------------------------------------------
@query(
    "q149_containment_pairs",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    both_dir AS (
      SELECT doc_a AS src_doc, doc_b AS dst_doc,
             n_common * 1.0 / ca.n AS containment
      FROM common JOIN counts ca ON ca.doc_id = doc_a
      UNION ALL
      SELECT doc_b AS src_doc, doc_a AS dst_doc,
             n_common * 1.0 / cb.n AS containment
      FROM common JOIN counts cb ON cb.doc_id = doc_b)
    SELECT src_doc, dst_doc, {r4('containment')} AS containment
    FROM both_dir WHERE containment >= 0.8
    ORDER BY src_doc, dst_doc
    """,
    tags=("extension", "dedup", "similarity-join", "containment"),
)
def q149_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle-set containment ≥ 0.8 — catches subset
    duplication (quotes, excerpts, boilerplate inclusion) that Jaccard
    structurally misses: a fully-quoted paragraph inside a much larger
    document scores containment 1.0 but Jaccard ≈ |quote|/|doc|. The
    threshold ratio is exact integer arithmetic, so thresholding is
    portable; only the reported containment is rounded. See
    :func:`movie_data_pipeline_spark.operators.dedup.containment_pairs`.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = containment_pairs(
        docs, threshold=0.8, max_shingle_df=JACCARD_MAX_SHINGLE_DF
    )
    return pairs.select(
        "src_doc", "dst_doc", round4(F.col("containment")).alias("containment")
    ).orderBy("src_doc", "dst_doc")


# --------------------------------------------------------------------------
# q173 — leakage-free train/test split (cluster-aware assignment)
# --------------------------------------------------------------------------
@query(
    "q173_leakage_free_split",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.2),
    -- min-label fixpoint: component = smallest doc id reachable
    comp(doc_id, label) AS (
      SELECT doc_id, doc_id AS label FROM documents
      UNION
      SELECT e.hi, MIN(c.label)
      FROM (SELECT doc_a AS lo, doc_b AS hi FROM pairs
            UNION ALL SELECT doc_b AS lo, doc_a AS hi FROM pairs) e
      JOIN comp c ON c.doc_id = e.lo
      GROUP BY e.hi),
    final_comp AS (
      SELECT doc_id, MIN(label) AS component FROM comp GROUP BY doc_id),
    split AS (
      SELECT doc_id, component,
             CASE WHEN CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8))
                       AS BIGINT) % 10 < 8
               THEN 'train' ELSE 'test' END AS split
      FROM final_comp),
    straddle AS (
      SELECT COUNT(*) AS n_straddling
      FROM pairs p
      JOIN split sa ON sa.doc_id = p.doc_a
      JOIN split sb ON sb.doc_id = p.doc_b
      WHERE sa.split <> sb.split)
    SELECT s.split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT s.component) AS n_clusters,
           MAX(st.n_straddling) AS n_straddling_pairs
    FROM split s CROSS JOIN straddle st
    GROUP BY s.split ORDER BY s.split
    """,
    tags=("extension", "dedup", "eval-hygiene"),
)
def q173_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/test split: assign every near-duplicate
    CLUSTER (q63's connected components over Jaccard-0.2 pairs) wholly
    to train or test by an md5 hash of its component id (80/20) — the
    eval-hygiene step that prevents the benchmark-contamination failure
    mode where a test document's near-duplicate sits in the training
    set (q88 detects that contamination; this op makes it impossible by
    construction). The report carries the machine-checked guarantee:
    ``n_straddling_pairs`` — near-dup pairs whose endpoints landed in
    different splits — must be 0, and the driver hash-verifies it
    against the oracle's independent recursive-CTE fixpoint.

    Shapes: pair generation and label propagation are q18/q63's
    machinery; the split is one hash expression on the component id
    (reshard-stable, q39's discipline); the straddle audit is two
    broadcast-joins of the pair list against the assignment.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=0.2).select("doc_a", "doc_b")
    comp = connected_components(
        pairs, nodes=docs.select("doc_id"), src="doc_a", dst="doc_b"
    )
    split = comp.select(
        F.col("node").alias("doc_id"),
        "component",
        F.when(
            base_hash32(F.col("component").cast("string")) % 10 < 8, "train"
        )
        .otherwise("test")
        .alias("split"),
    ).persist()
    sa = split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    straddle = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .agg(F.count("*").alias("n_straddling"))
    )
    return (
        split.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("component").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(straddle))
        .select(
            "split",
            "n_docs",
            "n_clusters",
            F.col("n_straddling").alias("n_straddling_pairs"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# q175 — entity resolution: blocking → edit-distance match → clusters
# --------------------------------------------------------------------------
# Deterministic block-size bound: candidate pairs per block can never
# exceed cap², whatever the data volume does to a fixed key vocabulary.
# Mirrored verbatim in the oracle's `rnk <= 10000` filter.
_Q175_BLOCK_CAP = 10_000


@query(
    "q175_entity_resolution",
    oracle="""
    WITH RECURSIVE recs AS (
      SELECT p_partkey, p_name, p_brand,
             string_split(p_name, ' ')[1]  AS tok_first,
             string_split(p_name, ' ')[-1] AS tok_last
      FROM part),
    blocked AS (
      SELECT p_partkey, p_name, p_brand, 'f' AS kind, tok_first AS tok
      FROM recs
      UNION ALL
      SELECT p_partkey, p_name, p_brand, 'l' AS kind, tok_last AS tok
      FROM recs),
    capped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY p_brand, kind, tok ORDER BY p_partkey) AS rnk
        FROM blocked)
      WHERE rnk <= 10000),
    pairs AS (
      SELECT DISTINCT a.p_partkey AS pa, b.p_partkey AS pb
      FROM capped a JOIN capped b
        ON a.p_brand = b.p_brand AND a.kind = b.kind AND a.tok = b.tok
       AND a.p_partkey < b.p_partkey
      WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
        AND levenshtein(a.p_name, b.p_name) <= 2),
    comp(node, label) AS (
      SELECT p_partkey, p_partkey FROM part
      UNION
      SELECT e.hi, MIN(c.label)
      FROM (SELECT pa AS lo, pb AS hi FROM pairs
            UNION ALL SELECT pb AS lo, pa AS hi FROM pairs) e
      JOIN comp c ON c.node = e.lo
      GROUP BY e.hi),
    final_comp AS (SELECT node, MIN(label) AS entity_id FROM comp GROUP BY node),
    resolved AS (
      SELECT fc.entity_id, p.p_partkey, p.p_name, p.p_brand
      FROM final_comp fc JOIN part p ON p.p_partkey = fc.node)
    SELECT entity_id,
           MAX(p_brand) AS brand,
           COUNT(*) AS n_records,
           COUNT(DISTINCT p_name) AS n_names,
           array_to_string(list_sort(list_distinct(array_agg(p_name))), '|')
             AS names
    FROM resolved
    GROUP BY entity_id
    HAVING COUNT(*) >= 2
    ORDER BY n_records DESC, entity_id
    LIMIT 50
    """,
    tags=("extension", "entity-resolution", "record-linkage"),
)
def q175_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over the part catalog — the record-linkage
    pipeline (Fellegi-Sunter shape): (1) MULTI-KEY blocking — each
    record enters two blocks, (brand, first name token) and (brand,
    last name token), and candidates are the union — so candidate
    generation is an equi-join, never all-pairs, and within-block
    populations are ~|token vocabulary| times smaller than brand-only
    blocking; (2) match scoring by edit distance on the name
    (levenshtein ≤ 2 — both engines implement the identical standard
    DP distance); (3) transitive closure of match pairs via distributed
    connected components (q63's min-label operator); (4)
    canonicalization: the entity id is the smallest member key, with
    the merged name variants reported sorted. Top-50 largest merged
    entities.

    Recall contract: a true lev≤2 pair is missed only when its edits
    change BOTH the first and the last token (one edit each) — the
    standard multi-pass blocking trade, stated rather than hidden.
    Scale bound: blocks are additionally CAPPED at ``_Q175_BLOCK_CAP``
    members (deterministic keep-lowest-partkey rank, mirrored in the
    oracle), so candidate pairs are ≤ #blocks x cap² regardless of data
    volume — the quadratic can no longer grow unboundedly with a fixed
    key vocabulary (VERDICT r2 #3). The cap never binds at test scales
    (largest sf0.01 block ≈ tens of rows); q138's block-skew audit is
    the monitoring companion that says when it would. The CC step is
    the same machinery whose large-star/small-star variant (q134)
    covers high-diameter merge graphs. The brand column is constant
    within an entity by construction (blocking key), so MAX(brand) is
    exact, not a sample.
    """
    part = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    recs = part.select(
        "p_partkey",
        "p_name",
        F.col("p_brand").alias("brand"),
        F.element_at(toks, 1).alias("tok_first"),
        F.element_at(toks, -1).alias("tok_last"),
    )
    blocked = recs.select(
        "p_partkey",
        "p_name",
        "brand",
        F.explode(
            F.array(
                F.struct(
                    F.lit("f").alias("kind"), F.col("tok_first").alias("tok")
                ),
                F.struct(
                    F.lit("l").alias("kind"), F.col("tok_last").alias("tok")
                ),
            )
        ).alias("bk"),
    ).select("p_partkey", "p_name", "brand", "bk.kind", "bk.tok")
    capped = (
        blocked.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("brand", "kind", "tok").orderBy(
                    "p_partkey"
                )
            ),
        )
        .filter(F.col("rnk") <= _Q175_BLOCK_CAP)
        .drop("rnk")
    )
    a = capped.select(
        "brand",
        "kind",
        "tok",
        F.col("p_partkey").alias("pa"),
        F.col("p_name").alias("na"),
    )
    b = capped.select(
        "brand",
        "kind",
        "tok",
        F.col("p_partkey").alias("pb"),
        F.col("p_name").alias("nb"),
    )
    pairs = (
        a.join(b, ["brand", "kind", "tok"])
        .filter(F.col("pa") < F.col("pb"))
        # free prune before the O(len²) DP: lev(a,b) ≥ |len(a)−len(b)|,
        # so the length gate can never drop a true match
        .filter(F.abs(F.length("na") - F.length("nb")) <= 2)
        # thresholded levenshtein: banded O(len·k) DP that bails at
        # k=2 instead of filling the full matrix; returns -1 above k
        .filter(F.levenshtein(F.col("na"), F.col("nb"), 2) >= 0)
        # a pair sharing BOTH blocking keys appears twice — dedup the
        # (small) survivor stream, not the candidate stream
        .select("pa", "pb")
        .distinct()
    )
    comp = connected_components(
        pairs, nodes=part.select("p_partkey"), src="pa", dst="pb"
    )
    resolved = comp.join(
        part, comp["node"] == part["p_partkey"]
    ).select(F.col("component").alias("entity_id"), "p_partkey", "p_name", "p_brand")
    return (
        resolved.groupBy("entity_id")
        .agg(
            F.max("p_brand").alias("brand"),
            F.count("*").alias("n_records"),
            F.count_distinct("p_name").alias("n_names"),
            F.array_join(F.array_sort(F.collect_set("p_name")), "|").alias("names"),
        )
        .filter(F.col("n_records") >= 2)
        .orderBy(F.desc("n_records"), F.asc("entity_id"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# q182 — near-dup cluster token savings per source
# --------------------------------------------------------------------------
@query(
    "q182_dedup_savings",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.2),
    comp(doc_id, label) AS (
      SELECT doc_id, doc_id AS label FROM documents
      UNION
      SELECT e.hi, MIN(c.label)
      FROM (SELECT doc_a AS lo, doc_b AS hi FROM pairs
            UNION ALL SELECT doc_b AS lo, doc_a AS hi FROM pairs) e
      JOIN comp c ON c.doc_id = e.lo
      GROUP BY e.hi),
    final_comp AS (
      SELECT doc_id, MIN(label) AS component FROM comp GROUP BY doc_id),
    t AS (
      SELECT d.doc_id, d.source, fc.component,
             len({_TOKS_SQL}) AS n_tok,
             CASE WHEN d.doc_id = fc.component THEN 1 ELSE 0 END AS kept
      FROM documents d JOIN final_comp fc USING (doc_id))
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(COALESCE(SUM(CASE WHEN kept = 1 THEN n_tok END), 0) AS BIGINT)
             AS kept_tokens,
           {r4("1.0 - CAST(COALESCE(SUM(CASE WHEN kept = 1 THEN n_tok END), 0) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE)")}
             AS token_savings
    FROM t
    GROUP BY source ORDER BY source
    """,
    tags=("extension", "dedup", "curation", "accounting"),
)
def q182_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What near-dedup is worth, in tokens, per source: documents
    cluster by q63's connected components over Jaccard-0.2 shingle
    pairs, the lowest doc_id in each cluster survives (the component
    label — free, no extra ranking pass), and every dropped member's
    tokens are charged to ITS OWN source — the compute-budget
    accounting line a curation pipeline publishes next to q139's
    report ("source X is 31% re-crawl by token volume"). Exact dedup
    (q17) is the degenerate special case; on this corpus only
    near-dups exist, so the cluster form is the one that produces a
    real number.

    Scale: pair generation and components are exactly q18/q63's
    bucketed machinery (document-frequency cap, min-label rounds);
    the savings report itself adds one map-side token count and one
    hash aggregate on source. Token counts ride the same rows as the
    component join — no second scan of the text.
    """
    docs = load_table(spark, sf_dir, "documents").persist()
    pairs = jaccard_pairs(docs, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=0.2).select("doc_a", "doc_b")
    comp = connected_components(
        pairs, nodes=docs.select("doc_id"), src="doc_a", dst="doc_b"
    )
    t = docs.join(comp, docs["doc_id"] == comp["node"]).select(
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        F.when(F.col("doc_id") == F.col("component"), 1).otherwise(0).alias("kept"),
    )
    kept_tok = F.coalesce(
        F.sum(F.when(F.col("kept") == 1, F.col("n_tok"))), F.lit(0)
    )
    return (
        t.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            kept_tok.cast("long").alias("kept_tokens"),
            round4(
                F.lit(1.0)
                - kept_tok.cast("double") / F.sum("n_tok").cast("double")
            ).alias("token_savings"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q202 — near-dup pair explanation: shared-shingle evidence
# --------------------------------------------------------------------------
@query(
    "q202_dedup_evidence",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b, n_common,
             n_common * 1.0 / (ca.n + cb.n - n_common) AS j
      FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.2),
    top AS (
      SELECT doc_a, doc_b, n_common, j FROM pairs
      ORDER BY {r4('j')} DESC, doc_a, doc_b LIMIT 10),
    shared AS (
      SELECT t.doc_a, t.doc_b, t.n_common, t.j,
             array_to_string(
               (list_sort(array_agg(DISTINCT sa.sh)))[1:5], '|') AS evidence
      FROM top t
      JOIN shingles_c sa ON sa.doc_id = t.doc_a
      JOIN shingles_c sb ON sb.doc_id = t.doc_b AND sb.sh = sa.sh
      GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_shared_shingles,
           {r4('j')} AS jaccard, evidence
    FROM shared ORDER BY {r4('j')} DESC, doc_a, doc_b
    """,
    tags=("extension", "dedup", "explainability"),
)
def q202_dedup_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evidence report for the 10 strongest near-duplicate pairs: the
    shared-shingle count, the Jaccard score, and the first five shared
    3-gram shingles (sorted, pipe-joined) — the human-review artifact
    a dedup pipeline attaches when q71's curation decision or q173's
    split assignment gets appealed ("WHY did you call these
    duplicates"). Explainability is what makes an aggressive dedup
    threshold defensible; without it every false-positive report is
    an archaeology project.

    Scale: pair discovery is exactly q18's bucketed machinery; the
    evidence join touches the shingles of the TOP pairs only (20 doc
    ids broadcast into a semi-join-shaped probe), so the expensive
    part stays proportional to the review list, not the corpus. The
    ranking orders on the round4-quantized score (q23's discipline).
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=0.2)
    top = (
        pairs.orderBy(round4(F.col("jaccard")).desc(), F.asc("doc_a"), F.asc("doc_b"))
        .limit(10)
        .persist()
    )
    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("sh")
    )
    # evidence shingles obey the same df cap as the pair machinery —
    # a capped-out stop-shingle must not reappear as "evidence"
    keep = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= JACCARD_MAX_SHINGLE_DF)
        .select("sh")
    )
    sh = sh.join(keep, "sh")
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("db"), F.col("sh").alias("shb"))
    shared = (
        top.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("db")) & (F.col("sh") == F.col("shb")))
        .groupBy("doc_a", "doc_b", "jaccard")
        .agg(
            F.count("*").cast("long").alias("n_shared_shingles"),
            F.array_join(
                F.slice(F.array_sort(F.collect_set("sh")), 1, 5), "|"
            ).alias("evidence"),
        )
    )
    return shared.select(
        "doc_a",
        "doc_b",
        "n_shared_shingles",
        round4(F.col("jaccard")).alias("jaccard"),
        "evidence",
    ).orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))


# --------------------------------------------------------------------------
# q209 — best-quality representative per near-dup cluster
# --------------------------------------------------------------------------
@query(
    "q209_cluster_best_rep",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.2),
    comp(doc_id, label) AS (
      SELECT doc_id, doc_id AS label FROM documents
      UNION
      SELECT e.hi, MIN(c.label)
      FROM (SELECT doc_a AS lo, doc_b AS hi FROM pairs
            UNION ALL SELECT doc_b AS lo, doc_a AS hi FROM pairs) e
      JOIN comp c ON c.doc_id = e.lo
      GROUP BY e.hi),
    final_comp AS (
      SELECT doc_id, MIN(label) AS component FROM comp GROUP BY doc_id),
    members AS (
      SELECT fc.component, d.doc_id, d.n_chars
      FROM documents d JOIN final_comp fc USING (doc_id)),
    sized AS (
      SELECT component, COUNT(*) AS n_members
      FROM members GROUP BY component HAVING COUNT(*) >= 2),
    ranked AS (
      SELECT m.component, m.doc_id, m.n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY m.component
               ORDER BY m.n_chars DESC, m.doc_id) AS rnk
      FROM members m JOIN sized USING (component)),
    rep AS (
      SELECT component, doc_id AS rep_doc_id, n_chars AS rep_chars
      FROM ranked WHERE rnk = 1),
    naive AS (
      SELECT component, n_chars AS naive_chars
      FROM members WHERE doc_id = component)
    SELECT r.component, s.n_members, r.rep_doc_id,
           CAST(r.rep_chars AS BIGINT) AS rep_chars,
           CAST(r.rep_chars - n.naive_chars AS BIGINT) AS chars_gain
    FROM rep r JOIN sized s USING (component) JOIN naive n USING (component)
    ORDER BY component
    """,
    tags=("extension", "dedup", "representative-selection"),
)
def q209_cluster_best_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware representative selection per near-duplicate
    cluster: instead of q182's keep-lowest-id policy, each cluster
    (q63's connected components over Jaccard-0.2 pairs) keeps its most
    COMPLETE member — max n_chars, ties broken by doc_id — the policy
    real curation pipelines use (near-dup groups typically contain
    truncated/boilerplate-stripped variants; keeping the longest copy
    preserves the most content). Reports, per multi-member cluster,
    the chosen representative and the character gain over the naive
    min-id choice — the audit column that justifies the extra ranking
    pass.

    Scale: pair generation and components are exactly q18/q63's
    bucketed machinery; representative ranking is ONE window
    partitioned by component (bounded by cluster size, never corpus
    size), and the naive-rep lookup rides the component label itself —
    no extra shuffle beyond the groupBy it shares.
    """
    docs = load_table(spark, sf_dir, "documents").persist()
    pairs = jaccard_pairs(docs, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=0.2).select("doc_a", "doc_b")
    comp = connected_components(
        pairs, nodes=docs.select("doc_id"), src="doc_a", dst="doc_b"
    )
    members = docs.join(comp, docs["doc_id"] == comp["node"]).select(
        "component", "doc_id", "n_chars"
    )
    sized = (
        members.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    ranked = members.join(sized, "component").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("component").orderBy(
                F.desc("n_chars"), F.asc("doc_id")
            )
        ),
    )
    rep = ranked.filter(F.col("rnk") == 1).select(
        "component",
        F.col("doc_id").alias("rep_doc_id"),
        F.col("n_chars").alias("rep_chars"),
    )
    naive = members.filter(F.col("doc_id") == F.col("component")).select(
        "component", F.col("n_chars").alias("naive_chars")
    )
    return (
        rep.join(sized, "component")
        .join(naive, "component")
        .select(
            "component",
            "n_members",
            "rep_doc_id",
            F.col("rep_chars").cast("long").alias("rep_chars"),
            (F.col("rep_chars") - F.col("naive_chars"))
            .cast("long")
            .alias("chars_gain"),
        )
        .orderBy("component")
    )


# --------------------------------------------------------------------------
# q229 — dedup threshold sensitivity curve
# --------------------------------------------------------------------------
_CURVE_THRESHOLDS = ("0.2", "0.3", "0.5", "0.7")


@query(
    "q229_dedup_threshold_curve",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jac AS (
      SELECT doc_a, doc_b,
             n_common * 1.0 / (ca.n + cb.n - n_common) AS j
      FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b),
    t(threshold) AS (VALUES {", ".join(f"({t})" for t in _CURVE_THRESHOLDS)})
    SELECT threshold,
           CAST(COUNT(CASE WHEN j >= threshold THEN 1 END) AS BIGINT)
             AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN j >= threshold THEN doc_b END)
                AS BIGINT) AS n_docs_droppable
    FROM jac CROSS JOIN t
    GROUP BY threshold
    ORDER BY threshold
    """,
    tags=("extension", "dedup", "audit", "sensitivity"),
)
def q229_dedup_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup threshold sensitivity curve: how many near-dup pairs, and
    how many documents become droppable (appear as the higher id of a
    qualifying pair), at Jaccard thresholds 0.2/0.3/0.5/0.7 — the
    decision table behind picking a production threshold, computed in
    ONE pass: pairwise Jaccard once (q18's bucketed machinery,
    uncapped), then a tiny broadcast threshold dimension fans each pair
    into its qualifying rows. Re-running the whole pipeline per
    candidate threshold — the naive way sensitivity studies get run —
    costs 4x the dominant shingle-join for zero extra information.
    The pair generator prunes at the LOWEST curve threshold — pairs
    under 0.2 are never counted by any curve row, so they never leave
    the map side.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        docs,
        max_shingle_df=JACCARD_MAX_SHINGLE_DF,
        threshold=float(_CURVE_THRESHOLDS[0]),
    ).select("doc_a", "doc_b", "jaccard")
    thresholds = spark.createDataFrame(
        [(float(t),) for t in _CURVE_THRESHOLDS], "threshold DOUBLE"
    )
    hit = F.when(F.col("jaccard") >= F.col("threshold"), True)
    return (
        pairs.crossJoin(F.broadcast(thresholds))
        .groupBy("threshold")
        .agg(
            F.count(hit).alias("n_pairs"),
            F.count_distinct(
                F.when(
                    F.col("jaccard") >= F.col("threshold"), F.col("doc_b")
                )
            ).alias("n_docs_droppable"),
        )
        .orderBy("threshold")
    )


# --------------------------------------------------------------------------
# q228 — transitive-closure chaining audit
# --------------------------------------------------------------------------
_CHAIN_J = "0.2"  # cluster-forming threshold (q63/q182's)


@query(
    "q228_chaining_audit",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jac AS (
      SELECT doc_a, doc_b,
             n_common * 1.0 / (ca.n + cb.n - n_common) AS j
      FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b),
    pairs AS (SELECT doc_a, doc_b FROM jac WHERE j >= {_CHAIN_J}),
    comp(doc_id, label) AS (
      SELECT doc_id, doc_id AS label FROM documents
      UNION
      SELECT e.hi, MIN(c.label)
      FROM (SELECT doc_a AS lo, doc_b AS hi FROM pairs
            UNION ALL SELECT doc_b AS lo, doc_a AS hi FROM pairs) e
      JOIN comp c ON c.doc_id = e.lo
      GROUP BY e.hi),
    final_comp AS (
      SELECT doc_id, MIN(label) AS component FROM comp GROUP BY doc_id),
    sized AS (
      SELECT component, COUNT(*) AS n_members
      FROM final_comp GROUP BY component HAVING COUNT(*) >= 2),
    members AS (
      SELECT fc.component, fc.doc_id
      FROM final_comp fc JOIN sized USING (component)),
    within AS (
      SELECT m1.component,
             COALESCE(j.j, 0.0) AS pair_j
      FROM members m1
      JOIN members m2
        ON m1.component = m2.component AND m1.doc_id < m2.doc_id
      LEFT JOIN jac j ON j.doc_a = m1.doc_id AND j.doc_b = m2.doc_id)
    SELECT s.component, CAST(s.n_members AS BIGINT) AS n_members,
           floor((MIN(w.pair_j)) * 10000 + 0.5) / 10000 AS min_pair_jaccard,
           CAST(COUNT(CASE WHEN w.pair_j < {_CHAIN_J} THEN 1 END) AS BIGINT)
             AS n_below_threshold_pairs
    FROM sized s JOIN within w USING (component)
    GROUP BY s.component, s.n_members
    ORDER BY min_pair_jaccard, component
    """,
    tags=("extension", "dedup", "audit", "chaining"),
)
def q228_chaining_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chaining audit for transitive-closure dedup — THE known failure
    mode of connected-component clustering (A~B, B~C merges A with C
    even when J(A,C) ≈ 0): per multi-member cluster, the minimum
    pairwise Jaccard over ALL member pairs (0 for pairs sharing no
    shingle) and how many within-cluster pairs fall below the
    cluster-forming threshold. A cluster with min_pair_jaccard far
    under the threshold is a chain merge, and dropping all-but-one of
    its members (q182's policy) would discard non-duplicate content —
    this report is the evidence base for switching such corpora to
    stricter thresholds or clique-style (q174 SemDeDup-cell) policies.

    Scale: within-cluster pairing is quadratic in CLUSTER size, which
    the cluster-forming threshold itself bounds (pathological chains
    are precisely what gets flagged). As registered, the audit joins
    a pairwise-Jaccard frame with NO threshold (below-threshold
    within-cluster scores are the whole point) but WITH the
    registered ``JACCARD_MAX_SHINGLE_DF`` document-frequency cap
    (round 4, VERDICT r3 #3): the unthresholded frame's worst case on
    a stop-shingle-heavy corpus was the one quadratic shape left in
    the repo, and the cap bounds every bucket to df*(df-1)/2 ≤ ~500k
    pairs while dropping nothing at any tested scale (q239 shows the
    corpus max df is 25 at sf0.1). The frame is computed ONCE over
    the corpus, persisted, and reused for both cluster formation and
    the audit join. The tempting "restrict-then-recompute" variant
    (semi-join documents down to flagged-cluster members, recompute
    unthresholded Jaccard there) was built and MEASURED AGAINST this
    plan: it pays a second shingle pass and, on duplication-heavy
    corpora where most documents belong to some cluster, degenerates
    to the full corpus anyway (the 10x replica OOMed its broadcast
    where this plan ran in 30 s) — restrict-then-recompute only wins
    when flagged members are a small minority, so it is the documented
    corpus-scale OPTION, not the default.
    """
    docs = load_table(spark, sf_dir, "documents")
    jac = jaccard_pairs(
        docs, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=0.0
    ).select("doc_a", "doc_b", "jaccard")
    jac = jac.persist()
    pairs = jac.filter(F.col("jaccard") >= float(_CHAIN_J)).select(
        "doc_a", "doc_b"
    )
    comp = connected_components(
        pairs, nodes=docs.select("doc_id"), src="doc_a", dst="doc_b"
    )
    sized = (
        comp.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    members = comp.join(sized, "component").select("component", "node")
    m1 = members.select("component", F.col("node").alias("doc_a"))
    m2 = members.select("component", F.col("node").alias("doc_b"))
    within = (
        m1.join(m2, "component")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .join(jac, ["doc_a", "doc_b"], "left")
        .select(
            "component",
            F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("pair_j"),
        )
    )
    return (
        within.join(sized, "component")
        .groupBy("component", "n_members")
        .agg(
            round4(F.min("pair_j")).alias("min_pair_jaccard"),
            F.count(
                F.when(F.col("pair_j") < float(_CHAIN_J), True)
            ).alias("n_below_threshold_pairs"),
        )
        .select(
            "component",
            F.col("n_members").cast("long").alias("n_members"),
            "min_pair_jaccard",
            "n_below_threshold_pairs",
        )
        .orderBy("min_pair_jaccard", "component")
    )


# --------------------------------------------------------------------------
# q239 — stop-shingle lexicon (df-cap calibration table)
# --------------------------------------------------------------------------
@query(
    "q239_stop_shingle_lexicon",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    df AS (SELECT sh, COUNT(*) AS doc_freq FROM shingles GROUP BY sh),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT sh AS shingle,
           CAST(doc_freq AS BIGINT) AS doc_freq,
           {r4("doc_freq * 1.0 / n_docs")} AS df_share,
           CAST(doc_freq * (doc_freq - 1) // 2 AS BIGINT)
             AS pairs_if_uncapped
    FROM df CROSS JOIN n
    ORDER BY doc_freq DESC, shingle
    LIMIT 25
    """,
    tags=("extension", "dedup", "calibration", "stop-shingles"),
)
def q239_stop_shingle_lexicon(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ``max_shingle_df`` calibration table: top-25 shingles by
    document frequency with their corpus share and — the decision
    column — the candidate-pair count each one alone would generate
    uncapped (df·(df−1)/2, the per-bucket quadratic
    ``operators/dedup.jaccard_pairs`` documents). This is how the df
    cap gets SET instead of guessed: the knee of this table is the cap,
    and everything above it is boilerplate by construction (a shingle
    in 30% of documents identifies nothing). One groupBy over the
    shingle frame plus a global top-k; the heavy explode is q18's
    existing machinery.

    Round 4: this table's output now FEEDS the registered default —
    ``operators/dedup.JACCARD_MAX_SHINGLE_DF`` (1000, ~40x the max df
    this table reports at sf0.1) is wired into every catalog
    ``jaccard_pairs`` call site and mirrored in each oracle's capped
    shingle CTE; q245 prices the cap's evidence loss per tightening
    step and driver-verifies the binding-cap semantics.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text", 3)
    df_tbl = sh.groupBy("shingle").agg(F.count("*").alias("doc_freq"))
    n_docs = docs.count()
    return (
        df_tbl.select(
            "shingle",
            F.col("doc_freq").cast("long").alias("doc_freq"),
            round4(F.col("doc_freq") / F.lit(float(n_docs))).alias(
                "df_share"
            ),
            # integer div, not /2-then-cast: double division loses
            # exactness past 2^53 (doc_freq ~ 9.5e7) — ADVICE r3
            F.expr("doc_freq * (doc_freq - 1L) div 2")
            .cast("long")
            .alias("pairs_if_uncapped"),
        )
        .orderBy(F.desc("doc_freq"), F.asc("shingle"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# q245 — df-cap sensitivity curve (driver-verifies the CAPPED code path)
# --------------------------------------------------------------------------
_CAP_GRID = (4, 8, JACCARD_MAX_SHINGLE_DF)
_CAP_VALUES = ", ".join(f"({c})" for c in _CAP_GRID)


@query(
    "q245_df_cap_sensitivity",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    dfreq AS (SELECT sh, COUNT(*) AS df FROM shingles GROUP BY sh),
    caps(df_cap) AS (VALUES {_CAP_VALUES}),
    shc AS (
      SELECT c.df_cap, s.doc_id, s.sh
      FROM shingles s
      JOIN dfreq d ON d.sh = s.sh
      JOIN caps c ON d.df <= c.df_cap),
    counts AS (
      SELECT df_cap, doc_id, COUNT(*) AS n FROM shc GROUP BY 1, 2),
    common AS (
      SELECT a.df_cap, a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS n_common
      FROM shc a JOIN shc b
        ON a.df_cap = b.df_cap AND a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3),
    pairs AS (
      SELECT c.df_cap, doc_a, doc_b, n_common, ca.n AS na, cb.n AS nb
      FROM common c
      JOIN counts ca ON ca.df_cap = c.df_cap AND ca.doc_id = c.doc_a
      JOIN counts cb ON cb.df_cap = c.df_cap AND cb.doc_id = c.doc_b
      WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.2),
    agg AS (
      SELECT df_cap, COUNT(*) AS n_pairs,
             COUNT(DISTINCT doc_b) AS n_docs_droppable,
             SUM(n_common) AS sum_common,
             SUM(na + nb) AS sum_sizes
      FROM pairs GROUP BY df_cap)
    SELECT CAST(c.df_cap AS BIGINT) AS df_cap,
           CAST(COALESCE(a.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(a.n_docs_droppable, 0) AS BIGINT)
             AS n_docs_droppable,
           CAST(COALESCE(a.sum_common, 0) AS BIGINT) AS sum_common,
           CAST(COALESCE(a.sum_sizes, 0) AS BIGINT) AS sum_sizes
    FROM caps c LEFT JOIN agg a USING (df_cap)
    ORDER BY df_cap
    """,
    tags=("extension", "dedup", "calibration", "df-cap"),
)
def q245_df_cap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evidence-loss curve for the ``max_shingle_df`` cap: near-dup
    pair count and droppable-doc count at Jaccard ≥ 0.2 under each
    candidate cap, including the registered default
    (``JACCARD_MAX_SHINGLE_DF``). The tight caps (4, 8) BIND on the
    test corpus (its max df is 7 at sf0.01), so this query is the
    driver-grade verification of the capped ``jaccard_pairs`` bucket
    semantics — sizes measured after the cap, buckets dropped whole —
    that the production-sized default exercises only vacuously at
    test scale; any divergence between the Spark cap filter and the
    oracle's HAVING df <= cap breaks this hash. Operationally it is
    the companion to q239's lexicon: q239 proposes the cap, this
    query prices it (pairs/docs lost per tightening step).

    Scale: ONE bucket shuffle total — the cap grid is broadcast and
    joined against the bucket frame (|caps| ~ 3 replication), so the
    curve costs |caps|x one jaccard pass rather than |caps| passes;
    all downstream joins key on (df_cap, doc) and stay shuffle-local.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id", "text", 3)
    buckets = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    caps = spark.createDataFrame(
        [(int(c),) for c in _CAP_GRID], "df_cap LONG"
    )
    bc = buckets.join(
        F.broadcast(caps), F.size("ids") <= F.col("df_cap")
    ).persist()
    sizes = (
        bc.select("df_cap", F.explode("ids").alias("doc_id"))
        .groupBy("df_cap", "doc_id")
        .agg(F.count("*").alias("n"))
    )
    ids = F.col("ids")
    pair_array = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids) - i - 1),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    common = (
        bc.filter(F.size("ids") > 1)
        .select("df_cap", F.explode(pair_array).alias("p"))
        .groupBy(
            "df_cap",
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(
        "df_cap", F.col("doc_id").alias("doc_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        "df_cap", F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")
    )
    pairs = (
        common.join(sa, ["df_cap", "doc_a"])
        .join(sb, ["df_cap", "doc_b"])
        .filter(
            F.col("n_common")
            / (F.col("na") + F.col("nb") - F.col("n_common"))
            >= 0.2
        )
    )
    agg = pairs.groupBy("df_cap").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.count_distinct("doc_b").cast("long").alias("n_docs_droppable"),
        # exact integer checksums over the qualifying pairs: these DO
        # shift when a binding cap drops shared shingles, so the hash
        # verifies the capped bucket semantics even when the pair SET
        # is cap-invariant (as on this corpus)
        F.sum("n_common").cast("long").alias("sum_common"),
        F.sum(F.col("na") + F.col("nb")).cast("long").alias("sum_sizes"),
    )
    out = (
        caps.join(agg, "df_cap", "left")
        .select(
            "df_cap",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs_droppable", F.lit(0))
            .cast("long")
            .alias("n_docs_droppable"),
            F.coalesce("sum_common", F.lit(0))
            .cast("long")
            .alias("sum_common"),
            F.coalesce("sum_sizes", F.lit(0)).cast("long").alias("sum_sizes"),
        )
        .orderBy("df_cap")
    )
    # |caps| rows — materialize eagerly so the multi-consumer bucket
    # cache can be released instead of leaking block-manager state for
    # the rest of the session (ADVICE r4).
    out = out.localCheckpoint(eager=True)
    bc.unpersist()
    return out


# --------------------------------------------------------------------------
# q246 — verbatim substring runs (positional evidence beyond set overlap)
# --------------------------------------------------------------------------
_RUN_N = 5  # shingle width in words
_RUN_CAP = 64  # max (doc,pos) entries per shingle bucket
_RUN_MIN_WORDS = 7  # report runs of >= 3 consecutive shingles


@query(
    "q246_substring_runs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents),
    pos AS (
      SELECT doc_id, i AS pos,
             array_to_string(toks[i:i + {_RUN_N - 1}], ' ') AS shingle
      FROM t, unnest(generate_series(1, len(toks) - {_RUN_N - 1})) AS s(i)
      WHERE len(toks) >= {_RUN_N}),
    keep AS (
      SELECT shingle FROM pos
      GROUP BY shingle HAVING COUNT(*) <= {_RUN_CAP}),
    p AS (SELECT pos.* FROM pos JOIN keep USING (shingle)),
    match AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos - b.pos AS diff, a.pos AS pa
      FROM p a JOIN p b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
    islands AS (
      SELECT doc_a, doc_b, diff, pa,
             pa - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, diff ORDER BY pa) AS island
      FROM match),
    runs AS (
      SELECT doc_a, doc_b, diff, island, COUNT(*) AS run_shingles
      FROM islands GROUP BY 1, 2, 3, 4),
    per_pair AS (
      SELECT doc_a, doc_b,
             MAX(run_shingles) + {_RUN_N - 1} AS max_run_words,
             COUNT(*) AS n_runs,
             SUM(run_shingles) AS n_shared_positions
      FROM runs GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b,
           CAST(max_run_words AS BIGINT) AS max_run_words,
           CAST(n_runs AS BIGINT) AS n_runs,
           CAST(n_shared_positions AS BIGINT) AS n_shared_positions
    FROM per_pair
    WHERE max_run_words >= {_RUN_MIN_WORDS}
    ORDER BY max_run_words DESC, doc_a, doc_b
    LIMIT 100
    """,
    tags=("extension", "dedup", "substring", "verbatim"),
)
def q246_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest VERBATIM shared word runs per document pair — the
    positional complement of set-overlap dedup (Lee et al.'s ExactSubstr
    argument: templated boilerplate and quote-chains duplicate long
    contiguous spans while the documents' shingle SETS stay dissimilar,
    so Jaccard never fires). A pair's evidence here is "these two
    documents share a 7+-word contiguous passage", with
    the run length, run count, and total aligned positions.

    Plan: positional 5-gram shingles (posexplode keeps the
    offset the set-based q18 path deliberately drops) group into
    per-shingle (doc,pos) buckets; pairs generate MAP-SIDE from each
    sorted bucket array (the jaccard_pairs shape — one shuffle, no
    self-join) keeping both offsets; a match at alignment
    ``diff = pos_a - pos_b`` then belongs to a contiguous run iff
    consecutive pos_a share the diff, which is gaps-and-islands:
    ``pos_a - row_number()`` per (pair, diff) window — PARTITIONED by
    the pair+alignment key, so the window state is one run's worth per
    task, never a global sort. The 64-entry bucket cap is the
    same stop-shingle quadratic bound the capped Jaccard family uses
    (calibrated by q239, priced by q245); integer-only outputs make the
    oracle hash exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    grams = F.when(
        F.size(t) >= _RUN_N,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (_RUN_N - 1)),
            lambda i: F.array_join(F.slice(t, i, _RUN_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pos = docs.select(
        "doc_id", F.posexplode(grams).alias("pos0", "shingle")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "shingle")
    buckets = (
        pos.groupBy("shingle")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "pos"))
            ).alias("entries")
        )
        .filter(
            (F.size("entries") > 1) & (F.size("entries") <= _RUN_CAP)
        )
    )
    e = F.col("entries")
    pair_array = F.flatten(
        F.transform(
            e,
            lambda x, i: F.transform(
                F.slice(e, i + 2, F.size(e) - i - 1),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    (x["pos"] - y["pos"]).alias("diff"),
                    x["pos"].alias("pa"),
                ),
            ),
        )
    )
    match = (
        buckets.select(F.explode(pair_array).alias("m"))
        .filter(F.col("m.doc_a") != F.col("m.doc_b"))
        .select(
            # bucket arrays sort by (doc_id, pos), so cross-doc array
            # pairs already satisfy doc_a < doc_b after the != filter;
            # recompute diff/pa from the canonical orientation anyway
            # so the invariant is explicit, not positional
            F.least("m.doc_a", "m.doc_b").alias("doc_a"),
            F.greatest("m.doc_a", "m.doc_b").alias("doc_b"),
            F.when(
                F.col("m.doc_a") < F.col("m.doc_b"), F.col("m.diff")
            ).otherwise(-F.col("m.diff")).alias("diff"),
            F.when(
                F.col("m.doc_a") < F.col("m.doc_b"), F.col("m.pa")
            ).otherwise(F.col("m.pa") - F.col("m.diff")).alias("pa"),
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "diff").orderBy("pa")
    islands = match.withColumn(
        "island", F.col("pa") - F.row_number().over(w)
    )
    runs = islands.groupBy("doc_a", "doc_b", "diff", "island").agg(
        F.count("*").alias("run_shingles")
    )
    per_pair = runs.groupBy("doc_a", "doc_b").agg(
        (F.max("run_shingles") + F.lit(_RUN_N - 1))
        .cast("long")
        .alias("max_run_words"),
        F.count("*").cast("long").alias("n_runs"),
        F.sum("run_shingles").cast("long").alias("n_shared_positions"),
    )
    return (
        per_pair.filter(F.col("max_run_words") >= _RUN_MIN_WORDS)
        .orderBy(F.desc("max_run_words"), "doc_a", "doc_b")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q248 — LSH banding S-curve sweep (bands x rows calibration)
# --------------------------------------------------------------------------
_SWEEP_TAU = 0.2
# Fixed-SIZE deterministic calibration sample (VERDICT r6 #3): the
# sweep's exact-Jaccard ground truth is the quadratic cost the banding
# exists to avoid, so the WHOLE sweep (banding candidates + truth) runs
# on md5-bucket % max(1, n // TARGET) == 0 — ~TARGET docs at any corpus
# size, reproducible across engines/runs/layouts (q39/q121 discipline).
# At sf<=0.01 (500 docs) the modulus is 1: sample == corpus, answers
# unchanged. The S-curve being calibrated is a property of (bands,
# rows), not corpus size, so the sampled measurements estimate the
# full-corpus ones — the contract q121 already states.
_SWEEP_SAMPLE_TARGET = 512
_SWEEP_SAMPLE_CTES = fixed_sample_ctes(
    "documents", "doc_id", _SWEEP_SAMPLE_TARGET, "docs_s"
)


def _sweep_sample(docs):
    """Spark side of the q248 calibration sample — the shared
    :func:`fixed_sample` md5-bucket rule (VERDICT r7 #6: one
    implementation of the modulus arithmetic everywhere)."""
    return fixed_sample(docs, "doc_id", _SWEEP_SAMPLE_TARGET)
# (bands, rows) with bands*rows == NUM_HASHES, plus the analytic
# candidate probability at jaccard == tau: 1 - (1 - tau^r)^b, rendered
# as a round4-quantized literal so BOTH engines carry the identical
# constant (no cross-engine pow in the compared values).
_SWEEP_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8))
_SWEEP_ANALYTIC = {
    (b, r): __import__("math").floor(
        (1 - (1 - _SWEEP_TAU**r) ** b) * 10000 + 0.5
    )
    / 10000
    for b, r in _SWEEP_CONFIGS
}
_SWEEP_CFG_VALUES = ", ".join(f"({b}, {r})" for b, r in _SWEEP_CONFIGS)
_SWEEP_AN_VALUES = ", ".join(
    f"({b}, {r}, {_SWEEP_ANALYTIC[(b, r)]})" for b, r in _SWEEP_CONFIGS
)


@query(
    "q248_lsh_scurve_sweep",
    oracle=f"""
    WITH {_SWEEP_SAMPLE_CTES},
    {_MINHASH_LONG_CTES.replace("FROM documents", "FROM docs_s")},
    cfg(n_bands, band_rows) AS (VALUES {_SWEEP_CFG_VALUES}),
    an(n_bands, band_rows, p) AS (VALUES {_SWEEP_AN_VALUES}),
    bands AS (
      SELECT s.doc_id, c.n_bands, c.band_rows,
             s.h_idx // c.band_rows AS band,
             STRING_AGG(CAST(s.min_hash AS VARCHAR), '-'
                        ORDER BY s.h_idx) AS sig
      FROM sigs s CROSS JOIN cfg c
      GROUP BY 1, 2, 3, 4),
    cand AS (
      SELECT DISTINCT a.n_bands, a.band_rows,
             a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.n_bands = b.n_bands AND a.band_rows = b.band_rows
       AND a.band = b.band AND a.sig = b.sig
       AND a.doc_id < b.doc_id),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles a JOIN shingles b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    tj AS (
      SELECT doc_a, doc_b,
             n_common * 1.0 / (ca.n + cb.n - n_common) AS j
      FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b),
    gt AS (SELECT COUNT(*) AS g FROM tj WHERE j >= {_SWEEP_TAU}),
    agg AS (
      SELECT n_bands, band_rows,
             COUNT(*) AS n_candidates,
             SUM(CASE WHEN j >= {_SWEEP_TAU} THEN 1 ELSE 0 END)
               AS n_true_pos
      FROM cand LEFT JOIN tj USING (doc_a, doc_b)
      GROUP BY 1, 2)
    SELECT CAST(c.n_bands AS BIGINT) AS n_bands,
           CAST(c.band_rows AS BIGINT) AS band_rows,
           CAST(COALESCE(a.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(a.n_true_pos, 0) AS BIGINT) AS n_true_pos,
           {r4(f'COALESCE(a.n_true_pos, 0) * 1.0 / NULLIF(gt.g, 0)')}
             AS recall_at_tau,
           CASE WHEN COALESCE(a.n_candidates, 0) > 0
                THEN {r4('a.n_true_pos * 1.0 / a.n_candidates')}
           END AS precision_at_tau,
           an.p AS analytic_p_at_tau
    FROM cfg c
    LEFT JOIN agg a USING (n_bands, band_rows)
    JOIN an USING (n_bands, band_rows)
    CROSS JOIN gt
    ORDER BY n_bands DESC
    """,
    tags=("extension", "dedup", "lsh", "calibration"),
)
def q248_lsh_scurve_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding S-curve sweep: candidate count, recall, and precision at
    jaccard >= 0.2 for every (bands x rows) split of the 16-hash
    MinHash family, next to the analytic candidate probability
    1-(1-tau^r)^b. This is THE calibration that picks b x r before a
    100 TB dedup run (q121 audits the one registered config against its
    candidates; this prices the alternatives): more rows per band walks
    down the S-curve — fewer false candidates, lower recall — and the
    measured columns show where the corpus actually sits vs theory.

    Shape: signatures are computed ONCE (one shuffle, 16 parallel mins
    — minhash_signatures_wide); each config's band signatures are
    map-side column concats over that same frame, unioned with the
    config tag, so the sweep costs |configs| x one bucket shuffle over
    narrow (config, band, sig) rows — never |configs| corpus scans.
    Ground-truth jaccard is the same bucket path q18 runs (threshold 0
    keeps every overlapping pair; at calibration scale the uncapped df
    distribution is q239-small). The REGISTERED plan runs the whole
    sweep on the fixed-size deterministic sample (_SWEEP_SAMPLE_CTES —
    VERDICT r6 #3: previously the docstring prescribed the sample but
    the plan was unsampled and the truth leg probed quadratic at 10x).
    The analytic column is a PRE-QUANTIZED literal, identical on both
    engines.
    """
    docs = _sweep_sample(load_table(spark, sf_dir, "documents"))
    wide = minhash_signatures_wide(docs)
    per_cfg = []
    for b, r in _SWEEP_CONFIGS:
        band_cols = [
            F.concat_ws(
                "-",
                *[
                    F.col(f"h{band * r + j}").cast("string")
                    for j in range(r)
                ],
            ).alias(f"band{band}")
            for band in range(b)
        ]
        stack = "stack({n}, {args}) AS (band, sig)".format(
            n=b,
            args=", ".join(
                f"CAST({band} AS BIGINT), band{band}" for band in range(b)
            ),
        )
        long = wide.select("doc_id", *band_cols).select(
            "doc_id", F.expr(stack)
        )
        ids = F.col("ids")
        pair_array = F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.slice(ids, i + 2, F.size(ids) - i - 1),
                    lambda y: F.struct(
                        x.alias("doc_a"), y.alias("doc_b")
                    ),
                ),
            )
        )
        cand = (
            long.groupBy("band", "sig")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") > 1)
            .select(F.explode(pair_array).alias("p"))
            .select(
                F.col("p.doc_a").alias("doc_a"),
                F.col("p.doc_b").alias("doc_b"),
            )
            .distinct()
            .select(
                F.lit(b).cast("long").alias("n_bands"),
                F.lit(r).cast("long").alias("band_rows"),
                "doc_a",
                "doc_b",
            )
        )
        per_cfg.append(cand)
    cands = per_cfg[0]
    for frame in per_cfg[1:]:
        cands = cands.unionByName(frame)
    tj = jaccard_pairs(docs, threshold=0.0, max_shingle_df=None).select(
        "doc_a", "doc_b", "jaccard"
    )
    gt = tj.filter(F.col("jaccard") >= _SWEEP_TAU).agg(
        F.count("*").alias("g")
    )
    # Both sides are candidate-PAIR frames — unbounded in corpus size —
    # so neither may ever be broadcast: at the 10x replica the
    # optimizer's estimate promoted one side to broadcast and OOMed the
    # 8g driver (caught by the r6 noop-write probe; the r5 count()
    # probe had silently pruned this entire join away). SHUFFLE_MERGE
    # pins the scalable strategy.
    agg = (
        cands.join(tj.hint("SHUFFLE_MERGE"), ["doc_a", "doc_b"], "left")
        .groupBy("n_bands", "band_rows")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.sum(
                (F.col("jaccard") >= _SWEEP_TAU).cast("long")
            ).alias("n_true_pos"),
        )
    )
    cfg = spark.createDataFrame(
        [(int(b), int(r), float(_SWEEP_ANALYTIC[(b, r)])) for b, r in _SWEEP_CONFIGS],
        "n_bands LONG, band_rows LONG, analytic_p_at_tau DOUBLE",
    )
    out = (
        cfg.join(agg, ["n_bands", "band_rows"], "left")
        .crossJoin(F.broadcast(gt))
        .select(
            "n_bands",
            "band_rows",
            F.coalesce("n_candidates", F.lit(0))
            .cast("long")
            .alias("n_candidates"),
            F.coalesce("n_true_pos", F.lit(0))
            .cast("long")
            .alias("n_true_pos"),
            round4(
                F.coalesce("n_true_pos", F.lit(0))
                / F.nullif(F.col("g"), F.lit(0))
            ).alias("recall_at_tau"),
            F.when(
                F.coalesce("n_candidates", F.lit(0)) > 0,
                round4(F.col("n_true_pos") / F.col("n_candidates")),
            ).alias("precision_at_tau"),
            "analytic_p_at_tau",
        )
        .orderBy(F.desc("n_bands"))
    )
    return out


# --------------------------------------------------------------------------
# q265 — MinHash Jaccard-ESTIMATE accuracy audit (per candidate pair)
# --------------------------------------------------------------------------
@query(
    "q265_minhash_estimate_audit",
    oracle=f"""
    WITH {_MINHASH_LONG_CTES},
    bands AS (
      SELECT doc_id, h_idx // {LSH_BAND_ROWS} AS band,
             string_agg(CAST(min_hash AS VARCHAR), ',' ORDER BY h_idx) AS band_sig
      FROM sigs GROUP BY doc_id, band),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_sig = y.band_sig
           AND x.doc_id < y.doc_id),
    match AS (
      SELECT c.doc_a, c.doc_b,
             SUM(CASE WHEN sa.min_hash = sb.min_hash THEN 1 ELSE 0 END)
               AS n_match
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.doc_a
      JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.h_idx = sa.h_idx
      GROUP BY 1, 2),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN shingles a ON a.doc_id = c.doc_a
      JOIN shingles b ON b.doc_id = c.doc_b AND b.sh = a.sh
      GROUP BY 1, 2)
    SELECT m.doc_a, m.doc_b,
           {r4(f'm.n_match * 1.0 / {NUM_HASHES}')} AS est_jaccard,
           {r4('COALESCE(co.n_common, 0) * 1.0 '
               '/ (ca.n + cb.n - COALESCE(co.n_common, 0))')} AS exact_jaccard,
           {r4(f'abs(m.n_match * 1.0 / {NUM_HASHES} '
               '- COALESCE(co.n_common, 0) * 1.0 '
               '/ (ca.n + cb.n - COALESCE(co.n_common, 0)))')} AS abs_err
    FROM match m
    LEFT JOIN common co ON co.doc_a = m.doc_a AND co.doc_b = m.doc_b
    JOIN counts ca ON ca.doc_id = m.doc_a
    JOIN counts cb ON cb.doc_id = m.doc_b
    ORDER BY m.doc_a, m.doc_b
    """,
    tags=("extension", "dedup", "minhash", "audit"),
)
def q265_minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-pair MinHash ESTIMATOR accuracy: the fraction of
    the 16 signature rows that agree (the unbiased Jaccard estimator,
    E[matches/k] = J) next to the exact uncapped shingle Jaccard and
    their absolute error. q121 audits the LSH *candidate* quality
    (recall/precision of the banding); this audits the *estimator* the
    pipeline thresholds on when it skips the exact verification pass —
    the error column is the empirical spread you must back off the
    dedup threshold by (sd = sqrt(J(1-J)/16) ≈ 0.12 at J=0.5, and the
    measured errors sit inside it).

    Shape/scale: candidates come from the banded-LSH path (sub-
    quadratic); the estimator join is candidates x 16 signature rows;
    the exact-Jaccard check joins each candidate pair's DISTINCT
    shingle rows (bounded per doc) — all equi-joins keyed on doc ids
    or (band, sig), never a cross join. Estimates use the uncapped
    shingle sets because that is what MinHash sketches approximate
    (the df-capped family is a different, deliberately-shifted
    measure — see q245).
    """
    docs = load_table(spark, sf_dir, "documents")
    wide = minhash_signatures_wide(docs)
    cand = lsh_candidate_pairs_wide(wide)
    wa = wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    wb = wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    n_match = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        for i in range(NUM_HASHES)
    )
    est = (
        cand.join(wa.hint("SHUFFLE_HASH"), "doc_a")
        .join(wb.hint("SHUFFLE_HASH"), "doc_b")
        .select("doc_a", "doc_b", n_match.alias("n_match"))
    )
    sets = doc_shingles(docs).groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("arr"),
        F.count("*").alias("n"),
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("arr").alias("arr_a"),
        F.col("n").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("arr").alias("arr_b"),
        F.col("n").alias("nb"),
    )
    exact = (
        est.join(sa.hint("SHUFFLE_HASH"), "doc_a")
        .join(sb.hint("SHUFFLE_HASH"), "doc_b")
        .withColumn(
            "n_common",
            F.size(F.array_intersect("arr_a", "arr_b")).cast("long"),
        )
    )
    est_j = F.col("n_match") / F.lit(float(NUM_HASHES))
    exact_j = F.col("n_common") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return exact.select(
        "doc_a",
        "doc_b",
        round4(est_j).alias("est_jaccard"),
        round4(exact_j).alias("exact_jaccard"),
        round4(F.abs(est_j - exact_j)).alias("abs_err"),
    )


# --------------------------------------------------------------------------
# q268 — corpus-granularity exact-substring dedup (repeated passages)
# --------------------------------------------------------------------------
_PASS_W = 40  # window width: any exact repeat >= 40 chars is detected

# Shared by q268 (per-doc span report) and q277 (per-source scrub
# savings): duplicated-window detection + maximal-span merge.
_PASS_SPAN_CTES = f"""pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, len(text) - {_PASS_W - 1})) AS p
      FROM documents WHERE len(text) >= {_PASS_W}),
    wins AS (
      SELECT doc_id, p, substr(text, p, {_PASS_W}) AS win,
             CAST(('0x' || substr(md5(substr(text, p, {_PASS_W})), 1, 15))
                  AS BIGINT) AS wd
      FROM pos),
    sharedd AS (
      SELECT wd FROM wins GROUP BY wd
      HAVING MIN(doc_id) <> MAX(doc_id)),
    hits0 AS (
      SELECT w.doc_id, w.p, w.win FROM wins w JOIN sharedd s USING (wd)),
    shared AS (
      SELECT win FROM hits0 GROUP BY win
      HAVING MIN(doc_id) <> MAX(doc_id)),
    hits AS (
      SELECT h.doc_id, h.p FROM hits0 h JOIN shared s USING (win)),
    brks AS (
      SELECT doc_id, p,
             CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
                       > {_PASS_W} THEN 1 ELSE 0 END AS brk
      FROM hits),
    grps AS (
      SELECT doc_id, p,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY p) AS g
      FROM brks),
    spans AS (
      SELECT doc_id, g, MIN(p) AS s, MAX(p) + {_PASS_W - 1} AS e,
             COUNT(*) AS nw
      FROM grps GROUP BY doc_id, g)"""


@query(
    "q268_repeated_passages",
    oracle=f"""
    WITH {_PASS_SPAN_CTES}
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(nw) AS BIGINT) AS n_dup_windows,
           CAST(SUM(e - s + 1) AS BIGINT) AS covered_chars,
           CAST(MAX(e - s + 1) AS BIGINT) AS max_span_len
    FROM spans GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("extension", "dedup", "substring", "corpus"),
)
def q268_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-granularity EXACT-substring dedup (VERDICT r6 #7): for
    every document, the maximal spans of text that also appear
    verbatim somewhere else in the corpus — the Spark-shaped
    equivalent of the suffix-array ExactSubstr pass training-data
    pipelines run to scrub repeated passages (boilerplate, licence
    blocks, syndicated copy), complementing q246's per-PAIR positional
    runs with a corpus-wide single answer per document.

    Semantics: every width-40 character window (stride 1) whose exact
    text occurs in >= 2 DISTINCT documents is a duplicated-window
    start; per document, starts merge into maximal spans while the gap
    to the previous start is <= 40 (beyond that the covered char
    ranges are provably disjoint, so covered_chars is an exact
    duplicated-region size, never double-counted). Any repeat of
    length >= 40 is detected regardless of alignment — the stride-1
    grid is what a suffix automaton buys, paid linearly instead.

    Scale shape: windows are ~n_chars rows per document (linear in
    corpus BYTES, the honest ExactSubstr cost — not quadratic in
    docs); the shared-window test is ONE groupBy over an 8-byte
    BIGINT md5-prefix digest of the window with map-side partial
    aggregation (MIN/MAX doc_id — repeated windows collapse early),
    then a semi join back. The round-8 digest (VERDICT r7 #3) cuts
    the dominant exchange from ~56 to ~24 bytes per window row; the
    answer stays provably collision-free because the raw 40-char
    window is recomputed for the small HIT subset and regrouped
    exactly (a collision can only add candidates, which the exact
    regroup removes; equal windows always share a digest, so nothing
    is missed). Both engines run the same two-stage test. The island
    merge is a lag/sum window PARTITIONED by doc_id (audit-clean).
    """
    spans = _dup_spans(load_table(spark, sf_dir, "documents"))
    span_len = F.col("e") - F.col("s") + 1
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum("nw").cast("long").alias("n_dup_windows"),
            F.sum(span_len).cast("long").alias("covered_chars"),
            F.max(span_len).cast("long").alias("max_span_len"),
        )
        .orderBy("doc_id")
    )


def _dup_spans(docs: DataFrame) -> DataFrame:
    """q268's duplicated-span frame (doc_id, g, s, e, nw) — shared with
    q277's per-source savings rollup. Mirrors _PASS_SPAN_CTES."""
    docs = docs.select("doc_id", "text").filter(
        F.length("text") >= _PASS_W
    )
    # The heavy exchange carries an 8-byte BIGINT digest of each
    # window, not the raw 40-char key (VERDICT r7 #3 — the raw-key
    # exchange moved ~50x corpus bytes); the raw window is recomputed
    # for the small HIT subset only, and an exact regroup on it makes
    # the answer provably collision-free (a digest collision can only
    # ADD candidate rows, which the raw-key regroup then removes —
    # equal windows always share a digest, so nothing is missed).
    #
    # Round 12 (guide §2.4): the shared-window test is min/max OVER A
    # WINDOW partitioned by the digest instead of groupBy + semi-join
    # back. The old shape evaluated the corpus-wide explode+md5
    # subtree TWICE PER STAGE (once under the aggregate, once as the
    # semi-join probe side — 4 Generate passes in the physical plan);
    # the window form computes the flag on the SAME shuffled rows the
    # semi-join would have moved anyway (the probe side was already
    # exchanged by wd for the sort-merge join, so bytes-over-network
    # are unchanged) and the plan keeps ONE Generate. Skew is
    # identical by construction: a hot window key concentrated its
    # rows in one merge-join partition before and concentrates them
    # in one WindowExec partition now.
    win_expr = F.expr(f"substring(text, p, {_PASS_W})")
    wins = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (_PASS_W - 1))
        ).alias("p"),
    ).select(
        "doc_id",
        "p",
        F.conv(F.substring(F.md5(win_expr), 1, 15), 16, 10)
        .cast("long")
        .alias("wd"),
    )
    wd_w = Window.partitionBy("wd")
    hits0 = (
        wins.withColumn(
            "shr", F.min("doc_id").over(wd_w) != F.max("doc_id").over(wd_w)
        )
        .filter("shr")
        .select("doc_id", "p")
    )
    hit_wins = hits0.join(docs.hint("SHUFFLE_MERGE"), "doc_id").select(
        "doc_id", "p", win_expr.alias("win")
    )
    raw_w = Window.partitionBy("win")
    hits = (
        hit_wins.withColumn(
            "shr", F.min("doc_id").over(raw_w) != F.max("doc_id").over(raw_w)
        )
        .filter("shr")
        .select("doc_id", "p")
    )
    wlag = Window.partitionBy("doc_id").orderBy("p")
    brk = F.when(
        F.col("p") - F.lag("p").over(wlag) > _PASS_W, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        hits.withColumn("brk", brk)
        .withColumn("g", F.sum("brk").over(wlag))
        .groupBy("doc_id", "g")
        .agg(
            F.min("p").alias("s"),
            (F.max("p") + F.lit(_PASS_W - 1)).alias("e"),
            F.count("*").alias("nw"),
        )
    )


# --------------------------------------------------------------------------
# q270 — cross-source duplicate-flow matrix (provenance of near-dups)
# --------------------------------------------------------------------------
_XSRC_TAU = "0.5"  # confirmed-duplicate threshold (q121's truth bar)


@query(
    "q270_cross_source_dup_matrix",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    dup AS (
      SELECT doc_a, doc_b FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= {_XSRC_TAU}),
    src AS (SELECT doc_id, source FROM documents),
    edges AS (
      SELECT LEAST(sa.source, sb.source) AS source_lo,
             GREATEST(sa.source, sb.source) AS source_hi,
             d.doc_a, d.doc_b
      FROM dup d
      JOIN src sa ON sa.doc_id = d.doc_a
      JOIN src sb ON sb.doc_id = d.doc_b),
    pairs AS (
      SELECT source_lo, source_hi, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
      FROM edges GROUP BY source_lo, source_hi),
    members AS (
      SELECT source_lo, source_hi,
             CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs_involved
      FROM (SELECT source_lo, source_hi, doc_a AS d FROM edges
            UNION ALL
            SELECT source_lo, source_hi, doc_b AS d FROM edges)
      GROUP BY source_lo, source_hi)
    SELECT source_lo, source_hi, n_dup_pairs, n_docs_involved
    FROM pairs JOIN members USING (source_lo, source_hi)
    ORDER BY source_lo, source_hi
    """,
    tags=("extension", "dedup", "provenance", "matrix"),
)
def q270_cross_source_dup_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicate-flow provenance matrix: confirmed near-duplicate
    pairs (word-3-gram Jaccard >= 0.5, the df-capped q18 machinery)
    rolled up by unordered SOURCE pair — which sources copy from
    which. The diagonal (source_lo = source_hi) is within-source
    duplication (crawler revisits, templated pages); off-diagonal
    cells are syndication/mirror flow between feeds. This is the
    report that decides WHERE dedup effort goes at 100 TB — a source
    pair with heavy flow gets joint-deduped; an isolated source can
    be deduped shard-locally — and it complements q250 (per-source
    chunk-digest rates, no pairing), q178 (distributional transfer,
    no dedup), and q202 (per-pair evidence, no rollup).

    n_docs_involved is the DISTINCT document count touching the cell
    (both pair sides unpivoted before the distinct, so a doc recurring
    as doc_a in one pair and doc_b in another counts once).

    Scale shape: pair generation is exactly q18's shingle-bucket join
    (df-capped, never all-pairs); sources attach via two hash joins on
    doc_id BELOW the rollup, so only (source_lo, source_hi, ids) rows
    shuffle into a |sources|^2-bounded aggregate. The pair frame is
    never a broadcast build side (q248 discipline) — the source dim
    joins build on the small documents projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    dup = jaccard_pairs(
        docs,
        max_shingle_df=JACCARD_MAX_SHINGLE_DF,
        threshold=float(_XSRC_TAU),
    ).select("doc_a", "doc_b")
    src = docs.select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
    )
    sb = src.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")
    )
    edges = (
        dup.join(sa.hint("SHUFFLE_HASH"), "doc_a")
        .join(sb.hint("SHUFFLE_HASH"), "doc_b")
        .select(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
            "doc_a",
            "doc_b",
        )
    )
    edges = edges.persist()
    pairs = edges.groupBy("source_lo", "source_hi").agg(
        F.count("*").cast("long").alias("n_dup_pairs")
    )
    members = (
        edges.select(
            "source_lo",
            "source_hi",
            F.explode(F.array("doc_a", "doc_b")).alias("d"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count_distinct("d").cast("long").alias("n_docs_involved"))
    )
    out = (
        pairs.join(members, ["source_lo", "source_hi"])
        .orderBy("source_lo", "source_hi")
        .localCheckpoint(eager=True)
    )
    edges.unpersist()
    return out


# --------------------------------------------------------------------------
# q273 — IDF-weighted Jaccard near-dup scoring (weighting vs capping)
# --------------------------------------------------------------------------
_WJ_TAU = 0.3  # weighted-similarity acceptance threshold
# Candidate floor on the capped UNWEIGHTED jaccard (exact integer
# ratio, portable): pair generation at threshold 0 kept every
# co-bucketed pair, and the per-pair shingle joins below turned that
# into pairs x shingles row volume — the 10x replica's copy explosion
# OOMed the probe. 0.05 is far below any accept threshold and cheap
# (the ratio is already computed by the bucket machinery).
_WJ_CAND_FLOOR = 0.05

# The scored candidate-pair frame (doc_a, doc_b, jaccard_capped,
# w_jaccard), shared by q273 (threshold + emit) and q276 (tau sweep) —
# the _BM25_SCORED_CTES sharing pattern.
_WJ_SCORED_CTES = f"""{_SHINGLES_CTE},
    {_CAPPED_CTES},
    nn AS (SELECT COUNT(*) AS n FROM documents),
    dfs AS (SELECT sh, COUNT(*) AS df_s FROM shingles GROUP BY sh),
    shw AS (
      SELECT s.doc_id, s.sh,
             {r4('ln((nn.n + 1.0) / (dfs.df_s + 1.0))')} AS idf
      FROM shingles s JOIN dfs USING (sh) CROSS JOIN nn),
    wdoc AS (
      SELECT doc_id, SUM(CAST(idf AS DECIMAL(20,4))) AS w
      FROM shw GROUP BY doc_id),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    cand AS (
      SELECT c.doc_a, c.doc_b, c.n_common, ca.n AS na, cb.n AS nb
      FROM common c
      JOIN counts ca ON ca.doc_id = c.doc_a
      JOIN counts cb ON cb.doc_id = c.doc_b
      WHERE c.n_common * 1.0 / (ca.n + cb.n - c.n_common)
            >= {_WJ_CAND_FLOOR}),
    wab AS (
      SELECT c.doc_a, c.doc_b,
             SUM(CAST(sa.idf AS DECIMAL(20,4))) AS w_ab
      FROM cand c
      JOIN shw sa ON sa.doc_id = c.doc_a
      JOIN shw sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
      GROUP BY 1, 2),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             {r4('c.n_common * 1.0 / (c.na + c.nb - c.n_common)')}
               AS jaccard_capped,
             {r4('CAST(w.w_ab AS DOUBLE) / CAST(wa.w + wb.w - w.w_ab AS DOUBLE)')}
               AS w_jaccard
      FROM cand c
      JOIN wab w ON w.doc_a = c.doc_a AND w.doc_b = c.doc_b
      JOIN wdoc wa ON wa.doc_id = c.doc_a
      JOIN wdoc wb ON wb.doc_id = c.doc_b)"""


@query(
    "q273_idf_weighted_jaccard",
    oracle=f"""
    WITH {_WJ_SCORED_CTES}
    SELECT doc_a, doc_b, jaccard_capped, w_jaccard
    FROM scored WHERE w_jaccard >= {_WJ_TAU}
    ORDER BY doc_a, doc_b
    """,
    tags=("extension", "dedup", "similarity-join", "weighted"),
)
def q273_idf_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-WEIGHTED Jaccard near-dup pairs — the weighting alternative
    to df-capping for boilerplate: every shingle carries
    idf = ln((N+1)/(df+1)), a pair's similarity is
    sum(idf over shared) / sum(idf over union), and two documents that
    agree only on ubiquitous boilerplate score near 0 WITHOUT any
    shingle being discarded (the cap family's failure mode when the
    cap is tuned wrong — q245 prices that sensitivity; this removes
    it from scoring entirely). Candidate GENERATION still uses the
    capped buckets plus a 0.05 unweighted floor (a pair must share
    >= 1 sub-cap shingle and a twentieth of its capped union — the
    load-bearing quadratic mitigations), but the SCORE integrates the
    full uncapped shingle sets: cap for candidates, weights for
    truth. Reported next to the capped unweighted jaccard so the two
    metrics' disagreement is visible per pair.

    Determinism: idf is round4-quantized at birth (ln differs by ~1
    ulp across engines; quantize-then-sum is the q178 discipline),
    per-doc and per-pair weights are exact DECIMAL(20,4) sums
    (order-free), the ratio divides identical doubles on both
    engines, and the threshold compares the quantized ratio.

    Scale shape: one shingle groupBy for df + idf (reused by both
    weight sums), pair generation is q18's bucket machinery, and the
    shared-weight sum joins the (doc, shingle, idf) frame through the
    bounded candidate-pair set — rows = pairs x shingles-per-doc,
    never the raw shingle self-join.
    """
    return (
        _wj_scored(spark, sf_dir)
        .filter(F.col("w_jaccard") >= _WJ_TAU)
        .orderBy("doc_a", "doc_b")
    )


def _wj_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q273's scored candidate-pair frame (doc_a, doc_b,
    jaccard_capped, w_jaccard), UNthresholded — shared with q276's tau
    sweep. Mirrors _WJ_SCORED_CTES."""
    docs = load_table(spark, sf_dir, "documents")
    # cand is consumed once (the capped score rides through the wab
    # aggregate below). Round 12 measured a persist of cand/wdoc as a
    # REGRESSION (q273 6.78->8.38 s, q276 6.96->8.80 s at sf0.1 — the
    # subtrees re-read already-persisted bucket/shw frames, so a
    # materialization barrier costs more than recompute, guide §5);
    # round 13 removed the second consumption instead (§2.4).
    cand = jaccard_pairs(
        docs,
        threshold=_WJ_CAND_FLOOR,
        max_shingle_df=JACCARD_MAX_SHINGLE_DF,
    ).select("doc_a", "doc_b", round4(F.col("jaccard")).alias("jaccard_capped"))
    sh = doc_shingles(docs)
    nn = docs.agg(F.count("*").alias("n"))
    dfs = sh.groupBy("shingle").agg(F.count("*").alias("df_s"))
    shw = (
        sh.join(dfs.hint("SHUFFLE_MERGE"), "shingle")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "shingle",
            round4(
                F.log((F.col("n") + F.lit(1.0)) / (F.col("df_s") + F.lit(1.0)))
            ).alias("idf"),
        )
        .persist()
    )
    dec = F.col("idf").cast("decimal(20,4)")
    wdoc = shw.groupBy("doc_id").agg(F.sum(dec).alias("w"))
    # cand is consumed ONCE (round 13, VERDICT r12 #3): jaccard_capped
    # rides through the shared-weight join and comes back out of the
    # pair aggregate (min of a per-pair constant — exact), so the
    # whole candidate subtree is no longer inlined a second time for
    # the final scored join. Every cand pair shares >= 1 sub-cap
    # shingle, and capped shingles are a subset of shw's uncapped
    # rows, so the inner pair x shingle join retains exactly the cand
    # pair set — identical rows to the old cand-join-back form.
    pa = cand.join(
        shw.select(
            F.col("doc_id").alias("doc_a"), "shingle", "idf"
        ).hint("SHUFFLE_MERGE"),
        "doc_a",
    )
    wab = (
        pa.join(
            shw.select(
                F.col("doc_id").alias("doc_b2"),
                F.col("shingle").alias("shingle_b"),
            ).hint("SHUFFLE_MERGE"),
            (F.col("shingle_b") == F.col("shingle"))
            & (F.col("doc_b") == F.col("doc_b2")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(dec).alias("w_ab"),
            F.min("jaccard_capped").alias("jaccard_capped"),
        )
    )
    wa = wdoc.select(F.col("doc_id").alias("doc_a"), F.col("w").alias("w_a"))
    wb = wdoc.select(F.col("doc_id").alias("doc_b"), F.col("w").alias("w_b"))
    # cand and wab are both candidate-PAIR frames — unbounded in corpus
    # size, so neither may ever become a broadcast build side (the
    # q248/q256b discipline; unpinned, the optimizer broadcast one at
    # the 10x replica and the build-side collect blew the driver's
    # 1 GiB maxResultSize). The doc-keyed weight dims get SHUFFLE_HASH
    # for the same reason q256b's vector dims do.
    # shw stays persisted (three consumers; jaccard_pairs leaves its
    # bucket frame persisted the same way) — and no localCheckpoint:
    # the scored-pair output is corpus-sized, and checkpointing it
    # eagerly ships every partition through the driver (hit the
    # 1 GiB maxResultSize at the 10x replica's copy-pair explosion).
    return (
        wab.join(wa.hint("SHUFFLE_HASH"), "doc_a")
        .join(wb.hint("SHUFFLE_HASH"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard_capped",
            round4(
                F.col("w_ab").cast("double")
                / (F.col("w_a") + F.col("w_b") - F.col("w_ab")).cast("double")
            ).alias("w_jaccard"),
        )
    )


# --------------------------------------------------------------------------
# q274 — SimHash candidate quality audit (precision/recall vs exact truth)
# --------------------------------------------------------------------------
@query(
    "q274_simhash_quality_audit",
    oracle=f"""
    WITH {_SIMHASH_CTES},
    {_SIMHASH_BAND_CTES},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash))
              <= {_SIMHASH_MAX_HAMMING}),
    sh0 AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    shingles2 AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                 THEN unnest(list_transform(generate_series(1, len(t) - 2),
                                            i -> array_to_string(t[i:i+2], ' ')))
                 ELSE array_to_string(t, ' ')
               END AS sh
        FROM sh0)),
    sk AS (SELECT sh FROM shingles2 GROUP BY sh
           HAVING COUNT(*) <= {JACCARD_MAX_SHINGLE_DF}),
    shc AS (SELECT s.doc_id, s.sh FROM shingles2 s JOIN sk USING (sh)),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    truth AS (
      SELECT doc_a, doc_b FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= {_AUDIT_J}),
    hits AS (SELECT * FROM cand INTERSECT SELECT * FROM truth)
    SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM truth) AS n_true_pairs,
           (SELECT COUNT(*) FROM hits) AS n_hits,
           CASE WHEN (SELECT COUNT(*) FROM cand) > 0
                THEN {r4('CAST((SELECT COUNT(*) FROM hits) AS DOUBLE) / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE)')}
           END AS precision,
           CASE WHEN (SELECT COUNT(*) FROM truth) > 0
                THEN {r4('CAST((SELECT COUNT(*) FROM hits) AS DOUBLE) / CAST((SELECT COUNT(*) FROM truth) AS DOUBLE)')}
           END AS recall
    """,
    tags=("extension", "dedup", "simhash", "audit"),
)
def q274_simhash_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash candidate quality vs exact ground truth — q121's
    precision/recall audit applied to the OTHER fingerprint family:
    q79's banded, Hamming<=5 SimHash pairs scored against exact
    df-capped word-3-gram Jaccard >= 0.5. With this row every
    approximate-similarity path in the engine carries a measured
    audit (MinHash banding q121/q248/q265, hyperplane LSH q132,
    banded margin q256b's gate, IVF q264, PQ q272 — and now SimHash),
    so choosing between fingerprint families at 100 TB is a
    table-lookup, not folklore: SimHash is 1 BIGINT per doc vs 16 for
    the MinHash signature, and this report prices what that 16x
    memory cut costs in recall on the actual corpus.

    Shape: candidates are q79's machinery verbatim (banded equi-join
    + XOR popcount); truth is q18's bucket path at the audit
    threshold (df-capped, never all-pairs); the report is three
    counts and two quantized ratios on one row.

    Round-9 migration (VERDICT r8 #1): the audited candidate generator
    is now the size-adaptive block-combination band ladder (q79's
    docstring; operators/dedup.py module comment) instead of the fixed
    4 x 15-bit layout whose 2^15-value space grew a ~n^2/2^15 random-
    collision floor (~15M candidates at 500k docs in the r8 100x
    probe). At every driver SF the active rung (m=1) catches EVERY
    Hamming<=5 pair by pigeonhole, so this audit now prices the
    fingerprint family itself — what 60-bit SimHash at the exact <=5
    bar costs in recall vs df-capped Jaccard>=0.5 truth — rather than
    banding loss on top of it; at rung 2/3 scale the banding loss is
    bounded by the <=4 / <=3 guarantees.
    """
    docs = load_table(spark, sf_dir, "documents")
    cand = simhash_hamming_pairs(simhash(docs)).select("doc_a", "doc_b")
    truth = jaccard_pairs(
        docs,
        max_shingle_df=JACCARD_MAX_SHINGLE_DF,
        threshold=float(_AUDIT_J),
    ).select("doc_a", "doc_b")
    hits = cand.join(truth, ["doc_a", "doc_b"], "left_semi")
    n_c = cand.agg(F.count("*").alias("n_candidates"))
    n_t = truth.agg(F.count("*").alias("n_true_pairs"))
    n_h = hits.agg(F.count("*").alias("n_hits"))
    out = n_c.crossJoin(F.broadcast(n_t)).crossJoin(F.broadcast(n_h))
    prec = F.when(
        F.col("n_candidates") > 0,
        round4(
            F.col("n_hits").cast("double")
            / F.col("n_candidates").cast("double")
        ),
    )
    rec = F.when(
        F.col("n_true_pairs") > 0,
        round4(
            F.col("n_hits").cast("double")
            / F.col("n_true_pairs").cast("double")
        ),
    )
    return out.select(
        "n_candidates",
        "n_true_pairs",
        "n_hits",
        prec.alias("precision"),
        rec.alias("recall"),
    )


# --------------------------------------------------------------------------
# q276 — weighted-vs-capped dedup decision agreement sweep
# --------------------------------------------------------------------------
_WJ_SWEEP_TAUS = (0.2, 0.3, 0.4, 0.5)
_WJ_SWEEP_VALUES = ", ".join(f"({t})" for t in _WJ_SWEEP_TAUS)
_WJ_UNW_TAU = 0.5  # the capped-unweighted decision bar (q121's truth)


@query(
    "q276_weighted_dedup_agreement",
    oracle=f"""
    WITH {_WJ_SCORED_CTES},
    taus(tau_w) AS (VALUES {_WJ_SWEEP_VALUES}),
    agg AS (
      SELECT t.tau_w,
             SUM(CASE WHEN s.w_jaccard >= t.tau_w THEN 1 ELSE 0 END)
               AS n_weighted,
             SUM(CASE WHEN s.jaccard_capped >= {_WJ_UNW_TAU}
                      THEN 1 ELSE 0 END) AS n_unweighted,
             SUM(CASE WHEN s.w_jaccard >= t.tau_w
                       AND s.jaccard_capped >= {_WJ_UNW_TAU}
                      THEN 1 ELSE 0 END) AS n_both
      FROM scored s CROSS JOIN taus t
      GROUP BY t.tau_w)
    SELECT CAST(tau_w AS DOUBLE) AS tau_w,
           CAST(n_weighted AS BIGINT) AS n_weighted,
           CAST(n_unweighted AS BIGINT) AS n_unweighted,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(n_weighted - n_both AS BIGINT) AS n_only_weighted,
           CAST(n_unweighted - n_both AS BIGINT) AS n_only_unweighted,
           CASE WHEN n_weighted + n_unweighted - n_both > 0
                THEN {r4('n_both * 1.0 / (n_weighted + n_unweighted - n_both)')}
           END AS decision_jaccard
    FROM agg
    ORDER BY tau_w
    """,
    tags=("extension", "dedup", "weighted", "calibration"),
)
def q276_weighted_dedup_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decision-agreement sweep between the two near-dup metrics the
    engine ships: q273's IDF-WEIGHTED jaccard at tau_w in
    {0.2, 0.3, 0.4, 0.5} versus the capped UNWEIGHTED jaccard at the
    audit bar 0.5, over the same scored candidate set. Per tau_w:
    accept counts per metric, the overlap, the pairs each metric
    uniquely flags, and the Jaccard of the two DECISION sets — the
    calibration that picks tau_w before swapping the weighted metric
    into a production dedup gate (q248's role for banding configs,
    applied to scoring semantics). n_only_weighted are pairs the cap
    family misses (agreement on rare content diluted by boilerplate);
    n_only_unweighted are pairs held up by high-df shingles the
    weighting discounts.

    Shape: one pass over _wj_scored (q273's frame, shared CTEs/code —
    both metrics already round4-quantized there), a broadcast tau dim,
    one tiny grouped aggregate. Adds nothing to q273's scale cost.
    """
    scored = _wj_scored(spark, sf_dir)
    taus = spark.createDataFrame(
        [(float(t),) for t in _WJ_SWEEP_TAUS], "tau_w DOUBLE"
    )
    agg = (
        scored.crossJoin(F.broadcast(taus))
        .groupBy("tau_w")
        .agg(
            F.sum(
                (F.col("w_jaccard") >= F.col("tau_w")).cast("long")
            ).alias("n_weighted"),
            F.sum(
                (F.col("jaccard_capped") >= F.lit(_WJ_UNW_TAU)).cast("long")
            ).alias("n_unweighted"),
            F.sum(
                (
                    (F.col("w_jaccard") >= F.col("tau_w"))
                    & (F.col("jaccard_capped") >= F.lit(_WJ_UNW_TAU))
                ).cast("long")
            ).alias("n_both"),
        )
    )
    union = F.col("n_weighted") + F.col("n_unweighted") - F.col("n_both")
    return agg.select(
        "tau_w",
        "n_weighted",
        "n_unweighted",
        "n_both",
        (F.col("n_weighted") - F.col("n_both")).alias("n_only_weighted"),
        (F.col("n_unweighted") - F.col("n_both")).alias(
            "n_only_unweighted"
        ),
        F.when(
            union > 0, round4(F.col("n_both") * F.lit(1.0) / union)
        ).alias("decision_jaccard"),
    ).orderBy("tau_w")


# --------------------------------------------------------------------------
# q277 — repeated-passage scrub savings per source
# --------------------------------------------------------------------------
@query(
    "q277_passage_scrub_savings",
    oracle=f"""
    WITH {_PASS_SPAN_CTES},
    perdoc AS (
      SELECT doc_id, SUM(e - s + 1) AS dup_chars FROM spans
      GROUP BY doc_id),
    tot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(text)) AS BIGINT) AS total_chars
      FROM documents GROUP BY source),
    dup AS (
      SELECT d.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs_with_dup,
             CAST(SUM(p.dup_chars) AS BIGINT) AS dup_chars
      FROM perdoc p JOIN documents d USING (doc_id)
      GROUP BY d.source)
    SELECT t.source, t.n_docs, t.total_chars,
           CAST(COALESCE(dup.n_docs_with_dup, 0) AS BIGINT)
             AS n_docs_with_dup,
           CAST(COALESCE(dup.dup_chars, 0) AS BIGINT) AS dup_chars,
           {r4('COALESCE(dup.dup_chars, 0) * 1.0 / t.total_chars')}
             AS dup_char_frac
    FROM tot t LEFT JOIN dup USING (source)
    ORDER BY t.source
    """,
    tags=("extension", "dedup", "substring", "curation"),
)
def q277_passage_scrub_savings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The budget answer on top of q268: per SOURCE, how many
    characters live inside corpus-duplicated passages — i.e. what an
    ExactSubstr scrub pass (q146's SCRUB applied to q268's spans)
    would remove, and from how many documents. dup_char_frac is the
    headline number a curation review reads before scheduling the
    scrub: a source at 30% duplicated bytes is syndication/boilerplate
    heavy and pays for passage-level dedup; one at 2% only needs
    doc-level dedup. Exact by construction: q268's spans have disjoint
    char coverage (gap > w breaks), so the SUM never double-counts.

    Shape: q268's span machinery verbatim (shared CTEs/helper — one
    linear window scan, one groupBy(win), one partitioned lag window),
    then two narrow aggregates joined on source. Adds nothing to
    q268's scale cost.
    """
    docs = load_table(spark, sf_dir, "documents")
    perdoc = (
        _dup_spans(docs)
        .groupBy("doc_id")
        .agg(F.sum(F.col("e") - F.col("s") + 1).alias("dup_chars"))
    )
    tot = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )
    dup = (
        perdoc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs_with_dup"),
            F.sum("dup_chars").cast("long").alias("dup_chars"),
        )
    )
    return (
        tot.join(dup, "source", "left")
        .select(
            "source",
            "n_docs",
            "total_chars",
            F.coalesce("n_docs_with_dup", F.lit(0))
            .cast("long")
            .alias("n_docs_with_dup"),
            F.coalesce("dup_chars", F.lit(0))
            .cast("long")
            .alias("dup_chars"),
            round4(
                F.coalesce("dup_chars", F.lit(0))
                * F.lit(1.0)
                / F.col("total_chars")
            ).alias("dup_char_frac"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q280 — SimHash Hamming-distance histogram (band/threshold calibration)
# --------------------------------------------------------------------------
_HH_TARGET = 64  # fixed anchor-sample size (fixed_sample discipline)


@query(
    "q280_simhash_hamming_histogram",
    oracle=f"""
    WITH {_SIMHASH_CTES},
    {fixed_sample_ctes("fingerprints", "doc_id", _HH_TARGET, "anch")},
    hist AS (
      SELECT bit_count(xor(a.simhash, f.simhash)) AS hamming,
             COUNT(*) AS n_pairs
      FROM anch a JOIN fingerprints f ON f.doc_id <> a.doc_id
      GROUP BY 1),
    tot AS (SELECT SUM(n_pairs) AS t FROM hist),
    cum AS (
      SELECT h1.hamming, SUM(h2.n_pairs) AS c
      FROM hist h1 JOIN hist h2 ON h2.hamming <= h1.hamming
      GROUP BY 1)
    SELECT CAST(h.hamming AS BIGINT) AS hamming,
           CAST(h.n_pairs AS BIGINT) AS n_pairs,
           {r4('h.n_pairs * 1.0 / tot.t')} AS share,
           {r4('c.c * 1.0 / tot.t')} AS cum_share
    FROM hist h JOIN cum c USING (hamming) CROSS JOIN tot
    ORDER BY hamming
    """,
    tags=("extension", "dedup", "simhash", "calibration"),
)
def q280_simhash_hamming_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hamming-distance histogram of the 60-bit SimHash fingerprint
    space — the calibration table you read BEFORE picking q79's verify
    threshold (VERDICT r7 #5c): each anchor's distance to every other
    document, bucketed by exact Hamming distance, with per-bucket
    share and cumulative share. On a corpus where near-dups sit at
    Hamming <= 5 and the random-pair bulk at ~25-35 (the measured
    shape here), the histogram's left tail IS the near-dup mass and
    the elbow prices any candidate threshold: cum_share at h is
    exactly the fraction of comparisons a Hamming<=h index would
    accept. Re-run after any fingerprint change (this round's 32->60
    bit migration was chosen from this table's sf0.1 shape).

    Scale: anchors are a fixed_sample of the fingerprint frame
    (~64 rows at ANY corpus size, modulus 1 at sf<=0.1 so
    small-SF answers cover all pairs), so the scan is O(target x n) —
    the anchor side is provably bounded and broadcast; the histogram
    is <= 61 rows, and the cumulative column is a triangular
    self-join on that bounded frame (never a global window — the
    q191/q192 audit discipline).
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = simhash(docs).persist()
    anchors = fixed_sample(fp, "doc_id", _HH_TARGET).select(
        F.col("doc_id").alias("a_id"), F.col("simhash").alias("sh_a")
    )
    pairs = fp.crossJoin(F.broadcast(anchors)).filter(
        F.col("doc_id") != F.col("a_id")
    )
    hist = (
        pairs.select(
            F.expr("CAST(bit_count(simhash ^ sh_a) AS BIGINT)").alias(
                "hamming"
            )
        )
        .groupBy("hamming")
        .agg(F.count("*").alias("n_pairs"))
        .localCheckpoint(eager=True)  # <=61 rows, consumed 3x
    )
    fp.unpersist()
    tot = hist.agg(F.sum("n_pairs").alias("t"))
    h2 = hist.select(
        F.col("hamming").alias("h2"), F.col("n_pairs").alias("np2")
    )
    cum = (
        hist.join(F.broadcast(h2), F.col("h2") <= F.col("hamming"))
        .groupBy("hamming")
        .agg(F.sum("np2").alias("c"))
    )
    return (
        hist.join(cum, "hamming")
        .crossJoin(F.broadcast(tot))
        .select(
            "hamming",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            round4(F.col("n_pairs") * F.lit(1.0) / F.col("t")).alias(
                "share"
            ),
            round4(F.col("c") * F.lit(1.0) / F.col("t")).alias(
                "cum_share"
            ),
        )
        .orderBy("hamming")
    )


# --------------------------------------------------------------------------
# q278 — cross-family dedup agreement: SemDeDup (embedding) vs Jaccard (text)
# --------------------------------------------------------------------------
from movie_data_pipeline_spark.plans.similarity import (  # noqa: E402
    _ANN_DIM,
    _SEM_PLANES,
    _SEM_TAU,
    _cell_sql,
)

assert _SHINGLES_CTE.count("FROM documents") == 1, (
    "_SHINGLES_CTE must reference documents exactly once; "
    "q278 retargets it via .replace('FROM documents', 'FROM docs_i')"
)


@query(
    "q278_dedup_family_agreement",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS arr FROM embeddings
      WHERE vec_id IN (SELECT doc_id FROM documents)),
    b AS (SELECT vec_id, arr,
                 {_cell_sql('arr', _SEM_PLANES)} AS cell FROM v),
    sem AS (
      SELECT DISTINCT x.vec_id AS doc_a, y.vec_id AS doc_b
      FROM b x JOIN b y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE {r4('list_cosine_similarity(x.arr, y.arr)')} >= {_SEM_TAU}),
    docs_i AS (
      SELECT * FROM documents
      WHERE doc_id IN (SELECT vec_id FROM embeddings)),
    {_SHINGLES_CTE.replace("FROM documents", "FROM docs_i")},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c
               GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    txt AS (
      SELECT doc_a, doc_b FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE {r4('n_common * 1.0 / (ca.n + cb.n - n_common)')}
              >= {_AUDIT_J}),
    pb AS (SELECT * FROM txt INTERSECT SELECT * FROM sem),
    td AS (SELECT DISTINCT doc_b FROM txt),
    sd AS (SELECT DISTINCT doc_b FROM sem),
    dd AS (SELECT * FROM td INTERSECT SELECT * FROM sd),
    c AS (SELECT
      (SELECT COUNT(*) FROM txt) AS nt,
      (SELECT COUNT(*) FROM sem) AS ns,
      (SELECT COUNT(*) FROM pb) AS nb,
      (SELECT COUNT(*) FROM td) AS ntd,
      (SELECT COUNT(*) FROM sd) AS nsd,
      (SELECT COUNT(*) FROM dd) AS nbd)
    SELECT CAST(nt AS BIGINT) AS n_text_pairs,
           CAST(ns AS BIGINT) AS n_sem_pairs,
           CAST(nb AS BIGINT) AS n_pair_both,
           CASE WHEN nt + ns - nb > 0
                THEN {r4('nb * 1.0 / (nt + ns - nb)')} END
             AS pair_jaccard,
           CAST(ntd AS BIGINT) AS n_text_drops,
           CAST(nsd AS BIGINT) AS n_sem_drops,
           CAST(nbd AS BIGINT) AS n_drop_both,
           CASE WHEN ntd + nsd - nbd > 0
                THEN {r4('nbd * 1.0 / (ntd + nsd - nbd)')} END
             AS drop_jaccard
    FROM c
    """,
    tags=("extension", "dedup", "semdedup", "audit", "agreement"),
)
def q278_dedup_family_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-FAMILY dedup agreement (VERDICT r7 #5a): q174's SemDeDup
    decisions (embedding space: same hyperplane cell + round4 cosine
    >= 0.3) against q18's shingle decisions (df-capped word-3-gram
    Jaccard >= 0.5) over the SAME corpus slice — the q276 pattern
    applied ACROSS modalities instead of across scoring variants. Both
    sides are restricted to the documents<->embeddings id intersection
    (doc_id = vec_id is the corpus link), decisions are compared at
    two granularities — flagged PAIRS and dropped DOCS (both families
    keep the earliest member, so a doc is dropped iff it appears as
    the larger id of any flagged pair) — and each granularity reports
    both counts and the decision-set Jaccard. What embedding dedup
    catches that shingles miss (paraphrase, translation) and vice
    versa (verbatim-but-short overlap below cosine tau) is exactly
    this table; on this synthetic corpus the embeddings are
    near-isotropic and UNCORRELATED with the planted text dups, so the
    honest expectation is agreement ~0 — the audit prices the modality
    gap rather than assuming it.

    Scale: both candidate generators are the bounded ones audited
    elsewhere (16 hyperplane cells; shingle df-cap 1000) — never
    all-pairs; the intersection is two semi joins; the report is
    set-intersection counts folded to one row via broadcast scalars.
    """
    from movie_data_pipeline_spark.operators.similarity import (
        _to_double,
        dot,
        l2_norm,
        lsh_bucket,
    )
    from movie_data_pipeline_spark.plans.similarity import _hyperplane

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    v = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    docs_i = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )
    planes = [_hyperplane(_ANN_DIM, i) for i in range(_SEM_PLANES)]
    cells = v.select(
        "vec_id",
        lsh_bucket(F.col("embedding"), planes).alias("cell"),
        _to_double(F.col("embedding")).alias("e"),
    ).select("vec_id", "cell", "e", l2_norm(F.col("e")).alias("nn"))
    a = cells.select(
        F.col("cell"),
        F.col("vec_id").alias("doc_a"),
        F.col("e").alias("ea"),
        F.col("nn").alias("na"),
    )
    bb = cells.select(
        F.col("cell"),
        F.col("vec_id").alias("doc_b"),
        F.col("e").alias("eb"),
        F.col("nn").alias("nb"),
    )
    sem = (
        a.join(bb, "cell")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            round4(
                dot(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb"))
            )
            >= F.lit(_SEM_TAU)
        )
        .select("doc_a", "doc_b")
        .distinct()
        .persist()
    )
    txt = (
        jaccard_pairs(
            docs_i,
            max_shingle_df=JACCARD_MAX_SHINGLE_DF,
            threshold=float(_AUDIT_J),
        )
        .select("doc_a", "doc_b")
        .persist()
    )
    pb = txt.join(sem, ["doc_a", "doc_b"], "left_semi")
    td = txt.select("doc_b").distinct()
    sd = sem.select("doc_b").distinct()
    dd = td.join(sd, "doc_b", "left_semi")
    one = (
        txt.agg(F.count("*").alias("nt"))
        .crossJoin(F.broadcast(sem.agg(F.count("*").alias("ns"))))
        .crossJoin(F.broadcast(pb.agg(F.count("*").alias("nb"))))
        .crossJoin(F.broadcast(td.agg(F.count("*").alias("ntd"))))
        .crossJoin(F.broadcast(sd.agg(F.count("*").alias("nsd"))))
        .crossJoin(F.broadcast(dd.agg(F.count("*").alias("nbd"))))
    )
    pj = F.when(
        F.col("nt") + F.col("ns") - F.col("nb") > 0,
        round4(
            F.col("nb")
            * F.lit(1.0)
            / (F.col("nt") + F.col("ns") - F.col("nb"))
        ),
    )
    dj = F.when(
        F.col("ntd") + F.col("nsd") - F.col("nbd") > 0,
        round4(
            F.col("nbd")
            * F.lit(1.0)
            / (F.col("ntd") + F.col("nsd") - F.col("nbd"))
        ),
    )
    out = one.select(
        F.col("nt").cast("long").alias("n_text_pairs"),
        F.col("ns").cast("long").alias("n_sem_pairs"),
        F.col("nb").cast("long").alias("n_pair_both"),
        pj.alias("pair_jaccard"),
        F.col("ntd").cast("long").alias("n_text_drops"),
        F.col("nsd").cast("long").alias("n_sem_drops"),
        F.col("nbd").cast("long").alias("n_drop_both"),
        dj.alias("drop_jaccard"),
    ).localCheckpoint(eager=True)
    sem.unpersist()
    txt.unpersist()
    return out


# --------------------------------------------------------------------------
# q281 — dedup granularity agreement: passage coverage vs doc-level pairs
# --------------------------------------------------------------------------


@query(
    "q281_granularity_agreement",
    oracle=f"""
    WITH {_PASS_SPAN_CTES},
    cov AS (SELECT doc_id, SUM(e - s + 1) AS covered
            FROM spans GROUP BY doc_id),
    pflag AS (
      SELECT d.doc_id FROM documents d JOIN cov c USING (doc_id)
      WHERE c.covered * 2 >= len(d.text)),
    {_SHINGLES_CTE},
    {_CAPPED_CTES},
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles_c
               GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles_c a JOIN shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jp AS (
      SELECT doc_a, doc_b FROM common
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE {r4('n_common * 1.0 / (ca.n + cb.n - n_common)')}
              >= {_AUDIT_J}),
    jflag AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM jp
        UNION ALL SELECT doc_b AS doc_id FROM jp)),
    per AS (
      SELECT d.source,
             COUNT(*) AS n_docs,
             SUM(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS np,
             SUM(CASE WHEN j.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS nj,
             SUM(CASE WHEN p.doc_id IS NOT NULL
                       AND j.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS nb
      FROM documents d
      LEFT JOIN pflag p ON p.doc_id = d.doc_id
      LEFT JOIN jflag j ON j.doc_id = d.doc_id
      GROUP BY d.source)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(np AS BIGINT) AS n_passage_flagged,
           CAST(nj AS BIGINT) AS n_jaccard_flagged,
           CAST(nb AS BIGINT) AS n_both,
           CASE WHEN np + nj - nb > 0
                THEN {r4('nb * 1.0 / (np + nj - nb)')} END
             AS flag_jaccard
    FROM per ORDER BY source
    """,
    tags=("extension", "dedup", "substring", "audit", "agreement"),
)
def q281_granularity_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup GRANULARITY agreement: which documents the passage-level
    scrubber would rewrite vs which the doc-level near-dup pass would
    drop — per source. A doc is passage-flagged when q268's maximal
    duplicated spans cover >= half its text (integer keep rule
    covered*2 >= len, no division — the q208 discipline); it is
    doc-flagged when it belongs to ANY df-capped word-3-gram Jaccard
    >= 0.5 pair (q18's machinery at q121's truth bar). The per-source
    overlap and decision-set Jaccard answer the planning question the
    two families always raise at 100 TB: does doc-level dedup already
    remove the passage-duplicated mass (flag_jaccard -> 1, run the
    cheap pass only), or is boilerplate spread across otherwise-unique
    docs (n_passage_only high -> the scrub pass has work doc-level
    dedup cannot do)? Completes the agreement suite: q276 compares
    SCORING variants, q278 compares MODALITIES, this compares
    GRANULARITIES.

    Scale: reuses q268's linear span frame (digested groupBy) and
    q18's df-capped buckets — no new quadratic surface; the rollup is
    two LEFT semi-style joins on doc_id and one groupBy(source).
    """
    docs = load_table(spark, sf_dir, "documents")
    spans = _dup_spans(docs)
    cov = spans.groupBy("doc_id").agg(
        F.sum(F.col("e") - F.col("s") + 1).alias("covered")
    )
    pflag = (
        docs.join(cov, "doc_id")
        .filter(F.col("covered") * 2 >= F.length("text"))
        .select("doc_id")
    )
    jp = jaccard_pairs(
        docs,
        max_shingle_df=JACCARD_MAX_SHINGLE_DF,
        threshold=float(_AUDIT_J),
    ).select("doc_a", "doc_b")
    # both pair members flagged map-side from one evaluation of the
    # capped-pair frame (the unionAll form inlined jaccard_pairs' final
    # join subtree twice — guide §2.4)
    jflag = jp.select(
        F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("doc_id")
    ).distinct()
    base = docs.select("doc_id", "source")
    per = (
        base.join(pflag.withColumn("pf", F.lit(1)), "doc_id", "left")
        .join(jflag.withColumn("jf", F.lit(1)), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.coalesce("pf", F.lit(0)))
            .cast("long")
            .alias("n_passage_flagged"),
            F.sum(F.coalesce("jf", F.lit(0)))
            .cast("long")
            .alias("n_jaccard_flagged"),
            F.sum(
                F.when(
                    F.col("pf").isNotNull() & F.col("jf").isNotNull(),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_both"),
        )
    )
    union_sz = (
        F.col("n_passage_flagged")
        + F.col("n_jaccard_flagged")
        - F.col("n_both")
    )
    return per.select(
        "source",
        "n_docs",
        "n_passage_flagged",
        "n_jaccard_flagged",
        "n_both",
        F.when(
            union_sz > 0,
            round4(F.col("n_both") * F.lit(1.0) / union_sz),
        ).alias("flag_jaccard"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# q288 — dedup-cluster stable-ID churn across snapshots (round 9, #5)
# --------------------------------------------------------------------------
def _render_cluster_comp_ctes(prefix: str, pred: str) -> str:
    """The q63 cluster chain (shingles -> df-cap -> Jaccard>=0.2 pairs
    -> recursive closure -> min-doc_id components) rendered over a
    FILTERED document snapshot, all CTE names prefixed so two snapshots
    coexist in one WITH RECURSIVE. The df-cap is computed WITHIN the
    snapshot — exactly what ``jaccard_pairs`` does on the filtered
    frame. Emits ``{prefix}comp(doc_id, cluster_id)`` with singletons
    included (every snapshot doc gets a component)."""
    p = prefix
    return f"""{p}docs AS (SELECT doc_id, text FROM documents WHERE {pred}),
    {p}toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM {p}docs),
    {p}shingles AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                 THEN unnest(list_transform(generate_series(1, len(t) - 2),
                                            i -> array_to_string(t[i:i+2], ' ')))
                 ELSE array_to_string(t, ' ')
               END AS sh
        FROM {p}toks)),
    {p}sh_keep AS (
      SELECT sh FROM {p}shingles GROUP BY sh
      HAVING COUNT(*) <= {JACCARD_MAX_SHINGLE_DF}),
    {p}shingles_c AS (
      SELECT s.doc_id, s.sh FROM {p}shingles s JOIN {p}sh_keep USING (sh)),
    {p}counts AS (
      SELECT doc_id, COUNT(*) AS n FROM {p}shingles_c GROUP BY doc_id),
    {p}common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM {p}shingles_c a JOIN {p}shingles_c b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    {p}pairs AS (
      SELECT doc_a, doc_b FROM {p}common
      JOIN {p}counts ca ON ca.doc_id = doc_a
      JOIN {p}counts cb ON cb.doc_id = doc_b
      WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.2),
    {p}e AS (SELECT doc_a AS src, doc_b AS dst FROM {p}pairs
             UNION ALL SELECT doc_b, doc_a FROM {p}pairs),
    {p}reach(id, node) AS (
      SELECT doc_id, doc_id FROM {p}docs
      UNION
      SELECT r.id, e.dst FROM {p}reach r JOIN {p}e e ON e.src = r.node),
    {p}comp AS (
      SELECT id AS doc_id, MIN(node) AS cluster_id
      FROM {p}reach GROUP BY id)"""


_CHURN_PRED_A = "doc_id % 11 <> 0"
_CHURN_PRED_B = "doc_id % 13 <> 0"


@query(
    "q288_cluster_churn_audit",
    oracle=f"""
    WITH RECURSIVE
    {_render_cluster_comp_ctes('sa_', _CHURN_PRED_A)},
    {_render_cluster_comp_ctes('sb_', _CHURN_PRED_B)},
    shared AS (
      SELECT a.doc_id, a.cluster_id AS ca, b.cluster_id AS cb
      FROM sa_comp a JOIN sb_comp b USING (doc_id)),
    per_a AS (
      SELECT ca, COUNT(*) AS n_shared,
             COUNT(DISTINCT cb) AS n_b_clusters,
             MIN(cb) AS main_b
      FROM shared GROUP BY ca),
    contrib AS (
      SELECT cb, COUNT(DISTINCT ca) AS n_a_contributors
      FROM shared GROUP BY cb),
    moved AS (
      SELECT s.ca,
             SUM(CASE WHEN s.cb <> p.main_b THEN 1 ELSE 0 END) AS n_moved
      FROM shared s JOIN per_a p USING (ca) GROUP BY s.ca)
    SELECT p.ca AS cluster_a,
           CAST(p.n_shared AS BIGINT) AS n_shared,
           CAST(p.n_b_clusters AS BIGINT) AS n_b_clusters,
           p.main_b AS main_b_cluster,
           CAST(m.n_moved AS BIGINT) AS n_moved,
           CASE WHEN p.n_b_clusters > 1 THEN 'split'
                WHEN c.n_a_contributors > 1 THEN 'merged'
                ELSE 'stable' END AS status
    FROM per_a p
    JOIN contrib c ON c.cb = p.main_b
    JOIN moved m ON m.ca = p.ca
    ORDER BY cluster_a
    """,
    tags=("extension", "dedup", "graph", "churn", "snapshot"),
)
def q288_cluster_churn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster STABLE-ID churn between two corpus snapshots
    (round 9, VERDICT r8 #5): connected components assign cluster ids
    per run, but what an incremental 100 TB pipeline must know is how
    those ids MOVE when the corpus changes — which clusters split,
    which merged, how many member docs changed assignment — because
    every downstream artifact (kept-corpus choice, dedup provenance,
    training-mix shares) is keyed by the cluster anchor. Snapshot A
    drops every 11th doc, snapshot B every 13th (q136's deterministic
    snapshot derivation), so removals can SPLIT chains bridged by a
    dropped doc and additions can MERGE clusters through a returning
    bridge doc — both directions exercised from one corpus.

    Per A-cluster over the SHARED doc set (min-doc_id anchoring on
    both sides): shared member count, how many B-clusters the members
    landed in, the anchor B-cluster (min id), members that moved off
    the anchor, and the classification — ``split`` if members scatter
    over >1 B-cluster, else ``merged`` if the target B-cluster absorbs
    >1 A-cluster, else ``stable`` (split takes precedence when both
    hold; identical CASE order in both engines).

    Scale: two q63 component runs (each: df-capped shingle pairs +
    min-label propagation — all audited shapes), then three
    cluster-keyed aggregates on the shared frame, each a fraction of
    corpus size. Nothing here is pairwise beyond the capped pair
    generation the dedup family already pays.
    """
    from movie_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")

    def comp(pred: str, out: str) -> DataFrame:
        snap = docs.filter(F.expr(pred))
        prs = jaccard_pairs(
            snap, max_shingle_df=JACCARD_MAX_SHINGLE_DF, threshold=0.2
        ).select("doc_a", "doc_b")
        return connected_components(
            prs, nodes=snap.select("doc_id"), src="doc_a", dst="doc_b"
        ).select(
            F.col("node").alias("doc_id"), F.col("component").alias(out)
        )

    # The two snapshot component runs are INDEPENDENT eager loops
    # (label propagation materializes + convergence-counts per round),
    # so run them from two driver threads and let the scheduler
    # back-fill each run's straggler tail with the other's tasks
    # (guide §2.6). Results are deterministic either way — the threads
    # only overlap job submission.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(comp, _CHURN_PRED_A, "ca")
        fb = pool.submit(comp, _CHURN_PRED_B, "cb")
        shared = fa.result().join(fb.result(), "doc_id")
    per_a = shared.groupBy("ca").agg(
        F.count("*").alias("n_shared"),
        F.countDistinct("cb").alias("n_b_clusters"),
        F.min("cb").alias("main_b"),
    )
    contrib = shared.groupBy("cb").agg(
        F.countDistinct("ca").alias("n_a_contributors")
    )
    moved = (
        shared.join(per_a.select("ca", "main_b"), "ca")
        .groupBy("ca")
        .agg(
            F.sum(
                F.when(F.col("cb") != F.col("main_b"), 1).otherwise(0)
            ).alias("n_moved")
        )
    )
    status = (
        F.when(F.col("n_b_clusters") > 1, F.lit("split"))
        .when(F.col("n_a_contributors") > 1, F.lit("merged"))
        .otherwise(F.lit("stable"))
    )
    return (
        per_a.join(contrib, per_a.main_b == contrib.cb)
        .join(moved, "ca")
        .select(
            F.col("ca").alias("cluster_a"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_b_clusters").cast("long").alias("n_b_clusters"),
            F.col("main_b").alias("main_b_cluster"),
            F.col("n_moved").cast("long").alias("n_moved"),
            status.alias("status"),
        )
        .orderBy("cluster_a")
    )


# --------------------------------------------------------------------------
# q290 — SimHash rung planner (price every ladder layout on the corpus)
# --------------------------------------------------------------------------
def _render_simhash_allrung_ctes(
    src: str = "fingerprints",
    out: str = "allbands",
    blks: str = "blks",
    with_combos: bool = True,
) -> str:
    """Band rows for EVERY rung (no rung filter) — the oracle twin of
    ``operators/dedup.simhash_band_rows_all_rungs``, composed from the
    SAME ``_simhash_combo_sql`` fragment as the rung-filtered renderer.
    Expects a ``src(doc_id, simhash)`` CTE; emits ``out(doc_id, rung,
    band_idx, band_val)``. ``with_combos=False`` skips re-emitting the
    shared ``combos`` VALUES table when an earlier fragment in the
    same query already defined it."""
    vals, blk, band_val = _simhash_combo_sql()
    combos_cte = (
        f"""combos(m, band_idx, j1, j2, j3) AS (VALUES
      {vals}),
    """
        if with_combos
        else ""
    )
    return f"""{combos_cte}{blks} AS (SELECT doc_id, simhash, [{blk}] AS blk FROM {src}),
    {out} AS (
      SELECT doc_id, combos.m AS rung, band_idx,
             {band_val} AS band_val
      FROM {blks}, combos)"""


@query(
    "q290_simhash_rung_planner",
    oracle=f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_allrung_ctes()},
    bkt AS (
      SELECT rung, band_idx, band_val, COUNT(*) AS sz
      FROM allbands GROUP BY 1, 2, 3)
    SELECT rung,
           CAST(COUNT(DISTINCT band_idx) AS BIGINT) AS n_bands,
           CAST(SUM(sz) AS BIGINT) AS n_band_rows,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(sz) AS BIGINT) AS max_bucket,
           CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM bkt GROUP BY rung ORDER BY rung
    """,
    tags=("extension", "dedup", "simhash", "calibration", "planner"),
)
def q290_simhash_rung_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash RUNG PLANNER (round 9): price every band-ladder layout
    over the REAL corpus in one pass — per rung m: band count, band
    rows the index would hold, occupied buckets, the largest bucket
    (the skew an AQE skew-join would split), and the exact banded
    candidate-pair count sum C(bucket, 2). This is the table an
    operator reads before pinning a gate/index rung (q287's build
    parameter) or migrating an existing index — the measured version
    of the ladder's occupancy model, the same measure-don't-guess
    discipline as q280 (the Hamming histogram the Hamming bar was read
    from) and q274 (the recall price). The in-plan rung choice of
    q79's self-join optimizes the one-shot case; an INDEX outlives the
    corpus size it was built at, so its rung deserves a priced
    decision.

    Shape: fingerprints once, then ONE explode over the full 41-combo
    table (6+15+20 band rows per doc, tagged by rung) and one
    (rung, band_idx, band_val) groupBy with map-side combine; the
    report is a 3-row rollup. Exactly linear in corpus size — the
    planner costs about two q79 candidate generations, and never
    generates a pair.
    """
    from movie_data_pipeline_spark.operators.dedup import (
        simhash_band_rows_all_rungs,
    )

    docs = load_table(spark, sf_dir, "documents")
    bands = simhash_band_rows_all_rungs(simhash(docs))
    bkt = bands.groupBy("rung", "band_idx", "band_val").agg(
        F.count("*").alias("sz")
    )
    return (
        bkt.groupBy("rung")
        .agg(
            F.countDistinct("band_idx").cast("long").alias("n_bands"),
            F.sum("sz").cast("long").alias("n_band_rows"),
            F.count("*").cast("long").alias("n_buckets"),
            F.max("sz").cast("long").alias("max_bucket"),
            F.sum(F.expr("(sz * (sz - 1)) div 2"))
            .cast("long")
            .alias("candidate_pairs"),
        )
        .orderBy("rung")
    )


# --------------------------------------------------------------------------
# q294 — SimHash bit-balance audit (fingerprint health monitor)
# --------------------------------------------------------------------------
@query(
    "q294_simhash_bit_balance",
    oracle=f"""
    WITH {_SIMHASH_CTES},
    bitgrid AS (SELECT j AS bit_idx FROM generate_series(0, 59) t(j)),
    per_bit AS (
      SELECT bit_idx,
             SUM((simhash // CAST(2 ** bit_idx AS BIGINT)) % 2) AS n_set,
             COUNT(*) AS n
      FROM fingerprints CROSS JOIN bitgrid
      GROUP BY bit_idx)
    SELECT CAST(bit_idx AS BIGINT) AS bit_idx,
           CAST(n_set AS BIGINT) AS n_set,
           {r4('n_set * 1.0 / n')} AS set_share,
           {r4('ABS(n_set * 1.0 / n - 0.5)')} AS abs_dev
    FROM per_bit ORDER BY bit_idx
    """,
    tags=("extension", "dedup", "simhash", "audit", "monitor"),
)
def q294_simhash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash BIT-BALANCE audit (round 9): per fingerprint bit, how
    many documents set it and the deviation from the 50% a healthy
    occurrence-weighted SimHash produces over a diverse corpus. Every
    downstream guarantee — the Hamming metric meaning anything, band
    buckets filling uniformly (q290's occupancy model), the ladder's
    collision floor — silently assumes unbiased bits; a skewed bit
    (token-hash bug, vote-threshold off-by-one, a corpus collapsed to
    one template) shows here FIRST, before it degrades recall in q274
    or saturates a q287 index bucket. The fleet-health monitor an
    ingest pipeline schedules next to the fingerprint job. (On THIS
    synthetic corpus the monitor fires for real: docs share frequent
    template tokens, so majority votes align and set shares span
    ~0.01-0.99 — the template-collapse signature; a distinct-token
    corpus measures ~0.5 per bit, asserted in
    tests/test_round9_queries.py.)

    Shape: one explode of a 60-element bit grid per fingerprint
    (n x 60 narrow rows), one groupBy(bit_idx) with map-side combine —
    linear, and 60-row output regardless of corpus size. Bit
    extraction is the same integer (fp div 2^j) % 2 both engines
    evaluate identically.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = simhash(docs)
    per_bit = (
        fp.select(
            "simhash",
            F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit_idx"),
        )
        .groupBy("bit_idx")
        .agg(
            F.sum(
                F.expr("(simhash div CAST(pow(2, bit_idx) AS BIGINT)) % 2")
            ).alias("n_set"),
            F.count("*").alias("n"),
        )
    )
    share = F.col("n_set") * F.lit(1.0) / F.col("n")
    return per_bit.select(
        F.col("bit_idx").cast("long").alias("bit_idx"),
        F.col("n_set").cast("long").alias("n_set"),
        round4(share).alias("set_share"),
        round4(F.abs(share - F.lit(0.5))).alias("abs_dev"),
    ).orderBy("bit_idx")


# --------------------------------------------------------------------------
# q297 — skew-corrected rung pricing (round 10, VERDICT r9 #3)
# --------------------------------------------------------------------------
def _q297_oracle(fp_ctes: str = None) -> str:
    """Skew-pricing oracle, parameterized on the fingerprint CTE block
    (round 11): rendered with ``_SIMHASH_CTES`` it is byte-identical to
    the round-10 q297 oracle; q306 renders the same body over the
    CENTERED fingerprint CTEs."""
    if fp_ctes is None:
        fp_ctes = _SIMHASH_CTES
    vals, _blk, _bv = _simhash_combo_sql()
    return f"""
    WITH {fp_ctes},
    {_render_simhash_allrung_ctes()},
    bitgrid AS (SELECT j AS bit_idx FROM generate_series(0, 59) t(j)),
    per_bit AS (
      SELECT bit_idx,
             SUM((simhash // CAST(2 ** bit_idx AS BIGINT)) % 2) AS n_set,
             COUNT(*) AS n
      FROM fingerprints CROSS JOIN bitgrid
      GROUP BY bit_idx),
    cb AS (
      SELECT bit_idx, bit_idx // 10 AS block_idx,
             (n_set * 1.0 / n) * (n_set * 1.0 / n)
             + (1 - n_set * 1.0 / n) * (1 - n_set * 1.0 / n) AS c
      FROM per_bit),
    bp AS (
      SELECT block_idx, PRODUCT(c ORDER BY bit_idx) AS bp
      FROM cb GROUP BY block_idx),
    pcombos(m, band_idx, j1, j2, j3) AS (VALUES
      {vals}),
    bandp AS (
      SELECT pcombos.m AS rung, band_idx,
             (b1.bp * COALESCE(b2.bp, 1.0)) * COALESCE(b3.bp, 1.0) AS p
      FROM pcombos
      JOIN bp b1 ON b1.block_idx = pcombos.j1
      LEFT JOIN bp b2 ON b2.block_idx = pcombos.j2
      LEFT JOIN bp b3 ON b3.block_idx = pcombos.j3),
    nn AS (SELECT MAX(n) AS n FROM per_bit),
    expd AS (
      SELECT rung,
             CAST(COUNT(*) AS BIGINT) AS n_bands,
             SUM(p ORDER BY band_idx) AS s
      FROM bandp GROUP BY rung),
    bkt AS (
      SELECT rung, band_idx, band_val, COUNT(*) AS sz
      FROM allbands GROUP BY 1, 2, 3),
    actual AS (
      SELECT rung,
             CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS actual_pairs
      FROM bkt GROUP BY rung)
    SELECT CAST(expd.rung AS BIGINT) AS rung,
           n_bands,
           actual_pairs,
           {r4('(CAST(n AS DOUBLE) * (n - 1) / 2)'
               ' * CAST(n_bands AS DOUBLE)'
               ' * POW(2.0, -10 * expd.rung)')} AS exp_pairs_uniform,
           {r4('(CAST(n AS DOUBLE) * (n - 1) / 2) * s')}
             AS exp_pairs_skewed,
           {r4('s / (CAST(n_bands AS DOUBLE) * POW(2.0, -10 * expd.rung))')}
             AS skew_inflation
    FROM expd JOIN actual ON expd.rung = actual.rung
    CROSS JOIN nn
    ORDER BY rung
    """


@query(
    "q297_simhash_skew_pricing",
    oracle=_q297_oracle(),
    tags=("extension", "dedup", "simhash", "calibration", "planner",
          "skew"),
)
def q297_simhash_skew_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-corrected SimHash rung pricing (round 10, VERDICT r9 #3):
    the ladder's collision-floor guarantees (SCALING.md; measured in
    SCALE_PROBE_r9.md) assume UNIFORM fingerprint bits, and q294
    measures per-bit set shares of 0.01-0.99 on this templated corpus
    — so this query folds the bit-entropy correction into the rung
    pricing itself. Per rung m it reports, over the real corpus:

    - ``actual_pairs`` — the exact banded candidate count (q290's
      measure: sum C(bucket, 2) over the rung's buckets);
    - ``exp_pairs_uniform`` — C(n,2) * n_bands / 2^(10m), the uniform
      floor every SCALING.md threshold was derived from;
    - ``exp_pairs_skewed`` — C(n,2) * sum over bands of
      prod_{bits in band} (p_j^2 + (1-p_j)^2) with p_j the MEASURED
      per-bit set share (independent-bits model — the standard LSH
      collision calculation with the uniformity assumption removed);
    - ``skew_inflation`` — skewed/uniform expectation ratio: how many
      times hotter the band space runs than the floor model claims.
      A rung planner multiplies the SCALING.md thresholds down by
      this factor before pinning an index rung.

    Cross-engine float discipline: every product/sum over band
    probabilities is an ORDERED fold (array_sort + aggregate on the
    Spark side, PRODUCT/SUM(... ORDER BY) on DuckDB) — sequential IEEE
    double ops in the same order are bit-identical, so the round4
    outputs can never straddle a quantization boundary. The per-bit
    shares, block products, and combo table all derive from the same
    helpers as q290/q294 (operators/dedup.simhash_band_combos), so the
    priced layout is BY CONSTRUCTION the layout the gates join on.

    Shape: one fingerprint pass shared (lazy local checkpoint) by the
    60-bit explode (n x 60 narrow rows) and the 41-combo band explode
    (q290's audited plan); everything downstream of the two groupBys
    is constant-size (60 bits, 6 blocks, 41 bands, 3 rungs). Linear in
    corpus size, never generates a pair.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = simhash(docs).localCheckpoint(eager=False)
    return _skew_pricing_frame(spark, fp)


def _skew_pricing_frame(spark: SparkSession, fp: DataFrame) -> DataFrame:
    """The q297 pricing computation over a given fingerprint frame —
    shared verbatim by q297 (zero-threshold fingerprints) and q306
    (centered fingerprints), so the two prices can only differ through
    the fingerprints themselves."""
    from movie_data_pipeline_spark.operators.dedup import (
        simhash_band_combos,
        simhash_band_rows_all_rungs,
    )

    per_bit = (
        fp.select(
            "simhash",
            F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit_idx"),
        )
        .groupBy("bit_idx")
        .agg(
            F.sum(
                F.expr("(simhash div CAST(pow(2, bit_idx) AS BIGINT)) % 2")
            ).alias("n_set"),
            F.count("*").alias("n"),
        )
    )
    p = F.col("n_set") * F.lit(1.0) / F.col("n")
    cb = per_bit.select(
        "bit_idx",
        (F.col("bit_idx") / 10).cast("int").alias("block_idx"),
        (p * p + (F.lit(1) - p) * (F.lit(1) - p)).alias("c"),
        "n",
    )
    bp = cb.groupBy("block_idx").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bit_idx", "c"))),
            F.lit(1.0),
            lambda acc, x: acc * x["c"],
        ).alias("bp")
    )
    combos = spark.createDataFrame(
        [(m, i, c[0], c[1] if len(c) > 1 else -1, c[2] if len(c) > 2 else -1)
         for (m, i, c) in simhash_band_combos()],
        "m INT, band_idx INT, j1 INT, j2 INT, j3 INT",
    )
    b1, b2, b3 = bp.alias("b1"), bp.alias("b2"), bp.alias("b3")
    bandp = (
        combos.join(b1, F.col("b1.block_idx") == F.col("j1"))
        .join(b2, F.col("b2.block_idx") == F.col("j2"), "left")
        .join(b3, F.col("b3.block_idx") == F.col("j3"), "left")
        .select(
            F.col("m").alias("rung"),
            "band_idx",
            (
                (F.col("b1.bp") * F.coalesce(F.col("b2.bp"), F.lit(1.0)))
                * F.coalesce(F.col("b3.bp"), F.lit(1.0))
            ).alias("p"),
        )
    )
    expd = bandp.groupBy("rung").agg(
        F.count("*").cast("long").alias("n_bands"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("band_idx", "p"))),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("s"),
    )
    nn = per_bit.agg(F.max("n").alias("n"))

    bkt = (
        simhash_band_rows_all_rungs(fp)
        .groupBy("rung", "band_idx", "band_val")
        .agg(F.count("*").alias("sz"))
    )
    actual = bkt.groupBy("rung").agg(
        F.sum(F.expr("(sz * (sz - 1)) div 2"))
        .cast("long")
        .alias("actual_pairs")
    )

    n_d = F.col("n").cast("double")
    pairs = n_d * (F.col("n") - 1) / 2
    unif_per_band = F.col("n_bands").cast("double") * F.pow(
        F.lit(2.0), F.lit(-10) * F.col("rung")
    )
    return (
        expd.join(actual, "rung")
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("rung").cast("long").alias("rung"),
            "n_bands",
            "actual_pairs",
            round4(pairs * unif_per_band).alias("exp_pairs_uniform"),
            round4(pairs * F.col("s")).alias("exp_pairs_skewed"),
            round4(F.col("s") / unif_per_band).alias("skew_inflation"),
        )
        .orderBy("rung")
    )


# --------------------------------------------------------------------------
# q304 — entropy-balanced banding: the skew MITIGATION priced in-plan
# (round 11, VERDICT r10 #1)
# --------------------------------------------------------------------------
_PER_BIT_SQL = """per_bit AS (
      SELECT bit_idx,
             SUM((simhash // CAST(2 ** bit_idx AS BIGINT)) % 2) AS n_set,
             COUNT(*) AS n
      FROM fingerprints CROSS JOIN bitgrid
      GROUP BY bit_idx)"""

# Snake assignment arithmetic — ONE rendered form shared by the oracle
# and mirrored expression-for-expression by the Spark plan below, and
# by construction the same integers operators/dedup.balanced_bit_blocks
# produces (tested in tests/test_simhash_balance.py).
_SNAKE_BLK_SQL = (
    "CASE WHEN (r // 6) % 2 = 0 THEN r % 6 ELSE 5 - (r % 6) END"
)


def _q304_oracle() -> str:
    vals, _blk, _bv = _simhash_combo_sql()
    return f"""
    WITH {_SIMHASH_CTES},
    {_render_simhash_allrung_ctes()},
    bitgrid AS (SELECT j AS bit_idx FROM generate_series(0, 59) t(j)),
    {_PER_BIT_SQL},
    asg AS (
      SELECT bit_idx, n_set, n,
             ROW_NUMBER() OVER (ORDER BY ABS(2 * n_set - n) DESC,
                                bit_idx) - 1 AS r
      FROM per_bit),
    asg2 AS (
      SELECT bit_idx, n_set, n,
             {_SNAKE_BLK_SQL} AS blk,
             ({_SNAKE_BLK_SQL}) * 10 + (r // 6) AS newpos
      FROM asg),
    permuted AS (
      SELECT f.doc_id,
             CAST(SUM(((f.simhash // CAST(2 ** a.bit_idx AS BIGINT)) % 2)
                      * CAST(2 ** a.newpos AS BIGINT)) AS BIGINT) AS simhash
      FROM fingerprints f CROSS JOIN asg2 a
      GROUP BY f.doc_id),
    {_render_simhash_allrung_ctes(src="permuted", out="ballbands",
                                  blks="bblks", with_combos=False)},
    bkt_n AS (
      SELECT rung, band_idx, band_val, COUNT(*) AS sz
      FROM allbands GROUP BY 1, 2, 3),
    act_n AS (
      SELECT rung, CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS actual_naive
      FROM bkt_n GROUP BY rung),
    bkt_b AS (
      SELECT rung, band_idx, band_val, COUNT(*) AS sz
      FROM ballbands GROUP BY 1, 2, 3),
    act_b AS (
      SELECT rung,
             CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS actual_balanced
      FROM bkt_b GROUP BY rung),
    cbn AS (
      SELECT bit_idx, bit_idx // 10 AS block_idx,
             (n_set * 1.0 / n) * (n_set * 1.0 / n)
             + (1 - n_set * 1.0 / n) * (1 - n_set * 1.0 / n) AS c
      FROM per_bit),
    cbb AS (
      SELECT bit_idx, blk AS block_idx,
             (n_set * 1.0 / n) * (n_set * 1.0 / n)
             + (1 - n_set * 1.0 / n) * (1 - n_set * 1.0 / n) AS c
      FROM asg2),
    bpn AS (
      SELECT block_idx, PRODUCT(c ORDER BY bit_idx) AS bp
      FROM cbn GROUP BY block_idx),
    bpb AS (
      SELECT block_idx, PRODUCT(c ORDER BY bit_idx) AS bp
      FROM cbb GROUP BY block_idx),
    pcombos(m, band_idx, j1, j2, j3) AS (VALUES
      {vals}),
    bandp_n AS (
      SELECT pcombos.m AS rung, band_idx,
             (b1.bp * COALESCE(b2.bp, 1.0)) * COALESCE(b3.bp, 1.0) AS p
      FROM pcombos
      JOIN bpn b1 ON b1.block_idx = pcombos.j1
      LEFT JOIN bpn b2 ON b2.block_idx = pcombos.j2
      LEFT JOIN bpn b3 ON b3.block_idx = pcombos.j3),
    bandp_b AS (
      SELECT pcombos.m AS rung, band_idx,
             (b1.bp * COALESCE(b2.bp, 1.0)) * COALESCE(b3.bp, 1.0) AS p
      FROM pcombos
      JOIN bpb b1 ON b1.block_idx = pcombos.j1
      LEFT JOIN bpb b2 ON b2.block_idx = pcombos.j2
      LEFT JOIN bpb b3 ON b3.block_idx = pcombos.j3),
    expd_n AS (
      SELECT rung, CAST(COUNT(*) AS BIGINT) AS n_bands,
             SUM(p ORDER BY band_idx) AS s
      FROM bandp_n GROUP BY rung),
    expd_b AS (
      SELECT rung, SUM(p ORDER BY band_idx) AS s
      FROM bandp_b GROUP BY rung),
    nn AS (SELECT MAX(n) AS n FROM per_bit)
    SELECT CAST(expd_n.rung AS BIGINT) AS rung,
           n_bands,
           actual_naive,
           actual_balanced,
           {r4('(CAST(n AS DOUBLE) * (n - 1) / 2)'
               ' * CAST(n_bands AS DOUBLE)'
               ' * POW(2.0, -10 * expd_n.rung)')} AS exp_pairs_uniform,
           {r4('(CAST(n AS DOUBLE) * (n - 1) / 2) * expd_n.s')}
             AS exp_pairs_naive,
           {r4('(CAST(n AS DOUBLE) * (n - 1) / 2) * expd_b.s')}
             AS exp_pairs_balanced,
           {r4('expd_n.s / (CAST(n_bands AS DOUBLE)'
               ' * POW(2.0, -10 * expd_n.rung))')} AS infl_naive,
           {r4('expd_b.s / (CAST(n_bands AS DOUBLE)'
               ' * POW(2.0, -10 * expd_n.rung))')} AS infl_balanced
    FROM expd_n
    JOIN expd_b ON expd_b.rung = expd_n.rung
    JOIN act_n ON act_n.rung = expd_n.rung
    JOIN act_b ON act_b.rung = expd_n.rung
    CROSS JOIN nn
    ORDER BY rung
    """


@query(
    "q304_simhash_balanced_banding",
    oracle=_q304_oracle(),
    tags=("extension", "dedup", "simhash", "calibration", "planner",
          "skew", "mitigation"),
)
def q304_simhash_balanced_banding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Entropy-BALANCED band assignment, measured against the naive
    layout (round 11, VERDICT r10 #1 — mitigate the skew, don't just
    price it): q297 shows the template-collapsed corpus inflates the
    band-collision floor 404x at rung 2 / 7,798x at rung 3 because the
    naive ``bit_idx div 10`` blocks CONCENTRATE degenerate bits (the
    per-band floor is the product of its bits' collision factors, so
    one all-degenerate band dominates the sum). The mitigation is a
    measured bit PERMUTATION: rank bits by integer imbalance
    ``|2*n_set - n|`` and snake-assign them across the 6 blocks
    (operators/dedup.balanced_bit_blocks), which equalizes per-block
    products — the elementary-symmetric-sum expectation is minimized
    at equality, and every ladder guarantee survives because blocks
    stay disjoint bit sets (pigeonhole) and Hamming is permutation-
    invariant (the exact verify bar is untouched).

    Per rung this publishes the naive and balanced ACTUAL banded
    candidate counts side by side with the uniform floor, both
    independent-bits expectations, and both inflation factors — the
    before/after table of the mitigation on the real corpus. The
    honest sf0.1 result: 404x -> 350x at rung 2, 7,799x -> 6,543x at
    rung 3 (-13/-16%), because THIS corpus's skew is spread across
    nearly every bit — the naive blocks are close to product-balanced
    by accident, and a permutation can never remove the total per-bit
    entropy deficit (the product of all 60 collision factors is
    permutation-invariant; equalizing block products is the best any
    assignment can do). The permutation's real protection is against
    CONCENTRATED skew — a template burst collapsing one block's bits,
    where the naive layout's floor turns quadratic in one band while
    the balanced layout stays near the Schur bound
    (tools/floor_probe.py measures that case synthetically:
    SCALE_PROBE_r11.md). Removing the deficit itself requires fixing
    the fingerprint, which is q305/q306's centered variant —
    skew_inflation ~1x there.

    Determinism: the assignment is pure integer (imbalance rank +
    snake arithmetic, rendered identically in both engines and equal
    by construction to the Python operator the gates use); expectation
    folds are ordered, as in q297. Shape: fingerprints once (lazy
    local checkpoint), one 60-row assignment (constant-size window),
    one broadcast re-permute pass, two 41-combo band explodes + bucket
    groupBys — linear, never generates a pair.
    """
    from pyspark.sql.window import Window

    from movie_data_pipeline_spark.operators.dedup import (
        simhash_band_combos,
        simhash_band_rows_all_rungs,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = simhash(docs).localCheckpoint(eager=False)

    per_bit = (
        fp.select(
            "simhash",
            F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit_idx"),
        )
        .groupBy("bit_idx")
        .agg(
            F.sum(
                F.expr("(simhash div CAST(pow(2, bit_idx) AS BIGINT)) % 2")
            ).alias("n_set"),
            F.count("*").alias("n"),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy(
        F.desc(F.abs(F.lit(2) * F.col("n_set") - F.col("n"))),
        F.asc("bit_idx"),
    )
    asg = (
        per_bit.withColumn("r", F.row_number().over(w) - 1)
        .withColumn(
            "blk",
            F.expr(
                "CASE WHEN (r div 6) % 2 = 0 THEN r % 6"
                " ELSE 5 - (r % 6) END"
            ),
        )
        .withColumn("newpos", F.col("blk") * 10 + F.expr("r div 6"))
    )
    permuted = (
        fp.select(
            "doc_id",
            "simhash",
            F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit_idx"),
        )
        .join(F.broadcast(asg.select("bit_idx", "newpos")), "bit_idx")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr("(simhash div CAST(pow(2, bit_idx) AS BIGINT)) % 2")
                * F.expr("CAST(pow(2, newpos) AS BIGINT)")
            )
            .cast("long")
            .alias("simhash")
        )
    )

    def _actual(bands: DataFrame, out: str) -> DataFrame:
        return (
            bands.groupBy("rung", "band_idx", "band_val")
            .agg(F.count("*").alias("sz"))
            .groupBy("rung")
            .agg(
                F.sum(F.expr("(sz * (sz - 1)) div 2")).cast("long").alias(out)
            )
        )

    act_n = _actual(simhash_band_rows_all_rungs(fp), "actual_naive")
    act_b = _actual(
        simhash_band_rows_all_rungs(permuted), "actual_balanced"
    )

    p = F.col("n_set") * F.lit(1.0) / F.col("n")
    c_expr = (p * p + (F.lit(1) - p) * (F.lit(1) - p)).alias("c")
    cbn = per_bit.select(
        "bit_idx", (F.col("bit_idx") / 10).cast("int").alias("block_idx"),
        c_expr,
    )
    cbb = asg.select("bit_idx", F.col("blk").alias("block_idx"), c_expr)
    combos = spark.createDataFrame(
        [(m, i, c[0], c[1] if len(c) > 1 else -1, c[2] if len(c) > 2 else -1)
         for (m, i, c) in simhash_band_combos()],
        "m INT, band_idx INT, j1 INT, j2 INT, j3 INT",
    )

    def _expd(cb: DataFrame, s_out: str) -> DataFrame:
        bp = cb.groupBy("block_idx").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("bit_idx", "c"))),
                F.lit(1.0),
                lambda acc, x: acc * x["c"],
            ).alias("bp")
        )
        b1, b2, b3 = bp.alias("b1"), bp.alias("b2"), bp.alias("b3")
        bandp = (
            combos.join(b1, F.col("b1.block_idx") == F.col("j1"))
            .join(b2, F.col("b2.block_idx") == F.col("j2"), "left")
            .join(b3, F.col("b3.block_idx") == F.col("j3"), "left")
            .select(
                F.col("m").alias("rung"),
                "band_idx",
                (
                    (F.col("b1.bp") * F.coalesce(F.col("b2.bp"), F.lit(1.0)))
                    * F.coalesce(F.col("b3.bp"), F.lit(1.0))
                ).alias("p"),
            )
        )
        return bandp.groupBy("rung").agg(
            F.count("*").cast("long").alias(f"__nb_{s_out}"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("band_idx", "p"))),
                F.lit(0.0),
                lambda acc, x: acc + x["p"],
            ).alias(s_out),
        )

    expd_n = _expd(cbn, "s_n")
    expd_b = _expd(cbb, "s_b").drop("__nb_s_b")
    nn = per_bit.agg(F.max("n").alias("n"))

    n_d = F.col("n").cast("double")
    pairs = n_d * (F.col("n") - 1) / 2
    unif_per_band = F.col("__nb_s_n").cast("double") * F.pow(
        F.lit(2.0), F.lit(-10) * F.col("rung")
    )
    return (
        expd_n.join(expd_b, "rung")
        .join(act_n, "rung")
        .join(act_b, "rung")
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("rung").cast("long").alias("rung"),
            F.col("__nb_s_n").alias("n_bands"),
            "actual_naive",
            "actual_balanced",
            round4(pairs * unif_per_band).alias("exp_pairs_uniform"),
            round4(pairs * F.col("s_n")).alias("exp_pairs_naive"),
            round4(pairs * F.col("s_b")).alias("exp_pairs_balanced"),
            round4(F.col("s_n") / unif_per_band).alias("infl_naive"),
            round4(F.col("s_b") / unif_per_band).alias("infl_balanced"),
        )
        .orderBy("rung")
    )


# --------------------------------------------------------------------------
# q305 — centered-fingerprint bit balance (the source-level fix, measured)
# --------------------------------------------------------------------------
@query(
    "q305_simhash_centered_balance",
    oracle=f"""
    WITH {_SIMHASH_CTES},
    vtot AS (
      SELECT bit_idx, SUM(vote) AS s, COUNT(*) AS n
      FROM votes GROUP BY bit_idx),
    cfp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN vote * n > s THEN pow2 ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM votes JOIN vtot USING (bit_idx) GROUP BY doc_id),
    bitgrid AS (SELECT j AS bit_idx FROM generate_series(0, 59) t(j)),
    pb_raw AS (
      SELECT bit_idx,
             SUM((simhash // CAST(2 ** bit_idx AS BIGINT)) % 2) AS n_set,
             COUNT(*) AS n
      FROM fingerprints CROSS JOIN bitgrid GROUP BY bit_idx),
    pb_c AS (
      SELECT bit_idx,
             SUM((simhash // CAST(2 ** bit_idx AS BIGINT)) % 2) AS n_set,
             COUNT(*) AS n
      FROM cfp CROSS JOIN bitgrid GROUP BY bit_idx)
    SELECT CAST(pb_raw.bit_idx AS BIGINT) AS bit_idx,
           CAST(pb_raw.n_set AS BIGINT) AS n_set_raw,
           CAST(pb_c.n_set AS BIGINT) AS n_set_centered,
           {r4('ABS(pb_raw.n_set * 1.0 / pb_raw.n - 0.5)')} AS abs_dev_raw,
           {r4('ABS(pb_c.n_set * 1.0 / pb_c.n - 0.5)')} AS abs_dev_centered
    FROM pb_raw JOIN pb_c ON pb_c.bit_idx = pb_raw.bit_idx
    ORDER BY bit_idx
    """,
    tags=("extension", "dedup", "simhash", "audit", "monitor",
          "mitigation"),
)
def q305_simhash_centered_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CENTERED-fingerprint bit balance, side by side with the raw
    fingerprint (round 11, VERDICT r10 #1): q294 measures per-bit set
    shares of 0.01-0.99 on this corpus, and the root cause is not
    token identity (the vocabulary is tiny and near-ubiquitous — IDF
    weights all round to zero) but the MEAN of each bit's vote
    distribution being far from the zero threshold. The fix is the
    learning-to-hash standard: threshold each bit at its corpus-
    central value (operators/dedup.simhash_centered — exact integer
    ``vote*n > sum`` comparison, no float mean). This audit publishes
    the before/after per bit: on this corpus the mean |share - 0.5|
    drops from ~0.27 to ~0.03 (sf0.001; same collapse at every SF),
    which is what pulls q306's collision-floor inflation down to ~1x.

    Shape: ONE token-vote pass shared by both fingerprints (the
    centered one adds a 60-row vote-total aggregate and a broadcast
    threshold join), then two 60-row balance rollups. Linear; output
    is 60 rows at any corpus size.
    """
    raw = simhash(docs := load_table(spark, sf_dir, "documents"))
    centered = simhash_centered(docs)

    def _pb(fp: DataFrame, n_set_out: str) -> DataFrame:
        return (
            fp.select(
                "simhash",
                F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit_idx"),
            )
            .groupBy("bit_idx")
            .agg(
                F.sum(
                    F.expr(
                        "(simhash div CAST(pow(2, bit_idx) AS BIGINT)) % 2"
                    )
                ).alias(n_set_out),
                F.count("*").alias(f"__n_{n_set_out}"),
            )
        )

    pb_raw = _pb(raw, "n_set_raw")
    pb_c = _pb(centered, "n_set_centered")
    dev_raw = F.abs(
        F.col("n_set_raw") * F.lit(1.0) / F.col("__n_n_set_raw") - F.lit(0.5)
    )
    dev_c = F.abs(
        F.col("n_set_centered") * F.lit(1.0) / F.col("__n_n_set_centered")
        - F.lit(0.5)
    )
    return (
        pb_raw.join(pb_c, "bit_idx")
        .select(
            F.col("bit_idx").cast("long").alias("bit_idx"),
            F.col("n_set_raw").cast("long").alias("n_set_raw"),
            F.col("n_set_centered").cast("long").alias("n_set_centered"),
            round4(dev_raw).alias("abs_dev_raw"),
            round4(dev_c).alias("abs_dev_centered"),
        )
        .orderBy("bit_idx")
    )


# --------------------------------------------------------------------------
# q306 — centered-fingerprint rung pricing (skew_inflation -> ~1x)
# --------------------------------------------------------------------------
@query(
    "q306_simhash_centered_pricing",
    oracle=_q297_oracle(_SIMHASH_CENTERED_CTES),
    tags=("extension", "dedup", "simhash", "calibration", "planner",
          "skew", "mitigation"),
)
def q306_simhash_centered_pricing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q297's skew-corrected rung pricing re-run on the CENTERED
    fingerprints (round 11, VERDICT r10 #1 — the 'done' criterion):
    with per-bit thresholds at the corpus mean the vote distributions
    split near 50/50 (q305), so the independent-bits expectation falls
    back toward the uniform floor — ``skew_inflation`` collapses from
    404x/7,798x (q297 at rungs 2/3 on the raw fingerprints) to ~1x,
    i.e. SimHash banding WORKS on this template-collapsed corpus
    instead of merely knowing it doesn't. The pricing body is
    _skew_pricing_frame / _q297_oracle — SHARED verbatim with q297, so
    the two tables can only differ through the fingerprints.

    Lifecycle contract: centered thresholds are corpus statistics —
    an index built on centered fingerprints pins (per-bit vote totals,
    n) in its manifest meta exactly like the rung, and batches
    fingerprint against the pinned thresholds; migrating means
    re-hashing text, which is why the map-only banding permutation
    (q304) exists for indexes that cannot re-hash. Shape: identical to
    q297 — linear, never generates a pair.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = simhash_centered(docs).localCheckpoint(eager=False)
    return _skew_pricing_frame(spark, fp)


# --------------------------------------------------------------------------
# q315 — centered-threshold staleness audit + RE-CENTER migration
# (round 12, VERDICT r11 #3)
# --------------------------------------------------------------------------
@query(
    "q315_center_threshold_drift",
    oracle=f"""
    WITH {_SIMHASH_VOTE_CTES},
    pin AS (
      SELECT bit_idx, SUM(vote) AS s, COUNT(*) AS n
      FROM votes WHERE doc_id % 4 = 0 GROUP BY bit_idx),
    cur AS (
      SELECT bit_idx, SUM(vote) AS s, COUNT(*) AS n
      FROM votes GROUP BY bit_idx),
    bef AS (
      SELECT v.bit_idx,
             SUM(CASE WHEN v.vote * p.n > p.s THEN 1 ELSE 0 END)
               AS n_above,
             COUNT(*) AS n_docs
      FROM votes v JOIN pin p USING (bit_idx) GROUP BY v.bit_idx),
    aft AS (
      SELECT v.bit_idx,
             SUM(CASE WHEN v.vote * c.n > c.s THEN 1 ELSE 0 END)
               AS n_above,
             COUNT(*) AS n_docs
      FROM votes v JOIN cur c USING (bit_idx) GROUP BY v.bit_idx),
    u AS (
      SELECT 'before' AS phase, * FROM bef
      UNION ALL SELECT 'after', * FROM aft)
    SELECT phase,
           CAST(bit_idx AS BIGINT) AS bit_idx,
           CAST(n_above AS BIGINT) AS n_above,
           CAST(n_docs AS BIGINT) AS n_docs,
           {r4('ABS(2.0 * n_above / n_docs - 1.0)')} AS imbalance
    FROM u ORDER BY phase, bit_idx
    """,
    tags=("extension", "dedup", "simhash", "lifecycle", "centered",
          "audit", "migration"),
)
def q315_center_threshold_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Centered-threshold STALENESS audit + re-center migration
    (round 12, VERDICT r11 #3): q311 pins ``simhash_center_s/n`` at
    first-batch build, forever — as the corpus drifts away from that
    first batch the pinned space's balance decays toward q305's raw
    numbers, and round 11 shipped no monitor and no fix. This replay
    drives both new operators end to end:

    1. a corpus is committed and a centered index is built the way a
       gate would: thresholds measured from the FIRST BATCH only
       (``doc_id % 4 = 0``), every document fingerprinted in that
       pinned space, banded at rung 1 under a balanced assignment,
       bucketed layout — the full recommended stack, but with
       thresholds that represent a quarter of the corpus;
    2. ``audit_center_thresholds`` (phase 'before'): per bit, how many
       CURRENT corpus documents set the bit under the PINNED
       thresholds — the q294-style one-aggregate drift monitor;
    3. ``recenter_simhash_index``: thresholds re-measured over the
       members, text re-hashed into the new pinned space, banding
       re-balanced for that space, bucket layout preserved, ONE
       overwrite commit (asserted: meta merged, version bumped, rows
       byte-equal a from-scratch centered build — the q307 bar);
    4. the audit re-runs (phase 'after') — mean imbalance must sit
       inside the SCALING.md re-center bar and not materially regress
       (asserted; not monotone — the mean threshold guarantees
       near-balance, not strict improvement on an undrifted sample),
       and equals by construction the in-plan centered balance q305
       measures;
    5. the boundary contract: a default-constructed
       ``recommended_simhash_gate_batch_writer`` adopts the NEW
       thresholds from the manifest and rejects shifted-id duplicates
       of indexed content (asserted — no corpus growth, no index
       commit).

    The hashed result is both audit frames; the oracle derives them
    from the vote arithmetic alone (pinned = quarter-corpus totals,
    current = full-corpus totals, exact integer ``vote*n > s``).

    Scale: each audit is one token-explode + per-doc vote aggregate +
    one 61-sum reduction — one gate batch's fingerprint cost; the
    re-center is one fingerprint pass + one band explode over the
    members (what the original build paid). Linear; no driver-side
    data (the audit's per-bit rows explode from the single aggregate
    row in-plan).
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from movie_data_pipeline_spark.operators.dedup import (
        measure_balanced_bit_blocks,
        measure_center_thresholds,
        simhash_band_rows,
        simhash_centered_pinned,
    )
    from movie_data_pipeline_spark.operators.index_lifecycle import (
        audit_center_thresholds,
        recenter_simhash_index,
    )
    from movie_data_pipeline_spark.sources.versioned import VersionedTable
    from movie_data_pipeline_spark.streaming.sinks import (
        recommended_simhash_gate_batch_writer,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = _tempfile.mkdtemp(prefix="mdp-q315-")
    corpus_path, index_path = f"{base}/corpus", f"{base}/idx"
    try:
        VersionedTable(corpus_path).commit(docs)
        batch0 = docs.filter(F.col("doc_id") % 4 == 0)
        th0 = measure_center_thresholds(batch0)
        fp_all = simhash_centered_pinned(docs, th0).localCheckpoint(
            eager=False
        )
        blocks0 = measure_balanced_bit_blocks(
            fp_all.join(
                batch0.select("doc_id"), "doc_id", "left_semi"
            )
        )
        rows0 = simhash_band_rows(
            fp_all, rung=1, bit_blocks=blocks0
        ).withColumn("rung", F.lit(1)).withColumn(
            "pbucket", F.expr("CAST(pmod(doc_id, 8) AS INT)")
        )
        VersionedTable(index_path).commit(
            rows0,
            meta={
                "simhash_rung": 1,
                "simhash_bit_blocks": blocks0,
                "simhash_center_s": [int(x) for x in th0["s"]],
                "simhash_center_n": int(th0["n"]),
                "partition_by": "pbucket",
                "bucket_k": 8,
            },
        )

        before = audit_center_thresholds(
            spark, index_path, corpus_path
        ).localCheckpoint(eager=True)

        v = recenter_simhash_index(spark, index_path, corpus_path)
        assert v == 1
        idx_t = VersionedTable(index_path)
        meta2 = idx_t.manifest()["meta"]
        assert meta2["bucket_k"] == 8 and meta2["simhash_rung"] == 1
        assert sorted(meta2["simhash_bit_blocks"]) == list(range(60))

        # The three post-recenter checks are independent READ-ONLY
        # sweeps over the committed v1 state (the boundary writer
        # rejects every shifted-id duplicate, so it commits nothing) —
        # submit them from driver threads so each one's straggler tail
        # back-fills the others (guide §2.6, the q288/q316 pattern;
        # deterministic — threads only overlap job submission).
        def _after_audit() -> DataFrame:
            a = audit_center_thresholds(
                spark, index_path, corpus_path
            ).localCheckpoint(eager=True)
            # The re-centered space must sit well inside the
            # SCALING.md re-center bar (mean imbalance 0.2) and never
            # regress materially vs the stale space. NOT asserted
            # monotone: the mean threshold guarantees near-balance,
            # not a strict improvement — when the pinned sample was
            # already representative (an undrifted quarter),
            # before/after differ only by strict-inequality tie noise.
            mean_b = before.agg(F.avg("imbalance")).first()[0]
            mean_a = a.agg(F.avg("imbalance")).first()[0]
            assert mean_a <= 0.2, (mean_a, mean_b)
            assert mean_a <= mean_b + 0.05, (mean_a, mean_b)
            return a

        def _equality() -> None:
            # byte-equal a from-scratch centered build over the members
            th2 = {
                "s": meta2["simhash_center_s"],
                "n": meta2["simhash_center_n"],
            }
            fresh = simhash_band_rows(
                simhash_centered_pinned(docs, th2),
                rung=1,
                bit_blocks=meta2["simhash_bit_blocks"],
            ).withColumn("rung", F.lit(1)).withColumn(
                "pbucket", F.expr("CAST(pmod(doc_id, 8) AS INT)")
            ).persist()
            # both exceptAll directions scan fresh — the fingerprint
            # subtree is the expensive kind that pays for an explicit
            # materialization (guide §5, the gate-writer finding)
            fresh.count()
            try:
                stored = idx_t.read(spark)
                assert stored.exceptAll(fresh).isEmpty()
                assert fresh.exceptAll(stored).isEmpty()
            finally:
                fresh.unpersist()

        def _boundary() -> None:
            # boundary contract: a zero-tuning writer adopts the new
            # space and rejects shifted-id duplicates of indexed
            # content
            resub = docs.filter(F.col("doc_id") % 9 == 1).withColumn(
                "doc_id", F.col("doc_id") + F.lit(1_000_000_000)
            )
            recommended_simhash_gate_batch_writer(
                corpus_path, index_path
            )(resub, 99)
            assert VersionedTable(corpus_path).current_version() == 0
            assert idx_t.current_version() == 1

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_after = pool.submit(_after_audit)
            f_eq = pool.submit(_equality)
            f_bd = pool.submit(_boundary)
            after = f_after.result()
            f_eq.result()
            f_bd.result()

        result = (
            before.withColumn("phase", F.lit("before"))
            .unionByName(after.withColumn("phase", F.lit("after")))
            .select("phase", "bit_idx", "n_above", "n_docs", "imbalance")
            .orderBy("phase", "bit_idx")
        )
        return result.localCheckpoint(eager=True)
    finally:
        _shutil.rmtree(base, ignore_errors=True)
