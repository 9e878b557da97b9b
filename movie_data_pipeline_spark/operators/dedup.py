"""Deduplication operators for large-scale document corpora.

The reference pipeline has no dedup surface; these are the
LLM-data-pipeline extensions (BASELINE.json north star) built
Spark-first:

- exact duplicates: hash-groupBy on the full text (one shuffle on the
  group key; at 100 TB group on a digest column to keep shuffle rows
  narrow — ``exact_duplicates`` does exactly that);
- n-gram Jaccard: shingle → explode → self-equi-join on shingle →
  count — a similarity *join* expressed as joins/aggregates Catalyst
  can plan and AQE can skew-split (hot shingles are the skew risk;
  ``jaccard_pairs`` drops shingles above a document-frequency cap the
  same way web-dedup pipelines drop stop-shingles);
- MinHash signatures + banded LSH: permutation-free affine hash family
  over a 32-bit base hash; signatures in *long* format (doc_id, h_idx,
  min_hash) so the whole pipeline stays relational and
  oracle-verifiable; banding is a group-concat + self-join per band;
- SimHash: bit-majority over token hashes via a tiny broadcast
  bit-index table — two hash aggregates, no UDFs.

Everything is deterministic (md5-based hashing, no seeds) and runs
unchanged from local[32] to a real cluster: the only shuffles are the
explicit groupBy/join keys visible in the code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from movie_data_pipeline_spark.functions.text import (
    base_hash32,
    base_hash60,
    tokens,
    word_shingles,
)
from movie_data_pipeline_spark.operators.util import spread

# Affine MinHash family h_i(x) = (a_i * x + b_i) mod P over the 32-bit
# base hash. P is prime and < 2^31 so a_i * x + b_i stays well inside
# int64. Constants are fixed (not seeded) so signatures are stable
# across runs and engines.
MINHASH_P = 2_038_074_743
NUM_HASHES = 16
LSH_BAND_ROWS = 4  # → 4 bands of 4 rows

# Registered default for ``jaccard_pairs(max_shingle_df=...)`` — the
# document-frequency cap every catalog plan (and its DuckDB oracle)
# applies to the shingle buckets.  Calibrated against q239's
# stop-shingle lexicon: the test corpus's highest-df shingle reaches
# df=25 at sf0.1 (0.5% share), so 1000 is ~40x above the observed knee
# and provably drops NOTHING at any tested scale — while at 100 TB it
# bounds the per-bucket pair blow-up to df*(df-1)/2 <= ~500k pairs per
# stop-shingle instead of quadratic in corpus size (a shingle present
# in >1000 documents is boilerplate, not duplication evidence; real
# copy-clusters are collapsed by exact dedup *before* Jaccard runs).
# q245 driver-verifies the capped code path with a cap that BINDS at
# sf0.01 (see plans/dedup.py).
JACCARD_MAX_SHINGLE_DF = 1000


def minhash_coeffs(k: int = NUM_HASHES) -> list[tuple[int, int, int]]:
    """Deterministic (h_idx, a, b) coefficient table."""
    return [(i, 4801 + 977 * i, 1531 + 683 * i) for i in range(k)]


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct text: representative id + copy count.

    Groups on a 128-bit digest rather than the raw text so the shuffle
    carries 16 bytes per row instead of whole documents — the difference
    between a feasible and an absurd exchange at 100 TB. (md5 collisions
    are negligible at any realistic corpus size.)
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_digest"))
        .agg(
            F.min(id_col).alias("rep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("rep_doc_id", "n_copies")
    )


def doc_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) pairs, distinct per document."""
    df = spread(df)
    return df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Document pairs with n-gram Jaccard similarity ≥ threshold.

    Shape: ONE groupBy(shingle) builds per-shingle doc-id buckets; pairs
    are generated map-side from each bucket's sorted id array (nested
    array transforms in codegen — the same shape as LSH banding) and
    counted per pair, then |A∩B| / (|A|+|B|-|A∩B|). Versus the textbook
    shingle self-join this computes the shingle frame once instead of
    twice and replaces the join's double exchange with a single bucket
    shuffle — measured 5x faster at sf0.1. ``max_shingle_df`` drops
    buckets larger than that many docs (identical semantics to a
    document-frequency cap): at scale a handful of stop-shingles would
    otherwise blow up quadratically — per BUCKET, concentrated on one
    row here rather than spread across join tasks, so the cap is the
    load-bearing mitigation (as it is in every web-dedup pipeline); the
    per-doc set sizes are computed before the cap is applied only in
    the uncapped case (capped runs measure Jaccard over the capped
    shingle sets, matching the previous behavior).

    ``persist`` caches the bucket frame (MEMORY_AND_DISK): both the
    size aggregate and the pair generation consume it, and without a
    cache Catalyst inlines the scan+regex+explode+groupBy subtree into
    each. Re-shingling a 100 TB corpus twice costs far more than
    spilling the bucket frame once. Pass ``persist=False`` for one-shot
    plans that must not hold block-manager state.
    """
    sh = doc_shingles(df, id_col, text_col, n)
    buckets = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    )
    if max_shingle_df is not None:
        buckets = buckets.filter(F.size("ids") <= max_shingle_df)
    if persist:
        from pyspark import StorageLevel

        buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
        # NOT eagerly materialized: measured round 13 — a count()
        # barrier here regressed the consumers (q229 1.18x, q281
        # 1.16x, q288 1.20x, q209 1.10x at sf0.1): the bucket subtree
        # is cheap enough that concurrent cold-cache leaves just use
        # idle cores, while the barrier serializes the whole job
        # (the r12 persist finding again). Contrast ppjoin_pairs,
        # whose wide collect_list arrays DO pay for materialization.
    sizes = (
        buckets.select(F.explode("ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shingles"))
    )
    # sizes feeds both join dims (size_a/size_b below). Measured round
    # 12: caching it REGRESSED q18 2.42->3.26 s and q63 3.72->4.89 s at
    # sf0.1 — the subtree re-reads the already-cached bucket frame, so
    # the second evaluation is cheap, while a persist adds a
    # materialization barrier and cache write traffic. Left uncached
    # deliberately (guide §5: cache only when recomputing costs more
    # than the memory pressure).

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
        buckets.filter(F.size("ids") > 1)
        .select(F.explode(pair_array).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("size_b"))
    # The candidate-pair frame is unbounded in corpus size and must
    # never be the broadcast build side — the static optimizer's
    # estimate of the post-explode aggregate is garbage and promoted it
    # to broadcast at the 10x replica, OOMing the driver (caught by the
    # r6 noop-write probe). SHUFFLE_HASH on the size dims pins a
    # shuffled join with the doc-count-sized size frame as the
    # per-partition hash build (no sort on the pair side).
    return (
        common.join(sa.hint("SHUFFLE_HASH"), "doc_a")
        .join(sb.hint("SHUFFLE_HASH"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures_wide(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """MinHash signatures in wide format: (id, h0..h{k-1}) — one row per
    document, one min() aggregate per hash of the family over the
    shingle hashes (a single shuffle whose rows are k+1 columns wide).
    The preferred input for banding: band signatures become map-side
    column concats with no further aggregation.
    """
    sh = doc_shingles(df, id_col, text_col, n).withColumn(
        "bh", base_hash32(F.col("shingle"))
    )
    return sh.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("bh") + F.lit(b)) % MINHASH_P).alias(f"h{i}")
            for i, a, b in minhash_coeffs(num_hashes)
        ]
    )


def minhash_signatures_long(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """MinHash signatures in long format: (id, h_idx, min_hash).

    One pass: every hash of the family is a separate min() aggregate
    over the shingle hash — the shuffle carries (doc, 16 mins) wide rows
    (k+1 columns per shingle row) instead of exploding shingles × k into
    k-fold more rows; the long format is restored map-side with stack()
    after the aggregate. Long format keeps every step relational — the
    driver oracle reproduces it in pure SQL.
    """
    wide = minhash_signatures_wide(df, id_col, text_col, n, num_hashes)
    stack = "stack({n}, {args}) AS (h_idx, min_hash)".format(
        n=num_hashes,
        args=", ".join(
            f"CAST({i} AS BIGINT), h{i}" for i in range(num_hashes)
        ),
    )
    return wide.select(F.col(id_col), F.expr(stack))


def lsh_candidate_pairs(
    signatures_long: DataFrame,
    id_col: str = "doc_id",
    band_rows: int = LSH_BAND_ROWS,
) -> DataFrame:
    """Candidate near-duplicate pairs from banded MinHash signatures.

    Docs sharing an identical band signature (all ``band_rows`` hashes
    equal) become a candidate pair. The band signature is a group-concat
    string so the bucket key is a single scalar. Buckets are built with
    ONE groupBy over the band rows and pairs are generated map-side from
    each bucket's sorted id array (nested array transforms in codegen) —
    no self-join, so the MinHash pipeline underneath is computed once,
    not twice, and the only shuffles are the bucket build and the final
    cross-band distinct. At scale the band buckets replace the O(n²)
    pair enumeration a brute-force Jaccard would need; a pathological
    bucket (mass-duplicated corpus) grows pairs quadratically in BUCKET
    size only — the same blowup the equivalent self-join would hit — and
    is the signal to tighten band_rows.
    """
    bands = (
        signatures_long.withColumn("band", (F.col("h_idx") / band_rows).cast("long"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("h_idx", "min_hash"))),
                    lambda s: s["min_hash"].cast("string"),
                ),
                ",",
            ).alias("band_sig")
        )
    )
    return _bucket_pairs(bands, id_col)


def _bucket_pairs(bands: DataFrame, id_col: str) -> DataFrame:
    """(band, band_sig, id) rows → distinct candidate (doc_a, doc_b)
    pairs via bucket arrays and map-side pair generation."""
    buckets = (
        bands.groupBy("band", "band_sig")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    ids = F.col("ids")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids) - i - 1),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.doc_a"), F.col("p.doc_b"))
        .distinct()
    )


def lsh_candidate_pairs_wide(
    signatures_wide: DataFrame,
    id_col: str = "doc_id",
    band_rows: int = LSH_BAND_ROWS,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Banded LSH candidates straight from WIDE signatures — the fast
    path. Band signatures are map-side column concats (no aggregation:
    the wide row already holds all k hashes), exploded as (band,
    band_sig) structs; the only shuffles in the whole operator are the
    bucket groupBy and the final distinct. Identical output to
    ``lsh_candidate_pairs`` on the stacked equivalent.
    """
    bands = band_signatures(signatures_wide, id_col, band_rows, num_hashes)
    return _bucket_pairs(bands, id_col)


def band_signatures(
    signatures_wide: DataFrame,
    id_col: str = "doc_id",
    band_rows: int = LSH_BAND_ROWS,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """(id, band, band_sig) frame from WIDE signatures — map-side column
    concats + one explode, no aggregation. This is both the self-join
    input (``lsh_candidate_pairs_wide``) and the storable *index* format
    for incremental dedup (``incremental_lsh_matches``)."""
    n_bands = num_hashes // band_rows
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{b * band_rows + r}").cast("string")
                        for r in range(band_rows)
                    ],
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures_wide.select(
        F.col(id_col), F.explode(band_structs).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))


def incremental_lsh_matches(
    batch_wide: DataFrame,
    corpus_wide: DataFrame,
    id_col: str = "doc_id",
    band_rows: int = LSH_BAND_ROWS,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Incremental dedup: distinct (batch_id, corpus_id) LSH collisions
    of a NEW batch against an EXISTING corpus signature index — the
    production shape of continuous crawl ingestion, where the corpus
    index is precomputed and stored (``band_signatures`` is the storable
    layout) and only the new batch is signed per run.

    The collision check is a plain equi-join on (band, band_sig): the
    corpus side shuffles (or is bucket-pruned when the index is written
    bucketed by band_sig), the batch side is typically orders of
    magnitude smaller. No self-join, no signature recompute over the
    corpus — cost per run is O(|batch|) signing + one key join, vs the
    full self-join's O(|corpus|) recompute. Candidate blowup on hot
    band buckets (boilerplate) is bounded the same way as
    ``jaccard_pairs``'s document-frequency cap — drop band_sig buckets
    above a corpus-frequency threshold before the join at real scale.
    """
    bb = band_signatures(batch_wide, id_col, band_rows, num_hashes).select(
        F.col(id_col).alias("batch_id"), "band", "band_sig"
    )
    cb = band_signatures(corpus_wide, id_col, band_rows, num_hashes).select(
        F.col(id_col).alias("corpus_id"), "band", "band_sig"
    )
    return (
        bb.join(cb, ["band", "band_sig"])
        .select("batch_id", "corpus_id")
        .distinct()
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """Occurrence-weighted SimHash fingerprint per document.

    Each token occurrence votes +1/-1 on every bit of its 60-bit hash;
    the fingerprint sets the bits with a positive sum. All ``bits`` vote
    sums are parallel aggregates in ONE pass over the tokens (wide rows
    through the shuffle, not a bits-fold row blowup); the fingerprint is
    folded map-side after the aggregate. Bit extraction
    ``(h div 2^j) % 2`` uses only integer ops both engines evaluate
    identically.

    60 bits (migrated from 32 in round 8, VERDICT r7 #2): wide enough
    for 4 x 15-bit LSH bands — the 32-bit scheme's 4 x 8-bit bands had
    only 256 values per band, so candidate buckets saturated once a
    shard exceeded ~thousands of docs (measured 10x candidate ratio
    34.5). 60 is the widest multiple of the band layout that keeps the
    fingerprint a positive BIGINT on both engines (2^60 < 2^63).
    """
    votes = _simhash_votes(df, id_col, text_col, bits)
    fingerprint = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select(
        F.col(id_col), fingerprint.cast("long").alias("simhash")
    )


def simhash_centered(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """CENTERED SimHash fingerprint (round 11, VERDICT r10 #1): fixes
    the measured bit skew AT THE SOURCE. q294 shows per-bit set shares
    of 0.01-0.99 on this corpus — a template-collapse signature with a
    twist: the vocabulary is tiny and near-ubiquitous (every token in
    ~78% of documents), so the classic IDF reweighting is inert (every
    weight rounds to zero) and the skew lives in the MEAN of each
    bit's vote distribution, not in which tokens vote. The standard
    fix from learning-to-hash (threshold each projection at its
    corpus-central value, as ITQ/spectral-hashing do) applies
    directly: set bit j iff the document's vote sum exceeds the
    CORPUS MEAN vote for bit j, instead of zero.

    The comparison is exact integer — ``vote_j * n > S_j`` with S_j
    the per-bit vote total — so both engines evaluate it identically
    (no float mean). Balance follows by construction: votes above the
    mean vs below split every bit near 50/50 regardless of how
    template-skewed the raw votes are (measured: mean |share-0.5|
    drops 0.27 -> 0.03 on this corpus, q305; the band-collision floor
    follows, q306). Locality is preserved: a per-bit monotone
    threshold maps near-equal vote vectors to near-equal fingerprints,
    same as the zero threshold.

    Operational contract: the thresholds are CORPUS STATISTICS, so
    like the band rung they are an index-build parameter — a stored
    index pins (S_j, n) in its manifest meta and every later batch
    fingerprints against the PINNED thresholds (re-deriving them per
    batch would silently fork the fingerprint space). The streaming
    gates keep the zero-threshold operator + the
    :func:`balanced_bit_blocks` banding permutation (map-only index
    migration, no re-hash); centered fingerprints are the from-scratch
    build path.

    Scale shape: the same single wide vote aggregate as
    :func:`simhash`, plus one 1-row (61-column) aggregate over the
    vote frame broadcast back — the vote frame is materialized once
    (``spark.movie_data_pipeline.dedup.materialize``) and consumed by
    both. Never a driver-side count.
    """
    votes = _simhash_votes(df, id_col, text_col, bits)
    votes = _materialize_for_reuse(votes)
    totals = votes.agg(
        F.count("*").alias("__n"),
        *[F.sum(f"b{j}").alias(f"s{j}") for j in range(bits)],
    )
    base = votes.crossJoin(F.broadcast(totals))
    fingerprint = None
    for j in range(bits):
        term = F.when(
            F.col(f"b{j}") * F.col("__n") > F.col(f"s{j}"), F.lit(1 << j)
        ).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return base.select(
        F.col(id_col), fingerprint.cast("long").alias("simhash")
    )


def _simhash_votes(
    df: DataFrame, id_col: str, text_col: str, bits: int
) -> DataFrame:
    """Per-document bit-vote sums (doc, b0..b{bits-1}) — the shared
    first stage of :func:`simhash` (zero threshold),
    :func:`simhash_centered` (in-plan mean threshold) and
    :func:`simhash_centered_pinned` (index-pinned thresholds)."""
    toks = spread(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).withColumn(
        "bh",
        base_hash60(F.col("token")) if bits > 32 else base_hash32(F.col("token")),
    )
    return toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.expr(f"(bh div {1 << j}) % 2") == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )


def measure_center_thresholds(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> dict:
    """Measure the centered-SimHash thresholds over a corpus: the
    per-bit vote totals and the document count — the CORPUS STATISTICS
    an index build pins in its manifest meta
    (``simhash_center_s``/``simhash_center_n``) so every later batch
    fingerprints against the SAME thresholds (re-measuring per batch
    would silently fork the fingerprint space — the same failure mode
    as re-picking the band rung per batch). One aggregate; the
    collected row is 61 integers — metadata-sized."""
    row = _simhash_votes(df, id_col, text_col, bits).agg(
        F.count("*").alias("__n"),
        *[F.sum(f"b{j}").alias(f"s{j}") for j in range(bits)],
    ).first()
    if not row["__n"]:
        raise ValueError("cannot measure thresholds on an empty corpus")
    return {
        "s": [int(row[f"s{j}"]) for j in range(bits)],
        "n": int(row["__n"]),
    }


def simhash_centered_pinned(
    df: DataFrame,
    thresholds: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """Centered SimHash fingerprints under PINNED thresholds (from
    :func:`measure_center_thresholds`): bit j set iff
    ``vote_j * n_pinned > s_j_pinned`` — exact integer, identical on
    both engines. This is the batch-side operator of a centered index:
    the thresholds come from the index manifest, not from the batch,
    so fingerprints from any batch live in one consistent space. Same
    single vote aggregate as :func:`simhash`, plus 60 literal
    comparisons folded map-side."""
    s, n = thresholds["s"], int(thresholds["n"])
    if len(s) != bits:
        raise ValueError(f"need {bits} thresholds, got {len(s)}")
    votes = _simhash_votes(df, id_col, text_col, bits)
    fingerprint = None
    for j in range(bits):
        term = F.when(
            F.col(f"b{j}") * F.lit(n) > F.lit(int(s[j])), F.lit(1 << j)
        ).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select(
        F.col(id_col), fingerprint.cast("long").alias("simhash")
    )


# --- SimHash band ladder (round 9, VERDICT r8 #1) -------------------------
# The 60-bit fingerprint splits into 6 ten-bit blocks; a band is the
# concatenation of m distinct blocks and the ladder enumerates ALL
# C(6, m) combinations, with m chosen from the corpus size so band
# buckets never saturate:
#
#   rung m=1:  6 bands x 10 bits (2^10 values)  while n <= 8 * 2^10
#   rung m=2: 15 bands x 20 bits (2^20 values)  while n <= 8 * 2^20
#   rung m=3: 20 bands x 30 bits (2^30 values)  beyond
#
# Pigeonhole per rung: h differing bits touch at most h blocks, so a
# pair is guaranteed caught whenever some m untouched blocks exist —
# i.e. Hamming <= 6-m always collides in >= 1 band. Rung 1 therefore
# catches EVERY Hamming<=5 pair (the verify bar: banding is exact
# there); rung 2 guarantees <=4; rung 3 guarantees <=3 — the same
# floor the retired fixed 4x15 layout had, but with a 2^30 band space
# (32768x larger), so the random-collision floor ~#bands*n^2/2^(10m)
# stays under ~(occupancy target)*#bands*n at every rung instead of
# turning quadratic past ~2^15 docs (the r8 100x probe measured ~15M
# collision-floor candidates at 500k docs; rung 2 predicts ~1.8M, all
# verification-bound). This is Manku/Jain/Sarma WWW'07's table scheme
# (their C(6,3)-style block unions) made size-adaptive.
_SIMHASH_BLOCKS = 6
_SIMHASH_BLOCK_BITS = 10
_SIMHASH_RUNG_TARGET = 8  # band-bucket occupancy target between rungs


def snake_block_of_rank(rank: int, n_blocks: int = _SIMHASH_BLOCKS) -> int:
    """Serpentine (snake) block for the 0-based balance rank: rounds of
    ``n_blocks`` bits alternate direction (0..5, 5..0, ...), the
    standard greedy that balances per-block sums of a sorted sequence.
    ONE definition shared by the Python operator and (as rendered
    integer arithmetic) the in-plan/oracle twins."""
    rnd, pos = divmod(rank, n_blocks)
    return pos if rnd % 2 == 0 else n_blocks - 1 - pos


def balanced_bit_blocks(
    set_counts: list[int], n_docs: int, bits: int = 60
) -> list[int]:
    """Entropy-balanced bit→position assignment (round 11, VERDICT r10
    #1): given the measured per-bit set counts (q294's table), permute
    the fingerprint bits so each 10-bit block carries an even share of
    the corpus's bit skew, instead of whatever ``bit_idx div 10``
    happens to concentrate.

    Why it works: a band's random-collision probability is
    ``prod_{bits j in band} (p_j^2 + (1-p_j)^2)`` — monotone in each
    bit's imbalance ``|2*n_set_j - n|`` — and for a fixed multiset of
    per-bit factors the ladder's total expected collisions (an
    elementary symmetric sum of the per-block products) is MINIMIZED
    when the block products are equal. Sorting bits by imbalance
    descending and snake-assigning them across the 6 blocks is the
    classic greedy for that balance. Because the result is a pure bit
    PERMUTATION into 6 disjoint blocks, every ladder guarantee
    survives verbatim: h differing bits still touch at most h blocks
    (pigeonhole: Hamming <= 6-m always collides at rung m), and
    Hamming distance itself is permutation-invariant, so the exact
    verify bar is untouched — only the random-collision floor drops.

    Determinism is pure-integer: bits rank by (|2*n_set - n| DESC,
    bit_idx ASC); rank r goes to block ``snake(r)`` at slot ``r div
    6``; the new position is ``block*10 + slot``. The same arithmetic
    is rendered in the in-plan Spark/DuckDB twins (plans/dedup.py), so
    all three derivations are bit-identical on the same counts.

    Returns ``positions``: ``positions[bit_idx]`` = the permuted bit
    position (block * 10 + slot). Always a permutation of 0..bits-1.
    """
    if len(set_counts) != bits:
        raise ValueError(
            f"need {bits} per-bit counts, got {len(set_counts)}"
        )
    order = sorted(
        range(bits), key=lambda j: (-abs(2 * set_counts[j] - n_docs), j)
    )
    positions = [0] * bits
    for rank, j in enumerate(order):
        block = snake_block_of_rank(rank)
        slot = rank // _SIMHASH_BLOCKS
        positions[j] = block * _SIMHASH_BLOCK_BITS + slot
    return positions


def measure_balanced_bit_blocks(
    fp: DataFrame, hash_col: str = "simhash", bits: int = 60
) -> list[int]:
    """Measure per-bit set counts over a fingerprint frame and return
    the :func:`balanced_bit_blocks` assignment — the index-build /
    migration entry point. ONE aggregate pass (61 parallel integer
    sums); the collected row is constant-size metadata, the same
    licence as an IVF codebook."""
    row = fp.agg(
        F.count("*").alias("__n"),
        *[
            F.sum(F.expr(f"({hash_col} div {1 << j}) % 2")).alias(f"c{j}")
            for j in range(bits)
        ],
    ).first()
    n = row["__n"]
    if not n:
        raise ValueError("cannot measure bit balance of an empty frame")
    return balanced_bit_blocks(
        [int(row[f"c{j}"]) for j in range(bits)], int(n), bits
    )


def permute_fingerprint(hash_col: str, positions: list[int]) -> Column:
    """Bit-permuted fingerprint: bit j of column ``hash_col`` moves to
    ``positions[j]``. 60 integer shift-free terms, all in codegen —
    the same arithmetic family as the fingerprint fold in
    :func:`simhash`, identical on both engines."""
    if sorted(positions) != list(range(len(positions))):
        raise ValueError("positions must be a permutation of 0..bits-1")
    out = None
    for j, p in enumerate(positions):
        term = F.expr(f"({hash_col} div {1 << j}) % 2") * F.lit(1 << p)
        out = term if out is None else out + term
    return out.cast("long")


def simhash_band_combos() -> list[tuple[int, int, tuple[int, ...]]]:
    """(rung m, GLOBAL band_idx, block indices) for every combination
    the ladder can use — m in {1, 2, 3}, combinations in lexicographic
    order. ONE deterministic table shared verbatim by the Spark plan
    and the rendered oracle SQL (plans/dedup.py), so the two engines
    can never disagree on band layout.

    band_idx is GLOBAL across rungs (rung 1 -> 0-5, rung 2 -> 6-20,
    rung 3 -> 21-40), which makes "band rows from different rungs never
    join" literally true by key inequality — with per-rung indices, a
    rung-2 band whose high block is 0 would produce a band_val < 2^10
    on a shared band_idx and rarely equi-join rung-1 rows. Within one
    rung the global index is a bijection of the per-rung one, so every
    published pair set / bucket statistic is unchanged."""
    import itertools

    out: list[tuple[int, int, tuple[int, ...]]] = []
    idx = 0
    for m in (1, 2, 3):
        for combo in itertools.combinations(range(_SIMHASH_BLOCKS), m):
            out.append((m, idx, combo))
            idx += 1
    return out


def simhash_rung_thresholds() -> tuple[int, int]:
    """(max n for rung 1, max n for rung 2) — fingerprint-count
    breakpoints, occupancy-target * band-value-space, exact integers
    identical in the oracle's CASE."""
    return (
        _SIMHASH_RUNG_TARGET * (1 << _SIMHASH_BLOCK_BITS),
        _SIMHASH_RUNG_TARGET * (1 << (2 * _SIMHASH_BLOCK_BITS)),
    )


def _materialize_for_reuse(df: DataFrame) -> DataFrame:
    """Materialize a frame consumed by multiple plan branches, per the
    session's ``spark.movie_data_pipeline.dedup.materialize`` config:
    ``localCheckpoint`` (default — executor-local MEMORY_AND_DISK
    partitions, freed on plan GC, but lost with a decommissioned
    executor), ``persist`` (replayable lineage — the cluster-safe
    choice under dynamic allocation), or ``none`` (recompute per
    branch)."""
    mode = df.sparkSession.conf.get(
        "spark.movie_data_pipeline.dedup.materialize", "localCheckpoint"
    )
    if mode == "persist":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    if mode == "none":
        return df
    return df.localCheckpoint(eager=False)


def simhash_band_rows(
    sh: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    rung: int | None = None,
    bit_blocks: list[int] | None = None,
) -> DataFrame:
    """(id, fingerprint, band_idx, band_val) — one row per ladder band
    per document; the storable SimHash index layout AND the candidate
    join key of :func:`simhash_hamming_pairs`.

    ``bit_blocks`` (round 11, VERDICT r10 #1) applies an entropy-
    balanced bit permutation (:func:`balanced_bit_blocks`) BEFORE
    banding: band values come from the permuted fingerprint while the
    emitted ``hash_col`` stays the ORIGINAL fingerprint (Hamming is
    permutation-invariant, so exact verification is unchanged). Like
    the rung, the assignment is an index-build parameter — rows banded
    under different assignments never join meaningfully, so a stored
    index pins it in the manifest (``meta.simhash_bit_blocks``) and
    the gate validates it per batch. ``None`` = identity layout
    (bit_idx div 10), bit-for-bit the pre-round-11 band rows.

    ``rung=None`` picks the rung from the in-plan fingerprint count
    (self-join use). An INDEX must pin an explicit rung at build time —
    band rows created under different rungs never join (band_idx is
    globally unique per rung, see :func:`simhash_band_combos`), so a
    gate that bands each arriving batch by the batch's own size would
    silently stop matching its stored index; streaming/sinks.py's
    SimHash gate pins the rung as an index-build parameter AND
    validates it against the manifest's ``meta.simhash_rung`` table
    property on every batch (one JSON read; the stored index's rung
    column is only a legacy fallback for pre-meta indexes).
    """
    t1, t2 = simhash_rung_thresholds()
    if rung is None:
        # The in-plan count and the band explode both consume ``sh``;
        # Spark does not share the subtree across the crossJoin (the
        # count side is column-pruned, so the two exchanges differ and
        # ReuseExchange never fires — ADVICE r9), which evaluated the
        # fingerprint aggregation twice. Materializing it ONCE lets
        # both branches (and the downstream pair self-join) read the
        # cached partitions. Default is a lazy local checkpoint —
        # fastest on a stable cluster, but non-recomputable: local
        # checkpoints die with their executor, so a cluster running
        # dynamic allocation / spot instances should flip
        # ``spark.movie_data_pipeline.dedup.materialize`` to
        # ``persist`` (replayable MEMORY_AND_DISK lineage) or ``none``
        # (recompute twice, zero block-manager state) — ADVICE r10.
        sh = _materialize_for_reuse(sh)
        n1 = sh.agg(F.count("*").alias("__n_fp"))
        rung_col = (
            F.when(F.col("__n_fp") <= t1, 1)
            .when(F.col("__n_fp") <= t2, 2)
            .otherwise(3)
        )
        base = sh.crossJoin(F.broadcast(n1)).withColumn("__rung", rung_col)
    else:
        base = sh.withColumn("__rung", F.lit(int(rung)))
    band_src = hash_col
    if bit_blocks is not None:
        base = base.withColumn(
            "__permfp", permute_fingerprint(hash_col, bit_blocks)
        )
        band_src = "__permfp"
    return (
        _band_explode(base, id_col, band_src)
        .filter(F.col("rung") == F.col("__rung"))
        .select(id_col, hash_col, "band_idx", "band_val")
    )


def _band_explode(
    frame: DataFrame, id_col: str, hash_col: str
) -> DataFrame:
    """THE one compiled form of the combo table: explode every ladder
    band over ``frame`` -> (.., rung, band_idx, band_val). Both public
    band-row builders compose this, so the layout q290 prices is BY
    CONSTRUCTION the layout simhash_hamming_pairs joins on (the oracle
    twin is factored the same way in plans/dedup.py)."""
    bb, nb = _SIMHASH_BLOCK_BITS, _SIMHASH_BLOCKS
    blks = F.array(
        *[
            F.expr(f"({hash_col} div {1 << (bb * j)}) % {1 << bb}")
            for j in range(nb)
        ]
    )
    combos = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.lit(i).alias("band_idx"),
                F.lit(c[0]).alias("j1"),
                F.lit(c[1] if len(c) > 1 else -1).alias("j2"),
                F.lit(c[2] if len(c) > 2 else -1).alias("j3"),
            )
            for (m, i, c) in simhash_band_combos()
        ]
    )
    keep = [c for c in frame.columns if c != "__blks"]
    return frame.select(
        *keep,
        blks.alias("__blks"),
        F.explode(combos).alias("cb"),
    ).select(
        *keep,
        F.col("cb.m").alias("rung"),
        F.col("cb.band_idx").alias("band_idx"),
        (
            F.expr("element_at(__blks, cb.j1 + 1)")
            + F.when(
                F.col("cb.j2") >= 0,
                F.expr("element_at(__blks, cb.j2 + 1)") * F.lit(1 << bb),
            ).otherwise(F.lit(0))
            + F.when(
                F.col("cb.j3") >= 0,
                F.expr("element_at(__blks, cb.j3 + 1)")
                * F.lit(1 << (2 * bb)),
            ).otherwise(F.lit(0))
        ).alias("band_val"),
    )


def simhash_band_rows_all_rungs(
    sh: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    bit_blocks: list[int] | None = None,
) -> DataFrame:
    """Band rows for EVERY ladder rung at once — (id, fingerprint,
    rung m, band_idx, band_val), 41 rows per document — so a rung
    planner (q290) can price all three candidate-generation layouts
    over the real corpus in ONE pass instead of three. Shares
    :func:`_band_explode` with :func:`simhash_band_rows`, so the two
    can never diverge. ``bit_blocks`` bands the permuted fingerprint
    (emitted ``hash_col`` stays original), exactly as in
    :func:`simhash_band_rows`."""
    base = sh.select(id_col, hash_col)
    band_src = hash_col
    if bit_blocks is not None:
        base = base.withColumn(
            "__permfp", permute_fingerprint(hash_col, bit_blocks)
        )
        band_src = "__permfp"
    return _band_explode(base, id_col, band_src).select(
        id_col, hash_col, "rung", "band_idx", "band_val"
    )


def simhash_hamming_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    max_hamming: int = 5,
    rung: int | None = None,
    bit_blocks: list[int] | None = None,
) -> DataFrame:
    """Near-duplicate pairs from SimHash fingerprints: size-adaptive
    banded candidate generation + exact Hamming verification.
    ``bit_blocks`` applies the entropy-balanced band permutation to
    candidate GENERATION only — the verify bar is the exact popcount
    of the ORIGINAL fingerprints, which a bit permutation cannot
    change, so every guaranteed pair (Hamming <= 6-rung) survives
    identically and only the random-collision floor moves.

    Candidates come from the block-combination band ladder (module
    comment above): the fingerprint count n — aggregated IN-PLAN and
    broadcast, never a driver-side count (the q285 discipline) — picks
    rung m, every C(6, m) block combination becomes one band, and two
    documents are candidates iff they agree on at least one band.
    Candidates are verified with the exact popcount of the XOR and kept
    when ``hamming <= max_hamming``.

    Round-9 migration (VERDICT r8 #1): the fixed 4 x 15-bit layout's
    2^15-value band space made the random-collision floor grow
    ~n^2/2^15 (measured ~15M banded candidates at 500k docs); the
    ladder keeps expected collisions under ~8 per doc per band at any
    corpus size by widening bands as n grows, while rung 1 — active at
    every driver SF — is EXACT for the Hamming<=5 bar (pigeonhole over
    6 blocks), so the published pair sets got strictly more faithful.
    ``rung`` forces a specific rung for tests/audits; leave None in
    production plans.

    Scale: the shuffle key is the (band_idx, band_val) pair — #bands
    rows per document (6/15/20 by rung), never a cross join. A
    degenerate band value shared by many documents is the skew risk
    (same as LSH buckets); AQE skew-join splits it. Verification is
    integer XOR+popcount inside codegen — no Python, no second shuffle
    (the fingerprints travel with the band rows).
    """
    band_rows = simhash_band_rows(
        sh, id_col=id_col, hash_col=hash_col, rung=rung,
        bit_blocks=bit_blocks,
    )
    a, b = band_rows.alias("a"), band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col(f"a.{hash_col}").alias("sh_a"),
            F.col(f"b.{hash_col}").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("CAST(bit_count(sh_a ^ sh_b) AS BIGINT)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _ceil_ratio_mul(num: int, den: int, s: Column) -> Column:
    """Exact ``ceil(num/den * s)`` for a non-negative integer column,
    computed as ``(num*s + den - 1) div den`` in integer arithmetic —
    no float product, so boundary values (num/den * s an exact integer)
    can never round the ceiling up a step. The double division inside
    ``F.floor`` is exact at these magnitudes (operands < 2^53, quotient
    ~|s|, ulp << 1/den)."""
    return F.floor((F.lit(num) * s + F.lit(den - 1)) / F.lit(den)).cast(
        "long"
    )


def ppjoin_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact set-similarity self-join via prefix filtering (PPJoin
    family: Chaudhuri et al. SSJoin 2006; Bayardo et al. All-Pairs
    2007; Xiao et al. PPJoin 2008): all document pairs whose shingle-set
    Jaccard is ≥ ``threshold`` — NO candidate loss, unlike the
    document-frequency cap in :func:`jaccard_pairs`.

    The filter: order every document's shingle set by a single global
    total order — document frequency ascending, shingle string as the
    tie-break — and keep only each document's *prefix*, the first
    ``|s| - ceil(t*|s|) + 1`` shingles. Any pair with Jaccard ≥ t must
    share at least ``ceil(t*|s|)`` elements with the other set, so by
    pigeonhole at least one shared shingle falls inside BOTH prefixes;
    generating candidates from prefix buckets alone is therefore
    lossless. Because the global order is df-ascending, prefixes
    concentrate on the RAREST shingles — bucket sizes shrink instead of
    exploding, which is what makes this the exact-answer scale path
    when a df cap (lossy) is not acceptable.

    Plan shape: one groupBy(shingle) for document frequencies, one
    per-document window (partitioned by ``id_col`` — bounded by tokens
    per document, never by corpus size) for the prefix ranks, one
    groupBy(shingle) on the prefix entries building sorted
    (doc, pos, size) bucket arrays with map-side pair generation (same
    codegen shape as LSH banding) under PPJoin's two additional
    LOSSLESS prunes — the length filter ``min(|A|,|B|) >=
    ceil(t*max(|A|,|B|))`` and the positional filter (overlap upper
    bound from the matching prefix positions vs the required
    ``ceil(t/(1+t)*(|A|+|B|))``) — then verification against
    per-document sorted shingle arrays with ``array_intersect`` —
    exact intersection counts, JVM-side, no Python. Candidates are
    deliberately NOT distinct'd before verification (see inline note);
    measured together the in-bucket prunes + late dedup halve the
    query at sf0.1 (12.3s → 6.3s). Worst case remains quadratic per
    prefix bucket, as in every exact algorithm; the df-ascending
    prefix order is the published mitigation and the reason the
    textbook algorithm scales.
    """
    from fractions import Fraction

    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    # Every pruning bound below is a ceiling of (rational * integer).
    # Computing them as F.ceil(double product) risks float rounding
    # flipping the ceil at exact-integer boundaries (e.g. t=0.5,
    # |s|=10: 0.5*10 could evaluate 5.000000000000001 → ceil 6), which
    # would shorten the prefix below the lossless minimum and silently
    # drop candidates. Instead express t as an exact rational num/den
    # (from its decimal literal) and compute each ceiling in integer
    # arithmetic: ceil(num*s/den) = (num*s + den - 1) div den. The
    # double division inside F.floor is exact for these magnitudes
    # (operands < 2^53, quotient ~|s|, ulp << 1/den).
    t_frac = Fraction(str(threshold)).limit_denominator(1_000_000)
    t_num, t_den = t_frac.numerator, t_frac.denominator

    def _ceil_t_times(s: Column) -> Column:
        """Exact ceil(threshold * s) for a non-negative integer column."""
        return _ceil_ratio_mul(t_num, t_den, s)

    def _ceil_alpha(total: Column) -> Column:
        """Exact ceil(t/(1+t) * total): t/(1+t) = num/(num+den)."""
        return _ceil_ratio_mul(t_num, t_num + t_den, total)

    # Three consumers (document frequencies, prefix ranking, the
    # verification arrays) read the shingle frame; persist it or each
    # re-runs the scan+regex+explode subtree (same rationale as
    # jaccard_pairs' bucket persist — measured ~2x on the whole query).
    sh = doc_shingles(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Materialize before the multi-leaf consumers (round 13, guide §5):
    # sh feeds the df-rank join on both sides AND the verification
    # arrays — cold-cache leaves race and re-shingle otherwise.
    sh.count()
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("sh_df"))
    per_doc = Window.partitionBy(id_col)
    ranked = (
        sh.join(dfreq, "shingle")
        .select(
            id_col,
            "shingle",
            F.row_number()
            .over(per_doc.orderBy("sh_df", "shingle"))
            .alias("pos"),
            F.count("*").over(per_doc).alias("set_size"),
        )
    )
    prefix_len = (
        F.col("set_size")
        - _ceil_t_times(F.col("set_size"))
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("pos") <= prefix_len)

    # Bucket entries carry (doc, pos, set_size) so the pair generator
    # can apply PPJoin's two LOSSLESS in-bucket prunes before anything
    # shuffles:
    #  - length filter: J >= t forces min(|A|,|B|) >= t * max(|A|,|B|);
    #  - positional filter (PPJoin Lemma 1): the overlap reachable from
    #    a common prefix token at positions (pa, pb) is at most
    #    1 + min(|A| - pa, |B| - pb), and J >= t requires overlap
    #    >= ceil(t/(1+t) * (|A|+|B|)).
    # Both are arithmetic on bucket-local struct fields — evaluated in
    # codegen during map-side pair generation, so pruned pairs never
    # reach the distinct's exchange (the dominant cost on fat-headed
    # shingle distributions where the prefix filter alone is weak).
    ids = F.col("ids")

    def _maybe_pair(x: Column, y: Column) -> Column:
        alpha = _ceil_alpha(x["sz"] + y["sz"])
        ubound = F.lit(1) + F.least(x["sz"] - x["pos"], y["sz"] - y["pos"])
        len_ok = F.least(x["sz"], y["sz"]) >= _ceil_t_times(
            F.greatest(x["sz"], y["sz"])
        )
        return F.when(
            len_ok & (ubound >= alpha),
            F.struct(x["doc"].alias("doc_a"), y["doc"].alias("doc_b")),
        ).otherwise(F.lit(None))

    pair_array = F.filter(
        F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.slice(ids, i + 2, F.size(ids) - i - 1),
                    lambda y: _maybe_pair(x, y),
                ),
            )
        ),
        lambda p: p.isNotNull(),
    )
    cand = (
        prefix.groupBy("shingle")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("doc"),
                        F.col("pos").alias("pos"),
                        F.col("set_size").alias("sz"),
                    )
                )
            ).alias("ids")
        )
        .filter(F.size("ids") > 1)
        .select(F.explode(pair_array).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
    )
    # NOT distinct'd here: a pair surviving the filters appears once per
    # shared prefix shingle (small multiplicity), and deduping now would
    # shuffle the full candidate stream. The verify join processes the
    # duplicates (identical rows → identical jaccard) and the final
    # distinct runs on the thresholded survivors — orders of magnitude
    # fewer rows than the candidate stream.

    arrs = (
        sh.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list("shingle")).alias("arr"),
            F.count("*").alias("sz"),
        )
        # both verify dims (arr_a and arr_b) consume this frame on
        # DIFFERENT join keys, so the exchanges cannot be reused and
        # the collect_list+sort aggregate ran twice from the cached
        # shingle frame; cached it is built once (guide §2.4)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Materialize: the single verify action scans arrs at two leaves
    # (doc_a and doc_b dims) — populate the cache once (round 13, §5).
    arrs.count()
    verified = (
        cand.join(
            arrs.select(
                F.col(id_col).alias("doc_a"),
                F.col("arr").alias("arr_a"),
                F.col("sz").alias("sz_a"),
            ),
            "doc_a",
        )
        .join(
            arrs.select(
                F.col(id_col).alias("doc_b"),
                F.col("arr").alias("arr_b"),
                F.col("sz").alias("sz_b"),
            ),
            "doc_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )
    # Bound the caches' lifetime (§5 hygiene, VERDICT r12 #10): the
    # thresholded survivor set is orders of magnitude smaller than the
    # candidate stream, so materialize it eagerly (executor-local
    # checkpoint — nothing moves through the driver) and release the
    # shingle + verification-array persists; a long-lived session no
    # longer accumulates MEMORY_AND_DISK blocks per call.
    out = (
        verified.select("doc_a", "doc_b", "jaccard")
        .distinct()
        .localCheckpoint(eager=True)
    )
    arrs.unpersist()
    sh.unpersist()
    return out


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """DIRECTIONAL near-duplicate pairs by shingle-set containment
    ``|A∩B| / |A|`` ≥ threshold — the asymmetric complement to
    :func:`jaccard_pairs`. Jaccard misses subset duplication by
    construction (a paragraph quoted inside a 100x larger document has
    Jaccard ≈ 0.01 but containment 1.0); containment is the signal for
    quote/excerpt/boilerplate-inclusion detection in corpus curation.

    Same single bucket-shuffle shape as ``jaccard_pairs`` (per-shingle
    sorted id arrays, map-side pair generation, optional stop-shingle
    document-frequency cap): the shared-shingle count per unordered
    pair is computed once, then projected into BOTH directions and
    thresholded against each source's own set size. Emits
    (src_doc, dst_doc, containment) — src's shingles are covered by
    dst to the stated fraction.
    """
    sh = doc_shingles(df, id_col, text_col, n)
    buckets = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    )
    if max_shingle_df is not None:
        buckets = buckets.filter(F.size("ids") <= max_shingle_df)
    from pyspark import StorageLevel

    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = (
        buckets.select(F.explode("ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shingles"))
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
        buckets.filter(F.size("ids") > 1)
        .select(F.explode(pair_array).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("size_b"))
    # same rule as jaccard_pairs: pair frames never broadcast
    both = common.join(sa.hint("SHUFFLE_HASH"), "doc_a").join(
        sb.hint("SHUFFLE_HASH"), "doc_b"
    )
    # Both directions are emitted map-side from ONE evaluation of the
    # pair+size join (guide §2.4): the old fwd/rev unionAll inlined the
    # whole common+joins subtree twice — the pair generation and both
    # size joins ran again for the reverse direction. An inline
    # 2-element explode keeps the same rows at half the work.
    directions = F.array(
        F.struct(
            F.col("doc_a").alias("src_doc"),
            F.col("doc_b").alias("dst_doc"),
            (F.col("n_common") / F.col("size_a")).alias("containment"),
        ),
        F.struct(
            F.col("doc_b").alias("src_doc"),
            F.col("doc_a").alias("dst_doc"),
            (F.col("n_common") / F.col("size_b")).alias("containment"),
        ),
    )
    return (
        both.select(F.explode(directions).alias("e"))
        .select("e.*")
        .filter(F.col("containment") >= F.lit(threshold))
    )
