"""Embedding similarity-search operators.

Two execution strategies over an ``array<float>`` embedding column:

- **Brute-force top-k** (``cosine_topk``): broadcast the (small) query
  set against the corpus, compute cosine with built-in array lambdas
  (zip_with/aggregate — JVM-side, no Python), rank with a window per
  query. Exact; the right baseline whenever |queries| is small enough to
  broadcast, at any corpus size — the corpus is never shuffled, only
  scanned.
- **LSH-bucketed** (``cosine_topk_lsh``): random-hyperplane signs
  (SimHash for vectors) bucket the corpus; each query only compares
  against its bucket (plus optional multi-probe neighbors). Approximate
  sub-linear scale path: the corpus is hashed once, and the join is an
  equi-join on the bucket key instead of a cross join. Hyperplanes are
  derived deterministically from md5 so results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from movie_data_pipeline_spark.functions.text import base_hash32
from movie_data_pipeline_spark.operators.util import spread


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision (deterministic
    summation order — required for oracle comparison)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _to_double(a), _to_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    ``queries`` is broadcast; the corpus side stays partitioned and is
    scanned once. Ties break on neighbor_id for determinism. Self-pairs
    are excluded.
    """
    # Norms are projected ONCE PER VECTOR below the join — the inline
    # cosine() form re-folds each side's norm per PAIR, i.e. |queries|
    # redundant folds per corpus vector (measured 3-4x on q247's probe).
    # Same expression tree and fold order, so quantized values are
    # bit-identical to the inline form the oracles mirror.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("q_vec"),
    ).select("query_id", "q_vec", l2_norm(F.col("q_vec")).alias("q_norm"))
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("c_vec"),
    ).select(
        "neighbor_id", "c_vec", l2_norm(F.col("c_vec")).alias("c_norm")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 — no
    RNG state, reproducible everywhere."""
    import hashlib

    vals = []
    for j in range(dim):
        h = hashlib.md5(f"plane:{plane_idx}:{j}".encode()).hexdigest()
        vals.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return vals


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes (vector SimHash)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(_to_double(vec), p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane bucketing.

    Corpus and queries are hashed to 2^n_planes buckets; candidates are
    bucket-mates only, so the comparison count drops ~2^n_planes-fold.
    Recall < 1.0 by construction (single-probe); raise recall by
    lowering n_planes or adding multi-probe. Scale: the bucket join is
    a shuffle equi-join — no cross join anywhere.
    """
    planes = [_hyperplane(dim, i) for i in range(n_planes)]
    # per-vector norms projected below the join (see cosine_topk)
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("c_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    ).select(
        "neighbor_id",
        "c_vec",
        "bucket",
        l2_norm(F.col("c_vec")).alias("c_norm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    ).select(
        "query_id",
        "q_vec",
        "bucket",
        l2_norm(F.col("q_vec")).alias("q_norm"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )

def cell_centroids(
    assigned: DataFrame,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """(cell, centroid array): per-cell mean vectors, fully relational.

    posexplode → avg per (cell, dim) → re-assemble the array ordered by
    dim. This is the IVF codebook-refresh step (one Lloyd half-step).
    Scale: one shuffle on (cell, dim); output is cells x dim values —
    always tiny next to the corpus, hence broadcastable downstream.
    """
    exploded = assigned.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(vec_col).alias("dim_idx", "v"),
    )
    per_dim = exploded.groupBy("cell", "dim_idx").agg(
        F.avg(F.col("v").cast("double")).alias("c")
    )
    return (
        per_dim.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim_idx", "c"))).alias("pairs"))
        .select(
            "cell",
            F.transform(F.col("pairs"), lambda p: p.getField("c")).alias("centroid"),
        )
    )


def ivf_assign(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus with a ``cell`` column: Voronoi assignment to seed vectors.

    Seeds are the ``n_cells`` corpus vectors with the lowest md5(id) —
    a deterministic pseudo-random draw (id order would be biased: data
    is often written clustered, and adjacent ids would seed one region).
    No RNG state, no iterative trainer (a k-means codebook can be
    swapped in; the assignment shape is identical). Each vector goes to
    the seed with the highest cosine (ties → lowest seed index).

    Scale: the codebook is collected to the driver — n_cells x dim
    floats, constant-size metadata exactly like any IVF codebook, NOT a
    data collect — and compiled into a per-row argmax expression, so
    assignment is a map-only plan: the corpus is scanned once, nothing
    shuffles. (The earlier cross-join + window formulation shuffled
    corpus x n_cells rows just to pick an argmax.) At deployment, write
    the result bucketed by cell so probe joins are exchange-free.
    """
    seed_rows = (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(n_cells)
        .select(F.col(vec_col).alias("seed_vec"))
        .collect()
    )
    candidates = []
    for i, row in enumerate(seed_rows):
        seed_lit = F.array(*[F.lit(float(v)) for v in row.seed_vec])
        sim = cosine(F.col(vec_col), seed_lit)
        # struct compares lexicographically: sim first, then -index, so
        # array_max picks the highest sim and breaks ties toward the
        # LOWEST seed index.
        candidates.append(F.struct(sim.alias("s"), F.lit(-i).alias("ni")))
    best_cell = (-F.array_max(F.array(*candidates)).getField("ni")).cast("int")
    return spread(corpus).withColumn("cell", best_cell)


def assign_to_centroids(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus with a ``cell`` column: argmax cosine against a GIVEN
    codebook (vs :func:`ivf_assign`, which seeds its own) — the
    re-assignment half of an IVF centroid refresh
    (``operators/index_lifecycle.migrate_ivf_index``).

    Cosines are round4-quantized before the argmax (the q264/q284
    discipline for DERIVED centroids: the means are exact
    DECIMAL(30,6)-to-double, but the cosine fold against them deserves
    a quantization margin before cross-engine comparison); ties break
    toward the lowest cell index. Map-only: the codebook is compiled
    into a per-row argmax expression, nothing shuffles.
    """
    candidates = []
    for i, cvec in enumerate(centroids):
        lit = F.array(*[F.lit(float(v)) for v in cvec])
        sim = F.floor(
            cosine(F.col(vec_col), lit) * F.lit(10000.0) + F.lit(0.5)
        ) / F.lit(10000.0)
        candidates.append(F.struct(sim.alias("s"), F.lit(-i).alias("ni")))
    best_cell = (-F.array_max(F.array(*candidates)).getField("ni")).cast(
        "int"
    )
    return spread(corpus).withColumn("cell", best_cell)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) cell search.

    The corpus is Voronoi-partitioned into ``n_cells`` cells
    (``ivf_assign``); each query scores the cell centroids and probes
    only its ``nprobe`` best cells, comparing against the inverted list
    of those cells — the scan shrinks ~n_cells/nprobe-fold versus brute
    force. nprobe = n_cells degenerates to exact search (asserted in
    tests). Scale: centroids broadcast for probing; the candidate join
    is a shuffle equi-join on cell — never a cross join against the full
    corpus. Recall depends on how clustered the data is; the planted-
    cluster test pins it ≥ 0.9 where real structure exists.
    """
    assigned = ivf_assign(corpus, n_cells, id_col, vec_col)
    cents = cell_centroids(assigned, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc("cell"))
    probed = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "q_vec",
            "cell",
            cosine(F.col("q_vec"), F.col("centroid")).alias("cell_sim"),
        )
        .withColumn("cell_rank", F.row_number().over(wq))
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    # per-vector norms projected below the cell join (see cosine_topk)
    c = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("c_vec"),
    ).select(
        "cell",
        "neighbor_id",
        "c_vec",
        l2_norm(F.col("c_vec")).alias("c_norm"),
    )
    probed_n = probed.select(
        "query_id",
        "cell",
        _to_double(F.col("q_vec")).alias("q_vec"),
    ).select(
        "query_id", "cell", "q_vec", l2_norm(F.col("q_vec")).alias("q_norm")
    )
    scored = (
        c.join(F.broadcast(probed_n), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )
