"""Advanced relational coverage: subquery shapes, multi-dim grouping,
window frames, and set operations (SURVEY.md §2.3-2.7 completions).

These close out the SQL-surface operator classes the reference's
documented query set implies but q01-q40 had not yet exercised as
first-class, oracle-gated queries:

- EXISTS / semi-join (q41) and correlated scalar-subquery
  decorrelation (q42) — the two classic subquery rewrites;
- CUBE (q43) and GROUPING SETS (q48) — completing the rollup family
  started by q31;
- frame-based moving window aggregate (q44) and percent_rank (q47);
- INTERSECT (q45) and UNION ALL conformance (q46) — completing the set
  operations started by q11 (EXCEPT) and q07 (anti join).

All cross-engine invariants from :mod:`.relational` apply: aligned
aliases, ``round4``/``exact_sum`` (never engine ROUND / raw double
SUM), BIGINT casts, explicit total orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movie_data_pipeline_spark.plans.core import (
    exact_sum,
    exact_sum_sql,
    query,
    r4,
    round4,
)
from movie_data_pipeline_spark.sources.registry import load_table


# --------------------------------------------------------------------------
# q41 — EXISTS → left-semi join  (SURVEY §2.3; TPC-H Q4 shape)
# --------------------------------------------------------------------------
@query(
    "q41_priority_with_returns",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("parity", "semi-join", "subquery"),
)
def q41_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority that have at least one returned lineitem.

    The EXISTS subquery is expressed as a ``left_semi`` join — Spark's
    native decorrelation, which never duplicates the probe side no
    matter how many matching lineitems exist. Scale: both sides shuffle
    on l_orderkey/o_orderkey (co-partitioned sort-merge semi); the
    returnflag filter is pushed to the lineitem scan so only ~25% of the
    fact table reaches the exchange, and the build side carries a single
    column. No distinct is needed before the semi join (semi join
    deduplicates by construction).
    """
    orders = load_table(spark, sf_dir, "orders")
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q42 — correlated scalar subquery → decorrelated agg join (TPC-H Q17 shape)
# --------------------------------------------------------------------------
@query(
    "q42_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                   / COUNT(*) AS avg_qty
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT p_brand,
           COUNT(*) AS n_small,
           {r4(exact_sum_sql("l_extendedprice"))} AS small_revenue
    FROM lineitem li
    JOIN pa ON pa.l_partkey = li.l_partkey
    JOIN part ON p_partkey = li.l_partkey
    WHERE l_quantity < 0.5 * avg_qty
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("parity", "subquery", "decorrelation"),
)
def q42_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems below half their part's average quantity.

    The correlated scalar subquery (``l_quantity < 0.5 * (SELECT
    AVG(l_quantity) ... WHERE same part)``) is decorrelated into a
    per-part aggregate joined back on l_partkey — one extra shuffle of a
    two-column aggregate instead of a per-row subquery. Scale: the agg
    and the join share the l_partkey partitioning, so AQE plans the join
    exchange-free on the agg side; part is dimension-sized → broadcast.
    Cross-engine determinism: avg is computed as exact decimal SUM /
    COUNT so both engines derive bit-identical doubles before the
    comparison (a raw double AVG is accumulation-order-dependent and
    can flip rows at the boundary).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = lineitem.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        lineitem.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            round4(exact_sum(F.col("l_extendedprice"))).alias("small_revenue"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# q43 — CUBE  (completes the q31 ROLLUP family)
# --------------------------------------------------------------------------
@query(
    "q43_cube_order_stats",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           COUNT(*) AS n,
           {r4(exact_sum_sql("o_totalprice"))} AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY orderstatus, orderpriority
    """,
    tags=("parity", "cube", "aggregate"),
)
def q43_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four grouping combinations of (status, priority) in one pass.

    ``cube`` expands each input row to its 2^2 grouping-set variants
    before a single hash aggregate — one shuffle for all subtotals
    instead of four separate groupBy jobs reading the fact table four
    times. Scale: expansion happens map-side and partial aggregation
    collapses it before the exchange, so shuffled bytes stay bounded by
    the (tiny) group cardinality, not 4x the input. The grouping columns
    contain no source NULLs (synthetic schema), so COALESCE('ALL')
    labels subtotal rows unambiguously.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            round4(exact_sum(F.col("o_totalprice"))).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "revenue",
        )
        .orderBy("orderstatus", "orderpriority")
    )


# --------------------------------------------------------------------------
# q44 — frame-based moving window aggregate  (SURVEY §2.5)
# --------------------------------------------------------------------------
@query(
    "q44_moving_avg_order_price",
    oracle="""
    SELECT o_orderkey, o_custkey,
           floor((CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE)
                  / COUNT(*) OVER w) * 10000 + 0.5) / 10000 AS mov_avg_price
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
    )
    ORDER BY o_orderkey
    """,
    tags=("parity", "window", "frame"),
)
def q44_moving_avg_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-order trailing average price per customer.

    A ROWS-frame window: one shuffle on o_custkey, then a per-partition
    sort and a sliding frame — no self-join. Scale: state per partition
    is the 3-row frame, O(1) memory per group regardless of group size;
    skewed customers are bounded by AQE partition splitting. Determinism:
    the frame sum is exact decimal (DuckDB evaluates windowed aggregates
    via segment trees whose combine order differs from Spark's running
    accumulator — exact decimal arithmetic is order-free), the divide
    happens in double on bit-identical inputs, and the frame order
    carries an o_orderkey tiebreak.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    mov_avg = (
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            round4(mov_avg).alias("mov_avg_price"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# q45 — INTERSECT  (completes set ops: q11 EXCEPT, q07 anti)
# --------------------------------------------------------------------------
@query(
    "q45_rich_open_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY c_custkey
    """,
    tags=("parity", "setop", "intersect"),
)
def q45_rich_open_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with >5000 balance who also have an open order.

    SQL INTERSECT == ``DataFrame.intersect`` (set semantics, implicit
    dedup on both sides). Scale: Catalyst plans it as an aggregate +
    left-semi join on the single key column; both inputs are filtered
    and pruned to one column before the exchange, so the shuffle carries
    8 bytes/row. Equivalent hand-written form: distinct + left_semi —
    the built-in keeps the plan declarative.
    """
    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    open_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.intersect(open_orders).orderBy("c_custkey")


# --------------------------------------------------------------------------
# q46 — UNION ALL schema conformance + aggregate  (SURVEY §2.7 U2)
# --------------------------------------------------------------------------
@query(
    "q46_unified_money_flow",
    oracle=f"""
    SELECT src,
           COUNT(*) AS n,
           {r4(exact_sum_sql("amount"))} AS total
    FROM (
        SELECT 'order' AS src, o_totalprice AS amount FROM orders
        UNION ALL
        SELECT 'line' AS src, l_extendedprice AS amount FROM lineitem
    )
    GROUP BY src
    ORDER BY src
    """,
    tags=("parity", "setop", "union"),
)
def q46_unified_money_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two heterogeneous sources conformed to one schema, then aggregated.

    ``unionByName`` after projecting both sides to (src, amount) — the
    standard conform-then-union shape for merging fact tables. Scale:
    UNION ALL is a zero-shuffle concatenation of partitions; the single
    aggregate on a 2-value key does a map-side partial combine, so the
    exchange moves a handful of rows however large the inputs are.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.lit("order").alias("src"), F.col("o_totalprice").alias("amount")
    )
    lines = load_table(spark, sf_dir, "lineitem").select(
        F.lit("line").alias("src"), F.col("l_extendedprice").alias("amount")
    )
    return (
        orders.unionByName(lines)
        .groupBy("src")
        .agg(
            F.count("*").alias("n"),
            round4(exact_sum(F.col("amount"))).alias("total"),
        )
        .orderBy("src")
    )


# --------------------------------------------------------------------------
# q47 — percent_rank  (SURVEY §2.5 analytic-rank family)
# --------------------------------------------------------------------------
@query(
    "q47_balance_percentile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           floor((PERCENT_RANK() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal, c_custkey
           )) * 10000 + 0.5) / 10000 AS balance_pct
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("parity", "window", "rank"),
)
def q47_balance_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's balance percentile within their market segment.

    percent_rank = (rank-1)/(n-1): pure integer inputs, so the double
    result is bit-identical across engines — no rounding dependence on
    accumulation order. The c_custkey tiebreak makes ranks (and
    therefore percentiles) fully deterministic even under duplicate
    balances. Scale: one shuffle on c_mktsegment + per-partition sort;
    low-cardinality segment keys are the known skew case — at 100 TB
    this flips to the q40-documented distributed-quantile path rather
    than a 5-partition sort.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        customer.select(
            "c_custkey",
            "c_mktsegment",
            round4(F.percent_rank().over(w)).alias("balance_pct"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# q48 — GROUPING SETS  (explicit set list, distinct from ROLLUP/CUBE)
# --------------------------------------------------------------------------
@query(
    "q48_grouping_sets_orders",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((r_name), (o_orderpriority))
    ORDER BY region_name, priority
    """,
    tags=("parity", "grouping-sets", "aggregate"),
)
def q48_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts by region AND by priority in one scan.

    Native ``DataFrame.groupingSets`` (Spark 4.0+): the join pipeline
    runs once and both groupings share the expand + single hash
    aggregate — versus two full scans and two shuffles for separate
    groupBys. Scale: the dim chain (region→nation→customer) is
    broadcast so the only wide exchange is the 2x-expanded aggregate,
    collapsed map-side to ~30 output groups.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        orders.join(
            F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupingSets(
            [["r_name"], ["o_orderpriority"]], "r_name", "o_orderpriority"
        )
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
        .orderBy("region_name", "priority")
    )


# --------------------------------------------------------------------------
# q49 — date spine + zero-fill  (sequence/explode scaffolding)
# --------------------------------------------------------------------------
@query(
    "q49_daily_order_spine",
    oracle=f"""
    WITH b AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
               CAST(MAX(o_orderdate) AS DATE) AS d1
        FROM orders
    ),
    spine AS (
        SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM b
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS n,
               {r4(exact_sum_sql("o_totalprice"))} AS rev
        FROM orders
        GROUP BY 1
    )
    SELECT strftime(spine.day, '%Y-%m-%d') AS day,
           COALESCE(n, 0) AS n_orders,
           COALESCE(rev, 0.0) AS revenue
    FROM spine LEFT JOIN daily ON daily.day = spine.day
    ORDER BY day
    """,
    tags=("parity", "spine", "zero-fill"),
)
def q49_daily_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous daily order counts with gap days zero-filled.

    The calendar spine is generated from the data itself:
    ``sequence(min_date, max_date)`` on the 1-row bounds aggregate,
    exploded to one row per day, then left-joined to per-day aggregates.
    Scale: the spine is O(days) — thousands of rows for decades of data
    — so the join broadcasts the spine against the pre-aggregated daily
    frame (itself already collapsed map-side); the full fact table is
    scanned exactly once, projecting two columns. NTZ timestamps make
    CAST-to-date identical in any session timezone.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n"),
        round4(exact_sum(F.col("o_totalprice"))).alias("rev"),
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_orders"),
            F.coalesce(F.col("rev"), F.lit(0.0)).alias("revenue"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# q50 — uncorrelated scalar subquery: share of global total
# --------------------------------------------------------------------------
@query(
    "q50_status_revenue_share",
    oracle="""
    WITH s AS (
        SELECT o_orderstatus,
               SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev_dec
        FROM orders
        GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           floor((CAST(rev_dec AS DOUBLE)) * 10000 + 0.5) / 10000 AS revenue,
           floor((CAST(rev_dec AS DOUBLE)
                  / CAST((SELECT SUM(rev_dec) FROM s) AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS share
    FROM s
    ORDER BY o_orderstatus
    """,
    tags=("parity", "subquery", "normalization"),
)
def q50_status_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order status's share of total revenue (global normalization).

    The uncorrelated scalar subquery ``x / (SELECT SUM(..))`` is the
    universal normalization shape (probability mass, TF-IDF corpus
    totals, traffic share). Spark form: aggregate once per status, then
    a partition-less window sum over the already-aggregated frame — the
    grand total is computed from ~3 rows, not by re-scanning the fact
    table, and no driver-side collect is involved. Exact decimal sums on
    both levels make numerator and denominator bit-identical across
    engines before the double divide.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("rev_dec")
    )
    total = F.sum("rev_dec").over(Window.partitionBy())
    return (
        per_status.select(
            "o_orderstatus",
            round4(F.col("rev_dec").cast("double")).alias("revenue"),
            round4(
                F.col("rev_dec").cast("double") / total.cast("double")
            ).alias("share"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# q51 — SCD type-2 interval build  (change-point → version → valid_from/to)
# --------------------------------------------------------------------------
@query(
    "q51_user_type_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seg AS (
        SELECT user_id, ts, event_type,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
        FROM ordered
    ),
    spans AS (
        SELECT user_id,
               CAST(version AS BIGINT) AS version,
               event_type,
               MIN(ts) AS valid_from,
               COUNT(*) AS n_events
        FROM seg
        GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to,
           n_events
    FROM spans
    ORDER BY user_id, version
    """,
    tags=("parity", "scd2", "window"),
)
def q51_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history of each user's event type.

    The standard warehouse versioning build: detect change points with
    lag, turn them into version numbers with a running sum, collapse
    runs to [valid_from, valid_to) intervals with lead — the same
    islands-and-gaps machinery as q34's sessionization, producing a
    queryable history table instead of sessions. The open (current)
    interval has valid_to NULL. Scale: three window passes share one
    shuffle + sort on user_id (Catalyst reuses the partitioning; the
    final lead runs on the already-collapsed spans frame, orders of
    magnitude smaller than the input). No self-join, no driver loops.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    seg = events.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(chg)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("version"),
    )
    spans = seg.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return (
        spans.select(
            "user_id",
            "version",
            "event_type",
            "valid_from",
            F.lead("valid_from").over(wv).alias("valid_to"),
            "n_events",
        )
        .orderBy("user_id", "version")
    )


# --------------------------------------------------------------------------
# q52 — null-safe equality join  (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------
@query(
    "q52_nullsafe_nation_pairs",
    oracle="""
    SELECT COALESCE(NULLIF(c.c_nationkey, 0), -1) AS nation_bucket,
           COUNT(*) AS n_pairs
    FROM customer c
    JOIN supplier s
      ON NULLIF(c.c_nationkey, 0) IS NOT DISTINCT FROM NULLIF(s.s_nationkey, 0)
    GROUP BY nation_bucket
    ORDER BY nation_bucket
    """,
    tags=("parity", "join", "null-safe"),
)
def q52_nullsafe_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-supplier pairs joined null-safely on a nullable key.

    NULLIF derives a genuinely nullable key (nation 0 → NULL on both
    sides); the null-safe equality ``<=>`` (SQL: IS NOT DISTINCT FROM)
    matches NULL with NULL — a plain equi-join would silently drop that
    entire bucket. Spark keeps ``eqNullSafe`` hash-joinable (NULL hashes
    to a regular bucket), so this stays a broadcast/shuffled hash join,
    not the nested-loop fallback a ``OR (a IS NULL AND b IS NULL)``
    rewrite would force. Scale caveat documented: a null-safe key
    funnels ALL nulls to one partition — the q-series skew toolkit
    (operators/skew.py) applies when the null fraction is material.
    """
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    ck = F.nullif(F.col("c_nationkey"), F.lit(0))
    sk = F.nullif(F.col("s_nationkey"), F.lit(0))
    return (
        customer.withColumn("ck", ck)
        .join(
            F.broadcast(supplier.withColumn("sk", sk)),
            F.col("ck").eqNullSafe(F.col("sk")),
        )
        .groupBy(F.coalesce(F.col("ck"), F.lit(-1)).alias("nation_bucket"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("nation_bucket")
    )


# --------------------------------------------------------------------------
# q53 — fuzzy string-similarity join with blocking  (levenshtein)
# --------------------------------------------------------------------------
@query(
    "q53_fuzzy_part_names",
    oracle="""
    SELECT a.p_brand,
           a.p_name AS name_a,
           b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           COUNT(*) AS n_pairs
    FROM part a
    JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
    GROUP BY a.p_brand, name_a, name_b, dist
    ORDER BY a.p_brand, name_a, name_b
    """,
    tags=("parity", "fuzzy-join", "blocking"),
)
def q53_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names within a brand (edit distance 1-2).

    Fuzzy entity matching with blocking: the equi-join on p_brand is the
    blocking key, so the quadratic levenshtein comparison runs only
    within brand buckets — never as a global cross join (the audit tool
    would flag CartesianProduct). Distance 0 (exact duplicates) is
    excluded; that's q17's exact-dedup domain. Scale: cost is
    sum(block²); for skewed blocks the standard fix is a second blocking
    key (name prefix) — composable here by adding it to the join keys.
    Spark and DuckDB both implement standard Levenshtein, so distances
    compare exactly.
    """
    part = load_table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_brand"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_brand").alias("brand_b"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            b,
            (F.col("p_brand") == F.col("brand_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .filter(dist.between(1, 2))
        .groupBy(
            "p_brand",
            "name_a",
            "name_b",
            dist.cast("bigint").alias("dist"),
        )
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("p_brand", "name_a", "name_b")
    )


# --------------------------------------------------------------------------
# q54/q55 — bag-semantics set ops  (EXCEPT ALL / INTERSECT ALL)
# --------------------------------------------------------------------------
@query(
    "q54_open_minus_finished_custkeys",
    oracle="""
    SELECT c, COUNT(*) AS n
    FROM (
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY c
    ORDER BY c
    """,
    tags=("parity", "setop", "except-all"),
)
def q54_open_minus_finished_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: open-order multiplicity minus finished-order
    multiplicity per customer.

    EXCEPT ALL subtracts occurrence counts (bag semantics) — a customer
    with 5 open and 2 finished orders survives 3 times, where EXCEPT
    (q11) would drop them entirely. ``DataFrame.exceptAll`` plans this
    as a counted aggregate + generate, one shuffle on the key — there is
    no row-pairing join. The trailing aggregate makes the bag observable
    as (key, multiplicity) for a stable comparison.
    """
    orders = load_table(spark, sf_dir, "orders")
    opened = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c")
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c")
    )
    return (
        opened.exceptAll(finished)
        .groupBy("c")
        .agg(F.count("*").alias("n"))
        .orderBy("c")
    )


@query(
    "q55_open_and_finished_custkeys",
    oracle="""
    SELECT c, COUNT(*) AS n
    FROM (
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY c
    ORDER BY c
    """,
    tags=("parity", "setop", "intersect-all"),
)
def q55_open_and_finished_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection: min(open, finished) multiplicity per
    customer — the bag twin of q45's INTERSECT."""
    orders = load_table(spark, sf_dir, "orders")
    opened = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c")
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c")
    )
    return (
        opened.intersectAll(finished)
        .groupBy("c")
        .agg(F.count("*").alias("n"))
        .orderBy("c")
    )


# --------------------------------------------------------------------------
# q56 — first_value / last_value over an unbounded frame
# --------------------------------------------------------------------------
@query(
    "q56_first_last_order_price",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER w AS last_price,
           COUNT(*) OVER w AS n_orders
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    ORDER BY o_custkey
    """,
    tags=("parity", "window", "first-last"),
)
def q56_first_last_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's first and last order price (chronological).

    first_value/last_value over an explicitly UNBOUNDED frame — the
    default window frame ends at CURRENT ROW, which silently turns
    last_value into "current value"; pinning the frame is the classic
    correctness trap this query documents. Values are picked, not
    accumulated, so doubles compare exactly with no rounding. DISTINCT
    collapses the per-row window output to one row per customer; Spark
    plans it as an aggregate on the already-shuffled frame. (min_by/
    max_by express the same thing aggregate-side; the window form is
    the operator under test.)
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.count("*").over(w).alias("n_orders"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# q57 — argmax aggregate  (max_by: single-pass "latest row per key")
# --------------------------------------------------------------------------
@query(
    "q57_latest_event_per_user",
    oracle="""
    SELECT user_id,
           arg_max(event_type,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|'
                   || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_type,
           MAX(ts) AS last_ts,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("parity", "argmax", "aggregate"),
)
def q57_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's most recent event type — as an aggregate, not a window.

    ``max_by`` answers "value of column A at the max of column B" in one
    hash aggregate with map-side partial merge — no per-partition sort,
    no window state, which is why it beats the q09-style row_number
    window when only the argmax row is needed. Both engines order by a
    composed sortable string (ISO-microsecond timestamp | zero-padded
    event_id): lexicographic == chronological, and the id suffix makes
    the argmax deterministic under timestamp ties.
    """
    events = load_table(spark, sf_dir, "events")
    sort_key = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by("event_type", sort_key).alias("last_type"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# q58 — unpivot / melt  (the inverse of q38's pivot)
# --------------------------------------------------------------------------
@query(
    "q58_unpivot_status_counts",
    oracle="""
    WITH wide AS (
        SELECT n_name,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
        FROM nation
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        GROUP BY n_name
    )
    SELECT n_name, status_col, n FROM (
        SELECT n_name, 'n_open' AS status_col, n_open AS n FROM wide
        UNION ALL
        SELECT n_name, 'n_finished', n_finished FROM wide
        UNION ALL
        SELECT n_name, 'n_pending', n_pending FROM wide
    )
    ORDER BY n_name, status_col
    """,
    tags=("parity", "unpivot", "reshape"),
)
def q58_unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-status counts melted back to long (n_name, status, n).

    ``DataFrame.unpivot`` (a.k.a. melt) is the inverse reshape of q38's
    pivot: each wide row becomes one row per value column — an Expand
    node, zero shuffles beyond the aggregate that built the wide frame.
    The oracle spells it as UNION ALL, which is exactly the semantics
    (DuckDB's UNPIVOT would also work; the manual form keeps the
    comparison engine-agnostic). Counts are exact BIGINTs — no rounding
    concerns in either direction of the reshape.
    """
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.count_if(F.col("o_orderstatus") == "P").alias("n_pending"),
        )
    )
    return (
        wide.unpivot(
            ids=["n_name"],
            values=["n_open", "n_finished", "n_pending"],
            variableColumnName="status_col",
            valueColumnName="n",
        )
        .orderBy("n_name", "status_col")
    )


# --------------------------------------------------------------------------
# q59 — RANGE (value-based) window frame over event time
# --------------------------------------------------------------------------
@query(
    "q59_events_in_last_hour",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS n_last_hour
    FROM events
    ORDER BY event_id
    """,
    tags=("parity", "window", "range-frame"),
)
def q59_events_in_last_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: how many events the same user produced in the
    trailing hour (inclusive) — the rate-limit / burst-detection shape.

    A RANGE frame is value-based: the boundary is "timestamp - 1 hour",
    not "N rows back" (contrast q44's ROWS frame), and timestamp peers
    share one frame on both engines, so ties need no tiebreak. Ordering
    is pure epoch-microsecond NTZ arithmetic (timestampdiff from the
    NTZ epoch == DuckDB epoch_us on naive timestamps) — no session
    timezone anywhere. Scale: one shuffle on user_id; the frame is
    evaluated with a sliding two-pointer over the sorted partition,
    O(1) state per row.
    """
    events = load_table(spark, sf_dir, "events")
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        events.select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_last_hour"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# q60 — regexp_extract_all + explode_outer (lateral with empty matches)
# --------------------------------------------------------------------------
@query(
    "q60_doc_st_terms_outer",
    oracle="""
    SELECT d.doc_id, t.term
    FROM documents d
    LEFT JOIN LATERAL (
        SELECT UNNEST(regexp_extract_all(d.text, '\\bst\\w+')) AS term
    ) t ON TRUE
    ORDER BY doc_id, term
    """,
    tags=("parity", "lateral", "explode-outer"),
)
def q60_doc_st_terms_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 'st…' terms per document, keeping documents with none.

    ``explode_outer`` is the outer lateral: a document whose match list
    is empty survives as a single NULL-term row — plain ``explode``
    silently drops it, the classic lost-rows bug when a generator feeds
    a left-join-shaped report. regexp_extract_all runs JVM-side
    (codegen), one row in → matches-or-one rows out, no shuffle until
    the final presentation sort. Spark (Java regex) and DuckDB (RE2)
    agree on this pattern class (\\b, \\w are common semantics).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode_outer(
                F.regexp_extract_all(F.col("text"), F.lit(r"\bst\w+"), 0)
            ).alias("term"),
        )
        .orderBy("doc_id", "term")
    )


# --------------------------------------------------------------------------
# q61 — statistical aggregates from exact power sums (stddev, correlation)
# --------------------------------------------------------------------------
@query(
    "q61_qty_price_statistics",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))
                        * CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))
                        * CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))
                        * CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n,
           floor((sqrt((sxx - sx * sx / n) / (n - 1))) * 10000 + 0.5) / 10000
               AS qty_stddev,
           floor(((n * sxy - sx * sy)
                  / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
                 * 10000 + 0.5) / 10000 AS qty_price_corr
    FROM s
    ORDER BY l_returnflag
    """,
    tags=("parity", "statistics", "aggregate"),
)
def q61_qty_price_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev of quantity and quantity-price correlation per flag.

    Built-in STDDEV/CORR are accumulation-order-dependent doubles
    (Welford/naive variants differ across engines and partitionings), so
    they can never pass a bit-exact gate. Instead the five power sums
    (n, Σx, Σx², Σy, Σy², Σxy) are aggregated as exact decimals — one
    hash aggregate, map-side combinable, the textbook distributed-stats
    shape — and the statistics are derived per group in double from
    bit-identical inputs. This is also the right 100 TB design: power
    sums merge associatively across any partitioning, which is exactly
    why they (not Welford state) are what map-side partials should
    carry when exactness matters.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(38,6)")
    y = F.col("l_extendedprice").cast("decimal(38,6)")
    s = lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return (
        s.select(
            "l_returnflag",
            "n",
            round4(F.sqrt((sxx - sx * sx / n) / (n - 1))).alias("qty_stddev"),
            round4(
                (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            ).alias("qty_price_corr"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q62 — array higher-order functions (filter / transform / fold)
# --------------------------------------------------------------------------
@query(
    "q62_embedding_array_stats",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(list_max(embedding) AS DOUBLE) AS max_val,
           floor((list_reduce(
                     list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                     (a, b) -> a + b))
                 * 10000 + 0.5) / 10000 AS l1_norm
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("parity", "array-hof", "lambda"),
)
def q62_embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector array statistics via lambda higher-order functions.

    filter → size (positive-dimension count), array_max (an exact pick,
    no arithmetic), and a sequential left fold for the L1 norm —
    Spark's ``F.aggregate`` and DuckDB's ``list_reduce`` both fold
    left-to-right in double, so the sums are bit-identical (the same
    reason operators/similarity.dot uses this shape). All three run
    JVM-side inside codegen: arrays never explode to rows, so the only
    shuffle in the plan is the presentation sort. This is the
    array-native alternative to q29's posexplode-then-aggregate — the
    right choice when the aggregation stays within one row.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    return (
        emb.select(
            "vec_id",
            F.size(F.filter(F.col("embedding"), lambda x: x > 0))
            .cast("bigint")
            .alias("n_pos"),
            F.array_max(F.col("embedding")).cast("double").alias("max_val"),
            round4(
                F.aggregate(as_double, F.lit(0.0), lambda a, v: a + v)
            ).alias("l1_norm"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# q90 — multi-correlated EXISTS / NOT EXISTS, decorrelated (TPC-H Q21 shape)
# --------------------------------------------------------------------------
@query(
    "q90_sole_blame_suppliers",
    oracle="""
    WITH fl AS (
      SELECT l_orderkey, l_suppkey, l_shipdate
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'),
    om AS (SELECT l_orderkey, max(l_shipdate) AS maxship
           FROM fl GROUP BY l_orderkey),
    cand AS (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM fl l1 JOIN om ON om.l_orderkey = l1.l_orderkey
      WHERE l1.l_shipdate = om.maxship),
    blamed AS (
      SELECT c.l_orderkey, c.l_suppkey FROM cand c
      WHERE EXISTS (SELECT 1 FROM fl l2
                    WHERE l2.l_orderkey = c.l_orderkey
                      AND l2.l_suppkey <> c.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM cand c2
                        WHERE c2.l_orderkey = c.l_orderkey
                          AND c2.l_suppkey <> c.l_suppkey))
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS waiting_orders
    FROM blamed JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY waiting_orders DESC, s_name
    LIMIT 20
    """,
    tags=("parity", "subquery", "decorrelation", "semi-join", "anti-join"),
)
def q90_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for the latest shipment in
    multi-supplier finished orders — the TPC-H Q21 shape (one EXISTS +
    one NOT EXISTS, both correlated to the outer row) adapted to this
    schema's columns (no commit/receipt dates; "blame" = holding the
    order's max ship date alone).

    The Spark build decorrelates by hand into ONE l_orderkey shuffle
    that serves every correlated predicate: a single whole-partition
    window computes the order's max ship date, its distinct-supplier
    set size (``EXISTS other-supplier`` → ``n_suppliers > 1``), and the
    distinct set of suppliers holding the max (``NOT EXISTS
    other-supplier-at-max`` → that set has size 1) in one pass. The
    (orderkey, suppkey) dedup rides the same partitioning — a window
    keyed on (l_orderkey, l_suppkey) is satisfied by the existing
    l_orderkey clustering, so it adds a sort but NO exchange. No
    repeated subquery scans of the fact table, which at 100 TB is the
    difference between one co-partitioned pass and three. The supplier
    dim is broadcast; the final top-k is TakeOrderedAndProject (no
    global sort).
    """
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    fl = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(F.broadcast(orders_f), F.col("l_orderkey") == F.col("o_orderkey"))
        .drop("o_orderkey")
    )
    w = Window.partitionBy("l_orderkey")
    per_line = (
        fl.withColumn(
            "at_max", F.col("l_shipdate") == F.max("l_shipdate").over(w)
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            "at_max",
            F.size(F.collect_set("l_suppkey").over(w)).alias("n_suppliers"),
            F.size(
                F.collect_set(F.when(F.col("at_max"), F.col("l_suppkey"))).over(w)
            ).alias("n_at_max"),
        )
    )
    w_pair = Window.partitionBy("l_orderkey", "l_suppkey").orderBy(F.lit(1))
    blamed = (
        per_line.filter(
            F.col("at_max") & (F.col("n_suppliers") > 1) & (F.col("n_at_max") == 1)
        )
        .withColumn("rn", F.row_number().over(w_pair))
        .filter(F.col("rn") == 1)
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("waiting_orders"))
        .orderBy(F.col("waiting_orders").desc(), F.col("s_name"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q91 — global scalar threshold + NOT EXISTS (TPC-H Q22 shape)
# --------------------------------------------------------------------------
@query(
    "q91_dormant_rich_customers",
    oracle=f"""
    WITH thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {r4(exact_sum_sql("c_acctbal"))} AS total_acctbal
    FROM customer, thr
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("parity", "subquery", "anti-join", "scalar-subquery"),
)
def q91_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balance and no orders,
    grouped by market segment — the TPC-H Q22 shape (uncorrelated
    scalar threshold subquery + correlated NOT EXISTS).

    Decorrelation: the scalar average folds to a one-row aggregate
    cross-joined in via broadcast (a literal by the time the filter
    runs); NOT EXISTS becomes a left-anti join against the single
    o_custkey column of orders. Scale: the anti join is the only real
    shuffle — both sides hash on custkey; the orders build side is
    projected to one column before the exchange. The threshold is an
    exact decimal SUM / COUNT so both engines compare against
    bit-identical doubles (a raw double AVG drifts with partition
    order and can flip rows at the boundary).
    """
    customer = load_table(spark, sf_dir, "customer")
    thr = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(
            (exact_sum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
        )
    )
    orders_keys = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders_keys,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            round4(exact_sum(F.col("c_acctbal"))).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# q96 — IN over a grouped HAVING subquery (TPC-H Q18 shape)
# --------------------------------------------------------------------------
Q96_MIN_QTY = 300


@query(
    "q96_large_quantity_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(30,6))) > {Q96_MIN_QTY})
    SELECT c_name, o_orderkey, {r4('o_totalprice')} AS total_price,
           {r4('sum_qty')} AS sum_qty
    FROM orders
    JOIN big ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("parity", "subquery", "semi-join", "having"),
)
def q96_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total lineitem quantity exceeds {Q96_MIN_QTY}, with
    customer name — the TPC-H Q18 shape (``o_orderkey IN (SELECT ...
    GROUP BY ... HAVING SUM(...) > N)``).

    The IN-subquery decorrelates to a plain join against the HAVING'd
    aggregate: the aggregate's output is tiny (the HAVING prunes ~all
    orders map-side after partial aggregation), so the join back to
    orders broadcasts the filtered side. The threshold compare runs on
    the exact decimal sum — never the rounded double — so both engines
    keep/drop identical boundary rows. Scale: one l_orderkey shuffle
    for the aggregate; the orders and customer joins are broadcasts of
    the shrunken side; top-k is TakeOrderedAndProject.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > Q96_MIN_QTY)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("sum_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            round4(F.col("o_totalprice")).alias("total_price"),
            round4(F.col("sum_qty")).alias("sum_qty"),
            "o_totalprice",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .drop("o_totalprice")
    )


# --------------------------------------------------------------------------
# q97 — group share vs global scalar threshold (TPC-H Q11 shape)
# --------------------------------------------------------------------------
Q97_FRACTION = "0.0005"  # of global revenue, as an exact decimal literal


@query(
    "q97_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS val_dec
      FROM lineitem GROUP BY l_partkey),
    total AS (SELECT SUM(val_dec) AS total_dec FROM pv)
    SELECT l_partkey AS partkey,
           {r4('CAST(val_dec AS DOUBLE)')} AS part_value
    FROM pv, total
    WHERE val_dec > total_dec * {Q97_FRACTION}
    ORDER BY CAST(val_dec AS DOUBLE) DESC, l_partkey
    """,
    tags=("parity", "subquery", "scalar-subquery", "having"),
)
def q97_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose total lineitem revenue exceeds a fixed fraction of
    the global total — the TPC-H Q11 shape (grouped aggregate filtered
    against an uncorrelated scalar aggregate of the same relation).

    The global total is the SUM of the per-part sums — computed from
    the grouped aggregate itself (a second tiny aggregate over the
    group results, not a second scan of the fact table), then cross-
    joined in as a broadcast literal. The whole comparison runs in
    exact decimal arithmetic; doubles appear only in the projected
    output. Scale: ONE l_partkey shuffle; the rollup to the scalar
    reduces the already-aggregated frame.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    pv = lineitem.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).alias("val_dec")
    )
    total = pv.agg(F.sum("val_dec").alias("total_dec"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(
            F.col("val_dec")
            > (F.col("total_dec") * F.expr(f"CAST({Q97_FRACTION} AS DECIMAL(10,6))"))
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            round4(F.col("val_dec").cast("double")).alias("part_value"),
            F.col("val_dec").cast("double").alias("_ord"),
        )
        .orderBy(F.col("_ord").desc(), "partkey")
        .drop("_ord")
    )


# --------------------------------------------------------------------------
# q98 — bilateral volume between nation pairs (TPC-H Q7 shape)
# --------------------------------------------------------------------------
@query(
    "q98_bilateral_shipping_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {r4(exact_sum_sql("l_extendedprice * (1 - l_discount)"))} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, ship_year
    ORDER BY supp_nation, cust_nation, ship_year
    """,
    tags=("parity", "star-join", "multi-dim"),
)
def q98_bilateral_shipping_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly shipping volume between two nations, both directions —
    the TPC-H Q7 shape (fact ⋈ two independent dimension chains with an
    OR'd cross-dimension pair predicate).

    Both nation chains collapse to broadcasts (supplier/customer/nation
    are dimension-sized), so the only shuffle is the lineitem⋈orders
    key exchange followed by the final group-by — and the nation-pair
    predicate cannot be pushed below the joins (it spans both chains),
    exactly the case where join ORDER matters: dims first, then the
    OR filter, then the aggregate. Year extraction on the NTZ shipdate
    is calendar arithmetic identical in both engines.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            round4(
                exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# --------------------------------------------------------------------------
# q109 — customer order-count distribution (TPC-H Q13 shape)
# --------------------------------------------------------------------------
@query(
    "q109_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("parity", "outer-join", "double-aggregate", "tpch-q13"),
)
def q109_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed how many (non-urgent) orders, zero
    included — the TPC-H Q13 shape: LEFT OUTER join with an extra
    non-equi condition *inside the join* (so unmatched customers
    survive with count 0, which a WHERE would destroy), then a
    two-level aggregation (per-customer count, then histogram of
    counts).

    COUNT(o_orderkey) — not COUNT(*) — is what makes the zero bucket
    appear: null join results count as 0. Scale: the first aggregate
    rides the join's c_custkey shuffle (AQE reuses the partitioning);
    the second groups on the tiny count domain, so it collapses to a
    near-driver-sized exchange after partial aggregation.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = customer.join(
        orders,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left",
    )
    c_orders = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        c_orders.groupBy(F.col("c_count").cast("long").alias("c_count"))
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# q110 — top supplier(s) by quarterly revenue (TPC-H Q15 shape)
# --------------------------------------------------------------------------
@query(
    "q110_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
      GROUP BY l_suppkey),
    mx AS (SELECT MAX(total_rev) AS m FROM rev)
    SELECT s_suppkey, s_name,
           {r4('CAST(total_rev AS DOUBLE)')} AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey CROSS JOIN mx
    WHERE total_rev = mx.m
    ORDER BY s_suppkey
    """,
    tags=("parity", "scalar-subquery", "argmax", "tpch-q15"),
)
def q110_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with maximum revenue in 1998Q1 — the TPC-H Q15
    shape (a view-style grouped aggregate compared against its own MAX,
    keeping ties).

    The revenue view is aggregated once and reused for both the scalar
    MAX and the equality filter — no second fact scan, the rollup is a
    tiny re-aggregate broadcast back. The max-vs-value comparison runs
    entirely in DECIMAL so revenue ties (the reason Q15 says "the
    supplier*s*") are exact, never float-blurred. The date range prunes
    at the parquet scan (min/max row-group skipping on l_shipdate).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1998-04-01 00:00:00'"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("m"))
    return (
        supplier.join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("m"))
        .select(
            "s_suppkey",
            "s_name",
            round4(F.col("total_rev").cast("double")).alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q111 — disjunctive multi-attribute join predicate (TPC-H Q19 shape)
# --------------------------------------------------------------------------
@query(
    "q111_disjunctive_revenue",
    oracle=f"""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {r4(exact_sum_sql('l_extendedprice * (1 - l_discount)'))} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 30)
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("parity", "disjunctive-predicate", "pushdown", "tpch-q19"),
)
def q111_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR of three brand/size/quantity condition blocks
    — the TPC-H Q19 shape, the canonical test of disjunctive predicate
    pushdown.

    Catalyst factors the OR: the part-only disjunction
    (brand ∧ size OR'd across blocks) pushes to the part scan, the
    lineitem-only disjunction (quantity ranges) pushes to the lineitem
    scan, and only the cross-table residual evaluates at the join —
    so both scans prune before any shuffle even though no single
    conjunct applies to every row. Verify with .explain(): both
    FileScans show PushedFilters with Or(...) trees.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
    blocks = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        joined.filter(blocks)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            round4(
                exact_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            ).alias("revenue"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# q112 — nested semi-join chain (TPC-H Q20 shape)
# --------------------------------------------------------------------------
@query(
    "q112_ramping_suppliers",
    oracle="""
    WITH wid AS (SELECT p_partkey FROM part WHERE p_name LIKE 'large%'),
    shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(30,6))) AS total_qty,
             SUM(CASE WHEN year(l_shipdate) >= 1999
                      THEN CAST(l_quantity AS DECIMAL(30,6))
                      ELSE CAST(0 AS DECIMAL(30,6)) END) AS recent_qty
      FROM lineitem JOIN wid ON l_partkey = p_partkey
      GROUP BY l_suppkey, l_partkey),
    ramping AS (
      SELECT DISTINCT l_suppkey FROM shipped
      WHERE recent_qty > total_qty * CAST(0.5 AS DECIMAL(10,6)))
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM ramping)
    ORDER BY s_suppkey
    """,
    tags=("parity", "semi-join", "nested-subquery", "tpch-q20"),
)
def q112_ramping_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than half their all-time volume of
    'large…' parts since 1999 — the TPC-H Q20 shape: a filter subquery
    (part name prefix) feeding a grouped threshold subquery feeding a
    semi join into the outer dimension table.

    Each nesting level becomes one narrowing step: the part filter is a
    broadcast semi join that prunes lineitem BEFORE its (suppkey,
    partkey) aggregate; the recent-vs-total comparison is a conditional
    aggregate over the same single pass (no second scan, no self-join);
    the final IN is a left-semi broadcast of the few surviving supplier
    keys. All quantity math in exact DECIMAL — the 0.5× threshold can
    tie exactly, and > must agree bitwise across engines.
    """
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    wid = part.filter(F.col("p_name").startswith("large")).select("p_partkey")
    qty_dec = F.col("l_quantity").cast("decimal(30,6)")
    zero_dec = F.lit(0).cast("decimal(30,6)")
    shipped = (
        lineitem.join(
            F.broadcast(wid), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(qty_dec).alias("total_qty"),
            F.sum(
                F.when(F.year("l_shipdate") >= 1999, qty_dec).otherwise(zero_dec)
            ).alias("recent_qty"),
        )
    )
    ramping = (
        shipped.filter(
            F.col("recent_qty")
            > F.col("total_qty") * F.expr("CAST(0.5 AS DECIMAL(10,6))")
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(ramping),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q117 — SCD2 point-in-time join (probe facts against interval history)
# --------------------------------------------------------------------------
@query(
    "q117_point_in_time_join",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seg AS (
        SELECT user_id, ts, event_type,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
        FROM ordered
    ),
    spans AS (
        SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
               MIN(ts) AS valid_from
        FROM seg GROUP BY user_id, version, event_type
    ),
    iv AS (
        SELECT user_id, version, event_type, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
                   AS valid_to
        FROM spans
    ),
    probes AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id, p.ts, iv.version,
           iv.event_type AS regime
    FROM probes p
    JOIN iv ON p.user_id = iv.user_id
           AND iv.valid_from <= p.ts
           AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
    ORDER BY p.user_id, p.event_id
    """,
    tags=("parity", "scd2", "temporal-join", "as-of"),
)
def q117_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event joined to the SCD2 regime (q51's interval
    table) valid at its timestamp — the warehouse point-in-time /
    BETWEEN-join every versioned dimension needs, with half-open
    [valid_from, valid_to) semantics.

    The oracle spells the textbook range join; the Spark plan refuses
    it (range joins explode on hot keys and defeat hash partitioning)
    and uses the q35 as-of machinery instead: interval starts and
    probes union into one stream, one user_id window carries the last
    seen version forward (boundaries sort before probes on ties —
    kind 0 < 1 — and same-timestamp boundary ties resolve to the
    highest version, which is exactly the interval the half-open range
    matches). One shuffle + one sort, output rows = probe rows, no
    multiplicity from overlapping candidates.
    """
    iv = q51_user_type_history(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    bounds = iv.select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.lit(0).alias("kind"),
        "version",
        F.col("event_type").alias("regime"),
        F.lit(None).cast("long").alias("event_id"),
    )
    probes = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("version"),
        F.lit(None).cast("string").alias("regime"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bounds.unionByName(probes)
        .select(
            "user_id",
            "event_id",
            "ts",
            "kind",
            F.last("version", ignorenulls=True).over(w).alias("version"),
            F.last("regime", ignorenulls=True).over(w).alias("regime"),
        )
        .filter(F.col("kind") == 1)
        .select("user_id", "event_id", "ts", "version", "regime")
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# q118 — market share of one supplier nation within a region (TPC-H Q8)
# --------------------------------------------------------------------------
@query(
    "q118_market_share",
    oracle=f"""
    WITH region_orders AS (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA')
    SELECT CAST(o_year AS INTEGER) AS o_year,
           {r4(f'''CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
                     THEN CAST(volume AS DECIMAL(30,6))
                     ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(30,6))) AS DOUBLE)''')} AS mkt_share,
           {r4(exact_sum_sql('volume'))} AS total_volume
    FROM region_orders
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("parity", "star-join", "market-share", "tpch-q8"),
)
def q118_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_2's share of supplier revenue into ASIA customers per
    order year — the TPC-H Q8 shape: a 6-table star join feeding a
    conditional-over-total ratio per group.

    The share is one pass: numerator and denominator are a conditional
    and an unconditional sum over the SAME aggregate (no second scan,
    no join of two aggregates). All dimension chains (customer→nation→
    region, supplier→nation) broadcast; the only real shuffle is
    lineitem⋈orders and the final year group-by. Both sums accumulate
    in DECIMAL(30,6) and the ratio divides the two exact totals as
    doubles — engine- and partition-order-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    asia = region.filter(F.col("r_name") == "ASIA").select(
        F.col("r_regionkey").alias("c_rkey")
    )
    vol_dec = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    ).cast("decimal(30,6)")
    zero_dec = F.lit(0).cast("decimal(30,6)")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(asia), "c_rkey")
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol_dec).otherwise(
                        zero_dec
                    )
                ).cast("double")
                / F.sum(vol_dec).cast("double")
            ).alias("share_raw"),
            exact_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("tv_raw"),
        )
        .select(
            "o_year",
            round4(F.col("share_raw")).alias("mkt_share"),
            round4(F.col("tv_raw")).alias("total_volume"),
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# q119 — product-line profit by supplier nation and year (TPC-H Q9 shape)
# --------------------------------------------------------------------------
@query(
    "q119_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {r4(exact_sum_sql(
               'l.l_extendedprice * (1 - l.l_discount)'
               ' - 0.6 * p.p_retailprice * l.l_quantity'))} AS profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("parity", "star-join", "profit", "tpch-q9"),
)
def q119_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on widget parts by supplier nation and order year — the
    TPC-H Q9 shape: a product-name substring filter driving a 5-table
    join with a derived profit measure aggregated on two dimensions.
    (The schema has no partsupp table, so supply cost is modeled as
    60% of p_retailprice — the shape, filter, and measure arithmetic
    are Q9's.)

    The '%widget%' infix filter cannot push as a parquet predicate
    (contains → scan filter), but it prunes part BEFORE the join, and
    the runtime bloom filter / DPP machinery (tests/test_pruning.py)
    is what carries that selectivity into the lineitem side at cluster
    scale. Profit terms mix two products per row; the whole expression
    is computed per-row in doubles and summed in DECIMAL(30,6)
    (q61 discipline) — subtraction makes cancellation error a real
    hazard for naive double sums at 100 TB row counts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    widgets = part.filter(F.col("p_name").contains("widget")).select(
        "p_partkey", "p_retailprice"
    )
    profit_term = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(widgets), F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.count("*").alias("n_lines"),
            round4(exact_sum(profit_term)).alias("profit"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# q128 — unshipped-order shipping priority  (TPC-H Q3 shape)
# --------------------------------------------------------------------------
@query(
    "q128_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {r4(exact_sum_sql('l_extendedprice * (1 - l_discount)'))} AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("parity", "tpch-q3", "join", "topk"),
)
def q128_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 highest-revenue orders placed before but (partly) shipped
    after the cutoff, for one market segment — TPC-H Q3.

    Scale: the segment filter prunes customer BEFORE the join (pushed
    to the scan); both date filters push into their fact scans
    (row-group skipping on o_orderdate / l_shipdate); the final top-10
    is TakeOrderedAndProject over the per-order aggregate, never a
    global sort. Revenue ranks on the exact-decimal sum (q61
    discipline) so the cross-engine top-10 cut is tie-stable, with
    l_orderkey as the deterministic tie-break.
    """
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-07-01 00:00:00'")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '1998-07-01 00:00:00'")
    )
    return (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            round4(
                exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q129 — forecasting revenue change  (TPC-H Q6 shape)
# --------------------------------------------------------------------------
@query(
    "q129_forecast_revenue_delta",
    oracle=f"""
    SELECT COUNT(*) AS n_lineitems,
           {r4(exact_sum_sql('l_extendedprice * l_discount'))} AS forgone_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("parity", "tpch-q6", "scan-agg"),
)
def q129_forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue that would be gained by eliminating mid-range discounts
    on small orders in one year — TPC-H Q6, the canonical pure
    scan-aggregate.

    Scale: everything pushes to the scan (date range, discount band,
    quantity cap → PushedFilters + row-group skipping); the aggregate
    is a map-side partial + one-row exchange. The discount band
    compares stored doubles against the same literal doubles on both
    engines — no epsilon needed.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_lineitems"),
            round4(exact_sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "forgone_revenue"
            ),
        )
    )


# --------------------------------------------------------------------------
# q130 — returned-item reporting  (TPC-H Q10 shape)
# --------------------------------------------------------------------------
@query(
    "q130_returned_item_customers",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {r4('c_acctbal')} AS acctbal,
           {r4(exact_sum_sql('l_extendedprice * (1 - l_discount)'))} AS lost_revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("parity", "tpch-q10", "join", "topk"),
)
def q130_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in one quarter —
    TPC-H Q10.

    Scale: the quarter filter prunes orders at the scan; the
    returnflag filter prunes lineitem at the scan (dictionary +
    min/max); nation broadcasts; the only big exchange is
    lineitem⋈orders on orderkey, then a per-customer aggregate.
    Top-20 is TakeOrderedAndProject with c_custkey tie-break.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1997-10-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            round4(
                exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("lost_revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            round4(F.col("c_acctbal")).alias("acctbal"),
            "lost_revenue",
        )
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q131 — promotion revenue effect  (TPC-H Q14 shape)
# --------------------------------------------------------------------------
@query(
    "q131_promo_revenue_share",
    oracle=f"""
    WITH j AS (
      SELECT p_type, l_extendedprice, l_discount
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00')
    SELECT COUNT(*) AS n_lineitems,
           {r4("100.0 * " + exact_sum_sql(
               "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")
             + " / " + exact_sum_sql('l_extendedprice * (1 - l_discount)'))}
             AS promo_share_pct
    FROM j
    """,
    tags=("parity", "tpch-q14", "join", "conditional-agg"),
)
def q131_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one month's revenue that came from PROMO-type parts —
    TPC-H Q14's conditional-aggregate-over-join.

    Scale: the month filter prunes lineitem at the scan; part is a
    broadcast dim; numerator and denominator are ONE aggregate pass
    (conditional term inside the same exact-decimal sum), so the fact
    scans once. The ratio divides two exact decimals in IEEE doubles —
    identical on both engines — then rounds.
    """
    part = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-09-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-10-01 00:00:00'"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.count("*").alias("n_lineitems"),
            round4(
                F.lit(100.0) * exact_sum(promo_rev) / exact_sum(rev)
            ).alias("promo_share_pct"),
        )
    )


# --------------------------------------------------------------------------
# q136 — snapshot diff (CDC derivation: the inverse of MERGE)
# --------------------------------------------------------------------------
@query(
    "q136_snapshot_diff",
    oracle=f"""
    WITH snap_a AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer),
    snap_b AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 11 <> 0
      UNION ALL
      SELECT c_custkey + 10000000, c_name, c_acctbal
      FROM customer WHERE c_custkey % 13 = 0)
    SELECT COALESCE(a.c_custkey, b.c_custkey) AS custkey,
           CASE WHEN a.c_custkey IS NULL THEN 'insert'
                WHEN b.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           {r4('a.c_acctbal')} AS old_acctbal,
           {r4('b.c_acctbal')} AS new_acctbal
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.c_custkey = b.c_custkey
    WHERE a.c_custkey IS NULL OR b.c_custkey IS NULL
       OR a.c_acctbal <> b.c_acctbal OR a.c_name <> b.c_name
    ORDER BY custkey
    """,
    tags=("extension", "cdc", "snapshot-diff", "full-outer-join"),
)
def q136_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — derive the CDC stream (insert/update/delete rows)
    between two versions of a table: the inverse of the MERGE operator
    (operators/merge.py applies such a stream; this produces one). The
    'new' snapshot is built deterministically in-query (deletes every
    11th key, bumps balances on every 7th, clones every 13th under a
    fresh key) so the oracle states the expected diff in closed form.

    This is warehouse reconciliation at its core: full outer join on
    the key, null-sides classify insert/delete, attribute inequality
    classifies update, unchanged rows drop. Scale: one key-partitioned
    shuffle join (AQE-skew-safe); attribute compare is codegen. On real
    tables, compare a precomputed row digest instead of N columns so
    wide rows diff on 16 bytes — same plan shape.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    snap_a = cust.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        F.col("c_acctbal").alias("a_bal"),
    )
    kept = cust.filter(F.col("c_custkey") % 11 != 0).select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("b_bal"),
    )
    cloned = cust.filter(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 10000000).alias("b_key"),
        F.col("c_name").alias("b_name"),
        F.col("c_acctbal").alias("b_bal"),
    )
    snap_b = kept.unionByName(cloned)
    joined = snap_a.join(snap_b, snap_a.a_key == snap_b.b_key, "full_outer")
    op = (
        F.when(F.col("a_key").isNull(), F.lit("insert"))
        .when(F.col("b_key").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    changed = (
        F.col("a_key").isNull()
        | F.col("b_key").isNull()
        | (F.col("a_bal") != F.col("b_bal"))
        | (F.col("a_name") != F.col("b_name"))
    )
    return (
        joined.filter(changed)
        .select(
            F.coalesce(F.col("a_key"), F.col("b_key")).alias("custkey"),
            op.alias("op"),
            round4(F.col("a_bal")).alias("old_acctbal"),
            round4(F.col("b_bal")).alias("new_acctbal"),
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# q141 — supplier diversity per part attribute  (TPC-H Q16 shape)
# --------------------------------------------------------------------------
@query(
    "q141_supplier_diversity",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
      FROM lineitem),
    excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = partkey
    WHERE p_brand <> 'Brand#9'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND suppkey NOT IN (SELECT s_suppkey FROM excl)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("parity", "tpch-q16", "anti-join", "count-distinct"),
)
def q141_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers can furnish parts of each
    (brand, type, size), excluding one brand/type and a supplier
    deny-list — TPC-H Q16's NOT-IN-subquery + grouped COUNT(DISTINCT),
    with lineitem standing in for partsupp (the schema has no partsupp
    table) and the deny-list keyed on negative account balance (no
    s_comment column).

    Scale: the fact collapses to DISTINCT (partkey, suppkey) FIRST —
    one shuffle that shrinks every later stage to relation-size; the
    deny-list NOT IN becomes a broadcast anti join (keys are non-null,
    so the anti join is exactly NOT IN with none of its NULL traps);
    part is a broadcast dim with all three predicates pushed to its
    scan.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excl = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = (
        lineitem.select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
        .join(F.broadcast(excl), F.col("suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        ps.join(F.broadcast(part), F.col("p_partkey") == F.col("partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# q263 — interval-overlap join (fulfillment windows x promo windows)
# --------------------------------------------------------------------------
# Fulfillment horizon in days by priority class (deterministic dim).
FULFILL_DAYS = {
    "1-URGENT": 7,
    "2-HIGH": 14,
    "3-MEDIUM": 21,
    "4-NOT SPECIFIED": 28,
    "5-LOW": 35,
}
# Promotion windows as half-open [p0, p1) date intervals — a
# dimension-sized literal relation, as campaign calendars are.
PROMO_WINDOWS = (
    ("1996-q1", "1996-01-01", "1996-04-01"),
    ("1997-summer", "1997-06-01", "1997-09-01"),
    ("1998-holiday", "1998-11-15", "1999-01-01"),
    ("2000-launch", "2000-03-01", "2000-04-16"),
)
_FULFILL_CASE = "CASE " + " ".join(
    f"WHEN o_orderpriority = '{k}' THEN {v}"
    for k, v in sorted(FULFILL_DAYS.items())
) + " END"
_PROMO_VALUES = ", ".join(
    f"('{n}', DATE '{a}', DATE '{b}')" for n, a, b in PROMO_WINDOWS
)


@query(
    "q263_interval_overlap_join",
    oracle=f"""
    WITH f AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_orderdate AS DATE) AS f0,
             CAST(o_orderdate AS DATE) + ({_FULFILL_CASE}) AS f1
      FROM orders),
    promos(promo, p0, p1) AS (VALUES {_PROMO_VALUES}),
    hits AS (
      SELECT p.promo, f.o_orderpriority,
             date_diff('day',
                       GREATEST(f.f0, p.p0),
                       LEAST(f.f1, p.p1)) AS overlap_days
      FROM f JOIN promos p
        ON f.f0 < p.p1 AND p.p0 < f.f1)
    SELECT promo, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(overlap_days) AS BIGINT) AS sum_overlap_days,
           {r4('SUM(overlap_days) * 1.0 / COUNT(*)')} AS avg_overlap_days
    FROM hits
    GROUP BY promo, o_orderpriority
    ORDER BY promo, o_orderpriority
    """,
    tags=("extension", "interval-join", "range-join"),
)
def q263_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each order's fulfillment window
    [orderdate, orderdate + priority-dependent horizon) joined to the
    promotion-calendar windows it overlaps, rolled up to overlap-day
    totals per (promo, priority). This is the third member of the
    temporal-join family — q35/q117 are as-of/point-in-time (probe
    instant vs interval history), q51 builds the intervals, and this is
    interval-vs-INTERVAL with an overlap-length measure, the shape
    behind campaign attribution, maintenance-window impact, and
    SLA-overlap reporting.

    Shape/scale: the promo side is a literal dimension (campaign
    calendars are tens of rows), so the non-equi overlap predicate
    (f0 < p1 AND p0 < f1) runs as a broadcast nested-loop whose inner
    side is K rows — a map-side scan of the fact table at any scale,
    which is THE production answer for small-dim interval joins. For
    big-x-big interval joins the same predicate rides the time-bucket
    equi-join decomposition (explode intervals to buckets, equi-join
    on bucket, dedupe) — q117's docstring records why this engine
    refuses the naive big-big range join. Overlap lengths are exact
    integer day differences of half-open intervals (no boundary
    double-count); the rollup is a 20-group aggregate.
    """
    import datetime as _dt

    orders = load_table(spark, sf_dir, "orders")
    expr = None
    for k, v in sorted(FULFILL_DAYS.items()):
        cond = F.col("o_orderpriority") == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    f = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("f0"),
        F.date_add(F.col("o_orderdate").cast("date"), expr).alias("f1"),
    )
    promos = F.broadcast(
        spark.createDataFrame(
            [
                (
                    n,
                    _dt.date.fromisoformat(a),
                    _dt.date.fromisoformat(b),
                )
                for n, a, b in PROMO_WINDOWS
            ],
            "promo STRING, p0 DATE, p1 DATE",
        )
    )
    hits = f.join(
        promos,
        (F.col("f0") < F.col("p1")) & (F.col("p0") < F.col("f1")),
    ).select(
        "promo",
        "o_orderpriority",
        F.date_diff(
            F.least(F.col("f1"), F.col("p1")),
            F.greatest(F.col("f0"), F.col("p0")),
        ).alias("overlap_days"),
    )
    return (
        hits.groupBy("promo", "o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("overlap_days").cast("long").alias("sum_overlap_days"),
            round4(
                F.sum("overlap_days") / F.count("*")
            ).alias("avg_overlap_days"),
        )
        .orderBy("promo", "o_orderpriority")
    )
