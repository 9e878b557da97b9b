"""Relational parity queries (SURVEY.md §2), one per operator class.

Each query re-expresses an operator the reference performs (pandas code
or documented SQL surface) on the driver's synthetic star schema, with a
DuckDB oracle. Conventions keeping the value-hash comparison stable:

- every computed column is aliased identically on both sides;
- double-valued aggregates are rounded to 4 decimals on both sides
  (summation order differs between engines; rounding removes last-ulp
  noise);
- every result has an explicit total ordering or is order-insensitive;
- rank/count-like integers are cast to BIGINT on both sides (Spark's
  ``row_number`` is INT, DuckDB's is BIGINT);
- DuckDB ``regexp_replace`` defaults to first-match-only → oracles pass
  the ``'g'`` flag wherever Spark (replace-all by default) is mirrored.

Scale notes are in each query's docstring: what broadcasts, what
shuffles, and why the plan survives 1000 executors × 100 TB.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movie_data_pipeline_spark.functions.titles import (
    clean_title,
    normalize_title,
    release_year,
)
from movie_data_pipeline_spark.plans.core import exact_sum, exact_sum_sql, query, r4, round4
from movie_data_pipeline_spark.sources.registry import load_table


# --------------------------------------------------------------------------
# q01 — filter + global top-k  (SURVEY §2.2 P11, §2.6 O1; README.md:533-541)
# --------------------------------------------------------------------------
@query(
    "q01_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("parity", "filter", "topk"),
)
def q01_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price among open orders.

    Mirrors the reference's "Top 10 Highest Rated Movies"
    (README.md:533-541): predicate filter + ORDER BY ... LIMIT k.
    Scale: Catalyst plans TakeOrderedAndProject — per-partition heaps of
    k rows, no global sort; the filter is pushed into the parquet scan.
    o_orderkey tiebreak makes the result deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q02 — multi-way dim join + aggregate  (SURVEY §2.3 J2/J3, §2.4 A2/A3)
# --------------------------------------------------------------------------
@query(
    "q02_region_revenue",
    oracle="""
    SELECT r_name,
           COUNT(*) AS n_orders,
           floor((CAST(SUM(CAST((o_totalprice) AS DECIMAL(30,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total_revenue,
           floor((AVG(o_totalprice)) * 10000 + 0.5) / 10000 AS avg_order_value
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    tags=("parity", "join", "agg"),
)
def q02_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup through the region⋈nation⋈customer⋈orders chain.

    Mirrors the reference's 3-way movies⋈movie_genres⋈genres join
    (README.md:547-556) in star-schema form. Scale: region/nation are
    tiny dims → explicit broadcast; customer⋈orders is the only real
    shuffle and AQE picks broadcast for customer when it fits. Partial
    (map-side) aggregation runs before the final exchange on r_name.
    """
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            round4(exact_sum(F.col("o_totalprice"))).alias("total_revenue"),
            round4(F.avg("o_totalprice")).alias("avg_order_value"),
        )
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# q03 — string aggregation  (SURVEY §2.4 A4; README.md:550 GROUP_CONCAT)
# --------------------------------------------------------------------------
@query(
    "q03_region_nations",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    tags=("parity", "agg", "string"),
)
def q03_region_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_CONCAT parity: comma-joined sorted member list per group.

    The reference's MySQL GROUP_CONCAT is order-nondeterministic; we sort
    inside the group (sort_array ∘ collect_list) to make the value
    hashable (SURVEY §7 "determinism mismatches"). Scale: collect_list
    is safe only because group cardinality is bounded (nations per
    region); unbounded groups would need a different contract.
    """
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# q04 — group + HAVING  (SURVEY §2.4 A5; README.md:576-587, 591-601)
# --------------------------------------------------------------------------
@query(
    "q04_customer_order_stats",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(*) AS order_count,
           floor((AVG(o_totalprice)) * 10000 + 0.5) / 10000 AS avg_order_value
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    HAVING COUNT(*) >= 15
    ORDER BY order_count DESC, c_custkey
    """,
    tags=("parity", "agg", "having"),
)
def q04_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer stats with a post-aggregate HAVING filter.

    Mirrors "Movies by Director" / "Average Rating by User"
    (README.md:576-587, 591-601): COUNT + AVG per group, HAVING count ≥
    threshold, ordered. Scale: single hash-aggregate shuffle on the
    group key; HAVING is applied above the final aggregate (no extra
    pass).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("order_count"),
            round4(F.avg("o_totalprice")).alias("avg_order_value"),
        )
        .filter(F.col("order_count") >= 15)
        .orderBy(F.desc("order_count"), F.asc("c_custkey"))
    )


# --------------------------------------------------------------------------
# q05 — conditional aggregation  (SURVEY §2.4 A6; README.md:675-681)
# --------------------------------------------------------------------------
@query(
    "q05_order_quality_probe",
    oracle="""
    SELECT COUNT(*) AS total_orders,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_fulfilled,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
           COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS null_price,
           floor((100.0 * COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) / COUNT(*)) * 10000 + 0.5) / 10000
               AS pct_open
    FROM orders
    """,
    tags=("parity", "agg", "quality"),
)
def q05_order_quality_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality probe via conditional aggregation.

    Mirrors the reference's null-count quality check
    (README.md:675-681, SUM(CASE WHEN ... THEN 1 ELSE 0 END)) expressed
    with count-if semantics so both engines yield BIGINT. Scale: single
    full scan, partial aggregation per partition, one-row result.
    """
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count("*").alias("total_orders"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_fulfilled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias("null_price"),
    )
    return agg.withColumn(
        "pct_open", round4(F.lit(100.0) * F.col("n_open") / F.col("total_orders"))
    )


# --------------------------------------------------------------------------
# q06 — value histogram  (SURVEY §2.4 A7; README.md:684-687)
# --------------------------------------------------------------------------
@query(
    "q06_quantity_histogram",
    oracle="""
    SELECT l_quantity, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_quantity
    ORDER BY l_quantity
    """,
    tags=("parity", "agg", "histogram"),
)
def q06_quantity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency distribution over a low-cardinality value column.

    Mirrors the rating histogram (README.md:684-687). Scale: classic
    partial+final hash aggregate; output cardinality is the value
    domain, not the row count.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_quantity")
        .agg(F.count("*").alias("n"))
        .orderBy("l_quantity")
    )


# --------------------------------------------------------------------------
# q07 — anti join  (SURVEY §2.3 J4, §2.7 U1; README.md:484-487)
# --------------------------------------------------------------------------
@query(
    "q07_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    tags=("parity", "join", "anti"),
)
def q07_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that placed no order.

    Mirrors the reference's movies-missing-from-links set difference
    (README.md:484-487, python set minus) as a distributed anti join.
    Scale: shuffle on the key (or broadcast when the right side is
    small); no driver-side sets.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# q08 — regex transform chain  (SURVEY §2.2 P1-P5; etl1.py:92-140)
# --------------------------------------------------------------------------
_Q08_TITLE_SQL = """
    CASE
      WHEN p_partkey % 3 = 0 THEN p_name || ', The (' || CAST(1990 + p_partkey % 30 AS VARCHAR) || ')'
      WHEN p_partkey % 3 = 1 THEN p_name || ' (' || CAST(1990 + p_partkey % 30 AS VARCHAR) || ')'
      ELSE p_name
    END
"""


@query(
    "q08_title_normalize",
    oracle=f"""
    WITH titled AS (
      SELECT p_partkey, {_Q08_TITLE_SQL} AS title FROM part
    ), norm AS (
      SELECT p_partkey, title,
             TRY_CAST(NULLIF(regexp_extract(title, '\\((\\d{{4}})\\)\\s*$', 1), '') AS INTEGER)
                 AS release_year,
             CASE WHEN regexp_extract(title, '\\((\\d{{4}})\\)\\s*$', 1) <> ''
                  THEN TRIM(regexp_replace(title, '\\s*\\(\\d{{4}}\\)\\s*$', ''))
                  ELSE title END AS clean_title,
             regexp_replace(
               TRIM(regexp_replace(
                 regexp_replace(
                   TRIM(regexp_replace(TRIM(title), '\\s*\\([^)]*\\)', '', 'g')),
                   '^(.*), (The|A|An|Le|La|Les)$', '\\2 \\1'),
                 '\\s+', ' ', 'g')),
               '^[, ]+|[, ]+$', '', 'g') AS norm_title
      FROM titled
    )
    SELECT p_partkey, title, release_year, clean_title, norm_title
    FROM norm
    ORDER BY p_partkey
    """,
    tags=("parity", "regex", "transform"),
)
def q08_title_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's title pipeline (etl1.py:92-140) as column exprs.

    Synthesizes MovieLens-shaped titles from `part` (a third with a
    trailing article + year, a third with just a year, a third with no
    year → null release_year path), then applies year extraction, year
    stripping, and full normalization. Scale: pure narrow
    transformations inside whole-stage codegen — no shuffle, no Python.
    """
    part = load_table(spark, sf_dir, "part")
    year_str = (F.lit(1990) + F.col("p_partkey") % 30).cast("string")
    title = (
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.concat(F.col("p_name"), F.lit(", The ("), year_str, F.lit(")")),
        )
        .when(
            F.col("p_partkey") % 3 == 1,
            F.concat(F.col("p_name"), F.lit(" ("), year_str, F.lit(")")),
        )
        .otherwise(F.col("p_name"))
    )
    titled = part.select("p_partkey", title.alias("title"))
    return titled.select(
        "p_partkey",
        "title",
        release_year(F.col("title")).alias("release_year"),
        clean_title(F.col("title")).alias("clean_title"),
        normalize_title(F.col("title")).alias("norm_title"),
    ).orderBy("p_partkey")


# --------------------------------------------------------------------------
# q09 — per-group top-k window  (SURVEY §2.5)
# --------------------------------------------------------------------------
@query(
    "q09_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
      WHERE o_custkey < 200
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tags=("parity", "window", "topk"),
)
def q09_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-3 via ROW_NUMBER — the windowed form of the
    reference's global top-k (SURVEY §2.5 notes this as the natural
    per-genre extension). Scale: one shuffle on the partition key; AQE
    handles skewed customers. rn cast to BIGINT for schema parity.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# --------------------------------------------------------------------------
# q10 — deterministic surrogate keys  (SURVEY §2.9; schema.sql:23)
# --------------------------------------------------------------------------
@query(
    "q10_event_type_dim",
    oracle="""
    SELECT DENSE_RANK() OVER (ORDER BY event_type) AS type_id,
           event_type
    FROM (SELECT DISTINCT event_type FROM events)
    ORDER BY type_id
    """,
    tags=("parity", "window", "surrogate-key"),
)
def q10_event_type_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTO_INCREMENT-parity surrogate keys for a small dimension.

    The reference inserts genres in sorted order so genre_id is the
    1-based alphabetical rank (etl1.py:437, SURVEY §2.9); reproduced as
    dense_rank over the distinct values. Scale: the distinct is
    distributed; only the trivially small dimension passes through the
    single-partition window.
    """
    events = load_table(spark, sf_dir, "events")
    dim = events.select("event_type").distinct()
    w = Window.orderBy("event_type")
    return dim.select(
        F.dense_rank().over(w).cast("long").alias("type_id"), "event_type"
    ).orderBy("type_id")


# --------------------------------------------------------------------------
# q11 — set difference  (SURVEY §2.7 U1)
# --------------------------------------------------------------------------
@query(
    "q11_orderkeys_except_fulfilled",
    oracle="""
    SELECT l_orderkey FROM lineitem
    EXCEPT
    SELECT o_orderkey AS l_orderkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY l_orderkey
    """,
    tags=("parity", "setop"),
)
def q11_orderkeys_except_fulfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT-DISTINCT set difference on a key column.

    Mirrors the reference's pandas set-minus consistency check
    (README.md:484-487) with SQL set semantics. Scale: Spark plans this
    as a left-anti join over distinct keys — shuffle on the key.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fulfilled = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return lineitem.select("l_orderkey").subtract(fulfilled).orderBy("l_orderkey")


# --------------------------------------------------------------------------
# q12 — split + explode + distinct  (SURVEY §2.4 A1; etl1.py:430-433)
# --------------------------------------------------------------------------
@query(
    "q12_name_token_vocabulary",
    oracle="""
    SELECT token, COUNT(*) AS n_parts
    FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
    WHERE token <> ''
    GROUP BY token
    ORDER BY token
    """,
    tags=("parity", "explode", "distinct"),
)
def q12_name_token_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token vocabulary via split+explode — the genre-split pattern.

    The reference splits pipe-delimited genres with a python set loop
    (etl1.py:430-433); here the array is first-class and explode feeds a
    distributed aggregate. Scale: explode is narrow; the aggregate
    shuffles only (token, count) pairs after map-side partial
    aggregation.
    """
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split(F.col("p_name"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("token")
    )


# --------------------------------------------------------------------------
# q13 — tumbling-window time aggregation  (SURVEY §2.10 extension)
# --------------------------------------------------------------------------
@query(
    "q13_hourly_event_stats",
    oracle="""
    SELECT date_trunc('hour', ts) AS ts_hour,
           COUNT(*) AS n_events,
           floor((AVG(value)) * 10000 + 0.5) / 10000 AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY ts_hour
    """,
    tags=("extension", "time", "window-agg"),
)
def q13_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation over the event stream (batch form).

    Uses Spark's window() grouping — the same operator Structured
    Streaming uses with a watermark (streaming variant lives in
    movie_data_pipeline_spark/streaming). 1-hour windows align to epoch
    → start == date_trunc('hour'). Scale: group key is the window start;
    partial aggregation bounds shuffle width.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            round4(F.avg("value")).alias("avg_value"),
        )
        .select(F.col("w.start").alias("ts_hour"), "n_events", "avg_value")
        .orderBy("ts_hour")
    )


# --------------------------------------------------------------------------
# q14 — coercion semantics  (SURVEY §2.2 P7; etl1.py:340-341, 358-360)
# --------------------------------------------------------------------------
@query(
    "q14_coerce_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS INTEGER) AS k_val,
           TRY_CAST(event_type AS INTEGER) AS bad_int
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    tags=("parity", "cast", "regex"),
)
def q14_coerce_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pd.to_numeric(errors='coerce')` parity: invalid → NULL.

    k_val parses a number out of the JSON-ish props string; bad_int
    try-casts a non-numeric column and must be NULL for every row
    (etl1.py:358-360 semantics). try_cast keeps this correct even under
    ANSI sessions. Scale: narrow codegen-only transforms.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.nullif(F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1), F.lit(""))
            .try_cast("int")
            .alias("k_val"),
            F.col("event_type").try_cast("int").alias("bad_int"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# q15 — fact⋈dim revenue  (SURVEY §2.3 J3)
# --------------------------------------------------------------------------
@query(
    "q15_segment_revenue",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_lineitems,
           floor((CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("parity", "join", "agg", "bench"),
)
def q15_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment through the fact⋈dim⋈dim chain.

    The movies⋈ratings fact-dim join (README.md:562-572) at star-schema
    scale. Scale: lineitem⋈orders shuffles on orderkey (or AQE
    broadcasts orders when small); the 5-value segment aggregate is
    map-side combined before a tiny final exchange.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_lineitems"),
            round4(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# q16 — pricing summary (TPC-H Q1 shape)
# --------------------------------------------------------------------------
@query(
    "q16_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((CAST(SUM(CAST((l_quantity) AS DECIMAL(30,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS sum_qty,
           floor((CAST(SUM(CAST((l_extendedprice) AS DECIMAL(30,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS sum_base_price,
           floor((CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS sum_disc_price,
           floor((CAST(SUM(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(30,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS sum_charge,
           floor((AVG(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
           floor((AVG(l_extendedprice)) * 10000 + 0.5) / 10000 AS avg_price,
           floor((AVG(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("parity", "agg", "bench"),
)
def q16_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the heavy-scan benchmark query.

    Exercises the full conditional/compound aggregate surface over the
    fact table. Scale: single pushed-filter scan; 6-group output means
    shuffle traffic is only the partial-aggregate states.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(
            F.col("l_shipdate").cast("date") <= F.lit(datetime.date(1998, 9, 2))
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round4(exact_sum(F.col("l_quantity"))).alias("sum_qty"),
            round4(exact_sum(F.col("l_extendedprice"))).alias("sum_base_price"),
            round4(exact_sum(disc_price)).alias("sum_disc_price"),
            round4(exact_sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            round4(F.avg("l_quantity")).alias("avg_qty"),
            round4(F.avg("l_extendedprice")).alias("avg_price"),
            round4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q28 — multi-fact star join with co-location predicate (TPC-H Q5 shape)
# --------------------------------------------------------------------------
@query(
    "q28_local_supplier_revenue",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_lineitems,
           floor((CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))) AS DOUBLE)) * 10000 + 0.5) / 10000
               AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE s_nationkey = c_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("parity", "join", "agg", "bench"),
)
def q28_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from locally-supplied lineitems per nation (TPC-H Q5
    shape): a 5-table star join with a cross-dimension equality
    predicate (supplier nation == customer nation).

    Scale: nation broadcasts; supplier broadcasts (bounded dim);
    lineitem⋈orders is the big shuffle on orderkey. The s_nationkey =
    c_nationkey predicate is applied post-join by Catalyst (it connects
    two dims only joinable through the facts).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), supplier.s_suppkey == lineitem.l_suppkey)
        .join(nation, nation.n_nationkey == customer.c_nationkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            round4(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# q30 — distinct aggregates (engine completeness; absent in the reference)
# --------------------------------------------------------------------------
@query(
    "q30_priority_distinct_customers",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("parity", "agg", "distinct"),
)
def q30_priority_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group. Scale: Catalyst expands this into a
    two-phase aggregate (distinct on (group, key) then count) — no
    driver-side sets; for sketch-accuracy tradeoffs at extreme scale
    approx_count_distinct swaps in without plan changes.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q31 — ROLLUP subtotals (engine completeness; absent in the reference)
# --------------------------------------------------------------------------
@query(
    "q31_rollup_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           floor((CAST(SUM(CAST((l_extendedprice) AS DECIMAL(30,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS revenue
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    tags=("parity", "agg", "rollup"),
)
def q31_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (flag → flag+status → grand
    total), subtotal rows labeled 'ALL'. Scale: Spark expands rollup
    into a single pass with grouping-set expansion before the exchange —
    still one shuffle.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            round4(exact_sum(F.col("l_extendedprice"))).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n",
            "revenue",
        )
        .orderBy("returnflag", "linestatus")
    )


# --------------------------------------------------------------------------
# q32 — typed JSON parsing (semi-structured props column)
# --------------------------------------------------------------------------
@query(
    "q32_json_props_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           floor((AVG(CAST(json_extract_string(props, '$.k') AS INTEGER))) * 10000 + 0.5) / 10000
               AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("parity", "json", "agg"),
)
def q32_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed parse of the semi-structured props column via from_json
    with a declared schema (the Spark form of the reference's
    field-by-field JSON handling, etl1.py:156-167), then aggregated.

    Scale: from_json is a codegen'd JVM expression — no Python; the
    declared one-field schema prunes the parse to exactly the needed
    key.
    """
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            round4(F.avg("k")).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q33 — exact percentiles (distribution stats; absent in the reference)
# --------------------------------------------------------------------------
@query(
    "q33_price_quantiles",
    oracle="""
    SELECT l_returnflag,
           floor((quantile_cont(l_extendedprice, 0.5)) * 10000 + 0.5) / 10000 AS p50,
           floor((quantile_cont(l_extendedprice, 0.95)) * 10000 + 0.5) / 10000 AS p95,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("parity", "agg", "percentile"),
)
def q33_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (verified bit-identical
    to quantile_cont before quantization).

    Scale: exact percentile sorts within groups — fine for bounded
    groups; at extreme cardinality swap in percentile_approx (t-digest
    sketch, mergeable map-side) without changing the plan shape.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            round4(F.expr("percentile(l_extendedprice, 0.5)")).alias("p50"),
            round4(F.expr("percentile(l_extendedprice, 0.95)")).alias("p95"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q34 — batch sessionization (gap windows via lag + cumulative sum)
# --------------------------------------------------------------------------
@query(
    "q34_user_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN date_diff('microsecond',
                            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                            ts) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           floor((CAST(SUM(CAST((value) AS DECIMAL(30,6))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("extension", "window", "sessionization"),
)
def q34_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: a new session starts when the
    gap to the previous event (per user) exceeds 30 minutes; session id
    is the running count of session starts.

    This is the batch twin of the streaming applyInPandasWithState
    sessionizer (streaming/events.py) — same semantics, pure window
    functions, no Python. Scale: both windows partition by user_id (one
    shuffle, reused across the lag and the running sum via the same
    partitioning).
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_prev = events.select(
        "user_id", "ts", "value", "event_id", F.lag("ts").over(w).alias("prev_ts")
    )
    marked = with_prev.select(
        "user_id",
        "ts",
        "value",
        "event_id",
        F.when(
            F.col("prev_ts").isNull()
            # microsecond grain on both sides: second-level timestampdiff
            # floors elapsed time and disagrees with an exact interval
            # comparison when a gap is a fractional hair over the limit
            | (F.expr("timestampdiff(MICROSECOND, prev_ts, ts)") > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = marked.select(
        "user_id",
        "ts",
        "value",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("session_id"),
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            round4(exact_sum(F.col("value"))).alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# q35 — as-of join (custom operator the reference/Spark lack natively)
# --------------------------------------------------------------------------
@query(
    "q35_asof_click_before_purchase",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_ts
      FROM events)
    SELECT event_id, user_id, ts AS purchase_ts, last_click_ts,
           CAST(CASE WHEN last_click_ts IS NOT NULL
                     THEN date_diff('microsecond', last_click_ts, ts) // 1000000
                END AS BIGINT) AS seconds_since_click
    FROM ordered
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
    tags=("extension", "join", "asof"),
)
def q35_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    STRICTLY-EARLIER click (the backward as-of semantics of
    pandas.merge_asof / kdb aj), expressed as a union-free single-pass
    window: last_value(click ts) ignoring nulls over rows preceding.

    Scale: one shuffle on user_id and a sequential window scan — the
    standard distributed as-of strategy (interleave both sides on the
    time axis within the key partition), no range join explosion.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        events.select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts").alias("purchase_ts"),
            last_click.alias("last_click_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "purchase_ts",
            "last_click_ts",
            # exact micros then floor-divide: Spark's timestampdiff
            # measures elapsed units while DuckDB's date_diff counts
            # boundary crossings — only the microsecond grain (where the
            # data is exact) agrees, so the seconds floor is derived
            F.expr(
                "timestampdiff(MICROSECOND, last_click_ts, purchase_ts) div 1000000"
            ).alias("seconds_since_click"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# q36 — range (interval) join via time-bucket equi-join + refine
# --------------------------------------------------------------------------
@query(
    "q36_nearby_event_pairs",
    oracle="""
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND date_diff('microsecond', a.ts, b.ts) <= 300000000
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
    tags=("extension", "join", "range"),
)
def q36_nearby_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: same-user event pairs within a forward 5-minute
    window, counted by type pair.

    Spark has no native range join, so the scalable form is the
    bucket-and-refine pattern: quantize time into 5-minute bins, join on
    (user, bin) with the left side probing its own and the next bin
    (explode of two bin keys — bounded 2x replication), then apply the
    exact interval predicate. The join stays a shuffle EQUI-join —
    no cartesian anything — and the bin width bounds candidate pairs.
    """
    events = load_table(spark, sf_dir, "events")
    width_us = 300_000_000  # 5 min
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    base = events.select(
        "user_id", "event_type", "ts", micros.alias("us")
    )
    a = base.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("us").alias("us_a"),
        F.explode(
            F.array(
                (F.col("us") / width_us).cast("long"),
                (F.col("us") / width_us).cast("long") + 1,
            )
        ).alias("bin"),
    )
    b = base.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("us").alias("us_b"),
        (F.col("us") / width_us).cast("long").alias("bin"),
    )
    return (
        a.join(b, ["user_id", "bin"])
        .filter(
            (F.col("us_b") > F.col("us_a"))
            & (F.col("us_b") - F.col("us_a") <= width_us)
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------------
# q37 — TF-IDF relevance scoring (training-data quality primitive)
# --------------------------------------------------------------------------
@query(
    "q37_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * ln(n.n_docs * 1.0 / df.df) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tf, CAST(df AS BIGINT) AS df, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY scored.tfidf DESC, term) AS rnk
      FROM scored)
    SELECT doc_id, term, tf, df,
           floor((tfidf) * 10000 + 0.5) / 10000 AS tfidf, rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY doc_id, rnk
    """,
    tags=("extension", "text", "tfidf"),
)
def q37_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic relevance/quality
    scoring primitive for training-data curation.

    Fully relational: term frequencies (one aggregate), document
    frequencies (one aggregate, broadcast back — the term vocabulary is
    tiny relative to the corpus), corpus size as a literal join, window
    top-k per doc. Ranking ties break on the term so near-equal doubles
    cannot reorder the result across engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    from movie_data_pipeline_spark.functions.text import tokens as _tokens
    from movie_data_pipeline_spark.operators.util import spread as _spread

    toks = _spread(docs).select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.count()  # scalar driver value: one count job, constant-folded
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf_raw"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_raw"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            round4(F.col("tfidf_raw")).alias("tfidf"),
            "rnk",
        )
        .orderBy("doc_id", "rnk")
    )


# --------------------------------------------------------------------------
# q38 — pivot (wide conditional aggregation)
# --------------------------------------------------------------------------
@query(
    "q38_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("parity", "agg", "pivot"),
)
def q38_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted by status. The pivot values are declared
    explicitly — with them, Spark plans a single-pass conditional
    aggregate (no extra distinct-values job, no second shuffle), which
    is also exactly how the oracle expresses it.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q39 — deterministic hash sampling (training-data curation primitive)
# --------------------------------------------------------------------------
@query(
    "q39_deterministic_sample",
    oracle="""
    SELECT COUNT(*) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS n_en
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
    """,
    tags=("extension", "sampling"),
)
def q39_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% corpus sample selected by a content-independent md5 hash of
    the id — reproducible across engines, runs, and cluster layouts
    (unlike TABLESAMPLE/rand(), which are partition-dependent). This is
    the sampling contract a training-data pipeline needs: adding or
    re-sharding data never changes which existing rows are sampled.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10
    )
    return docs.filter(bucket == 0).agg(
        F.count("*").alias("n_sampled"),
        F.min("doc_id").alias("first_doc"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_en"),
    )


# --------------------------------------------------------------------------
# q40 — ntile quantile bucketing
# --------------------------------------------------------------------------
@query(
    "q40_price_quartiles",
    oracle="""
    WITH tiled AS (
      SELECT o_totalprice,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders)
    SELECT CAST(quartile AS BIGINT) AS quartile,
           COUNT(*) AS n,
           floor((MIN(o_totalprice)) * 10000 + 0.5) / 10000 AS lo,
           floor((MAX(o_totalprice)) * 10000 + 0.5) / 10000 AS hi
    FROM tiled
    GROUP BY quartile
    ORDER BY quartile
    """,
    tags=("parity", "window", "ntile"),
)
def q40_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count quartile buckets over order prices with per-bucket
    ranges, NTILE semantics. Ties broken by o_orderkey so bucket
    boundaries are engine-independent. No global NTILE window: the
    bucket comes from a distributed global row number
    (``operators/prefix.py`` — range partition on (price, orderkey),
    local row_number, broadcast partition-count offsets) through the
    exact NTILE bucket formula, so the total order is computed by a
    parallel range sort, never a single task.
    """
    from movie_data_pipeline_spark.operators.prefix import (
        attach_global_row_number,
        ntile_from_row_number,
    )

    orders = load_table(spark, sf_dir, "orders")
    ranked, n_orders = attach_global_row_number(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        "rn",
    )
    tiled = ranked.select(
        "o_totalprice",
        ntile_from_row_number(F.col("rn"), n_orders, 4)
        .cast("long")
        .alias("quartile"),
    )
    return (
        tiled.groupBy("quartile")
        .agg(
            F.count("*").alias("n"),
            round4(F.min("o_totalprice")).alias("lo"),
            round4(F.max("o_totalprice")).alias("hi"),
        )
        .orderBy("quartile")
    )


# --------------------------------------------------------------------------
# q106 — weighted deterministic sampling (sequential Poisson / Ohlsson)
# --------------------------------------------------------------------------
@query(
    "q106_weighted_sample",
    oracle="""
    WITH pri AS (
      SELECT o_orderkey, o_totalprice,
             (CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                   AS BIGINT) AS DOUBLE) / 4294967296.0)
               / CAST(o_totalprice AS DOUBLE) AS priority
      FROM orders),
    ranked AS (
      SELECT o_orderkey, o_totalprice, priority,
             ROW_NUMBER() OVER (ORDER BY priority, o_orderkey) AS rnk
      FROM pri)
    SELECT CAST(rnk AS BIGINT) AS rnk, o_orderkey, o_totalprice,
           floor((priority * 10000000.0) * 10000 + 0.5) / 10000 AS priority_scaled
    FROM ranked WHERE rnk <= 50
    ORDER BY rnk
    """,
    tags=("extension", "sampling", "weighted"),
)
def q106_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-without-replacement sample of 50 orders, probability
    proportional to o_totalprice, via sequential Poisson sampling
    (Ohlsson 1998): priority = u/w with u a deterministic md5-derived
    uniform in [0,1), keep the k smallest priorities.

    Same reproducibility contract as q39's unweighted sampler — the
    selected set is a pure function of row identity and weight, stable
    across engines, runs, resharding, and appends (new rows can only
    displace, never reshuffle, survivors). One TakeOrderedAndProject
    job at scale: no full sort, no rand(), no partition-order
    dependence. The md5→uint32→[0,1) bridge is the engine-portable
    hash established by functions/text.base_hash32.
    """
    from movie_data_pipeline_spark.functions.text import base_hash32

    orders = load_table(spark, sf_dir, "orders")
    u = base_hash32(F.col("o_orderkey").cast("string")).cast("double") / F.lit(
        4294967296.0
    )
    pri = orders.select(
        "o_orderkey",
        "o_totalprice",
        (u / F.col("o_totalprice").cast("double")).alias("priority"),
    )
    # Top-k first (TakeOrderedAndProject — no global sort, no global
    # window), then rank only the k survivors.
    top = pri.orderBy("priority", "o_orderkey").limit(50)
    w = Window.orderBy("priority", "o_orderkey")
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .select(
            "rnk",
            "o_orderkey",
            "o_totalprice",
            round4(F.col("priority") * F.lit(10000000.0)).alias("priority_scaled"),
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# q124 — FILTER-clause aggregates + set aggregation per group
# --------------------------------------------------------------------------
@query(
    "q124_nation_segment_profile",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_customers,
           COUNT(*) FILTER (WHERE c.c_acctbal > 0) AS n_positive_bal,
           COUNT(DISTINCT c.c_mktsegment) AS n_segments,
           array_to_string(list_sort(list(DISTINCT c.c_mktsegment)), ',')
             AS segments,
           floor((CAST(COUNT(*) FILTER (WHERE c.c_acctbal > 0) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE)) * 10000 + 0.5) / 10000
             AS positive_share
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY nation
    ORDER BY nation
    """,
    tags=("parity", "aggregate", "filter-clause", "set-agg"),
)
def q124_nation_segment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer profile: FILTER-clause conditional counts,
    COUNT(DISTINCT), and the distinct segment set aggregated to one
    sorted string — the remaining ANSI aggregate modifiers (FILTER,
    set-valued aggregation) in one group-by.

    Spark has no FILTER clause on DataFrame aggregates; the exact
    equivalent is count(when(pred, 1)) — null-skipping count, identical
    semantics including all-false groups. The set aggregate is
    collect_set → sort_array → array_join (same determinism rule as
    q03's GROUP_CONCAT: impose the order, never trust engine
    aggregation order). All one hash aggregate with map-side partials;
    the string join renders group-local tiny arrays (bounded by the
    segment domain, 5 values), not data-sized state.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n_pos = F.count(F.when(F.col("c_acctbal") > 0, 1))
    return (
        customer.join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation")
        .agg(
            F.count("*").alias("n_customers"),
            n_pos.alias("n_positive_bal"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.array_join(
                F.sort_array(F.collect_set("c_mktsegment")), ","
            ).alias("segments"),
            round4(
                n_pos.cast("double") / F.count("*").cast("double")
            ).alias("positive_share"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# q148 — shipping lateness by priority (TPC-H Q12 shape)
# --------------------------------------------------------------------------
@query(
    "q148_priority_lateness",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           COUNT(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                     CAST(l.l_shipdate AS DATE)) > 90
                 THEN 1 END) AS n_late,
           {r4("COUNT(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) > 90 THEN 1 END) * 1.0 / COUNT(*)")} AS late_share
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("parity-extension", "tpch-q12", "join", "agg"),
)
def q148_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship-after-90-days lateness split per order priority — the
    TPC-H Q12 shape (commitdate/shipmode folded to the columns this
    star actually has). One fact-fact equi-join on the order key
    feeding a 5-group conditional aggregate: the join shuffles both
    sides on l_orderkey/o_orderkey (AQE skew-splits a hot order), the
    aggregate is partial+final with 5 groups, and datediff runs in
    codegen on DATE-cast columns (both engines count calendar-day
    boundaries, so the >90 threshold is portable).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        > 90
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.count(F.when(late, 1)).alias("n_late"),
            round4(
                F.count(F.when(late, 1)).cast("double")
                / F.count("*").cast("double")
            ).alias("late_share"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q150 — cheapest supplier per part in a region (TPC-H Q2 shape)
# --------------------------------------------------------------------------
@query(
    "q150_cheapest_economy_supplier",
    oracle="""
    WITH eu_supp AS (
      SELECT s.s_suppkey, s.s_name, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'),
    pair_min AS (
      SELECT l.l_partkey, l.l_suppkey, MIN(l.l_extendedprice) AS min_price
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
      JOIN eu_supp s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    best AS (
      SELECT *, MIN(min_price) OVER (PARTITION BY l_partkey) AS best_price
      FROM pair_min)
    SELECT b.l_partkey AS p_partkey, p.p_name, s.s_name, s.n_name,
           floor(b.min_price * 10000 + 0.5) / 10000 AS min_price
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN eu_supp s ON s.s_suppkey = b.l_suppkey
    WHERE b.min_price = b.best_price
    ORDER BY p_partkey, s_name
    """,
    tags=("parity-extension", "tpch-q2", "join", "window"),
)
def q150_cheapest_economy_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest EUROPE supplier(s) per ECONOMY part — the TPC-H Q2
    correlated-minimum shape over this star's lineitem bridge (no
    partsupp table; the cheapest observed line price stands in for
    ps_supplycost, deliberately avoiding a division so the compared
    doubles are raw parquet values and the float equality against the
    per-part minimum is bit-safe in both engines).

    Plan: both dims broadcast (part filtered to one type, the
    supplier⋈nation⋈region chain filtered to one region) into the fact
    scan; one shuffle for the (part, supp) MIN; the per-part best is a
    window MIN partitioned by partkey riding the same exchange —
    Catalyst reuses the hash partitioning, so the correlated subquery
    costs no extra shuffle. Ties are kept, as in Q2.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    eu_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load_table(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    pair_min = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eu_supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        # Partition on l_partkey alone: HashPartitioning(l_partkey)
        # satisfies the (l_partkey, l_suppkey) aggregate's clustered
        # distribution AND the window's partitionBy(l_partkey), so the
        # correlated-minimum runs on ONE exchange instead of two.
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_partkey")
    best = pair_min.withColumn("best_price", F.min("min_price").over(w)).filter(
        F.col("min_price") == F.col("best_price")
    )
    return (
        best.join(
            F.broadcast(part.select("p_partkey", "p_name")),
            best.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(eu_supp), best.l_suppkey == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            round4(F.col("min_price")).alias("min_price"),
        )
        .orderBy("p_partkey", "s_name")
    )


# --------------------------------------------------------------------------
# q151 — suppliers over fair share of a part's volume (TPC-H Q20 shape)
# --------------------------------------------------------------------------
@query(
    "q151_overweight_suppliers",
    oracle=f"""
    WITH small_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    pair_qty AS (
      SELECT l.l_partkey, l.l_suppkey,
             {exact_sum_sql('l.l_quantity')} AS pair_qty
      FROM lineitem l JOIN small_parts sp ON l.l_partkey = sp.p_partkey
      GROUP BY 1, 2),
    part_tot AS (
      SELECT l_partkey,
             CAST(SUM(CAST(pair_qty AS DECIMAL(30,6))) AS DOUBLE) AS total_qty,
             COUNT(*) AS n_suppliers
      FROM pair_qty GROUP BY 1),
    overweight AS (
      SELECT pq.l_suppkey, pq.l_partkey
      FROM pair_qty pq JOIN part_tot pt ON pq.l_partkey = pt.l_partkey
      WHERE pq.pair_qty * pt.n_suppliers > 1.5 * pt.total_qty
        AND pt.n_suppliers > 1)
    SELECT s.s_suppkey, s.s_name, n.n_name,
           COUNT(*) AS n_overweight_parts
    FROM overweight o
    JOIN supplier s ON o.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2, 3
    ORDER BY s_suppkey
    """,
    tags=("parity-extension", "tpch-q20", "join", "semi"),
)
def q151_overweight_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping more than 1.5x their fair share of any
    'small%' part's volume — the TPC-H Q20 nested-subquery shape
    (LIKE-filtered part dim, per-(part, supplier) aggregate compared
    against a correlated per-part threshold, survivors folded onto the
    supplier dim). The fair-share form ``pair_qty * n_suppliers >
    1.5 * total_qty`` is scale-invariant (meaningful at any sf, unlike
    an absolute share cut) and multiplication-only over decimal-exact
    sums, so the threshold is portable across engines.

    Plan: part filter broadcasts into the fact scan; the (part, supp)
    aggregate's exchange is reused by the per-part rollup (two
    aggregates, one shuffle); the supplier/nation joins run on the
    small survivor set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    small_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    pair_qty = (
        li.join(F.broadcast(small_parts), li.l_partkey == F.col("p_partkey"))
        # One exchange serves the (part, supp) aggregate, the per-part
        # rollup, AND the threshold join — all keyed by l_partkey
        # (subset-clustering satisfaction, same trick as q150).
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(exact_sum(F.col("l_quantity")).alias("pair_qty"))
    )
    part_tot = pair_qty.groupBy("l_partkey").agg(
        F.sum(F.col("pair_qty").cast("decimal(30,6)"))
        .cast("double")
        .alias("total_qty"),
        F.count("*").alias("n_suppliers"),
    )
    overweight = pair_qty.join(part_tot, "l_partkey").filter(
        (F.col("pair_qty") * F.col("n_suppliers") > F.lit(1.5) * F.col("total_qty"))
        & (F.col("n_suppliers") > 1)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        overweight.join(supplier, overweight.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.count("*").alias("n_overweight_parts"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q159 — diversified top-k (global top-k under a per-group quota)
# --------------------------------------------------------------------------
@query(
    "q159_diversified_top_orders",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS per_cust
      FROM orders)
    SELECT o_orderkey, o_custkey, o_totalprice, CAST(per_cust AS BIGINT) AS per_cust
    FROM ranked WHERE per_cust <= 2
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("extension", "topk", "window"),
)
def q159_diversified_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 orders by price with AT MOST 2 PER CUSTOMER — the
    diversified-ranking shape (search results, recommendation slates,
    account exposure caps) that a plain ORDER BY ... LIMIT cannot
    express.

    One per-customer window (partition-parallel) applies the quota,
    then the global top-k is TakeOrderedAndProject over the quota
    survivors — never a full sort. Spark ≥3.5's WindowGroupLimit
    pushdown prunes each customer partition to its first 2 rows before
    the rank even materializes, so the intermediate is |customers|·2
    rows, not |orders|.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("per_cust", F.row_number().over(w).cast("long"))
        .filter(F.col("per_cust") <= 2)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice", "per_cust")
    )


# --------------------------------------------------------------------------
# q160 — exact largest-remainder proration (financial allocation)
# --------------------------------------------------------------------------
@query(
    "q160_rebate_proration",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS line_cents
      FROM lineitem),
    o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 10 + 0.5) AS BIGINT) AS rebate_cents
      FROM orders),
    base AS (
      SELECT li.l_orderkey, li.l_linenumber, li.line_cents, o.rebate_cents,
             SUM(li.line_cents) OVER (PARTITION BY li.l_orderkey) AS order_cents,
             COUNT(*) OVER (PARTITION BY li.l_orderkey) AS n_lines
      FROM li JOIN o ON li.l_orderkey = o.o_orderkey),
    alloc AS (
      SELECT *,
             (rebate_cents * line_cents) // order_cents AS floor_alloc,
             (rebate_cents * line_cents) % order_cents AS remainder,
             rebate_cents - SUM((rebate_cents * line_cents) // order_cents)
               OVER (PARTITION BY l_orderkey) AS shortfall
      FROM base),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY remainder DESC, l_linenumber,
                                         line_cents) AS rr
      FROM alloc)
    SELECT l_orderkey, l_linenumber,
           CAST(floor_alloc + CASE WHEN rr <= shortfall THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM ranked
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("extension", "financial", "exact-arithmetic", "window"),
)
def q160_rebate_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proration: a 10% order rebate (integer cents)
    allocated across the order's lineitems proportionally to line
    price, with the rounding shortfall assigned one cent at a time to
    the largest remainders — so per-order allocations sum EXACTLY to
    the rebate (the invariant financial ledgers require; naive
    round(share) drifts by ±cents per order).

    Everything is 64-bit integer arithmetic after one half-up
    cents-quantization of the parquet doubles (floor(x*100+0.5) —
    elementary IEEE ops, bit-identical across engines): products,
    floor-division, modulo, and the remainder ranking are exact, so
    the oracle match is by construction, not luck. All windows
    partition by l_orderkey (bounded by lines per order) and share one
    exchange. The per-order sum invariant is asserted in tests over
    every order at sf0.01.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("line_cents"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 10 + F.lit(0.5))
        .cast("long")
        .alias("rebate_cents"),
    )
    wo = Window.partitionBy("l_orderkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("order_cents", F.sum("line_cents").over(wo))
        .withColumn(
            "floor_alloc",
            F.expr("(rebate_cents * line_cents) div order_cents"),
        )
        .withColumn(
            "remainder", F.expr("(rebate_cents * line_cents) % order_cents")
        )
        .withColumn(
            "shortfall",
            F.col("rebate_cents") - F.sum("floor_alloc").over(wo),
        )
    )
    # (l_orderkey, l_linenumber) is NOT unique in this synthetic data;
    # line_cents completes the tie-break so the only remaining ties are
    # full-duplicate rows, whose +1 assignment is multiset-invariant.
    wr = Window.partitionBy("l_orderkey").orderBy(
        F.desc("remainder"), F.asc("l_linenumber"), F.asc("line_cents")
    )
    return (
        base.withColumn("rr", F.row_number().over(wr))
        .select(
            "l_orderkey",
            "l_linenumber",
            (
                F.col("floor_alloc")
                + F.when(F.col("rr") <= F.col("shortfall"), 1).otherwise(0)
            ).alias("alloc_cents"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# q163 — percent-of-parent hierarchy shares (region → nation)
# --------------------------------------------------------------------------
@query(
    "q163_hierarchy_shares",
    oracle=f"""
    WITH rev AS (
      SELECT r.r_name, n.n_name,
             {exact_sum_sql('o.o_totalprice')} AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name),
    region_tot AS (
      SELECT r_name, CAST(SUM(CAST(revenue AS DECIMAL(30,6))) AS DOUBLE)
               AS region_rev
      FROM rev GROUP BY r_name),
    grand AS (
      SELECT CAST(SUM(CAST(revenue AS DECIMAL(30,6))) AS DOUBLE) AS total_rev
      FROM rev)
    SELECT rev.r_name, rev.n_name,
           {r4('rev.revenue')} AS revenue,
           {r4('rev.revenue / rt.region_rev')} AS share_of_region,
           {r4('rt.region_rev / g.total_rev')} AS region_share_of_total
    FROM rev JOIN region_tot rt ON rev.r_name = rt.r_name CROSS JOIN grand g
    ORDER BY rev.r_name, rev.n_name
    """,
    tags=("extension", "hierarchy", "agg"),
)
def q163_hierarchy_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent shares down the geography hierarchy: every
    nation's share of its region's revenue and every region's share of
    the total — the drill-down navigation layer BI tools put on top of
    a rollup (q31 produces the subtotals; this produces the RATIOS
    between adjacent levels, which a ROLLUP alone does not).

    One star-chain aggregate (broadcast dims into the fact scan), then
    the parent totals re-aggregate the 25-row result and broadcast-join
    back — no windows, no second fact scan. Every cross-row sum is
    DECIMAL-exact; the shares divide those exact sums, so both engines
    produce identical doubles.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(exact_sum(F.col("o_totalprice")).alias("revenue"))
    )
    region_tot = rev.groupBy("r_name").agg(
        F.sum(F.col("revenue").cast("decimal(30,6)"))
        .cast("double")
        .alias("region_rev")
    )
    grand = rev.agg(
        F.sum(F.col("revenue").cast("decimal(30,6)"))
        .cast("double")
        .alias("total_rev")
    )
    return (
        rev.join(F.broadcast(region_tot), "r_name")
        .crossJoin(F.broadcast(grand))
        .select(
            "r_name",
            "n_name",
            round4(F.col("revenue")).alias("revenue"),
            round4(F.col("revenue") / F.col("region_rev")).alias(
                "share_of_region"
            ),
            round4(F.col("region_rev") / F.col("total_rev")).alias(
                "region_share_of_total"
            ),
        )
        .orderBy("r_name", "n_name")
    )
