"""Explicit StructType schemas.

At 100 TB schema inference is a full extra scan, so every source is read
with a declared schema (SURVEY.md §1.2). Two schema families live here:

- the driver-generated synthetic testdata tables (TESTDATA.md), typed to
  match their parquet physical types exactly (timestamps are NTZ — the
  files carry no timezone annotation, and the DuckDB oracle reads them as
  naive timestamps; declaring NTZ keeps both engines in the same time
  semantics regardless of the session timezone);
- the MovieLens-shaped CSV inputs of the reference pipeline
  (reference etl1.py:55-60 infers these; we declare them).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


# --- driver synthetic tables (TESTDATA.md) ---------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _st(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _st(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _st(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _st(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampNTZType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampNTZType()),
    ),
    # events.ts encoding varies across driver generations: TIMESTAMP(NANOS)
    # (which Spark's reader rejects as a timestamp type — read the raw INT64
    # nanos and convert arithmetically in the loader) or plain
    # TIMESTAMP(MICROS) (read directly as NTZ). The loader sniffs the
    # parquet footer and picks the matching schema.
    "events": _st(
        ("event_id", LongType()),
        ("ts", LongType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "events_ntz": _st(
        ("event_id", LongType()),
        ("ts", TimestampNTZType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _st(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _st(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}


# --- MovieLens-shaped CSV inputs (reference data model, SURVEY.md §1.2) ----

MOVIES_CSV_SCHEMA = _st(
    ("movieId", IntegerType()),
    ("title", StringType()),
    ("genres", StringType()),
)

# ratings are read as strings and coerced (reference etl1.py:358-364 uses
# pd.to_numeric(errors='coerce') + dropna — dirty rows must become null,
# then be dropped when a required key is null).
RATINGS_CSV_SCHEMA = _st(
    ("userId", StringType()),
    ("movieId", StringType()),
    ("rating", StringType()),
    ("timestamp", StringType()),
)

LINKS_CSV_SCHEMA = _st(
    ("movieId", IntegerType()),
    ("imdbId", IntegerType()),
    ("tmdbId", IntegerType()),
)
