"""Query registry plumbing.

Each query is a named pair: a Spark DataFrame builder ``(spark, sf_dir)
-> DataFrame`` and (where SQL-expressible) an equivalent ANSI/DuckDB SQL
string run against the same parquet tables by the verification driver.
Column names and rounding are aligned on both sides because the driver
hash-compares values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Builder = Callable[[SparkSession, str], DataFrame]


def round4(col: Column) -> Column:
    """Cross-engine-deterministic 4-decimal rounding for doubles.

    Engine-native ROUND is implementation-defined at half boundaries
    (Spark rounds the shortest decimal repr via BigDecimal; DuckDB
    multiplies first, picking up a ulp of error — observed to disagree on
    identical input bits). floor(x*1e4 + 0.5)/1e4 uses only elementary
    IEEE-754 ops, which are bit-identical across engines for identical
    input. Intended for non-negative measures (half-up toward +inf).
    """
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def r4(expr: str) -> str:
    """DuckDB-side mirror of :func:`round4` for oracle SQL strings."""
    return f"floor(({expr}) * 10000 + 0.5) / 10000"


def exact_sum(col: Column) -> Column:
    """Order-independent cross-engine SUM for double measures.

    A plain double SUM accumulates in engine- and partition-order; on
    large groups the engines drift by ~1e-5 absolute — enough to land on
    opposite sides of a round4 boundary (observed on 6e9-magnitude
    revenue sums at sf0.1). Casting each term to DECIMAL(30,6) first
    makes the aggregation exact integer arithmetic (identical in any
    order on both engines); the result returns to double via a correctly
    rounded conversion of the same exact decimal.
    """
    return F.sum(col.cast("decimal(30,6)")).cast("double")


def exact_sum_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`exact_sum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
