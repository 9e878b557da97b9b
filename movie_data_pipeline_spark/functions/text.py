"""Shared text column expressions: tokenization, shingling, portable
hashing. All pure built-in expressions (codegen'd, no Python UDFs).

The 32-bit base hash is the first 8 hex chars of md5 — chosen because
both Spark and the DuckDB correctness oracle can compute it exactly
(``conv(substring(md5(x),1,8),16,10)`` / ``('0x' || substr(md5(x),1,8))::BIGINT``),
making MinHash/SimHash signatures byte-reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (keeps duplicate occurrences)."""
    return F.split(F.lower(F.trim(text)), TOKEN_SPLIT_RE)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; a doc shorter than n words yields
    one whole-doc shingle. Pure array expressions — no explode yet, so
    callers control when the row multiplication happens.
    """
    t = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(t) >= n, grams).otherwise(F.array(F.array_join(t, " ")))
    )


def base_hash32(col: Column) -> Column:
    """Deterministic 32-bit hash as BIGINT, identical across engines."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
