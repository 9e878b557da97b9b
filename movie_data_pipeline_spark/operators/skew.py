"""Skew mitigation operators.

AQE (enabled in session.py) handles skewed *sort-merge joins* by
splitting oversized partitions at runtime. Two situations it does not
cover get explicit operators here:

- ``salted_aggregate``: a groupBy whose per-group state is *large*
  (collect_list-like or high-cardinality distinct) on a hot key. Spark's
  partial aggregation already absorbs skew for small states (count/sum);
  for large states the hot key's final aggregation still lands on one
  task. Salting splits each key into ``n_salts`` subkeys, aggregates
  partials per subkey, then merges the (key, partial) rows — two small
  shuffles instead of one skewed one.
- ``salted_join``: a shuffle equi-join where one side has hot keys and
  the other side is too big to broadcast. The hot side gets a random
  salt in [0, n); the other side is replicated n ways with every salt
  value. Join key becomes (key, salt). Replication cost is n× the
  *non-hot* side — apply to the hot-keys subset only (callers filter
  via ``hot_keys``).

Both are deterministic given a deterministic salt column; the default
salt hashes a caller-chosen unique column (no RNG, reproducible runs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F


def deterministic_salt(unique_col: str | Column, n_salts: int) -> Column:
    """Reproducible salt in [0, n_salts) from a unique column (pmod of
    a 64-bit hash — stable across runs, unlike rand())."""
    return F.pmod(F.xxhash64(unique_col), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: Callable[[], list[Column]],
    merge_aggs: Callable[[], list[Column]],
    salt: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: (keys, salt) partials → keys merge.

    ``partial_aggs``/``merge_aggs`` build the per-stage aggregate lists
    (fresh Column objects per call). Example — distinct count on a hot
    key::

        salted_aggregate(
            events, ["event_type"],
            partial_aggs=lambda: [F.collect_set("user_id").alias("us")],
            merge_aggs=lambda: [
                F.size(F.array_distinct(F.flatten(F.collect_list("us"))))
                 .alias("n_users")],
            salt=deterministic_salt("event_id", 64), n_salts=64)
    """
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*partial_aggs())
    )
    return partial.groupBy(*key_cols).agg(*merge_aggs())


def salted_join(
    hot: DataFrame,
    other: DataFrame,
    key: str,
    salt_unique_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join resilient to hot keys on the ``hot`` side.

    ``hot`` rows get a deterministic salt; ``other`` is exploded n_salts
    ways so every (key, salt) bucket finds its match. The join key
    (key, salt) spreads each hot key over n_salts tasks.
    """
    salted_hot = hot.withColumn("__salt", deterministic_salt(salt_unique_col, n_salts))
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_hot.join(replicated, [key, "__salt"]).drop("__salt")
