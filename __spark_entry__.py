"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the query catalog in
``movie_data_pipeline_spark.plans`` — every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extensions) registers there as a
(Spark builder, DuckDB oracle SQL) pair with aligned column names and
rounding.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from movie_data_pipeline_spark.plans import REGISTRY

FLAGSHIP = "q02_region_revenue"
SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The verification driver records CORRECTNESS rows for the first 50
# entries of the ``queries()`` dict in INSERTION order (proven by
# CORRECTNESS_r02: the verified set was exactly the first 50 entries of
# the sorted-by-canonical-name dict, not the ``a_``-aliased sort order).
# To rotate driver coverage across the full catalog, the dict is built
# with never-driver-verified queries inserted FIRST — an explicit
# priority window (heaviest extension operators + the oldest unverified
# block), then the remaining unverified sorted, then the verified
# sorted.  Canonical names stay in
# ``movie_data_pipeline_spark.plans.REGISTRY`` and in all tests/bench.
#
# The verified set is DERIVED from the CORRECTNESS_r{N}.json files the
# driver itself writes into the repo root — a name counts as verified
# only when its row was fully green (rows+schema+hash, no err) in some
# round. No per-round manual update, nothing to forget: the next
# round's files extend the set automatically, and a RED row keeps its
# query in the re-verification window.


def _load_driver_verified() -> frozenset[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    verified: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)  # rows-only checks
                and not row.get("err")
            )
            if green:
                verified.add(key[2:] if key.startswith("a_") else key)
    return frozenset(verified)


_DRIVER_VERIFIED: frozenset[str] = _load_driver_verified()


# Hand-picked head of this round's 50-query verification window: the
# heaviest extension operators (VERDICT r2 "promote these first") ahead
# of the oldest unverified block.  Names not in REGISTRY are ignored.
_PRIORITY: tuple[str, ...] = (
    "q204_streaming_hourly_upsert",  # streaming replay — VERDICT r2 #7
    "q205_streaming_dedup_gate",  # streaming ingest-gate replay
    "q206_source_mixing_weights", "q208_quality_quantile_gate",
    "q209_cluster_best_rep",
    "q210_streaming_drift_replay",  # drift-monitor sink replay
    "q220_streaming_join_replay",  # stream-stream interval join replay
    "q221_streaming_session_replay",  # native session-window replay
    "q63_duplicate_clusters", "q72_sequence_packing", "q92_pii_redaction",
    "q144_ppjoin_pairs", "q146_span_scrubbed_corpus",
    "q149_containment_pairs", "q174_semantic_dedup",
    "q175_entity_resolution",
)


def _qnum(name: str) -> tuple[int, str]:
    digits = ""
    for ch in name[1:]:
        if not ch.isdigit():
            break
        digits += ch
    return (int(digits) if digits else 10**9, name)


def _rotation_order() -> list[str]:
    """Catalog names, never-driver-verified first (priority window, then
    remaining unverified in ascending query number — oldest block first
    — then verified sorted)."""
    priority = [n for n in _PRIORITY if n in REGISTRY]
    rest_unverified = sorted(
        (n for n in REGISTRY
         if n not in _DRIVER_VERIFIED and n not in priority),
        key=_qnum,
    )
    verified = sorted(n for n in REGISTRY if n in _DRIVER_VERIFIED)
    return priority + rest_unverified + verified


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY[FLAGSHIP].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].build for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {
        name: REGISTRY[name].oracle
        for name in _rotation_order()
        if REGISTRY[name].oracle is not None
    }
