"""Every registered query with an oracle must match DuckDB exactly —
the same comparison the verification driver runs at sf=0.01 (run here at
sf=0.001 for speed; a marked slow test repeats at sf=0.01).
"""

from __future__ import annotations

import pytest

from movie_data_pipeline_spark.plans import REGISTRY
from tests.conftest import ORACLE_SF_DIR, TESTDATA_SF_DIR
from tests.oracle_harness import compare, duckdb_connection

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(TESTDATA_SF_DIR)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, con, name):
    spec = REGISTRY[name]
    spark_df = spec.build(spark, TESTDATA_SF_DIR)
    oracle_df = con.execute(spec.oracle).df()
    compare(spark_df, oracle_df, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.build(spark, TESTDATA_SF_DIR)
    assert df.count() >= 0
    assert df.schema.fieldNames()


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_sf001(spark, name):
    spec = REGISTRY[name]
    con = duckdb_connection(ORACLE_SF_DIR)
    compare(spec.build(spark, ORACLE_SF_DIR), con.execute(spec.oracle).df(), name)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert q


def test_rotation_window_is_fresh():
    """The driver records CORRECTNESS rows for the first 50 queries()
    entries in INSERTION order (VERDICT r2 #1); the dict must therefore
    lead with never-driver-verified queries, every window entry must
    carry an oracle (a rows-only check wastes a scarce driver row), and
    the full catalog must be present exactly once."""
    import __spark_entry__ as e

    names = list(e.queries())
    assert len(names) == len(set(names)) == len(REGISTRY)
    window = names[:50]
    # Already-verified names may only re-enter the window via the
    # explicit _FORCE_REVERIFY list (semantics changed this round).
    assert set(window) & e._DRIVER_VERIFIED <= set(e._FORCE_REVERIFY)
    oracles = e.oracle_sql()
    assert all(n in oracles for n in window)
    # verified names are still served (tail), under canonical names
    assert set(names) == set(REGISTRY)


def test_force_reverify_reenters_window(monkeypatch):
    """A verified name listed in _FORCE_REVERIFY re-enters the head of
    the rotation (semantics changed → its old green row is stale);
    names absent from it stay in the verified tail."""
    import __spark_entry__ as e

    verified = sorted(e._DRIVER_VERIFIED)[:2]
    if len(verified) < 2:
        return  # no CORRECTNESS files present — nothing to re-verify
    forced, control = verified[0], verified[1]
    monkeypatch.setattr(e, "_FORCE_REVERIFY", (forced,))
    order = e._rotation_order()
    assert len(order) == len(set(order)) == len(REGISTRY)
    assert order.index(forced) < 50
    # the non-forced verified name stays behind every unverified one
    first_verified_tail = min(
        order.index(n) for n in e._DRIVER_VERIFIED if n != forced
    )
    assert order.index(control) >= first_verified_tail
