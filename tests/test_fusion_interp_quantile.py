"""Semantics tests for RRF fusion (q260), linear interpolation (q261),
and the histogram quantile audit (q262) on crafted data with known
answers; the synthetic corpus drives the oracle hash checks.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from movie_data_pipeline_spark.plans import REGISTRY


def _write_events(base, rows):
    """rows: (event_id, ts datetime, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(base / "events.parquet"))
    return str(base)


def test_interpolation_fills_gap_linearly(spark, tmp_path):
    """User 1 observes value 10 at hour 0 and 40 at hour 3: the two gap
    hours must read 20 and 30 exactly; observed hours pass through."""
    base = tmp_path / "ev1"
    base.mkdir()
    h = lambda k: dt.datetime(2024, 1, 1, k, 30)
    rows = [
        (1, h(0), 1, "view", 10.0),
        (2, h(3), 1, "view", 40.0),
        # a second user with no gaps (single hour) must pass through
        (3, h(5), 2, "view", 7.0),
    ]
    d = _write_events(base, rows)
    out = REGISTRY["q261_hourly_interpolation"].build(spark, d)
    got = {(r.user_id, r.hour.hour): (r.value_interp, r.observed)
           for r in out.collect()}
    assert got[(1, 0)] == (10.0, True)
    assert got[(1, 1)] == (20.0, False)
    assert got[(1, 2)] == (30.0, False)
    assert got[(1, 3)] == (40.0, True)
    assert got[(2, 5)] == (7.0, True)
    assert len(got) == 5


def test_interpolation_agrees_with_locf_on_observed(spark, tmp_path):
    """On observed hours the two fill modes are the same pass-through:
    q261 and q64 must agree wherever observed is True."""
    base = tmp_path / "ev2"
    base.mkdir()
    h = lambda k: dt.datetime(2024, 3, 5, k, 15)
    rows = [
        (i, h(k), 1, "view", float(v))
        for i, (k, v) in enumerate([(0, 5), (2, 9), (6, 1), (7, 8)])
    ]
    d = _write_events(base, rows)
    interp = REGISTRY["q261_hourly_interpolation"].build(spark, d)
    locf = REGISTRY["q64_hourly_locf"].build(spark, d)
    iv = {(r.user_id, r.hour): r.value_interp
          for r in interp.collect() if r.observed}
    lv = {(r.user_id, r.hour): r.value_filled
          for r in locf.collect() if r.observed}
    assert iv == lv and len(iv) == 4


def test_quantile_sketch_bound_and_exact_side(spark, tmp_path):
    """Values 1..128 for one type: exact p50 is the 64th value (64.0);
    every estimate must sit within its half-bin-width of the exact
    order statistic (the bound the sketch is supposed to honor)."""
    base = tmp_path / "ev3"
    base.mkdir()
    t0 = dt.datetime(2024, 6, 1, 0, 0)
    rows = [(i, t0, 1, "click", float(i)) for i in range(1, 129)]
    d = _write_events(base, rows)
    out = REGISTRY["q262_histogram_quantile_audit"].build(spark, d)
    got = {r.quantile: r for r in out.collect()}
    assert set(got) == {"p50", "p95", "p99"}
    assert got["p50"].exact_val == 64.0  # ceil(0.5*128) = 64th of 1..128
    assert got["p95"].exact_val == 122.0  # ceil(0.95*128) = 122
    for r in got.values():
        assert r.n_rows == 128
        assert r.abs_err <= r.half_bin_width + 1e-9


def test_rrf_scores_self_consistent(spark):
    """On the sf0.001 corpus: every fused row's score must equal the
    RRF formula recomputed from its own rank columns, rows must be
    ordered by (score desc, doc_id), and any doc ranked #1 by BM25
    must outscore a doc present in neither list's head."""
    import math

    from movie_data_pipeline_spark.plans.text import RRF_K

    out = REGISTRY["q260_rrf_hybrid_fusion"].build(
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    assert 0 < len(rows) <= 10

    def expected(r):
        s = 0.0
        if r.rnk_bm25 is not None:
            s += 1.0 / (RRF_K + r.rnk_bm25)
        if r.rnk_length is not None:
            s += 1.0 / (RRF_K + r.rnk_length)
        return math.floor(s * 1e8 + 0.5) / 1e8

    for r in rows:
        assert r.rrf_score == pytest.approx(expected(r), abs=0)
        assert r.rnk_bm25 is not None or r.rnk_length is not None
    keys = [(-r.rrf_score, r.doc_id) for r in rows]
    assert keys == sorted(keys)
