"""Greedy next-fit packing semantics on hand-built inputs."""

from __future__ import annotations

from movie_data_pipeline_spark.operators.packing import (
    pack_documents,
    packing_efficiency,
)


def _pack(spark, rows, capacity, n_shards=1):
    docs = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = pack_documents(docs, capacity=capacity, n_shards=n_shards)
    return {r["doc_id"]: r["bin_in_shard"] for r in packed.collect()}


def test_next_fit_breaks_at_capacity(spark):
    # 60+60 fit in 128; +60 overflows -> new bin; 120 fills bin 1 past
    # break point -> bin 2.
    got = _pack(spark, [(1, 60), (2, 60), (3, 60), (4, 120)], capacity=128)
    assert got == {1: 0, 2: 0, 3: 1, 4: 2}


def test_oversized_first_doc_keeps_bin_zero(spark):
    # First doc always opens bin 0 even when alone it exceeds capacity;
    # the next doc starts a fresh bin.
    got = _pack(spark, [(1, 500), (2, 10)], capacity=128)
    assert got == {1: 0, 2: 1}


def test_packing_is_id_ordered_not_input_ordered(spark):
    got = _pack(spark, [(3, 100), (1, 100), (2, 100)], capacity=200)
    assert got == {1: 0, 2: 0, 3: 1}


def test_efficiency_reports_fill_fraction(spark):
    docs = spark.createDataFrame([(1, 100), (2, 100)], ["doc_id", "n_tokens"])
    packed = pack_documents(docs, capacity=200, n_shards=1)
    eff = packing_efficiency(packed, capacity=200).collect()
    assert len(eff) == 1
    assert eff[0]["n_bins"] == 1
    assert eff[0]["fill_fraction"] == 1.0
