"""CLI surface: catalog listing and argument handling (the JVM-bearing
subcommands are exercised by the verify recipe, not unit tests — main()
owns and stops its own session, which must not touch the shared test
session)."""

from __future__ import annotations

import pytest

from movie_data_pipeline_spark.__main__ import main
from movie_data_pipeline_spark.plans import REGISTRY


def test_list_queries_prints_catalog(capsys):
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    for name in ("q01_top_orders", "q63_duplicate_clusters", "q72_sequence_packing"):
        assert name in out
    assert len(out.strip().splitlines()) == len(REGISTRY)


def test_missing_subcommand_is_an_error():
    with pytest.raises(SystemExit):
        main([])
