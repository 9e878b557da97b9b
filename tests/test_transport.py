"""Offline tests for the OMDb transport wrapper (pipeline/transport.py)
against canned HTTP sessions — the retry/timeout/strategy semantics of
the reference fetch loop (etl1.py:142-244) with zero network."""

from __future__ import annotations

import pickle

import pytest

from movie_data_pipeline_spark.pipeline.transport import (
    OMDB_BASE_URL,
    OmdbTransport,
    omdb_fetch_fn,
)

HIT = {
    "Response": "True",
    "imdbID": "tt0114709",
    "Director": "John Lasseter",
    "Plot": "Toys come alive.",
    "BoxOffice": "$223,225,679",
    "imdbRating": "8.3",
    "Runtime": "81 min",
}
MISS = {"Response": "False", "Error": "Movie not found!"}

EXPECTED = {
    "imdb_id": "tt0114709",
    "director": "John Lasseter",
    "plot": "Toys come alive.",
    "box_office": "$223,225,679",
    "imdb_rating": "8.3",
    "runtime": "81 min",
}


class FakeResponse:
    def __init__(self, payload, status=200):
        self.payload = payload
        self.status = status

    def raise_for_status(self):
        if self.status >= 400:
            raise ConnectionError(f"HTTP {self.status}")

    def json(self):
        return self.payload


class FakeSession:
    """Scripted session: pops one canned response (or exception) per
    GET, recording every call for assertions."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def get(self, url, params=None, timeout=None):
        self.calls.append({"url": url, "params": dict(params), "timeout": timeout})
        item = self.script.pop(0)
        if isinstance(item, Exception):
            raise item
        return item


def make_transport(script, **kwargs):
    session = FakeSession(script)
    kwargs.setdefault("sleep", lambda s: None)
    t = OmdbTransport("key", session_factory=lambda: session, **kwargs)
    return t, session


def test_strategy1_title_year_hit():
    t, s = make_transport([FakeResponse(HIT)])
    assert t.fetch("Toy Story", 1995, "tt0114709") == EXPECTED
    assert len(s.calls) == 1
    c = s.calls[0]
    assert c["url"] == OMDB_BASE_URL
    assert c["timeout"] == 10.0  # reference timeout, etl1.py:154
    assert c["params"] == {
        "apikey": "key",
        "t": "Toy Story",
        "type": "movie",
        "y": "1995",
    }


def test_strategy2_drops_year_after_miss():
    t, s = make_transport([FakeResponse(MISS), FakeResponse(HIT)])
    assert t.fetch("Toy Story", 1995, None) == EXPECTED
    assert "y" in s.calls[0]["params"] and "y" not in s.calls[1]["params"]


def test_no_year_skips_strategy2():
    t, s = make_transport([FakeResponse(MISS)])
    assert t.fetch("Toy Story", None, None) is None
    assert len(s.calls) == 1  # no retry-without-year when year was absent


def test_strategy3_imdb_id_fallback():
    t, s = make_transport([FakeResponse(MISS), FakeResponse(MISS), FakeResponse(HIT)])
    assert t.fetch("Toy Story", 1995, "tt0114709") == EXPECTED
    assert s.calls[2]["params"] == {
        "apikey": "key",
        "i": "tt0114709",
        "type": "movie",
    }


def test_all_strategies_miss():
    t, s = make_transport([FakeResponse(MISS)] * 3)
    assert t.fetch("Nope", 1990, "tt0000001") is None
    assert len(s.calls) == 3


def test_transport_error_is_a_miss_by_default():
    """Reference: RequestException → log + miss (etl1.py:171-173). With
    max_retries=0 the ladder still advances to the next strategy."""
    t, s = make_transport([ConnectionError("boom"), FakeResponse(HIT)])
    assert t.fetch("Toy Story", 1995, None) == EXPECTED
    assert len(s.calls) == 2


def test_http_error_status_is_a_miss():
    t, s = make_transport([FakeResponse(HIT, status=500), FakeResponse(MISS)])
    assert t.fetch("Toy Story", 1995, None) is None
    assert len(s.calls) == 2


def test_retries_with_backoff():
    sleeps = []
    t, s = make_transport(
        [ConnectionError("a"), ConnectionError("b"), FakeResponse(HIT)],
        max_retries=2,
        sleep=sleeps.append,
    )
    assert t.fetch("Toy Story", None, None) == EXPECTED
    assert len(s.calls) == 3
    assert sleeps == [0.1, 0.2]  # inter_strategy_delay * backoff^k


def test_retries_exhausted_is_a_miss():
    t, s = make_transport([ConnectionError("x")] * 3 + [FakeResponse(MISS)] * 9,
                          max_retries=2)
    assert t.fetch("Toy Story", None, None) is None
    assert len(s.calls) == 3  # 1 + 2 retries, no strategy 2/3 inputs


def test_inter_strategy_delay_sleeps():
    sleeps = []
    t, _ = make_transport([FakeResponse(MISS)] * 3, sleep=sleeps.append)
    t.fetch("Toy Story", 1995, "tt0114709")
    assert sleeps == [0.1, 0.1]  # before strategy 2 and 3 (etl1.py:214, 236)


def test_transport_pickles_without_session():
    t, _ = make_transport([FakeResponse(HIT)])
    t.fetch("Toy Story", None, None)  # materializes the session
    state = pickle.loads(pickle.dumps(OmdbTransport("key")))
    assert state._session is None and state.api_key == "key"


def test_factory_returns_callable():
    fn = omdb_fetch_fn("key", session_factory=lambda: FakeSession([FakeResponse(HIT)]))
    fn.sleep = lambda s: None
    assert fn("Toy Story", None, None) == EXPECTED


# ---- end-to-end: the transport as fetch_enrichment's fetch_fn ----

def _e2e_session_factory():
    """Module-level (picklable) factory: every Title+Year lookup for
    'Toy Story' hits; everything else misses all three strategies."""

    class RoutedSession:
        def get(self, url, params=None, timeout=None):
            if params.get("t") == "Toy Story" or params.get("i") == "tt0113101":
                return FakeResponse(HIT if params.get("t") == "Toy Story" else {
                    **HIT, "imdbID": "tt0113101", "Director": "Via Links",
                })
            return FakeResponse(MISS)

    return RoutedSession()


def test_fetch_enrichment_with_real_transport(spark):
    from movie_data_pipeline_spark.pipeline.enrichment import fetch_enrichment
    from movie_data_pipeline_spark.pipeline.movies_etl import transform_movies
    from movie_data_pipeline_spark.sources.movielens import read_links, read_movies
    from tests.test_movies_etl import FIXTURE_DIR

    movies = transform_movies(read_movies(spark, FIXTURE_DIR))
    links = read_links(spark, FIXTURE_DIR)
    fn = omdb_fetch_fn("key", session_factory=_e2e_session_factory)
    fn.sleep = lambda s: None
    out = fetch_enrichment(
        movies, links, api_request_limit=4, fetch_fn=fn, rate_limit_per_sec=10000
    ).collect()
    by_id = {r.movieId: r for r in out}
    assert by_id[1].imdb_id == "tt0114709"  # Toy Story: Title+Year hit
    assert by_id[1].director == "John Lasseter"
    # movie 4 has a links imdbId (fixtures) → strategy-3 fallback hit
    if 4 in by_id:
        assert by_id[4].imdb_id == "tt0113101"
