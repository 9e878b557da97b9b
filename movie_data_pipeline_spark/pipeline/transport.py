"""Production OMDb HTTP transport: the reference's per-movie fetch loop
(etl1.py:142-244) as a picklable, injectable ``fetch_fn`` factory for
``fetch_enrichment`` (pipeline/enrichment.py).

Reference semantics ported 1:1:
- 10 s request timeout on every call (etl1.py:154, 193).
- 3-strategy sequencing inside ONE fetch: Title+Year → Title Only
  (only when a year was supplied) → IMDb-ID point lookup (only when
  links.csv had an id), with a 0.1 s inter-strategy delay
  (etl1.py:176-244).
- Any ``requests`` transport exception → the movie resolves to a miss
  (the reference logs and returns None, etl1.py:171-173, 242-244).
- The 0.2 s *between-movies* throttle (API_DELAY, etl1.py:42) is NOT
  here — it belongs to the fetch job's per-partition rate limiter
  (``fetch_enrichment(rate_limit_per_sec=5.0)``), so a cluster-wide
  budget divides across partitions instead of compounding two sleeps.

Extensions beyond the reference (off by default so default behavior is
reference-faithful):
- ``max_retries``/``backoff``: transient transport errors can be
  retried with exponential backoff before declaring a miss.
- ``min_interval``: a per-process token-bucket-of-one floor between
  HTTP calls for standalone (non-mapInPandas) use.

The transport holds no live socket state at pickle time: the HTTP
session is created lazily per worker process (``session_factory``), so
the factory's closure ships cleanly through mapInPandas. Tests inject a
canned session; production leaves the default (``requests.Session``).
"""

from __future__ import annotations

import time
from collections.abc import Callable

OMDB_BASE_URL = "http://www.omdbapi.com/"

# API → enrichment-column mapping (etl1.py:160-167)
_FIELD_MAP = (
    ("imdb_id", "imdbID"),
    ("director", "Director"),
    ("plot", "Plot"),
    ("box_office", "BoxOffice"),
    ("imdb_rating", "imdbRating"),
    ("runtime", "Runtime"),
)


def _default_session_factory():
    try:
        import requests  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - requests is ubiquitous
        raise NotImplementedError(
            "requests not installed; inject session_factory into omdb_fetch_fn"
        ) from exc
    return requests.Session()


def _transport_errors():
    """The exception classes the reference treats as a miss
    (requests.exceptions.RequestException, etl1.py:171)."""
    try:
        import requests  # noqa: PLC0415

        return (requests.exceptions.RequestException, ConnectionError, OSError)
    except ImportError:  # canned-session tests without requests
        return (ConnectionError, OSError, IOError)


class OmdbTransport:
    """One movie → one enrichment dict (or None), with the reference's
    strategy ladder. Instances are picklable: the session is built
    lazily per process and never serialized."""

    def __init__(
        self,
        api_key: str,
        session_factory: Callable[[], object] | None = None,
        base_url: str = OMDB_BASE_URL,
        timeout: float = 10.0,
        inter_strategy_delay: float = 0.1,
        max_retries: int = 0,
        backoff: float = 2.0,
        min_interval: float = 0.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.api_key = api_key
        self.session_factory = session_factory or _default_session_factory
        self.base_url = base_url
        self.timeout = timeout
        self.inter_strategy_delay = inter_strategy_delay
        self.max_retries = max_retries
        self.backoff = backoff
        self.min_interval = min_interval
        self.sleep = sleep
        self._session = None
        self._last_call = 0.0

    # -- pickling: drop the live session; workers re-create their own.
    # _last_call is a time.monotonic() value — meaningless in another
    # process (monotonic clocks are per-boot), so reset it or a shipped
    # transport could compute an absurd throttle wait on the worker.
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_session"] = None
        state["_last_call"] = 0.0
        return state

    def _get_session(self):
        if self._session is None:
            self._session = self.session_factory()
        return self._session

    def _throttle(self) -> None:
        if self.min_interval <= 0:
            return
        wait = self.min_interval - (time.monotonic() - self._last_call)
        if wait > 0:
            self.sleep(wait)
        self._last_call = time.monotonic()

    def _get_json(self, params: dict) -> dict | None:
        """One HTTP GET with timeout + optional retries. Returns the
        parsed payload, or None when the transport failed terminally
        (the reference's 'API Error' path)."""
        attempt = 0
        delay = self.inter_strategy_delay
        while True:
            self._throttle()
            try:
                resp = self._get_session().get(
                    self.base_url, params=params, timeout=self.timeout
                )
                resp.raise_for_status()
                return resp.json()
            except _transport_errors():
                if attempt >= self.max_retries:
                    return None
                attempt += 1
                self.sleep(delay)
                delay *= self.backoff

    @staticmethod
    def _hit(data: dict | None) -> dict | None:
        """OMDb marks hits with Response=='True' (etl1.py:158)."""
        if data is not None and data.get("Response") == "True":
            return {ours: data.get(theirs) for ours, theirs in _FIELD_MAP}
        return None

    def fetch(
        self, norm_title: str, year: int | None, imdb_tt: str | None
    ) -> dict | None:
        """The 3-strategy ladder — signature matches
        ``fetch_enrichment``'s fetch_fn contract exactly."""
        params = {"apikey": self.api_key, "t": norm_title, "type": "movie"}
        if year is not None:
            params["y"] = str(year)
        got = self._hit(self._get_json(params))  # Strategy 1: Title+Year
        if got is not None:
            return got
        if year is not None:  # Strategy 2: Title Only (etl1.py:211-228)
            self.sleep(self.inter_strategy_delay)
            params.pop("y", None)
            got = self._hit(self._get_json(params))
            if got is not None:
                return got
        if imdb_tt:  # Strategy 3: IMDb-ID point lookup (etl1.py:230-239)
            self.sleep(self.inter_strategy_delay)
            got = self._hit(
                self._get_json(
                    {"apikey": self.api_key, "i": imdb_tt, "type": "movie"}
                )
            )
            if got is not None:
                return got
        return None

    __call__ = fetch


def omdb_fetch_fn(
    api_key: str,
    session_factory: Callable[[], object] | None = None,
    **kwargs,
) -> OmdbTransport:
    """Factory for the injectable fetch_fn:

        enrichment = fetch_enrichment(
            movies, links_raw, api_request_limit=400,
            fetch_fn=omdb_fetch_fn(api_key),
        )
    """
    return OmdbTransport(api_key, session_factory=session_factory, **kwargs)
