"""Property tests (hypothesis) for the title expressions — SURVEY §5:
the Spark column expressions must agree with the reference semantics on
arbitrary generated titles, normalization must be idempotent, and the
year regex must never fire mid-title."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from movie_data_pipeline_spark.functions.titles import (
    clean_title,
    normalize_title,
    release_year,
)
from tests import reference_oracle

# Words that may appear in generated titles (printable, no parens/commas
# — those are injected structurally below).
_WORD = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x24F
    ),
    min_size=1,
    max_size=8,
)


@st.composite
def titles(draw) -> str:
    words = draw(st.lists(_WORD, min_size=1, max_size=5))
    base = " ".join(words)
    if draw(st.booleans()):  # trailing article
        base += draw(st.sampled_from([", The", ", A", ", An", ", Le", ", La", ", Les"]))
    if draw(st.booleans()):  # parenthesized alt title
        base += f" ({draw(_WORD)})"
    if draw(st.booleans()):  # year suffix
        base += f" ({draw(st.integers(1000, 9999))})"
    if draw(st.booleans()):  # stray whitespace
        base = " " + base + " "
    return base


@pytest.fixture(scope="module")
def normalizer(spark):
    """One reusable single-row evaluator (fresh Spark jobs per example
    would be prohibitively slow under hypothesis)."""

    def run(batch: list[str]) -> list[tuple]:
        df = spark.createDataFrame([(t,) for t in batch], "title STRING")
        return [
            (r.y, r.ct, r.nt)
            for r in df.select(
                release_year(F.col("title")).alias("y"),
                clean_title(F.col("title")).alias("ct"),
                normalize_title(clean_title(F.col("title"))).alias("nt"),
            ).collect()
        ]

    return run


@settings(max_examples=30, deadline=None)
@given(batch=st.lists(titles(), min_size=1, max_size=20))
@pytest.mark.slow
def test_matches_reference_on_generated_titles(normalizer, batch):
    got = normalizer(batch)
    for title, (y, ct, nt) in zip(batch, got):
        exp_y, exp_ct = reference_oracle.extract_year_from_title(title)
        assert y == exp_y, repr(title)
        assert ct == exp_ct, repr(title)
        assert nt == reference_oracle.normalize_title(exp_ct), repr(title)


@settings(max_examples=20, deadline=None)
@given(batch=st.lists(titles(), min_size=1, max_size=20))
def test_normalization_idempotent(batch):
    for t in batch:
        once = reference_oracle.normalize_title(t)
        assert reference_oracle.normalize_title(once) == once


def test_year_regex_is_end_anchored(normalizer):
    # 4-digit groups not in the trailing position must never match
    cases = ["(1984) after", "mid (1999) word", "Movie (2001) Extended Cut"]
    got = normalizer(cases)
    assert all(y is None for y, _, _ in got)
