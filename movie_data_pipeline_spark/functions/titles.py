"""Title-normalization column expressions (reference parity).

The reference implements these as row-at-a-time Python (`Series.apply`);
here they are pure Catalyst column expressions — they stay inside
whole-stage codegen, get pushed/pruned/folded, and never serialize rows
to Python (SURVEY.md §2.2 P1-P5, §2.11).

Parity notes:

- Year extraction: end-anchored ``\\((\\d{4})\\)(?:\\s*$)`` — a 4-digit
  number mid-title must NOT match (reference etl1.py:92-101).
- ``normalize_title`` (reference etl1.py:103-140): strip → remove ALL
  parenthesized groups → move a trailing article (", The"/", A"/", An"/
  ", Le"/", La"/", Les") to the front → collapse whitespace → strip
  leading/trailing commas+spaces. The article move is expressed as one
  anchored regexp_replace rather than the reference's 6-way endswith
  chain; the two differ only in intermediate whitespace, which the final
  collapse step normalizes identically.
- IMDb id: ``tt`` + zero-pad to at least 7 digits via format_string
  (reference etl1.py:86 ``f"tt{int(i):07d}"`` — printf semantics keep
  8-digit ids intact, unlike lpad which would truncate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

YEAR_EXTRACT_RE = r"\((\d{4})\)\s*$"
YEAR_STRIP_RE = r"\s*\(\d{4}\)\s*$"
PAREN_RE = r"\s*\([^)]*\)"
ARTICLE_RE = r"^(.*), (The|A|An|Le|La|Les)$"
EDGE_TRIM_RE = r"^[, ]+|[, ]+$"


def release_year(title: Column) -> Column:
    """Year from a trailing ``(YYYY)``; null when absent (etl1.py:92-101)."""
    return F.nullif(F.regexp_extract(title, YEAR_EXTRACT_RE, 1), F.lit("")).try_cast("int")


def clean_title(title: Column) -> Column:
    """Title with the trailing ``(YYYY)`` stripped (etl1.py:99).

    Faithful branch semantics: the reference strips whitespace only on
    the match path; a title with no year suffix is returned VERBATIM
    (etl1.py:100-101 returns the original, un-stripped title).
    """
    matched = F.regexp_extract(title, YEAR_EXTRACT_RE, 1) != ""
    return F.when(
        matched, F.trim(F.regexp_replace(title, YEAR_STRIP_RE, ""))
    ).otherwise(title)


def normalize_title(title: Column) -> Column:
    """Lookup-normalized title (etl1.py:103-140); see module docstring."""
    t = F.trim(title)
    t = F.trim(F.regexp_replace(t, PAREN_RE, ""))
    t = F.regexp_replace(t, ARTICLE_RE, r"$2 $1")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return F.regexp_replace(t, EDGE_TRIM_RE, "")


def imdb_tt_id(imdb_id: Column) -> Column:
    """``tt%07d`` formatting; null stays null (etl1.py:75-90)."""
    return F.when(
        imdb_id.isNotNull(), F.format_string("tt%07d", imdb_id.try_cast("long"))
    )
