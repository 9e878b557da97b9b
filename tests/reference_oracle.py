"""Pure-Python ports of the reference's transformation semantics, used
only as test oracles (spec ports of etl1.py:92-140 — the behavior our
column expressions must reproduce; reimplemented from the documented
semantics, not copied engine code).
"""

from __future__ import annotations

import re


def extract_year_from_title(title: str) -> tuple[int | None, str]:
    """Spec of reference etl1.py:92-101."""
    match = re.search(r"\((\d{4})\)(?:\s*$)", title)
    if match:
        year = int(match.group(1))
        return year, re.sub(r"\s*\(\d{4}\)\s*$", "", title).strip()
    return None, title


_ARTICLES = [(", The", "The "), (", A", "A "), (", An", "An "),
             (", Le", "Le "), (", La", "La "), (", Les", "Les ")]


def normalize_title(title: str) -> str:
    """Spec of reference etl1.py:103-140 (6-way article chain)."""
    title = title.strip()
    title = re.sub(r"\s*\([^)]*\)", "", title).strip()
    for suffix, prefix in _ARTICLES:
        if title.endswith(suffix):
            title = prefix + title[: -len(suffix)].strip()
            break
    title = " ".join(title.split())
    return title.strip(", ")
