#!/usr/bin/env python
"""Generate CATALOG.md — one row per registered query: name, tags, and
the first docstring sentence. Run after adding queries:
    python tools/gen_catalog.py > CATALOG.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_sentence(doc: str) -> str:
    text = " ".join((doc or "").split())
    m = re.search(r"(.+?[.!?])(\s|$)", text)
    s = m.group(1) if m else text
    return s.replace("|", "\\|")


def main() -> int:
    from movie_data_pipeline_spark.plans import REGISTRY

    print("# Query catalog\n")
    print(f"{len(REGISTRY)} queries; every one carries a DuckDB oracle "
          "(see COVERAGE.md for the operator mapping and README for the "
          "determinism rules).\n")
    print("| query | tags | summary |")
    print("|---|---|---|")
    for name, spec in sorted(REGISTRY.items()):
        tags = ", ".join(spec.tags)
        print(f"| {name} | {tags} | {first_sentence(spec.doc)} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
