#!/usr/bin/env python
"""Dump `explain(formatted)` for every catalog query and flag plan
smells: scans without pushed filters reading all columns, Python
row-UDFs (BatchEvalPython), cartesian products, and single-partition
windows outside known-small dimensions.

Usage: python tools/audit_plans.py [sf_dir] > plans.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movie_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from movie_data_pipeline_spark.session import get_spark

SMELLS = {
    "BatchEvalPython": "row-at-a-time Python UDF in plan",
    "CartesianProduct": "cartesian product (unbucketed cross join)",
}
# Queries where a single-partition window is the intended design
# (tiny-dimension surrogate keys, SURVEY §2.9).
WINDOW_OK = {"q10_event_type_dim"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-audit")
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    problems = []
    for name, spec in sorted(REGISTRY.items()):
        df = spec.build(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(em)
        print(f"{'=' * 30} {name}\n{plan}")
        for marker, why in SMELLS.items():
            if marker in plan:
                problems.append(f"{name}: {why}")
        if (
            name not in WINDOW_OK
            and "windowspecdefinition()" in plan.replace(" ", "")
        ):
            problems.append(f"{name}: unpartitioned window over full data")
    print(f"\n{'=' * 30} SUMMARY")
    if problems:
        for p in problems:
            print("SMELL:", p)
        return 1
    print(f"{len(REGISTRY)} plans audited, no smells")
    return 0


if __name__ == "__main__":
    sys.exit(main())
