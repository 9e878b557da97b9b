#!/usr/bin/env python
"""Synthesize an sf1.0-equivalent dataset by key-shifted replication of
the bundled sf0.1 tables — the local stand-in for "does this plan
survive a 10x scale-up" (VERDICT r2 #8).

    python tools/make_scaled_data.py [--factor 10] [--src .../sf0.1]
                                     [--out /tmp/mdp_sf1]

Method: facts and large tables are unioned ``factor`` times with each
copy's keys shifted by ``copy_idx * stride`` (stride = max key + 1 per
key domain, so copies never collide and every FK still resolves —
l_orderkey shifts by the orders stride, l_partkey by the part stride,
and so on). The fixed dimensions (region, nation) are NOT replicated,
and nationkey/brand/category columns keep their values: at real scale
the dimension vocabulary stays put while facts grow — which is exactly
the skew/shuffle regime the probe should exercise. Timestamps, text,
and embeddings are left as-is (duplicated content is fine: the dedup
operators treat the copies as the exact duplicates they are).

Writes one parquet file per table, partitioned like the source.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# table -> columns to shift, keyed by the table whose stride applies.
# A stride domain is named by the table that owns the key space.
SHIFT_PLAN: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events:event_id", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
# key-space owner -> (table, column) to measure the stride from
STRIDE_SOURCE: dict[str, tuple[str, str]] = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events:event_id": ("events", "event_id"),
    "events:user_id": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}
COPY_ONLY = ["region", "nation"]


def main() -> int:
    from pyspark.sql import functions as F

    from movie_data_pipeline_spark.session import get_spark
    from movie_data_pipeline_spark.sources.registry import load_table

    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/mdp_sf1")
    args = ap.parse_args()

    spark = get_spark(app_name="make-scaled-data")
    os.makedirs(args.out, exist_ok=True)

    strides = {
        domain: load_table(spark, args.src, t).agg(F.max(c)).collect()[0][0]
        + 1
        for domain, (t, c) in STRIDE_SOURCE.items()
    }
    print(f"strides: {strides}", file=sys.stderr)

    for t in COPY_ONLY:
        load_table(spark, args.src, t).write.mode("overwrite").parquet(
            f"{args.out}/{t}.parquet"
        )
        print(f"{t}: copied", file=sys.stderr)

    for t, shifts in SHIFT_PLAN.items():
        base = load_table(spark, args.src, t)
        copies = []
        for i in range(args.factor):
            c = base
            for col, domain in shifts.items():
                dtype = dict(base.dtypes)[col]  # keep the source dtype
                c = c.withColumn(
                    col,
                    (F.col(col) + F.lit(i * strides[domain])).cast(dtype),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionAll(c)
        out.write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: x{args.factor}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
