#!/usr/bin/env python
"""Empirical skew probe: back the two skew claims in operators/skew.py
with measurements on a 90%-hot-key fact derived from the 10x replica
(6M lineitem rows; falls back to sf0.1 if the replica is absent).

    python tools/make_scaled_data.py --out /tmp/mdp_sf1   # once
    python tools/skew_probe.py

Probe A — skewed sort-merge JOIN (the case AQE owns): fact⋈dim on a
key where ~90% of fact rows share one value, broadcast disabled so the
join must shuffle. Timed with AQE skew-join splitting ON vs OFF — the
runtime re-plan is the difference between one straggler task holding
5.4M rows and balanced splits.

Probe B — skewed LARGE-STATE aggregation (the case partial aggregation
does NOT absorb): exact distinct-count per key via naive
count_distinct vs ``salted_aggregate`` (64 deterministic salts,
partial collect_set → merged distinct). Small-state aggs (count/sum)
are excluded deliberately: map-side combine already absorbs those, and
claiming salting helps them would be false evidence.

Prints one JSON line per (probe, variant) with seconds and rows, plus
a summary line. Correctness cross-check: both variants of each probe
must produce identical results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 2), n


def main() -> int:
    from pyspark.sql import functions as F

    from movie_data_pipeline_spark.operators.skew import (
        deterministic_salt,
        salted_aggregate,
    )
    from movie_data_pipeline_spark.session import get_spark
    from movie_data_pipeline_spark.sources.registry import load_table

    src = "/tmp/mdp_sf1" if os.path.isdir("/tmp/mdp_sf1") else "/root/testdata/sf0.1"
    spark = get_spark(app_name="skew-probe")
    out: list[dict] = []

    # 90%-hot skewed fact: key 0 gets ~90% of rows, the rest keep
    # their supplier key. Deterministic (hash of orderkey+linenumber).
    li = load_table(spark, src, "lineitem")
    fact = li.select(
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < 9, 0)
        .otherwise(F.col("l_suppkey"))
        .alias("k"),
        "l_orderkey",
        "l_quantity",
    ).persist()
    n_fact = fact.count()
    dim = (
        fact.select("k").distinct().withColumn("payload", F.col("k") * 7)
    ).persist()
    dim.count()

    # ---- Probe A: skewed SMJ, AQE skew split on vs off -----------------
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for skew_on in (False, True):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        # forceOptimizeSkewedJoin also splits when no extra shuffle is
        # saved — without it AQE may skip splitting for this plan shape
        spark.conf.set(
            "spark.sql.adaptive.forceOptimizeSkewedJoin", str(skew_on).lower()
        )
        joined = fact.join(dim, "k").groupBy("payload").agg(
            F.sum("l_quantity").alias("q")
        )
        secs, rows = timed(joined)
        out.append(
            {"probe": "skewed_smj", "aqe_skew_join": skew_on, "secs": secs,
             "rows": rows, "n_fact": n_fact}
        )
        print(json.dumps(out[-1]), flush=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")

    # ---- Probe B: large-state agg, naive vs salted ---------------------
    naive = fact.groupBy("k").agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    secs, rows = timed(naive)
    out.append({"probe": "hot_distinct", "variant": "naive", "secs": secs,
                "rows": rows})
    print(json.dumps(out[-1]), flush=True)

    salted = salted_aggregate(
        fact,
        ["k"],
        partial_aggs=lambda: [
            F.collect_set("l_orderkey").alias("orders")
        ],
        merge_aggs=lambda: [
            F.size(F.array_distinct(F.flatten(F.collect_list("orders"))))
            .cast("long")
            .alias("n_orders")
        ],
        salt=deterministic_salt("l_orderkey", 64),
        n_salts=64,
    )
    secs, rows = timed(salted)
    out.append({"probe": "hot_distinct", "variant": "salted_64", "secs": secs,
                "rows": rows})
    print(json.dumps(out[-1]), flush=True)

    # correctness: identical distinct counts both ways
    a = {r["k"]: r["n_orders"] for r in naive.collect()}
    b = {r["k"]: r["n_orders"] for r in salted.collect()}
    assert a == b, "salted aggregate diverged from naive!"
    print(json.dumps({"probe": "summary", "results_match": True,
                      "src": src}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
