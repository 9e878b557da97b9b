#!/usr/bin/env python
"""Scale probe for the round-10 index lifecycle operators: time
`migrate_simhash_index` (distinct + re-band + overwrite commit) and
`scrub_index_to_corpus` (semi-join rewrite) on synthetic indexes well
beyond driver SFs, at two sizes, so linearity is measured rather than
argued.

    python tools/lifecycle_probe.py [n_docs ...]   # default 500k 5M

Fingerprints are xxhash64-deterministic uniform bits; the index is
built at rung 2 (15 band rows/doc) and migrated to rung 3 (20/doc);
the scrub erases doc_id % 10 = 1 (10%). One JSON line per (op, n).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from movie_data_pipeline_spark.operators.dedup import simhash_band_rows
    from movie_data_pipeline_spark.operators.index_lifecycle import (
        migrate_simhash_index,
        scrub_index_to_corpus,
    )
    from movie_data_pipeline_spark.session import get_spark
    from movie_data_pipeline_spark.sources.versioned import VersionedTable

    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 5_000_000]
    spark = get_spark(app_name="lifecycle-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        base = tempfile.mkdtemp(prefix="mdp-lifecycle-probe-")
        acc, idx = f"{base}/acc", f"{base}/idx"
        try:
            terms = None
            for j in range(60):
                bit = (
                    F.abs(F.xxhash64(F.col("id"), F.lit(j))) % 2 == 0
                ).cast("long") * F.lit(1 << j)
                terms = bit if terms is None else terms + bit
            fp = (
                spark.range(n)
                .repartition(64)
                .select(F.col("id").alias("doc_id"), terms.alias("simhash"))
            )
            corpus = fp.select("doc_id")
            VersionedTable(acc).commit(corpus)
            bands = simhash_band_rows(fp, rung=2).withColumn(
                "rung", F.lit(2)
            )
            VersionedTable(idx).commit(
                bands, meta={"simhash_rung": 2}
            )

            t0 = time.perf_counter()
            migrate_simhash_index(spark, idx, 3)
            mig_s = round(time.perf_counter() - t0, 1)
            rows = VersionedTable(idx).read(spark).count()
            print(json.dumps({
                "op": "migrate_rung2_to_3", "n_docs": n,
                "index_rows_after": rows, "sec": mig_s,
            }), flush=True)

            VersionedTable(acc).delete_where(spark, "doc_id % 10 = 1")
            t0 = time.perf_counter()
            _v, scrubbed = scrub_index_to_corpus(spark, idx, acc)
            scrub_s = round(time.perf_counter() - t0, 1)
            print(json.dumps({
                "op": "scrub_10pct", "n_docs": n,
                "rows_scrubbed": scrubbed, "sec": scrub_s,
            }), flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
