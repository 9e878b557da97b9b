"""Phase-level profiler for the replay tier's gate cadence (round 13).

Drives simhash_gate_batch_writer DIRECTLY with pre-materialized batch
frames (no streaming machinery), timing each batch and each maintenance
call, across bucket layouts — so the fixed per-batch overhead the bench
pays at sf0.1 is attributed to a phase instead of guessed at.

Usage: python tools/replay_probe.py [k ...]   (default: none 8 64)
Not in any timed path; a measurement helper like capture_plans.py.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from movie_data_pipeline_spark.session import get_spark  # noqa: E402
from movie_data_pipeline_spark.sources.registry import load_table  # noqa: E402
from movie_data_pipeline_spark.sources.versioned import VersionedTable  # noqa: E402
from movie_data_pipeline_spark.streaming.sinks import (  # noqa: E402
    simhash_gate_batch_writer,
)


def main() -> int:
    ks = [None if a == "none" else int(a) for a in sys.argv[1:]] or [
        None,
        8,
        64,
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="replay-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    batches = [
        docs.filter(F.col("doc_id") % 3 == i).localCheckpoint(eager=True)
        for i in range(3)
    ]
    for k in ks:
        base = tempfile.mkdtemp(prefix="mdp-replay-probe-")
        acc, idx = f"{base}/acc", f"{base}/idx"
        try:
            writer = simhash_gate_batch_writer(
                acc, idx, rung=1, index_bucket_k=k
            )
            phases: list[tuple[str, float]] = []
            for i, b in enumerate(batches):
                t0 = time.perf_counter()
                writer(b, i)
                phases.append((f"batch{i}", time.perf_counter() - t0))
            for name, t in (
                ("compact_acc", None),
                ("compact_idx", None),
            ):
                t0 = time.perf_counter()
                VersionedTable(acc if name == "compact_acc" else idx).compact(
                    spark, target_files=1
                )
                phases.append((name, time.perf_counter() - t0))
            t0 = time.perf_counter()
            resub = (
                VersionedTable(acc)
                .read(spark)
                .withColumn("doc_id", F.col("doc_id") + F.lit(10**9))
                .localCheckpoint(eager=True)
            )
            phases.append(("resub_prep", time.perf_counter() - t0))
            t0 = time.perf_counter()
            writer(resub, 99)
            phases.append(("resub_batch", time.perf_counter() - t0))
            total = sum(t for _, t in phases)
            print(f"--- index_bucket_k={k}  total={total:.2f}s")
            for name, t in phases:
                print(f"    {name:12s} {t:7.2f}s")
        finally:
            shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
