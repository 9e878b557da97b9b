"""Command-line entry point: ``python -m movie_data_pipeline_spark``.

A reference user runs ``python etl1.py`` and pastes README SQL into
their RDBMS; this CLI is the equivalent standalone surface here:

    python -m movie_data_pipeline_spark list-queries
    python -m movie_data_pipeline_spark run-query q02_region_revenue \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m movie_data_pipeline_spark explain q02_region_revenue
    python -m movie_data_pipeline_spark run-etl --data /path/to/ml-latest-small \
        --out /tmp/warehouse
"""

from __future__ import annotations

import argparse
import sys


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="movie_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list-queries", help="list the query catalog")

    rq = sub.add_parser("run-query", help="run a catalog query and show rows")
    rq.add_argument("name")
    rq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rq.add_argument("--limit", type=int, default=20)

    ex = sub.add_parser("explain", help="print the formatted physical plan")
    ex.add_argument("name")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    etl = sub.add_parser(
        "run-etl", help="MovieLens CSVs -> 4-table parquet warehouse"
    )
    etl.add_argument("--data", required=True, help="dir with movies/ratings/links.csv")
    etl.add_argument("--out", required=True, help="warehouse output dir")
    etl.add_argument("--limit", type=int, default=400, help="enrichment budget")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    # Import after parsing so --help never pays JVM startup.
    from movie_data_pipeline_spark.plans import REGISTRY

    if args.cmd == "list-queries":
        for name, spec in sorted(REGISTRY.items()):
            first = (spec.doc or "").strip().splitlines()
            print(f"{name:36s} {' '.join(spec.tags):40s} {first[0] if first else ''}")
        return 0

    from movie_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"mdp-{args.cmd}")
    try:
        if args.cmd in ("run-query", "explain"):
            if args.name not in REGISTRY:
                print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
                return 2
            df = REGISTRY[args.name].build(spark, args.sf_dir)
            if args.cmd == "explain":
                df.explain("formatted")
            else:
                df.show(args.limit, truncate=False)
        elif args.cmd == "run-etl":
            from movie_data_pipeline_spark.pipeline.movies_etl import (
                build_warehouse,
                write_warehouse,
            )
            from movie_data_pipeline_spark.sources.movielens import (
                read_links,
                read_movies,
                read_ratings,
            )

            wh, missing = build_warehouse(
                spark,
                read_movies(spark, args.data),
                read_ratings(spark, args.data),
                read_links(spark, args.data),
                enrichment=None,
                api_request_limit=args.limit,
            )
            write_warehouse(wh, args.out)
            for t in ("movies", "genres", "movie_genres", "ratings"):
                print(f"{t}: {spark.read.parquet(f'{args.out}/{t}').count()} rows")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
