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
        "run-etl", help="MovieLens CSVs -> 4-table warehouse (parquet and/or JDBC)"
    )
    etl.add_argument("--data", required=True, help="dir with movies/ratings/links.csv")
    etl.add_argument("--out", help="parquet warehouse output dir")
    etl.add_argument("--limit", type=int, default=400, help="enrichment budget")
    etl.add_argument(
        "--faithful-ids",
        action="store_true",
        help="global-sort rating_id parity with the reference AUTO_INCREMENT "
        "(single-partition window; off = scalable monotonic ids)",
    )
    # JDBC load — the reference's actual sink. Credentials follow the
    # reference's .env contract (DB_USER/DB_PASSWORD, etl1.py:19-24):
    # they are read from the environment, never from argv (visible in ps).
    etl.add_argument(
        "--jdbc-url",
        help="JDBC url, e.g. jdbc:mysql://$DB_HOST/$DB_NAME "
        "(user/password from DB_USER/DB_PASSWORD env; driver from DB_DRIVER)",
    )
    etl.add_argument("--jdbc-batchsize", type=int, default=1000)
    etl.add_argument(
        "--jdbc-partitions", type=int, default=None,
        help="cap on concurrent JDBC connections",
    )
    return p


def _jdbc_properties() -> dict[str, str]:
    """Reference .env contract (etl1.py:19-24): DB_USER / DB_PASSWORD
    (+ DB_DRIVER for the JVM driver class)."""
    import os

    props = {
        "user": os.getenv("DB_USER", "your_user"),
        "password": os.getenv("DB_PASSWORD", "your_password"),
    }
    if os.getenv("DB_DRIVER"):
        props["driver"] = os.environ["DB_DRIVER"]
    return props


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
                write_warehouse_jdbc,
            )
            from movie_data_pipeline_spark.sources.movielens import (
                read_links,
                read_movies,
                read_ratings,
            )

            if not args.out and not args.jdbc_url:
                print("run-etl needs --out and/or --jdbc-url", file=sys.stderr)
                return 2
            wh, missing = build_warehouse(
                spark,
                read_movies(spark, args.data),
                read_ratings(spark, args.data),
                read_links(spark, args.data),
                enrichment=None,
                api_request_limit=args.limit,
                faithful_rating_ids=args.faithful_ids,
            )
            if args.out:
                write_warehouse(wh, args.out)
                for t in ("movies", "genres", "movie_genres", "ratings"):
                    print(f"{t}: {spark.read.parquet(f'{args.out}/{t}').count()} rows")
            if args.jdbc_url:
                write_warehouse_jdbc(
                    wh,
                    args.jdbc_url,
                    batchsize=args.jdbc_batchsize,
                    num_partitions=args.jdbc_partitions,
                    properties=_jdbc_properties(),
                )
                print(f"loaded 4 tables via JDBC -> {args.jdbc_url}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
