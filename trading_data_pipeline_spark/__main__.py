"""CLI: the engine's ``run.py`` (ref run.py:17-57: argparse → yaml →
logging → connectors → configs → ETL run), plus a ``query`` subcommand
exposing the whole registered operator surface:

    python -m trading_data_pipeline_spark <config.yaml>     # report1 ETL
    python -m trading_data_pipeline_spark query --list
    python -m trading_data_pipeline_spark query q_report1 \
        --sf-dir /data/sf0.1 --out /tmp/report1 --format parquet

``query`` runs any registry entry against a table directory and either
shows the first rows or writes the result through the connector sink
(same format allowlist / empty-write semantics as the ETL)."""

from __future__ import annotations

import argparse
import logging
import sys


def _query_cmd(argv: list[str]) -> int:
    import os

    parser = argparse.ArgumentParser(
        prog="trading-data-pipeline-spark query",
        description="Run one registered query against a parquet table dir.",
    )
    parser.add_argument("name", nargs="?", help="registry query name (q_*)")
    parser.add_argument("--list", action="store_true", help="list registered queries")
    parser.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="directory holding the parquet tables (default: $SPARK_GRAFT_SF_DIR)",
    )
    parser.add_argument("--out", help="write the result under this path")
    parser.add_argument(
        "--format", default="parquet", help="sink format (csv/parquet/json/orc)"
    )
    parser.add_argument(
        "--show", type=int, default=20, help="rows to print when --out is absent"
    )
    args = parser.parse_args(argv)

    from .registry import all_queries

    specs = all_queries()
    if args.list or not args.name:
        for name, spec in specs.items():
            first = (spec.doc or "").split(". ")[0][:100]
            print(f"{name:28s} {first}")
        return 0
    if args.name not in specs:
        print(f"unknown query {args.name!r} (see --list)", file=sys.stderr)
        return 2

    from .session import build_session

    spark = build_session(f"query:{args.name}")
    df = specs[args.name].fn(spark, args.sf_dir)
    if args.out:
        from .sources.connector import FileSystemConnector

        root, _, key = args.out.rstrip("/").rpartition("/")
        ok = FileSystemConnector(spark, root or ".").write(df, key, args.format)
        if ok is None:  # connector's empty-write skip — a valid empty result
            print(f"empty result; nothing written to {args.out}")
            return 0
        print(f"wrote={bool(ok)} path={args.out} format={args.format}")
        return 0 if ok else 1
    df.show(args.show, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "query":
        return _query_cmd(argv[1:])
    parser = argparse.ArgumentParser(description="Run the report1 ETL job.")
    parser.add_argument("config", help="path to the YAML job config")
    args = parser.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    from .etl import run_job

    ok = run_job(args.config)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
