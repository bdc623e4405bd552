"""CLI: ``python -m trading_data_pipeline_spark <config.yaml>`` — the
engine's ``run.py`` (ref run.py:17-57: argparse → yaml → logging →
connectors → configs → ETL run)."""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv: list[str] | None = None) -> int:
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
