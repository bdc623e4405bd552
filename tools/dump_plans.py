"""Dump ``explain("formatted")`` physical plans for named queries.

Round-10 deliverable support: the optimization evidence in
``plans/r10/<query>_{before,after}.txt`` is generated with this tool —
``before`` from a git worktree of the pre-optimization tree, ``after``
from the current tree — so every plan claim in OPTIMIZATION_r10.md is
checkable without running Spark.

Usage: python tools/dump_plans.py <sf_dir> <out_dir> <suffix> <query> [...]
(writes ``<out_dir>/<query>_<suffix>.txt``)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    from trading_data_pipeline_spark.registry import all_queries
    from trading_data_pipeline_spark.session import build_session

    spark = build_session("dump-plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        jdf = df._jdf
        text = jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
