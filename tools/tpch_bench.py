"""Time the complete TPC-H suite (Q1-Q22, adapted to the synthetic
schema — see relational_queries6.py for the Q2/Q11/Q12/Q16/Q20/Q21
derivations) at a given scale dir. Complements bench.py: the headline
list there is frozen for baseline comparability; this sweeps relational
breadth.

Usage: python tools/tpch_bench.py [sf_dir] — prints one JSON line with
per-query medians over RUNS runs after one warmup.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trading_data_pipeline_spark.registry import all_queries  # noqa: E402
from trading_data_pipeline_spark.session import build_session  # noqa: E402

RUNS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = build_session("tpch-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [f"q_tpch_q{i}" for i in range(1, 23)]
    times: dict[str, float] = {}
    for name in names:
        fn = qs[name].fn
        fn(spark, sf_dir).count()  # warmup: scan cache + plan
        samples = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            samples.append(time.monotonic() - t0)
        times[name] = round(statistics.median(samples), 3)
    print(
        json.dumps(
            {
                "metric": "tpch_suite_wallclock_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            }
        )
    )


if __name__ == "__main__":
    main()
