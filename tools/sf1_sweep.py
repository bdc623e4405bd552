"""Measured scale sweep: time the headline queries plus the
highest-shuffle registry queries at sf0.1 (the bench scale) AND at the
sf1-equivalent 10× dataset from ``tools/sf1_gen.py``, and report the
per-query scaling ratio — the round-8 verdict's task 3 (convert the
100×-design story from plan invariants into measured numbers).

For an embarrassingly-parallel plan on a box with spare cores, the
wall-clock ratio at 10× data sits well under 10; a ratio far ABOVE 10
flags super-linear work (quadratic candidate generation, a collapsed
single partition, driver-side accumulation) that a 1000× cluster
scale-up would amplify. The ratio is the signal; the absolute sf1
numbers also feed BASELINE.md.

Usage::

    python tools/sf1_sweep.py [sf1_dir] [--top N] [--queries a,b,...]

Defaults: sf1_dir=/tmp/sf1 (generated on demand), top 15 by recorded
shuffle count from PLANAUDIT.json plus the 14 bench headliners.
Protocol per (query, scale): 1 warm-up + 2 timed runs, median, noop
sink, cache-clear + GC between queries (bench.py's isolation).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
WARMUPS = 1
RUNS = 2


# The measured heavy tail of the sf10 execution audit (round-9 verdict
# task 3): every SCALEAUDIT top-cost query sweeps by default so each
# keeps a CURRENT two-decade scaling ratio, not a one-off single-run
# time. Round-10 measured ratios at 100x data: q_ann_recall 2.5
# (post-Arrow-pass), q_jaccard_prefix_join 5.3, q_basket_pairs 18.4
# (at default heap); the rest recorded in BASELINE.md's round-10
# sections and final addendum.
HEAVY_TAIL = (
    "q_ann_recall",
    "q_jaccard_prefix_join",
    "q_basket_pairs",
    "q_dataset_card",
    "q_knn_eval",
    "q_tfidf",
    "q_char_entropy",
)


def pick_queries(top_n: int) -> list[str]:
    from bench import HEADLINE

    with open(os.path.join(REPO, "PLANAUDIT.json")) as f:
        audit = json.load(f)["queries"]
    by_shuffles = sorted(
        (k for k, v in audit.items() if v.get("err") is None),
        key=lambda k: -audit[k].get("shuffles", 0),
    )
    picked = list(HEADLINE) + [q for q in HEAVY_TAIL if q not in HEADLINE]
    for q in by_shuffles:
        if len(picked) >= len(HEADLINE) + len(HEAVY_TAIL) + top_n:
            break
        if q not in picked:
            picked.append(q)
    return picked


def time_query(spark, fn, sf_dir: str) -> float:
    for _ in range(WARMUPS):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    return round(statistics.median(samples), 3)


def main() -> None:
    args = sys.argv[1:]
    sf1_dir = args[0] if args and not args[0].startswith("--") else "/tmp/sf1"
    top_n = 15
    names: list[str] | None = None
    if "--top" in args:
        top_n = int(args[args.index("--top") + 1])
    if "--queries" in args:
        names = args[args.index("--queries") + 1].split(",")

    if not os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
        from sf1_gen import generate

        generate(sf1_dir)

    from trading_data_pipeline_spark.registry import all_queries
    from trading_data_pipeline_spark.session import build_session

    spark = build_session("sf1_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    queries = names or pick_queries(top_n)

    rows = []
    for name in queries:
        fn = specs[name].fn
        t01 = time_query(spark, fn, SF01)
        t1 = time_query(spark, fn, sf1_dir)
        ratio = round(t1 / t01, 2) if t01 > 0 else None
        rows.append({"query": name, "sf0.1_s": t01, "sf1_s": t1, "ratio": ratio})
        print(json.dumps(rows[-1]), flush=True)

    result = {
        "metric": "sf1_scale_sweep",
        "unit": "sec",
        "protocol": f"{WARMUPS} warmup + {RUNS} runs median, noop sink",
        "rows": rows,
        "loadavg_1m": _loadavg(),
    }
    print(json.dumps(result))
    # markdown table for BASELINE.md
    print("\n| query | sf0.1 (s) | sf1 (s) | ratio (10x data) |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['query']} | {r['sf0.1_s']} | {r['sf1_s']} | {r['ratio']} |")


def _loadavg() -> float | None:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return None


if __name__ == "__main__":
    main()
