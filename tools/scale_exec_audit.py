"""Full-registry execution audit at a large scale factor.

Runs EVERY registered query once at the given dataset dir (default the
100x-bench-scale /tmp/sf10 from ``tools/sf1_gen.py .. 100``) with the
noop sink, catching per-query failures instead of aborting. With ANSI
mode on (the session default), this is a mechanical detector for the
silent-at-small-scale arithmetic class the 100x sweep surfaced in
q_chi_square: BIGINT products of row counts that overflow int64 once a
table crosses ~1e7 rows. DuckDB auto-promotes to HUGEINT, so the parity
harness at sf<=0.1 can never catch these — only running the Spark plan
on genuinely large inputs does.

Results stream to a JSONL file (one line per query, written as each
finishes) so progress survives a crash, plus a final summary line.

Usage::

    python tools/scale_exec_audit.py [sf_dir] [out_jsonl] [--skip a,b]

Defaults: sf_dir=/tmp/sf10, out=/tmp/scale_exec_audit.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    pos = [a for a in args if not a.startswith("--")]
    sf_dir = pos[0] if pos else "/tmp/sf10"
    out_path = pos[1] if len(pos) > 1 else "/tmp/scale_exec_audit.jsonl"
    skip: set[str] = set()
    if "--skip" in args:
        skip = set(args[args.index("--skip") + 1].split(","))

    from trading_data_pipeline_spark.registry import all_queries
    from trading_data_pipeline_spark.session import build_session

    spark = build_session("scale_exec_audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    done: set[str] = set()
    if os.path.exists(out_path):  # resume after a crash/kill
        with open(out_path) as f:
            done = {json.loads(line)["query"] for line in f if line.strip()}

    ok = failed = 0
    with open(out_path, "a") as out:
        for name, spec in specs.items():
            if name in skip or name in done:
                continue
            t0 = time.perf_counter()
            row: dict = {"query": name}
            try:
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                row["sec"] = round(time.perf_counter() - t0, 3)
                ok += 1
            except Exception as e:  # noqa: BLE001 — audit must not abort
                row["sec"] = round(time.perf_counter() - t0, 3)
                row["error"] = f"{type(e).__name__}: {e}"[:500]
                row["trace_tail"] = traceback.format_exc().splitlines()[-1][:300]
                failed += 1
            out.write(json.dumps(row) + "\n")
            out.flush()
            print(json.dumps(row), flush=True)
            spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "scale_exec_audit",
                "sf_dir": sf_dir,
                "ok": ok,
                "failed": failed,
                "skipped": sorted(skip | done),
            }
        )
    )


if __name__ == "__main__":
    main()
