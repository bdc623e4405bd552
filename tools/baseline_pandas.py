"""Single-node pandas baseline for the flagship report1 query.

The reference engine is eager single-process pandas (SURVEY.md §1/§6 — it
publishes no numbers), so the honest throughput comparison is: the same
OHLC + day-over-day-change computation, written in the reference's idiom
(sort → groupby.transform first/last → groupby.agg → shift → vectorized
pct), timed on the same parquet input as ``q_report1``.

This is a benchmark harness, NOT engine code — written from the behavior
documented in SURVEY.md §2.c (rows 16-19), no reference code copied.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/baseline_pandas.py
Prints one JSON line {"metric": "pandas_report1_wallclock", ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import pandas as pd


def report1_pandas(events: pd.DataFrame) -> pd.DataFrame:
    df = events.copy()
    df["date"] = df["ts"].dt.date
    df = df.sort_values(by=["ts", "event_id"])
    grouped = df.groupby(["user_id", "date"])["value"]
    df["opening"] = grouped.transform("first")
    df["closing"] = grouped.transform("last")
    agg = df.groupby(["user_id", "date"], as_index=False).agg(
        opening_price=("opening", "min"),
        closing_price=("closing", "min"),
        minimum_price=("value", "min"),
        maximum_price=("value", "max"),
        traded_volume=("value", "size"),
    )
    agg = agg.sort_values(by=["date"])
    prev = agg.groupby(["user_id"])["opening_price"].shift(1)
    agg["change_prev_pct"] = (agg["opening_price"] - prev) / prev * 100
    return agg.round(decimals=2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    events = pd.read_parquet(f"{sf_dir}/events.parquet")
    report1_pandas(events)  # warm-up
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = report1_pandas(events)
        samples.append(time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "pandas_report1_wallclock",
                "value": round(statistics.median(samples), 3),
                "unit": "sec",
                "rows_in": len(events),
                "rows_out": len(out),
                "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
            }
        )
    )


if __name__ == "__main__":
    main()
