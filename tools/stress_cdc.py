"""Stress the streaming CDC-upsert snapshot sink (streaming/sinks.py).

Feeds a synthetic changelog — ``N_KEYS`` live keys churned over
``N_BATCHES`` micro-batches with updates and deletes — through
``make_cdc_sink`` and reports per-batch apply time and snapshot size.
What this demonstrates for the 100 TB design:

- per-batch cost is bounded by |snapshot| + |batch| (one rank-limit
  window keyed on the key), NOT by changelog history length;
- the snapshot stays one row per key (+ tombstones) no matter how many
  batches replayed over it;
- the aside-rename publish adds O(1) metadata ops per batch.

Usage: python tools/stress_cdc.py [n_keys] [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading_data_pipeline_spark.session import build_session  # noqa: E402
from trading_data_pipeline_spark.streaming.sinks import (  # noqa: E402
    make_cdc_sink,
    read_cdc_table,
)


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rows_per_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000

    spark = build_session("stress-cdc")
    root = tempfile.mkdtemp(prefix="cdc_stress_")
    path = os.path.join(root, "snapshot")
    sink = make_cdc_sink(path, "k", ["v"])

    for b in range(n_batches):
        # deterministic churn: every batch touches a rotating slice of the
        # key space; ~5% of touched keys get a delete, later resurrected
        # by a higher-version update in a subsequent batch
        batch = (
            spark.range(rows_per_batch)
            .select(
                ((F.col("id") + b * 7919) % n_keys).alias("k"),  # stride 1: full coverage for ANY n_keys
                F.when((F.col("id") + b) % 20 == 0, "D")
                .otherwise("U")
                .alias("op"),
                (F.lit(b) * rows_per_batch + F.col("id")).alias("v"),
            )
        )
        t0 = time.time()
        sink(batch, b)
        dt = time.time() - t0
        n_files = len(
            [f for f in os.listdir(path) if f.endswith(".parquet")]
        )
        print(
            f"batch {b}: {dt:.2f}s apply, snapshot files={n_files}",
            flush=True,
        )

    snap = spark.read.parquet(path)
    live = read_cdc_table(spark, path)
    print(
        f"final: snapshot rows={snap.count()} (<= {n_keys} keys + tombstones), "
        f"live rows={live.count()}, distinct keys={snap.select('k').distinct().count()}"
    )


if __name__ == "__main__":
    main()
