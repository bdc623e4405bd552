"""Scale stress for the dedup path: replicate the documents corpus N× with
disjoint ids and run banded MinHash end-to-end.

Replication keeps each doc's text identical across replicas, so every
doc becomes a cluster of N exact duplicates — the adversarial LSH case
(every bucket is hot). Run with and without the bucket cap to see the
quadratic blow-up the cap exists to prevent.

Usage: python tools/stress_dedup.py [replicas] [max_bucket|none]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading_data_pipeline_spark.operators.dedup import banded_minhash_pairs  # noqa: E402
from trading_data_pipeline_spark.registry import load  # noqa: E402
from trading_data_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cap_arg = sys.argv[2] if len(sys.argv) > 2 else "1000"
    max_bucket = None if cap_arg.lower() == "none" else int(cap_arg)

    spark = build_session("stress-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    big = (
        docs.crossJoin(spark.range(replicas).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep")
    )

    t0 = time.perf_counter()
    n_pairs = banded_minhash_pairs(big, max_bucket=max_bucket).count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "stress_banded_minhash",
                "docs": n_docs * replicas,
                "max_bucket": max_bucket,
                "pairs": n_pairs,
                "wall_s": round(wall, 2),
                "docs_per_s": round(n_docs * replicas / wall),
            }
        )
    )


if __name__ == "__main__":
    main()
