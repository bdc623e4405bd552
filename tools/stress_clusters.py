"""Scale stress for near-dup clustering: replicate the corpus N× with
disjoint ids (every doc becomes an N-clique of exact duplicates via its
replicas), run banded MinHash pair generation, then connected components.

Validates that iterative min-label propagation converges in few rounds on
millions of edges and that every replica cluster collapses to one label.

Usage: python tools/stress_clusters.py [replicas]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading_data_pipeline_spark.operators.dedup import (  # noqa: E402
    banded_minhash_pairs,
    dup_clusters,
)
from trading_data_pipeline_spark.registry import load  # noqa: E402
from trading_data_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    spark = build_session("stress-clusters")
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
    pairs = banded_minhash_pairs(big)
    clusters = dup_clusters(pairs)
    n_nodes = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    wall = time.perf_counter() - t0

    # sanity: a replica family (same base id mod 10M) must share one label
    mixed = (
        clusters.withColumn("base", F.col("doc_id") % 10_000_000)
        .groupBy("base")
        .agg(F.countDistinct("cluster_id").alias("k"))
        .filter("k > 1")
        .count()
    )
    print(
        json.dumps(
            {
                "metric": "stress_dup_clusters",
                "docs": n_docs * replicas,
                "nodes_in_pairs": n_nodes,
                "clusters": n_clusters,
                "split_replica_families": mixed,
                "wall_s": round(wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
