"""Scale stress for the streaming SimHash near-dup suppressor: replicate
the documents corpus N× with disjoint ids and stream it through
``neardup_stream`` in multiple micro-batches.

Replication makes every original doc the head of an N-member exact-dup
family (identical text → identical signature → hamming 0), so the run
verifies both throughput of the Python state path and the suppression
guarantee at scale: per family exactly ONE kept doc, all later replicas
dropped against it. It also reports per-band state occupancy vs the
FIFO cap — the bound that keeps state-store memory flat on an unbounded
stream.

Usage: python tools/stress_neardup_stream.py [replicas] [n_batches]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading_data_pipeline_spark.registry import load  # noqa: E402
from trading_data_pipeline_spark.session import build_session  # noqa: E402
from trading_data_pipeline_spark.streaming.stateful import (  # noqa: E402
    NEARDUP_BAND_BITS,
    NEARDUP_STATE_CAP,
    neardup_stream,
)


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    spark = build_session("stress-neardup-stream")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    # replica r of doc d arrives at ts = epoch + r (replica 0 first);
    # ids are disjoint: doc_id + r * 10_000_000
    big = docs.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "rep")
    ).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.to_timestamp(
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("rep"))
        ).alias("ts"),
        "text",
        F.col("rep"),
    )
    src = os.path.join(tempfile.mkdtemp(prefix="neardup_stream_"), "docs")
    # one file per replica wave → availableNow sees ordered micro-batch
    # waves (originals land before their copies)
    big.repartitionByRange(n_batches, "rep").sortWithinPartitions(
        "rep", "doc_id"
    ).write.parquet(src)

    t0 = time.time()
    stream = neardup_stream(
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stress_neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(1800), "stream did not finish in 30 min"
    wall = time.time() - t0

    out = spark.table("stress_neardup")
    total = out.count()
    kept = out.filter("kept").count()
    # family key recovers the original doc id
    fam = out.withColumn("fam", F.col("doc_id") % 10_000_000)
    kept_per_family = (
        fam.filter("kept").groupBy("fam").count().agg(F.max("count")).first()[0]
    )
    families_kept = fam.filter("kept").select("fam").distinct().count()
    # End-state per-band occupancy: only KEPT docs enter state, so the
    # final state of band b = min(cap, kept docs in b). Recompute each
    # kept doc's band from the batch form of the same signature
    # expression and report the occupancy distribution vs the cap.
    from trading_data_pipeline_spark.operators.dedup import simhash_expr

    kept_bands = (
        spark.read.parquet(src)
        .select(
            "doc_id",
            F.shiftright(simhash_expr("text"), 60 - NEARDUP_BAND_BITS).alias(
                "band"
            ),
        )
        .join(out.filter("kept").select("doc_id"), "doc_id")
        .groupBy("band")
        .count()
    )
    occ = kept_bands.agg(
        F.max(F.least(F.col("count"), F.lit(NEARDUP_STATE_CAP))),
        F.sum((F.col("count") >= NEARDUP_STATE_CAP).cast("long")),
    ).first()
    max_band_occupancy, bands_at_cap = int(occ[0]), int(occ[1])

    print(
        json.dumps(
            {
                "metric": "neardup_stream_stress",
                "docs_streamed": n_docs * replicas,
                "replicas": replicas,
                "batches": n_batches,
                "kept": kept,
                "dropped": total - kept,
                "max_kept_per_family": kept_per_family,
                "families_with_a_keeper": families_kept,
                "state_cap": NEARDUP_STATE_CAP,
                "max_band_occupancy": max_band_occupancy,
                "bands_at_cap": bands_at_cap,
                "docs_per_sec": round(n_docs * replicas / wall, 1),
                "wall_s": round(wall, 1),
            }
        )
    )
    # the suppression guarantee: never two keepers in one exact-dup family
    assert kept_per_family == 1, "a family kept more than one replica"
    # most families keep exactly one doc; the shortfall (observed ~4% at
    # sf0.1) is ORIGINALS suppressed as near-dups of OTHER originals —
    # correct behavior on this ~30-word-vocabulary synthetic corpus where
    # short docs genuinely collide within max_hamming
    assert families_kept >= n_docs * 0.9, (families_kept, n_docs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
