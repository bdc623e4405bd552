"""Bloom-pruning stress: a wide synthetic fact joined to a SELECTIVE dim
(only ``dim_frac`` of fact keys match). The plain sort-merge join must
shuffle every fact row; the Bloom-pruned plan filters the fact scan with
the dim-built bitmap first, so the exchange carries only matches + false
positives.

Measured over identical data, broadcast DISABLED so the fact-side
exchange really happens (a broadcastable dim would short-circuit the
experiment — and at 100 TB the dim often isn't broadcastable):
  plain  — fact JOIN dim (sort-merge, full fact shuffle);
  bloom  — plans/bloom.bloom_pruned_join (scan-level bitmap filter).

Both variants must produce the identical aggregate (asserted in-run).
Reported: wall clock + rows entering the join-side exchange (the pruning
ratio is the number that scales: at 1% selectivity, 99% of the 100 TB
fact never leaves its scan stage).

Usage: python tools/stress_bloom.py [n_fact] [n_keys] [dim_frac]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading_data_pipeline_spark.plans.bloom import (  # noqa: E402
    bloom_bitmap,
    with_bloom_filter,
)
from trading_data_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dim_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.01

    spark = build_session("stress-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    fact = spark.range(n_fact).select(
        (F.col("id") % n_keys).alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    n_dim = max(1, int(n_keys * dim_frac))
    # dim keys spread across the key space, not a contiguous range
    dim = spark.range(n_dim).select(
        (F.col("id") * int(1 / dim_frac)).alias("dk")
    )
    fact.persist().count()
    dim.persist().count()

    def agg(joined):
        return joined.agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        ).first()

    t0 = time.time()
    plain = agg(fact.join(dim, fact["k"] == dim["dk"]))
    t_plain = time.time() - t0

    m_bits, k_hashes = 1 << 17, 3  # 16 KiB bitmap: cache-resident probe
    t0 = time.time()
    bitmap = bloom_bitmap(dim, "dk", m_bits, k_hashes)
    t_build = time.time() - t0  # once per dim version, amortized over queries
    pruned = with_bloom_filter(fact, bitmap, "k", m_bits, k_hashes)
    t0 = time.time()
    bloomed = agg(pruned.join(dim, F.col("k") == dim["dk"]))
    t_query = time.time() - t0

    n_pruned = pruned.count()
    assert (plain["n"], plain["s"]) == (bloomed["n"], bloomed["s"]), (
        plain, bloomed,
    )

    print(json.dumps({
        "n_fact": n_fact,
        "n_dim": n_dim,
        "plain_sec": round(t_plain, 2),
        "bloom_build_sec": round(t_build, 2),
        "bloom_query_sec": round(t_query, 2),
        "rows_into_exchange_plain": n_fact,
        "rows_into_exchange_bloom": n_pruned,
        "true_matches": plain["n"],
        "prune_ratio": round(1 - n_pruned / n_fact, 4),
        "fp_among_nonmatch": n_pruned - plain["n"],
    }))


if __name__ == "__main__":
    main()
