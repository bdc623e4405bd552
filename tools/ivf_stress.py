"""One-off IVF scale stress: 100k synthetic 64-dim vectors, build-once
index, single + 100-query batch probes, recall vs brute force on a sample.

Run: PYTHONPATH=. python tools/ivf_stress.py  (records evidence for
BASELINE.md — not a pytest; takes a few minutes).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def main() -> None:
    from trading_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        build_ivf_index,
    )
    from trading_data_pipeline_spark.session import build_session

    spark = build_session("ivf-stress")
    spark.sparkContext.setLogLevel("ERROR")

    n, dim, n_cells, n_probe = 100_000, 64, 64, 8
    # deterministic synthetic corpus: seeded per-row hash noise, JVM-side
    vec = F.array(
        *[
            (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j)), F.lit(2000)) / 1000.0 - 1.0)
            for j in range(dim)
        ]
    )
    corpus = (
        spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .repartition(32)
        .persist()
    )
    corpus.count()

    t0 = time.time()
    idx = build_ivf_index(corpus, n_cells=n_cells)
    idx.assigned.count()
    t_build = time.time() - t0

    qvec = [float(x) for x in corpus.filter("vec_id = 7").first().embedding]
    t0 = time.time()
    approx = [r.vec_id for r in idx.probe(qvec, k=10, n_probe=n_probe).collect()]
    t_probe = time.time() - t0

    queries = (
        corpus.filter(F.col("vec_id") < 100)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )
    t0 = time.time()
    n_batch = idx.probe_batch(queries, k=10, n_probe=n_probe).count()
    t_batch = time.time() - t0

    t0 = time.time()
    exact = [r.vec_id for r in brute_force_topk(corpus, qvec, k=10).collect()]
    t_brute = time.time() - t0
    recall = len(set(exact) & set(approx)) / 10

    # the saved, cell-partitioned layout: probes prune partitions (I/O
    # skipped, not just compute) — the form that matters at 100 TB
    import shutil

    from trading_data_pipeline_spark.operators.similarity import IvfIndex

    path = "spark-warehouse/ivf_stress_index"
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    idx.save(path)
    t_save = time.time() - t0
    loaded = IvfIndex.load(spark, path)
    t0 = time.time()
    saved_probe = [
        r.vec_id for r in loaded.probe(qvec, k=10, n_probe=n_probe).collect()
    ]
    t_saved = time.time() - t0
    assert saved_probe == approx
    shutil.rmtree(path, ignore_errors=True)

    cells = idx.assigned.groupBy("__cell").count().collect()
    sizes = sorted(r["count"] for r in cells)
    print(
        f"n={n} dim={dim} cells={n_cells} probe={n_probe}\n"
        f"build(sample-fit+assign+persist): {t_build:.1f}s\n"
        f"single probe (in-memory): {t_probe:.2f}s (brute force: {t_brute:.2f}s)\n"
        f"save partitioned-by-cell: {t_save:.1f}s; "
        f"probe over saved index (partition-pruned): {t_saved:.2f}s\n"
        f"batch 100 queries: {t_batch:.1f}s ({n_batch} rows, "
        f"{t_batch / 100 * 1000:.0f}ms/query amortized)\n"
        f"recall@10 vs brute force: {recall:.2f}\n"
        f"cell sizes min/med/max: {sizes[0]}/{sizes[len(sizes)//2]}/{sizes[-1]}"
    )


if __name__ == "__main__":
    main()
