"""Scale-safe 2-D skyline (Pareto frontier) — minimize x, maximize y.

A point q survives iff NO point has strictly smaller x AND strictly
greater y, i.e. ``q.y >= max(y over points with x < q.x)``. The naive
formulation is a GLOBAL ``max(y) OVER (ORDER BY x RANGE ... 1
PRECEDING)`` — a SinglePartition window that routes the whole table
through one task (the oracle uses exactly that shape; this plan refuses
it). Two-pass instead, same machinery as plans/global_rank.py:

1. approx_percentile cuts on x define contiguous buckets; a row lands in
   bucket b iff x > cut_b, so every row in a LOWER bucket has strictly
   smaller-or-equal x than every cut below b — and since membership in b
   requires x > cut_{b-1}, rows in lower buckets have STRICTLY smaller x
   than any row of b. Boundary equality cannot leak.
2. per-bucket running max of y over an integer-keyed RANGE frame
   (``1 PRECEDING`` excludes x-ties — ties never dominate each other);
3. per-bucket y-max rows (<= n_buckets scalars) fold into prefix maxima
   embedded as literals.

Every stage is partition-parallel; driver sees only the bucket-max
vector. x must be (convertible to) an integer key for the RANGE frame —
use cents/micros for decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NEG_INF = float("-inf")


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the (min x, max y) Pareto frontier.

    ``x_col`` must be integer-typed (the strict-precedence RANGE frame
    needs an integral order key). Returns the input rows unchanged,
    filtered to the frontier.
    """
    spark = df.sparkSession
    nb = n_buckets or max(spark.sparkContext.defaultParallelism, 16)
    probs = ", ".join(str((i + 1) / nb) for i in range(nb - 1))
    cuts = df.select(
        F.expr(f"approx_percentile({x_col}, array({probs}), 10000)").alias("c")
    ).first()["c"] or []
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(F.col(x_col) > F.lit(c), 1).otherwise(0)
    bucketed = df.withColumn("_bkt", bucket)

    maxes = {
        r["_bkt"]: r["m"]
        for r in bucketed.groupBy("_bkt").agg(F.max(y_col).alias("m")).collect()
    }
    prefix: dict[int, float] = {}
    acc = _NEG_INF
    for b in sorted(maxes):
        prefix[b] = acc          # max y over all STRICTLY lower buckets
        acc = max(acc, maxes[b])
    prefix_map = F.create_map(
        *[x for kv in prefix.items() for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
    )

    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(x_col).cast("long"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local_max = F.max(y_col).over(w)
    dominated_by = F.greatest(
        F.coalesce(local_max, F.lit(_NEG_INF)),
        F.coalesce(F.element_at(prefix_map, F.col("_bkt")), F.lit(_NEG_INF)),
    )
    return (
        bucketed.withColumn("_dom", dominated_by)
        .filter(F.col(y_col) >= F.col("_dom"))
        .drop("_bkt", "_dom")
    )
