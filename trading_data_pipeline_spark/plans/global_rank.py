"""Scale-safe global ranking: two-pass quantile bucketing instead of the
single-partition global window.

``Window.orderBy(...)`` with no partition key routes the ENTIRE table
through one task — the classic cluster-killer for global rank/ntile.
The two-pass shape here keeps every stage partition-parallel:

1. approx_percentile cut points over the sort key (one partial-agg pass)
   define contiguous, monotone buckets;
2. ``row_number`` runs per-bucket (hash exchange on the bucket id — the
   only wide shuffle);
3. per-bucket counts (one tiny row per bucket) are collected to the
   driver and turned into exact global-rank offsets, embedded back into
   the plan as literals.

Every step is a deterministic function of the data, so the returned lazy
DataFrame is safe to re-execute (no persisted intermediate whose loss
would skew ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact ``row_number() OVER (ORDER BY order_cols)`` without a
    SinglePartition window: quantile-bucket on ``order_cols[0]`` (must be
    numeric), per-bucket ``row_number``, then exact bucket-size offsets
    folded in as literals. Returns (df + ``_grn`` column, total rows);
    callers drop or rename ``_grn``. The only driver-side data is the
    per-bucket count vector (<= n_buckets rows)."""
    spark = df.sparkSession
    key = order_cols[0]
    nb = n_buckets or max(spark.sparkContext.defaultParallelism, 16)
    probs = ", ".join(str((i + 1) / nb) for i in range(nb - 1))
    cuts = df.select(
        F.expr(f"approx_percentile({key}, array({probs}), 10000)").alias("c")
    ).first()["c"] or []
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(F.col(key) > F.lit(c), 1).otherwise(0)
    bucketed = df.withColumn("_bkt", bucket)
    w = Window.partitionBy("_bkt").orderBy(*order_cols)
    ranked = bucketed.withColumn("_lr", F.row_number().over(w))

    sizes = {
        r["_bkt"]: r["n"]
        for r in bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(sizes.values())
    if n == 0:
        return df.withColumn("_grn", F.lit(0).cast("long")), 0
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(sizes):
        offsets[b] = acc
        acc += sizes[b]
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    rank = F.element_at(off_map, F.col("_bkt")) + F.col("_lr")
    return ranked.withColumn("_grn", rank.cast("long")).drop("_bkt", "_lr"), n


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[str],
    bucket_col: str | None = None,
    out_col: str = "tile",
    n_buckets: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n_tiles) OVER (ORDER BY order_cols)`` without a
    SinglePartition window. ``order_cols[0]`` must be numeric (it feeds
    approx_percentile); remaining cols break ties. Output keeps ``df``'s
    columns named in ``order_cols[0:1]``'s select plus ``out_col``."""
    ranked, n = global_row_number(df, order_cols, n_buckets)
    if n == 0:
        return df.withColumn(out_col, F.lit(0).cast("int"))
    rank = F.col("_grn")

    # ntile semantics: first (n % t) tiles get floor(n/t)+1 rows, rest floor(n/t)
    base, rem = n // n_tiles, n % n_tiles
    if base == 0:
        tile = rank
    else:
        head = rem * (base + 1)
        tile = F.when(
            F.lit(rem > 0) & (rank <= head), ((rank - 1) / (base + 1)).cast("long") + 1
        ).otherwise(F.lit(rem) + ((rank - F.lit(head) - 1) / base).cast("long") + 1)
    return ranked.withColumn(out_col, tile.cast("int")).drop("_grn")


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    n_buckets: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact running ``sum(value_col) OVER (ORDER BY order_cols)`` (long
    arithmetic) without a SinglePartition window — the cumulative twin of
    :func:`global_row_number`: quantile-bucket on ``order_cols[0]``,
    per-bucket windowed cumsum, exact per-bucket totals folded back as
    literal offsets. Returns (df + ``_gcum`` column, grand total).
    ``value_col`` must be integral (exact sums; callers lift decimals to
    cents the way the drawdown/MAD family does)."""
    spark = df.sparkSession
    key = order_cols[0]
    nb = n_buckets or max(spark.sparkContext.defaultParallelism, 16)
    probs = ", ".join(str((i + 1) / nb) for i in range(nb - 1))
    cuts = df.select(
        F.expr(f"approx_percentile({key}, array({probs}), 10000)").alias("c")
    ).first()["c"] or []
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(F.col(key) > F.lit(c), 1).otherwise(0)
    bucketed = df.withColumn("_bkt", bucket)
    w = (
        Window.partitionBy("_bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("_lc", F.sum(value_col).over(w))

    sums = {
        r["_bkt"]: r["s"]
        for r in bucketed.groupBy("_bkt")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    total = int(sum(sums.values())) if sums else 0
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += int(sums[b])
    if not offsets:
        return df.withColumn("_gcum", F.lit(0).cast("long")), 0
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    cum = F.element_at(off_map, F.col("_bkt")) + F.col("_lc")
    return local.withColumn("_gcum", cum.cast("long")).drop("_bkt", "_lc"), total
