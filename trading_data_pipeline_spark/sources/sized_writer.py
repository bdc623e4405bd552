"""Size-targeted parquet output — the small-files / giant-files guard.

At 100 TB, output file sizing is an operational correctness issue, not a
nicety: one-file-per-task writes after a 10k-partition shuffle produce 10k
tiny files per job (metastore/listing pain, NameNode pressure, slow
downstream scans); a blind ``coalesce(8)`` on a huge result produces
multi-GB files that downstream readers can't split parallel enough. The
standard recipe is to derive the partition count from the DATA SIZE, not a
constant.

``write_sized_parquet`` estimates output bytes from Catalyst's optimized-
plan statistics (file-scan relations carry real file sizes; post-filter
estimates are propagated), converts with a parquet compression factor, and
repartitions to ``ceil(bytes / target)`` before writing. The estimate is
driver-side plan metadata — no extra Spark job, no sampling pass.

No reference parallel (the reference writes one pandas frame to one key);
north-star scope from BASELINE.json.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Catalyst sizeInBytes describes the in-memory/scan estimate; parquet with
# snappy typically lands at ~1/2.5 of that for mixed text/numeric columns.
# A conservative factor errs toward slightly smaller files, never giant ones.
PARQUET_COMPRESSION_FACTOR = 2.5


def estimate_plan_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate for the result, in bytes."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def partitions_for_target(
    df: DataFrame, target_mb: int = 128, max_partitions: int = 100_000
) -> int:
    est = estimate_plan_bytes(df) / PARQUET_COMPRESSION_FACTOR
    return max(1, min(max_partitions, math.ceil(est / (target_mb * 1024 * 1024))))


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Write ``df`` as parquet files sized ~``target_mb`` each; returns the
    partition count used. Uses round-robin ``repartition(n)`` (uniform
    sizes); with ``partition_by``, files are sized per directory only as
    well as the key skew allows — pair with salting for heavy hive keys."""
    n = partitions_for_target(df, target_mb)
    writer = df.repartition(n).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return n


def compact_partitions(
    spark,
    path: str,
    partition_col: str,
    values: list,
    target_mb: int = 128,
) -> int:
    """Rewrite the given hive partitions of a parquet table into
    size-targeted files — the maintenance job that undoes streaming's
    small-file accumulation (every micro-batch leaves a file per task per
    date; after a day of 1-minute triggers a hot date holds thousands).

    Reads ONLY the named partitions (partition pruning), repartitions to
    the size-derived count, and rewrites with DYNAMIC partition overwrite
    so exactly those directories are replaced — concurrent readers of
    other partitions are untouched, and the operation is idempotent.
    Returns the partition count written."""
    table = spark.read.parquet(path)
    subset = table.filter(F.col(partition_col).isin(values))
    n = partitions_for_target(subset, target_mb)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            subset.repartition(n)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n
