"""Bucketed table layout: shuffle-free co-located joins.

Writing both sides of a recurring join bucketed by the join key (same
bucket count) lets every subsequent join run with ZERO exchanges — each
bucket pair joins locally. At 100 TB this turns the nightly
fact-to-fact join from the dominant shuffle into a scan-side merge; the
one-time bucketing cost amortizes over every downstream query.

Spark bucketing requires the table catalog (``saveAsTable``); with
``path`` the data is external and survives catalog drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: list[str],
    num_buckets: int,
    sort_keys: list[str] | None = None,
    path: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join keys.

    ``sort_keys`` additionally sorts within buckets — joins become merge
    joins with neither exchange NOR sort.
    """
    writer = df.write.format(fmt).mode("overwrite").bucketBy(num_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata only flows through the catalog, not
    through ``spark.read.parquet`` on the files."""
    return spark.table(table)
