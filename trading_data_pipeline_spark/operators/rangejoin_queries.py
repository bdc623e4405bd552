"""Declared range-join query: price-band classification of orders via the
bucketed interval join (operators/rangejoin.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register
from .rangejoin import range_join_bucketed

# (band, lo, hi) — half-open [lo, hi); covers o_totalprice's full range
PRICE_BANDS = [
    ("xs", 0.0, 50_000.0),
    ("s", 50_000.0, 150_000.0),
    ("m", 150_000.0, 300_000.0),
    ("l", 300_000.0, 450_000.0),
    ("xl", 450_000.0, 1_000_000.0),
]


@register(
    "q_range_join",
    f"""
    WITH bands(band, lo, hi) AS (VALUES
      {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)})
    SELECT o.o_orderkey, b.band, round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    """,
    doc="Range (interval) join orders→price bands via bucketization: "
    "floor(value/width) equi-key + interval replication + exact residual "
    "filter — hash join instead of the nested-loop a naive range "
    "predicate forces; the pattern that scales to non-broadcastable "
    "interval tables",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    joined = range_join_bucketed(
        orders, bands, value_col="o_totalprice", lo_col="lo", hi_col="hi",
        bucket_width=50_000.0,
    )
    return joined.select(
        "o_orderkey", "band", F.round("o_totalprice", 2).alias("o_totalprice")
    )
