"""Range (interval) join via bucketization — the equi-join reduction.

A naive range join (``fact.value BETWEEN dim.lo AND dim.hi``) has no
equi-key, so Spark falls back to BroadcastNestedLoopJoin — O(|fact|·|dim|)
comparisons, a non-starter when the interval side doesn't fit in a
broadcast. The standard distributed reduction (IP-range lookups, genomic
interval overlap, price banding): pick a bucket width, assign each fact
row to ``floor(value / width)``, replicate each interval to every bucket
it overlaps, hash-join on the bucket id, then apply the exact range
predicate as a post-filter. Replication factor = interval length / width;
pick the width near the median interval length so each interval lands in
O(1) buckets.

No reference parallel (the reference has no joins at all — SURVEY.md
§2.e); pattern from the distributed-similarity/interval-join literature
(PAPERS.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """``facts ⋈ intervals ON lo <= value < hi`` as a bucketed equi-join.

    Interval bounds are half-open ``[lo, hi)``. Both inputs keep all their
    columns; the bucket id is internal.
    """

    def bucket_of(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    fb = facts.withColumn(BUCKET_COL, bucket_of(F.col(value_col)))
    ib = intervals.withColumn(
        BUCKET_COL,
        F.explode(
            F.sequence(
                bucket_of(F.col(lo_col)),
                # hi is exclusive: a hi exactly on a bucket edge doesn't
                # reach into the next bucket
                bucket_of(F.col(hi_col) - F.lit(1e-9)),
            )
        ),
    )
    return (
        fb.join(ib, BUCKET_COL, how)
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop(BUCKET_COL)
    )
