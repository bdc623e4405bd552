"""Scan-parallelism floor for CPU-bound operators.

A parquet scan's task count is bounded by its split count; a small table
written as one file yields ONE task, which pins any CPU-heavy downstream
operator (shingling, per-token hashing, Pandas UDFs) to a single core no
matter how wide the cluster is. At 100 TB a scan arrives in thousands of
splits and :func:`ensure_parallelism` is a no-op; on small inputs it pays
one tiny shuffle to unlock every core. Catalyst/AQE never does this —
AQE only re-plans *shuffle* boundaries, not source splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition ``df`` to ``defaultParallelism`` iff its
    current partition count is below ``min_fraction`` of it.

    Use ONLY in front of operators whose per-row cost dwarfs a row's
    shuffle cost (hashing every token beats re-sending the text once);
    plain scans/filters/aggregations must NOT call this — their bottleneck
    is IO, and Catalyst already sizes those stages.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df


def keyed_fanout(df: DataFrame, per_split: int = 8) -> int:
    """Partition count for an explicit BY-KEY repartition feeding a
    compute-bound aggregate/join: ``per_split ×`` the input's scan-split
    count, clamped to [defaultParallelism, 8 × defaultParallelism].

    Why not a constant: byte-based AQE sizing coalesces a compute-bound
    exchange onto few fat tasks (hash-aggregate state spills, stragglers
    — the round-11 jaccard/basket findings), while a flat 8×-core count
    at SMALL inputs pays hundreds of near-empty task launches (measured:
    q_basket_pairs sf0.1 2.2 → 3.6 s). Scaling with the split count
    keeps the task size roughly constant across scales — at cluster
    scale thousands of splits hit the 8×-core ceiling, exactly the
    jaccard PTJ fan-out; locally small inputs stay at the core count.
    The explicit count also keeps AQE from re-coalescing the exchange.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    splits = df.rdd.getNumPartitions()
    return max(par, min(per_split * par, per_split * splits))
