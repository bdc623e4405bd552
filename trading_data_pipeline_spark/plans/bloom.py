"""Bloom-filter runtime join pruning: filter the FACT side of a join at
the scan, before its shuffle, using a compact bitmap built from the dim
side's join keys.

At 100 TB the dominant cost of ``fact JOIN dim ON fact.k = dim.k`` with a
selective dim is shuffling fact rows that can never match. A Bloom filter
built over the dim keys is a few KB of bitmap; embedding it in the fact
scan's filter drops most non-matching rows map-side, so the exchange
carries only (matches + false positives). This is the manual, inspectable
form of Spark's own AQE runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) — built here as an
explicit operator so the pruning is deterministic, testable, and usable
from any query shape (the AQE rewrite only fires under specific join
patterns and thresholds).

Correctness contract: the bitmap test may pass non-members (false
positives) but NEVER rejects a member, so ``prefilter + exact join ≡
plain join`` — that equivalence IS the registered oracle, and the false
positive rate is ~(1 - e^{-kn/m})^k, sized below for <1% at the default
dim cardinalities.

Everything stays JVM-side: positions are ``xxhash64(key, seed)`` mod m
(whole-stage codegen), the bitmap build is one partial-aggregated
``bit_or`` groupBy over <= m/64 word rows, and the probe is a literal
array indexed with ``element_at`` + ``shiftright`` — no UDF, no
broadcast-join machinery on the probe path. The driver collects only the
bitmap words (<= m/64 longs, a few KB — tiny by design, like the meta
date list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 17  # 128 Ki bits = 2 KiB words -> <1% fpp at ~10k keys
DEFAULT_K = 5


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: xxhash64 with k distinct integer salts."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_bitmap(
    dim: DataFrame, key_col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> list[int]:
    """Build the bitmap over ``dim[key_col]`` as m_bits/64 longs.

    Distributed: explode each key into its k positions, OR the
    single-bit words per 64-bit word index (map-side partial ``bit_or``),
    and collect the <= m_bits/64 non-zero words.
    """
    assert m_bits % 64 == 0
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    words = (
        dim.select(pos)
        .groupBy((F.col("pos") / 64).cast("int").alias("w"))
        # shiftleft's pyspark wrapper takes only a literal shift — use the
        # SQL form so the shift amount can be the pos column
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")).alias("bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: list[int], m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> Column:
    """Membership test column: true for every dim key (no false
    negatives), true for ~fpp of non-members. The bitmap rides as one
    array<long> literal in the plan (2 KiB at the default size)."""
    words = F.lit(bitmap)
    one = F.lit(1).cast("long")

    def _shiftright(word: Column, n: Column) -> Column:
        # pyspark's shiftright wrapper takes only a literal shift amount;
        # dividing by 2^n (exact for longs >= 0 after masking) would lose
        # the sign bit, so route through the SQL function instead
        return F.call_function("shiftright", word, n)

    cond = F.lit(True)
    for p in _positions(key, m_bits, k):
        word = F.element_at(words, (p / 64).cast("int") + 1)
        bit = _shiftright(word, (p % 64).cast("int")).bitwiseAND(one)
        cond = cond & (bit == one)
    return cond


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """``fact JOIN dim`` with a dim-built Bloom pre-filter on the fact
    scan. Result is EXACTLY the plain join (the closing equi-join removes
    Bloom false positives); the pre-filter only thins the fact exchange.
    """
    bitmap = bloom_bitmap(dim, dim_key, m_bits, k)
    pruned = fact.filter(bloom_might_contain(F.col(fact_key), bitmap, m_bits, k))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
