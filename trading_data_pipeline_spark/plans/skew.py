"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most hot-key cases at runtime by splitting oversized
shuffle partitions. Salting is the explicit fallback for the cases AQE
can't fix — e.g. a single key so hot that even a split partition's build
side won't fit, or non-sort-merge plans.

Mechanics: the big side's key is extended with a deterministic salt in
``[0, salt)``; the small side is replicated ``salt`` times so every salted
key still finds its match. One hot key now lands on ``salt`` reducers
instead of one. Cost: small side × salt (keep it for genuinely small
sides; for big-big skew, isolate the hot keys and union a broadcast plan
for just those).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` with the big side salted ``salt`` ways.

    The salt is ``xxhash64`` of the big side's whole row (deterministic —
    task retries and speculative execution see the same salt, unlike
    ``F.rand``). Output equals ``big.join(small, on, how)`` exactly; only
    the physical key distribution changes.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    salted_big = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    replicated_small = small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)])),
    )
    return salted_big.join(replicated_small, [*on, SALT_COL], how).drop(SALT_COL)
