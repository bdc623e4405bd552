"""The repo-wide cross-engine quantization convention.

floor(x*s + 0.5)/s — pure IEEE ops, bit-identical on any engine (unlike
engine round(), which disagrees exactly at representation boundaries:
Java rounds the shortest decimal repr, C the binary value — see the
round-4 10×-sweep note in BASELINE.md). Every operator module and the
streaming state machines quantize through this one definition; oracles
render the same formula in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def q(x: Column, s: int) -> Column:
    """floor(x*s+0.5)/s — engine-exact quantization."""
    return F.floor(x * s + 0.5) / s
