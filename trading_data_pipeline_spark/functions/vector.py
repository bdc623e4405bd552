"""Vector column expressions over ``array<float|double>`` embeddings.

Pure built-in higher-order functions (``zip_with`` + ``aggregate``) — the
whole computation stays JVM-side inside whole-stage codegen; no Python UDF,
no serialization. A sequential left fold is used for the dot product so the
result is bit-identical to a sequential C implementation (verified against
DuckDB's ``list_cosine_similarity`` — exact match on the driver testdata).

At 100 TB these expressions vectorize per-row with no shuffle; the shuffle
story belongs to the operator using them (top-k, LSH bucketing, …).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential fold (deterministic addition order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a|·|b|); inputs should already be array<double>."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
