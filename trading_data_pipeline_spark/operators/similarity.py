"""Similarity search over embedding columns (extension op E3).

- :func:`brute_force_topk` — exact cosine top-k against one query vector.
  The reference correctness baseline; per-row fold + TakeOrderedAndProject,
  no shuffle of the corpus. Still the right answer for one-off queries even
  at scale (a single pass).
- :func:`lsh_topk` — BucketedRandomProjectionLSH approximate NN: the
  many-queries / low-latency path; buckets bound the candidate set so cost
  is |bucket| not |corpus| (ICDE-2021 / SIGMOD-2020 top-k patterns,
  PAPERS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.

    The query vector is embedded as a literal array (broadcast by value in
    the plan); ordering ties break on id so the cut is deterministic.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity(F.col(vec_col).cast("array<double>"), q)
    out = df.select(F.col(id_col), sim.alias("_sim"))
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(*exclude_ids))
    return (
        out.orderBy(F.desc("_sim"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("_sim", 4).alias("cosine"))
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-projection LSH (MLlib).

    Euclidean-bucketed ANN; for unit-normalized embeddings the Euclidean
    ordering matches the cosine ordering. Returns (id, distCol) for the
    approx neighbors; recall vs :func:`brute_force_topk` is asserted in
    tests/test_similarity.py.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        id_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feat)
    from pyspark.ml.linalg import Vectors

    nn = model.approxNearestNeighbors(feat, Vectors.dense(query_vec), k, distCol="dist")
    return nn.select(id_col, F.round("dist", 4).alias("dist"))
