"""Similarity search over embedding columns (extension op E3).

- :func:`brute_force_topk` — exact cosine top-k against one query vector.
  The reference correctness baseline; per-row fold + TakeOrderedAndProject,
  no shuffle of the corpus. Still the right answer for one-off queries even
  at scale (a single pass).
- :func:`lsh_topk` — BucketedRandomProjectionLSH approximate NN: the
  many-queries / low-latency path; buckets bound the candidate set so cost
  is |bucket| not |corpus| (ICDE-2021 / SIGMOD-2020 top-k patterns,
  PAPERS.md).
- :func:`ivf_topk` — inverted-file ANN: k-means cells + n_probe nearest
  cells searched exactly. The FAISS-style layout for 100 TB: the index
  (cell assignments) is built once and stored partitioned by cell, so a
  query touches n_probe partitions instead of the corpus.
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


def build_ivf_index(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """Assign every vector to its nearest k-means centroid.

    Returns (df + ``__cell`` column, centroid list). In production the
    assigned table is written partitioned by ``__cell`` (one directory per
    cell → partition pruning IS the index); here it stays a DataFrame.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        k=n_cells, seed=seed, featuresCol="__features", predictionCol="__cell"
    ).fit(feat)
    assigned = model.transform(feat).drop("__features")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF: probe the ``n_probe`` cells whose
    centroids are most cosine-similar to the query, brute-force inside.

    Centroids are driver-side (n_cells × dim floats — tiny), so probe
    selection costs nothing distributed; the scan then touches only the
    probed cells (with a cell-partitioned index layout: only those
    directories). Recall is tested vs brute force."""
    import math

    assigned, centroids = build_ivf_index(df, n_cells, vec_col, seed)

    qnorm = math.sqrt(sum(x * x for x in query_vec))

    def cos(c: list[float]) -> float:
        dot = sum(a * b for a, b in zip(c, query_vec))
        cn = math.sqrt(sum(a * a for a in c))
        return dot / (cn * qnorm) if cn and qnorm else 0.0

    probe = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i]))[:n_probe]
    pruned = assigned.filter(F.col("__cell").isin(probe)).drop("__cell")
    return brute_force_topk(pruned, query_vec, k, id_col, vec_col)
