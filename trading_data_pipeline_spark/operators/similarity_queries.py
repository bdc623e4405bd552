"""Declared similarity-search queries (extension op E3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import load, register
from .similarity import brute_force_topk, ivf_topk, lsh_topk

QUERY_VEC_ID = 0
TOP_K = 10


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    # one-row lookup of the query point; fine to collect (it IS the query)
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(f"vec_id = {QUERY_VEC_ID}")
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row.embedding]


@register(
    "q_topk_cosine",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
               WHERE vec_id = {QUERY_VEC_ID})
    SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[], q.qe), 4) AS cosine
    FROM embeddings, q
    WHERE vec_id != {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.qe) DESC, vec_id
    LIMIT {TOP_K}
    """,
    doc="Exact cosine top-k vs one query vector: per-row JVM fold + "
    "TakeOrderedAndProject (per-partition heap, driver merge — no global "
    "sort). Cosine values are bit-identical to DuckDB's implementation.",
)
def q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb, _query_vec(spark, sf_dir), k=TOP_K, exclude_ids=(QUERY_VEC_ID,)
    )


@register(
    "q_ann_lsh",
    None,  # LSH bucket choices are engine-specific → rows-only; recall tested
    doc="Approximate NN via BucketedRandomProjectionLSH — the many-queries "
    "scale path; recall vs brute force asserted in tests/test_similarity.py",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return lsh_topk(emb, _query_vec(spark, sf_dir), k=TOP_K)


@register(
    "q_ann_ivf",
    None,  # k-means cell assignment is engine-specific → rows-only
    doc="Approximate NN via IVF (k-means cells, n_probe nearest cells "
    "searched exactly) — the prebuilt-index layout for 100 TB: store the "
    "corpus partitioned by cell, a query scans n_probe directories; "
    "recall vs brute force asserted in tests/test_extensions.py",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return ivf_topk(emb, _query_vec(spark, sf_dir), k=TOP_K, n_cells=8, n_probe=3)
