"""Hybrid retrieval: lexical + vector rank fusion (round-6 batch 5).

The modern retrieval stack queries BOTH a lexical index and a vector
index and fuses the two rankings — this module implements the standard
Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) over the
``documents`` ⋈ ``embeddings`` hybrid corpus (doc_id ≡ vec_id in the
testdata):

- **q_hybrid_rrf**: for one query document, rank candidates by (a)
  distinct-token overlap with the query text and (b) embedding cosine,
  truncate each list to a fixed pool, and fuse with
  ``score = 1/(K+r_text) + 1/(K+r_vec)`` (K = 60, the published
  default; candidates missing from a pool take rank pool+1 — truncated-
  list RRF exactly as production fusion layers run it).

Determinism/exactness: overlap is an integer; cosine is the repo's
bit-identical JVM fold rounded to 4dp BEFORE ranking (the q_knn_eval
discipline); both ranks tie-break on doc_id; the fused score is two
exact-operand divisions + one add, quantized 1e-9.

Scale: each arm is a TakeOrderedAndProject (per-partition heap, driver
merge — no global sort, no full-corpus window); the only windows run
over the two ≤RRF_POOL-row truncated lists, bounded by the constant
pool size rather than the data. The corpus-side cosine/overlap scans
are narrow maps against literal (broadcast-by-value) query structures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity
from ..registry import load, register

QUERY_DOC = 0
RRF_K = 60
RRF_POOL = 50
RRF_TOP = 10
RRF_SCALE = 10**9


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    query_doc: int = QUERY_DOC,
    pool: int = RRF_POOL,
    top: int = RRF_TOP,
) -> DataFrame:
    """Truncated-list RRF fusion of token-overlap and cosine rankings
    for one query document. Returns (doc_id, r_text, r_vec, rrf)."""
    qrow = (
        docs.filter(F.col("doc_id") == query_doc)
        .join(emb, docs["doc_id"] == emb["vec_id"])
        .select("text", "embedding")
        .collect()[0]
    )
    q_toks = sorted(set(qrow.text.split(" ")))
    q_vec = [float(x) for x in qrow.embedding]

    cand = (
        docs.filter(F.col("doc_id") != query_doc)
        .join(emb, docs["doc_id"] == emb["vec_id"])
        .select(
            "doc_id",
            F.size(
                F.array_intersect(
                    F.array_distinct(F.split("text", " ")),
                    F.lit([str(t) for t in q_toks]),
                )
            ).alias("overlap"),
            F.round(
                cosine_similarity(
                    F.col("embedding").cast("array<double>"),
                    F.lit(q_vec),
                ),
                4,
            ).alias("cos"),
        )
    )
    # each arm: top-`pool` via orderBy+limit (TakeOrderedAndProject);
    # the rank window then runs over ≤pool rows — constant-bounded
    top_t = cand.orderBy(F.desc("overlap"), F.asc("doc_id")).limit(pool)
    top_v = cand.orderBy(F.desc("cos"), F.asc("doc_id")).limit(pool)
    wt = Window.orderBy(F.desc("overlap"), F.asc("doc_id"))
    wv = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    rt = top_t.select("doc_id", F.row_number().over(wt).alias("r_text"))
    rv = top_v.select("doc_id", F.row_number().over(wv).alias("r_vec"))
    fused = rt.join(rv, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("r_text", F.lit(pool + 1)).alias("r_text"),
        F.coalesce("r_vec", F.lit(pool + 1)).alias("r_vec"),
    )
    score = (
        1.0 / (F.lit(RRF_K) + F.col("r_text"))
        + 1.0 / (F.lit(RRF_K) + F.col("r_vec"))
    )
    return (
        fused.select(
            "doc_id",
            "r_text",
            "r_vec",
            (F.floor(score * RRF_SCALE + F.lit(0.5)) / RRF_SCALE).alias(
                "rrf"
            ),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(top)
    )


@register(
    "q_hybrid_rrf",
    f"""
    WITH q AS (
      SELECT d.text AS qtext, e.embedding::DOUBLE[] AS qvec
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      WHERE d.doc_id = {QUERY_DOC}
    ), cand AS (
      SELECT d.doc_id,
             len(list_intersect(
                   list_distinct(string_split(d.text, ' ')),
                   list_distinct(string_split(q.qtext, ' ')))) AS overlap,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec),
                   4) AS cos
      FROM documents d
      JOIN embeddings e ON d.doc_id = e.vec_id, q
      WHERE d.doc_id <> {QUERY_DOC}
    ), rt AS (
      SELECT doc_id, row_number() OVER (ORDER BY overlap DESC, doc_id)
               AS r_text
      FROM cand QUALIFY r_text <= {RRF_POOL}
    ), rv AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id)
               AS r_vec
      FROM cand QUALIFY r_vec <= {RRF_POOL}
    ), fused AS (
      SELECT coalesce(rt.doc_id, rv.doc_id) AS doc_id,
             coalesce(r_text, {RRF_POOL + 1}) AS r_text,
             coalesce(r_vec, {RRF_POOL + 1}) AS r_vec
      FROM rt FULL OUTER JOIN rv ON rt.doc_id = rv.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(r_text AS BIGINT) AS r_text,
           CAST(r_vec AS BIGINT) AS r_vec,
           floor((1.0 / ({RRF_K} + r_text) + 1.0 / ({RRF_K} + r_vec))
                 * {RRF_SCALE} + 0.5) / {RRF_SCALE} AS rrf
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {RRF_TOP}
    """,
    doc="Hybrid retrieval via truncated-list Reciprocal Rank Fusion "
    "(SIGIR'09, K=60): token-overlap rank × embedding-cosine rank over "
    "the documents⋈embeddings corpus, each arm a TakeOrderedAndProject "
    "pool of 50 (rank windows bounded by the constant pool, never the "
    "corpus), missing-from-pool rank = pool+1. Integer ranks, 4dp "
    "bit-identical cosine, 1e-9-quantized fused score",
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hybrid_rrf(
        load(spark, sf_dir, "documents"), load(spark, sf_dir, "embeddings")
    )
