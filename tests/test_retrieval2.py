"""BM25 + retrieval-eval (MAP/MRR) operator semantics on hand-built
corpora where the exact scores and metric values are computed by hand."""
from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_bm25_rational_matches_hand_formula(spark):
    """3 docs, query = {apple}: df=2, N=3, T=9; doc 0 tf=2 dl=3, doc 1
    tf=1 dl=2. Hand-multiplied rational BM25 (k1=6/5, b=3/4, raw RSJ
    idf) must match the fixed-point output exactly."""
    from trading_data_pipeline_spark.operators.retrieval_queries import (
        BM25_SCALE,
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "apple apple pie", "en", "s", 10),
            (1, "apple tart", "en", "s", 10),
            (2, "rye bread loaf sour", "en", "s", 10),
        ],
        DOC_SCHEMA,
    )
    out = {r.doc_id: r.bm25 for r in bm25_topk(docs, ("apple",), 10).collect()}
    N, T = 3, 9
    def score(tf, dl, df):
        num = 44 * T * tf * (2 * N - 2 * df + 1) * BM25_SCALE
        den = (20 * T * tf + 6 * T + 18 * dl * N) * (2 * df + 1)
        return (num // den) / BM25_SCALE
    assert out == {0: score(2, 3, 2), 1: score(1, 2, 2)}
    assert 2 not in out  # no query token -> unscored, not zero-scored
    assert out[0] > out[1]  # tf saturation still ranks the doubled tf first


def test_bm25_length_normalization_penalizes_long_docs(spark):
    """Same tf, longer doc -> strictly smaller score (the b-term)."""
    from trading_data_pipeline_spark.operators.retrieval_queries import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "apple x", "en", "s", 10),
            (1, "apple x y z w q r s t u v", "en", "s", 10),
        ],
        DOC_SCHEMA,
    )
    out = {r.doc_id: r.bm25 for r in bm25_topk(docs, ("apple",), 10).collect()}
    assert out[0] > out[1]


def test_retrieval_eval_hand_ap_and_rr(spark):
    """One query (vec_id 0, label 7), 4 candidates engineered so ranks
    are [rel, irrel, rel, irrel]: AP@k = (1/1 + 2/3)/2, RR = 1."""
    from trading_data_pipeline_spark.operators.retrieval_queries import (
        retrieval_eval,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),      # query (0 % 50 == 0)
            (1, [1.0, 0.01], 7),     # rank 1, relevant
            (2, [1.0, 0.2], 9),      # rank 2, irrelevant
            (3, [1.0, 0.3], 7),      # rank 3, relevant
            (4, [0.0, 1.0], 9),      # rank 4, irrelevant
        ],
        "vec_id long, embedding array<float>, label int",
    )
    row = retrieval_eval(emb, qmod=50, k=4).collect()[0]
    assert row.qid == 0 and row.n_hits == 2 and row.n_rel_k == 2
    # AP = (P@1 + P@3)/min(R,k) = (1 + 2/3)/2, fixed at 1e-9 then 1e-6
    assert abs(row.ap - (1.0 + 2 / 3) / 2) < 2e-6
    assert row.rr == 1.0


def test_retrieval_eval_no_hit_scores_zero(spark):
    """A query whose label never appears in the corpus: AP=0, RR=0."""
    from trading_data_pipeline_spark.operators.retrieval_queries import (
        retrieval_eval,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),
            (1, [1.0, 0.01], 9),
            (2, [1.0, 0.2], 9),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    row = retrieval_eval(emb, qmod=50, k=2).collect()[0]
    assert row.n_hits == 0 and row.ap == 0.0 and row.rr == 0.0
