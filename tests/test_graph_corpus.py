"""Hand-built semantics for triangle counting and vocabulary-bounded
co-occurrence (round-5 batch 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.corpus_queries import (
    cooccurrence_pairs,
)
from trading_data_pipeline_spark.operators.graph_queries import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_one_triangle(spark):
    out = {
        r.node: r.n_triangles
        for r in triangle_counts(
            _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}  # node 4 is in no triangle


def test_two_triangles_sharing_an_edge(spark):
    # {1,2,3} and {1,2,4}: nodes 1,2 sit in two triangles each
    out = {
        r.node: r.n_triangles
        for r in triangle_counts(
            _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
        ).collect()
    }
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def test_no_triangle_in_a_path(spark):
    assert triangle_counts(_edges(spark, [(1, 2), (2, 3), (3, 4)])).count() == 0


def test_cooccurrence_hand_built(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "s", 3),
            (2, "alpha beta", "en", "s", 2),
            (3, "alpha gamma", "en", "s", 2),
            (4, "delta", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        (r.ta, r.tb): r
        for r in cooccurrence_pairs(docs, vocab_k=3, min_docs=2).collect()
    }
    # vocab (top 3 by DF): alpha(3), beta(2), gamma(2) — delta excluded
    assert set(out) == {("alpha", "beta"), ("alpha", "gamma")}
    r = out[("alpha", "beta")]
    assert (r.c_ab, r.c_a, r.c_b) == (2, 3, 2)
    assert r.pmi_ratio == round(2 * 4 / (3 * 2), 4)  # 1.3333
