"""Property-based invariants for the round-6 session operators
(hypothesis): identities that hold for ANY input by the operators'
semantics — CDC chunks always reassemble to the document; mixture
weights always sum to 1 and are monotone in token counts; BM25 never
scores a doc without a query term; PQ assigns codebook members to
themselves with zero error."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_tok = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
_doc = st.lists(_tok, min_size=1, max_size=60).map(" ".join)


@given(texts=st.lists(_doc, min_size=1, max_size=5))
@settings(**SETTINGS)
def test_cdc_chunks_always_reassemble(spark, texts):
    from trading_data_pipeline_spark.operators.corpus2_queries import (
        cdc_chunks,
    )

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )
    rows = cdc_chunks(docs).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk, r.chunk_text))
    for i, t in enumerate(texts):
        parts = [c for _, c in sorted(by_doc[i])]
        assert " ".join(parts) == t


@given(
    counts=st.lists(st.integers(min_value=1, max_value=5000),
                    min_size=2, max_size=6)
)
@settings(**SETTINGS)
def test_mixture_weights_sum_to_one_and_order_preserving(spark, counts):
    from trading_data_pipeline_spark.operators.corpus2_queries import (
        mixture_weights,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * c), "en", f"s{i}", c)
            for i, c in enumerate(counts)
        ],
        DOC_SCHEMA,
    )
    rows = mixture_weights(docs).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-6 * len(rows)
    # sqrt is monotone: more tokens -> weight never smaller
    by_toks = sorted(rows, key=lambda r: r.toks)
    for a, b in zip(by_toks, by_toks[1:]):
        assert a.weight <= b.weight + 1e-9


@given(
    texts=st.lists(_doc, min_size=1, max_size=6),
    qtok=st.sampled_from(["a", "ab", "abc"]),
)
@settings(**SETTINGS)
def test_bm25_scores_only_docs_containing_a_query_term(spark, texts, qtok):
    from trading_data_pipeline_spark.operators.retrieval_queries import (
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )
    out = {r.doc_id for r in bm25_topk(docs, (qtok,), 100).collect()}
    expected = {
        i for i, t in enumerate(texts) if qtok in t.split(" ")
    }
    assert out == expected
