"""Hand-built semantics for the round-7 text-QC additions: within-doc
repetition and Simpson lexical diversity."""

from __future__ import annotations

from trading_data_pipeline_spark.operators.textqc_queries import (
    repetition,
    simpson_diversity,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], DOC_SCHEMA
    )


def test_repetition_hand_computed(spark):
    docs = _docs(
        spark,
        [
            # "a b c" repeated: grams a-b-c, b-c-a, c-a-b, a-b-c, b-c-a
            # -> 5 grams, 3 unique -> dup 0.4 -> flagged
            (1, "a b c a b c a", "s"),
            # all-distinct grams
            (2, "one two three four five", "s"),
            # too short for a 3-gram -> excluded
            (3, "tiny doc", "s"),
        ],
    )
    out = {r.doc_id: r for r in repetition(docs).collect()}
    assert set(out) == {1, 2}
    assert (out[1].n_grams, out[1].n_unique) == (5, 3)
    assert out[1].dup_frac == 0.4 and out[1].flagged == 1
    assert out[2].dup_frac == 0.0 and out[2].flagged == 0


def test_simpson_diversity_hand_computed(spark):
    docs = _docs(
        spark,
        [
            # source mono: 4 identical tokens -> diversity 0
            (1, "x x x x", "mono"),
            # source duo: tokens a a b b -> 1 - (2*1+2*1)/(4*3) = 2/3
            (2, "a a b b", "duo"),
            # all-distinct -> diversity 1
            (3, "p q r s", "uniq"),
        ],
    )
    out = {r.source: r for r in simpson_diversity(docs).collect()}
    assert out["mono"].simpson_diversity == 0.0
    assert abs(out["duo"].simpson_diversity - 2 / 3) < 1e-6
    assert out["uniq"].simpson_diversity == 1.0
    assert (out["duo"].n_tokens, out["duo"].n_types) == (4, 2)
