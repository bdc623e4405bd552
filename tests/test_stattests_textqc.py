"""Hand-built semantics for the statistical tests (KS, χ², Spearman)
and the lexical-statistics operators (TTR, token coverage, novelty)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _ev(spark, rows):
    # rows: (etype, value, k, day)
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, 9 + (i % 8)), 1, t, v, '{"k": %d}' % k)
            for i, (t, v, k, d) in enumerate(rows)
        ],
        EVENT_SCHEMA,
    )


def _docs(spark, rows):
    # rows: (source, text)
    return spark.createDataFrame(
        [(i, txt, "en", src, len(txt)) for i, (src, txt) in enumerate(rows)],
        DOC_SCHEMA,
    )


# ------------------------------------------------------------------ KS


def test_ks_identical_distributions_is_zero(spark):
    from trading_data_pipeline_spark.operators.stattests_queries import ks_test

    rows = [("click", v, 1, 1) for v in (1.0, 2.0, 3.0)] + [
        ("view", v, 1, 1) for v in (1.0, 2.0, 3.0)
    ]
    [r] = ks_test(_ev(spark, rows), "event_type", "value", "click", "view").collect()
    assert (r.n_a, r.n_b, r.d_num, r.ks) == (3, 3, 0, 0.0)


def test_ks_disjoint_distributions_is_one(spark):
    from trading_data_pipeline_spark.operators.stattests_queries import ks_test

    rows = [("click", v, 1, 1) for v in (1.0, 2.0)] + [
        ("view", v, 1, 1) for v in (5.0, 6.0, 7.0)
    ]
    [r] = ks_test(_ev(spark, rows), "event_type", "value", "click", "view").collect()
    assert r.ks == 1.0 and r.d_num == 6  # |2·3 − 0·2| at the gap


def test_ks_hand_computed_mixed(spark):
    from trading_data_pipeline_spark.operators.stattests_queries import ks_test

    # click: 1,2,3,4 — view: 3,4,5,6. At v=2: F1=.5, F2=0 → D=.5
    rows = [("click", float(v), 1, 1) for v in (1, 2, 3, 4)] + [
        ("view", float(v), 1, 1) for v in (3, 4, 5, 6)
    ]
    [r] = ks_test(_ev(spark, rows), "event_type", "value", "click", "view").collect()
    assert r.ks == 0.5


# ------------------------------------------------------------------ chi²


def test_chi_square_independent_is_zero(spark):
    from trading_data_pipeline_spark.operators.stattests_queries import chi_square

    # perfectly proportional 2×2 table → chi2 = 0
    rows = (
        [("click", 1.0, 1, 1)] * 2
        + [("click", 1.0, 1, 2)] * 4
        + [("view", 1.0, 1, 1)] * 3
        + [("view", 1.0, 1, 2)] * 6
    )
    ev = _ev(spark, rows)
    [r] = chi_square(ev, "event_type", F.dayofmonth("ts")).collect()
    assert (r.n_cells, r.dof, r.chi2) == (4, 1, 0.0)


def test_chi_square_hand_computed(spark):
    from trading_data_pipeline_spark.operators.stattests_queries import (
        CHI2_SCALE,
        chi_square,
    )

    # 2×2: [[10, 0], [0, 10]] — maximal association
    rows = (
        [("click", 1.0, 1, 1)] * 10
        + [("view", 1.0, 1, 2)] * 10
    )
    ev = _ev(spark, rows)
    [r] = chi_square(ev, "event_type", F.dayofmonth("ts")).collect()
    # every cell: (O·T − R·C)²/(T·R·C) = (10·20 − 10·10)²/(20·10·10)
    # = 10000/2000 = 5 for diagonal AND the same for zero cells?
    # zero cells don't exist as rows (groupBy drops them) → n_cells=2,
    # chi2 = 2 · 5 = 10... but true chi2 of [[10,0],[0,10]] is 20;
    # absent cells contribute E = R·C/T = 5 each → the statistic here is
    # the OBSERVED-cells partial sum — assert exactly what it computes.
    per_cell = math.floor((10 * 20 - 10 * 10) ** 2 / (20 * 10 * 10) * CHI2_SCALE + 0.5)
    assert r.n_cells == 2 and r.dof == 1
    assert r.chi2 == 2 * per_cell / CHI2_SCALE


# ------------------------------------------------------------------ Spearman


def test_spearman_monotone_is_one(spark):
    from trading_data_pipeline_spark.operators.stattests_queries import spearman

    # monotone value↔k (no ties): rho = 1 exactly
    rows = [("click", float(v), v * 10, 1) for v in (1, 2, 3, 4, 5)]
    ev = _ev(spark, rows)

    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    qty = F.get_json_object("props", "$.k").cast("long")
    [r] = spearman(ev, "event_type", cents, qty).collect()
    assert r.spearman_rho == 1.0


def test_spearman_reversed_is_minus_one(spark):
    from trading_data_pipeline_spark.operators.stattests_queries import spearman

    rows = [("click", float(v), (6 - v) * 10, 1) for v in (1, 2, 3, 4, 5)]
    ev = _ev(spark, rows)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    qty = F.get_json_object("props", "$.k").cast("long")
    [r] = spearman(ev, "event_type", cents, qty).collect()
    assert r.spearman_rho == -1.0


def test_spearman_ties_midrank(spark):
    from trading_data_pipeline_spark.operators.stattests_queries import spearman

    # x: 1,1,2 (tie) — y: 10,20,30. scipy gives rho = sqrt(3)/2 ≈ .866
    rows = [("click", 1.0, 10, 1), ("click", 1.0, 20, 1), ("click", 2.0, 30, 1)]
    ev = _ev(spark, rows)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    qty = F.get_json_object("props", "$.k").cast("long")
    [r] = spearman(ev, "event_type", cents, qty).collect()
    assert abs(r.spearman_rho - math.sqrt(3) / 2) < 1e-8


# ------------------------------------------------------------------ TTR


def test_ttr_hand_computed(spark):
    from trading_data_pipeline_spark.operators.textqc_queries import ttr

    docs = _docs(spark, [("s1", "a b a c"), ("s2", "x x x x")])
    rows = {r.doc_id: r for r in ttr(docs).collect()}
    assert rows[0].n_tokens == 4 and rows[0].n_types == 3
    assert rows[0].ttr == 0.75
    assert rows[1].ttr == 0.25


def test_token_coverage_hand_computed(spark):
    from trading_data_pipeline_spark.operators.textqc_queries import (
        token_coverage,
    )

    # source s1: a×8, b×1, c×1 → total 10. 90% needs: a(8) < 9 → a+b = 9 ✓
    docs = _docs(spark, [("s1", " ".join(["a"] * 8 + ["b", "c"]))])
    [r] = token_coverage(docs).collect()
    assert r.vocab_size == 3 and r.total_tokens == 10
    assert r.tokens_for_cover == 2  # a then b (count desc, token asc)
    assert r.top1_share == 0.8


def test_ngram_novelty_first_source_is_all_new(spark):
    from trading_data_pipeline_spark.operators.textqc_queries import (
        ngram_novelty,
    )

    base = "t1 t2 t3 t4 t5 t6 t7 t8 t9"  # 9 tokens → two 8-grams
    docs = _docs(
        spark,
        [
            ("a_src", base),
            ("b_src", base),  # fully redundant vs a_src
            ("c_src", "u1 u2 u3 u4 u5 u6 u7 u8"),  # one novel gram
        ],
    )
    rows = {r.source: r for r in ngram_novelty(docs).collect()}
    assert rows["a_src"].n_grams == 2 and rows["a_src"].novelty == 1.0
    assert rows["b_src"].n_grams == 2 and rows["b_src"].novelty == 0.0
    assert rows["c_src"].n_grams == 1 and rows["c_src"].novelty == 1.0


def test_ngram_novelty_short_docs_produce_no_grams(spark):
    from trading_data_pipeline_spark.operators.textqc_queries import (
        ngram_novelty,
    )

    docs = _docs(
        spark,
        [("a_src", "only five tokens right here"), ("b_src", "t1 t2 t3 t4 t5 t6 t7 t8")],
    )
    rows = {r.source: r for r in ngram_novelty(docs).collect()}
    assert "a_src" not in rows  # <8 tokens → no grams at all
    assert rows["b_src"].n_grams == 1


def test_encoding_qc_flags_dirty_docs(spark):
    from trading_data_pipeline_spark.operators.textqc_queries import (
        encoding_qc,
    )

    docs = _docs(
        spark,
        [
            ("s1", "clean ascii text"),
            ("s1", "bad � decode"),
            ("s1", "ctrl\x01char"),
            ("s2", "café naïve"),  # 2 non-ascii chars
        ],
    )
    rows = {r.source: r for r in encoding_qc(docs).collect()}
    assert rows["s1"].n_docs == 3
    assert rows["s1"].n_replacement == 1
    assert rows["s1"].n_control == 1
    assert rows["s1"].n_non_ascii_chars == 1  # the U+FFFD itself
    assert rows["s2"].n_non_ascii_chars == 2


def test_encoding_qc_tabs_newlines_are_clean(spark):
    from trading_data_pipeline_spark.operators.textqc_queries import (
        encoding_qc,
    )

    docs = _docs(spark, [("s1", "line one\nline\ttwo\r")])
    [r] = encoding_qc(docs).collect()
    assert r.n_control == 0 and r.n_replacement == 0


def test_readability_hand_computed(spark):
    import math

    from trading_data_pipeline_spark.operators.textqc_queries import (
        FLESCH_SCALE,
        readability,
    )

    # "the cat sat." → words 3, sentences 1, vowel groups: e, a, a = 3
    docs = _docs(spark, [("s1", "the cat sat.")])
    [r] = readability(docs).collect()
    f = 206.835 - 1.015 * (3 / 1) - 84.6 * (3 / 3)
    assert r.n_docs == 1 and r.total_words == 3
    assert r.flesch_mean == math.floor(f * FLESCH_SCALE + 0.5) / FLESCH_SCALE


def test_hybrid_rrf_fuses_both_arms(spark):
    from trading_data_pipeline_spark.operators.retrieval_queries import (
        RRF_K,
        hybrid_rrf,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "en", "s", 10),
            (1, "alpha beta gamma delta", "en", "s", 10),  # best text
            (2, "zz yy xx", "en", "s", 10),                # no overlap
            (3, "alpha qq rr", "en", "s", 10),
        ],
        DOC_SCHEMA,
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 1.0], 0),   # orthogonal to query
            (2, [1.0, 0.1], 0),   # best vector
            (3, [0.5, 0.5], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.doc_id: r for r in hybrid_rrf(docs, emb, pool=3).collect()}
    # text arm: 1 (overlap 3) > 3 (overlap 1) > 2 (0)
    assert out[1].r_text == 1 and out[3].r_text == 2 and out[2].r_text == 3
    # vector arm: 2 > 3 > 1
    assert out[2].r_vec == 1 and out[3].r_vec == 2 and out[1].r_vec == 3
    # 1/(K+r) is convex: the (1st, 3rd) pairs edge out the (2nd, 2nd)
    # pair — 1/61 + 1/63 > 2/62
    assert out[1].rrf > out[3].rrf and out[2].rrf > out[3].rrf
    assert out[1].rrf == out[2].rrf  # symmetric rank pairs tie
    assert out[1].rrf == math.floor(
        (1 / (RRF_K + 1) + 1 / (RRF_K + 3)) * 10**9 + 0.5
    ) / 10**9


def test_tokenizer_fertility_hand_ratios_and_multibyte(spark):
    """Two sources: plain ASCII vs multibyte — bytes/token must exceed
    chars/token exactly where non-ASCII text appears."""
    from trading_data_pipeline_spark.operators.textqc_queries import (
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [
            (0, "ab cd", "en", "ascii", 5),       # 2 toks, 5 chars, 5 bytes
            (1, "abc", "en", "ascii", 3),          # 1 tok, 3 chars
            (2, "héllo wörld", "de", "mb", 11),    # 2 toks, 11 chars, 13 bytes
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.source: r for r in tokenizer_fertility(docs).collect()}
    a = out["ascii"]
    assert a.n_docs == 2 and a.total_tokens == 3
    assert a.chars_per_token == a.bytes_per_token == round(8 / 3, 4)
    assert a.tokens_per_doc == 1.5
    m = out["mb"]
    assert m.chars_per_token == 5.5          # 11 chars / 2 tokens
    assert m.bytes_per_token == 6.5          # é/ö are 2 UTF-8 bytes -> 13/2
    assert m.bytes_per_token > m.chars_per_token
