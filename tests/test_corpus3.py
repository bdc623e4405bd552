"""Hand-computed fixtures for the round-8 corpus-curation batch:
Gopher rules, prefix dedup, PSI, mutual information, Brier
reliability, Zipf fit, token entropy. Expected values derived from the
published definitions independently of the implementation (DuckDB
parity alone passes identical-wrong-formula bugs)."""

from __future__ import annotations

import math

from trading_data_pipeline_spark.operators.corpus3_queries import (
    brier_reliability,
    gopher_rules,
    mutual_info,
    prefix_dedup,
    psi,
    token_entropy,
    zipf_fit,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _docs(spark, rows):
    """rows: (doc_id, text, lang, source)."""
    return spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows], DOC_SCHEMA
    )


def _q6(x: float) -> float:
    return math.floor(x * 10**6 + 0.5) / 10**6


# ---------------------------------------------------------- Gopher gate


def test_gopher_rules_hand_computed(spark):
    """Four docs engineered to each violate exactly one rule (plus one
    clean): word-count, mean-word-length, stopword, symbol."""
    ok = "the quick brown fox and " * 5  # 25 words, has the/and, mwl ok
    short = "the quick and brown fox"  # 5 words -> word-count violation
    thin = "the a " + "x " * 23  # 25 words, mwl = 27/25 < 3 -> wordlen
    nostop = "quick brown fox jumps high " * 5  # no 2 stopwords
    # '#abc' contains '#' (symbol) AND a letter (alpha ok), len 4 so the
    # mean-word-length band holds: only the symbol rule fires
    symbols = "the fox and " + "#abc " * 22  # 22/25 symbol words > 10%
    # '123' has no letter: alpha 2/25 < 0.8; sum_len 75 = 3*25 boundary
    numeric = "the and " + "123 " * 23  # 25 words
    df = _docs(
        spark,
        [
            (1, ok.strip(), "en", "s1"),
            (2, short, "en", "s1"),
            (3, thin.strip(), "en", "s1"),
            (4, nostop.strip(), "en", "s1"),
            (5, symbols.strip(), "en", "s1"),
            (6, numeric.strip(), "en", "s1"),
        ],
    )
    r = gopher_rules(df).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_docs == 6
    assert row.n_pass == 1
    assert row.viol_wordcount == 1  # doc 2
    assert row.viol_wordlen == 1  # doc 3: sum_len 27 < 3*25
    assert row.viol_alpha == 1  # doc 6
    assert row.viol_stopword == 1  # doc 4
    assert row.viol_symbol == 1  # doc 5


# --------------------------------------------------------- prefix dedup


def test_prefix_dedup_hand_computed(spark):
    df = _docs(
        spark,
        [
            (10, "terms of service apply here", "en", "s1"),
            (11, "terms of service for everyone", "en", "s2"),
            (12, "terms of service", "en", "s2"),
            (13, "totally different text here", "en", "s1"),
            (14, "too short", "en", "s1"),  # < 3 words: excluded
        ],
    )
    r = prefix_dedup(df, k=3).collect()
    assert len(r) == 1
    assert (r[0].canonical_doc, r[0].n_docs, r[0].n_sources) == (10, 3, 2)


# ------------------------------------------------------------------ PSI


def test_psi_hand_computed(spark):
    """One type, 4 first-half and 4 second-half events, values chosen so
    the 10 equal-width bins over cents [100, 900] are easy to place;
    expected PSI recomputed from (c+1)/(n+B) smoothed shares."""
    import datetime as dt
    import json

    rows = []
    # first half: cents 100, 100, 500, 900 ; second: 100, 500, 500, 900
    for i, (day, cents) in enumerate(
        [
            (1, 100), (2, 100), (3, 500), (4, 900),
            (20, 100), (21, 500), (22, 500), (23, 900),
        ]
    ):
        rows.append(
            (
                i,
                dt.datetime(2024, 1, day, 12, 0, 0),
                1,
                "trade",
                cents / 100.0,
                json.dumps({"k": 1}),
            )
        )
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    r = psi(df, bins=10).collect()
    assert len(r) == 1
    assert (r[0].n_first, r[0].n_second) == (4, 4)
    # bin(c) = min(9, (c-100)*10 // 801): 100->0, 500->4, 900->9
    ca = {0: 2, 4: 1, 9: 1}
    cb = {0: 1, 4: 2, 9: 1}
    exp = 0.0
    for b in range(10):
        p = (ca.get(b, 0) + 1) / 14.0
        q = (cb.get(b, 0) + 1) / 14.0
        exp += (p - q) * math.log(p / q)
    assert r[0].psi == _q6(exp)


# ----------------------------------------------------- mutual information


def test_mutual_info_hand_computed(spark):
    """2 types x 2 occupied bins with a known 2x2 contingency table."""
    import datetime as dt
    import json

    # cents: 100 -> bin 0, 900 -> bin 4 (range [100,900], 5 bins)
    data = [("a", 100), ("a", 100), ("a", 900), ("b", 900)]
    rows = [
        (
            i,
            dt.datetime(2024, 1, 2, 12, 0, 0),
            1,
            t,
            c / 100.0,
            json.dumps({"k": 1}),
        )
        for i, (t, c) in enumerate(data)
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    r = mutual_info(df, bins=5).collect()[0]
    n = 4
    cells = {("a", 0): 2, ("a", 4): 1, ("b", 4): 1}
    nx = {"a": 3, "b": 1}
    ny = {0: 2, 4: 2}
    mi = sum(
        (c / n) * math.log(c * n / (nx[x] * ny[b]))
        for (x, b), c in cells.items()
    )
    hx = -sum((v / n) * math.log(v / n) for v in nx.values())
    hy = -sum((v / n) * math.log(v / n) for v in ny.values())
    assert r.n == 4 and r.n_cells == 3
    assert r.mi == _q6(mi)
    assert r.h_type == _q6(hx)
    assert r.h_bin == _q6(hy)
    assert r.nmi == _q6(mi / math.sqrt(hx * hy))


# ------------------------------------------------- Brier / reliability


def test_brier_reliability_hand_computed(spark):
    """4 docs over a 3-token vocab: 'w' has df 4/4 (common at 78 %),
    'x' df 2/4, 'y' df 1/4 -> p = share of 'w' instances per doc."""
    df = _docs(
        spark,
        [
            (1, "w w w w", "en", "s1"),      # p = 1.0, y = 1
            (2, "w x x x", "en", "s1"),      # p = 0.25, y = 1
            (3, "w w x y", "de", "s1"),      # p = 0.5, y = 0
            (4, "w w w w", "de", "s1"),      # p = 1.0, y = 0
        ],
    )
    rows = {r.bin: r for r in brier_reliability(df).collect()}
    brier = ((1 - 1) ** 2 + (0.25 - 1) ** 2 + (0.5 - 0) ** 2 + (1 - 0) ** 2) / 4
    # bins: p=1.0 -> 4 (capped), 0.25 -> 1, 0.5 -> 2
    assert set(rows) == {1, 2, 4}
    assert rows[4].n == 2 and rows[4].mean_p == 1.0
    assert rows[4].frac_pos == 0.5
    assert rows[1].n == 1 and rows[1].mean_p == 0.25 and rows[1].frac_pos == 1.0
    assert rows[2].n == 1 and rows[2].frac_pos == 0.0
    for r in rows.values():
        assert r.brier == _q6(brier)


# -------------------------------------------------------------- Zipf fit


def test_zipf_fit_hand_computed(spark):
    """Exact Zipf counts 12/6/4 at ranks 1/2/3 (freq = 12/rank):
    slope = -1, r² = 1, intercept = ln 12."""
    df = _docs(
        spark,
        [(1, " ".join(["aa"] * 12 + ["bb"] * 6 + ["cc"] * 4), "en", "s1")],
    )
    r = zipf_fit(df, k=100).collect()[0]
    assert r.n_tokens == 3
    assert r.slope == -1.0
    assert r.r2 == 1.0
    assert r.intercept == _q6(math.log(12.0))


def test_zipf_fit_tiebreak_on_token(spark):
    """Equal counts rank by token string: 'aa' before 'bb'."""
    df = _docs(spark, [(1, "bb aa bb aa", "en", "s1")])
    r = zipf_fit(df, k=100).collect()[0]
    # counts equal -> y constant -> slope 0, and r² is undefined
    # (dy = 0): the nullif guard returns NULL instead of erroring
    assert r.n_tokens == 2
    assert r.slope == 0.0
    assert r.r2 is None


# -------------------------------------------------------- token entropy


def test_token_entropy_hand_computed(spark):
    df = _docs(
        spark,
        [
            (1, "aa aa bb cc", "en", "s1"),  # counts 2,1,1 of 4
            (2, "zz zz zz zz", "en", "s2"),  # single token: H = 0
        ],
    )
    rows = {r.source: r for r in token_entropy(df).collect()}
    h1 = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert rows["s1"].n_tokens == 4 and rows["s1"].vocab == 3
    assert rows["s1"].entropy == _q6(h1)
    assert rows["s1"].perplexity == math.floor(math.exp(h1) * 10**4 + 0.5) / 10**4
    assert rows["s2"].entropy == 0.0
    assert rows["s2"].perplexity == 1.0


def test_ece_hand_computed(spark):
    """Same 4-doc fixture as the Brier test: bins {1,2,4} with
    (conf, acc) = (0.25,1), (0.5,0), (1.0,0.5)."""
    from trading_data_pipeline_spark.operators.corpus3_queries import ece

    df = _docs(
        spark,
        [
            (1, "w w w w", "en", "s1"),
            (2, "w x x x", "en", "s1"),
            (3, "w w x y", "de", "s1"),
            (4, "w w w w", "de", "s1"),
        ],
    )
    r = ece(df).collect()[0]
    gaps = {1: (0.25, 1.0, 1), 2: (0.5, 0.0, 1), 4: (1.0, 0.5, 2)}
    e = sum(n * abs(a - c) for c, a, n in gaps.values()) / 4
    m = max(abs(a - c) for c, a, _ in gaps.values())
    assert (r.n, r.n_bins) == (4, 3)
    assert r.ece == _q6(e)
    assert r.mce == _q6(m)


def test_dsir_weights_hand_computed(spark):
    """3 docs (2 en, 1 de) over a 2-token vocab; expected per-gram
    smoothed LLRs and doc scores recomputed from the DSIR definition."""
    from trading_data_pipeline_spark.operators.corpus3_queries import (
        LLR_SCALE,
        dsir_weights,
    )

    df = _docs(
        spark,
        [
            (1, "aa aa bb", "en", "s1"),
            (2, "aa bb bb", "en", "s1"),
            (3, "bb bb bb", "de", "s2"),
        ],
    )
    rows = {r.source: r for r in dsir_weights(df).collect()}
    # raw counts: aa 3, bb 6 (nr 9); target (en): aa 3, bb 3 (nt 6); v 2
    import math

    def llr(ct, cr):
        return math.floor(
            (math.log((ct + 1) / 8.0) - math.log((cr + 1) / 11.0))
            * LLR_SCALE
        )

    l_aa, l_bb = llr(3, 3), llr(3, 6)
    s1 = 2 * l_aa + l_bb  # doc 1
    s2 = l_aa + 2 * l_bb  # doc 2
    s3 = 3 * l_bb  # doc 3
    q6 = lambda x: math.floor(x * 10**6 + 0.5) / 10**6  # noqa: E731
    assert rows["s1"].n_docs == 2
    assert rows["s1"].mean_llr == q6(
        ((s1 + s2) / LLR_SCALE) / 2
    )
    assert rows["s1"].frac_target_like == q6(
        ((s1 > 0) + (s2 > 0)) / 2
    )
    assert rows["s2"].mean_llr == q6(s3 / LLR_SCALE)
    assert rows["s2"].frac_target_like == float(s3 > 0)


def test_bpe_step_hand_computed(spark):
    """Words 'abab', 'ab': pairs ab,ba,ab + ab -> ab:3, ba:1."""
    from trading_data_pipeline_spark.operators.corpus3_queries import (
        bpe_step,
    )

    df = _docs(spark, [(1, "abab ab", "en", "s1")])
    rows = bpe_step(df, top=5).collect()
    assert [(r.rank, r.pair, r.cnt) for r in rows] == [
        (1, "ab", 3),
        (2, "ba", 1),
    ]


def test_ccnet_buckets_hand_computed(spark):
    """Six single-lang docs with controlled bigram scores cut into
    clean tertiles; repetitive docs rank head (high P(w2|w1))."""
    from trading_data_pipeline_spark.operators.corpus3_queries import (
        ccnet_buckets,
    )

    # doc text engineered so mean conditional P differs monotonically:
    # 'x x x x' -> all bigrams (x,x): P = 1; mixed docs lower
    docs = [
        (1, "x x x x", "en", "s1"),
        (2, "x x x y", "en", "s1"),
        (3, "x y x y", "en", "s1"),
        (4, "y x y z", "en", "s1"),
        (5, "z y z w", "en", "s1"),
        (6, "w z w q", "en", "s1"),
    ]
    r = ccnet_buckets(_docs(spark, docs)).collect()
    by = {(x.lang, x.bucket): x for x in r}
    assert set(by) == {("en", "head"), ("en", "middle"), ("en", "tail")}
    assert all(x.n_docs == 2 for x in r)
    # head must out-score middle must out-score tail
    assert (
        by[("en", "head")].mean_score
        > by[("en", "middle")].mean_score
        > by[("en", "tail")].mean_score
    )
