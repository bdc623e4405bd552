"""Hand-computed fixtures for the round-8 operator batch: triple-barrier
labels, Mann-Whitney U, nDCG@k, volume concentration, SRM check, and
label balance. Identical-wrong-formula bugs pass DuckDB parity (the
round-6 kurtosis lesson), so every operator gets a worked example whose
expected values were derived by hand."""

from __future__ import annotations

import datetime as dt
import json
import math

from trading_data_pipeline_spark.operators.bi_queries import (
    srm_check,
    volume_concentration,
)
from trading_data_pipeline_spark.operators.retrieval_queries import (
    NDCG_DISC,
    ndcg_eval,
)
from trading_data_pipeline_spark.operators.stattests_queries import (
    mann_whitney,
)
from trading_data_pipeline_spark.operators.trading_queries import (
    triple_barrier,
)
from trading_data_pipeline_spark.operators.trainprep_queries import (
    label_balance,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(spark, rows):
    """rows: (event_id, day, type, price, qty, user)."""
    return spark.createDataFrame(
        [
            (
                eid,
                dt.datetime(2024, 1, day, 12, 0, 0),
                user,
                etype,
                float(price),
                json.dumps({"k": qty}),
            )
            for eid, day, etype, price, qty, user in rows
        ],
        EVENT_SCHEMA,
    )


def test_triple_barrier_hand_computed(spark):
    """Closes 100.00, 101.00, 97.90, 102.50, 103.00, 100.00, 100.00 —
    every label and first-touch offset derived by hand against the
    exact +-2%% integer barrier tests (50*fc >= 51*ec / <= 49*ec)."""
    closes = [10000, 10100, 9790, 10250, 10300, 10000, 10000]
    rows = [
        (i + 1, i + 1, "x", c / 100.0, 1, 1) for i, c in enumerate(closes)
    ]
    out = {
        r.day.day: r for r in triple_barrier(_ev(spark, rows), h=5).collect()
    }
    # entry d1 ec=10000: d3 9790 <= 9800 first -> -1 at offset 2
    assert (out[1].label, out[1].bars_to_hit, out[1].n_future) == (-1, 2, 5)
    # entry d2 ec=10100: d3 9790 <= 9898 -> -1 at 1
    assert (out[2].label, out[2].bars_to_hit) == (-1, 1)
    # entry d3 ec=9790: up barrier 50*fc >= 51*9790 -> fc >= 9985.8;
    # d4 10250 hits -> +1 at 1
    assert (out[3].label, out[3].bars_to_hit) == (1, 1)
    # entry d4 ec=10250: dn <= 10045; d5 10300 no, d6 10000 -> -1 at 2
    assert (out[4].label, out[4].bars_to_hit) == (-1, 2)
    # entry d5 ec=10300: d6 10000 <= 10094 -> -1 at 1
    assert (out[5].label, out[5].bars_to_hit) == (-1, 1)
    # entry d6: only d7 10000, inside both barriers -> time barrier
    assert (out[6].label, out[6].bars_to_hit, out[6].n_future) == (0, None, 1)
    # entry d7 has no future bar -> dropped
    assert 7 not in out and len(out) == 6
    assert out[1].entry_close == 100.0


def test_mann_whitney_hand_computed(spark):
    """A = {1, 2, 3}, B = {2, 4}: midranks 1, 2.5, 2.5, 4, 5 ->
    R_A = 7.5, U_A = 1.5; tie group of 2 -> tie-corrected
    var = 0.5 * (6 - 6/20) = 2.85, z = (1.5 - 3)/sqrt(2.85)."""
    rows = [
        (1, 1, "a", 0.01, 1, 1),
        (2, 1, "a", 0.02, 1, 1),
        (3, 1, "a", 0.03, 1, 1),
        (4, 1, "b", 0.02, 1, 1),
        (5, 1, "b", 0.04, 1, 1),
    ]
    r = mann_whitney(_ev(spark, rows)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.type_a, row.type_b, row.n_a, row.n_b) == ("a", "b", 3, 2)
    assert row.u_a == 1.5
    expect_z = (1.5 - 3.0) / math.sqrt(2.85)
    assert row.z == math.floor(expect_z * 10**6 + 0.5) / 10**6


def test_ndcg_hand_computed(spark):
    """One query (label 1), corpus cosines rank ids (1, 3, 5) with
    relevance (1, 0, 1): DCG = D1 + D3, IDCG = D1 + D2 (two relevant
    docs in corpus), with D_i the injected fixed-point discounts."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),       # query (vec_id % 2 == 0)
            (1, [1.0, 0.0], 1),       # cos 1.0, relevant
            (3, [0.9, 0.1], 0),       # cos ~0.994, not relevant
            (5, [0.5, 0.5], 1),       # cos ~0.707, relevant
        ],
        "vec_id long, embedding array<float>, label int",
    )
    r = ndcg_eval(emb, qmod=2, k=10).collect()
    assert len(r) == 1 and r[0].qid == 0 and r[0].n_rel_k == 2
    dcg = NDCG_DISC[0] + NDCG_DISC[2]
    idcg = NDCG_DISC[0] + NDCG_DISC[1]
    assert r[0].ndcg == math.floor(dcg / idcg * 10**6 + 0.5) / 10**6
    # the perfect-retrieval identity: all-relevant top-k -> ndcg 1.0
    emb2 = spark.createDataFrame(
        [(0, [1.0, 0.0], 7), (1, [1.0, 0.0], 7), (3, [0.5, 0.5], 7)],
        "vec_id long, embedding array<float>, label int",
    )
    r2 = ndcg_eval(emb2, qmod=2, k=10).collect()
    assert r2[0].ndcg == 1.0


def test_volume_concentration_hand_computed(spark):
    """User volumes 100, 1, 1, 1: top-1%% of 4 users -> k = 1 ->
    threshold 100, share 100/103."""
    rows = [
        (1, 1, "x", 1.0, 100, 1),
        (2, 1, "x", 1.0, 1, 2),
        (3, 1, "x", 1.0, 1, 3),
        (4, 1, "x", 1.0, 1, 4),
    ]
    r = volume_concentration(_ev(spark, rows)).collect()[0]
    assert (r.n_users, r.n_top, r.threshold_vol) == (4, 1, 100)
    assert (r.top_vol, r.total_vol) == (100, 103)
    assert r.top_share == math.floor(100 / 103 * 10**6 + 0.5) / 10**6


def test_volume_concentration_ties_all_in(spark):
    """Ties at the cut are all included: four users at the same total
    -> threshold equals that total and every user is 'top'."""
    rows = [(i, 1, "x", 1.0, 7, i) for i in range(1, 5)]
    r = volume_concentration(_ev(spark, rows)).collect()[0]
    assert (r.n_users, r.n_top, r.top_share) == (4, 4, 1.0)


def test_srm_check_hand_computed(spark):
    """20 even vs 5 odd users: chi2 = 15^2/25 = 9.0 > 3.84 -> detected;
    a balanced 3/3 split -> chi2 0, clean."""
    rows = [(i, 1, "x", 1.0, 1, 2 * i) for i in range(20)] + [
        (100 + i, 1, "x", 1.0, 1, 2 * i + 1) for i in range(5)
    ]
    r = srm_check(_ev(spark, rows)).collect()[0]
    assert (r.n_a, r.n_b, r.chi2, r.srm_detected) == (20, 5, 9.0, True)
    rows2 = [(i, 1, "x", 1.0, 1, i) for i in range(6)]
    r2 = srm_check(_ev(spark, rows2)).collect()[0]
    assert (r2.n_a, r2.n_b, r2.chi2, r2.srm_detected) == (3, 3, 0.0, False)


def test_label_balance_hand_computed(spark):
    """(s1, en) x3 + (s2, fr) x1: shares 0.75/0.25; balanced weights
    N/(K*n) = 4/6 and 4/2."""
    docs = spark.createDataFrame(
        [
            (1, "aa", "en", "s1", 2),
            (2, "bb", "en", "s1", 2),
            (3, "cc", "en", "s1", 2),
            (4, "dd", "fr", "s2", 2),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {(r.source, r.lang): r for r in label_balance(docs).collect()}
    assert out[("s1", "en")].n_docs == 3
    assert out[("s1", "en")].share == 0.75
    assert out[("s1", "en")].weight == math.floor(4 / 6 * 10**6 + 0.5) / 10**6
    assert out[("s2", "fr")].share == 0.25
    assert out[("s2", "fr")].weight == 2.0


def test_donchian_hand_computed(spark):
    """Closes 10..19 then a 25 breakout-up and a 5 breakout-down; with
    one event per day O=H=L=C, so the 10-bar channel extremes are the
    prior closes themselves."""
    from trading_data_pipeline_spark.operators.indicators2_queries import (
        donchian,
    )

    closes = [10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 25, 5]
    rows = [(i + 1, i + 1, "x", float(c), 1, 1) for i, c in enumerate(closes)]
    out = {r.day.day: r for r in donchian(_ev(spark, rows), n=10).collect()}
    assert set(out) == {11, 12}
    assert (out[11].upper, out[11].lower, out[11].mid) == (19.0, 10.0, 14.5)
    assert out[11].breakout_up and not out[11].breakout_dn
    # day 12 channel = days 2..11: hh 25, ll 11
    assert (out[12].upper, out[12].lower) == (25.0, 11.0)
    assert out[12].breakout_dn and not out[12].breakout_up


def test_acf_profile_alternating_tape(spark):
    """Perfectly alternating +-1.00 daily moves: ACF is exactly -1 at
    lag 1 and exactly +1 at lag 2 (hand-verified integer sums)."""
    from trading_data_pipeline_spark.operators.indicators2_queries import (
        acf_profile,
    )

    closes = [100 + (i % 2) for i in range(12)]  # 100,101,100,101,...
    rows = [(i + 1, i + 1, "x", float(c), 1, 1) for i, c in enumerate(closes)]
    out = {r.lag: r for r in acf_profile(_ev(spark, rows), lags=2).collect()}
    assert out[1].n_pairs == 10 and out[1].acf == -1.0
    assert out[2].n_pairs == 9 and out[2].acf == 1.0


def test_xsec_momentum_hand_computed(spark):
    """Type b climbs 2.00/day, type a 1.00/day: after the 10-bar
    formation the single ranked day puts b first."""
    from trading_data_pipeline_spark.operators.trading_queries import (
        xsec_momentum,
    )

    rows = []
    for i in range(11):
        rows.append((100 + i, i + 1, "a", 100.0 + i, 1, 1))
        rows.append((200 + i, i + 1, "b", 100.0 + 2 * i, 1, 1))
    out = {r.event_type: r for r in xsec_momentum(_ev(spark, rows)).collect()}
    assert len(out) == 2 and out["b"].day.day == 11
    assert (out["b"].mom, out["b"].rank) == (20.0, 1)
    assert (out["a"].mom, out["a"].rank) == (10.0, 2)


def test_pairs_signal_exact_hedge(spark):
    """ca = 2*cb + 10 exactly: beta = 2.0, constant $10 spread, z NULL
    (degenerate variance guarded, not 0/0)."""
    from trading_data_pipeline_spark.operators.trading_queries import (
        pairs_signal,
    )

    rows = []
    for i, (cb, ca) in enumerate([(100, 210), (200, 410), (300, 610)]):
        rows.append((10 + i, i + 1, "purchase", float(cb), 1, 1))
        rows.append((20 + i, i + 1, "click", float(ca), 1, 1))
    out = pairs_signal(_ev(spark, rows)).collect()
    assert len(out) == 3
    for r in out:
        assert (r.beta, r.spread, r.spread_z) == (2.0, 10.0, None)


def test_embedding_norms_hand_computed(spark):
    """Norms 0, 5, 10 in one label: exact order statistics pick p50 = 5
    and p99 = 10; mean squared norm = 125/3."""
    import math

    from trading_data_pipeline_spark.operators.similarity_queries import (
        embedding_norms,
    )

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0], 7), (2, [3.0, 4.0], 7), (3, [6.0, 8.0], 7)],
        "vec_id long, embedding array<float>, label int",
    )
    r = embedding_norms(emb).collect()[0]
    assert (r.label, r.n_vecs) == (7, 3)
    assert r.mean_sq_norm == math.floor(125 / 3 * 10**6 + 0.5) / 10**6
    assert (r.p50_norm, r.p99_norm) == (5.0, 10.0)



def test_imbalance_profile_hand_computed(spark):
    """Prices 100,101,102,101 sizes 10,20,30,40 in one hour: first row
    carries no sign (excluded), then buy 20+30, sell 40 ->
    imbalance (50-40)/90."""
    from trading_data_pipeline_spark.operators.microstructure_queries import (
        imbalance_profile,
    )

    rows = [
        (1, 1, "x", 100.0, 10, 1),
        (2, 1, "x", 101.0, 20, 1),
        (3, 1, "x", 102.0, 30, 1),
        (4, 1, "x", 101.0, 40, 1),
    ]
    r = imbalance_profile(_ev(spark, rows)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.hr, row.n_trades, row.buy, row.sell) == (12, 3, 50, 40)
    assert row.imbalance == math.floor(10 / 90 * 10**6 + 0.5) / 10**6


def test_exec_shortfall_hand_computed(spark):
    """Arrival 100.00, fills 10@100 + 10@110: VWAP 105 -> +500 bps."""
    from trading_data_pipeline_spark.operators.trading_queries import (
        exec_shortfall,
    )

    rows = [
        (1, 1, "x", 100.0, 10, 7),
        (2, 1, "x", 110.0, 10, 7),
    ]
    r = exec_shortfall(_ev(spark, rows)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.user_id, row.arrival, row.vol) == (7, 100.0, 20)
    assert row.shortfall_bps == 500.0


def test_pack_efficiency_hand_computed(spark):
    """Token counts 512, 512, 100 pack as three packs (512, 512, 100):
    mean fill 1124/1536, full share 2/3."""
    from trading_data_pipeline_spark.operators.quality_queries import (
        pack_efficiency,
    )

    def txt(n):
        return " ".join(["w"] * n)

    docs = spark.createDataFrame(
        [
            (1, txt(512), "en", "s1", 1),
            (2, txt(512), "en", "s1", 1),
            (3, txt(100), "en", "s1", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = pack_efficiency(docs).collect()[0]
    assert (r.source, r.n_packs, r.tok) == ("s1", 3, 1124)
    assert r.mean_fill == math.floor(1124 / 1536 * 10**6 + 0.5) / 10**6
    assert r.full_share == math.floor(2 / 3 * 10**6 + 0.5) / 10**6


def test_power_analysis_hand_computed(spark):
    """Per-user totals 100..400 cents, 2 users per arm: sigma and MDE
    from the closed-form power formula with the injected z constants."""
    from trading_data_pipeline_spark.operators.bi_queries import (
        PW_Z_ALPHA,
        PW_Z_BETA,
        power_analysis,
    )

    rows = [(u + 1, 1, "x", float(u + 1), 1, u) for u in range(4)]
    # user u has one event of value (u+1).00 -> totals 100..400 cents
    r = power_analysis(_ev(spark, rows)).collect()[0]
    assert (r.n_a, r.n_b) == (2, 2)
    sigma_c = math.sqrt((4 * 300000 - 1000**2) / (4.0 * 3.0))
    mde_c = (PW_Z_ALPHA + PW_Z_BETA) * sigma_c * math.sqrt(2.0 / 2.0)
    assert r.sigma == math.floor(sigma_c / 100.0 * 10**6 + 0.5) / 10**6
    assert r.mde_abs == math.floor(mde_c / 100.0 * 10**6 + 0.5) / 10**6
    assert r.mde_rel == math.floor(mde_c / 250.0 * 10**6 + 0.5) / 10**6


def test_var_backtest_hand_computed(spark):
    """12 daily moves, 8 train / 4 test: VaR = min train move (-1.00),
    test breaches -2.00 and -1.50 -> 2/4, z = 1.8/sqrt(0.19)."""
    from trading_data_pipeline_spark.operators.risk_queries import (
        var_backtest,
    )

    moves = [-100, 50, 50, 50, 50, 50, 50, 50, -200, 10, -150, 20]
    closes, c = [10000], 10000
    for m in moves:
        c += m
        closes.append(c)
    rows = [
        (i + 1, i + 1, "x", cc / 100.0, 1, 1) for i, cc in enumerate(closes)
    ]
    r = var_backtest(_ev(spark, rows)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n_train, row.n_test, row.var_95) == (8, 4, -1.0)
    assert (row.n_breach, row.breach_rate) == (2, 0.5)
    z = (2 - 4 * 0.05) / math.sqrt(4 * 0.05 * 0.95)
    assert row.z == math.floor(z * 10**6 + 0.5) / 10**6


def test_rolling_corr_perfect_tapes(spark):
    """Identical alternating move series -> corr exactly 1.0 on every
    full frame; mirrored series -> exactly -1.0."""
    from trading_data_pipeline_spark.operators.indicators2_queries import (
        rolling_corr,
    )

    def rows_for(sign):
        out = []
        ca = cb = 10000
        out.append((1, 1, "click", ca / 100.0, 1, 1))
        out.append((101, 1, "purchase", cb / 100.0, 1, 1))
        for i in range(11):
            m = 100 if i % 2 == 0 else -100
            ca += m
            cb += sign * m
            out.append((2 + i, i + 2, "click", ca / 100.0, 1, 1))
            out.append((102 + i, i + 2, "purchase", cb / 100.0, 1, 1))
        return out

    pos = rolling_corr(_ev(spark, rows_for(1))).collect()
    assert len(pos) == 2 and all(r.corr == 1.0 for r in pos)
    neg = rolling_corr(_ev(spark, rows_for(-1))).collect()
    assert len(neg) == 2 and all(r.corr == -1.0 for r in neg)
