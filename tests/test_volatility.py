"""Hand-computed fixtures for the OHLC range-volatility batch:
Parkinson, Garman-Klass, Rogers-Satchell, Yang-Zhang, Corwin-Schultz.
Expected values recomputed from the published formulas in plain Python
(DuckDB parity alone passes identical-wrong-formula bugs)."""

from __future__ import annotations

import datetime as dt
import json
import math

from trading_data_pipeline_spark.operators.volatility_queries import (
    corwin_schultz,
    garman_klass,
    parkinson,
    rogers_satchell,
    yang_zhang,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# two days of intraday ticks for one type; ticks in (ts, event_id)
# order give OHLC day1 = (100, 120, 90, 110), day2 = (110, 140, 105, 130)
_TICKS = [
    (1, 1, 100), (2, 1, 120), (3, 1, 90), (4, 1, 110),
    (5, 2, 110), (6, 2, 140), (7, 2, 105), (8, 2, 130),
]
_D1 = (100, 120, 90, 110)
_D2 = (110, 140, 105, 130)


def _ev(spark):
    return spark.createDataFrame(
        [
            (
                eid,
                dt.datetime(2024, 1, day, 12, 0, eid),
                1,
                "trade",
                float(px),
                json.dumps({"k": 1}),
            )
            for eid, day, px in _TICKS
        ],
        EVENT_SCHEMA,
    )


def _q6(x: float) -> float:
    return math.floor(x * 10**6 + 0.5) / 10**6


def _rs(o, h, l, c):
    return math.log(h / c) * math.log(h / o) + math.log(l / c) * math.log(
        l / o
    )


def test_parkinson_hand_computed(spark):
    r = {x.event_type: x for x in parkinson(_ev(spark)).collect()}["trade"]
    s2 = math.log(120 / 90) ** 2 + math.log(140 / 105) ** 2
    assert r.n_days == 2
    assert r.sigma_p == _q6(math.sqrt(s2 / (4 * math.log(2) * 2)))


def test_garman_klass_hand_computed(spark):
    r = garman_klass(_ev(spark)).collect()[0]
    k = 2 * math.log(2) - 1
    t1 = 0.5 * math.log(120 / 90) ** 2 - k * math.log(110 / 100) ** 2
    t2 = 0.5 * math.log(140 / 105) ** 2 - k * math.log(130 / 110) ** 2
    assert r.sigma_gk == _q6(math.sqrt((t1 + t2) / 2))


def test_rogers_satchell_hand_computed(spark):
    r = rogers_satchell(_ev(spark)).collect()[0]
    t1 = _rs(100, 120, 90, 110)
    t2 = _rs(110, 140, 105, 130)
    assert r.sigma_rs == _q6(math.sqrt((t1 + t2) / 2))


def test_yang_zhang_single_pair(spark):
    """n = 1 pair: the overnight/open-close sample variances are
    0/0-undefined (n-1 = 0) — the estimator must surface NULL rather
    than a fabricated number."""
    r = yang_zhang(_ev(spark)).collect()[0]
    assert r.n_days == 1
    # (soo - so²/n)/(n-1) with n=1 -> 0/0 -> NULL in both engines
    assert r.sigma_overnight is None
    # RS term is well-defined on the single day-2 bar
    assert r.sigma_rs == _q6(math.sqrt(_rs(110, 140, 105, 130)))


def test_yang_zhang_hand_computed(spark):
    """Three days -> two overnight/open-close observations."""
    ticks = _TICKS + [(9, 3, 125), (10, 3, 150), (11, 3, 120), (12, 3, 145)]
    df = spark.createDataFrame(
        [
            (
                eid,
                dt.datetime(2024, 1, day, 12, 0, eid),
                1,
                "trade",
                float(px),
                json.dumps({"k": 1}),
            )
            for eid, day, px in ticks
        ],
        EVENT_SCHEMA,
    )
    r = yang_zhang(df).collect()[0]
    # day2: o 110 / prev_c 110 ; day3: o 125 / prev_c 130
    lo = [math.log(110 / 110), math.log(125 / 130)]
    lc = [math.log(130 / 110), math.log(145 / 125)]
    rs = [_rs(110, 140, 105, 130), _rs(125, 150, 120, 145)]
    n = 2
    var_o = (sum(x * x for x in lo) - sum(lo) ** 2 / n) / (n - 1)
    var_c = (sum(x * x for x in lc) - sum(lc) ** 2 / n) / (n - 1)
    var_rs = sum(rs) / n
    k = 0.34 / (1.34 + (n + 1) / (n - 1))
    assert r.n_days == 2
    assert r.k == _q6(k)
    assert r.sigma_overnight == _q6(math.sqrt(var_o))
    assert r.sigma_openclose == _q6(math.sqrt(var_c))
    assert r.sigma_yz == _q6(
        math.sqrt(var_o + k * var_c + (1 - k) * var_rs)
    )


def test_corwin_schultz_hand_computed(spark):
    r = corwin_schultz(_ev(spark)).collect()[0]
    beta = math.log(140 / 105) ** 2 + math.log(120 / 90) ** 2
    gamma = math.log(140 / 90) ** 2
    den = 3 - 2 * math.sqrt(2)
    alpha = (math.sqrt(2 * beta) - math.sqrt(beta)) / den - math.sqrt(
        gamma / den
    )
    spread = 2 * (math.exp(alpha) - 1) / (math.exp(alpha) + 1)
    assert r.n_pairs == 1
    assert r.beta == _q6(beta)
    assert r.gamma == _q6(gamma)
    assert r.alpha_cs == _q6(alpha)
    assert r.spread == _q6(spread)
    assert r.spread_clamped == _q6(max(spread, 0.0))


def test_bipower_hand_computed(spark):
    """Moves [10, -20, 30] (from closes): RV = 1400 cents²,
    BPV = (pi/2)(200+600)."""
    from trading_data_pipeline_spark.operators.volatility_queries import (
        bipower_variation,
    )

    ticks = [
        (1, 1, 100), (2, 2, 110), (3, 3, 90), (4, 4, 120),
    ]
    df = spark.createDataFrame(
        [
            (
                eid,
                dt.datetime(2024, 1, day, 12, 0, 0),
                1,
                "trade",
                float(px),
                json.dumps({"k": 1}),
            )
            for eid, day, px in ticks
        ],
        EVENT_SCHEMA,
    )
    r = bipower_variation(df).collect()[0]
    rv = (1000**2 + 2000**2 + 3000**2) / 10000.0
    bpv = (math.pi / 2) * (1000 * 2000 + 2000 * 3000) / 10000.0
    assert r.n == 3
    assert r.rv == _q6(rv)
    assert r.bpv == _q6(bpv)
    assert r.jump_ratio == _q6(1 - bpv / rv)
