"""Hand-computed fixtures for the round-8 indicator batch: Williams %R,
Aroon, CCI, Vortex, Chaikin A/D + CMF, Ichimoku. DuckDB parity passes
identical-wrong-formula bugs, so each operator gets a worked example
derived by hand from the published definition (small n via the function
parameter; registered queries use the module constants)."""

from __future__ import annotations

import datetime as dt
import json

from trading_data_pipeline_spark.operators.indicators3_queries import (
    aroon,
    cci,
    chaikin,
    ichimoku,
    vortex,
    williams_r,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# Four daily bars (o, h, l, c) in cents; four events per day in
# open→high→low→close order, 10 shares/day (1+2+3+4).
BARS = [
    (10000, 10100, 9900, 10050),
    (10050, 10200, 10000, 10150),
    (10150, 10300, 10100, 10120),
    (10120, 10150, 9950, 10000),
]


def _ev(spark, bars=BARS, etype="t"):
    rows = []
    eid = 0
    for d, (o, h, l, c) in enumerate(bars, start=1):
        for j, px in enumerate((o, h, l, c)):
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, d, 9 + j, 0, 0),
                    1,
                    etype,
                    px / 100.0,
                    json.dumps({"k": j + 1}),
                )
            )
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_williams_r_hand_computed(spark):
    """n=3. d3: HH 10300, LL 9900 -> -100*180/400 = -45.0;
    d4: HH 10300, LL 9950 -> -100*300/350 = -85.7143."""
    out = {r.day.day: r for r in williams_r(_ev(spark), n=3).collect()}
    assert set(out) == {3, 4}
    assert out[3].williams_r == -45.0
    assert (out[3].hh, out[3].ll) == (103.0, 99.0)
    assert out[4].williams_r == -85.7143


def test_aroon_hand_computed(spark):
    """n=3. d3: high at d3 (since 0), low at d1 (since 2) ->
    up 100, down 33.33; d4: high at d3 (since 1), low at d4 (since 0)
    -> up 66.67, down 100."""
    out = {r.day.day: r for r in aroon(_ev(spark), n=3).collect()}
    assert set(out) == {3, 4}
    assert (out[3].bars_since_high, out[3].bars_since_low) == (0, 2)
    assert (out[3].aroon_up, out[3].aroon_down) == (100.0, 33.33)
    assert (out[4].bars_since_high, out[4].bars_since_low) == (1, 0)
    assert (out[4].aroon_up, out[4].aroon_down) == (66.67, 100.0)


def test_cci_hand_computed(spark):
    """n=3 on the 3*TP scale. tp3 = 30050 30350 30520 30100.
    d3: sum3 90920, MD_n = 770+130+640 = 1540,
    CCI = 640*4000/4620 = 554.1126;
    d4: sum3 90970, MD_n = 80+590+670 = 1340,
    CCI = -670*4000/4020 = -666.6667."""
    out = {r.day.day: r for r in cci(_ev(spark), n=3).collect()}
    assert set(out) == {3, 4}
    assert out[3].typical_price == 30520 / 300.0
    assert out[3].cci == 554.1126
    assert out[4].cci == -666.6667


def test_vortex_hand_computed(spark):
    """n=2. Per-bar (vmp, vmm, tr): d2 (300,100,200), d3 (300,100,200),
    d4 (50,350,200). d3: 600/400, 200/400; d4: 350/400, 450/400."""
    out = {r.day.day: r for r in vortex(_ev(spark), n=2).collect()}
    assert set(out) == {3, 4}
    assert (out[3].vi_plus, out[3].vi_minus) == (1.5, 0.5)
    assert (out[4].vi_plus, out[4].vi_minus) == (0.875, 1.125)


def test_chaikin_hand_computed(spark):
    """CLV micro-units: d1 +500000, d2 +500000, d3 -800000, d4 -500000;
    vol 10/day -> mfv (5, 5, -8, -5)e6; AD 5, 10, 2, -3;
    CMF(2): 0.5, -0.15, -0.65."""
    out = {r.day.day: r for r in chaikin(_ev(spark), n=2).collect()}
    assert set(out) == {2, 3, 4}
    assert (out[2].ad_line, out[2].cmf) == (10.0, 0.5)
    assert (out[3].ad_line, out[3].cmf) == (2.0, -0.15)
    assert (out[4].ad_line, out[4].cmf) == (-3.0, -0.65)


def test_ichimoku_constant_and_trend(spark):
    """Constant price: every midpoint equals the price and chikou too.
    Strictly increasing closes: tenkan (short midpoint) > kijun (long)
    on every emitted row."""
    const = [(10000, 10000, 10000, 10000)] * 30
    rows = ichimoku(_ev(spark, const)).collect()
    assert rows, "constant series must emit rows"
    for r in rows:
        assert r.tenkan == r.kijun == r.senkou_b == 100.0
        assert r.senkou_a == 100.0
        assert r.chikou in (100.0, None)
    up = [
        (10000 + 10 * i, 10010 + 10 * i, 9990 + 10 * i, 10005 + 10 * i)
        for i in range(30)
    ]
    rows = ichimoku(_ev(spark, up)).collect()
    assert rows
    for r in rows:
        assert r.tenkan > r.kijun > r.senkou_b
