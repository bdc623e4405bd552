"""Hand-computed fixtures for the round-8 time-series-diagnostics
batch: Hurst R/S, lag-1 Granger F, equal-frequency binning. Expected
values recomputed from the published definitions in plain Python."""

from __future__ import annotations

import datetime as dt
import json
import math

from trading_data_pipeline_spark.operators.tsdiag_queries import (
    adf,
    granger,
    hurst,
    mann_kendall,
    quantile_binning,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(spark, series):
    rows, eid = [], 0
    for etype, closes in series.items():
        for day, cents in enumerate(closes, start=1):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, day, 12, 0, 0),
                    1,
                    etype,
                    cents / 100.0,
                    json.dumps({"k": 1}),
                )
            )
            eid += 1
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _q4(x: float) -> float:
    return math.floor(x * 10**4 + 0.5) / 10**4


def _rs(xs):
    """Classic rescaled range of one block."""
    n = len(xs)
    mu = sum(xs) / n
    cum, y = 0.0, []
    for x in xs:
        cum += x - mu
        y.append(cum)
    r = max(y) - min(y)
    s = math.sqrt(sum((x - mu) ** 2 for x in xs) / n)
    return r / s


def test_hurst_hand_computed(spark):
    """12 moves, blocks b1=2 (6 blocks), b2=4 (3 blocks)."""
    moves = [1, -2, 3, 1, -1, 2, -3, 1, 2, -1, 1, -2]
    closes = [1000]
    for d in moves:
        closes.append(closes[-1] + d)
    df = _ev(spark, {"a": closes})
    r = hurst(df, b1=2, b2=4).collect()[0]
    rs2 = [_rs(moves[i : i + 2]) for i in range(0, 12, 2)]
    rs4 = [_rs(moves[i : i + 4]) for i in range(0, 12, 4)]
    m2, m4 = sum(rs2) / len(rs2), sum(rs4) / len(rs4)
    h = (math.log(m4) - math.log(m2)) / (math.log(4) - math.log(2))
    assert (r.blocks_small, r.blocks_large) == (6, 3)
    assert r.rs_small == _q4(m2)
    assert r.rs_large == _q4(m4)
    assert r.hurst == _q4(h)


def test_hurst_drops_partial_blocks(spark):
    """13 moves with b=4: only 3 full blocks count."""
    moves = [1, -2, 3, 1, -1, 2, -3, 1, 2, -1, 1, -2, 5]
    closes = [1000]
    for d in moves:
        closes.append(closes[-1] + d)
    r = hurst(_ev(spark, {"a": closes}), b1=2, b2=4).collect()[0]
    assert r.blocks_large == 3  # the 13th move is discarded


def test_granger_hand_computed(spark):
    """y moves [1,2,1,3,2,4], x moves [2,1,3,1,4,1] on aligned days."""
    ym = [1, 2, 1, 3, 2, 4]
    xm = [2, 1, 3, 1, 4, 1]
    cy, cx = [1000], [2000]
    for d in ym:
        cy.append(cy[-1] + d)
    for d in xm:
        cx.append(cx[-1] + d)
    df = _ev(spark, {"purchase": cy, "view": cx})
    r = granger(df).collect()[0]
    # python OLS from the same published closed forms
    yv = ym[1:]
    y1 = ym[:-1]
    x1 = xm[:-1]
    n = len(yv)
    sy, s1, s2 = sum(yv), sum(y1), sum(x1)
    cyy = sum(v * v for v in yv) - sy * sy / n
    c11 = sum(v * v for v in y1) - s1 * s1 / n
    c22 = sum(v * v for v in x1) - s2 * s2 / n
    c12 = sum(a * b for a, b in zip(y1, x1)) - s1 * s2 / n
    c1y = sum(a * b for a, b in zip(yv, y1)) - s1 * sy / n
    c2y = sum(a * b for a, b in zip(yv, x1)) - s2 * sy / n
    rss_r = cyy - c1y * c1y / c11
    det = c11 * c22 - c12 * c12
    b1 = (c1y * c22 - c2y * c12) / det
    b2 = (c2y * c11 - c1y * c12) / det
    rss_u = cyy - b1 * c1y - b2 * c2y
    f = (rss_r - rss_u) * (n - 3) / rss_u
    assert r.n == n
    assert r.beta_own_lag == _q4(b1)
    assert r.beta_cross_lag == _q4(b2)
    assert r.rss_restricted == _q4(rss_r)
    assert r.rss_unrestricted == _q4(rss_u)
    assert r.f_stat == _q4(f)


def test_quantile_binning_hand_computed(spark):
    """10 values into 4 bins: 100x3, 200x3, 300x2, 400x1, 500x1 —
    ties stay together, bins sized by first rank."""
    vals = [100] * 3 + [200] * 3 + [300] * 2 + [400, 500]
    df = _ev(spark, {"a": [v for v in vals]})
    # NOTE: _ev builds closes per day; values here are the raw prices,
    # which is exactly what binning consumes (not moves)
    r = {x.bin: x for x in quantile_binning(df, b=4).collect()}
    # first ranks: 100->0, 200->3, 300->6, 400->8, 500->9
    # bins (rank*4 div 10): 0, 1, 2, 3, 3
    assert r[0].n == 3 and r[0].lo == 1.0 and r[0].hi == 1.0
    assert r[1].n == 3 and r[1].lo == 2.0 and r[1].hi == 2.0
    assert r[2].n == 2 and r[2].lo == 3.0 and r[2].hi == 3.0
    assert r[3].n == 2 and r[3].lo == 4.0 and r[3].hi == 5.0


def test_mann_kendall_hand_computed(spark):
    """Closes [100,102,101,104,103]: S = sum of pair signs."""
    closes = [100, 102, 101, 104, 103]
    df = _ev(spark, {"a": closes})
    r = mann_kendall(df).collect()[0]
    n = len(closes)
    s = sum(
        (closes[j] > closes[i]) - (closes[j] < closes[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    var = n * (n - 1) * (2 * n + 5) / 18.0  # no ties
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var)
    assert r.n == n and r.s_stat == s
    assert r.var_s == _q4(var)
    assert r.z_stat == _q4(z)


def test_mann_kendall_tie_correction(spark):
    """Closes [100,100,101]: one tie pair of t=2 -> tie term 18."""
    df = _ev(spark, {"a": [100, 100, 101]})
    r = mann_kendall(df).collect()[0]
    var = (3 * 2 * 11 - 2 * 1 * 9) / 18.0
    assert r.s_stat == 2
    assert r.var_s == _q4(var)


def test_adf_hand_computed(spark):
    """Closes for 'purchase': mean-reverting [100,105,98,106,97,107]."""
    closes = [100, 105, 98, 106, 97, 107]
    df = _ev(spark, {"purchase": closes})
    r = adf(df).collect()[0]
    y = closes
    dy = [y[t] - y[t - 1] for t in range(2, len(y))]
    z1 = [y[t - 1] for t in range(2, len(y))]
    z2 = [y[t - 1] - y[t - 2] for t in range(2, len(y))]
    n = len(dy)
    sy, s1, s2 = sum(dy), sum(z1), sum(z2)
    cyy = sum(v * v for v in dy) - sy * sy / n
    c11 = sum(v * v for v in z1) - s1 * s1 / n
    c22 = sum(v * v for v in z2) - s2 * s2 / n
    c12 = sum(a * b for a, b in zip(z1, z2)) - s1 * s2 / n
    c1y = sum(a * b for a, b in zip(dy, z1)) - s1 * sy / n
    c2y = sum(a * b for a, b in zip(dy, z2)) - s2 * sy / n
    det = c11 * c22 - c12 * c12
    g = (c1y * c22 - c2y * c12) / det
    dl = (c2y * c11 - c1y * c12) / det
    rss = cyy - g * c1y - dl * c2y
    t = g / math.sqrt(rss / (n - 3) * c22 / det)
    assert r.n == n
    assert r.gamma == _q4(g)
    assert r.delta_lag == _q4(dl)
    assert r.adf_t == _q4(t)
