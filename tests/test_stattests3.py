"""Hand-computed fixtures for the round-8 stat-test batch 10:
Jarque-Bera, Ljung-Box, Durbin-Watson, one-way ANOVA, Welch's t,
Cohen's kappa, Bartlett. Expected values recomputed from the published
definitions in plain Python (DuckDB parity alone passes
identical-wrong-formula bugs)."""

from __future__ import annotations

import datetime as dt
import json
import math

from trading_data_pipeline_spark.operators.stattests3_queries import (
    anova,
    bartlett,
    cohens_kappa,
    durbin_watson,
    jarque_bera,
    ljung_box,
    welch_t,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(spark, series, vols=None):
    """series: {type: [daily close cents]}; one tick per day."""
    rows, eid = [], 0
    for etype, closes in series.items():
        for day, cents in enumerate(closes, start=1):
            v = 1 if vols is None else vols[etype][day - 1]
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, day, 12, 0, 0),
                    1,
                    etype,
                    cents / 100.0,
                    json.dumps({"k": v}),
                )
            )
            eid += 1
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _q4(x: float) -> float:
    return math.floor(x * 10**4 + 0.5) / 10**4


def _q6(x: float) -> float:
    return math.floor(x * 10**6 + 0.5) / 10**6


def _moments(xs):
    n = len(xs)
    m1 = sum(xs) / n
    m2 = sum((x - m1) ** 2 for x in xs) / n
    m3 = sum((x - m1) ** 3 for x in xs) / n
    m4 = sum((x - m1) ** 4 for x in xs) / n
    return n, m2, m3, m4


def test_jarque_bera_hand_computed(spark):
    """Closes 100,101,103,106,110,120 -> moves [1,2,3,4,10]."""
    df = _ev(spark, {"a": [100, 101, 103, 106, 110, 120]})
    r = jarque_bera(df).collect()[0]
    xs = [1, 2, 3, 4, 10]
    n, m2, m3, m4 = _moments(xs)
    skew = m3 / m2**1.5
    exk = m4 / m2**2 - 3
    jb = n / 6 * (skew**2 + exk**2 / 4)
    assert r.n == 5
    assert r.skewness == _q4(skew)
    assert r.excess_kurtosis == _q4(exk)
    assert r.jb_stat == _q4(jb)


def test_ljung_box_hand_computed(spark):
    """Moves [1,-1,1,-1,1,-1,1,-1] (n=8): strong negative rho1."""
    closes = [100]
    for d in [1, -1, 1, -1, 1, -1, 1, -1]:
        closes.append(closes[-1] + d)
    df = _ev(spark, {"a": closes})
    r = ljung_box(df, m=5).collect()[0]
    xs = [1, -1, 1, -1, 1, -1, 1, -1]
    n = len(xs)
    mu = sum(xs) / n
    den = sum((x - mu) ** 2 for x in xs)
    q = 0.0
    rhos = []
    for k in range(1, 6):
        num = sum(
            (xs[i] - mu) * (xs[i - k] - mu) for i in range(k, n)
        )
        rho = num / den
        rhos.append(rho)
        q += rho * rho / (n - k)
    q *= n * (n + 2)
    assert r.n == 8 and r.lags == 5
    assert r.rho1 == _q4(rhos[0])
    assert r.q_stat == _q4(q)


def test_durbin_watson_hand_computed(spark):
    """Moves [2,4,3,5]: DW = sum(diff^2)/sum(dev^2)."""
    closes = [100, 102, 106, 109, 114]
    df = _ev(spark, {"a": closes})
    r = durbin_watson(df).collect()[0]
    xs = [2, 4, 3, 5]
    mu = sum(xs) / len(xs)
    num = sum((xs[i] - xs[i - 1]) ** 2 for i in range(1, len(xs)))
    den = sum((x - mu) ** 2 for x in xs)
    assert r.n == 4
    assert r.dw_stat == _q4(num / den)


def test_anova_hand_computed(spark):
    """Groups a: moves [1,2,3]; b: moves [5,6,7]."""
    df = _ev(
        spark,
        {"a": [100, 101, 103, 106], "b": [200, 205, 211, 218]},
    )
    r = anova(df).collect()[0]
    ga, gb = [1, 2, 3], [5, 6, 7]
    alln = ga + gb
    gm = sum(alln) / len(alln)
    ssb = len(ga) * (2 - gm) ** 2 + len(gb) * (6 - gm) ** 2
    ssw = sum((x - 2) ** 2 for x in ga) + sum((x - 6) ** 2 for x in gb)
    f = (ssb / 1) / (ssw / 4)
    assert (r.k, r.n) == (2, 6)
    assert r.ss_between == _q4(ssb)
    assert r.ss_within == _q4(ssw)
    assert r.f_stat == _q4(f)


def test_welch_t_hand_computed(spark):
    df = _ev(
        spark,
        {
            "purchase": [100, 101, 103, 106, 110],  # moves 1,2,3,4
            "view": [200, 207, 215, 224],  # moves 7,8,9
        },
    )
    r = welch_t(df).collect()[0]
    a, b = [1, 2, 3, 4], [7, 8, 9]
    n1, n2 = len(a), len(b)
    m1, m2 = sum(a) / n1, sum(b) / n2
    v1 = sum((x - m1) ** 2 for x in a) / (n1 - 1)
    v2 = sum((x - m2) ** 2 for x in b) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    dof = se2**2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    sp = math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
    assert (r.n_a, r.n_b) == (4, 3)
    assert r.mean_diff == _q4(m1 - m2)
    assert r.t_stat == _q4(t)
    assert r.dof == _q4(dof)
    assert r.cohens_d == _q4((m1 - m2) / sp)


def test_cohens_kappa_hand_computed(spark):
    """Price signs [+,+,-,-], volume signs [+,-,-,+]: po = 1/2,
    pe = 2*(1/4) = ... exact 2x2 computation below."""
    df = _ev(
        spark,
        {"a": [100, 101, 102, 101, 100]},
        vols={"a": [10, 12, 9, 7, 11]},
    )
    r = cohens_kappa(df).collect()[0]
    # dc signs: +1,+1,-1,-1 ; dv signs: +1,-1,-1,+1
    # agree on days 1 and 3 -> po = 2/4
    # marginals: ra +1:2, -1:2 ; rb +1:2, -1:2 -> pe = (4+4)/16 = 1/2
    po, pe = 0.5, 0.5
    assert r.n == 4
    assert r.po == _q6(po)
    assert r.pe == _q6(pe)
    assert r.kappa == _q6((po - pe) / (1 - pe))


def test_bartlett_hand_computed(spark):
    df = _ev(
        spark,
        {"a": [100, 101, 103, 106], "b": [200, 201, 206, 215]},
    )
    r = bartlett(df).collect()[0]
    ga, gb = [1, 2, 3], [1, 5, 9]
    k, n = 2, 6
    va = sum((x - 2) ** 2 for x in ga) / 2
    vb = sum((x - 5) ** 2 for x in gb) / 2
    sp2 = (2 * va + 2 * vb) / (n - k)
    c = 1 + (1 / 2 + 1 / 2 - 1 / (n - k)) / (3 * (k - 1))
    t = ((n - k) * math.log(sp2) - (2 * math.log(va) + 2 * math.log(vb))) / c
    assert (r.k, r.n) == (2, 6)
    assert r.pooled_var == _q4(sp2)
    assert r.t_stat == _q4(t)
