"""Hand-computed fixtures for the round-8 performance-ratio batch:
dual beta, Kestner K-ratio, Rachev tail ratio, embedding isotropy.
Expected values recomputed from the published definitions in plain
Python."""

from __future__ import annotations

import datetime as dt
import json
import math

from trading_data_pipeline_spark.operators.risk3_queries import (
    dual_beta,
    embedding_isotropy,
    k_ratio,
    rachev,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


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


def _beta(xs, ms):
    n = len(xs)
    num = n * sum(a * b for a, b in zip(xs, ms)) - sum(xs) * sum(ms)
    den = n * sum(m * m for m in ms) - sum(ms) ** 2
    return num / den


def test_dual_beta_hand_computed(spark):
    """Two types; market = a + b moves per day."""
    a = [2, -3, 4, -1, 3, -2]
    b = [1, -1, 2, -2, 1, -1]
    ca, cb = [1000], [2000]
    for d in a:
        ca.append(ca[-1] + d)
    for d in b:
        cb.append(cb[-1] + d)
    df = _ev(spark, {"ta": ca, "tb": cb})
    m = [x + y for x, y in zip(a, b)]  # [3,-4,6,-3,4,-3]
    rows = {r.event_type: r for r in dual_beta(df).collect()}
    up = [i for i, v in enumerate(m) if v > 0]
    dn = [i for i, v in enumerate(m) if v < 0]
    assert rows["ta"].n_up == len(up) and rows["ta"].n_down == len(dn)
    assert rows["ta"].beta_up == _q4(
        _beta([a[i] for i in up], [m[i] for i in up])
    )
    assert rows["ta"].beta_down == _q4(
        _beta([a[i] for i in dn], [m[i] for i in dn])
    )


def test_k_ratio_hand_computed(spark):
    moves = [1, 2, -1, 3, 2]
    closes = [1000]
    for d in moves:
        closes.append(closes[-1] + d)
    r = k_ratio(_ev(spark, {"a": closes})).collect()[0]
    e, cum = [], 0
    for x in moves:
        cum += x
        e.append(cum)
    n = len(e)
    t = list(range(1, n + 1))
    tb, eb = sum(t) / n, sum(e) / n
    ctt = sum(v * v for v in t) - n * tb * tb
    cte = sum(a * b for a, b in zip(t, e)) - n * tb * eb
    cee = sum(v * v for v in e) - n * eb * eb
    slope = cte / ctt
    rss = cee - slope * cte
    se = math.sqrt(rss / (n - 2) / ctt)
    assert r.n == n
    assert r.slope_dollars == _q4(slope / 100.0)
    assert r.k_ratio == _q4(slope / se)


def test_rachev_hand_computed(spark):
    """10 moves, k = ceil(1) = 1: top 9, bottom -7 -> rachev 9/7."""
    moves = [1, -2, 3, -7, 5, -1, 9, 2, -4, 6]
    closes = [1000]
    for d in moves:
        closes.append(closes[-1] + d)
    r = rachev(_ev(spark, {"a": closes})).collect()[0]
    assert (r.n, r.k) == (10, 1)
    assert r.tail_gain == _q4(0.09)
    assert r.tail_loss == _q4(0.07)
    assert r.rachev == _q4(9 / 7)


def test_embedding_isotropy_hand_computed(spark):
    """Label 0: two identical unit vectors -> R = 1, kappa -> large;
    label 1: two opposite vectors -> R = 0."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [0.0, 2.0], 1),
            (4, [0.0, -2.0], 1),
        ],
        EMB_SCHEMA,
    )
    rows = {r.label: r for r in embedding_isotropy(df).collect()}
    assert rows[0].n == 2 and rows[0].dim == 2
    assert rows[0].mean_resultant == 1.0
    assert rows[0].vmf_kappa is None  # R = 1 -> infinite concentration
    assert rows[1].mean_resultant == 0.0
    assert rows[1].vmf_kappa == 0.0


def test_embedding_isotropy_partial_alignment(spark):
    """Orthogonal unit vectors: R = |(1,1)|/2 = sqrt(2)/2."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0)], EMB_SCHEMA
    )
    r = embedding_isotropy(df).collect()[0]
    rb = math.sqrt(2) / 2
    q6 = lambda x: math.floor(x * 10**6 + 0.5) / 10**6  # noqa: E731
    assert r.mean_resultant == q6(rb)
    assert r.vmf_kappa == _q4(rb * (2 - rb * rb) / (1 - rb * rb))
