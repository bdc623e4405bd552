"""Hand-computed fixtures for the round-8 monitoring/robust batch:
Page CUSUM, trimmed mean, Markov entropy rate, Pastor-Stambaugh gamma.
Expected values recomputed from the published definitions in plain
Python."""

from __future__ import annotations

import datetime as dt
import json
import math

from trading_data_pipeline_spark.operators.analytics3_queries import (
    cusum,
    markov_entropy,
    pastor_stambaugh,
    trimmed_mean,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(spark, series, vols=None):
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


def test_cusum_hand_computed(spark):
    """Moves [2,2,-1,2], k=1, h=1: S+ = [1,2,0,1] (via cumsum - running
    min incl 0), S- = 0 throughout -> one up-alarm at day 3, peak 2c."""
    df = _ev(spark, {"a": [100, 102, 104, 103, 105]})
    r = cusum(df, k=1, h=1).collect()[0]
    assert r.n == 4
    assert r.alarms_up == 1
    assert r.alarms_down == 0
    assert r.max_s_up == _q4(0.02)
    assert r.max_s_down == 0.0
    assert r.first_alarm_day == dt.date(2024, 1, 3)


def test_cusum_reset_semantics(spark):
    """The running-min identity must RESET after a dip: moves
    [5,-10,5], k=0: S+ = [5, 0, 5] not [5, -5, 0]."""
    df = _ev(spark, {"a": [100, 105, 95, 100]})
    r = cusum(df, k=0, h=4).collect()[0]
    # S+ = [5,0,5]: two alarms (>4), peak 5c
    assert r.alarms_up == 2
    assert r.max_s_up == _q4(0.05)


def test_trimmed_mean_hand_computed(spark):
    """Moves [-50, 1, 2, 3, 4, 5, 6, 7, 8, 90], 10% trim -> drop the
    -50 and the 90: mean of 1..8 = 4.5 cents."""
    moves = [-50, 1, 2, 3, 4, 5, 6, 7, 8, 90]
    closes = [1000]
    for d in moves:
        closes.append(closes[-1] + d)
    r = trimmed_mean(_ev(spark, {"a": closes})).collect()[0]
    assert (r.n, r.n_kept) == (10, 8)
    assert r.trimmed_mean == _q4(4.5 / 100.0)


def test_markov_entropy_hand_computed(spark):
    """One user: sequence a,b,a,b -> c(a->b)=2, c(b->a)=1; H1 = 0
    (deterministic transitions), gain = H0."""
    rows = [
        (i, dt.datetime(2024, 1, 1, 12, 0, i), 1, t, 1.0, "{}")
        for i, t in enumerate(["a", "b", "a", "b"])
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    r = markov_entropy(df).collect()[0]
    h0 = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    q6 = lambda x: math.floor(x * 10**6 + 0.5) / 10**6  # noqa: E731
    assert r.n_transitions == 3
    assert r.h_marginal == q6(h0)
    assert r.h_rate == 0.0
    assert r.info_gain == q6(h0)


def test_pastor_stambaugh_hand_computed(spark):
    moves = [3, -2, 4, -1, 2, -3, 1]
    vols = [5, 7, 4, 8, 6, 9, 5, 7]
    closes = [1000]
    for d in moves:
        closes.append(closes[-1] + d)
    df = _ev(spark, {"a": closes}, vols={"a": vols})
    r = pastor_stambaugh(df).collect()[0]
    # python replication: daily bar vol = sum of per-tick k = per-day k
    # (one tick per day); moves indexed by day 2..8 with vol of that day
    y = moves[1:]
    z1 = moves[:-1]
    z2 = [
        (1 if m > 0 else -1 if m < 0 else 0) * vols[i + 1]
        for i, m in enumerate(moves[:-1])
    ]
    n = len(y)
    sy, s1, s2 = sum(y), sum(z1), sum(z2)
    cyy = sum(v * v for v in y) - sy * sy / n
    c11 = sum(v * v for v in z1) - s1 * s1 / n
    c22 = sum(v * v for v in z2) - s2 * s2 / n
    c12 = sum(a * b for a, b in zip(z1, z2)) - s1 * s2 / n
    c1y = sum(a * b for a, b in zip(y, z1)) - s1 * sy / n
    c2y = sum(a * b for a, b in zip(y, z2)) - s2 * sy / n
    det = c11 * c22 - c12 * c12
    beta = (c1y * c22 - c2y * c12) / det
    gamma = (c2y * c11 - c1y * c12) / det
    rss = cyy - beta * c1y - gamma * c2y
    t_g = gamma / math.sqrt(rss / (n - 3) * c11 / det)
    assert r.n == n
    assert r.beta_ret == _q4(beta)
    assert r.gamma_liq_1e6 == _q4(gamma * 10**6)
    assert r.t_gamma == _q4(t_g)


def test_lorenz_deciles_hand_computed(spark):
    """5 customers, 5 buckets: spends 1,2,3,4,10 dollars -> shares
    and cumulative shares in ascending-rank order."""
    import datetime as dt2

    from trading_data_pipeline_spark.operators.bi_queries import (
        lorenz_deciles,
    )

    rows = [
        (i, i, "O", float(v), dt2.datetime(2024, 1, 1, 12), "1-URGENT")
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 10.0])
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    r = lorenz_deciles(orders, d=5).collect()
    q6 = lambda x: math.floor(x * 10**6 + 0.5) / 10**6  # noqa: E731
    tot = 20.0
    shares = [1, 2, 3, 4, 10]
    cum = 0.0
    for i, row in enumerate(sorted(r, key=lambda x: x.decile)):
        cum += shares[i]
        assert row.n_customers == 1
        assert row.share == q6(shares[i] / tot)
        assert row.cum_share == q6(cum / tot)


def test_theil_index_hand_computed(spark):
    """Two types: a = [1, 3] cents, b = [2, 2] cents; T decomposition
    recomputed from the definition; within-b term is 0."""
    # theil consumes RAW values (not daily moves): build rows directly
    rows = [
        (1, dt.datetime(2024, 1, 1, 12), 1, "a", 0.01, "{}"),
        (2, dt.datetime(2024, 1, 2, 12), 1, "a", 0.03, "{}"),
        (3, dt.datetime(2024, 1, 3, 12), 1, "b", 0.02, "{}"),
        (4, dt.datetime(2024, 1, 4, 12), 1, "b", 0.02, "{}"),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    from trading_data_pipeline_spark.operators.bi_queries import (
        theil_index,
    )

    r = theil_index(df).collect()[0]
    xs = {"a": [1, 3], "b": [2, 2]}
    alln = [x for v in xs.values() for x in v]
    n, s = len(alln), sum(alln)
    mu = s / n
    t = sum((x / s) * math.log(x / mu) for x in alln)
    t_b = sum(
        (sum(v) / s) * math.log((sum(v) / len(v)) / mu)
        for v in xs.values()
    )
    t_w_terms = []
    for v in xs.values():
        sg, ng = sum(v), len(v)
        tg = sum((x / sg) * math.log(x / (sg / ng)) for x in v)
        t_w_terms.append((sg / s) * tg)
    t_w = sum(t_w_terms)
    q6 = lambda x: math.floor(x * 10**6 + 0.5) / 10**6  # noqa: E731
    assert r.n == n
    assert r.theil == q6(t)
    assert r.theil_between == q6(t_b)
    assert r.theil_within == q6(t_w)
    # decomposition identity
    assert abs(t - (t_b + t_w)) < 1e-12
