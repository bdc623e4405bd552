"""Hand-built semantics for the risk batch: historical VaR/ES, Sharpe,
and the big-trade event study."""

from __future__ import annotations

import datetime as dt
import math

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(spark, rows, etype="click"):
    # rows: (day, hour, value, k) — day is an offset, so >31 is fine
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (
                i,
                base + dt.timedelta(days=d - 1, hours=h),
                1,
                etype,
                v,
                '{"k": %d}' % k,
            )
            for i, (d, h, v, k) in enumerate(rows)
        ],
        EVENT_SCHEMA,
    )


def test_var_es_hand_computed(spark):
    from trading_data_pipeline_spark.operators.risk_queries import var_es

    # 21 daily closes → 20 moves; make moves −100, −90, ..., +90 cents
    moves = list(range(-100, 100, 10))  # sorted already: −100..+90
    closes, p = [], 100.0
    closes.append(p)
    import random

    rnd = random.Random(7)
    shuffled = moves[:]
    rnd.shuffle(shuffled)
    for m in shuffled:
        p += m / 100.0
        closes.append(p)
    ev = _ev(spark, [(d + 1, 9, c, 1) for d, c in enumerate(closes)])
    [r] = var_es(ev).collect()
    # n=20 → k = ceil(1) = 1 → tail = {−100}: VaR = −1.00, ES = −1.00
    assert r.n_days == 20 and r.k_tail == 1
    assert r.var_95 == -1.0 and r.es_95 == -1.0


def test_var_es_tail_of_three(spark):
    from trading_data_pipeline_spark.operators.risk_queries import var_es

    # 41 moves → k = ceil(0.05·41) = ceil(2.05) = 3
    moves = [-300, -200, -100] + [10] * 38
    closes, p = [100.0], 100.0
    for m in moves:
        p += m / 100.0
        closes.append(p)
    ev = _ev(spark, [(d + 1, 9, c, 1) for d, c in enumerate(closes)])
    [r] = var_es(ev).collect()
    assert r.k_tail == 3
    assert r.var_95 == -1.0  # third smallest
    assert r.es_95 == (-300 - 200 - 100) / (3 * 100.0)


def test_sharpe_hand_computed(spark):
    from trading_data_pipeline_spark.operators.risk_queries import (
        SHARPE_SCALE,
        sharpe,
    )

    # moves (cents): +10, +20, +30 → mean 20, sample sd 10 → sharpe 2
    closes = [10.0, 10.1, 10.3, 10.6]
    ev = _ev(spark, [(d + 1, 9, c, 1) for d, c in enumerate(closes)])
    [r] = sharpe(ev).collect()
    assert r.n_days == 3
    assert r.sharpe == math.floor(2.0 * SHARPE_SCALE + 0.5) / SHARPE_SCALE


def test_sharpe_constant_moves_null(spark):
    from trading_data_pipeline_spark.operators.risk_queries import sharpe

    closes = [10.0, 10.1, 10.2, 10.3]  # all moves +10 → sd = 0
    ev = _ev(spark, [(d + 1, 9, c, 1) for d, c in enumerate(closes)])
    [r] = sharpe(ev).collect()
    assert r.sharpe is None


def test_event_study_big_trades_move_price(spark):
    from trading_data_pipeline_spark.operators.risk_queries import event_study

    # tape: big trade (k=95) always followed by +50 cents next event;
    # small trades followed by 0.
    rows, p = [], 10.0
    seq = [95, 1, 1, 95, 1, 1, 95, 1, 1]
    for i, k in enumerate(seq):
        rows.append((1, 9 + 0, p, k))  # hour fixed; order via event_id
        p += 0.50 if k == 95 else 0.0
    ev = _ev(spark, rows)
    out = {r.horizon: r for r in event_study(ev, big_k=90).collect()}
    # horizon 1: each big trade's next event is +50; baseline mixes zeros
    h1 = out[1]
    assert h1.n_big == 3  # the 9th event has no lead... wait: last big is
    # index 6 with leads available; big trades at 0,3,6 all have m1
    assert h1.mean_move_big == 0.5
    assert h1.mean_move_all == (3 * 50) / (8 * 100.0)


def test_event_study_horizons_present(spark):
    from trading_data_pipeline_spark.operators.risk_queries import event_study

    rows = [(1, 9, 10.0 + i * 0.01, 50) for i in range(6)]
    ev = _ev(spark, rows)
    out = event_study(ev).collect()
    assert {r.horizon for r in out} == {1, 2, 3}
    # monotone +1-cent tape: every forward move at horizon h is h cents
    for r in out:
        assert r.mean_move_all == r.horizon / 100.0
