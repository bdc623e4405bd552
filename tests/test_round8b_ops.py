"""Hand-computed fixtures for the round-8 risk-ratio batch: Omega,
Hill tail index, Kupiec POF, Ulcer index, Calmar. Identical-wrong-
formula bugs pass DuckDB parity (the round-6 kurtosis lesson), so every
operator gets a worked example whose expected values were derived by
hand from the published definitions."""

from __future__ import annotations

import datetime as dt
import json
import math

from trading_data_pipeline_spark.operators.risk2_queries import (
    calmar,
    hill_tail,
    kupiec_pof,
    omega_ratio,
    ulcer_index,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(spark, closes, etype="t"):
    """One event per day at the given close prices (dollars)."""
    return spark.createDataFrame(
        [
            (
                i + 1,
                dt.datetime(2024, 1, i + 1, 12, 0, 0),
                1,
                etype,
                float(c),
                json.dumps({"k": 1}),
            )
            for i, c in enumerate(closes)
        ],
        EVENT_SCHEMA,
    )


# closes (cents): 10000 10200 9900 10100 9700 9800
# dc:             +200 -300 +200 -400 +100
CLOSES = [100.00, 102.00, 99.00, 101.00, 97.00, 98.00]


def test_omega_hand_computed(spark):
    """gains = 200+200+100 = 500, losses = 300+400 = 700 ->
    omega = 5/7 quantized at 1e6."""
    r = omega_ratio(_ev(spark, CLOSES)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n_days, row.n_up, row.n_down) == (5, 3, 2)
    assert (row.gain_total, row.loss_total) == (5.0, 7.0)
    assert row.omega == math.floor(500 / 700 * 10**6 + 0.5) / 10**6


def test_ulcer_hand_computed(spark):
    """Running peaks 10000 10200 10200 10200 10200 10200; integer
    micro-fraction drawdowns (peak-c)*1e6 // peak =
    0, 0, 29411, 9803, 49019, 39215; UI = sqrt(mean of squares)/1e4."""
    r = ulcer_index(_ev(spark, CLOSES)).collect()
    row = r[0]
    dd = [0, 0, 29411, 9803, 49019, 39215]
    ui = math.sqrt(sum(x * x for x in dd) / 6) / 10**4
    assert row.n_days == 6
    assert row.max_dd_pct == 49019 / 10**4
    assert row.ulcer_pct == math.floor(ui * 10000 + 0.5) / 10000


def test_calmar_hand_computed(spark):
    """Signed fixed-point returns |dc|*1e8 // prev_c:
    +2000000 -2941176 +2020202 -3960396 +1030927 -> sum -1850443;
    ann = sum*252/(5*1e8); max dd fraction 0.049019."""
    r = calmar(_ev(spark, CLOSES)).collect()
    row = r[0]
    fx = [
        200 * 10**8 // 10000,
        -(300 * 10**8 // 10200),
        200 * 10**8 // 9900,
        -(400 * 10**8 // 10100),
        100 * 10**8 // 9700,
    ]
    assert sum(fx) == -1850443
    ann = sum(fx) * 252 / (5 * 10**8)
    assert row.n_days == 5
    assert row.ann_ret_pct == math.floor(ann * 100 * 10000 + 0.5) / 10000
    assert row.max_dd_pct == 4.9019
    assert row.calmar == math.floor(ann / 0.049019 * 10000 + 0.5) / 10000


def test_hill_hand_computed(spark):
    """Closes 100 96 97 94 93 -> dc = -400 +100 -300 -100; losses
    {400, 300, 100}, m=3, k=ceil(0.3)=1, top = {400}, cut = 300 ->
    H = ln(400/300), alpha = 1/H."""
    r = hill_tail(_ev(spark, [100.00, 96.00, 97.00, 94.00, 93.00])).collect()
    assert len(r) == 1
    row = r[0]
    h = math.log(400 / 300)
    assert (row.n_loss, row.k, row.cut_loss) == (3, 1, 3.0)
    assert row.hill == math.floor(h * 10000 + 0.5) / 10000
    assert row.alpha == math.floor(1 / h * 10000 + 0.5) / 10000


def test_kupiec_hand_computed(spark):
    """10 closes -> 9 moves [-50 +10 +20 -5 +30 +15 -60 +5 -100];
    ntrain = 2*9//3 = 6, k = ceil(0.05*6) = 1 -> VaR = -50 (worst
    train move); test moves -60 +5 -100 -> x=2 breaches of m=3.
    LR = 2[2 ln(2/(3*0.05)) + 1 ln(1/(3*0.95))]; chi2 cut 3.841 ->
    reject."""
    closes = [
        100.00, 99.50, 99.60, 99.80, 99.75,
        100.05, 100.20, 99.60, 99.65, 98.65,
    ]
    r = kupiec_pof(_ev(spark, closes)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n_test, row.n_breach) == (3, 2)
    lr = 2 * (2 * math.log(2 / (3 * 0.05)) + 1 * math.log(1 / (3 * 0.95)))
    assert row.lr_pof == math.floor(lr * 10000 + 0.5) / 10000
    assert row.reject_95 is True


def test_kupiec_zero_breach_term_pins_to_zero(spark):
    """x=0 -> the x ln(x/(m a)) term is the 0*ln(0) limit = 0, not NULL:
    9 moves, worst move in TRAIN -> no test breach."""
    # moves: -100 +10 +20 -5 +30 +15 +5 +5 +5 (worst = -100 in train)
    closes = [
        100.00, 99.00, 99.10, 99.30, 99.25,
        99.55, 99.70, 99.75, 99.80, 99.85,
    ]
    r = kupiec_pof(_ev(spark, closes)).collect()
    row = r[0]
    assert row.n_breach == 0
    lr = 2 * (3 * math.log(3 / (3 * 0.95)))
    assert row.lr_pof == math.floor(lr * 10000 + 0.5) / 10000
    assert row.reject_95 is False
