"""Hand-computed fixtures for the round-8 indicator batch 11: ADX,
Ultimate Oscillator, Keltner, Force Index, Ease of Movement. Expected
values recomputed from the published definitions in plain Python."""

from __future__ import annotations

import datetime as dt
import json
import math

from trading_data_pipeline_spark.operators.indicators4_queries import (
    adx,
    ease_of_movement,
    force_index,
    keltner,
    ultimate_osc,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _bars(spark, days, etype="trade"):
    """days: [(o, h, l, c, vol_per_tick)] in cents; 4 ticks per day in
    (ts, event_id) order: open, high, low, close."""
    rows, eid = [], 0
    for day, (o, h, l, c, v) in enumerate(days, start=1):
        for px in (o, h, l, c):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, day, 12, 0, eid),
                    1,
                    etype,
                    px / 100.0,
                    json.dumps({"k": v}),
                )
            )
            eid += 1
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _q4(x: float) -> float:
    return math.floor(x * 10**4 + 0.5) / 10**4


_DAYS = [
    (100, 110, 95, 105, 1),
    (105, 120, 100, 115, 2),
    (115, 118, 112, 114, 3),
    (114, 130, 113, 128, 4),
]


def test_adx_hand_computed(spark):
    """n=2 over 4 bars: pdm/tr rows (10,20), (0,6), (12,17); Wilder
    weights [1, 0.5] -> the single full-history row has DI+ 60, DX 100,
    ADX (100 + 0.5*100)/1.5 = 100."""
    r = adx(_bars(spark, _DAYS), n=2).collect()
    assert len(r) == 1
    row = r[0]
    assert row.di_plus == _q4(100 * 12.0 / 20.0)  # 60
    assert row.di_minus == 0.0
    assert row.dx == 100.0
    assert row.adx == 100.0


def test_ultimate_osc_hand_computed(spark):
    """f/m/s = 2/3/3 over the 3 post-prev bars."""
    r = ultimate_osc(_bars(spark, _DAYS), f=2, m=3, s=3).collect()
    assert len(r) == 1
    row = r[0]
    # rows (bp, tr): d2: pc=105 -> bp 115-100=15, tr 120-100=20
    #                d3: pc=115 -> bp 114-112=2,  tr 118-112=6
    #                d4: pc=114 -> bp 128-113=15, tr 130-113=17
    a2 = (2 + 15) / (6 + 17)
    a3 = (15 + 2 + 15) / (20 + 6 + 17)
    uo = 100 * (4 * a2 + 2 * a3 + a3) / 7
    assert row.avg_fast == _q4(100 * a2)
    assert row.avg_mid == _q4(100 * a3)
    assert row.avg_slow == _q4(100 * a3)
    assert row.uo == _q4(uo)


def test_keltner_hand_computed(spark):
    r = keltner(_bars(spark, _DAYS), n=2).collect()
    assert len(r) == 3
    # day 2: TPs (110+95+105)=310, (120+100+115)=335 ; ranges 15, 20
    row = {x.day.day: x for x in r}[2]
    center = (310 + 335) / (3 * 2 * 100)
    band = (15 + 20) / (2 * 100)
    assert row.center == _q4(center)
    assert row.upper == _q4(center + band)
    assert row.lower == _q4(center - band)


def test_force_index_hand_computed(spark):
    r = force_index(_bars(spark, _DAYS), n=2).collect()
    rows = {x.day.day: x for x in r}
    # fi: d2 (115-105)*8=80, d3 (114-115)*12=-12, d4 (128-114)*16=224
    assert set(rows) == {3, 4}
    assert rows[3].force_index == -12 / 100.0
    assert rows[3].fi_sma == _q4((80 - 12) / (100.0 * 2))
    assert rows[4].fi_sma == _q4((-12 + 224) / (100.0 * 2))


def test_ease_of_movement_hand_computed(spark):
    r = ease_of_movement(_bars(spark, _DAYS), n=2).collect()
    rows = {x.day.day: x for x in r}

    def eom(h, l, ph, pl, vol):
        return (h + l - ph - pl) * (h - l) / (2.0 * 100 * 100 * vol)

    e2 = eom(120, 100, 110, 95, 8)
    e3 = eom(118, 112, 120, 100, 12)
    e4 = eom(130, 113, 118, 112, 16)
    assert set(rows) == {3, 4}
    assert rows[3].eom == _q4(e3)
    assert rows[3].eom_sma == _q4((e2 + e3) / 2)
    assert rows[4].eom_sma == _q4((e3 + e4) / 2)
