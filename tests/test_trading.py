"""Hand-built semantic tests for the trading/time-series batch
(operators/trading_queries.py): values verified by hand, independent of
the DuckDB oracle."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.trading_queries import (
    mad_outliers,
    max_drawdown,
    vwap_bars,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 9, minute, second)


def test_max_drawdown_hand_built(spark):
    # equity [10,7,12,4,6] → peak [10,10,12,12,12] → drawdown max = 8
    rows = [
        (i, _ts(i), 1, "trade", v, "{}")
        for i, v in enumerate([10.0, -3.0, 5.0, -8.0, 2.0])
    ]
    out = max_drawdown(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.max_drawdown == 8.0
    assert r.peak_equity == 12.0
    assert r.n_events == 5


def test_max_drawdown_monotone_curve_is_zero(spark):
    rows = [(i, _ts(i), 7, "trade", 1.0, "{}") for i in range(4)]
    r = max_drawdown(_events(spark, rows)).collect()[0]
    assert r.max_drawdown == 0.0
    assert r.peak_equity == 4.0


def test_vwap_bars_hand_built(spark):
    # one 15-min bar: prices 10@1, 20@3 → vwap (10+60)/4 = 17.5
    rows = [
        (0, _ts(0), 1, "trade", 10.0, '{"k": 1}'),
        (1, _ts(5), 1, "trade", 20.0, '{"k": 3}'),
        # second bar, and a zero-size row that must be excluded entirely
        (2, _ts(20), 1, "trade", 30.0, '{"k": 2}'),
        (3, _ts(21), 1, "trade", 99.0, '{"k": 0}'),
    ]
    out = {r.bar_start: r for r in vwap_bars(_events(spark, rows)).collect()}
    assert len(out) == 2
    first = out[min(out)]
    assert (first.open, first.high, first.low, first.close) == (10.0, 20.0, 10.0, 20.0)
    assert first.volume == 4 and first.n_trades == 2
    assert first.vwap == 17.5
    second = out[max(out)]
    assert second.n_trades == 1 and second.vwap == 30.0  # size-0 row dropped


def test_vwap_bar_boundaries_are_900s_aligned(spark):
    rows = [(i, _ts(0, i), 1, "t", 1.0, '{"k": 1}') for i in (0, 1)]
    bars = vwap_bars(_events(spark, rows)).collect()
    assert all(b.bar_start % 900 == 0 for b in bars)


def test_mad_outliers_hand_built(spark):
    # nine values 1..9 plus a wild 100: median 5.5, MAD 2.5,
    # threshold 4.4478*2.5 = 11.1 cents-scale → only 100 is an outlier
    vals = [float(v) for v in range(1, 10)] + [100.0]
    rows = [(i, _ts(i), 1, "trade", v, "{}") for i, v in enumerate(vals)]
    r = mad_outliers(_events(spark, rows)).collect()[0]
    assert r.n == 10
    assert r.med_value == 5.5
    assert r.mad_value == 2.5
    assert r.n_outliers == 1


def test_mad_no_outliers_on_constant_group(spark):
    rows = [(i, _ts(i), 1, "trade", 3.0, "{}") for i in range(5)]
    r = mad_outliers(_events(spark, rows)).collect()[0]
    assert r.mad_value == 0.0 and r.n_outliers == 0


def test_corr_matrix_hand_built(spark):
    from trading_data_pipeline_spark.operators.trading_queries import (
        corr_matrix,
    )

    rows = []
    eid = 0
    # 3 days: A grows 1,2,3 ; B grows 2,4,6 (corr +1) ; C falls 3,2,1
    # (corr -1 vs A) ; D constant (corr NULL against everything)
    for day, (a, b, c) in enumerate([(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)]):
        for typ, v in (("A", a), ("B", b), ("C", c), ("D", 5.0)):
            rows.append((eid, dt.datetime(2024, 1, day + 1, 12), 1, typ, v, "{}"))
            eid += 1
    out = {
        (r.ta, r.tb): r.corr for r in corr_matrix(_events(spark, rows)).collect()
    }
    assert out[("A", "B")] == 1.0
    assert out[("A", "C")] == -1.0
    assert out[("A", "D")] is None and out[("B", "D")] is None
    assert out[("B", "C")] == -1.0


def test_corr_matrix_pairwise_complete_days(spark):
    from trading_data_pipeline_spark.operators.trading_queries import (
        corr_matrix,
    )

    # B missing on day 3 → the (A,B) pair uses only days 1-2
    rows = [
        (0, dt.datetime(2024, 1, 1, 12), 1, "A", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 12), 1, "B", 5.0, "{}"),
        (2, dt.datetime(2024, 1, 2, 12), 1, "A", 2.0, "{}"),
        (3, dt.datetime(2024, 1, 2, 12), 1, "B", 6.0, "{}"),
        (4, dt.datetime(2024, 1, 3, 12), 1, "A", 9.0, "{}"),
    ]
    r = corr_matrix(_events(spark, rows)).collect()
    assert len(r) == 1 and r[0].n == 2 and r[0].corr == 1.0


def test_market_beta_hand_built(spark):
    from trading_data_pipeline_spark.operators.trading_queries import (
        market_beta,
    )

    # two types: A = [1,2,3], B = [3,2,1] per day; market x = [4,4,4]
    # → zero market variance → beta NULL for both (degenerate market)
    rows = []
    eid = 0
    for day, (a, b) in enumerate([(1.0, 3.0), (2.0, 2.0), (3.0, 1.0)]):
        for typ, v in (("A", a), ("B", b)):
            rows.append((eid, dt.datetime(2024, 1, day + 1, 12), 1, typ, v, "{}"))
            eid += 1
    out = {r.event_type: r.beta for r in market_beta(_events(spark, rows)).collect()}
    assert out == {"A": None, "B": None}

    # market [2,4,6], A = [1,2,3] (slope 0.5), B = [1,2,3] too
    rows = []
    eid = 0
    for day, v in enumerate([1.0, 2.0, 3.0]):
        for typ in ("A", "B"):
            rows.append((eid, dt.datetime(2024, 1, day + 1, 12), 1, typ, v, "{}"))
            eid += 1
    out = {r.event_type: r.beta for r in market_beta(_events(spark, rows)).collect()}
    assert out == {"A": 0.5, "B": 0.5}


def test_market_beta_absent_day_counts_as_zero(spark):
    from trading_data_pipeline_spark.operators.trading_queries import (
        market_beta,
    )

    rows = [
        (0, dt.datetime(2024, 1, 1, 12), 1, "A", 2.0, "{}"),
        (1, dt.datetime(2024, 1, 2, 12), 1, "A", 4.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 12), 1, "B", 1.0, "{}"),
        # B absent on day 2 → y=0 that day, n stays 2 for B
    ]
    out = {r.event_type: r for r in market_beta(_events(spark, rows)).collect()}
    assert out["B"].n == 2
    # market x = [3,4]; B y = [1,0] → slope = (2*3 - 7*1)/(2*25-49) = -1
    assert out["B"].beta == -1.0


def test_twap_weights_by_prevailing_span(spark):
    """Price 10 prevails 3s, then price 20 prevails 1s, then a terminal
    print at 99 (no span -> no weight): TWAP = (10*3 + 20*1)/4 = 12.5;
    a plain mean would say 43."""
    from pyspark.sql import functions as F

    from trading_data_pipeline_spark.operators.trading_queries import twap

    events = spark.createDataFrame(
        [
            (0, "2024-01-01 09:00:00", 1, "click", 10.0, "{}"),
            (1, "2024-01-01 09:00:03", 1, "click", 20.0, "{}"),
            (2, "2024-01-01 09:00:04", 1, "click", 99.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = twap(events).collect()[0]
    assert r.n_spans == 2
    assert r.twap == 12.5
