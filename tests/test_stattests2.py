"""Hand-computed fixtures for the round-8 stat-test batch: Kruskal-
Wallis, Brown-Forsythe, Cramér's V, jackknife Sharpe SE, runs test.
Expected values derived by hand from the published definitions (DuckDB
parity alone passes identical-wrong-formula bugs)."""

from __future__ import annotations

import datetime as dt
import json
import math

from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.stattests2_queries import (
    brown_forsythe,
    cramers_v,
    jackknife_sharpe,
    kruskal_wallis,
    runs_test,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(spark, rows):
    """rows: (eid, day, type, price_dollars)."""
    return spark.createDataFrame(
        [
            (
                eid,
                dt.datetime(2024, 1, day, 12, 0, 0),
                1,
                etype,
                float(px),
                json.dumps({"k": 1}),
            )
            for eid, day, etype, px in rows
        ],
        EVENT_SCHEMA,
    )


def test_kruskal_wallis_hand_computed(spark):
    """A = {1,2,3}, B = {2,4}: pooled midranks 1, 2.5, 2.5, 4, 5 ->
    R_A = 7.5, R_B = 7.5; H = 12/(5*6)*(7.5^2/3 + 7.5^2/2) - 18 = 0.75;
    one tie pair -> C = 1 - 6/120 = 0.95, H_adj = 0.75/0.95."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 4)], "g string, v long"
    )
    r = kruskal_wallis(df, "g", F.col("v")).collect()[0]
    assert (r.n, r.k_groups, r.dof) == (5, 2, 1)
    assert r.h == 0.75
    assert r.h_tie_corrected == math.floor(0.75 / 0.95 * 10000 + 0.5) / 10000


def test_brown_forsythe_hand_computed(spark):
    """Type a daily moves [-2,0,2,4] (doubled median 2 -> z = 6,2,2,6);
    type b [-10,0,10] (doubled median 0 -> z = 20,0,20).
    num = 64 + 1600/3 - 3136/7, den = 16 + 800 - 1600/3,
    W = 5 * num/den = 2.6415."""
    rows = []
    eid = 0
    for d, px in enumerate([10.00, 9.98, 9.98, 10.00, 10.04], start=1):
        eid += 1
        rows.append((eid, d, "a", px))
    for d, px in enumerate([10.00, 9.90, 9.90, 10.00], start=1):
        eid += 1
        rows.append((eid, d, "b", px))
    r = brown_forsythe(_ev(spark, rows)).collect()[0]
    num = 64 + 40**2 / 3 - 56**2 / 7
    den = (80 - 64) + (800 - 40**2 / 3)
    w = 5 * num / den
    assert (r.n, r.k_groups, r.dof1, r.dof2) == (7, 2, 1, 5)
    assert r.bf_w == math.floor(w * 10000 + 0.5) / 10000


def test_cramers_v_hand_computed(spark):
    """2x2 contingency (10,20;30,40): chi2 = sum of 1e-9-fixed exact
    cell terms = 0.793650793, V = sqrt(chi2/(100*1))."""
    rows = (
        [("r1", "c1")] * 10
        + [("r1", "c2")] * 20
        + [("r2", "c1")] * 30
        + [("r2", "c2")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, F.col("a"), F.col("b")).collect()[0]
    chi2_fx = (333333333 + 222222222 + 142857143 + 95238095) / 10**9
    assert (r.n, r.n_rows, r.n_cols) == (100, 2, 2)
    assert r.chi2 == math.floor(chi2_fx * 10000 + 0.5) / 10000
    v = math.sqrt(chi2_fx / 100)
    assert r.cramers_v == math.floor(v * 10000 + 0.5) / 10000


def test_jackknife_sharpe_hand_computed(spark):
    """Moves [1,2,3] cents: full Sharpe = 2/1 = 2. Replicates (drop one
    each): 2.5/sqrt(.5), 2/sqrt(2), 1.5/sqrt(.5) fixed to 1e-6 ints;
    SE = sqrt(2*(3*V2 - M^2))/(3*1e6)."""
    closes = [10.00, 10.01, 10.03, 10.06]
    rows = [(i + 1, i + 1, "t", c) for i, c in enumerate(closes)]
    r = jackknife_sharpe(_ev(spark, rows)).collect()[0]
    th = [
        math.floor(2.5 / math.sqrt(0.5) * 10**6 + 0.5),
        math.floor(2.0 / math.sqrt(2.0) * 10**6 + 0.5),
        math.floor(1.5 / math.sqrt(0.5) * 10**6 + 0.5),
    ]
    m, v2 = sum(th), sum(x * x for x in th)
    se = math.sqrt(2 * (3 * v2 - m * m)) / (3 * 10**6)
    assert r.n_days == 3
    assert r.sharpe == 2.0
    assert r.jk_se == math.floor(se * 10000 + 0.5) / 10000
    assert r.jk_t == math.floor(2.0 / se * 10000 + 0.5) / 10000


def test_runs_test_hand_computed(spark):
    """Signs + + - + - - -> 4 runs, n+ = n- = 3: mu = 4, z = 0."""
    closes = [10.00, 10.01, 10.03, 10.02, 10.03, 10.01, 10.00]
    rows = [(i + 1, i + 1, "t", c) for i, c in enumerate(closes)]
    r = runs_test(_ev(spark, rows)).collect()[0]
    assert (r.n_pos, r.n_neg, r.runs) == (3, 3, 4)
    assert r.z == 0.0


def test_runs_test_drops_zeros_and_one_sided(spark):
    """A zero move contributes no sign; an all-positive type drops
    (sigma undefined)."""
    closes = [10.00, 10.01, 10.01, 10.02]  # moves +1, 0, +1
    rows = [(i + 1, i + 1, "t", c) for i, c in enumerate(closes)]
    assert runs_test(_ev(spark, rows)).collect() == []
