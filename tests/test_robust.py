"""Hand-computed fixtures for the round-8 robust/resampling batch:
Hodges-Lehmann, deterministic Poisson bootstrap, assortativity.
Expected values recomputed from the published definitions in plain
Python (DuckDB parity alone passes identical-wrong-formula bugs —
it caught nothing when both engines shared a /400 scale bug here;
test_hodges_lehmann_hand_computed is the check that did)."""

from __future__ import annotations

import datetime as dt
import json
import math

from trading_data_pipeline_spark.operators.robust_queries import (
    BOOT_B,
    LCG_A,
    LCG_B,
    LCG_M,
    _POIS_CDF,
    assortativity,
    bootstrap_ci,
    hodges_lehmann,
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


def test_hodges_lehmann_hand_computed(spark):
    """Moves [1,2,4] -> Walsh averages 1, 1.5, 2.5, 2, 3, 4 -> sorted
    [1, 1.5, 2, 2.5, 3, 4], even m=6 -> median (2+2.5)/2 = 2.25 cents."""
    df = _ev(spark, {"a": [100, 101, 103, 107]})
    r = hodges_lehmann(df).collect()[0]
    assert r.n_walsh == 6
    assert r.hl_dollars == _q4(2.25 / 100.0)


def test_hodges_lehmann_odd(spark):
    """Moves [1,3] -> Walsh averages 1, 2, 3 -> median 2 cents."""
    df = _ev(spark, {"a": [100, 101, 104]})
    r = hodges_lehmann(df).collect()[0]
    assert r.n_walsh == 3
    assert r.hl_dollars == _q4(0.02)


def test_bootstrap_ci_matches_python_replication(spark):
    """Deterministic: the exact LCG/Poisson replication in plain Python
    must reproduce the band bit-for-bit (quantized)."""
    moves = [1, -2, 3, 1, -1, 2, -3, 1, 2, -1]
    closes = [1000]
    for d in moves:
        closes.append(closes[-1] + d)
    df = _ev(spark, {"a": closes})
    r = bootstrap_ci(df).collect()[0]

    def mult(u):
        for j in range(5):
            if u < _POIS_CDF[j]:
                return j
        return 5

    means = []
    for b in range(BOOT_B):
        sx = sm = 0
        for rid, x in enumerate(moves, start=1):
            m = mult((rid * LCG_A + b * LCG_B) % LCG_M)
            sx += m * x
            sm += m
        if sm > 0:
            means.append(sx / (100.0 * sm))
    means.sort()
    nb = len(means)
    lo = means[max(1, math.floor(nb * 0.025)) - 1]
    hi = means[min(nb, math.floor(nb * 0.975) + 1) - 1]
    assert r.n_boot == nb
    assert r.mean_obs == _q4(sum(moves) / (100.0 * len(moves)))
    assert r.ci_lo == _q4(lo)
    assert r.ci_hi == _q4(hi)
    assert r.ci_lo <= r.mean_obs <= r.ci_hi


def test_assortativity_path_graph(spark):
    """Path 1-2-3: degree pairs (1,2),(2,1),(2,1),(1,2) -> r = -1."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    r = assortativity(edges).collect()[0]
    assert r.n_edges == 2
    assert r.assortativity == -1.0


def test_assortativity_regular_graph_undefined(spark):
    """A triangle is 2-regular: zero degree variance -> NULL r."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "id_a long, id_b long"
    )
    r = assortativity(edges).collect()[0]
    assert r.n_edges == 3
    assert r.assortativity is None
