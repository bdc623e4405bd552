"""Functional tests for the training-preparation operators
(operators/trainprep_queries.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.trainprep_queries import (
    K_ANON,
    N_FOLDS,
    TE_SMOOTHING,
    target_encode_loo,
    walk_forward_folds,
)
from trading_data_pipeline_spark.registry import all_queries, load


def test_target_encode_hand_case(spark):
    # category a: values 10, 20 ; category b: single row 99
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 99.0)],
        "event_id long, event_type string, value double",
    )
    g = (10.0 + 20.0 + 99.0) / 3
    m = TE_SMOOTHING
    rows = {r.event_id: r.loo_enc for r in target_encode_loo(df, "event_type", "value").collect()}
    # row 1: other-row sum = 20, n-1 = 1
    exp1 = (20.0 + m * g) / (1 + m)
    # row 3 is alone in its category → pure prior
    exp3 = (0.0 + m * g) / (0 + m)
    assert abs(rows[1] - exp1) < 1e-3
    assert abs(rows[3] - exp3) < 1e-3


def test_target_encode_excludes_own_label(spark, sf_dir):
    """LOO property: perturbing one row's target must not move that row's
    own encoding by the full weight — compare against the naive (leaky)
    per-category mean, which WOULD include it."""
    q = all_queries()["q_target_encode"].fn(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    naive = ev.groupBy("event_type").agg(
        (F.sum("value") / F.count(F.lit(1))).alias("naive")
    )
    # encodings within a category must differ row-to-row (they exclude
    # different own-labels), unlike the constant naive mean
    per_cat_distinct = (
        q.groupBy("event_type").agg(F.countDistinct("loo_enc").alias("k")).collect()
    )
    assert all(r.k > 1 for r in per_cat_distinct)
    assert naive.count() == len(per_cat_distinct)


def test_kanonymity_flags_and_mass(spark, sf_dir):
    q = all_queries()["q_kanonymity"].fn(spark, sf_dir)
    rows = q.collect()
    assert all((r.n < K_ANON) == r.at_risk for r in rows)
    total = sum(r.n for r in rows)
    assert total == load(spark, sf_dir, "events").count()


def test_walk_forward_fold_structure(spark, sf_dir):
    rows = sorted(
        all_queries()["q_walk_forward"].fn(spark, sf_dir).collect(),
        key=lambda r: r.fold,
    )
    assert [r.fold for r in rows] == list(range(1, N_FOLDS + 1))
    ev_dates = load(spark, sf_dir, "events").select(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).collect()[0]
    for r in rows:
        assert r.train_start == ev_dates.d0
        assert r.train_end < r.test_start  # no leakage overlap
        assert r.test_start <= r.test_end
    # expanding window: train set grows strictly with the fold index
    n_trains = [r.n_train for r in rows]
    assert n_trains == sorted(n_trains) and n_trains[0] < n_trains[-1]
    # the last fold's test window absorbs the remainder up to the span end
    assert rows[-1].test_end == ev_dates.d1


def test_walk_forward_hand_case(spark):
    # 12 consecutive days, one event per day → base = 12 // 6 = 2
    base_day = datetime.datetime(2024, 3, 1)
    data = [
        (i, base_day + datetime.timedelta(days=i)) for i in range(12)
    ]
    df = spark.createDataFrame(data, "event_id long, ts timestamp")
    rows = {r.fold: r for r in walk_forward_folds(df).collect()}
    assert rows[1].n_train == 2 and rows[1].n_test == 2
    assert rows[4].n_train == 8 and rows[4].n_test == 2
    assert rows[5].n_train == 10 and rows[5].n_test == 2
    assert rows[5].test_end == datetime.date(2024, 3, 12)


def test_walk_forward_refuses_degenerate_span(spark):
    import datetime

    import pytest as _pytest

    short = spark.createDataFrame(
        [(i, datetime.datetime(2024, 3, 1) + datetime.timedelta(days=i % 3))
         for i in range(9)],
        "event_id long, ts timestamp",
    )
    with _pytest.raises(ValueError, match="date span"):
        walk_forward_folds(short)


def test_ldiversity_flags_homogeneous_cells(spark):
    """A cell with 5 rows but ONE user is at risk (k-anonymity would
    pass it at K<=5); a 3-user cell is not."""
    from pyspark.sql import functions as F

    from trading_data_pipeline_spark.operators.trainprep_queries import (
        ldiversity,
    )

    rows = []
    for i in range(5):   # same cell, same user -> homogeneous
        rows.append((i, "2024-01-01 10:00:00", 42, "click", 1.0, "{}"))
    for i, u in enumerate((1, 2, 3)):  # same cell, 3 users -> diverse
        rows.append((10 + i, "2024-01-02 11:00:00", u, "view", 1.0, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r.event_type): r for r in ldiversity(events).collect()}
    assert out["click"].n == 5 and out["click"].n_sensitive == 1
    assert bool(out["click"].at_risk) is True
    assert out["view"].n_sensitive == 3 and bool(out["view"].at_risk) is False


def test_minmax_scale_hand_values_and_constant_group(spark):
    from pyspark.sql import functions as F

    from trading_data_pipeline_spark.operators.trainprep_queries import (
        minmax_scale,
    )

    events = spark.createDataFrame(
        [
            (0, "2024-01-01 09:00:00", 1, "click", 10.0, "{}"),
            (1, "2024-01-01 09:00:01", 1, "click", 15.0, "{}"),
            (2, "2024-01-01 09:00:02", 1, "click", 30.0, "{}"),
            (3, "2024-01-01 09:00:03", 1, "view", 7.0, "{}"),   # constant
            (4, "2024-01-01 09:00:04", 1, "view", 7.0, "{}"),   # group
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.event_id: r.scaled for r in minmax_scale(events).collect()}
    assert out[0] == 0.0 and out[2] == 1.0
    assert out[1] == 0.25  # (15-10)/(30-10)
    assert out[3] == out[4] == 0.0  # constant group pins 0, no 0/0
