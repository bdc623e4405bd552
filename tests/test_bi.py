"""Hand-built semantic tests for the BI batch (operators/bi_queries.py)."""

from __future__ import annotations

import datetime as dt

from trading_data_pipeline_spark.operators.bi_queries import (
    ab_test,
    basket_pairs,
    rfm_segments,
)


def test_rfm_scores_follow_metric_order(spark):
    # five customers, strictly increasing frequency/monetary and strictly
    # decreasing recency → with 5 buckets each score equals the rank
    rows = []
    okey = 0
    for cust in range(1, 6):
        for k in range(cust):  # cust orders → frequency = cust
            okey += 1
            rows.append(
                (okey, cust, "O", 100.0 * cust,
                 dt.datetime(2024, 1, cust, 12, 0, 0), "1-URGENT")
            )
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {r.o_custkey: r for r in rfm_segments(orders).collect()}
    assert len(out) == 5
    # customer 5: most recent (recency 0 → r_score 1), most frequent and
    # highest spend (f_score = m_score = 5)
    assert out[5].recency_days == 0 and out[5].r_score == 1
    assert out[5].f_score == 5 and out[5].m_score == 5
    assert out[5].segment == "1-5-5"
    # customer 1: oldest, least frequent, least spend
    assert out[1].r_score == 5 and out[1].f_score == 1 and out[1].m_score == 1
    assert out[1].frequency == 1 and out[1].monetary == 100.0


def test_ab_test_hand_built(spark):
    # arm 0 = even user ids (2 converts, 4 doesn't), arm 1 = odd (both convert)
    rows = [
        (0, dt.datetime(2024, 1, 1), 2, "purchase", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 1), 4, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1), 1, "purchase", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1), 3, "purchase", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    r = ab_test(events).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (2, 1, 2, 2)
    assert (r.rate_a, r.rate_b) == (0.5, 1.0)
    assert r.lift == 1.0
    assert r.z_stat == 1.154701  # 0.5 / sqrt(0.75*0.25*(0.5+0.5)), quantized


def test_ab_test_degenerate_rates_are_null(spark):
    rows = [
        (0, dt.datetime(2024, 1, 1), 1, "purchase", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 1), 2, "purchase", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    r = ab_test(events).collect()[0]
    assert r.rate_a == 1.0 and r.rate_b == 1.0
    assert r.z_stat is None  # pooled conversion = 1 → zero variance


def test_basket_pairs_hand_built(spark):
    # baskets {1,2,3}, {1,2}, {2,3} → (1,2)x2, (2,3)x2 survive min_count=2
    rows = []
    for okey, parts in [(1, [1, 2, 3]), (2, [1, 2]), (3, [2, 3])]:
        for i, p in enumerate(parts):
            rows.append((okey, p, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O",
                         dt.datetime(2024, 1, 1)))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    out = {(r.pa, r.pb): r for r in basket_pairs(li, min_count=2).collect()}
    assert set(out) == {(1, 2), (2, 3)}
    r12 = out[(1, 2)]
    assert r12.c_ab == 2 and r12.c_a == 2 and r12.c_b == 3
    assert r12.lift == 1.0  # 2*3 / (2*3)
    assert r12.support == 0.6667


def test_basket_pairs_duplicate_lines_count_once(spark):
    # the same part twice in one order is one basket membership
    rows = [
        (1, 7, 1, 0, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1)),
        (1, 7, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1)),
        (1, 8, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1)),
        (2, 7, 1, 0, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1)),
        (2, 8, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1)),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    out = basket_pairs(li, min_count=2).collect()
    assert len(out) == 1 and out[0].c_ab == 2


def test_attribution_hand_built(spark):
    import datetime as dt

    from trading_data_pipeline_spark.operators.bi_queries import (
        last_touch_attribution,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 9, m)
    rows = [
        # user 1: view -> click -> purchase(10)  => click credited
        (0, t(0), 1, "view", 0.0, "{}"),
        (1, t(1), 1, "click", 0.0, "{}"),
        (2, t(2), 1, "purchase", 10.0, "{}"),
        # user 1 again: purchase(5) right after => still click (last non-purchase)
        (3, t(3), 1, "purchase", 5.0, "{}"),
        # user 2: purchase with no preceding touch => (none)
        (4, t(0), 2, "purchase", 7.0, "{}"),
        # user 3: view -> purchase(1) => view credited
        (5, t(0), 3, "view", 0.0, "{}"),
        (6, t(1), 3, "purchase", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    out = {r.last_touch: r for r in last_touch_attribution(events).collect()}
    assert out["click"].n_purchases == 2 and out["click"].attributed_value == 15.0
    assert out["view"].n_purchases == 1 and out["view"].attributed_value == 1.0
    assert out["(none)"].n_purchases == 1 and out["(none)"].attributed_value == 7.0


def test_basket_cap_drops_degenerate_basket_whole(spark):
    # order 1 is a 5-item wholesale basket; with max_basket=4 it must
    # contribute neither pairs nor part frequencies
    rows = []
    for p in range(10, 15):
        rows.append((1, p, 1, p, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     dt.datetime(2024, 1, 1)))
    for okey in (2, 3):
        for p in (10, 11):
            rows.append((okey, p, 1, p, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         dt.datetime(2024, 1, 1)))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    out = basket_pairs(li, min_count=2, max_basket=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pa, r.pb, r.c_ab) == (10, 11, 2)
    assert r.c_a == 2 and r.c_b == 2  # wholesale basket excluded from freqs


def test_gini_extremes(spark):
    from trading_data_pipeline_spark.operators.bi_queries import (
        gini_concentration,
    )

    def orders_of(spends):
        rows = [
            (i, i, "O", s, dt.datetime(2024, 1, 1, 12), "1-URGENT")
            for i, s in enumerate(spends)
        ]
        return spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )

    # perfectly equal spend → G = 0
    r = gini_concentration(orders_of([10.0] * 8)).collect()[0]
    assert r.gini == 0.0 and r.n_customers == 8
    # one customer owns everything → G = (n-1)/n
    r = gini_concentration(orders_of([0.0] * 7 + [100.0])).collect()[0]
    assert r.gini == round(7 / 8, 6)


def test_gini_empty_input_matches_oracle_shape(spark):
    from trading_data_pipeline_spark.operators.bi_queries import (
        gini_concentration,
    )

    empty = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    r = gini_concentration(empty).collect()
    assert len(r) == 1 and r[0].n_customers == 0 and r[0].gini is None


def test_diff_in_diff_hand_2x2(spark):
    """Constructed cells: control 10->12 (+2), treated 20->30 (+10);
    DiD = +8. Means are exact (integer cents)."""
    from trading_data_pipeline_spark.operators.bi_queries import diff_in_diff

    rows = []
    eid = 0
    def add(uid, ts, v):
        nonlocal eid
        rows.append((eid, ts, uid, "purchase", v, "{}")); eid += 1
    # control = even uid, treat = odd uid; split at 2024-01-16
    for v in (9.0, 11.0):  add(2, "2024-01-10 00:00:00", v)   # ctrl pre mean 10
    for v in (11.0, 13.0): add(2, "2024-01-20 00:00:00", v)   # ctrl post mean 12
    for v in (19.0, 21.0): add(3, "2024-01-10 00:00:00", v)   # treat pre mean 20
    for v in (29.0, 31.0): add(3, "2024-01-20 00:00:00", v)   # treat post mean 30
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    )
    from pyspark.sql import functions as F

    events = events.withColumn("ts", F.to_timestamp("ts"))
    out = diff_in_diff(events).collect()[0]
    assert out.ctrl_pre_mean == 10.0 and out.ctrl_post_mean == 12.0
    assert out.treat_pre_mean == 20.0 and out.treat_post_mean == 30.0
    assert out.did == 8.0
    assert out.n_ctrl_pre == out.n_treat_post == 2
