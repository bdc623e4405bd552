"""Sessionization (id-assignment form) and one-pass table profiling."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.profiling_queries import (
    profile_table,
    sessionize,
)
from trading_data_pipeline_spark.operators.windows import session_agg
from trading_data_pipeline_spark.registry import load

SF_DIR = "/root/testdata/sf0.001"

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, "view", 1.0, "{}")
            for i, (u, m) in enumerate(rows)
        ],
        EVENT_SCHEMA,
    )


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, 0),    # session 1
        (1, 29),   # 29 min gap < 30 -> same session
        (1, 59),   # exactly 30 min gap -> NEW session (>= rule)
        (1, 100),  # 41 min gap -> new session
        (2, 0),    # other user: own numbering
    ]
    got = {
        r["event_id"]: (r["user_id"], r["session_id"])
        for r in sessionize(_events(spark, rows)).collect()
    }
    assert got == {0: (1, 1), 1: (1, 1), 2: (1, 2), 3: (1, 3), 4: (2, 1)}


def test_sessionize_agrees_with_session_window_aggregate(spark):
    """Distinct (user, session_id) pairs must equal session_agg's row count
    on the same events — both implement the same 30-min gap rule (boundary
    semantics aligned with F.session_window's half-open windows)."""
    ev = load(spark, SF_DIR, "events")
    n_assigned = (
        sessionize(ev).select("user_id", "session_id").distinct().count()
    )
    n_agg = session_agg(ev).count()
    assert n_assigned == n_agg > 0


def test_sessionize_single_exchange(spark):
    plan = sessionize(
        load(spark, SF_DIR, "events")
    )._jdf.queryExecution().executedPlan().toString()
    # both windows share the (user_id)x(ts, event_id) sort order — one
    # exchange, one sort
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_profile_matches_direct_aggregates(spark):
    docs = load(spark, SF_DIR, "documents")
    prof = {r["col_name"]: r for r in profile_table(docs).collect()}
    assert set(prof) == set(docs.columns)
    n = docs.count()
    for c in docs.columns:
        assert prof[c]["n_rows"] == n
        assert prof[c]["n_distinct"] == docs.select(c).distinct().count()
        assert prof[c]["n_nulls"] == docs.filter(F.col(c).isNull()).count()
    assert prof["doc_id"]["min_str"] == "0"


def test_profile_is_one_job_single_aggregate_pass(spark):
    df = profile_table(load(spark, SF_DIR, "orders"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one scan feeding one (expanded) aggregate; the per-column union is
    # over 1-row aggregate results, not repeated table scans
    assert plan.count("FileScan parquet") == 1, plan


def test_profile_approximate_mode_skips_expand(spark):
    docs = load(spark, SF_DIR, "documents")
    approx = profile_table(docs, approximate=True)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    # HLL sketches merge as partial aggregates — no per-column row
    # replication (the exact mode's Expand) anywhere in the plan
    assert "Expand" not in plan, plan
    exact = {r["col_name"]: r for r in profile_table(docs).collect()}
    for r in approx.collect():
        e = exact[r["col_name"]]
        # nulls/min/max stay exact; distincts within HLL++ tolerance
        assert r["n_nulls"] == e["n_nulls"]
        assert (r["min_str"], r["max_str"]) == (e["min_str"], e["max_str"])
        assert abs(r["n_distinct"] - e["n_distinct"]) <= max(3, 0.05 * e["n_distinct"])


def test_global_running_max_equals_single_partition_window(spark):
    """The two-pass bucketed prefix max must equal the naive global
    window on a shuffled integer sequence."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from trading_data_pipeline_spark.plans.global_rank import (
        global_running_max,
    )

    rows = [(i, ((i * 7919 + 11) % 1009)) for i in range(1, 2000)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = global_running_max(df, ["k"], "v", n_buckets=7)
    naive = df.withColumn(
        "_exp",
        F.max("v").over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    joined = got.join(naive.select("k", "_exp"), "k")
    assert joined.filter(F.col("_gmax") != F.col("_exp")).count() == 0


def test_lateness_audit_hand_sequence(spark):
    """Explicit arrival column: arrival order e2(20s), e0(10s), e1(0s)
    -> e2 on time, e0 10s late, e1 20s late; max 20s, mean 15s."""
    from pyspark.sql import functions as F

    from trading_data_pipeline_spark.operators.profiling_queries import (
        lateness_audit,
    )

    events = spark.createDataFrame(
        [
            (0, "2024-01-01 00:00:10", 1, "click", 1.0, "{}", 2),
            (1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}", 3),
            (2, "2024-01-01 00:00:20", 1, "click", 1.0, "{}", 1),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string, arrival long",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = lateness_audit(events, arrival_col="arrival").collect()[0]
    assert out.n == 3 and out.n_late == 2
    assert out.max_late_s == 20 and out.watermark_s == 20
    assert out.mean_late_us == 15_000_000
