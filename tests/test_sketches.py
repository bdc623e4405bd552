"""Accuracy and merge-identity tests for the DataSketches operators
(operators/sketch_queries.py). Estimates are compared against exact
answers computed on the same data — the bound (5%) is far looser than
the sketches' configured error, so these don't flake, but a broken
build/merge path (wrong column, lost partials) lands orders of
magnitude off and fails loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.sketch_queries import (
    TOTAL_MARKER,
    merge_user_sketches,
    user_sketches,
)
from trading_data_pipeline_spark.registry import all_queries, load

REL_TOL = 0.05


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def _close(est, exact):
    assert exact > 0
    assert abs(est - exact) / exact <= REL_TOL, (est, exact)


def test_hll_rollup_matches_exact_counts(spark, sf_dir, queries):
    got = {
        r.event_type: r.approx_users
        for r in queries["q_hll_rollup"].fn(spark, sf_dir).collect()
    }
    events = load(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        _close(got[t], n)
    _close(got[TOTAL_MARKER], events.select("user_id").distinct().count())


def test_hll_merge_equals_rebuild(spark, sf_dir):
    """Union-of-partial-sketches must equal a one-shot global sketch
    EXACTLY (register maxima are associative) — the identity that makes
    day→month→total rollups safe without re-scanning raw data."""
    events = load(spark, sf_dir, "events")
    merged = (
        merge_user_sketches(user_sketches(events))
        .select(F.hll_sketch_estimate("sketch").alias("e"))
        .collect()[0]
        .e
    )
    direct = (
        events.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("e")
        )
        .collect()[0]
        .e
    )
    assert merged == direct


def test_theta_overlap_matches_exact_set_ops(spark, sf_dir, queries):
    r = queries["q_theta_overlap"].fn(spark, sf_dir).collect()[0]
    events = load(spark, sf_dir, "events")
    viewers = {
        x.user_id
        for x in events.filter("event_type = 'view'").select("user_id").distinct().collect()
    }
    buyers = {
        x.user_id
        for x in events.filter("event_type = 'purchase'").select("user_id").distinct().collect()
    }
    _close(r.est_viewers, len(viewers))
    _close(r.est_buyers, len(buyers))
    _close(r.est_either, len(viewers | buyers))
    _close(r.est_both, len(viewers & buyers))
    if viewers - buyers:
        _close(r.est_view_only, len(viewers - buyers))


def test_kll_quantiles_within_rank_error(spark, sf_dir, queries):
    """Each KLL estimate must sit inside the exact [p-2%, p+2%] rank
    band (default k=200 → ~1.65% rank error)."""
    got = {
        r.event_type: r for r in queries["q_kll_quantiles"].fn(spark, sf_dir).collect()
    }
    events = load(spark, sf_dir, "events")
    for t, row in got.items():
        for p in (50, 95, 99):
            lo_p = max((p / 100) - 0.02, 0.0)
            hi_p = min((p / 100) + 0.02, 1.0)
            bounds = (
                events.filter(F.col("event_type") == t)
                .agg(
                    F.expr(f"percentile(value, {lo_p})").alias("lo"),
                    F.expr(f"percentile(value, {hi_p})").alias("hi"),
                )
                .collect()[0]
            )
            est = getattr(row, f"p{p}")
            assert bounds.lo <= est <= bounds.hi, (t, p, est, bounds)


def test_sketch_aggs_have_partial_aggregation(spark, sf_dir):
    """The build step must partial-aggregate (sketch bytes cross the
    exchange, not raw user ids). Asserted on the build plan itself —
    the registered query materializes it once (localCheckpoint), so its
    own plan shows the cached table."""
    from tests.test_plans import formatted_plan_of

    plan = formatted_plan_of(user_sketches(load(spark, sf_dir, "events")))
    assert "ObjectHashAggregate" in plan, plan
    assert "partial_hll_sketch_agg" in plan, plan


def test_semijoin_selectivity_matches_exact_overlap(spark, sf_dir, queries):
    r = queries["q_semijoin_selectivity"].fn(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    fact_keys = {x.k for x in li.select(F.col("l_partkey").alias("k")).distinct().collect()}
    dim_keys = {x.k for x in pt.select(F.col("p_partkey").alias("k")).distinct().collect()}
    _close(r.est_fact_keys, len(fact_keys))
    _close(r.est_dim_keys, len(dim_keys))
    _close(r.est_matching, len(fact_keys & dim_keys))
    want_sel = len(fact_keys & dim_keys) / len(dim_keys)
    assert abs(r.dim_selectivity - want_sel) <= 0.05
