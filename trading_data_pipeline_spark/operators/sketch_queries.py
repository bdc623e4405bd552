"""Mergeable-sketch rollups (round-5 batch 3): HLL distinct counts,
theta set algebra, KLL quantiles.

At 100 TB the only viable shape for "distinct users per X", "overlap
between audiences" and "p99 latency" is a MERGEABLE summary: build
small sketches close to the data (partial aggregation, map-side), merge
them upward (day → month → total) without ever re-scanning raw rows.
Spark 4 ships Apache DataSketches natively (``hll_sketch_agg``,
``theta_*``, ``kll_*``) — these operators put that surface on the query
registry:

- ``q_hll_rollup``: distinct users per event type + a '__total__' row
  MERGED FROM the per-type sketches (``hll_union_agg``) — the register
  maxima of a union equal those of a one-shot global sketch, so the
  rollup is exact-as-the-sketch, not an approximation of one.
- ``q_theta_overlap``: audience algebra (viewers ∩ purchasers,
  viewers ∖ purchasers, …) via theta sketches — set EXPRESSIONS over
  summaries, the thing HLL cannot do (no intersection/difference).
- ``q_kll_quantiles``: per-type p50/p95/p99 of ``value`` from KLL
  sketches, a bounded-rank-error alternative to exact sort-based
  percentiles.

Sketch bytes and estimates are engine-specific (DataSketches), so all
three are rows-only on the driver gate; accuracy versus exact answers
and the merge≡rebuild identity are pinned in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quantize import q as _q
from ..registry import load, register

HLL_LGK = 12  # 2^12 registers — ~0.8% relative standard error
TOTAL_MARKER = "__total__"


def user_sketches(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Per-group HLL sketch of ``user_id`` — the mergeable build step.

    One partial-aggregated exchange on the group key; each map task
    contributes a partial sketch, so the shuffle carries sketch bytes,
    never user ids. Persist this table daily and downstream rollups
    merge it instead of re-scanning events.
    """
    return events.groupBy(group_col).agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sketch")
    )


def merge_user_sketches(sketches: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Merge a sketch table to one total sketch (``hll_union_agg``)."""
    return sketches.agg(
        F.hll_union_agg("sketch", F.lit(False)).alias("sketch")
    ).select(F.lit(TOTAL_MARKER).alias(group_col), "sketch")


@register(
    "q_hll_rollup",
    None,  # DataSketches bytes/estimates are engine-specific → rows-only
    doc="Distinct users per event type via HLL sketches plus a "
    "'__total__' row merged from the per-type sketches — the "
    "build-small/merge-up rollup pattern that replaces COUNT(DISTINCT) "
    "re-scans at 100 TB. Merge≡rebuild identity and <5%-of-exact "
    "accuracy pinned in tests/test_sketches.py",
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    # both union legs consume the per-type sketches — materialize the
    # (tiny) sketch table once instead of scanning events twice
    per_type = user_sketches(events).localCheckpoint(eager=True)
    rolled = per_type.unionByName(merge_user_sketches(per_type))
    return rolled.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
    )


@register(
    "q_theta_overlap",
    None,  # theta estimates are engine-specific → rows-only
    doc="Audience set algebra on theta sketches: viewers vs purchasers "
    "union/intersection/difference estimated WITHOUT a distinct-join — "
    "sketches build in one partial-aggregated pass per audience and "
    "compose algebraically; accuracy vs exact set ops tested",
)
def q_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")

    def audience(event_type: str):
        return events.filter(F.col("event_type") == event_type).agg(
            F.theta_sketch_agg("user_id").alias("s")
        )

    viewers = audience("view").select(F.col("s").alias("viewers"))
    buyers = audience("purchase").select(F.col("s").alias("buyers"))
    both = viewers.crossJoin(buyers)  # two one-row frames
    return both.select(
        F.theta_sketch_estimate("viewers").alias("est_viewers"),
        F.theta_sketch_estimate("buyers").alias("est_buyers"),
        F.theta_sketch_estimate(F.theta_union("viewers", "buyers")).alias(
            "est_either"
        ),
        F.theta_sketch_estimate(
            F.theta_intersection("viewers", "buyers")
        ).alias("est_both"),
        F.theta_sketch_estimate(F.theta_difference("viewers", "buyers")).alias(
            "est_view_only"
        ),
    )


KLL_QUANTILES = (0.5, 0.95, 0.99)


@register(
    "q_kll_quantiles",
    None,  # KLL summaries are engine-specific → rows-only
    doc="Per-type p50/p95/p99 of value from KLL quantile sketches: "
    "bounded rank error, mergeable partial aggregation — the sketch "
    "twin of the exact sort-based q_percentiles; rank-error bound "
    "tested against exact quantiles",
)
def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    sk = events.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    return sk.select(
        "event_type",
        *[
            F.kll_sketch_get_quantile_double("sk", F.lit(p)).alias(
                f"p{int(p * 100)}"
            )
            for p in KLL_QUANTILES
        ],
    )


@register(
    "q_semijoin_selectivity",
    None,  # theta estimates are engine-specific → rows-only
    doc="Join-planning statistics from sketches: estimate how many of "
    "part's keys the lineitem fact actually references (theta-sketch "
    "intersection of the two key sets) WITHOUT a distinct-join — the "
    "selectivity number that justifies a Bloom/DPP runtime filter "
    "(q_bloom_join) before paying for it. One partial-aggregated pass "
    "per side, constant-size estimate state; accuracy vs the exact "
    "overlap pinned in tests/test_sketches.py",
)
def q_semijoin_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").agg(
        F.theta_sketch_agg("l_partkey").alias("s")
    )
    pt = load(spark, sf_dir, "part").agg(
        F.theta_sketch_agg("p_partkey").alias("s")
    )
    both = li.select(F.col("s").alias("fact")).crossJoin(
        pt.select(F.col("s").alias("dim"))
    )  # two one-row frames
    est_fact = F.theta_sketch_estimate("fact")
    est_dim = F.theta_sketch_estimate("dim")
    est_match = F.theta_sketch_estimate(F.theta_intersection("fact", "dim"))
    return both.select(
        est_fact.alias("est_fact_keys"),
        est_dim.alias("est_dim_keys"),
        est_match.alias("est_matching"),
        _q(est_match.cast("double") / est_dim, 10000).alias("dim_selectivity"),
    )
