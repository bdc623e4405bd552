"""Declared as-of join queries (extension op E10).

Business shape: for every purchase event, the user's most recent signup
value at or before the purchase. Oracle uses DuckDB's native ASOF JOIN; the
Spark implementation is the one-shuffle union+window strategy (asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register
from .asof import asof_join_pandas, asof_join_union

ASOF_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'purchase'),
     s AS (SELECT user_id, ts, value FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id,
       round(p.value, 2) AS purchase_value,
       round(s.value, 2) AS last_signup_value
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    return purchases, signups


@register(
    "q_asof_join",
    ASOF_ORACLE,
    doc="As-of join via union + one window pass (single shuffle on user_id; "
    "no range-join blow-up) — matches DuckDB ASOF JOIN semantics incl. "
    "ts-equality matches",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases, signups = _sides(spark, sf_dir)
    out = asof_join_union(
        purchases, signups, on="user_id", value_alias="last_signup_value"
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("last_signup_value", 2).alias("last_signup_value"),
    )


@register(
    "q_asof_pandas",
    ASOF_ORACLE,
    doc="Same as-of semantics via cogrouped applyInPandas + merge_asof "
    "(Arrow-batched) — the escape hatch when per-key logic outgrows window "
    "functions; verified equal to both the union strategy and the oracle",
)
def q_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases, signups = _sides(spark, sf_dir)
    out = asof_join_pandas(
        purchases, signups, on="user_id", value_alias="last_signup_value"
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("last_signup_value", 2).alias("last_signup_value"),
    )


from .asof import asof_join_tolerance  # noqa: E402

_TOL_HOURS = 48


def _sides_tb(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_event_id"), "user_id", "ts", "value"
    )
    return purchases, signups


@register(
    "q_asof_tolerance",
    f"""
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         s AS (SELECT event_id AS s_event_id, user_id, ts, value FROM events
               WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id,
           round(p.value, 2) AS purchase_value,
           round(m.value, 2) AS last_signup_value
    FROM p LEFT JOIN LATERAL (
      SELECT s.value FROM s
      WHERE s.user_id = p.user_id AND s.ts <= p.ts
        AND s.ts >= p.ts - INTERVAL {_TOL_HOURS} HOUR
      ORDER BY s.ts DESC, s.s_event_id DESC LIMIT 1
    ) m ON TRUE
    """,
    doc="As-of join with a staleness tolerance (merge_asof tolerance= "
    "semantics): matches older than 48h are nulled out post-window, so "
    "the plan is still ONE exchange on user_id — no range join, no "
    "per-row correlated scan (the LATERAL in the oracle is exactly the "
    "per-row-scan shape the union+window plan avoids). Deterministic "
    "same-ts choice via the event-id tiebreak",
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases, signups = _sides_tb(spark, sf_dir)
    out = asof_join_tolerance(
        purchases, signups, on="user_id", value_alias="last_signup_value",
        tolerance_micros=_TOL_HOURS * 3600 * 1_000_000,
        direction="backward", right_tiebreak="s_event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("last_signup_value", 2).alias("last_signup_value"),
    )


@register(
    "q_asof_forward",
    f"""
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'signup'),
         s AS (SELECT event_id AS s_event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           round(p.value, 2) AS signup_value,
           round(m.value, 2) AS next_purchase_value
    FROM p LEFT JOIN LATERAL (
      SELECT s.value FROM s
      WHERE s.user_id = p.user_id AND s.ts >= p.ts
        AND s.ts <= p.ts + INTERVAL {_TOL_HOURS} HOUR
      ORDER BY s.ts ASC, s.s_event_id DESC LIMIT 1
    ) m ON TRUE
    """,
    doc="Forward as-of join (merge_asof direction='forward'): for every "
    "signup, the user's EARLIEST purchase within the next 48h — "
    "conversion attribution as one window pass over the reversed sort, "
    "same single-exchange plan as the backward form",
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("s_event_id"), "user_id", "ts", "value"
    )
    out = asof_join_tolerance(
        signups, purchases, on="user_id", value_alias="next_purchase_value",
        tolerance_micros=_TOL_HOURS * 3600 * 1_000_000,
        direction="forward", right_tiebreak="s_event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("signup_value"),
        F.round("next_purchase_value", 2).alias("next_purchase_value"),
    )
