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
