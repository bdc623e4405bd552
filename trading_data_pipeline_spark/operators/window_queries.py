"""Declared event-time window queries (extension ops E8/E9).

Both have exact DuckDB oracles: tumbling via time_bucket, sessions via the
gaps-and-islands formulation (lag + cumulative break count) — which is also
the proof that session_window's semantics (close when gap ≥ threshold) are
what we claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import load, register
from .windows import hopping_agg, session_agg, tumbling_agg


@register(
    "q_tumbling_window",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
    """,
    doc="Tumbling event-time window (F.window) — identical code runs under "
    "readStream+watermark (tests/test_streaming.py asserts equivalence)",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(load(spark, sf_dir, "events"), "1 hour")


@register(
    "q_session_window",
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL '30 minutes',
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions GROUP BY user_id, sid
    """,
    doc="Sessionization via F.session_window(gap=30m); oracle is the "
    "gaps-and-islands SQL — session_end = last event + gap, sessions split "
    "when the inter-event gap reaches the threshold",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(load(spark, sf_dir, "events"), "30 minutes")


@register(
    "q_hopping_window",
    """
    SELECT CAST(floor(epoch(ts) / 300) * 300 - off AS BIGINT)
             AS window_start_s,
           count(*) AS n_events,
           floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS total_value
    FROM events CROSS JOIN (VALUES (0), (300)) AS o(off)
    GROUP BY 1
    """,
    doc="Hopping (sliding) event-time window: 10-minute windows sliding "
    "every 5 — F.window with a slideDuration, the streaming-compatible "
    "overlapping-window operator (each event lands in exactly "
    "duration/slide windows; one shuffle on the window key). The oracle "
    "derives the same two windows per event arithmetically (start = "
    "floor(epoch/slide)*slide - k*slide). Window starts are epoch "
    "seconds so the comparison is timezone-representation-proof; the "
    "value sum accumulates in DECIMAL so it is fold-order-exact",
)
def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hopping_agg(load(spark, sf_dir, "events"), "10 minutes", "5 minutes")
