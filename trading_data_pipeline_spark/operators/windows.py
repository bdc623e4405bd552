"""Event-time windowed aggregation (extension ops E8/E9).

Batch implementations that are streaming-ready: the same expressions run
under ``readStream`` + ``withWatermark`` unchanged (streaming/jobs.py wires
that; equivalence is tested in tests/test_streaming.py).

- :func:`tumbling_agg` — fixed windows via ``F.window`` (single shuffle on
  (window, keys); in streaming, watermark bounds state).
- :func:`session_agg` — gap-based sessions via ``F.session_window``
  (sessions close when the gap to the next event is ≥ the gap duration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    win = F.window(ts_col, duration)
    return (
        events.groupBy(win.alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    win = F.session_window(ts_col, gap)
    return (
        events.groupBy(win.alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            key,
            F.date_format("w.start", TS_FMT).alias("session_start"),
            F.date_format("w.end", TS_FMT).alias("session_end"),
            "n_events",
            "total_value",
        )
    )
