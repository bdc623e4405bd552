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

def hopping_agg(
    events: DataFrame,
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Hopping (sliding) event-time windows: each event lands in
    ``duration/slide`` overlapping windows — ``F.window`` with a slide,
    identical semantics under ``readStream`` + watermark.

    The window start is emitted as epoch SECONDS (bigint) so the result
    is timezone-representation-proof across engines; ``ts`` is cast to
    TIMESTAMP first so the epoch cast is legal for NTZ parquet input.
    The value sum accumulates in DECIMAL (exact, fold-order-free) and is
    quantized with the engine-exact floor(x*s+0.5)/s form.
    """
    win = F.window(F.col(ts_col).cast("timestamp"), duration, slide)
    dec = F.col("value").cast("decimal(18,6)")
    return (
        events.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(dec).alias("_tv"))
        .select(
            F.col("w.start").cast("long").alias("window_start_s"),
            "n_events",
            (F.floor(F.col("_tv").cast("double") * 10000 + 0.5) / 10000).alias(
                "total_value"
            ),
        )
    )
