"""Structured Streaming variants of the batch operators (extension E8).

The batch transforms in operators/windows.py are expression-compatible with
streaming input: the same ``tumbling_agg`` call runs over ``readStream``
with a watermark bounding state. tests/test_streaming.py asserts streaming
(availableNow, complete mode) equals the batch result on the same files —
the unified-API guarantee this engine leans on instead of a second code
path (contrast: the reference is batch-only, SURVEY.md §2.e).

At scale: file/Kafka source → watermarked windowed agg → partitioned sink
with checkpointing; late events beyond the watermark are dropped
deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.windows import tumbling_agg

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, src_dir: str, schema: str = EVENTS_SCHEMA) -> DataFrame:
    """File-source stream over a directory of parquet event files."""
    return spark.readStream.schema(schema).parquet(src_dir)


def tumbling_stream(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked streaming tumbling aggregation — same expression tree as
    the batch ``tumbling_agg``."""
    return tumbling_agg(events.withWatermark(ts_col, watermark), duration, ts_col=ts_col)


def session_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked streaming sessionization — same ``session_window``
    expression as the batch ``session_agg``; the watermark bounds how long
    an open session can wait for a late event before the state store may
    finalize it."""
    from ..operators.windows import session_agg

    return session_agg(events.withWatermark(ts_col, watermark), gap, ts_col=ts_col)


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup — the streaming counterpart of batch
    ``exact_dedup`` (extension E1): emit the first event per key, with
    dedup state BOUNDED by the watermark horizon instead of growing
    forever. ``dropDuplicatesWithinWatermark`` evicts a key's state once
    the watermark passes its event time, so at 100 TB/day the state store
    holds only the horizon's keys, not history; a replayed/duplicated
    event inside the horizon (the at-least-once delivery case this op
    exists for) is dropped exactly like the batch form would."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
