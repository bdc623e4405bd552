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
from pyspark.sql import functions as F

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


def hopping_stream(
    events: DataFrame,
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked streaming hopping (sliding) windows — same
    ``F.window(duration, slide)`` expression as the batch
    ``hopping_agg``; each event updates duration/slide overlapping
    window states, all bounded by the watermark."""
    from ..operators.windows import hopping_agg

    return hopping_agg(
        events.withWatermark(ts_col, watermark), duration, slide, ts_col=ts_col
    )


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


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    max_gap: str = "1 hour",
    watermark: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (attribution pattern): pair each left
    event with right events for the same key whose timestamp falls in
    ``(left.ts, left.ts + max_gap]`` — e.g. purchases attributed to the
    click that preceded them within the gap.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can EVICT state: a buffered row is dropped once the
    other side's watermark passes its eligibility window — this is the
    stream-stream join shape that runs forever at 100 TB/day without
    unbounded state. Same expression tree works in batch (the watermark is
    a no-op there), which is how the equivalence test pins semantics.
    """
    l = left.select(
        F.col(on).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        F.col("event_id").alias("l_event"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(on).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_id").alias("r_event"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    # leftOuter emits (left, NULL) once the watermark proves no match can
    # arrive — unmatched rows are produced by state EVICTION, so nulls for
    # a left row land only after the right watermark passes
    # l_ts + max_gap + delay; rows newer than that stay buffered (the
    # streaming-tail caveat the equivalence test accounts for).
    return l.join(r, cond, how).select(
        F.col("l_key").alias(on), "l_event", "r_event", "l_ts", "r_ts"
    )


def asof_stream(
    left: DataFrame,
    right_static: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    value_alias: str = "asof_value",
    max_right_rows: int = 5_000_000,
) -> DataFrame:
    """Streaming as-of join (extension E10 streaming variant): each left
    event picks up the latest right row at or before its timestamp.

    The right side must be STATE-SIZED (dimension/meta tables — the
    reference's as-of use case is trade-vs-meta-state): it is collected
    once, sorted per key, and shipped in the task closure; every
    micro-batch row then resolves with a vectorized binary search
    (``np.searchsorted``) — a NARROW transformation, so it runs identically
    under ``read`` and ``readStream`` with no state store, no watermark
    coupling, and no stream-unsupported window/join. Tie semantics match
    batch ``asof_join_union`` (a right row at exactly the left ts matches).
    For a right side too big for a closure, run the batch
    ``asof_join_union`` inside ``foreachBatch`` instead.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    rtype = dict(right_static.dtypes)[value_col]
    # fail loudly instead of OOMing the driver on a mis-sized right side
    if right_static.limit(max_right_rows + 1).count() > max_right_rows:
        raise ValueError(
            f"asof_stream right side exceeds max_right_rows={max_right_rows}; "
            "it must be state-sized (dims/meta). For larger right sides run "
            "the batch asof_join_union inside foreachBatch instead"
        )
    rows = (
        right_static.select(on, ts_col, value_col).orderBy(on, ts_col).collect()
    )
    right_map: dict = {}
    for r in rows:
        right_map.setdefault(r[on], ([], []))
        right_map[r[on]][0].append(r[ts_col])
        right_map[r[on]][1].append(r[value_col])

    out_schema = ", ".join(f"`{n}` {t}" for n, t in left.dtypes) + f", `{value_alias}` {rtype}"

    def lookup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals: list = [None] * len(pdf)
            for key, grp in pdf.groupby(on, sort=False):
                entry = right_map.get(key)
                if entry is None:
                    continue
                r_ts = pd.Series(entry[0]).values  # dtype follows ts type
                l_ts = grp[ts_col].values
                idx = np.searchsorted(r_ts, l_ts, side="right") - 1
                for pos, i in zip(grp.index, idx):
                    if i >= 0:
                        vals[pdf.index.get_loc(pos)] = entry[1][i]
            out = pdf.copy()
            out[value_alias] = vals
            yield out

    return left.mapInPandas(lookup, schema=out_schema)


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


def vwap_stream(
    events: DataFrame,
    bar: str = "15 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked streaming OHLCV+VWAP bars — the SAME aggregate list as
    the batch ``operators.trading_queries.vwap_bars`` (shared via
    ``bar_aggs``), grouped on ``F.window`` so the state store can evict
    closed bars past the watermark. ``window.start`` is epoch-aligned
    exactly like the batch form's floor(epoch/900)*900 bucket, so the
    emitted ``bar_start`` values are identical."""
    from ..operators.trading_queries import bar_aggs, bar_prep

    return (
        bar_prep(events)
        .withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", bar))
        .agg(*bar_aggs())
        .select(
            "event_type",
            F.unix_timestamp(F.col("window.start")).cast("long").alias(
                "bar_start"
            ),
            "open", "high", "low", "close", "volume", "n_trades", "vwap",
        )
    )
