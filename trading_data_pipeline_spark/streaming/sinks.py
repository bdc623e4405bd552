"""Streaming sinks: checkpointed partitioned parquet, and a foreachBatch
bridge into the engine's incremental meta protocol.

The reference's incrementality is pull-based (meta file says which dates
to extract — meta_process.py:61-125). Structured Streaming inverts that:
the checkpoint owns exactly-once progress, and the meta file becomes a
downstream artifact other (batch) consumers can keep reading. The
``foreachBatch`` sink writes each micro-batch partitioned by date and
appends the batch's dates to the same meta file the batch ETL uses — so
batch and streaming ingestion are interchangeable behind one protocol.

Scale: partitioned append parquet + checkpointing is the standard
streaming lakehouse layout; one directory per event date keeps partition
pruning effective for every downstream batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.connector import FileSystemConnector


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Plain checkpointed parquet sink (append mode)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_with_meta(
    events: DataFrame,
    connector: FileSystemConnector,
    data_key: str,
    meta_key: str,
    checkpoint: str,
    ts_col: str = "ts",
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """foreachBatch sink: date-partitioned parquet append + meta-file update.

    Each micro-batch appends under ``data_key/date=YYYY-MM-DD/`` and
    records its distinct event dates in the meta file — the exact state
    the batch ETL's ``return_date_list`` consumes, so a batch job can take
    over (or audit) the stream at any point.
    """
    with_date = events.withColumn("date", F.to_date(F.col(ts_col)))
    sink = make_meta_sink(connector, data_key, meta_key)

    writer = (
        with_date.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_meta_sink(
    connector: FileSystemConnector, data_key: str, meta_key: str
):
    """Build the foreachBatch sink function. REPLAY-IDEMPOTENT: foreachBatch
    is at-least-once (a crash between a batch's write and the checkpoint
    commit re-runs the batch), so a plain parquet append would duplicate
    the replayed batch's rows. Each batch therefore writes under its own
    ``_batch_id`` partition with DYNAMIC partition overwrite: a replay
    overwrites exactly its own partitions and nothing else — idempotent
    without a transaction log, and downstream date pruning still works
    (``date`` stays the leading partition column). The meta update was
    already idempotent (only never-seen dates are appended).

    LAYOUT NOTE: ``_batch_id`` is an idempotency implementation detail,
    not part of the logical schema — batch consumers should read the lake
    through :func:`read_stream_table`, which hides it. Lakes written by
    the older plain-append sink (no ``_batch_id`` directories) read
    through the same helper unchanged; to migrate such a lake in place,
    rewrite it once under ``_batch_id=-1`` (any constant), after which
    replayed and historical data share one layout."""
    from ..meta import update_meta_file

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cached = batch_df.withColumn("_batch_id", F.lit(batch_id)).persist()
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            connector.write(cached, data_key, "parquet", mode="overwrite",
                            partition_by=["date", "_batch_id"])
            dates = sorted(
                r.date.isoformat() for r in cached.select("date").distinct().collect()
            )
            existing = _meta_dates(connector, meta_key)
            new_dates = [d for d in dates if d not in existing]
            if new_dates:
                update_meta_file(connector, meta_key, new_dates)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
            cached.unpersist()

    return sink


def read_stream_table(spark, path: str) -> DataFrame:
    """Batch view over a lake written by :func:`make_meta_sink`.

    Drops the ``_batch_id`` idempotency partition column so downstream
    batch consumers see the logical schema only (``date`` remains, and
    date-filter partition pruning still applies — ``_batch_id`` is a
    sub-partition of ``date``). Also reads pre-``_batch_id`` lakes (the
    column simply isn't present to drop)."""
    df = spark.read.parquet(path)
    if "_batch_id" in df.columns:
        df = df.drop("_batch_id")
    return df


def _meta_dates(connector: FileSystemConnector, meta_key: str) -> set[str]:
    from ..meta import _read_meta

    meta = _read_meta(connector, meta_key)
    if meta is None:
        return set()
    return {r[0] for r in meta.select("source_date").collect()}
