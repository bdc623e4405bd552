"""Custom Python data source (the PySpark 4 ``pyspark.sql.datasource``
API): a deterministic synthetic-events generator exposed as a real
``spark.read.format(...)`` source.

Why it exists here: the engine's scan surface shouldn't end at files —
production lakes also read from services, queues, and generators, and
Spark 4's Python DataSource API is the sanctioned way to bring those in
WITHOUT a JVM connector. This source demonstrates the full contract:
schema declaration, option handling, partition planning (each partition
generates its slice independently — embarrassingly parallel, no driver
materialization), and per-partition iteration.

Determinism contract: row ``i`` is a pure function of ``i`` (Knuth
multiplicative hashing — exact in int64, and reproducible in plain SQL,
which is what lets the registered query be ORACLE-CHECKED against DuckDB
``generate_series`` rather than rows-only). Re-reads, retried tasks, and
different partition counts all yield the same table.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Knuth multiplicative constants — small enough that i * A stays in int64
# for any row count this source will see (A * 2^40 < 2^63).
USER_MULT = 2654435761
VALUE_MULT = 48271
N_USERS = 1000
VALUE_MOD = 100_000
EVENT_TYPES = ("click", "purchase", "signup", "view")


def row_at(i: int) -> tuple[int, int, str, float]:
    """The shared row formula (used by the reader AND tests)."""
    user = (i * USER_MULT) % N_USERS
    val = ((i * VALUE_MULT) % VALUE_MOD) / 100.0
    etype = EVENT_TYPES[i % len(EVENT_TYPES)]
    return i, user, etype, val


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        if self.rows <= 0:  # empty source: zero partitions, not range(0,0,0)
            return []
        per = -(-self.rows // self.parts)  # ceil
        return [
            _Slice(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Slice | None):
        # Spark still schedules one task with partition=None when
        # partitions() returns [] — that task must yield nothing
        if partition is None:
            return
        for i in range(partition.start, partition.end):
            yield row_at(i)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", n).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


def register_python_source(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming form of the same generator (Spark 4
    ``simpleStreamReader`` contract): the offset is the next row index,
    each micro-batch emits the next ``rows_per_batch`` rows, and
    ``readBetweenOffsets`` regenerates any committed range bit-identically
    (row ``i`` is a pure function of ``i``) — which is exactly the
    replayability Structured Streaming needs from a source for
    end-to-end exactly-once.
    """

    def __init__(self, options: dict):
        self.per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = lo + self.per_batch
        return iter([row_at(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([row_at(i) for i in range(int(start["i"]), int(end["i"]))])
