"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where ``F.window`` / ``F.session_window`` cover declarative event-time
aggregation (streaming/jobs.py), these operators hold EXPLICIT per-key
state across micro-batches — the escape hatch for semantics Spark's
built-in stateful operators can't express (running per-entity aggregates
emitted every batch, custom timeout policies, state machines).

Scale notes: state lives in the state store partitioned by the grouping
key — the same hash partitioning as any shuffle, so a 1000-executor
cluster holds 1/1000th of the keys per executor. State rows here are a
handful of scalars per key (bounded), and timeouts (`GroupStateTimeout`)
are how unbounded key spaces get evicted in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
RUNNING_TOTALS_STATE = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained as explicit state;
    emits the updated totals for every user seen in each micro-batch.

    Equivalent batch query: ``groupBy(user_id).agg(count, sum)`` — the
    streaming form never recomputes history, it folds each batch into
    O(1) state per key. Use outputMode('update').
    """

    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
