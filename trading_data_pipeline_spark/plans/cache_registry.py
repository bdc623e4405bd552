"""Session-scoped named cache slots: a deterministic lifecycle for
persisted intermediates that must outlive the function that built them.

Several operators persist a mid-plan table because the lazy result frame
branches over it more than once (e.g. :func:`~..operators.dedup
.containment_pairs`'s shingle table feeds the inverted index and both
verify sides). The frame they return is lazy, so the function cannot
``unpersist`` before returning — but a bare ``persist()`` with no owner
leaks one pinned table per call: a session running many passes
accumulates dead blocks until LRU eviction (the round-8 verdict's
ADVICE #5).

``persist_slot(df, "name")`` bounds that to ONE generation per (session,
slot): persisting into a slot first unpersists whatever the slot held.
Correctness is unaffected either way — ``persist`` keeps lineage, so a
stale result frame whose blocks were released simply recomputes its
(shallow) lineage instead of failing. Sessions are held weakly; a
stopped session drops its slots with it.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

_REGISTRY: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def persist_slot(df: DataFrame, slot: str, level=None) -> DataFrame:
    """Persist ``df`` (default MEMORY_AND_DISK) under the named slot of
    its session, releasing the slot's previous occupant first. Returns
    the persisted ``df``. At most one generation per (session, slot)
    stays pinned, however many passes the session runs.

    ``level`` overrides the storage level — pass
    ``StorageLevel.DISK_ONLY`` for wide-payload tables (e.g. per-doc
    string token arrays) whose on-heap unroll across all concurrent
    tasks would break the default-heap memory contract; DISK_ONLY
    stores serialized blocks straight to local disk with no unroll
    buffer."""
    slots = _REGISTRY.setdefault(df.sparkSession, {})
    prev = slots.get(slot)
    if prev is not None:
        prev.unpersist(blocking=False)
    slots[slot] = df.persist() if level is None else df.persist(level)
    return df


def release_slot(spark: SparkSession, slot: str | None = None) -> None:
    """Explicitly release one named slot (or, with ``slot=None``, every
    slot) of ``spark``. Idempotent; unknown slots are a no-op."""
    slots = _REGISTRY.get(spark)
    if not slots:
        return
    names = [slot] if slot is not None else list(slots)
    for name in names:
        df = slots.pop(name, None)
        if df is not None:
            df.unpersist(blocking=False)
