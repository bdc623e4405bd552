"""Registered queries for the scale-path maintenance shapes a 100 TB
lake needs: the salted skew join (implementation in plans/skew.py —
this module exposes it on the driver's correctness surface) and log-free
MERGE (SCD1 upsert).

Both produce results identical to their unsalted/plain-SQL equivalents
(that IS the oracle), so correctness is checked exactly; what the salt or
the anti-join buys is plan shape, asserted in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.skew import salted_join
from ..registry import load, register


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """SCD-type-1 MERGE without a transaction log: rows in ``updates``
    replace same-key rows in ``target``; all other target rows survive.

    ``updates ∪ (target ⟕anti updates)`` — one shuffle on the key for the
    anti join (broadcast when updates is small, which is the common
    incremental-refresh case; AQE decides). Rewriting only affected
    partitions (partition-pruned read + dynamic overwrite) is the
    connector-level half, provided by sources/connector.write(
    partition_by=...) + dynamic partitionOverwriteMode, same pattern the
    streaming meta sink uses for idempotent replay."""
    cols = target.columns
    assert updates.columns == cols, "MERGE requires identical schemas"
    survivors = target.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates).select(*cols)


@register(
    "q_salted_join",
    """
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                      AS DOUBLE) * 100 + 0.5) / 100 AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Salted fact⋈fact join: the lineitem side carries a deterministic "
    "per-row salt, orders is exploded n_salt×, and the join key becomes "
    "(orderkey, salt) — a heavy-hitter orderkey that would pin one task "
    "now spreads across n_salt tasks. The oracle is the UNSALTED join "
    "(salting must not change the result set, only the partition "
    "histogram); the salt's presence in the join keys is asserted in "
    "tests/test_plans.py. DECIMAL-exact revenue so the aggregate is "
    "fold-order-free",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = li.withColumnRenamed("l_orderkey", "o_orderkey")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    joined = salted_join(li, o, ["o_orderkey"], salt=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.floor(F.sum(rev).cast("double") * 100 + 0.5) / 100).alias("revenue"),
        )
    )


@register(
    "q_upsert_merge",
    """
    WITH updates AS (
      SELECT doc_id, text || ' [v2]' AS text, lang, source, n_chars
      FROM documents WHERE source = 'src0'
    )
    SELECT doc_id, length(text) AS n_chars_now,
           CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS was_updated
    FROM (
      SELECT * FROM updates
      UNION ALL
      SELECT d.* FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.doc_id = d.doc_id)
    )
    """,
    doc="Log-free MERGE (SCD1 upsert): an updates batch (src0 docs with "
    "rewritten text) replaces same-key rows, everything else survives — "
    "updates ∪ (target anti-join updates), one key shuffle, broadcast "
    "when the incremental batch is small. Combined with the partitioned "
    "connector sink + dynamic partition overwrite this is the Delta-less "
    "incremental refresh path for a 100 TB document lake",
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    updates = docs.filter(F.col("source") == "src0").withColumn(
        "text", F.concat("text", F.lit(" [v2]"))
    )
    merged = merge_upsert(docs, updates, "doc_id")
    return merged.select(
        "doc_id",
        F.length("text").alias("n_chars_now"),
        F.when(F.col("source") == "src0", 1).otherwise(0).alias("was_updated"),
    )


def _ZSQL() -> str:
    from ..plans.zorder import morton_sql

    return morton_sql(
        "(user_id % 65536)",
        "(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 65536)",
    )


@register(
    "q_zorder_stats",
    None,  # oracle injected below (needs the generated morton SQL text)
    doc="Z-order (Morton) clustering audit: interleave user_id and "
    "event-day bits, bucket the curve into 8x8 (user, day) rectangles, and report "
    "each segment's user/day bounding rectangle — the per-file min/max "
    "a z-ordered writer would give parquet zone maps, bounded in BOTH "
    "dimensions (a single-column sort bounds only one). The oracle runs "
    "the identical spread-and-interleave formula (pure integer "
    "shifts/masks, bit-exact on any engine; plans/zorder.py keeps the "
    "two in lockstep). Writer-side recipe: plans/zorder.zorder_layout "
    "(range-partition on the key + sort within partitions), locality "
    "asserted in tests/test_scale_tools.py",
)
def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.zorder import morton_key

    ev = load(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01")))
    zkey = morton_key(F.col("user_id") % 65536, day % 65536)
    return (
        ev.select(
            F.shiftright(zkey, 6).alias("z_bucket"),
            "user_id",
            day.alias("day"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
    )


# the morton oracle SQL is generated from the same formula constants as
# the Spark expression — register it after the fact
from ..registry import _REGISTRY as _R  # noqa: E402
from dataclasses import replace as _replace  # noqa: E402

_R["q_zorder_stats"] = _replace(
    _R["q_zorder_stats"],
    oracle=f"""
    SELECT ({_ZSQL()} >> 6) AS z_bucket,
           count(*) AS n_events,
           min(user_id) AS min_user,
           max(user_id) AS max_user,
           min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
             AS min_day,
           max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
             AS max_day
    FROM events
    GROUP BY 1
    """,
)


SCD2_T1 = "2024-01-01"  # initial-load effective date
SCD2_T2 = "2024-06-01"  # update-batch effective date


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    effective: str,
    tracked: list[str] | None = None,
) -> DataFrame:
    """SCD-type-2 MERGE: apply an update batch to a versioned history
    table (``valid_from``/``valid_to``/``is_current``), keeping full
    change history instead of overwriting (the type-1 form above).

    ``updates`` must carry the key and EVERY attribute column of the
    history (everything except the three SCD columns) — new versions are
    built from the update rows, so untracked attributes are carried from
    the batch too. ``tracked`` (default: all attributes) is only the
    change-detection subset.

    Semantics: for every update key present in the current snapshot, the
    current row is CLOSED (``valid_to = effective``, ``is_current =
    false``) and a new current version opens at ``effective``; update
    keys never seen before simply open. Rows whose tracked attributes are
    unchanged are left untouched (no-op updates produce no version
    churn).

    Plan shape: ONE equi-join of the current slice against the updates on
    the key (closed history passes through untouched), then a unionByName
    — the same single-key-shuffle budget as ``merge_upsert``, so the
    incremental batch stays broadcastable. History never rewrites closed
    rows: combined with a ``valid_from``-partitioned sink, each apply
    touches only current partitions.
    """
    scd_cols = ("valid_from", "valid_to", "is_current")
    attrs = [c for c in history.columns if c != key and c not in scd_cols]
    missing = [c for c in attrs if c not in updates.columns]
    assert not missing, f"updates must carry every attribute column; missing {missing}"
    tracked = tracked if tracked is not None else attrs
    assert tracked, "tracked must name at least one attribute"
    upd = updates.select(key, *attrs).withColumn("__upd", F.lit(1))
    closed = history.filter(~F.col("is_current"))
    curr = history.filter(F.col("is_current"))
    # changed iff any tracked attribute differs, NULL-safely (both NULL
    # is NOT a change; exactly one NULL is)
    changed_pred = None
    for c in tracked:
        diff = ~F.col(f"u.{c}").eqNullSafe(F.col(f"h.{c}"))
        changed_pred = diff if changed_pred is None else (changed_pred | diff)
    # a change requires the update row to EXIST: on unmatched left rows
    # eqNullSafe(NULL, h) would otherwise flag every non-NULL attribute
    joined = curr.alias("h").join(upd.alias("u"), on=key, how="left")
    changed = F.col("u.__upd").isNotNull() & changed_pred
    untouched = joined.filter(~changed).select("h.*")
    to_close = joined.filter(changed).select("h.*")
    closed_now = to_close.withColumn(
        "valid_to", F.lit(effective).cast("date")
    ).withColumn("is_current", F.lit(False))
    # new versions: changed keys + brand-new keys
    curr_keys = curr.select(key)
    base = upd.drop("__upd")
    new_versions = (
        base.join(to_close.select(key), key, "semi")
        .unionByName(base.join(curr_keys, key, "anti"))
        .withColumn("valid_from", F.lit(effective).cast("date"))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    out_cols = history.columns
    return (
        closed.unionByName(untouched)
        .unionByName(closed_now)
        .unionByName(new_versions.select(*out_cols))
    )


@register(
    "q_scd2_merge",
    f"""
    WITH hist AS (
      SELECT doc_id, source, n_chars,
             CAST('{SCD2_T1}' AS DATE) AS valid_from,
             CAST(NULL AS DATE) AS valid_to,
             TRUE AS is_current
      FROM documents
    ), upd AS (
      SELECT doc_id, source, n_chars + 7 AS n_chars
      FROM documents WHERE source = 'src0'
    ), to_close AS (
      SELECT h.doc_id FROM hist h JOIN upd u ON h.doc_id = u.doc_id
      WHERE h.is_current AND (u.n_chars <> h.n_chars OR u.source <> h.source)
    )
    SELECT h.doc_id, h.source, h.n_chars, h.valid_from,
           CASE WHEN c.doc_id IS NOT NULL THEN '{SCD2_T2}'
                ELSE COALESCE(CAST(h.valid_to AS VARCHAR), 'open') END
             AS valid_to,
           CASE WHEN c.doc_id IS NOT NULL THEN FALSE ELSE h.is_current END
             AS is_current
    FROM hist h LEFT JOIN to_close c ON h.doc_id = c.doc_id
    UNION ALL
    SELECT u.doc_id, u.source, u.n_chars,
           CAST('{SCD2_T2}' AS DATE), 'open', TRUE
    FROM upd u JOIN to_close c ON u.doc_id = c.doc_id
    """,
    doc="SCD-type-2 MERGE on a versioned history: src0 docs get a new "
    "n_chars at T2 — their T1 rows close (valid_to=T2, not current) and "
    "new current versions open; unchanged docs keep their open T1 row "
    "(no-op updates cause no churn). One key-shuffle join of the current "
    "slice vs the batch; closed history passes through untouched",
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    history = (
        docs.withColumn("valid_from", F.lit(SCD2_T1).cast("date"))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    updates = docs.filter(F.col("source") == "src0").withColumn(
        "n_chars", F.col("n_chars") + 7
    )
    out = scd2_apply(
        history, updates, "doc_id", SCD2_T2, tracked=["source", "n_chars"]
    )
    # NULL valid_to (the open version) as an explicit string sentinel: a
    # nullable date column hashes as NaT-vs-None across engines
    return out.withColumn(
        "valid_to", F.coalesce(F.col("valid_to").cast("string"), F.lit("open"))
    )


@register(
    "q_bloom_join",
    """
    SELECT o.o_orderpriority,
           count(*) AS n_orders,
           floor(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) * 100 + 0.5) / 100 AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderpriority
    """,
    doc="Bloom-filter runtime join pruning (plans/bloom.py): a 2 KiB "
    "bitmap over BUILDING-segment custkeys filters the orders scan "
    "BEFORE its exchange, so the shuffle carries only probable matches; "
    "the closing equi-join removes false positives. Oracle is the PLAIN "
    "join — pruning must not change the result. The pre-exchange filter "
    "position and the thinned fact side are asserted in "
    "tests/test_plans.py; DECIMAL-exact sum so the aggregate is "
    "fold-order-free",
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.bloom import bloom_pruned_join

    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    joined = bloom_pruned_join(orders, cust, "o_custkey", "c_custkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                * 100
                + 0.5
            )
            / 100
        ).alias("total_price"),
    )


PIT_TTL_DAYS = 7


@register(
    "q_pit_join",
    f"""
    WITH s AS (
      SELECT user_id, ts AS valid_from, value, event_id,
             least(lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id),
                   ts + INTERVAL {PIT_TTL_DAYS} DAY) AS valid_to
      FROM events WHERE event_type = 'signup'
    ), p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           round(p.value, 2) AS purchase_value,
           round(s.value, 2) AS profile_value
    FROM p LEFT JOIN s
      ON s.user_id = p.user_id
     AND s.valid_from <= p.ts AND p.ts < s.valid_to
    """,
    doc="Point-in-time correct feature join (the feature-store "
    "correctness op): each purchase picks up the profile VERSION valid "
    "at its timestamp — versions derive from signup events, expire "
    f"after {PIT_TTL_DAYS} days (TTL), and close when superseded, so "
    "gaps yield NULL instead of a stale or future value (no training "
    "leakage). Implemented as the one-shuffle as-of union+window with "
    "the interval end riding in the payload struct — not the oracle's "
    "interval join, which nest-loops per row at scale",
)
def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .asof import asof_join_tolerance

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", F.col("ts"), "value", F.col("event_id").alias("vid"))
        .withColumn(
            "valid_to",
            F.least(
                F.lead("ts").over(w.orderBy("ts", "vid")),
                F.col("ts") + F.expr(f"INTERVAL {PIT_TTL_DAYS} DAY"),
            ),
        )
        .select(
            "user_id",
            "ts",
            F.struct(F.col("value").alias("attr"), F.col("valid_to").alias("vt")).alias("payload"),
            "vid",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join_tolerance(
        purchases, versions, on="user_id", value_col="payload",
        value_alias="p", direction="backward", right_tiebreak="vid",
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round(
            F.when(F.col("ts") < F.col("p.vt"), F.col("p.attr")), 2
        ).alias("profile_value"),
    )


# ---------------------------------------------------------- salted aggregation

SALT_AGG_BUCKETS = 16


def salted_agg_stats(events: DataFrame, salt: int = SALT_AGG_BUCKETS) -> DataFrame:
    """Two-phase skew-safe aggregation over a hot grouping key.

    ``events.event_type`` has single-digit cardinality — at 100 TB a
    one-phase ``groupBy(event_type)`` funnels each type's final merge
    into one task, and any aggregate whose partial state is NOT tiny
    (exact distinct, collect-style states) pins that task. The salted
    shape runs phase 1 on ``(event_type, salt)`` — ``salt`` buckets per
    type, deterministic ``xxhash64(event_id) % salt`` so reruns land
    identically — and phase 2 merges the per-salt partials on the bare
    key. Exact distinct users go through the same discipline: dedup on
    ``(event_type, user_id)`` (a well-spread composite key) first, then
    count — never a count(DISTINCT) holding a per-type hash set in one
    task.

    The oracle is the UNSALTED aggregate: salting must not change any
    value, only the partition histogram. Sums accumulate in DECIMAL so
    the two-phase merge order cannot perturb a double.
    """
    v = F.col("value").cast("decimal(18,2)")
    partial = (
        events.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(salt)))
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(v).alias("_s"),
            F.min(v).alias("_mn"),
            F.max(v).alias("_mx"),
        )
    )
    users = (
        events.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    merged = partial.groupBy("event_type").agg(
        F.sum("_n").alias("n_events"),
        (F.floor(F.sum("_s").cast("double") * 100 + 0.5) / 100).alias("total"),
        (
            F.floor(
                F.sum("_s").cast("double") / F.sum("_n") * 10000 + 0.5
            )
            / 10000
        ).alias("avg_val"),
        F.min("_mn").cast("double").alias("min_val"),
        F.max("_mx").cast("double").alias("max_val"),
    )
    return merged.join(users, "event_type")


@register(
    "q_salted_agg",
    """
    SELECT event_type,
           count(*) AS n_events,
           floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5)
             / 100 AS total,
           floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                 * 10000 + 0.5) / 10000 AS avg_val,
           CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_val,
           CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_val,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="Skew-safe two-phase aggregation on a hot key: phase 1 on "
    "(event_type, xxhash64-salt), phase 2 merges per-salt partials; "
    "exact distinct users via dedup-on-composite-key-then-count instead "
    "of a one-task count(DISTINCT). Oracle is the unsalted aggregate - "
    "salting changes the partition histogram, never a value; DECIMAL "
    "sums make the merge order-free",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return salted_agg_stats(load(spark, sf_dir, "events"))
