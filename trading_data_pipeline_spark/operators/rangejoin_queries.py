"""Declared range-join query: price-band classification of orders via the
bucketed interval join (operators/rangejoin.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register
from .rangejoin import range_join_bucketed

# (band, lo, hi) — half-open [lo, hi); covers o_totalprice's full range
PRICE_BANDS = [
    ("xs", 0.0, 50_000.0),
    ("s", 50_000.0, 150_000.0),
    ("m", 150_000.0, 300_000.0),
    ("l", 300_000.0, 450_000.0),
    ("xl", 450_000.0, 1_000_000.0),
]


@register(
    "q_range_join",
    f"""
    WITH bands(band, lo, hi) AS (VALUES
      {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)})
    SELECT o.o_orderkey, b.band, round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    """,
    doc="Range (interval) join orders→price bands via bucketization: "
    "floor(value/width) equi-key + interval replication + exact residual "
    "filter — hash join instead of the nested-loop a naive range "
    "predicate forces; the pattern that scales to non-broadcastable "
    "interval tables",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    joined = range_join_bucketed(
        orders, bands, value_col="o_totalprice", lo_col="lo", hi_col="hi",
        bucket_width=50_000.0,
    )
    return joined.select(
        "o_orderkey", "band", F.round("o_totalprice", 2).alias("o_totalprice")
    )


# ------------------------------------------- interval × interval overlap

from .profiling_queries import SESSION_GAP_MIN as IVL_GAP_MIN  # one gap rule

IVL_VALUE_MIN = 15.0  # "high-value" activity cutoff for window cells
IVL_ACT_MIN = 2       # events per (type, hour) cell to call it active
IVL_CELL_S = 3600     # grid cell = 1 hour


def interval_overlap_join(events: DataFrame) -> DataFrame:
    """Interval×interval OVERLAP join, grid-decomposed: per-user gap
    sessions [s0, s1] (closed, epoch seconds) joined to per-type hourly
    activity windows, reporting per type the overlapping pair count and
    total overlapping seconds.

    The scale mechanism is the time-grid decomposition: a session
    explodes into the hour cells it covers and windows live in exactly
    one cell, so the overlap join becomes an EQUI-join on the cell id —
    never a nested-loop inequality join (the plan contract). A session
    covers cell h iff [s0,s1] intersects [h·3600, h·3600+3599], so for
    single-cell windows cell equality IS the closed-interval overlap
    predicate; multi-cell windows would add a distinct on the pair key.
    The oracle is the naive inequality join — identical pairs prove the
    decomposition exact.
    """
    from .profiling_queries import session_assignments

    sess = (
        session_assignments(events)
        .groupBy("user_id", "session_id")
        .agg(F.min("es").alias("s0"), F.max("es").alias("s1"))
    )
    cells = sess.select(
        "user_id",
        "s0",
        "s1",
        F.explode(
            F.sequence(
                F.floor(F.col("s0") / IVL_CELL_S),
                F.floor(F.col("s1") / IVL_CELL_S),
            )
        ).alias("cell"),
    )
    windows = (
        events.filter(F.col("value") > IVL_VALUE_MIN)
        .groupBy(
            "event_type", F.floor(F.unix_timestamp("ts") / IVL_CELL_S).alias("cell")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= IVL_ACT_MIN)
        .select("event_type", "cell")
    )
    w0 = F.col("cell") * IVL_CELL_S
    w1 = w0 + (IVL_CELL_S - 1)
    return (
        cells.join(windows, "cell")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.least(F.col("s1"), w1) - F.greatest(F.col("s0"), w0) + 1
            ).alias("overlap_s"),
        )
    )


@register(
    "q_interval_join",
    f"""
    WITH flags AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR datediff('microsecond', lag(ts) OVER w, ts)
                          >= {IVL_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS sid
      FROM flags
    ), s AS (
      SELECT user_id, sid,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS s0,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS s1
      FROM sess GROUP BY 1, 2
    ), w AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / {IVL_CELL_S}) AS BIGINT) AS cell
      FROM events WHERE value > {IVL_VALUE_MIN}
      GROUP BY 1, 2 HAVING count(*) >= {IVL_ACT_MIN}
    )
    SELECT w.event_type,
           count(*) AS n_pairs,
           CAST(sum(least(s.s1, w.cell * {IVL_CELL_S} + {IVL_CELL_S - 1})
                    - greatest(s.s0, w.cell * {IVL_CELL_S}) + 1)
                AS BIGINT) AS overlap_s
    FROM s JOIN w
      ON s.s0 <= w.cell * {IVL_CELL_S} + {IVL_CELL_S - 1}
     AND w.cell * {IVL_CELL_S} <= s.s1
    GROUP BY 1
    """,
    doc="Interval×interval overlap join (user gap-sessions × per-type "
    "hourly activity windows) via time-grid decomposition: sessions "
    "explode to covered hour cells, windows live in one cell, and the "
    "overlap becomes an EQUI-join on the cell id — no nested-loop "
    "inequality join at any scale (plan contract). The oracle is the "
    "naive inequality join: identical per-type pair counts and overlap "
    "seconds prove the decomposition exact; all arithmetic is integer "
    "epoch seconds",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interval_overlap_join(load(spark, sf_dir, "events"))
