"""Relational coverage, batch 3: heavier TPC-H shapes (Q10 returned-item
revenue, Q18 large-order HAVING + join-back) and time-based window frames
(RANGE BETWEEN INTERVAL, lead/nth_value).

Determinism: ranking orders carry unique tie-breaks; time-range frames are
tie-safe by construction (the frame is defined by the ORDER BY value, not
row position); money sums accumulate in DECIMAL where rounding sits on an
engine-dependent .xx5 boundary (see relational_queries2.q_window_running).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import load, register


@register(
    "q_tpch_q10",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item revenue: fact-side filter → three joins "
    "(nation broadcast; customer unhinted — it grows with the data, "
    "AQE decides) → agg → top-20 without a global sort",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_tpch_q18",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, o.o_orderkey,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN big      ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 large-volume orders: HAVING aggregate → semi-style "
    "join-back into the fact table → re-aggregate; the 'big' set is tiny "
    "after the HAVING (a vanishing fraction of orders at TPC-H "
    "selectivity) so its join side is hinted broadcast; if the corpus "
    "breaks that assumption, drop the hint and AQE falls back to a "
    "shuffle join",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        l.join(F.broadcast(big), "l_orderkey")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q_window_range_time",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing30d_sum,
           count(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
             AS trailing30d_events
    FROM events
    """,
    doc="Time-based window frame (RANGE BETWEEN INTERVAL 30 DAYS): per-user "
    "trailing sum/count — frame bounds come from the timestamp value, so "
    "ties are frame-equivalent and no tie-break is needed. Spark orders by "
    "unix_micros with µs bounds so boundary membership is bit-identical to "
    "the oracle's interval arithmetic (events are µs-aligned); a cast to "
    "whole seconds would silently shift the frame edge. DECIMAL "
    "accumulation keeps the double cast exact. ts is cast to TIMESTAMP "
    "first: parquet micros without isAdjustedToUTC arrive as "
    "TIMESTAMP_NTZ, which unix_micros rejects — the cast is a no-op for "
    "LTZ input and a constant session-tz shift for NTZ, which cancels in "
    "relative range-frame membership",
)
def q_window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-30 * 86_400 * 1_000_000, 0)
    )
    dec = F.col("value").cast("decimal(18,2)")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec).over(w).cast("double").alias("trailing30d_sum"),
        F.count(F.lit(1)).over(w).alias("trailing30d_events"),
    )


@register(
    "q_lead_nth",
    """
    SELECT o_custkey, o_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           round(nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS second_order_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    """,
    doc="lead + nth_value per customer order history (unique tie-break on "
    "orderkey; nth_value needs the full-partition frame — the default "
    "running frame would return NULL until row 2)",
)
def q_lead_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    order_cols = [F.to_date("o_orderdate"), F.col("o_orderkey")]
    w = Window.partitionBy("o_custkey").orderBy(*order_cols)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.round(F.nth_value("o_totalprice", 2).over(full), 2).alias(
            "second_order_price"
        ),
    )


@register(
    "q_histogram",
    """
    SELECT CAST(floor(o_totalprice / 25000) + 1 AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY bucket
    """,
    doc="Value histogram via width_bucket (oracle: the equivalent "
    "floor-division — DuckDB lacks width_bucket; in-range data makes the "
    "two identical): single hash aggregation on the bucket id — the "
    "scalable histogram (vs sort-based quantiles)",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(500_000), F.lit(20)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )
