"""Declared queries for the report1 pipeline and its component operators
(SURVEY.md §2.b rows 9-15, §2.c rows 16-20), adapted to the driver's
synthetic tables. Reference citations in operators/report1.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import load, register
from .report1 import REPORT1_EVENTS_ORACLE, report1_events

# -- the window frame shared by first/last (ref xetra_transformer.py:148-163)
def _ohlc_frame():
    return (
        Window.partitionBy("user_id", "date")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )


@register(
    "q_report1",
    REPORT1_EVENTS_ORACLE,
    doc="Flagship OHLC report (ref xetra_transformer.py:127-208) on events",
)
def q_report1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return report1_events(load(spark, sf_dir, "events"))


@register(
    "q_project",
    "SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice FROM lineitem",
    doc="Column projection (ref xetra_transformer.py:144-145)",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit select → Catalyst pushes ReadSchema down to the parquet scan.
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@register(
    "q_dropna",
    "SELECT event_id, value AS big_value FROM events WHERE value > 100",
    doc="Drop-any-null filter (ref xetra_transformer.py:146-147)",
)
def q_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Synthesize nulls (testdata has none), then na.drop('any') — same
    # semantics as pandas dropna() in the reference.
    df = load(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") > 100, F.col("value")).alias("big_value"),
    )
    return df.na.drop("any")


@register(
    "q_rename",
    "SELECT c_custkey AS customer_id, c_name AS customer_name, "
    "c_acctbal AS account_balance FROM customer",
    doc="Column rename (ref xetra_transformer.py:164-172)",
)
def q_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .withColumnsRenamed(
            {
                "c_custkey": "customer_id",
                "c_name": "customer_name",
                "c_acctbal": "account_balance",
            }
        )
    )


@register(
    "q_round",
    "SELECT o_orderkey, round(o_totalprice / 7, 2) AS price_per_week FROM orders",
    doc="round(2) on computed numeric columns (ref xetra_transformer.py:201-202)",
)
def q_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") / 7, 2).alias("price_per_week"),
    )


@register(
    "q_filter_date",
    "SELECT event_id, user_id, CAST(ts AS DATE) AS date FROM events "
    "WHERE CAST(ts AS DATE) >= DATE '2024-01-10'",
    doc="Date-predicate cutoff (ref xetra_transformer.py:203-206)",
)
def q_filter_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("date")
    )
    return df.filter(F.col("date") >= F.lit("2024-01-10"))


@register(
    "q_window_first",
    """
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS date,
           round(first_value(value) OVER (
             PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
           AS opening_price
    FROM events
    """,
    doc="Windowed FIRST_VALUE opening price (ref xetra_transformer.py:148-155)",
)
def q_window_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
    return df.select(
        "user_id",
        "date",
        F.round(F.first("value").over(_ohlc_frame()), 2).alias("opening_price"),
    ).distinct()


@register(
    "q_window_last",
    """
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS date,
           round(last_value(value) OVER (
             PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
           AS closing_price
    FROM events
    """,
    doc="Windowed LAST_VALUE closing price (ref xetra_transformer.py:156-163) — "
    "the explicit unbounded-following frame is what makes this a group-last "
    "rather than a running-last",
)
def q_window_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
    return df.select(
        "user_id",
        "date",
        F.round(F.last("value").over(_ohlc_frame()), 2).alias("closing_price"),
    ).distinct()


@register(
    "q_groupby_agg",
    """
    SELECT user_id, CAST(ts AS DATE) AS date,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           count(*) AS n_events
    FROM events GROUP BY user_id, CAST(ts AS DATE)
    """,
    doc="Hash group-by multi-agg (ref xetra_transformer.py:173-185); Spark "
    "does partial (map-side) + final aggregation automatically",
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("date"))
        .agg(
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "q_window_lag",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS date,
             floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) * 10000 + 0.5) / 10000 AS avg_value
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT user_id, date, avg_value,
           floor((avg_value - lag(avg_value) OVER w) / lag(avg_value) OVER w
                 * 100 * 100 + 0.5) / 100 AS change_pct
    FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY date)
    """,
    doc="LAG + pct-change arithmetic (ref xetra_transformer.py:186-200). "
    "Two cross-engine determinism measures, both proven necessary by the "
    "sf0.1 parity sweep: (1) the daily mean sums DECIMAL-cast values "
    "(exact, fold-order-free — a plain double avg() differs by 1 ulp on "
    "~1e-4 of groups depending on partition fold order, i.e. "
    "nondeterministic BETWEEN RUNS at cluster scale; values carry <=6 "
    "decimals so the cast is lossless); (2) quantization is "
    "floor(x*s+0.5)/s — pure IEEE ops, bit-identical on every engine — "
    "because engine round(double) disagrees exactly at representation "
    "boundaries (Java rounds the shortest decimal repr, C rounds the "
    "binary value: round(8666.675) differs)",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("date"))
        .agg(
            (
                F.floor(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("avg_value")
        )
    )
    w = Window.partitionBy("user_id").orderBy("date")
    prev = F.lag("avg_value").over(w)
    return daily.select(
        "user_id",
        "date",
        "avg_value",
        F.when(
            prev != 0,
            F.floor((F.col("avg_value") - prev) / prev * 100 * 100 + 0.5) / 100,
        ).alias("change_pct"),
    )
