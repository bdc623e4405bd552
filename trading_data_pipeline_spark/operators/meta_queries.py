"""Declared queries for the meta/incremental-state operators
(SURVEY.md §2.d rows 21-25). The full MetaProcess protocol (file round-trip,
sentinel, schema guard, first-run) is unit-tested in tests/test_meta.py;
these queries declare the relational shape of each step with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register

SPINE_START = "2024-01-01"
SPINE_END = "2024-02-15"


@register(
    "q_date_spine",
    f"""
    SELECT CAST(unnest(generate_series(DATE '{SPINE_START}',
                                       DATE '{SPINE_END}',
                                       INTERVAL 1 DAY)) AS DATE) AS d
    """,
    doc="Date-spine generation (ref meta_process.py:77-87) via "
    "sequence()+explode — fully distributed, no driver loop needed at scale",
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        f"SELECT explode(sequence(to_date('{SPINE_START}'), "
        f"to_date('{SPINE_END}'), interval 1 day)) AS d"
    )


@register(
    "q_anti_join_dates",
    f"""
    WITH spine AS (
      SELECT CAST(unnest(generate_series(DATE '{SPINE_START}',
                                         DATE '{SPINE_END}',
                                         INTERVAL 1 DAY)) AS DATE) AS d
    )
    SELECT d AS missing_date FROM spine s
    WHERE NOT EXISTS (SELECT 1 FROM events e WHERE CAST(e.ts AS DATE) = s.d)
    """,
    doc="Missing-work detection: spine anti-join processed dates "
    "(ref meta_process.py:88-107) — dates in the spine with no events",
)
def q_anti_join_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = spark.sql(
        f"SELECT explode(sequence(to_date('{SPINE_START}'), "
        f"to_date('{SPINE_END}'), interval 1 day)) AS missing_date"
    )
    processed = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("missing_date"))
        .distinct()
    )
    return spine.join(processed, "missing_date", "left_anti")


@register(
    "q_lit_frame",
    """
    SELECT * FROM (VALUES
      ('2024-01-05', '2026-08-13 00:00:00'),
      ('2024-01-06', '2026-08-13 00:00:00'),
      ('2024-01-07', '2026-08-13 00:00:00'))
      AS t(source_date, datetime_of_processing)
    """,
    doc="Literal-list frame + constant column — new meta rows "
    "(ref meta_process.py:31-43)",
)
def q_lit_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    dates = ["2024-01-05", "2024-01-06", "2024-01-07"]
    return spark.createDataFrame(
        [(d,) for d in dates], "source_date string"
    ).withColumn("datetime_of_processing", F.lit("2026-08-13 00:00:00"))


@register(
    "q_checked_union",
    """
    SELECT * FROM (VALUES
      ('2024-01-01', '2026-08-01 00:00:00'),
      ('2024-01-02', '2026-08-01 00:00:00'))
      AS t(source_date, datetime_of_processing)
    UNION ALL
    SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS source_date,
           '2026-08-13 00:00:00' AS datetime_of_processing
    FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-04'
    """,
    doc="Schema-checked append: old meta UNION new rows "
    "(ref meta_process.py:44-58); the column-multiset guard raising "
    "WrongMetaFileException is unit-tested in tests/test_meta.py",
)
def q_checked_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    old = spark.createDataFrame(
        [
            ("2024-01-01", "2026-08-01 00:00:00"),
            ("2024-01-02", "2026-08-01 00:00:00"),
        ],
        "source_date string, datetime_of_processing string",
    )
    new = (
        load(spark, sf_dir, "events")
        .filter(F.to_date("ts") <= F.lit("2024-01-04"))
        .select(F.date_format("ts", "yyyy-MM-dd").alias("source_date"))
        .distinct()
        .withColumn("datetime_of_processing", F.lit("2026-08-13 00:00:00"))
    )
    # the guard (sorted(old.columns) == sorted(new.columns)) lives in
    # meta.update_meta_file; both sides here share META_SCHEMA by construction
    return old.unionByName(new)
