"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``trading_data_pipeline_spark.registry`` — every operator
from SURVEY.md §2 registers a (query, oracle_sql) pair there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trading_data_pipeline_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship report1 OHLC query on /root/testdata/sf0.001 (rows > 0)."""
    from trading_data_pipeline_spark.operators.report1 import report1_events
    from trading_data_pipeline_spark.registry import load

    # registry.load handles the TIMESTAMP(NANOS) parquet the driver generates
    return report1_events(load(spark, "/root/testdata/sf0.001", "events"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
