"""Query registry: every declared operator from SURVEY.md §2 with its
DuckDB oracle SQL. ``__spark_entry__.py`` is a thin shim over this module.

Contract (driver): each query callable takes ``(spark, sf_dir)`` and returns
a DataFrame; the oracle SQL runs on DuckDB with views ``region nation
customer supplier part orders lineitem events documents embeddings``
pre-registered over the same parquet. Column names are aliased identically
on both sides; float outputs are rounded on both sides so value-hashes are
stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# The driver's parquet stores TIMESTAMP(NANOS) which Spark's vectorized
# reader rejects; read them as raw nanos (legacy conf) and convert to
# TimestampType (micros) at the scan boundary. DuckDB reads the same files
# as TIMESTAMP_NS — second/date-level derivations agree on both engines.
_TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (TESTDATA.md)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for c in _TS_COLS.get(name, []):
        if c in df.columns and isinstance(df.schema[c].dataType, LongType):
            # integer div (not /1000.0): float division loses sub-µs exactness
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn
    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import operator modules for their registration side effects.
    from .operators import (  # noqa: F401
        asof_queries,
        dedup_queries,
        io_queries,
        meta_queries,
        multimodal_queries,
        quality_queries,
        rangejoin_queries,
        relational_queries,
        relational_queries2,
        relational_queries3,
        relational_queries4,
        relational_queries5,
        report1_queries,
        similarity_queries,
        text_queries,
        window_queries,
    )

    return dict(_REGISTRY)
