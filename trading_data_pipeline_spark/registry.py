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


# The driver's correctness harness checks the FIRST 50 entries of
# ``queries()``.  Insertion order therefore decides which operators get a
# driver-verified row each round.  This list pins the SURVEY.md §2
# component-mapped queries (flagship report1 pipeline + its micro-queries,
# event-time windows, io/meta protocol, dedup family, similarity, text,
# multimodal, curation, as-of) into that window; everything not listed
# follows in module-registration order and is still covered by the local
# oracle harness (``tools/parity.py``) and pytest.
# Round-4 window: the 47 queries never driver-verified in rounds 1-3
# (VERDICT.md r3 item 1) + two flagship canaries (q_report1, q_dedup_near —
# keep one green row per round for the headline pipeline and the near-dup
# path) + the new q_curation_full. Every name outside this window already
# has a green driver row from r1/r2/r3; after this round every query
# registered before round 4 has driver evidence (round-4 additions like
# q_ann_batch queue for the next rotation).
_PRIORITY: tuple[str, ...] = (
    # flagship canaries (driver-green r3; continuity across windows)
    "q_report1", "q_dedup_near",
    # TPC-H suite — never in a driver window before round 4
    "q_tpch_q3", "q_tpch_q4", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7",
    "q_tpch_q8", "q_tpch_q9", "q_tpch_q10", "q_tpch_q13", "q_tpch_q14",
    "q_tpch_q15", "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q22",
    # global ranking / window variants
    "q_ntile", "q_window_cume", "q_window_range_time", "q_lead_nth",
    # subqueries
    "q_exists_subquery", "q_scalar_subquery",
    # stats / aggregation families
    "q_median", "q_regr", "q_stats_agg", "q_histogram",
    "q_conditional_agg", "q_bitwise_agg", "q_argminmax", "q_collect_sorted",
    # array / map / string / date / null families
    "q_array_funcs", "q_map_funcs", "q_regex_funcs", "q_date_trunc",
    "q_string_pad", "q_null_funcs", "q_try_arith",
    # set ops / joins
    "q_union_distinct", "q_cross_join", "q_join_outer", "q_unpivot",
    # vectors / text extensions
    "q_vector_stats", "q_tfidf",
    # LLM-curation scale ops (split-leakage now joins on the 8-byte
    # fingerprint; curation_full composes near-dup clustering E2E)
    "q_heavy_hitters", "q_split_leakage", "q_dedup_clusters",
    "q_curation_full",
    # ANN (rows-only by design)
    "q_ann_lsh", "q_ann_ivf",
)


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
        relational_queries6,
        report1_queries,
        similarity_queries,
        text_queries,
        window_queries,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
