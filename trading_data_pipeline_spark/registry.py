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
_PRIORITY: tuple[str, ...] = (
    # §2.b/§2.c flagship + micro-queries (ref xetra_transformer.py:127-208)
    "q_report1", "q_project", "q_dropna", "q_rename", "q_round",
    "q_filter_date", "q_window_first", "q_window_last", "q_groupby_agg",
    "q_window_lag",
    # event-time windows
    "q_tumbling_window", "q_session_window",
    # §2.a io (ref s3.py list/read/write)
    "q_scan_partition", "q_scan_csv", "q_sink_csv", "q_sink_parquet",
    "q_union_all",
    # §2.d meta protocol (ref meta_process.py)
    "q_date_spine", "q_anti_join_dates", "q_lit_frame", "q_checked_union",
    # as-of join
    "q_asof_join", "q_asof_pandas",
    # dedup family (q_dedup_near is rows-only by design: no SQL oracle)
    "q_dedup_exact", "q_simhash", "q_dedup_ngram", "q_dedup_embed",
    "q_dedup_near",
    # similarity
    "q_topk_cosine",
    # text analysis
    "q_text_stats", "q_token_count", "q_lang_id", "q_fingerprint",
    "q_sentiment_lexicon", "q_json_extract", "q_redact",
    # multimodal
    "q_multimodal_meta", "q_frame_sample",
    # curation suite
    "q_quality_repetition", "q_quality_filter", "q_dataset_split",
    "q_stratified_sample", "q_source_stats", "q_curation_pipeline",
    "q_contamination", "q_sequence_packing",
    # relational core
    "q_range_join", "q_tpch_q1", "q_join_multi", "q_topn",
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
