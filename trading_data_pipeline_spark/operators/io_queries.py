"""Declared queries for scans/sources/sinks (SURVEY.md §2.a rows 1-8).

Each query materializes a deterministic copy of a testdata table through the
FileSystemConnector (CSV or partitioned parquet) under ``.tmp/io`` and reads
it back, so the oracle is simply the original table — a full round-trip
check of the scan/sink code paths the reference exercises against S3
(xetra/common/s3.py:52-107). Local paths here; the connector API is
scheme-agnostic (s3a:// works unchanged).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quantize import q as _q
from ..registry import load, register
from ..sources.connector import FileSystemConnector

# scratch root inside the repo checkout, wherever it lives
TMP_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".tmp", "io",
)

NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"
CUSTOMER_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


def _conn(spark: SparkSession) -> FileSystemConnector:
    os.makedirs(TMP_ROOT, exist_ok=True)
    return FileSystemConnector(spark, TMP_ROOT)


@register(
    "q_scan_csv",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="CSV scan with explicit schema (ref s3.py:65-82): parquet→csv→read "
    "round-trip must reproduce the table exactly",
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    conn = _conn(spark)
    conn.write(load(spark, sf_dir, "nation"), "scan_csv/nation", "csv")
    return conn.read_csv("scan_csv/nation", schema=NATION_SCHEMA)


@register(
    "q_scan_partition",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
           o_orderstatus
    FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Hive-partitioned parquet + partition pruning — the 100 TB version "
    "of the ref's date-prefix key listing (s3.py:52-63): the filter on the "
    "partition column prunes directories at planning time, no data read "
    "from other partitions",
)
def q_scan_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    conn = _conn(spark)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    conn.write(orders, "scan_part/orders", "parquet", partition_by=["o_orderstatus"])
    back = conn.read_parquet("scan_part/orders")
    return back.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        # partition columns come back as the partition-dir string value
        F.col("o_orderstatus").cast("string").alias("o_orderstatus"),
    )


@register(
    "q_sink_csv",
    "SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS c_acctbal, "
    "c_mktsegment FROM customer",
    doc="CSV sink round-trip (ref s3.py:96-99); doubles survive because "
    "Spark writes shortest-round-trip representations",
)
def q_sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    conn = _conn(spark)
    customer = load(spark, sf_dir, "customer")
    conn.write(customer, "sink_csv/customer", "csv")
    back = conn.read_csv("sink_csv/customer", schema=CUSTOMER_SCHEMA)
    return back.withColumn("c_acctbal", F.round("c_acctbal", 2))


@register(
    "q_sink_parquet",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice "
    "FROM lineitem",
    doc="Parquet sink round-trip (ref s3.py:100-103); exact double fidelity",
)
def q_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    conn = _conn(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    conn.write(li, "sink_parquet/lineitem", "parquet")
    return conn.read_parquet("sink_parquet/lineitem")


@register(
    "q_sink_json",
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority FROM orders",
    doc="JSON-lines sink + scan round-trip (engine extension beyond the "
    "reference's csv/parquet allowlist); integer/string columns only so "
    "the text round-trip is exact by construction",
)
def q_sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    conn = _conn(spark)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    conn.write(orders, "sink_json/orders", "json")
    return conn.read_json(
        "sink_json/orders",
        schema="o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_orderpriority string",
    )


@register(
    "q_sink_orc",
    "SELECT p_partkey, p_brand, p_type, p_size, p_retailprice FROM part",
    doc="ORC sink + scan round-trip (engine extension beyond the "
    "reference's csv/parquet allowlist; ORC ships with Spark and keeps "
    "parquet's pushdown/pruning properties — the Hive-era lake "
    "interchange format). Columnar binary round-trip, so doubles are "
    "bit-exact",
)
def q_sink_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    conn = _conn(spark)
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size", "p_retailprice"
    )
    conn.write(part, "sink_orc/part", "orc")
    return conn.read_orc("sink_orc/part")


@register(
    "q_bucketed_join",
    """
    SELECT o.o_orderkey, o.o_custkey, c.c_name,
           round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="Zero-exchange co-located join over bucketed tables "
    "(sources/bucketed.py): both sides are written bucketed+sorted by "
    "the join key, so the recurring orders⋈customer runs as a scan-side "
    "sort-merge with NO exchange and NO sort — the layout that turns a "
    "nightly fact join's dominant shuffle into a local merge at 100 TB. "
    "The oracle is the plain join (bucketing must never change results); "
    "the no-exchange/no-sort plan is asserted in tests",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from ..sources.bucketed import read_table, write_bucketed

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    base = _os.path.join(TMP_ROOT, "bucketed")
    write_bucketed(
        orders, "q_bj_orders", ["o_custkey"], 8, sort_keys=["o_custkey"],
        path=_os.path.join(base, "orders"),
    )
    write_bucketed(
        customer, "q_bj_customer", ["c_custkey"], 8, sort_keys=["c_custkey"],
        path=_os.path.join(base, "customer"),
    )
    o = read_table(spark, "q_bj_orders")
    c = read_table(spark, "q_bj_customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        "o_custkey",
        "c_name",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


# ----------------------------------------------------------- SQL interface

# One dialect-shared ANSI string: the SAME text runs through spark.sql()
# AND the DuckDB oracle. Keeping it shared is the point of the query —
# it proves the engine exposes a plain SQL surface (views + spark.sql),
# not only the DataFrame builder, and that ANSI-conservative SQL is
# portable across both engines verbatim.
SHARED_SQL = """
    SELECT n.n_name AS nation,
           count(*) AS n_customers,
           floor(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
"""


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every driver table as a temp view so plain ``spark.sql``
    works against the lake — the engine's SQL front door."""
    from ..registry import TABLES

    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


@register(
    "q_sql_interface",
    SHARED_SQL,
    doc="The SQL front door: driver tables registered as temp views and "
    "the query text passed VERBATIM to spark.sql() — the oracle runs the "
    "byte-identical string, so this row also certifies dialect-portable "
    "ANSI output. Catalyst plans it like any DataFrame query (broadcast "
    "nation, partial agg)",
)
def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SHARED_SQL)


PYSRC_ROWS = 20_000


@register(
    "q_python_source",
    f"""
    WITH g AS (
      SELECT i AS event_id,
             (i * {2654435761}) % 1000 AS user_id,
             ['click', 'purchase', 'signup', 'view'][CAST(i % 4 AS INTEGER) + 1]
               AS event_type,
             CAST((i * {48271}) % 100000 AS DOUBLE) / 100.0 AS value
      FROM (SELECT unnest(generate_series(0, {PYSRC_ROWS - 1})) AS i)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5)
             / 100 AS total
    FROM g GROUP BY event_type
    """,
    doc="Custom Python DataSource (PySpark 4 pyspark.sql.datasource API): "
    "a partition-parallel deterministic generator read through "
    "spark.read.format('synthetic_events') — schema declaration, option "
    "handling, partition planning, per-partition iteration. Row i is a "
    "pure int64 function of i, so the DuckDB oracle reproduces the "
    "whole table from generate_series: the scan itself is value-checked",
)
def q_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.python_source import register_python_source

    register_python_source(spark)
    src = (
        spark.read.format("synthetic_events")
        .option("rows", PYSRC_ROWS)
        .option("partitions", 8)
        .load()
    )
    v = F.col("value").cast("decimal(18,2)")
    return src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        _q(F.sum(v).cast("double"), 100).alias("total"),
    )


@register(
    "q_sink_xml",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="XML sink + scan round-trip (Spark 4 native XML source — the "
    "spark-xml donation; engine extension beyond the reference's "
    "csv/parquet allowlist, same WrongFormatException contract): "
    "integer/string columns only so the text round-trip is exact by "
    "construction. rowTag-schema'd scan, no inference pass",
)
def q_sink_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    conn = _conn(spark)
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    conn.write(nation, "sink_xml/nation", "xml")
    return conn.read_xml(
        "sink_xml/nation",
        schema="n_nationkey long, n_name string, n_regionkey long",
    )
