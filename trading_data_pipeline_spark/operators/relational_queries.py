"""Relational coverage queries (SURVEY.md §2.f second list).

The reference implements none of these (SURVEY.md §2.e) — they come with the
Spark engine and are declared here so the engine's relational surface is
demonstrably complete: joins (inner/broadcast/semi/anti/multi-way), top-n,
distinct + approx-distinct, rollup/cube, set ops, string/date functions,
conditional bucketing, and two TPC-H-style analytical aggregations.

Scale notes (100 TB design):
- Dimension joins (region, nation, supplier, even customer at TPC-H ratios)
  are explicitly ``F.broadcast``; tables that GROW with the data
  (customer/supplier/part) carry NO hint — size-based planning + AQE
  broadcast them at small SF and shuffle-join at scale.
- Fact-fact joins shuffle on the join key; AQE handles skew at runtime.
- Aggregations rely on Spark's partial (map-side) aggregation; top-n uses
  TakeOrderedAndProject (no global sort materialization).
- Float aggregates are rounded identically on both engines so value-hashes
  are stable despite addition-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register


@register(
    "q_join_inner",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="Inner equi-join orders⋈customer (shuffle join on the fact side key)",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@register(
    "q_join_broadcast",
    """
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="Broadcast-hash join of tiny dims (no shuffle; BroadcastExchange)",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


@register(
    "q_join_multi",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style multi-way join: fact⋈fact shuffle + broadcast dims, "
    "revenue per nation. nation/region are bounded-cardinality dims, so "
    "they get an explicit broadcast; customer GROWS with the data (a "
    "fact-sized dim at 100 TB, beyond any broadcast threshold), so no "
    "hint — AQE picks broadcast at small SF and shuffle join at scale",
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q_semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-semi join: customers having orders (no payload duplication)",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 400000)
    """,
    doc="Left-anti join: customers without any large order (ref's "
    "incremental-date diff maps to this same operator, meta_process.py:88-107)",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_topn",
    """
    SELECT c.c_custkey, c.c_name, round(sum(o.o_totalprice), 2) AS total_spent
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spent DESC, c_custkey ASC
    LIMIT 10
    """,
    doc="Top-N: agg + orderBy.limit → TakeOrderedAndProject (per-partition "
    "top-k then driver merge; never a full global sort). custkey tiebreak "
    "keeps the cut deterministic.",
)
def q_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "q_distinct_count",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS distinct_parts,
           count(DISTINCT l_suppkey) AS distinct_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact distinct aggregation (expand + two-phase agg in Spark); the "
    "approx_count_distinct scale path is covered rows-only in q_approx_distinct",
)
def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_approx_distinct",
    None,  # HLL sketches differ across engines — rows-only; accuracy asserted in tests
    doc="approx_count_distinct (HyperLogLog++) — the 100 TB path for "
    "distinct counting; rows-only because sketch estimates are engine-specific",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_rollup",
    """
    SELECT r.r_name, n.n_name, count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="Hierarchical rollup (region→nation→grand total) via Expand",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


@register(
    "q_cube",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="Full cube over two low-cardinality dims",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct semantics): nations with both customers and suppliers",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_except",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
    doc="EXCEPT (distinct semantics): customers minus big-order customers",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


@register(
    "q_string_funcs",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 12) AS name_prefix,
           concat_ws('/', p_brand, p_type) AS brand_type,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_snake
    FROM part
    """,
    doc="Scalar string functions (all JVM-side, whole-stage codegen)",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@register(
    "q_date_funcs",
    """
    SELECT o_orderkey,
           year(o_orderdate)  AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate)   AS order_day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
           datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since_2024
    FROM orders
    """,
    doc="Date/time scalar functions over the timestamp column",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("2024-01-01")).alias("days_since_2024"),
    )


@register(
    "q_case_when",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS price_bucket,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_filled
    FROM orders
    """,
    doc="Conditional bucketing (CASE WHEN chains stay in codegen)",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("price_bucket"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_filled"),
    )


@register(
    "q_tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: the canonical scan→filter→hash-agg "
    "plan; partial aggregation reduces shuffle to |groups|×partitions rows",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_union_all",
    """
    SELECT o_orderkey AS key, 'orders' AS src FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT l_orderkey AS key, 'lineitem' AS src FROM lineitem WHERE l_linenumber = 1
    """,
    doc="UNION ALL by name (ref's multi-file concat, xetra_transformer.py:118-123 "
    "→ unionByName; no dedup, no shuffle)",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("key"), F.lit("orders").alias("src"))
    )
    l = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(F.col("l_orderkey").alias("key"), F.lit("lineitem").alias("src"))
    )
    return o.unionByName(l)
