"""Relational coverage, batch 5: statistical / regression / bitwise
aggregates, median, unpivot, distinct union, cumulative window ranks,
outer + cross joins, and null-safe try-arithmetic.

The reference has none of these (SURVEY.md §2.e — its only aggregate
surface is min/max/sum/first/last at xetra_transformer.py:173-200); they
round out the engine's relational surface so a reference user gains them
for free. All stock Catalyst plans — no custom physical strategy.

Determinism notes:
- corr/covar/stddev/var and the regr_* family are sample-order sensitive
  in the low float bits; round(·, 6) sits ~6 orders above the partial-sum
  noise and well below the signal.
- median over integral l_quantity is exact (.0/.5); no interpolation noise.
- bit_and/bit_or/bit_xor over int keys are exact in any order.
- cume_dist/percent_rank are rationals k/n — exact in double, but tied
  c_acctbal values would make rank assignment oracle-dependent; rounded to
  6 the tied rows collapse to equal values on both engines anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import load, register


@register(
    "q_stats_agg",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price,
           round(stddev_samp(l_discount), 6)                 AS std_discount,
           round(var_samp(l_tax), 6)                         AS var_tax
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical aggregates (corr / covar_samp / stddev_samp / "
    "var_samp) per return flag — single hash aggregation with partial "
    "moment accumulation map-side; one shuffle of 3 groups x 4 moments",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("covar_qty_price"),
            F.round(F.stddev_samp("l_discount"), 6).alias("std_discount"),
            F.round(F.var_samp("l_tax"), 6).alias("var_tax"),
        )
    )


@register(
    "q_regr",
    """
    SELECT l_linestatus,
           round(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Linear-regression aggregates (regr_slope / intercept / r2 / "
    "count) of price on quantity per line status — the same partial-moment "
    "machinery as corr; fully distributive, one exchange",
)
def q_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).alias("n"),
        )
    )


@register(
    "q_median",
    """
    SELECT l_returnflag,
           median(l_quantity)           AS med_qty,
           round(avg(l_quantity), 6)    AS avg_qty,
           min(l_quantity)              AS min_qty,
           max(l_quantity)              AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact median (integral l_quantity -> exact .0/.5 results on both "
    "engines) alongside avg/min/max. Spark computes exact median via "
    "sort-based percentile; at 100 TB swap to approx_percentile(.., 0.5) "
    "- the sketch is mergeable and single-pass (q_percentiles covers it)",
)
def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.median("l_quantity").alias("med_qty"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
    )


@register(
    "q_bitwise_agg",
    """
    SELECT o_orderpriority,
           bit_and(o_orderkey) AS key_and,
           bit_or(o_orderkey)  AS key_or,
           bit_xor(o_orderkey) AS key_xor
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Bitwise AND/OR/XOR aggregates over integer keys — exact in any "
    "accumulation order, fully distributive (commutative+associative), "
    "map-side combine makes the exchange 3 longs per group",
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.bit_and("o_orderkey").alias("key_and"),
            F.bit_or("o_orderkey").alias("key_or"),
            F.bit_xor("o_orderkey").alias("key_xor"),
        )
    )


@register(
    "q_unpivot",
    """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
    FROM part
    """,
    doc="Unpivot (wide->long melt) of part metrics via DataFrame.unpivot; "
    "oracle spelled as the equivalent UNION ALL. Zero shuffle: melt is a "
    "per-row generator, 2 output rows per input row, scan-parallel",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .withColumn("p_size", F.col("p_size").cast("double"))
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "val")
    )


@register(
    "q_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="Distinct set union (UNION, not UNION ALL) of customer and "
    "supplier nation keys — union + hash-distinct; partial distinct "
    "runs map-side so the exchange carries only unique keys per partition",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "q_window_cume",
    """
    SELECT c_custkey, c_mktsegment,
           round(cume_dist()    OVER w, 6) AS cd,
           round(percent_rank() OVER w, 6) AS pr
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    """,
    doc="Cumulative-distribution window ranks (cume_dist / percent_rank) "
    "of customers by balance within market segment — one exchange on the "
    "partition key, sort within partition, single window pass",
)
def q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@register(
    "q_join_outer",
    """
    SELECT coalesce(c.k, s.k) AS nationkey,
           coalesce(c.n_cust, 0) AS n_cust,
           coalesce(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, count(*) AS n_cust
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, count(*) AS n_supp
          FROM supplier GROUP BY s_nationkey) s
    ON c.k = s.k
    """,
    doc="Full outer join of per-nation customer vs supplier counts with "
    "coalesce'd keys and zero-filled sides — aggregate-then-join keeps "
    "the outer join to group-count cardinality (tiny), not row-level",
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.ck == s.sk, "full_outer").select(
        F.coalesce("ck", "sk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "q_cross_join",
    """
    SELECT r.r_name, p.o_orderpriority
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    """,
    doc="Cross join of two tiny dimensions (regions x distinct order "
    "priorities) — Spark plans BroadcastNestedLoopJoin; safe only because "
    "both sides are provably small (the distinct side aggregates first)",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select("r_name")
    p = load(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(p)


@register(
    "q_try_arith",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / nullif(l_discount, 0.0), 4) AS price_per_disc,
           round(coalesce(l_extendedprice / nullif(l_discount, 0.0), -1.0), 4)
             AS price_per_disc_filled
    FROM lineitem
    """,
    doc="Null-safe arithmetic: try_divide + nullif turn divide-by-zero "
    "into NULL (instead of Inf or an ANSI error at cluster scale), "
    "coalesce backfills. Pure per-row projection, zero shuffle",
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    ratio = F.try_divide("l_extendedprice", F.nullif(F.col("l_discount"), F.lit(0.0)))
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(ratio, 4).alias("price_per_disc"),
        F.round(F.coalesce(ratio, F.lit(-1.0)), 4).alias("price_per_disc_filled"),
    )


@register(
    "q_array_funcs",
    """
    SELECT doc_id,
           len(string_split(text, ' '))                       AS n_tok,
           string_split(text, ' ')[1]                         AS first_tok,
           list_contains(string_split(text, ' '), 'the')      AS has_the,
           coalesce(list_position(string_split(text, ' '), 'the'), 0)
                                                              AS pos_the,
           array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 3), '|')
                                                              AS first3_sorted
    FROM documents
    """,
    doc="Array-function surface over tokenized text: size / element_at / "
    "array_contains / array_position / concat_ws(slice(array_sort)) - per-row "
    "higher-order ops, zero shuffle. DuckDB's list_position returns NULL "
    "for absent (Spark: 0), bridged with coalesce in the oracle",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("text", " ")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.element_at(toks, 1).alias("first_tok"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_position(toks, "the").alias("pos_the"),
        F.concat_ws("|", F.slice(F.array_sort(toks), 1, 3)).alias("first3_sorted"),
    )


@register(
    "q_date_trunc",
    """
    SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
    doc="Calendar-bucket rollup via date_trunc('month') - the coarse "
    "partner of q_tumbling_window's fixed-width buckets; one exchange on "
    "the truncated key, partial aggregation map-side. At 100 TB this is "
    "the query partition-pruned by a month-partitioned layout",
)
def q_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("month", "ts").alias("month_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "q_string_pad",
    """
    SELECT p_partkey,
           lpad(p_brand, 10, '*')            AS brand_padded,
           rpad(p_type, 8, '.')              AS type_padded,
           translate(p_name, 'aeiou', '-----') AS name_devoweled,
           reverse(p_name)                   AS name_reversed
    FROM part
    """,
    doc="String shaping functions (lpad / rpad / translate / reverse) - "
    "fixed-width formatting and normalization primitives, per-row, zero "
    "shuffle, identical semantics on both engines",
)
def q_string_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.lpad("p_brand", 10, "*").alias("brand_padded"),
        F.rpad("p_type", 8, ".").alias("type_padded"),
        F.translate("p_name", "aeiou", "-----").alias("name_devoweled"),
        F.reverse("p_name").alias("name_reversed"),
    )
