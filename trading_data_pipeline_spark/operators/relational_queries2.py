"""Relational coverage, batch 2: pivot, explode, grouping sets, exact
percentiles, ranking/running windows, arg-min/max, collect+sort, regex,
subqueries, and three more TPC-H classics (Q3/Q5/Q6 adapted to the columns
the synthetic tables carry).

All stock Catalyst plans (SURVEY.md §2.e/§2.f: the reference has none of
these; Spark gives them for free and each is pinned to a DuckDB oracle).
Determinism notes inline — every window/ranking order includes a unique
tie-break key so value-hashes are stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import load, register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q_pivot",
    f"""
    SELECT user_id,
           {", ".join(
               f"round(coalesce(sum(CASE WHEN event_type = '{t}' THEN value END), 0), 2)"
               f" AS {t}_value" for t in EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
    doc="Pivot events wide by event_type (explicit value list → no extra "
    "distinct-scan job; single hash aggregation at any scale)",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum("value"))
    )
    return out.select(
        "user_id",
        *[
            F.round(F.coalesce(F.col(t), F.lit(0.0)), 2).alias(f"{t}_value")
            for t in EVENT_TYPES
        ],
    )


@register(
    "q_explode_tokens",
    """
    SELECT * FROM (
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
      SELECT doc_id, CAST(unnest(range(len(tk))) AS INT) AS pos,
             unnest(tk) AS token
      FROM t
    ) WHERE length(token) > 5
    """,
    doc="posexplode of the token array with a post-explode filter — the "
    "generator runs pipelined inside the scan stage, no shuffle "
    "(threshold 5: the synthetic corpus tops out at 8-char tokens, so the "
    "filter must bite without zeroing the output)",
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .filter(F.length("token") > 5)
    )


@register(
    "q_grouping_sets",
    """
    SELECT r_name, n_name, count(*) AS n, grouping(r_name) AS g_r,
           grouping(n_name) AS g_n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
    doc="GROUPING SETS with grouping() markers — one expand + one hash agg, "
    "not one job per set",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT r_name, n_name, count(*) AS n, grouping(r_name) AS g_r,
               grouping(n_name) AS g_n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        """
    )


@register(
    "q_percentiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 2) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact interpolated percentiles per group (Spark percentile() ≡ "
    "DuckDB quantile_cont); at 100 TB swap to approx_percentile — "
    "t-digest sketch, no sort, mergeable across partitions",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        *[
            F.round(F.expr(f"percentile(o_totalprice, {p})"), 2).alias(name)
            for p, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
        ]
    )


@register(
    "q_approx_percentile",
    None,  # sketch cut points are engine-specific → rows-only; relative
    # error vs the exact form is bounded in tests/test_extensions.py
    doc="THE 100 TB percentile path the exact q_percentiles docstring "
    "points at: approx_percentile's mergeable single-pass sketch — no "
    "per-group sort, partial sketches combine map-side like any partial "
    "agg, accuracy parameter trades memory for error. Relative error vs "
    "the exact interpolated percentile asserted < 0.5% in tests",
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        *[
            F.round(
                F.expr(f"approx_percentile(o_totalprice, {p}, 10000)"), 2
            ).alias(name)
            for p, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
        ]
    )


@register(
    "q_window_rank",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             round(o_totalprice, 2) AS o_totalprice,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             row_number() OVER w AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
    doc="rank/dense_rank/row_number per customer with a unique tie-break "
    "(o_orderkey) so results are deterministic; top-3 filter keeps output "
    "bounded per key",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_running",
    """
    WITH w AS (
      SELECT event_id, user_id,
             sum(CAST(value AS DECIMAL(18,2)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS rsum,
             sum(CAST(value AS DECIMAL(18,2)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS msum,
             count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mcnt
      FROM events
    )
    SELECT event_id, user_id,
           CAST(rsum AS DOUBLE) AS running_sum,
           CAST(CASE WHEN mcnt = 5
                     THEN round(msum * CAST(0.2 AS DECIMAL(2,1)), 2) END
                AS DOUBLE) AS moving_avg5
    FROM w
    """,
    doc="Running sum + 5-row moving average per user (ROWS frames, unique "
    "tie-break) — single exchange on user_id serves both frames. "
    "Accumulation, the ÷5 (×0.2, exact), and the tie-rounding all happen "
    "in DECIMAL: double rounding at .xx5 is engine-dependent (Spark "
    "rounds the shortest decimal repr, DuckDB the binary value), decimal "
    "rounding is half-up in both. Warm-up rows (frame < 5) yield NULL",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.col("value").cast("decimal(18,2)")
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    mov = base.rowsBetween(-4, 0)
    fifth = F.lit(0.2).cast("decimal(2,1)")
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(dec).over(run).cast("double").alias("running_sum"),
        F.when(
            F.count(F.lit(1)).over(mov) == 5,
            F.round(F.sum(dec).over(mov) * fifth, 2),
        )
        .cast("double")
        .alias("moving_avg5"),
    )


@register(
    "q_ntile",
    """
    SELECT o_orderkey, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
    doc="ntile quartiles over a global order, WITHOUT the global "
    "single-partition window: approx_percentile cut points bucket the sort "
    "key (monotone, deterministic), row_number runs per-bucket in "
    "parallel, and tiny per-bucket counts (one row per bucket, collected "
    "to the driver) turn local ranks into exact global ranks; the ntile "
    "quota formula then reproduces ntile(4) semantics bit-for-bit. One "
    "hash exchange on the bucket id — no SinglePartition funnel, so the "
    "plan survives 100x scale (asserted in tests/test_plans.py). Core in "
    "plans/global_rank.py:global_ntile, property-tested vs the window "
    "form on random data",
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.global_rank import global_ntile

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return global_ntile(
        orders, 4, ["o_totalprice", "o_orderkey"], out_col="quartile"
    ).select("o_orderkey", "quartile")


@register(
    "q_argminmax",
    """
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS biggest_order,
           arg_min(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS smallest_order
    FROM orders GROUP BY o_custkey
    """,
    doc="max_by/min_by (SQL arg_max/arg_min) — the ε·key term makes the "
    "argmax unique so both engines agree on ties",
)
def q_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    score = F.col("o_totalprice") + F.col("o_orderkey") * F.lit(1e-9)
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", score).alias("biggest_order"),
        F.min_by("o_orderkey", score).alias("smallest_order"),
    )


@register(
    "q_collect_sorted",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation GROUP BY n_regionkey
    """,
    doc="collect_list → array_sort → join: deterministic list aggregation "
    "(collect order is partitioning-dependent; the sort restores a stable "
    "value)",
)
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
    )


@register(
    "q_regex_funcs",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
    FROM part
    """,
    doc="regexp extract / count / replace on part names — all codegen "
    "string ops, no UDF",
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.size(F.expr(r"regexp_extract_all(p_name, '[aeiou]', 0)")).alias("n_vowels"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )


@register(
    "q_map_funcs",
    """
    SELECT p_partkey,
           CAST(len(string_split(p_type, ' ')) AS INT) AS n_attrs,
           p_brand AS brand_attr
    FROM part
    """,
    doc="MapType round-trip: build map<string,string> from columns, read "
    "attributes back out (str_to_map / element_at) — oracle checks the "
    "extracted values",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type")),
        F.array(F.col("p_brand"), F.col("p_type")),
    )
    return part.select(
        "p_partkey",
        F.size(F.split(F.element_at(m, "type"), " ")).alias("n_attrs"),
        F.element_at(m, "brand").alias("brand_attr"),
    )


@register(
    "q_exists_subquery",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
    """,
    doc="Correlated EXISTS — Catalyst rewrites it to a left-semi hash join "
    "(asserted in test_plans), no per-row subquery execution",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
        """
    )


@register(
    "q_scalar_subquery",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
    doc="Scalar subquery in a filter — computed once, broadcast into the "
    "predicate (1.5x avg: the synthetic price distribution tops out at "
    "~2x avg, so a 2x cut selected nothing and proved nothing)",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "q_tpch_q6",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecasting-revenue: pure scan-filter-agg; every "
    "predicate reaches the parquet scan",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.02, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q_tpch_q3",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1996-06-30'
      AND CAST(l_shipdate AS DATE) > DATE '1996-06-30'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 unshipped-orders: dim filter → fact join → agg → top-10 "
    "(TakeOrderedAndProject; customer is filtered but grows with the "
    "data — no broadcast hint, AQE decides)",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1996-06-30")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1996-06-30")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q_tpch_q5",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 local-supplier volume: 5-way join; all dimension sides "
    "broadcast (bounded dims); customer/supplier carry no hint — they "
    "grow with the data, so AQE picks the strategy per run",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q_conditional_agg",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           count(*) FILTER (WHERE event_type = 'error') AS n_errors,
           round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0), 2)
             AS purchase_value
    FROM events GROUP BY user_id
    """,
    doc="Conditional aggregation (count_if / FILTER clauses) — one pass, "
    "one shuffle for any number of conditions",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchase = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.count_if(purchase).alias("n_purchases"),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.round(
            F.coalesce(F.sum(F.when(purchase, F.col("value"))), F.lit(0.0)), 2
        ).alias("purchase_value"),
    )


@register(
    "q_null_funcs",
    """
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'recovered') AS kind,
           CASE WHEN value IS NULL THEN 0 ELSE 1 END AS has_value,
           round(ifnull(value, -1.0), 2) AS value_or_default
    FROM events
    """,
    doc="NULL-handling surface: coalesce / nullif / ifnull / IS NULL",
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("recovered")).alias(
            "kind"
        ),
        F.when(F.col("value").isNull(), 0).otherwise(1).alias("has_value"),
        F.round(F.ifnull("value", F.lit(-1.0)), 2).alias("value_or_default"),
    )
