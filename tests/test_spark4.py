"""Functional tests for the Spark-4 runtime-surface operators
(operators/spark4_queries.py) and the seasonal profile."""

from __future__ import annotations

from pyspark.sql import functions as F

from trading_data_pipeline_spark.registry import all_queries, load


def _qs():
    return all_queries()


def test_word_runs_udtf_hand_case(spark):
    from trading_data_pipeline_spark.operators.spark4_queries import (
        _register_word_runs,
    )

    _register_word_runs(spark)
    df = spark.createDataFrame([(7, "a a b a"), (8, "x")], "doc_id long, text string")
    df.createOrReplaceTempView("__udtf_hand")
    rows = spark.sql(
        "SELECT r.* FROM __udtf_hand d, LATERAL word_runs(d.doc_id, d.text) r"
    ).collect()
    got = sorted((r.doc_id, r.run_start, r.word, r.run_len) for r in rows)
    assert got == [
        (7, 1, "a", 2),
        (7, 3, "b", 1),
        (7, 4, "a", 1),
        (8, 1, "x", 1),
    ]


def test_word_runs_reconstruct_token_count(spark, sf_dir):
    """Sum of run lengths per doc == the doc's token count (lossless RLE)."""
    q = _qs()["q_udtf_runs"].fn(spark, sf_dir)
    runs = q.groupBy("doc_id").agg(F.sum("run_len").alias("n"))
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    )
    bad = runs.join(docs, "doc_id").filter(F.col("n") != F.col("n_tok")).count()
    assert bad == 0


def test_dpp_join_matches_unpartitioned_form(spark, sf_dir):
    """Identical results whether the fact is the DPP-pruned partitioned lake
    or the raw parquet — pruning is a physical optimization, not semantics."""
    from trading_data_pipeline_spark.operators.spark4_queries import (
        DPP_TOP_DAYS,
        DPP_VALUE_MIN,
    )

    got = {
        (r.date, r.event_type, r.n, r.sum_value)
        for r in _qs()["q_dpp_join"].fn(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    top = (
        ev.filter(F.col("value") > DPP_VALUE_MIN)
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_day"))
        .orderBy(F.desc("n_day"), F.asc("d"))
        .limit(DPP_TOP_DAYS)
    )
    ref = {
        (r.date, r.event_type, r.n, r.sum_value)
        for r in ev.join(top, F.to_date("ts") == F.col("d"))
        .groupBy(F.to_date("ts").alias("date"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.sum("value") * 100 + 0.5) / 100).alias("sum_value"),
        )
        .collect()
    }
    assert got == ref and got


def test_variant_get_matches_string_path(spark, sf_dir):
    """variant_get over parse_json extracts the same values as the
    single-path get_json_object string scan."""
    ev = load(spark, sf_dir, "events")
    diff = ev.select(
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("a"),
        F.get_json_object("props", "$.k").cast("int").alias("b"),
    ).filter(~F.col("a").eqNullSafe(F.col("b")))
    assert diff.count() == 0


def test_seasonal_index_mass_balances(spark, sf_dir):
    """Volume-weighted mean of the seasonality index is 1 by construction
    (each cell's index is its mean over the global mean)."""
    prof = _qs()["q_seasonal_profile"].fn(spark, sf_dir)
    r = prof.agg(
        (F.sum(F.col("n") * F.col("seasonal_idx")) / F.sum("n")).alias("w")
    ).collect()[0]
    assert abs(r.w - 1.0) < 1e-3
    assert prof.count() <= 7 * 24


def test_sql_udf_inlines_with_no_python_boundary(spark, sf_dir):
    """The SQL-language UDF must inline: the physical plan contains no
    BatchEvalPython/ArrowEvalPython node, and the function is callable
    from any later SQL in the session."""
    from trading_data_pipeline_spark.operators.spark4_queries import (
        q_sql_udf_impl,
    )

    df = q_sql_udf_impl(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    bands = {r.band for r in df.collect()}
    assert bands <= {"null", "small", "medium", "large"} and bands
    # reusable from unrelated SQL after registration
    one = spark.sql("SELECT value_band(5.0) AS b").collect()[0]
    assert one.b == "small"
