"""Scale-cap ratchet (round-9 sf1 sweep findings): quality-eval
operators must bound their sampled work by a FIXED count, never a
corpus fraction — an eval whose sample grows with the corpus makes its
exhaustive ground-truth arm super-linear (q_ann_recall measured 29.7x
wall for 10x data before the cap; q_banding_recall 10.2x). These tests
pin the caps so a future parameter edit can't silently reintroduce the
class."""

from pyspark.sql import functions as F


def test_ann_recall_query_sample_is_corpus_capped(spark):
    from trading_data_pipeline_spark.operators.similarity_queries import (
        ANN_RECALL_MAX_QUERIES,
        ANN_RECALL_QMOD,
        _recall_qmod,
    )

    # below the cap threshold: historical qmod unchanged (driver SFs)
    small = spark.range(2000)
    assert _recall_qmod(small, ANN_RECALL_QMOD, ANN_RECALL_MAX_QUERIES) == 50
    # 10x corpus: qmod rises so the sample stays <= the cap
    big = spark.range(20000)
    q = _recall_qmod(big, ANN_RECALL_QMOD, ANN_RECALL_MAX_QUERIES)
    assert q == 500
    assert 20000 // q <= ANN_RECALL_MAX_QUERIES
    # empty corpus: no division blow-up
    assert _recall_qmod(spark.range(0), ANN_RECALL_QMOD, 40) == 50


def test_banding_recall_sample_is_corpus_capped(spark):
    from trading_data_pipeline_spark.operators.dedup_queries import (
        BR_MAX_SAMPLE,
        banding_recall,
    )

    # 60k docs with per-doc-unique shingles: the capped pipeline must
    # evaluate exactly ceil-divided-modulo sample (5000), not 60k
    docs = spark.range(60000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("w"), F.col("id"), F.lit(" w"), F.col("id") + 1,
            F.lit(" w"), F.col("id") + 2,
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(10).alias("n_chars"),
    )
    row = banding_recall(docs).collect()[0]
    assert row.n_sampled <= BR_MAX_SAMPLE
    assert row.n_sampled == 5000  # ceil(60000/5000)=12 -> ids % 12 == 0
    assert row.n_truth == 0 and row.recall == 1.0  # disjoint shingles


def test_banding_recall_full_corpus_below_cap(spark):
    """At driver SFs (<= BR_MAX_SAMPLE docs) the eval still covers the
    FULL corpus — the cap must not change historical behavior."""
    from trading_data_pipeline_spark.operators.dedup_queries import (
        banding_recall,
    )

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("x"), F.col("id"), F.lit(" y"), F.col("id"),
            F.lit(" z"), F.col("id"),
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(10).alias("n_chars"),
    )
    row = banding_recall(docs).collect()[0]
    assert row.n_sampled == 100
