"""Tests for the LLM-pipeline extension operators: dedup recall, ANN recall,
as-of strategy equivalence, streaming/batch equivalence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.asof import (
    asof_join_pandas,
    asof_join_union,
)
from trading_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from trading_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from trading_data_pipeline_spark.registry import load


@pytest.fixture(scope="module")
def docs(spark):
    # sf0.01 documents (same 500 rows of payload as sf0.001 but with real
    # near-dup pairs) so the recall assertions actually bite
    return load(spark, "/root/testdata/sf0.01", "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_exact_dedup_keeps_min_id(spark, docs):
    out = exact_dedup(docs)
    assert out.count() <= docs.count()
    # every kept id is a real doc id and group sizes sum to the corpus
    assert out.agg(F.sum("n_copies")).collect()[0][0] == docs.count()


def test_simhash_equal_for_token_multiset_dups(spark, docs):
    """Docs with identical sorted-token multisets must get identical simhash
    (the fingerprint is order-insensitive by construction: per-token votes)."""
    fp = simhash(docs)
    key = docs.select(
        "doc_id", F.sort_array(F.split("text", " ")).alias("k")
    )
    joined = key.join(fp, "doc_id")
    groups = (
        joined.groupBy("k")
        .agg(F.countDistinct("simhash").alias("n_fp"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    bad = groups.filter(F.col("n_fp") > 1).count()
    assert bad == 0


def test_minhash_lsh_recall_vs_exact_jaccard(spark, docs):
    """Every truly-near pair (exact unigram-shingle Jaccard ≥ 0.8) among
    consecutive ids must be recalled by the LSH join at distance ≤ 0.5.
    Unigram shingles because this corpus's duplicates are shuffled word
    orders (word-set equal, n-gram disjoint)."""
    ids = docs.select(F.col("doc_id").alias("doc_a"))
    pairs = ids.select("doc_a", (F.col("doc_a") + 1).alias("doc_b"))
    exact = ngram_jaccard_pairs(docs, pairs, n=1).filter(F.col("jaccard") >= 0.8)
    truth = {(r.doc_a, r.doc_b) for r in exact.collect()}
    if not truth:
        pytest.skip("no near-dup pairs at this scale factor")
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, n=1, max_distance=0.5).collect()
    }
    recall = len(truth & lsh) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall} over {len(truth)} true pairs"


def test_banded_minhash_recall_vs_exact_jaccard(spark, docs):
    """The hand-rolled banded MinHash (the one q_dedup_near ships) must also
    recall ≥90% of true near pairs; its output is verify-joined so every
    reported jaccard is exact — precision is 1.0 by construction."""
    from trading_data_pipeline_spark.operators.dedup import banded_minhash_pairs

    ids = docs.select(F.col("doc_id").alias("doc_a"))
    pairs = ids.select("doc_a", (F.col("doc_a") + 1).alias("doc_b"))
    exact = ngram_jaccard_pairs(docs, pairs, n=1).filter(F.col("jaccard") >= 0.8)
    truth = {(r.doc_a, r.doc_b) for r in exact.collect()}
    if not truth:
        pytest.skip("no near-dup pairs at this scale factor")
    got = {
        (r.doc_a, r.doc_b)
        for r in banded_minhash_pairs(docs, n=1, min_jaccard=0.5).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"banded minhash recall {recall} over {len(truth)} pairs"


def test_ann_lsh_recall_vs_brute_force(spark, emb):
    qvec = [float(x) for x in emb.filter("vec_id = 7").collect()[0].embedding]
    exact = [r.vec_id for r in brute_force_topk(emb, qvec, k=10).collect()]
    approx = [r.vec_id for r in lsh_topk(emb, qvec, k=10).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.5, f"ANN overlap {overlap}"


def test_ann_ivf_recall_vs_brute_force(spark, emb):
    from trading_data_pipeline_spark.operators.similarity import ivf_topk

    qvec = [float(x) for x in emb.filter("vec_id = 7").collect()[0].embedding]
    exact = [r.vec_id for r in brute_force_topk(emb, qvec, k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(emb, qvec, k=10, n_cells=8, n_probe=3).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.5, f"IVF overlap {overlap}"


def test_asof_strategies_agree(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    a = asof_join_union(purchases, signups, on="user_id")
    b = asof_join_pandas(purchases, signups, on="user_id")
    ra = sorted((r.event_id, r.asof_value) for r in a.collect())
    rb = sorted((r.event_id, r.asof_value) for r in b.collect())
    assert ra == rb


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    from trading_data_pipeline_spark.operators.windows import tumbling_agg
    from trading_data_pipeline_spark.streaming.jobs import (
        stream_events,
        tumbling_stream,
    )

    # stage the events table as micros-ts parquet (stream source needs a dir)
    events = load(spark, sf_dir, "events")
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)

    batch = tumbling_agg(spark.read.parquet(src), "1 hour")
    stream = tumbling_stream(stream_events(spark, src), "1 hour")
    q = (
        stream.writeStream.format("memory")
        .queryName("t_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("t_tumbling").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_hash_bucket_overflow_free_across_int64_domain(spark):
    """Spark, DuckDB, and pure-Python arithmetic must agree on split
    buckets for ids far beyond int32 — the pre-fix form overflowed int64
    past doc_id ~3.47e9 (silent negative buckets on Spark, error on ANSI
    engines)."""
    import random

    import duckdb

    from trading_data_pipeline_spark.operators.quality_queries import (
        _SPLIT_A,
        _SPLIT_C,
        _bucket_sql,
        _hash_bucket,
    )

    rng = random.Random(7)
    ids = [0, 1, 2**31 - 1, 2**31, 3_470_000_000, 2**40, 2**40 + 123,
           2**62, 2**63 - 1] + [rng.randrange(2**63) for _ in range(50)]

    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in sdf.select(
            "doc_id", _hash_bucket("doc_id", _SPLIT_A, _SPLIT_C).alias("b")
        ).collect()
    }

    con = duckdb.connect()
    expr = _bucket_sql(_SPLIT_A, _SPLIT_C)
    want = dict(
        con.execute(
            f"SELECT doc_id, {expr} FROM (SELECT unnest(?::BIGINT[]) AS doc_id)",
            [ids],
        ).fetchall()
    )
    ref = {i: (((i % 2**31) * _SPLIT_A + _SPLIT_C) % 2**32) % 100 for i in ids}

    assert got == want == ref
    assert all(0 <= b < 100 for b in got.values())


def test_asof_null_payload_and_non_double_dtype(spark):
    """A right row whose payload is NULL must win over an older non-null
    row (merge_asof semantics), and a non-double value column must come
    through with its own dtype, for BOTH strategies."""
    left = spark.createDataFrame(
        [("k", 5), ("k", 15), ("k", 25), ("q", 10)], "id string, ts int"
    )
    right = spark.createDataFrame(
        [("k", 1, "a"), ("k", 10, None), ("k", 20, "c")],
        "id string, ts int, tag string",
    )
    want = {("k", 5): "a", ("k", 15): None, ("k", 25): "c", ("q", 10): None}
    for fn in (asof_join_union, asof_join_pandas):
        out = fn(left, right, on="id", ts_col="ts", value_col="tag",
                 value_alias="tag_asof")
        assert dict(out.dtypes)["tag_asof"] == "string", fn.__name__
        got = {(r["id"], r["ts"]): r["tag_asof"] for r in out.collect()}
        assert got == want, fn.__name__


def test_dup_clusters_transitive_closure(spark):
    """Chained pairs must collapse into one component labeled by its min
    id; disjoint components stay separate."""
    from trading_data_pipeline_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 20: 20, 21: 20}
