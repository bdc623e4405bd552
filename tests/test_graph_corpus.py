"""Hand-built semantics for triangle counting and vocabulary-bounded
co-occurrence (round-5 batch 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.corpus_queries import (
    cooccurrence_pairs,
)
from trading_data_pipeline_spark.operators.graph_queries import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_one_triangle(spark):
    out = {
        r.node: r.n_triangles
        for r in triangle_counts(
            _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}  # node 4 is in no triangle


def test_two_triangles_sharing_an_edge(spark):
    # {1,2,3} and {1,2,4}: nodes 1,2 sit in two triangles each
    out = {
        r.node: r.n_triangles
        for r in triangle_counts(
            _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
        ).collect()
    }
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def test_no_triangle_in_a_path(spark):
    assert triangle_counts(_edges(spark, [(1, 2), (2, 3), (3, 4)])).count() == 0


def test_cooccurrence_hand_built(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "s", 3),
            (2, "alpha beta", "en", "s", 2),
            (3, "alpha gamma", "en", "s", 2),
            (4, "delta", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        (r.ta, r.tb): r
        for r in cooccurrence_pairs(docs, vocab_k=3, min_docs=2).collect()
    }
    # vocab (top 3 by DF): alpha(3), beta(2), gamma(2) — delta excluded
    assert set(out) == {("alpha", "beta"), ("alpha", "gamma")}
    r = out[("alpha", "beta")]
    assert (r.c_ab, r.c_a, r.c_b) == (2, 3, 2)
    assert r.pmi_ratio == round(2 * 4 / (3 * 2), 4)  # 1.3333


def test_bfs_levels_hand_built(spark):
    """Path 1-2-3-4 with source {1}: levels 0,1,2,3; isolated source 9
    stays at level 0; unreachable node never appears."""
    from trading_data_pipeline_spark.operators.graph_queries import bfs_levels

    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (7, 8)])
    sources = spark.createDataFrame([(1,), (9,)], "node long")
    out = {r.node: r.level for r in bfs_levels(edges, sources).collect()}
    assert out == {1: 0, 9: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_levels_min_distance_over_multiple_paths(spark):
    """A node reachable via a short and a long path gets the SHORT one
    (BFS first-discovery), and the depth cap truncates the frontier."""
    from trading_data_pipeline_spark.operators.graph_queries import bfs_levels

    # 1-5 direct, and 1-2-3-4-5 long way; also a chain past the cap
    edges = _edges(
        spark,
        [(1, 5), (1, 2), (2, 3), (3, 4), (4, 5),
         (5, 6), (6, 7), (7, 8), (8, 9)],
    )
    sources = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.level for r in bfs_levels(edges, sources, max_depth=3).collect()}
    assert out[5] == 1  # short path wins
    assert out[2] == 1 and out[3] == 2 and out[4] == 2  # 4 via 5 at level 2
    assert out[6] == 2 and out[7] == 3
    assert 8 not in out  # beyond the cap


def test_similarity_edges_build_once_per_corpus(spark, sf_dir):
    """The graph queries must reuse one cached edge list per
    (session, corpus, threshold) — a rebuild per query is the IVF
    anti-pattern applied to graphs."""
    from trading_data_pipeline_spark.operators.graph_queries import (
        similarity_edges_for,
    )

    e1 = similarity_edges_for(spark, sf_dir)
    e2 = similarity_edges_for(spark, sf_dir)
    assert e1 is e2
    assert e1.count() == e2.count() > 0


def test_pps_sample_properties(spark, sf_dir):
    """PPS systematic sampling: pick count ~= target, every
    heavier-than-step document is certainly included, and the draw is
    deterministic (same input → same picks)."""
    from trading_data_pipeline_spark.operators.corpus_queries import (
        PPS_TARGET,
        pps_sample,
    )
    from trading_data_pipeline_spark.registry import load

    docs = load(spark, sf_dir, "documents")
    picks1 = sorted(r.doc_id for r in pps_sample(docs).collect())
    picks2 = sorted(r.doc_id for r in pps_sample(docs).collect())
    assert picks1 == picks2 and picks1
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    step = max(1, total // PPS_TARGET)
    # exact expected pick set: sequential simulation of the same walk
    rows = sorted(
        ((r.doc_id, r.n_chars) for r in docs.select("doc_id", "n_chars").collect())
    )
    cum = 0
    want = []
    for doc_id, w in rows:
        prev = cum
        cum += w
        if cum // step > prev // step:
            want.append(doc_id)
    assert picks1 == want
    heavy = {r.doc_id for r in docs.filter(F.col("n_chars") >= step).collect()}
    assert heavy <= set(picks1)


def test_pps_sample_certainty_inclusion_hand_built(spark):
    from trading_data_pipeline_spark.operators.corpus_queries import pps_sample

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 10) for i in range(20)]
        + [(99, "t", "en", "s", 1000)],  # a whale: 1000 of 1200 total
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    picks = {r.doc_id for r in pps_sample(docs, target=4).collect()}
    assert 99 in picks  # weight >= step → certain inclusion


def test_mixture_weights_tau_half_upweights_small_sources(spark):
    """Sources with 100 vs 10,000 tokens: raw shares 1/101 and 100/101,
    but sqrt-weights 1/11 and 10/11 — the small source is upsampled
    (factor > 1), the big one downsampled, and weights sum to 1."""
    from trading_data_pipeline_spark.operators.corpus2_queries import (
        mixture_weights,
    )

    docs = spark.createDataFrame(
        [
            # 100-token doc and a 10,000-token doc (exact via repeat)
            (0, " ".join(["w"] * 100), "en", "small", 100),
            (1, " ".join(["w"] * 10000), "en", "big", 10000),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.source: r for r in mixture_weights(docs).collect()}
    assert out["small"].toks == 100 and out["big"].toks == 10000
    assert abs(out["small"].weight - 1 / 11) < 1e-6
    assert abs(out["big"].weight - 10 / 11) < 1e-6
    assert abs(out["small"].weight + out["big"].weight - 1.0) < 2e-9
    assert out["small"].upsample > 1.0 > out["big"].upsample
    # exact: upsample_small = (1/11)/(100/10100) = 9.1818...
    assert abs(out["small"].upsample - (1 / 11) / (100 / 10100)) < 2e-6


def _cdc_doc(n=120, skip=0):
    # deterministic aperiodic pseudo-text (varied first chars so the
    # ascii-based fingerprint has entropy; combined period 17·89 >> n
    # so shifted fixed-size chunks can never coincide)
    return " ".join(
        chr(97 + i % 17) + str((i * i) % 89) for i in range(skip, skip + n)
    )


def test_cdc_chunks_reassemble_to_document(spark):
    from trading_data_pipeline_spark.operators.corpus2_queries import (
        cdc_chunks,
    )

    text = _cdc_doc()
    docs = spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = sorted(cdc_chunks(docs).collect(), key=lambda r: r.chunk)
    assert len(rows) > 3  # boundaries actually fire on this vocab
    assert " ".join(r.chunk_text for r in rows) == text


def test_cdc_chunking_is_shift_robust_where_fixed_is_not(spark):
    """Insert ONE token at the head of a 120-token doc: content-defined
    boundaries re-sync after the edit window, so most chunk texts are
    shared; fixed-size chunking shifts every chunk and shares (almost)
    nothing. This is the property that justifies CDC at 100 TB."""
    from trading_data_pipeline_spark.operators.corpus2_queries import (
        cdc_chunks,
    )

    a, b = _cdc_doc(), "zzz " + _cdc_doc()
    docs = spark.createDataFrame(
        [(0, a, "en", "s", len(a)), (1, b, "en", "s", len(b))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = cdc_chunks(docs).collect()
    ca = {r.chunk_text for r in rows if r.doc_id == 0}
    cb = {r.chunk_text for r in rows if r.doc_id == 1}
    shared = len(ca & cb) / len(ca)
    assert shared >= 0.5, f"CDC shared only {shared:.2f}"
    # fixed 10-token chunking on the same pair shares nothing: every
    # chunk is offset by the inserted token
    fixed_a = {a.split(" ")[i:i + 10] and " ".join(a.split(" ")[i:i + 10])
               for i in range(0, 120, 10)}
    fixed_b = {" ".join(b.split(" ")[i:i + 10]) for i in range(0, 121, 10)}
    assert len(fixed_a & fixed_b) == 0


def test_dataset_card_hand_counts_with_duplicates(spark):
    """4 docs (one an exact token-permutation duplicate), 2 sources,
    2 langs: the card's counts and ratios are exact."""
    from trading_data_pipeline_spark.operators.corpus_queries import (
        dataset_card,
    )

    docs = spark.createDataFrame(
        [
            (0, "b a c", "en", "s1", 5),
            (1, "a b c", "en", "s1", 5),   # permutation dup of doc 0
            (2, "d e", "de", "s2", 3),
            (3, "f", "en", "s2", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = dataset_card(docs).collect()[0]
    assert (r.n_docs, r.n_tokens, r.n_sources, r.n_langs) == (4, 9, 2, 2)
    assert r.dup_rate == 0.25            # 4 docs, 3 unique fingerprints
    assert r.n_token_types == 6          # a b c d e f
    assert r.mean_doc_tokens == 2.25
    assert abs(r.corpus_ttr - 6 / 9) < 2e-6


def test_mixture_sample_quota_and_determinism(spark):
    """Two sources 100 vs 10,000 tokens, target 22: sqrt weights 1/11
    and 10/11 -> quotas 2 and 20; picks per source equal min(quota, n)
    and the draw is deterministic."""
    from trading_data_pipeline_spark.operators.corpus2_queries import (
        mixture_sample,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10), "en", "small", 10) for i in range(10)]
        + [(100 + i, " ".join(["w"] * 1000), "en", "big", 1000) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out1 = mixture_sample(docs, target=22).collect()
    out2 = mixture_sample(docs, target=22).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    by_src = {}
    for r in out1:
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert len(by_src["small"]) == 2 and len(by_src["big"]) == 10
    # big's quota (20) exceeds its 10 docs -> all picked, quota reported
    assert {r.quota for r in out1 if r.source == "big"} == {20}
