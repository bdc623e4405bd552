"""Corpus-level curation statistics: boilerplate n-gram detection,
unigram document-frequency rarity scoring, and source/domain mix
accounting — the C4/RefinedWeb-style corpus passes that run BEFORE
near-dup removal in an LLM data pipeline.

All three are pure DataFrame plans:
- boilerplate: two shuffles, both keyed on the 8-byte gram hash (the
  gram STRING is never built on the Spark side — hashed_shingles);
- token rarity: explode → df aggregate → co-keyed join-back → per-doc
  aggregate (the honest distributed unigram-LM scoring shape: the vocab
  can exceed a broadcast at web scale, so both sides shuffle on token);
- domain mix: one partial-aggregated groupBy over sources plus a
  broadcast one-row scalar.

Determinism: counts and integer sums only; every ratio is a single
division of exact values quantized with floor(x*s+0.5)/s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.global_rank import global_cumsum
from ..plans.parallelism import ensure_parallelism
from ..registry import load, register
from .dedup import hashed_shingles

BOILER_MIN_DOCS = 2  # a gram seen in >= this many distinct docs is boilerplate


from ..functions.quantize import q as _q  # repo-wide quantization convention


def boilerplate_stats(docs: DataFrame, n: int = 8, hashed: bool = True) -> DataFrame:
    """Per-document boilerplate ratio: the fraction of a doc's distinct
    word ``n``-grams that occur in >= BOILER_MIN_DOCS distinct documents.

    ``hashed=True`` (the 100 TB path) keys both shuffles on the xxhash64
    of the gram — 8 bytes instead of an ~8-word string; identical counts
    to the string form modulo ~|grams|²/2⁶⁴ collisions (equivalence
    asserted in tests/test_extensions.py). ``False`` is the oracle-shaped
    string form."""
    if hashed:
        grams = hashed_shingles("text", n)
    else:
        grams = F.array_distinct(
            F.expr(
                f"transform(sequence(0, size(split(text, ' ')) - {n}),"
                f" i -> array_join(slice(split(text, ' '), i + 1, {n}), ' '))"
            )
        )
    sh = (
        ensure_parallelism(docs.filter(F.size(F.split("text", " ")) >= n))
        .select("doc_id", F.explode(grams).alias("g"))
    )
    bp = (
        sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("_df"))  # sh is distinct per doc
        .filter(F.col("_df") >= BOILER_MIN_DOCS)
        .select("g", F.lit(1).alias("_boiler"))
    )
    return (
        sh.join(bp, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_boiler"), F.lit(0))).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            _q(F.col("n_boiler") / F.col("n_grams"), 10000).alias("boiler_ratio"),
        )
    )


@register(
    "q_boilerplate",
    f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(len(tk) - 7),
                    i -> array_to_string(tk[i+1:i+8], ' ')))) AS g
      FROM tok WHERE len(tk) >= 8
    ), bp AS (
      SELECT g FROM sh GROUP BY g HAVING count(*) >= {BOILER_MIN_DOCS}
    )
    SELECT sh.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN bp.g IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           floor(sum(CASE WHEN bp.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*) * 10000 + 0.5) / 10000 AS boiler_ratio
    FROM sh LEFT JOIN bp ON sh.g = bp.g
    GROUP BY sh.doc_id
    """,
    doc="C4-style boilerplate detection: per-document fraction of distinct "
    "8-grams that recur across >= 2 documents (the corpus-frequent-span "
    "signal behind repeated-header/footer stripping). Both Spark shuffles "
    "carry the 8-byte xxhash64 of the gram, never the gram string; counts "
    "match the oracle's string-keyed form modulo ~|grams|^2/2^64 "
    "collisions (hash-vs-string equivalence asserted in "
    "tests/test_extensions.py)",
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_stats(load(spark, sf_dir, "documents"), n=8, hashed=True)


@register(
    "q_token_rarity",
    """
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      FROM documents
    ), df AS (
      SELECT t, count(*) AS df FROM tok GROUP BY t
    )
    SELECT tok.doc_id,
           count(*) AS n_distinct,
           floor(sum(df.df) * 1.0 / count(*) * 10000 + 0.5) / 10000
             AS mean_df,
           min(df.df) AS min_df
    FROM tok JOIN df ON tok.t = df.t
    GROUP BY tok.doc_id
    """,
    doc="Unigram rarity scoring: per-document mean and min document "
    "frequency of its distinct tokens — the integer-exact stand-in for a "
    "unigram-LM logprob filter (rare-token docs surface OCR noise and "
    "gibberish; all-high-df docs surface boilerplate). ln() is avoided "
    "deliberately: libm rounding differs across engines, while integer "
    "df sums are bit-exact. Both the df aggregate and the join-back "
    "shuffle on the token, so the plan holds when the vocab exceeds a "
    "broadcast at web scale",
)
def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t")
    )
    df_tbl = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    return (
        tok.join(df_tbl, "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            _q(F.sum("df") / F.count(F.lit(1)), 10000).alias("mean_df"),
            F.min("df").alias("min_df"),
        )
    )


@register(
    "q_domain_mix",
    """
    WITH per_src AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT sum(n_docs) AS total_docs, count(*) AS n_sources FROM per_src
    )
    SELECT p.source, p.n_docs, p.n_tokens,
           floor(p.n_docs * 1.0 / t.total_docs * 1000000 + 0.5) / 1000000
             AS doc_share,
           floor((1.0 / t.n_sources) / (p.n_docs * 1.0 / t.total_docs)
                 * 1000000 + 0.5) / 1000000 AS uniform_weight
    FROM per_src p CROSS JOIN tot t
    """,
    doc="Training-mixture accounting: per-source document/token counts, "
    "corpus share, and the resampling weight that would rebalance the mix "
    "to uniform across sources (weight = target_share / actual_share — "
    "the knob behind domain-mixture tuning a la DoReMi/Pile). One "
    "partial-aggregated groupBy over the corpus plus a broadcast one-row "
    "scalar; integer counts make every ratio a single exact division",
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_docs").alias("total_docs"), F.count(F.lit(1)).alias("n_sources")
    )
    share = F.col("n_docs") / F.col("total_docs")
    return (
        per_src.join(F.broadcast(tot))  # one-row scalar: always broadcast
        .select(
            "source",
            "n_docs",
            "n_tokens",
            _q(share, 1_000_000).alias("doc_share"),
            _q((F.lit(1.0) / F.col("n_sources")) / share, 1_000_000).alias(
                "uniform_weight"
            ),
        )
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@register(
    "q_chunk_documents",
    f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) // {CHUNK_STRIDE} AS INT) AS chunk_id,
           len(tk[s : s + {CHUNK_TOKENS - 1}]) AS n_tokens,
           array_to_string(tk[s : s + {CHUNK_TOKENS - 1}], ' ') AS chunk_text
    FROM tok, unnest(range(1, len(tk) + 1, {CHUNK_STRIDE})) AS u(s)
    """,
    doc="Document chunking for embedding/RAG prep: fixed 32-token windows "
    "with an 8-token overlap (stride 24), the standard pre-embedding "
    "segmentation. Pure per-row array arithmetic — sequence of starts -> "
    "explode -> slice — zero shuffle, scan-parallel; each output row "
    "carries its (doc_id, chunk_id) provenance so chunk embeddings can "
    "be joined back to documents. Deterministic: every start s <= "
    "n_tokens yields one chunk (the final chunk may be short)",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    tk = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(tk), F.lit(CHUNK_STRIDE))
    return (
        docs.select("doc_id", tk.alias("tk"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.size(F.slice("tk", F.col("s"), CHUNK_TOKENS)).alias("n_tokens"),
            F.array_join(F.slice("tk", F.col("s"), CHUNK_TOKENS), " ").alias(
                "chunk_text"
            ),
        )
    )


POSTINGS_CAP = 10


@register(
    "q_inverted_index",
    f"""
    WITH pairs AS (
      SELECT DISTINCT u.token, d.doc_id
      FROM documents d, unnest(string_split(d.text, ' ')) AS u(token)
    ), ranked AS (
      SELECT token, doc_id,
             row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
      FROM pairs
    )
    SELECT token, count(*) AS df,
           array_to_string(list(doc_id ORDER BY doc_id)
                           FILTER (WHERE rn <= {POSTINGS_CAP}), ',') AS postings
    FROM ranked GROUP BY token
    """,
    doc="Inverted-index construction (search prep over the corpus): "
    "distinct (token, doc) pairs -> per-token document frequency + the "
    "first-10 posting list (doc_id order). The rank window caps the "
    "collect BEFORE aggregation, so per-token state is O(cap) — a plain "
    "collect_set-then-slice would buffer a hot token's entire posting "
    "list. Window and groupBy share the token key: one exchange",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    pairs = docs.select(
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
        "doc_id",
    )
    rn = F.row_number().over(Window.partitionBy("token").orderBy("doc_id"))
    ranked = pairs.select("token", "doc_id", rn.alias("rn"))
    return ranked.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.concat_ws(
            ",",
            F.sort_array(
                F.collect_list(
                    F.when(F.col("rn") <= POSTINGS_CAP, F.col("doc_id"))
                )
            ),
        ).alias("postings"),
    )


# distinct LCG constants from the split/sample mixers in quality_queries;
# the bucket construction itself is shared (lockstep Spark/SQL pair)
from .quality_queries import _bucket_sql, _hash_bucket  # noqa: E402

_REBAL_A, _REBAL_C = 1597334677, 2034674403
REBAL_TARGET_PCT = 60  # target mass: 60% of the smallest source


@register(
    "q_rebalance_sample",
    f"""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         m AS (SELECT min(n) AS mn FROM c),
         t AS (SELECT c.source,
                      CAST(floor(CAST(m.mn AS DOUBLE) / c.n * {REBAL_TARGET_PCT}
                                 + 0.5) AS BIGINT) AS thr
               FROM c, m)
    SELECT d.doc_id, d.source
    FROM documents d JOIN t ON d.source = t.source
    WHERE {_bucket_sql(_REBAL_A, _REBAL_C).replace("doc_id", "d.doc_id")}
          < t.thr
    """,
    doc="Deterministic mixture rebalancing: down-sample every source to "
    "~60% of the smallest source's mass — per-source keep threshold "
    "floor(min_n/n*60+0.5) over an LCG hash bucket of doc_id "
    "(cross-engine-identical arithmetic, no RNG, reproducible across "
    "runs/retries). The thresholds come from a tiny per-source aggregate "
    "broadcast back onto the scan: one partial-agg shuffle + a broadcast "
    "join, the companion sampler to q_domain_mix's weight accounting",
)
def q_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load(spark, sf_dir, "documents"))
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    mn = counts.agg(F.min("n").alias("mn"))
    thr = counts.crossJoin(mn).select(
        "source",
        F.floor(
            F.col("mn").cast("double") / F.col("n") * REBAL_TARGET_PCT + 0.5
        ).alias("thr"),
    )
    bucket = _hash_bucket("doc_id", _REBAL_A, _REBAL_C)
    return (
        docs.join(thr, "source")
        .filter(bucket < F.col("thr"))
        .select("doc_id", "source")
    )


# ------------------------------------------------------- token co-occurrence

COOC_VOCAB_K = 50  # PMI over the top-K document-frequency tokens
COOC_MIN_DOCS = 5  # pairs co-occurring in >= this many docs


def cooccurrence_pairs(
    docs: DataFrame, vocab_k: int = COOC_VOCAB_K, min_docs: int = COOC_MIN_DOCS
) -> DataFrame:
    """Vocabulary-bounded token co-occurrence with a PMI-style lift.

    ``pmi_ratio = P(a,b) / (P(a)·P(b))`` (= exp(PMI)) over the top-K
    document-frequency tokens — kept as the rational ratio rather than
    its log so both engines compute it from exact integers with one
    double division (no libm).

    Scale design: the vocabulary is K rows collected once and folded
    back in as a broadcast; per-document pair generation is JVM array
    arithmetic over the ≤K vocab tokens present (≤K² per doc, bounded by
    the vocabulary — never a token-stream self-join). The wide shuffles
    carry only the doc-frequency aggregate and the (ta, tb) pair counts.
    """
    # tokenize ONCE: every downstream need (doc-frequency counts, corpus
    # size, vocab-filtered per-doc arrays) derives from this materialized
    # (doc_id, distinct-token-array) frame — one scan of the corpus
    base = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    ).localCheckpoint(eager=True)
    toks = base.select("doc_id", F.explode("toks").alias("t"))
    dfc = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    vocab = dfc.orderBy(F.col("c").desc(), "t").limit(vocab_k).collect()
    n_docs = base.count()
    vocab_arr = F.array(*[F.lit(r["t"]) for r in vocab])
    spark = docs.sparkSession
    vocab_counts = spark.createDataFrame(
        [(r["t"], r["c"]) for r in vocab], "t string, c long"
    )
    pairs = (
        base.select(
            F.array_sort(F.array_intersect("toks", vocab_arr)).alias("vt")
        )
        .select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            "vt",
                            lambda x: F.transform(
                                "vt",
                                lambda y: F.struct(
                                    x.alias("ta"), y.alias("tb")
                                ),
                            ),
                        )
                    ),
                    lambda p: p.ta < p.tb,
                )
            ).alias("pr")
        )
        .select("pr.ta", "pr.tb")
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_docs)
    )
    return (
        pairs.join(
            F.broadcast(
                vocab_counts.select(F.col("t").alias("ta"), F.col("c").alias("c_a"))
            ),
            "ta",
        )
        .join(
            F.broadcast(
                vocab_counts.select(F.col("t").alias("tb"), F.col("c").alias("c_b"))
            ),
            "tb",
        )
        .select(
            "ta",
            "tb",
            "c_ab",
            "c_a",
            "c_b",
            _q(
                (F.col("c_ab").cast("double") * n_docs)
                / (F.col("c_a").cast("double") * F.col("c_b").cast("double")),
                10000,
            ).alias("pmi_ratio"),
        )
    )


@register(
    "q_cooccurrence",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      FROM documents
    ),
    dfc AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
    vocab AS (SELECT t, c FROM dfc ORDER BY c DESC, t LIMIT {COOC_VOCAB_K}),
    n AS (SELECT count(*) AS n FROM documents),
    vt AS (SELECT tok.doc_id, tok.t FROM tok JOIN vocab ON tok.t = vocab.t),
    pr AS (
      SELECT a.t AS ta, b.t AS tb, count(*) AS c_ab
      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.t < b.t
      GROUP BY 1, 2 HAVING count(*) >= {COOC_MIN_DOCS}
    )
    SELECT ta, tb, c_ab, va.c AS c_a, vb.c AS c_b,
           floor((CAST(c_ab AS DOUBLE) * (SELECT n FROM n))
                 / (CAST(va.c AS DOUBLE) * CAST(vb.c AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS pmi_ratio
    FROM pr
    JOIN vocab va ON pr.ta = va.t
    JOIN vocab vb ON pr.tb = vb.t
    """,
    doc="Token co-occurrence PMI over the top-50-DF vocabulary: "
    "per-doc pair generation is vocab-bounded JVM array arithmetic, "
    "the vocabulary folds back as a 50-row broadcast; the ratio form "
    "of PMI keeps the oracle libm-free",
)
def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cooccurrence_pairs(load(spark, sf_dir, "documents"))


# --------------------------------------------------- PPS systematic sampling

PPS_TARGET = 50  # aim for ~this many picks


def pps_sample(
    docs: DataFrame, weight_col: str = "n_chars", target: int = PPS_TARGET
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sample: walk the
    corpus in key order accumulating integral weights; a document is
    picked whenever the running total crosses a step boundary
    (step = total // target). Inclusion probability is ∝ weight, every
    document with weight ≥ step is picked with certainty, and the whole
    thing is deterministic integer arithmetic — no RNG, reproducible
    across engines and runs (the corpus-curation sampler for "sample
    tokens, not documents").

    Scale design: the running total is the two-pass bucketed
    ``plans.global_rank.global_cumsum`` — no SinglePartition window; the
    selection predicate is a per-row integer comparison.
    """
    cum, total = global_cumsum(
        docs.select("doc_id", weight_col), ["doc_id"], weight_col
    )
    step = max(1, total // target)
    # integer DIV, not float division: exact at any cumulative magnitude
    # (a double quotient goes lossy past 2^53 total weight)
    take = F.expr(
        f"_gcum DIV {step} > (_gcum - {weight_col}) DIV {step}"
    )
    return cum.filter(take).select("doc_id", weight_col)


@register(
    "q_pps_sample",
    f"""
    WITH c AS (
      SELECT doc_id, n_chars,
             sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               AS cum
      FROM documents
    ), t AS (
      SELECT greatest(1, sum(n_chars) // {PPS_TARGET}) AS step FROM documents
    )
    SELECT doc_id, n_chars
    FROM c, t
    WHERE cum // step > (cum - n_chars) // step
    """,
    doc="Deterministic PPS systematic sample (~50 docs drawn with "
    "probability proportional to n_chars): exact integer running total "
    "via the two-pass bucketed global cumsum (no SinglePartition "
    "window), step-boundary selection — the token-weighted sampler a "
    "curation pipeline uses instead of uniform doc sampling",
)
def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pps_sample(load(spark, sf_dir, "documents"))


# ------------------------------------------------------------ dataset card

CARD_NGRAM = 8  # boilerplate gram width (matches q_boilerplate)


def dataset_card(docs: DataFrame) -> DataFrame:
    """One-row dataset card — the summary table a corpus release ships
    with (HuggingFace-card style): volume (docs/tokens/chars), diversity
    (sources/langs), exact-duplicate rate, mean doc length, and token
    type-token ratio. Composes the corpus in ONE lazy plan of 1-row
    aggregates folded together; every ratio divides exact BIGINTs.

    The heavy inputs reuse the registered operators' shapes: duplicate
    rate keys on the same canonical-token ``xxhash64`` fingerprint as
    q_dedup_exact; distinct tokens shuffle 8-byte token hashes like the
    count tables in q_bigram_lm (hash-vs-string contract, collisions
    ~|vocab|²/2⁶⁴ — and the ORACLE uses the string form, so the parity
    gate itself verifies the contract on live data).
    """
    tk = F.split("text", " ")
    # Two branches over docs, NOT one exploded stream: the per-doc
    # stats need no explode, and regrouping the exploded token stream
    # by a 6-column doc key (the round-9 shape) shuffled |corpus
    # tokens| wide rows just to recover one row per document — the
    # dominant cost of the sf10 audit's 227 s reading. Token-type
    # distinct is the only aggregate that needs the exploded stream,
    # and it shuffles 8-byte hashes after per-partition partial dedup.
    per_doc = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(tk).alias("toks"),
        F.length("text").alias("chars"),
        F.xxhash64(F.array_join(F.array_sort(tk), " ")).alias("fp"),
    )
    vol = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("n_tokens"),
        F.sum("chars").alias("n_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("fp").alias("n_unique_docs"),
    )
    toks = docs.select(F.explode(tk).alias("tok")).agg(
        F.countDistinct(F.xxhash64("tok")).alias("n_token_types")
    )
    return vol.crossJoin(F.broadcast(toks)).select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_sources",
        "n_langs",
        _q(
            (F.col("n_docs") - F.col("n_unique_docs")) / F.col("n_docs"),
            1_000_000,
        ).alias("dup_rate"),
        _q(F.col("n_tokens") / F.col("n_docs"), 10000).alias(
            "mean_doc_tokens"
        ),
        "n_token_types",
        _q(F.col("n_token_types") / F.col("n_tokens"), 1_000_000).alias(
            "corpus_ttr"
        ),
    )


@register(
    "q_dataset_card",
    """
    WITH base AS (
      SELECT doc_id, source, lang,
             len(string_split(text, ' ')) AS toks,
             length(text) AS chars,
             array_to_string(list_sort(string_split(text, ' ')), ' ') AS fp,
             text
      FROM documents
    ), vol AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens,
             CAST(sum(chars) AS BIGINT) AS n_chars,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_docs
      FROM base
    ), tt AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS n_token_types
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    )
    SELECT n_docs, n_tokens, n_chars, n_sources, n_langs,
           floor((n_docs - n_unique_docs) * 1.0 / n_docs * 1000000 + 0.5)
             / 1000000 AS dup_rate,
           floor(n_tokens * 1.0 / n_docs * 10000 + 0.5) / 10000
             AS mean_doc_tokens,
           n_token_types,
           floor(n_token_types * 1.0 / n_tokens * 1000000 + 0.5) / 1000000
             AS corpus_ttr
    FROM vol, tt
    """,
    doc="One-row dataset card (release-summary style): volume, source/"
    "language diversity, exact-duplicate rate (canonical-token "
    "fingerprint, the q_dedup_exact key), mean doc length, corpus "
    "type-token ratio. One lazy plan of 1-row aggregates; Spark "
    "shuffles 8-byte hashes where the oracle uses strings, so the "
    "parity gate verifies the hash-vs-string contract itself",
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dataset_card(load(spark, sf_dir, "documents"))
