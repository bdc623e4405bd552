"""Declared text-analysis queries (extension ops E4/E5/E6 + north-star
text-analysis list: token counting, quality scoring, language-ID,
fingerprinting, lexicon sentiment, JSON extraction, TF-IDF).

Everything except TF-IDF has an exact DuckDB oracle — the column
expressions were chosen so both engines compute bit-identical results
(split semantics, fold order, regex dialect all verified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quantize import q as _q
from ..functions.text import (
    BPE_PATTERN,
    MOD,
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    punct_ratio,
    stopword_ratio,
    token_count_bpe,
    token_count_whitespace,
)
from ..registry import load, register

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "q_text_stats",
    f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           round(len(list_filter(string_split(text, ' '),
                                 w -> w IN ({_STOP_SQL}))) * 1.0
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           round(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) * 1.0
                 / length(lower(text)), 4) AS punct_ratio
    FROM documents
    """,
    doc="Quality scoring: length/stopword/punctuation stats — one narrow "
    "pass, no shuffle, all codegen",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        token_count_whitespace("text").alias("n_tokens"),
        F.round(stopword_ratio("text"), 4).alias("stopword_ratio"),
        F.round(punct_ratio("text"), 4).alias("punct_ratio"),
    )


@register(
    "q_token_count",
    f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens
    FROM documents
    """,
    doc="Token counting: whitespace + BPE-ish regex pre-tokenizer "
    "(regexp_count, JVM regex)",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_whitespace("text").alias("n_ws_tokens"),
        token_count_bpe("text").cast("long").alias("n_bpe_tokens"),
    )


def _char_counts_sorted(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, counts): per-doc ascending distinct-char
    occurrence counts, in ONE Arrow histogram pass (guide §4.2).

    Replaces the per-distinct-char ``length(text) − length(replace(
    text, c))`` literal scans — O(|text| · |distinct chars|) byte work
    per row, ~25 full passes over every document on this corpus and
    still the dominant cost of q_char_entropy at sf10 after the
    round-10 literal-scan rewrite. Each Arrow batch computes every
    document's histogram in one vectorized ``np.bincount`` over
    (doc index × 128 + byte) keys — a single pass over the batch's
    contiguous UTF-8 buffer, no per-row Python.

    Identity: the counts are exact integers (occurrences of each
    distinct character), sorted ascending exactly like the JVM
    ``array_sort`` — the same multiset in the same order — and the
    entropy fold itself STAYS in the JVM, so every floating-point
    operation downstream is unchanged. Only integers cross the Python
    boundary; there is no FP-identity risk (pinned bit-identical to
    the pure-JVM formulation in tests/test_text_arrow.py).

    The vectorized path requires ASCII (byte == code point); a
    non-ASCII batch falls back to exact per-doc code-point counting
    (``collections.Counter`` over the str — Python iterates code
    points, matching Spark's split('') + length() semantics for all
    BMP text; the corpus and both engines' parity fixtures are ASCII).
    """
    from pyspark.sql import types as T

    src = docs.filter(F.length("text") > 0).select("doc_id", "text")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.IntegerType()),
            T.StructField("counts", T.ArrayType(T.IntegerType())),
        ]
    )

    def hist(batches):
        from collections import Counter

        import numpy as np
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids, txt = b.column(0), b.column(1)
            if txt.null_count:
                raise ValueError("char_entropy: null text row")
            odt = (
                np.int64 if pa.types.is_large_string(txt.type) else np.int32
            )
            off = np.frombuffer(txt.buffers()[1], dtype=odt)[
                txt.offset : txt.offset + n + 1
            ]
            data = np.frombuffer(txt.buffers()[2], dtype=np.uint8)[
                off[0] : off[-1]
            ]
            lens = np.diff(off).astype(np.int64)
            if data.size and data.max() >= 0x80:
                strs = txt.to_pylist()
                percounts = [
                    np.sort(
                        np.fromiter(
                            Counter(s).values(), dtype=np.int32
                        )
                    )
                    for s in strs
                ]
                nz = np.asarray([len(c) for c in percounts], dtype=np.int64)
                flat = (
                    np.concatenate(percounts)
                    if percounts
                    else np.empty(0, np.int32)
                )
                nch = np.asarray([len(s) for s in strs], dtype=np.int32)
            else:
                doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
                h = np.bincount(
                    doc_idx * 128 + data, minlength=n * 128
                ).reshape(n, 128)
                s = np.sort(h, axis=1).ravel()
                flat = s[s > 0].astype(np.int32)
                nz = (h > 0).sum(axis=1)
                nch = lens.astype(np.int32)
            offsets = pa.array(
                np.concatenate(([0], np.cumsum(nz))).astype(np.int32)
            )
            counts = pa.ListArray.from_arrays(
                offsets, pa.array(flat, pa.int32())
            )
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(nch, pa.int32()), counts],
                names=["doc_id", "n_chars", "counts"],
            )

    return src.mapInArrow(hist, schema=out_schema)


@register(
    "q_char_entropy",
    """
    SELECT doc_id,
           length(text) AS n_chars,
           floor(list_sum(list_transform(
                   list_sort(list_transform(list_distinct(string_split(text, '')),
                             c -> len(list_filter(string_split(text, ''),
                                      x -> x = c)))),
                   c -> -(c * 1.0 / length(text))
                        * log2(c * 1.0 / length(text))))
                 * 10000 + 0.5) / 10000 AS char_entropy
    FROM documents
    WHERE length(text) > 0
    """,
    doc="Per-document character-level Shannon entropy — the classic "
    "compression-proxy quality signal (gibberish and repeated-char spam "
    "sit at the entropy extremes; natural text clusters ~4 bits/char). "
    "Occurrence counts come from one vectorized Arrow histogram pass "
    "(see _char_counts_sorted: integers only cross the boundary); the "
    "-(p log2 p) fold over the ASCENDING count array stays a JVM "
    "aggregate — identical IEEE chain and fold order to the previous "
    "all-JVM formulation (array_sort'd counts), pinned bit-identical "
    "in tests/test_text_arrow.py. Quantization is the engine-exact "
    "floor(x*s+0.5)/s form; zero shuffle either way",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    entropy = F.expr(
        "aggregate(counts, cast(0.0 as double),"
        "  (acc, c) -> acc - (c / n_chars) * log2(c / n_chars))"
    )
    return _char_counts_sorted(docs).select(
        "doc_id",
        "n_chars",
        (F.floor(entropy * 10000 + 0.5) / 10000).alias("char_entropy"),
    )


@register(
    "q_lang_id",
    """
    WITH s AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS en,
        len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und'))) AS de,
        len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','les'))) AS fr
      FROM documents)
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN en > 0 AND en >= de AND en >= fr THEN 'en'
                WHEN de > 0 AND de >= fr THEN 'de'
                WHEN fr > 0 THEN 'fr'
                ELSE 'und' END AS detected_lang
    FROM s
    """,
    doc="Language-ID marker-token heuristic (argmax of per-language marker "
    "counts, deterministic tiebreak)",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id("text").alias("detected_lang"),
    )


@register(
    "q_fingerprint",
    f"""
    SELECT doc_id,
      list_reduce(list_prepend(0::BIGINT,
        list_transform(string_split(text, ' '),
          w -> list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                 (a, c) -> (a*17 + c) % {MOD}))),
        (acc, h) -> (acc*31 + h) % {MOD}) AS fingerprint
    FROM documents
    """,
    doc="Rolling-hash document fingerprint (polynomial fold over tokens; "
    "bit-identical across engines — exact-dup key at scale)",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


POSITIVE = ("fast", "big")
NEGATIVE = ("slow", "small")


@register(
    "q_sentiment_lexicon",
    f"""
    SELECT doc_id,
           len(list_filter(string_split(text,' '),
                           w -> w IN ({', '.join(f"'{w}'" for w in POSITIVE)})))
         - len(list_filter(string_split(text,' '),
                           w -> w IN ({', '.join(f"'{w}'" for w in NEGATIVE)})))
           AS sentiment_score
    FROM documents
    """,
    doc="Lexicon sentiment scoring as one per-row token-filter "
    "expression (the lexicon is a plan-time literal set, so the EDBT-"
    "2016 explode + broadcast-join pattern degenerates to a map-only "
    "scan: zero exchanges, and per-query core-scaling is no longer "
    "inverted by round-robin repartitioning a tiny fact side)",
)
def q_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # The 4-word lexicon is a compile-time constant: score each doc with
    # two array-filter sizes instead of explode + broadcast join +
    # re-aggregation on doc_id. Same integer per doc (token multiset
    # membership count difference), one scan, no shuffle.
    toks = F.split("text", " ")
    n_pos = F.size(F.filter(toks, lambda w: w.isin(*POSITIVE)))
    n_neg = F.size(F.filter(toks, lambda w: w.isin(*NEGATIVE)))
    return docs.select(
        "doc_id", (n_pos - n_neg).cast("long").alias("sentiment_score")
    )


@register(
    "q_json_extract",
    """
    SELECT event_id, user_id,
           json_extract_string(props, '$.k')::BIGINT AS prop_k
    FROM events
    """,
    doc="JSON property extraction from the events.props string column "
    "(get_json_object — no full JSON parse, single-key path scan)",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@register(
    "q_tfidf",
    None,  # hash-bucketed TF-IDF weights are engine-specific → rows-only
    doc="TF-IDF via HashingTF+IDF (MLlib): Arrow-free, JVM-side sparse "
    "vectors; output is (doc_id, l2 norm of tf-idf vector). The norm "
    "folds the SPARSE values array (unwrap_udt) — ~|doc| nonzeros — "
    "not the 16384-wide densified vector; the skipped terms are exact "
    "0.0² adds, so the value is bit-identical to the dense fold "
    "(asserted in tests/test_extensions.py)",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer
    from pyspark.sql.functions import unwrap_udt

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = Tokenizer(inputCol="text", outputCol="words")
    tf = HashingTF(inputCol="words", outputCol="tf", numFeatures=1 << 14)
    words = tok.transform(docs)
    tfd = tf.transform(words)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tfd)
    out = idf.transform(tfd)
    # SparseVector values only: a 16384-element densified fold per doc
    # was the sf10 audit's cost (the zero terms add exactly 0.0 each,
    # so the sparse fold is bit-identical)
    vals = unwrap_udt(F.col("tfidf")).getField("values")
    norm = F.sqrt(F.aggregate(vals, F.lit(0.0), lambda a, x: a + x * x))
    return out.select("doc_id", F.round(norm, 4).alias("tfidf_norm"))


@register(
    "q_tfidf_exact",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), weighted AS (
      SELECT tf.doc_id, tf.term,
             floor(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0)
                   * 10000 + 0.5) / 10000 AS weight
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, term, weight,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY weight DESC, term) AS rk
      FROM weighted
    )
    SELECT doc_id, term, weight, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    """,
    doc="EXACT TF-IDF (sklearn-style smooth idf: tf * (ln((N+1)/(df+1))+1)) "
    "with per-doc top-3 terms — the oracle-checkable companion to the "
    "hash-bucketed MLlib q_tfidf. Explode -> partial-agg tf -> tiny df "
    "aggregate joined back (AQE broadcasts it) -> rank window over the "
    "already-aggregated (doc, term) stream. N rides in as a broadcast "
    "1-row aggregate, never a driver collect; quantization uses the "
    "engine-exact floor form and deterministic (weight, term) tie-break",
)
def q_tfidf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..plans import ensure_parallelism

    docs = load(spark, sf_dir, "documents")
    tok = ensure_parallelism(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    weight = (
        F.floor(
            F.col("tf")
            * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            * 10000
            + 0.5
        )
        / 10000
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), "term")
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", weight.alias("weight"))
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "weight", "rk")
    )


@register(
    "q_redact",
    r"""
    SELECT event_id,
           regexp_replace(props, '"(k|v)":', '"<KEY>":', 'g')   AS props_keymasked,
           regexp_replace(props, '-?\d+\.?\d*', '<NUM>', 'g')   AS props_nummasked
    FROM events
    """,
    doc="PII-style masking via global regexp_replace on the events.props "
    "JSON strings: key-name masking and numeric-literal redaction. The "
    "curation building block for scrubbing emails/phones/ids from a "
    "training corpus - per-row regex, zero shuffle, scan-parallel "
    "(Spark's regexp_replace is global by default; DuckDB needs 'g')",
)
def q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.regexp_replace("props", '"(k|v)":', '"<KEY>":').alias("props_keymasked"),
        F.regexp_replace("props", r"-?\d+\.?\d*", "<NUM>").alias("props_nummasked"),
    )


FEATURE_BUCKETS = 64


@register(
    "q_feature_hash",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(string_split(t.w, ''), c -> ascii(c)::BIGINT)),
               (a, c) -> (a*17 + c) % {MOD}) % {FEATURE_BUCKETS} AS bucket
      FROM documents, unnest(string_split(text, ' ')) AS t(w)
    )
    SELECT doc_id, bucket, count(*) AS n
    FROM toks GROUP BY doc_id, bucket
    """,
    doc="Hashing-trick sparse feature vectors (the HashingTF shape, but "
    "cross-engine-exact): token -> polynomial char fold mod 1e9+7 -> "
    "bucket mod 64 -> per-(doc, bucket) counts. explode + map-side "
    "partial agg, ONE exchange on (doc_id, bucket); the fixed-width "
    "sparse encoding that feeds linear classifiers without a vocabulary "
    "build (no second pass, no driver-side dictionary — the property "
    "that matters at 100 TB)",
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok_hash = (
        f"aggregate(split(w, ''), 0L, (a, c) -> (a*17 + ascii(c)) % {MOD})"
        f" % {FEATURE_BUCKETS}"
    )
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .select("doc_id", F.expr(tok_hash).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_langid_eval",
    """
    WITH s AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS en,
        len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und'))) AS de,
        len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','les'))) AS fr
      FROM documents
    ), d AS (
      SELECT lang AS labeled_lang,
             CASE WHEN en > 0 AND en >= de AND en >= fr THEN 'en'
                  WHEN de > 0 AND de >= fr THEN 'de'
                  WHEN fr > 0 THEN 'fr'
                  ELSE 'und' END AS detected_lang
      FROM s
    ), tot AS (
      SELECT labeled_lang, CAST(count(*) AS BIGINT) AS n_labeled
      FROM d GROUP BY labeled_lang
    )
    SELECT d.labeled_lang, d.detected_lang,
           CAST(count(*) AS BIGINT) AS n,
           floor(count(*) * 1.0 / min(t.n_labeled) * 10000 + 0.5) / 10000
             AS share_of_labeled
    FROM d JOIN tot t USING (labeled_lang)
    GROUP BY d.labeled_lang, d.detected_lang
    """,
    doc="Language-ID confusion matrix: the q_lang_id marker heuristic "
    "evaluated against the labeled lang column — per (labeled, "
    "detected) pair, count and share of the labeled class (row-"
    "normalized recall cells). The eval that decides whether the cheap "
    "heuristic is good enough before a model-based identifier is paid "
    "for. Two tiny aggregates over one narrow scan",
)
def q_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        F.col("lang").alias("labeled_lang"),
        lang_id("text").alias("detected_lang"),
    )
    tot = d.groupBy("labeled_lang").agg(F.count(F.lit(1)).alias("n_labeled"))
    return (
        d.groupBy("labeled_lang", "detected_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(tot), "labeled_lang")
        .select(
            "labeled_lang",
            "detected_lang",
            "n",
            _q(F.col("n") / F.col("n_labeled"), 10000).alias(
                "share_of_labeled"
            ),
        )
    )
