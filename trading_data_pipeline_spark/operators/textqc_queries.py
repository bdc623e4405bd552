"""Corpus lexical-statistics operators (round-6 batch 3) — the
vocabulary-shape diagnostics an LLM-data pipeline runs before mixing
sources (reference has no text surface; extension per SURVEY §2.f):

- **q_ttr**: per-document type-token ratio (lexical diversity) —
  distinct whitespace tokens / total tokens, exact rational, plus the
  repeated-token count. Low TTR flags template/spam docs the repetition
  and boilerplate screens then inspect.
- **q_token_coverage**: per-source vocabulary concentration — the
  number of distinct tokens needed to cover ≥90% of the source's token
  mass (cumulative sum over per-token counts in (count DESC, token)
  order) and the top-1 token share. The Zipf-shape summary: a source
  whose mass hides in a handful of tokens is boilerplate-heavy.
- **q_ngram_novelty**: ingestion-order 8-gram novelty — sources ranked
  lexicographically (the deterministic stand-in for arrival order);
  for each source, the fraction of its distinct 8-grams never seen in
  any earlier source. The marginal-value curve of adding a source to
  the corpus: novelty → 0 means the source is redundant. First-seen
  attribution is ``min(source_rank)`` per gram — one aggregate over
  hashed grams, no cross-source self-join.

Exactness: everything is token counting — integer sums and one final
division per ratio (IEEE-deterministic). The Spark side shuffles hashed
grams (8-byte keys, xxhash64); the oracle groups the gram STRINGS — the
counts agree unless xxhash64 collides inside one source's gram set
(~10⁻¹⁰ at gate scale; a collision would fail parity loudly).

Scale: q_token_coverage's per-source window runs over the AGGREGATED
(source, token) vocabulary (Heaps-law sublinear in corpus size);
novelty is a distinct + min-aggregate over hashed grams — the same
shuffle shape as the dedup family's fingerprint pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.quantize import q as _q
from ..registry import load, register

TTR_SCALE = 10**6
COVERAGE_PCT = 90  # integer percent — coverage test stays integral
NGRAM_N = 8


def ttr(docs: DataFrame) -> DataFrame:
    """Per-doc type-token ratio over whitespace tokens. One narrow pass:
    split → size + array_distinct size; no shuffle at all."""
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        _q(
            F.size(F.array_distinct(toks)) / F.size(toks), TTR_SCALE
        ).alias("ttr"),
    )


@register(
    "q_ttr",
    f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT)
             AS n_types,
           floor(CAST(len(list_distinct(string_split(text, ' ')))
                      AS DOUBLE)
                 / len(string_split(text, ' ')) * {TTR_SCALE} + 0.5)
             / {TTR_SCALE} AS ttr
    FROM documents
    """,
    doc="Per-document type-token ratio (lexical diversity) — distinct /"
    " total whitespace tokens, exact rational quantized 1e-6. Pure "
    "narrow map, zero shuffles",
)
def q_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ttr(load(spark, sf_dir, "documents"))


def token_coverage(docs: DataFrame, pct: int = COVERAGE_PCT) -> DataFrame:
    """Per-source: distinct-token count, tokens needed for ≥pct% of
    token mass, and top-1 token share. The cumulative window runs in
    (count DESC, token ASC) order over the aggregated vocabulary."""
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    counts = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("source")
        .orderBy(F.desc("c"), F.asc("tok"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("source")
    with_cum = counts.select(
        "source",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("tot"),
        F.max("c").over(wall).alias("top1"),
        F.count(F.lit(1)).over(wall).alias("vocab"),
    )
    # integer coverage test: cum·100 ≥ pct·tot
    return (
        with_cum.filter(F.col("cum") * 100 >= F.lit(pct) * F.col("tot"))
        .groupBy("source")
        .agg(
            F.max("vocab").alias("vocab_size"),
            F.count(F.lit(1)).alias("_above"),
            F.max("tot").alias("total_tokens"),
            _q(F.max("top1") / F.max("tot"), TTR_SCALE).alias("top1_share"),
        )
        .select(
            "source",
            "vocab_size",
            (F.col("vocab_size") - F.col("_above") + 1).alias(
                "tokens_for_cover"
            ),
            "total_tokens",
            "top1_share",
        )
    )


@register(
    "q_token_coverage",
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ), counts AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, tok
    ), cum AS (
      SELECT source, c,
             CAST(sum(c) OVER (PARTITION BY source
                               ORDER BY c DESC, tok
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS tot,
             CAST(max(c) OVER (PARTITION BY source) AS BIGINT) AS top1,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS vocab
      FROM counts
    )
    SELECT source,
           CAST(max(vocab) AS BIGINT) AS vocab_size,
           CAST(max(vocab) - count(*) + 1 AS BIGINT) AS tokens_for_cover,
           CAST(max(tot) AS BIGINT) AS total_tokens,
           floor(CAST(max(top1) AS DOUBLE) / max(tot) * {TTR_SCALE} + 0.5)
             / {TTR_SCALE} AS top1_share
    FROM cum WHERE cum * 100 >= {COVERAGE_PCT} * tot
    GROUP BY source
    """,
    doc="Per-source vocabulary concentration: tokens needed to cover "
    "90% of token mass (cumulative window over the aggregated "
    "vocabulary in count-DESC order) + top-1 token share — the "
    "Zipf-shape boilerplate screen. All-integer coverage test",
)
def q_token_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_coverage(load(spark, sf_dir, "documents"))


def _gram_expr(n: int) -> str:
    # contiguous n-token windows as single strings, Spark SQL side.
    # The CASE guard matters: Spark's sequence(1, 0) yields a DESCENDING
    # [1, 0] (not empty) — short docs must produce an empty gram list.
    # Windows come from arrays_zip over n shifted slices: indexing
    # split(text) INSIDE the transform lambda would inline and re-split
    # the document per gram element — O(|doc|²) per doc (the
    # q_repetition/hashed_shingles hazard).
    m = f"size(split(text, ' ')) - {n - 1}"
    sl = ", ".join(f"slice(split(text, ' '), {j + 1}, {m})" for j in range(n))
    # SQL arrays_zip names unaliased fields by position: s.`0`, s.`1`, …
    cw = ", ".join(f"s.`{j}`" for j in range(n))
    return f"""
      CASE WHEN size(split(text, ' ')) >= {n}
           THEN transform(arrays_zip({sl}), s -> concat_ws(' ', {cw}))
           ELSE array()
      END
    """


def ngram_novelty(docs: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """Per-source novelty in lexicographic source-rank order: the share
    of the source's distinct n-grams first seen at that source. Grams
    shuffle as xxhash64 keys; first-seen = min(source_rank) per gram."""
    # rank the DISTINCT source set (bounded — source count, not rows),
    # then broadcast it back: no global window ever touches doc rows
    src_rank = docs.select("source").distinct().select(
        "source",
        F.dense_rank().over(Window.orderBy("source")).alias("srank"),
    )
    # ensure_parallelism before the gram explode: the per-row work
    # (n-gram build + hash + map-side distinct) dwarfs a row's shuffle
    # cost, and the raw scan's partitioning left half the cores idle
    # with straggling tasks (sf10: the explode stage was 31 s wall for
    # 113 CPU-s on 15 uneven input splits — 75 % idle slot time).
    from ..plans import ensure_parallelism

    grams = ensure_parallelism(docs).join(F.broadcast(src_rank), "source").select(
        "srank",
        "source",
        F.explode(F.expr(_gram_expr(n))).alias("g"),
    ).select("srank", "source", F.xxhash64("g").alias("gh"))
    per_source = grams.distinct()
    # first-seen rank via a window over the gram key, NOT an aggregate
    # joined back: the join-back re-computed the distinct subtree on
    # both sides and — with the aggregate side size-estimated under the
    # broadcast threshold at large SF — planned a multi-million-entry
    # driver-built broadcast (the sf10 sweep OOM'd it at the default
    # heap). The window needs the same single gh exchange and nothing
    # else; per-gram groups are source-bounded, so the buffer is tiny.
    first = F.min("srank").over(Window.partitionBy("gh"))
    return (
        per_source.withColumn("first_rank", first)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("srank") == F.col("first_rank"), 1).otherwise(0)
            ).alias("n_new"),
        )
        .select(
            "source",
            "n_grams",
            "n_new",
            _q(F.col("n_new") / F.col("n_grams"), TTR_SCALE).alias(
                "novelty"
            ),
        )
    )


@register(
    "q_ngram_novelty",
    f"""
    WITH ranked AS (
      SELECT source, text,
             dense_rank() OVER (ORDER BY source) AS srank
      FROM documents
    ), toks AS (
      SELECT srank, source, string_split(text, ' ') AS t FROM ranked
    ), grams AS (
      SELECT DISTINCT srank, source,
             unnest(CASE WHEN len(t) >= {NGRAM_N}
                    THEN list_transform(
                           range(1, len(t) - {NGRAM_N - 2}),
                           i -> array_to_string(
                                  t[i : i + {NGRAM_N - 1}], ' '))
                    ELSE []::VARCHAR[] END) AS g
      FROM toks
    ), first_seen AS (
      SELECT g, min(srank) AS first_rank FROM grams GROUP BY g
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN srank = first_rank THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           floor(CAST(sum(CASE WHEN srank = first_rank THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * {TTR_SCALE} + 0.5)
             / {TTR_SCALE} AS novelty
    FROM grams JOIN first_seen USING (g)
    GROUP BY source
    """,
    doc="Ingestion-order 8-gram novelty per source (lexicographic rank "
    "= deterministic arrival order): share of the source's distinct "
    "grams first seen there — min(source_rank) per hashed gram, the "
    "marginal-value curve for corpus mixing. No cross-source self-join",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_novelty(load(spark, sf_dir, "documents"))


FLESCH_SCALE = 10**4
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def encoding_qc(docs: DataFrame) -> DataFrame:
    """Per-source encoding hygiene: documents containing U+FFFD
    replacement characters (the scar mojibake leaves after a bad decode),
    raw C0 control characters (minus \\t\\n\\r), and the total count of
    non-ASCII characters. Pure narrow string expressions — zero
    Python, one aggregation exchange."""
    has_repl = F.contains("text", F.lit("�")).cast("int")
    has_ctrl = F.col("text").rlike(_CTRL_RE).cast("int")
    n_non_ascii = F.length(
        F.regexp_replace("text", r"[\x00-\x7f]", "")
    )
    return (
        docs.select(
            "source",
            has_repl.alias("r"),
            has_ctrl.alias("c"),
            n_non_ascii.alias("na"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("r").alias("n_replacement"),
            F.sum("c").alias("n_control"),
            F.sum("na").alias("n_non_ascii_chars"),
        )
    )


@register(
    "q_encoding_qc",
    r"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN contains(text, chr(65533))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_replacement,
           CAST(sum(CASE WHEN regexp_matches(text,
                         '[\x00-\x08\x0b\x0c\x0e-\x1f]')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
           CAST(sum(length(regexp_replace(text, '[\x00-\x7f]', '', 'g')))
                AS BIGINT) AS n_non_ascii_chars
    FROM documents GROUP BY source
    """,
    doc="Per-source encoding hygiene screen: U+FFFD replacement-char "
    "docs (mojibake scars), raw C0 control chars, non-ASCII char "
    "volume — the decode-quality gate before any text op. Narrow "
    "string expressions, one exchange",
)
def q_encoding_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return encoding_qc(load(spark, sf_dir, "documents"))


def readability(docs: DataFrame) -> DataFrame:
    """Per-source mean Flesch reading ease with the classic vowel-group
    syllable heuristic. Per-doc scores are fixed to 1e-4 BIGINTs before
    the per-source mean (integer sum, one division) — no float
    accumulation. Counts come from the same RE2/Java-compatible
    character-class regexes on both engines."""
    words = F.regexp_count("text", F.lit(r"[A-Za-z]+"))
    sents = F.greatest(F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1))
    syll = F.greatest(
        F.regexp_count(F.lower("text"), F.lit(r"[aeiouy]+")), F.lit(0)
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sents.cast("double"))
        - F.lit(84.6) * (syll.cast("double") / words.cast("double"))
    )
    fq = F.floor(flesch * FLESCH_SCALE + F.lit(0.5)).cast("long")
    return (
        docs.filter(words > 0)
        .select("source", fq.alias("fq"), words.alias("w"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w").alias("total_words"),
            (
                F.sum("fq") / (F.count(F.lit(1)) * F.lit(FLESCH_SCALE))
            ).alias("flesch_mean"),
        )
    )


@register(
    "q_readability",
    f"""
    WITH d AS (
      SELECT source,
             len(regexp_extract_all(text, '[A-Za-z]+')) AS w,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy
      FROM documents
    ), f AS (
      SELECT source, w,
             CAST(floor((206.835
                         - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                         - 84.6 * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)))
                        * {FLESCH_SCALE} + 0.5) AS BIGINT) AS fq
      FROM d WHERE w > 0
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS total_words,
           CAST(sum(fq) AS BIGINT) / (count(*) * {FLESCH_SCALE})
             AS flesch_mean
    FROM f GROUP BY source
    """,
    doc="Per-source mean Flesch reading ease (vowel-group syllable "
    "heuristic; sentence floor 1) — per-doc scores fixed to 1e-4 "
    "BIGINTs before the mean so nothing float accumulates. The "
    "complexity-mix gate for corpus curation",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return readability(load(spark, sf_dir, "documents"))


# -------------------------------------------------- tokenizer fertility

FERT_SCALE = 10_000  # 1e-4 fixing for the per-source ratios


def tokenizer_fertility(docs: DataFrame) -> DataFrame:
    """Per-source tokenizer fertility: bytes/token, chars/token and
    tokens/doc for the whitespace tokenizer — THE table that decides
    packing budgets and flags sources whose byte-per-token cost blows
    the training budget (CJK, code, mojibake all surface here before a
    real BPE run is paid for).

    Zero-shuffle per-doc arithmetic (token count, char/byte lengths are
    narrow expressions), one exchange on ``source``; the ratios divide
    exact BIGINT sums and quantize 1e-4 — no float accumulation.
    """
    per_doc = docs.select(
        "source",
        F.size(F.split("text", " ")).alias("toks"),
        F.length("text").alias("chars"),
        F.octet_length("text").alias("bytes"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("total_tokens"),
        _q(F.sum("chars") / F.sum("toks"), FERT_SCALE).alias(
            "chars_per_token"
        ),
        _q(F.sum("bytes") / F.sum("toks"), FERT_SCALE).alias(
            "bytes_per_token"
        ),
        _q(F.sum("toks") / F.count(F.lit(1)), FERT_SCALE).alias(
            "tokens_per_doc"
        ),
    )


@register(
    "q_fertility",
    f"""
    WITH d AS (
      SELECT source,
             len(string_split(text, ' ')) AS toks,
             length(text) AS chars,
             strlen(text) AS bytes
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           floor(CAST(sum(chars) AS BIGINT) * 1.0
                 / CAST(sum(toks) AS BIGINT) * {FERT_SCALE} + 0.5)
             / {FERT_SCALE} AS chars_per_token,
           floor(CAST(sum(bytes) AS BIGINT) * 1.0
                 / CAST(sum(toks) AS BIGINT) * {FERT_SCALE} + 0.5)
             / {FERT_SCALE} AS bytes_per_token,
           floor(CAST(sum(toks) AS BIGINT) * 1.0
                 / count(*) * {FERT_SCALE} + 0.5)
             / {FERT_SCALE} AS tokens_per_doc
    FROM d GROUP BY source
    """,
    doc="Tokenizer-fertility audit per source: bytes/token, chars/token, "
    "tokens/doc under the whitespace tokenizer — the packing-budget and "
    "cost-anomaly table (CJK/code/mojibake sources surface as fertility "
    "outliers). Exact BIGINT sums, 1e-4-fixed ratios, one exchange",
)
def q_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenizer_fertility(load(spark, sf_dir, "documents"))


# ---------------------------------------------- within-doc repetition

REP_N = 3           # n-gram order for the repetition screen
REP_FLAG = 0.2      # dup-gram fraction above which a doc is flagged


def repetition(docs: DataFrame, n: int = REP_N, flag: float = REP_FLAG) -> DataFrame:
    """Within-document repetition screen (the Gopher-rules "repeated
    n-gram fraction"): per doc, the share of word ``n``-grams that are
    duplicates of an earlier gram in the SAME doc — template spam, keyword
    stuffing, and decode loops score high while natural prose stays low.

    Zero shuffle: grams are per-row 64-bit hash arrays (token hashes
    folded with xxhash64, no string building — the hashed_shingles trick
    WITHOUT its distinct), and dup_frac = 1 − |distinct|/|total| is pure
    array arithmetic. The oracle counts distinct gram STRINGS; counts
    agree unless xxhash64 collides within one doc's gram set (~|g|²/2⁶⁴).
    Docs shorter than ``n`` tokens carry no gram evidence and are
    excluded on both engines.
    """
    toks = F.split(F.col("text"), " ")
    tokh = F.transform(toks, lambda w: F.xxhash64(w))
    # n shifted slices zipped, NOT element_at inside the lambda — the
    # indexed form re-evaluates the whole token-hash transform per gram
    # element (O(|doc|²) per doc; measured 11x slower at sf0.1). Same
    # rewrite as dedup.hashed_shingles, kept KEEPING duplicates (the
    # screen's measurand is the duplicate fraction).
    m = F.size(toks) - (n - 1)
    z = F.arrays_zip(
        *[F.slice(tokh, j + 1, m).alias(f"t{j}") for j in range(n)]
    )
    grams = F.transform(z, lambda s: F.xxhash64(*[s[f"t{j}"] for j in range(n)]))
    out = docs.filter(F.size(toks) >= n).select(
        "doc_id",
        "source",
        F.size(grams).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_unique"),
    )
    dup = (F.col("n_grams") - F.col("n_unique")) / F.col("n_grams")
    return out.select(
        "doc_id",
        "source",
        "n_grams",
        "n_unique",
        _q(dup, TTR_SCALE).alias("dup_frac"),
        (dup >= flag).cast("int").alias("flagged"),
    )


@register(
    "q_repetition",
    f"""
    WITH g AS (
      SELECT doc_id, source,
             list_filter(
               list_transform(
                 list_zip(t, t[2:], t[3:]),
                 z -> z[1] || chr(31) || z[2] || chr(31) || z[3]),
               x -> x IS NOT NULL) AS grams
      FROM (SELECT doc_id, source, string_split(text, ' ') AS t
            FROM documents)
      WHERE len(t) >= {REP_N}
    )
    SELECT doc_id, source,
           CAST(len(grams) AS INT) AS n_grams,
           CAST(len(list_distinct(grams)) AS INT) AS n_unique,
           floor((len(grams) - len(list_distinct(grams))) * 1.0
                 / len(grams) * {TTR_SCALE} + 0.5) / {TTR_SCALE}
             AS dup_frac,
           CAST((len(grams) - len(list_distinct(grams))) * 1.0
                / len(grams) >= {REP_FLAG} AS INT) AS flagged
    FROM g
    """,
    doc=f"Within-doc repetition screen: duplicate word {REP_N}-gram "
    "fraction per document (Gopher repetition rule) — template spam and "
    "stuffing score high. Per-row hashed-gram array arithmetic, zero "
    f"shuffle; docs with dup_frac ≥ {REP_FLAG} flagged",
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition(load(spark, sf_dir, "documents"))


# ------------------------------------------- Simpson lexical diversity

SIMPSON_SCALE = 10**6


def simpson_diversity(docs: DataFrame) -> DataFrame:
    """Per-source Gini–Simpson lexical diversity: 1 − Σ c(c−1)/(T(T−1)),
    the probability two tokens drawn WITHOUT replacement differ — the
    log-free entropy alternative (Shannon would cross the libm boundary;
    this stays an exact integer rational until one final division).
    Low diversity = boilerplate-heavy source. Token-keyed partial-agg
    shuffle then a per-source rollup — the q_token_coverage shape.
    """
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    counts = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = counts.groupBy("source").agg(
        F.sum("c").alias("t"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("coll"),
    )
    div = F.when(
        F.col("t") > 1,
        1 - F.col("coll") / (F.col("t") * (F.col("t") - 1)),
    )
    return agg.select(
        F.col("source"),
        F.col("t").alias("n_tokens"),
        "n_types",
        _q(div, SIMPSON_SCALE).alias("simpson_diversity"),
    )


@register(
    "q_simpson_diversity",
    f"""
    WITH c AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY source, tok
    ), a AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c * (c - 1)) AS BIGINT) AS coll
      FROM c GROUP BY source
    )
    SELECT source, t AS n_tokens, n_types,
           floor(CASE WHEN t > 1
                 THEN 1 - coll * 1.0 / (t * (t - 1)) END
                 * {SIMPSON_SCALE} + 0.5) / {SIMPSON_SCALE}
             AS simpson_diversity
    FROM a
    """,
    doc="Per-source Gini–Simpson lexical diversity (probability two "
    "tokens drawn without replacement differ) — the log-free entropy "
    "stand-in, exact integer collision sums with one final division; "
    "boilerplate-heavy sources score low. One token-keyed exchange",
)
def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simpson_diversity(load(spark, sf_dir, "documents"))
