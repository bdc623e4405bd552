"""Corpus statistics, round-6 batch: bigram language-model scoring,
cross-source contamination overlap, and corpus shape histograms.

All three stay integer/rational-exact end to end (the q_token_rarity
discipline: no libm transcendentals cross the engine boundary — ln()
rounding can differ between DuckDB and the JVM, integer sums cannot):

- **q_bigram_lm**: per-document bigram-LM statistics — mean corpus count
  of the doc's bigrams, hapax-bigram ratio (corpus count == 1: the
  novelty signal a perplexity filter thresholds on), and the mean MLE
  conditional probability P(w2|w1) = c(w1 w2)/c(w1 ·), each ratio fixed
  to 1e-9 resolution via INTEGER division before the order-free BIGINT
  sum.
- **q_source_overlap**: 8-gram Jaccard between every source pair — the
  "which sources copy which" contamination matrix run before mixing
  weights are trusted. Spark shuffles 8-byte ``xxhash64`` gram keys
  (same hash-vs-string contract as q_boilerplate, collision bound
  ~|grams|²/2⁶⁴, asserted equivalent in tests); the per-gram pair
  fan-out is bounded by C(n_sources, 2).
- **q_doc_length_hist**: per-language power-of-two token-length histogram
  — the corpus-shape summary that drives chunk-size and packing-budget
  choices. The bucket is the token count's BIT LENGTH (``length(bin(n))``)
  — exact integer structure, no log2().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quantize import q as _q
from ..plans import ensure_parallelism
from ..registry import load, register

COND_SCALE = 1_000_000_000  # 1e-9 resolution for the MLE ratio fixing
OVERLAP_N = 8  # gram width, matching q_boilerplate


def bigram_lm_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc bigram statistics against corpus-wide bigram/context counts.

    Every cross-row quantity is an integer: bigram counts, context
    counts, and the 1e9-scaled MLE conditional ``(c2 * SCALE) div c1``
    (integer division, so each doc's sum is order-free and bit-identical
    on any engine). The two count tables shuffle on 8-byte ``xxhash64``
    keys, never token strings — no driver-side vocab and string-free
    exchanges, so the plan survives a web-scale vocabulary (counts equal
    the string-keyed oracle modulo ~|keys|²/2⁶⁴ hash collisions, the
    q_boilerplate contract).
    """
    tk = F.split(F.col(text_col), " ")
    toks = ensure_parallelism(docs).select("doc_id", tk.alias("tk"))
    # 8-byte hashed keys for every count-table shuffle/join (h2 = hash of
    # the PAIR, h1 = hash of the context token) — the exchanges never
    # carry token strings, same hash-vs-string contract as q_boilerplate
    # (counts equal the oracle's string-keyed form modulo ~|keys|²/2⁶⁴).
    bigrams = toks.filter(F.size("tk") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(slice(tk, 1, size(tk) - 1), (x, i) -> "
                   "struct(x AS w1, tk[i + 1] AS w2))")
        ).alias("bg"),
    ).select(
        "doc_id",
        F.xxhash64("bg.w1", "bg.w2").alias("h2"),
        F.xxhash64("bg.w1").alias("h1"),
    )
    c2 = bigrams.groupBy("h2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bigrams.groupBy("h1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bigrams.join(c2, "h2")
        .join(c1, "h1")
        .select(
            "doc_id",
            "c2",
            F.expr(f"(c2 * CAST({COND_SCALE} AS BIGINT)) div c1").alias("_p"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        _q(F.sum("c2") / F.count(F.lit(1)), 10000).alias("mean_bigram_count"),
        _q(
            F.sum((F.col("c2") == 1).cast("long")) / F.count(F.lit(1)), 10000
        ).alias("hapax_ratio"),
        _q(F.sum("_p") / F.count(F.lit(1)) / COND_SCALE, 1_000_000).alias(
            "mean_cond_p"
        ),
    )


@register(
    "q_bigram_lm",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(len(tk) - 1),
                    i -> struct_pack(w1 := tk[i + 1], w2 := tk[i + 2]))) AS s
      FROM toks WHERE len(tk) >= 2
    ), b AS (
      SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM bg
    ), c2 AS (
      SELECT w1, w2, count(*) AS c2 FROM b GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, count(*) AS c1 FROM b GROUP BY w1
    )
    SELECT b.doc_id,
           count(*) AS n_bigrams,
           floor(sum(c2.c2) * 1.0 / count(*) * 10000 + 0.5) / 10000
             AS mean_bigram_count,
           floor(CAST(sum(CASE WHEN c2.c2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 * 1.0 / count(*) * 10000 + 0.5) / 10000 AS hapax_ratio,
           floor(CAST(sum((c2.c2 * CAST({COND_SCALE} AS BIGINT)) // c1.c1)
                      AS BIGINT)
                 * 1.0 / count(*) / {COND_SCALE} * 1000000 + 0.5) / 1000000
             AS mean_cond_p
    FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    GROUP BY b.doc_id
    """,
    doc="Bigram language-model scoring per document: mean corpus bigram "
    "count, hapax-bigram (novelty) ratio, and mean MLE conditional "
    "P(w2|w1) — the integer-exact stand-in for a perplexity filter "
    "(each ratio fixed to 1e-9 by INTEGER division before the "
    "order-free sum; no ln(), so no cross-engine libm drift). Count "
    "tables and join-backs shuffle 8-byte xxhash64 keys, never token "
    "strings — no driver vocab, string-free exchanges",
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_stats(load(spark, sf_dir, "documents"))


def source_overlap(
    docs: DataFrame, n: int = OVERLAP_N, hashed: bool = True
) -> DataFrame:
    """Pairwise n-gram Jaccard between sources (contamination matrix).

    Distinct (source, gram) pairs → per-source set sizes + pairwise
    intersections via a self-join keyed on the gram; with ``hashed`` the
    shuffles carry 8-byte ``xxhash64`` keys instead of gram strings. The
    per-gram fan-out is at most C(n_sources, 2) pairs, so a gram shared
    by every source stays bounded; with thousands of sources this needs
    the q_dedup_near-style hot-key cap — documented, not needed at 20.
    """
    tk = F.split("text", " ")
    gram = F.array_join(F.slice(F.col("tk"), F.col("i"), n), " ")
    grams = (
        ensure_parallelism(docs)
        .select("source", tk.alias("tk"))
        .filter(F.size("tk") >= n)
        .select(
            "source",
            F.explode(F.sequence(F.lit(1), F.size("tk") - (n - 1))).alias("i"),
            "tk",
        )
        .select("source", gram.alias("g"))
    )
    if hashed:
        grams = grams.select("source", F.xxhash64("g").alias("g"))
    # ONE g-keyed exchange for dedup + grouping (round 11): the former
    # shape deduped (source, g) in its own exchange and then re-shuffled
    # the distinct stream by g — and, with sizes and intersections both
    # consuming the un-cached distinct, the whole tokenize + explode +
    # hash pipeline executed TWICE. collect_set(source) per gram fuses
    # the dedup into the g-grouping (identical sets — partial map-side
    # aggregation also collapses raw duplicates before the exchange), so
    # the raw gram stream crosses once; the per-gram source-set table is
    # vocabulary-sized and persists through the session cache slot, and
    # BOTH the per-source sizes and the pairwise intersections derive
    # from it without touching the corpus again. sort_array makes the
    # emitted in-list pairs src_a < src_b as before; only source-pair
    # and per-source partial counts cross the last exchanges. The
    # per-gram fan-out stays bounded by C(n_sources, 2) — a gram shared
    # by thousands of sources would need the q_dedup_near-style hot-key
    # cap either way.
    from ..plans.cache_registry import persist_slot

    gsets = persist_slot(
        grams.groupBy("g").agg(
            F.sort_array(F.collect_set("source")).alias("ss")
        ),
        "source_overlap_gram_sets",
    )
    sizes = (
        gsets.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    ss = F.col("ss")
    combos = F.flatten(
        F.transform(
            ss,
            lambda x, i: F.transform(
                F.slice(ss, i + F.lit(2), F.size(ss)),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    inter = (
        gsets.select(F.explode(combos).alias("pr"))
        .select("pr.src_a", "pr.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("n_b"))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "inter",
            "n_a",
            "n_b",
            _q(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                1_000_000,
            ).alias("jaccard"),
        )
    )


@register(
    "q_source_overlap",
    f"""
    WITH grams AS (
      SELECT DISTINCT source,
             unnest(list_transform(range(len(tk) - {OVERLAP_N - 1}),
                    i -> array_to_string(tk[i + 1 : i + {OVERLAP_N}], ' ')))
               AS g
      FROM (SELECT source, string_split(text, ' ') AS tk FROM documents)
      WHERE len(tk) >= {OVERLAP_N}
    ), sizes AS (
      SELECT source, count(*) AS sz FROM grams GROUP BY source
    ), inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
      FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.inter, sa.sz AS n_a, sb.sz AS n_b,
           floor(i.inter * 1.0 / (sa.sz + sb.sz - i.inter) * 1000000 + 0.5)
             / 1000000 AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    """,
    doc=f"Cross-source contamination matrix: {OVERLAP_N}-gram Jaccard "
    "between every source pair (which sources copy which — checked "
    "before mixing weights are trusted). Spark shuffles 8-byte "
    "xxhash64 gram keys (string-equivalence modulo ~|grams|^2/2^64, "
    "same contract as q_boilerplate); per-gram pair fan-out bounded by "
    "C(n_sources,2)",
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_overlap(load(spark, sf_dir, "documents"))


def doc_length_hist(docs: DataFrame) -> DataFrame:
    """Per-language power-of-two token-length histogram: bucket = bit
    length of the token count (exact integer structure), with per-bucket
    share of the language's docs."""
    n_tok = F.size(F.split("text", " "))
    hist = (
        docs.select("lang", F.length(F.bin(n_tok.cast("long"))).alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = hist.groupBy("lang").agg(F.sum("n_docs").alias("_t"))
    return hist.join(tot, "lang").select(
        "lang",
        "bucket",
        (F.pow(F.lit(2.0), F.col("bucket") - 1)).cast("long").alias("bucket_lo"),
        "n_docs",
        _q(F.col("n_docs") / F.col("_t"), 10000).alias("share"),
    )


@register(
    "q_doc_length_hist",
    """
    WITH h AS (
      SELECT lang,
             CAST(length(bin(len(string_split(text, ' ')))) AS INT)
               AS bucket,
             count(*) AS n_docs
      FROM documents GROUP BY 1, 2
    ), t AS (
      SELECT lang, CAST(sum(n_docs) AS BIGINT) AS tot FROM h GROUP BY lang
    )
    SELECT h.lang, h.bucket,
           CAST(power(2.0, h.bucket - 1) AS BIGINT) AS bucket_lo,
           h.n_docs,
           floor(h.n_docs * 1.0 / t.tot * 10000 + 0.5) / 10000 AS share
    FROM h JOIN t USING (lang)
    """,
    doc="Corpus shape: per-language power-of-two token-length histogram "
    "(bucket = bit length of the token count — exact integer, no "
    "log2 libm) with per-bucket share; drives chunk-size and packing "
    "budget choices. Two tiny aggregates over one scan",
)
def q_doc_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_length_hist(load(spark, sf_dir, "documents"))


def tail_token_share(docs: DataFrame) -> DataFrame:
    """Per-source hapax exposure: how much of each source's token mass is
    corpus-hapax (total corpus frequency 1 — OCR noise / gibberish /
    genuinely novel text all live in the hapax tail). Integer counts,
    one quantized share."""
    # Aggregate occurrences to (source, token, count) FIRST: the partial
    # (map-side) aggregate collapses the token stream to ~vocab×sources
    # rows per task, so the corpus-frequency table, the join-back and
    # the per-source fold all run over vocabulary-sized inputs — the raw
    # occurrence stream never crosses an exchange (round-10 shape
    # shuffled it twice: once into the tf groupBy, once into the
    # occurrence⋈tf join). Identical integers: n_tokens = Σc per source,
    # n_hapax = Σc over tokens with corpus frequency Σ_src c = 1.
    toks = ensure_parallelism(docs).select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    cnt = toks.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    tf = cnt.groupBy("t").agg(F.sum("c").alias("tf"))
    return (
        cnt.join(tf, "t")
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.when(F.col("tf") == 1, F.col("c")).otherwise(F.lit(0))).alias(
                "n_hapax"
            ),
        )
        .select(
            "source",
            "n_tokens",
            "n_hapax",
            _q(F.col("n_hapax") / F.col("n_tokens"), 1_000_000).alias(
                "hapax_share"
            ),
        )
    )


@register(
    "q_tail_tokens",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ), tf AS (
      SELECT t, count(*) AS tf FROM toks GROUP BY t
    )
    SELECT toks.source,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN tf.tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           floor(CAST(sum(CASE WHEN tf.tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 * 1.0 / count(*) * 1000000 + 0.5) / 1000000 AS hapax_share
    FROM toks JOIN tf USING (t)
    GROUP BY toks.source
    """,
    doc="Per-source hapax-token exposure: the share of a source's token "
    "occurrences whose total corpus frequency is 1 — the noise/novelty "
    "tail a curation pass inspects per provider. Token-keyed count "
    "table + join-back, integer-exact (q_token_rarity's corpus-level "
    "sibling, keyed by source instead of doc)",
)
def q_tail_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tail_token_share(load(spark, sf_dir, "documents"))


# -------------------------------------------- temperature mixture weights

MIX_SCALE = 1_000_000       # 1e-6 fixing of sqrt(tokens) per source
MIX_OUT = 10**9             # 1e-9 weight resolution


def mixture_weights(docs: DataFrame) -> DataFrame:
    """Temperature-sampled source mixture weights at τ = ½ — the
    standard up-weighting of small/rare sources when a multi-source
    corpus is mixed into a training run (multilingual-LM style
    p_i ∝ c_i^τ): w_i = √c_i / Σ_j √c_j over per-source token counts,
    plus the raw share and the implied up/down-sampling factor.

    τ is pinned to ½ because ``sqrt`` is the one power IEEE 754
    requires to be correctly rounded — bit-identical on any engine —
    while a general ``pow(x, 0.7)`` crosses the libm boundary (the
    repo-wide no-transcendentals rule). √c fixes to a 1e-6 integer
    before the order-free sum; each output is then a single exact-
    operand double division. One exchange on ``source``; the weight
    table is |sources| rows, broadcast-sized by construction.
    """
    per_src = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("toks")
    )
    fixed = per_src.select(
        "source",
        "toks",
        F.floor(F.sqrt(F.col("toks")) * MIX_SCALE + 0.5)
        .cast("long")
        .alias("_s"),
    )
    totals = fixed.agg(
        F.sum("toks").alias("_t"), F.sum("_s").alias("_ss")
    )
    return (
        fixed.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "toks",
            _q(F.col("toks") / F.col("_t"), MIX_OUT).alias("raw_share"),
            _q(F.col("_s") / F.col("_ss"), MIX_OUT).alias("weight"),
            _q(
                (F.col("_s") / F.col("_ss")) / (F.col("toks") / F.col("_t")),
                1_000_000,
            ).alias("upsample"),
        )
    )


@register(
    "q_mixture_weights",
    f"""
    WITH per_src AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
      FROM documents GROUP BY source
    ), fixed AS (
      SELECT source, toks,
             CAST(floor(sqrt(toks) * {MIX_SCALE} + 0.5) AS BIGINT) AS _s
      FROM per_src
    ), totals AS (
      SELECT CAST(sum(toks) AS BIGINT) AS _t,
             CAST(sum(_s) AS BIGINT) AS _ss
      FROM fixed
    )
    SELECT source, toks,
           floor(toks * 1.0 / _t * {MIX_OUT} + 0.5) / {MIX_OUT}
             AS raw_share,
           floor(_s * 1.0 / _ss * {MIX_OUT} + 0.5) / {MIX_OUT} AS weight,
           floor((_s * 1.0 / _ss) / (toks * 1.0 / _t) * 1000000 + 0.5)
             / 1000000 AS upsample
    FROM fixed, totals
    """,
    doc="Temperature-sampled source mixture weights (τ=½): "
    "w_i = √tokens_i / Σ√tokens_j plus raw share and the implied "
    "up/down-sampling factor — the multi-source mixing table of a "
    "training-data pipeline. τ pinned to ½ because IEEE sqrt is "
    "correctly rounded (bit-identical cross-engine) where pow(x,τ) is "
    "not; √c fixed to 1e-6 integers before the order-free sum",
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_weights(load(spark, sf_dir, "documents"))


# -------------------------------------------- content-defined chunking

# FastCDC-style chunking: a boundary opens wherever a rolling window of
# token fingerprints hits 0 mod CDC_D, so chunk boundaries move WITH the
# content — inserting one token near the head of a doc re-chunks only
# the window around the edit, where fixed-size chunking (q_chunk_dedup)
# shifts every later chunk and loses all dedup hits. The window value
#   v_i = 7·f(t₋₃) + 31·f(t₋₂) + 131·f(t₋₁) + 997·f(t)  (mod CDC_D)
# uses the engine-portable token fingerprint f(t) = 1009·ascii(t) +
# 101·len(t) (DuckDB has no xxhash64, so the oracle could not reproduce
# hashed boundaries; a production Spark-only variant would swap f for
# xxhash64 of the token — the operator shape is identical).
CDC_W = 4    # fingerprint window (tokens)
CDC_D = 8    # boundary density: ~1/D of positions open a chunk


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, source, chunk, chunk_text) under content-defined
    boundaries — the chunk table itself; chunks concatenate back to the
    original document in order (reassembly asserted in tests).

    Plan: per-doc token explode (narrow), ONE exchange on doc_id for
    the lag window + running boundary count, an ordered string_agg per
    chunk. Documents chunk independently, so the doc_id exchange is the
    only data-dependent shuffle and the plan scales with corpus size,
    not corpus².
    """
    from pyspark.sql import Window

    f = lambda c: F.ascii(c) * 1009 + F.length(c) * 101  # noqa: E731
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    ).withColumn("f", f(F.col("tok")))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    v = (
        F.lag("f", 3).over(wd) * 7
        + F.lag("f", 2).over(wd) * 31
        + F.lag("f", 1).over(wd) * 131
        + F.col("f") * 997
    )
    flagged = toks.withColumn(
        "bnd",
        F.when(
            (F.col("pos") >= CDC_W) & (v % CDC_D == 0), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "chunk",
        F.sum("bnd").over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("doc_id", "source", "chunk").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "tok"))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("chunk_text")
    )


def cdc_chunk_stats(docs: DataFrame) -> DataFrame:
    """Per-source content-defined chunk dedup stats: chunk count, exact
    distinct chunk count (on the chunk TEXT — no hash in the compare)
    and the duplicated-chunk share."""
    return (
        cdc_chunks(docs).groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_text").alias("n_unique"),
        )
        .select(
            "source",
            "n_chunks",
            "n_unique",
            _q(
                1 - F.col("n_unique") / F.col("n_chunks"), 10000
            ).alias("dup_share"),
        )
    )


@register(
    "q_cdc_chunks",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS tok
      FROM documents
    ), fp AS (
      SELECT *, ascii(tok) * 1009 + length(tok) * 101 AS f FROM toks
    ), flagged AS (
      SELECT doc_id, source, pos, tok,
             CASE WHEN pos >= {CDC_W} AND
                  (lag(f, 3) OVER w * 7 + lag(f, 2) OVER w * 31
                   + lag(f, 1) OVER w * 131 + f * 997) % {CDC_D} = 0
                  THEN 1 ELSE 0 END AS bnd
      FROM fp
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), chunked AS (
      SELECT doc_id, source, pos, tok,
             sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS chunk
      FROM flagged
    ), chunks AS (
      SELECT doc_id, source, chunk,
             string_agg(tok, ' ' ORDER BY pos) AS chunk_text
      FROM chunked GROUP BY doc_id, source, chunk
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT chunk_text) AS BIGINT) AS n_unique,
           floor((1 - count(DISTINCT chunk_text) * 1.0 / count(*))
                 * 10000 + 0.5) / 10000 AS dup_share
    FROM chunks GROUP BY source
    """,
    doc="Content-defined (FastCDC-style) chunking + per-source chunk "
    "dedup stats: boundaries open where a 4-token rolling fingerprint "
    "hits 0 mod 8, so edits re-chunk only their neighbourhood where "
    "fixed-size chunks (q_chunk_dedup) shift globally. Engine-portable "
    "polynomial fingerprint (production swaps in xxhash64 — same "
    "shape); exact distinct on chunk TEXT, one doc_id exchange",
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc_chunk_stats(load(spark, sf_dir, "documents"))


# ------------------------------------------------- mixture materialization

MIXS_TARGET = 200  # total docs the materialized mixture draws


def mixture_sample(docs: DataFrame, target: int = MIXS_TARGET) -> DataFrame:
    """Materialize the τ=½ mixture (:func:`mixture_weights`) as an
    actual document draw: each source gets ⌊target·wᵢ + ½⌉ slots filled
    by a deterministic systematic walk over its docs in doc_id order —
    the epoch-construction step that turns mixing WEIGHTS into a
    training FILE list, reproducible bit-for-bit with no RNG (the
    q_pps_sample discipline applied per source).

    Integer-exact throughout: the per-source quota is the exact
    rational rounding ⌊(2·target·sᵢ + S) / (2·S)⌋ (all positive, so
    floor-div agrees across engines), and the walk keeps row r iff
    ⌊r·q/n⌋ > ⌊(r−1)·q/n⌋ — exactly q picks per source (capped at n;
    a quota above n means the source needs REPETITION, reported via
    ``quota`` > ``picked`` downstream). One exchange for the weights;
    the per-source rank is the q_dollar_bars two-pass (within-
    (source, doc_id-range bucket) row_number + per-bucket counts with
    a running offset joined back) — never a per-source sort of the
    whole corpus in one task (source has ~5 values).
    """
    per_src = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("toks"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    fixed = per_src.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("toks")) * MIX_SCALE + 0.5)
        .cast("long")
        .alias("_s"),
    )
    tot = fixed.agg(F.sum("_s").alias("_ss"))
    quota = fixed.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr(
            f"(2 * CAST({target} AS BIGINT) * _s + _ss) div (2 * _ss)"
        ).alias("quota"),
    )
    from pyspark.sql import Window

    base = docs.select(
        "doc_id",
        "source",
        F.expr("CAST(doc_id DIV 4096 AS BIGINT)").alias("_bk"),
    )
    wbk = Window.partitionBy("source", "_bk").orderBy("doc_id")
    woff = (
        Window.partitionBy("source")
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("source", "_bk")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "source",
            "_bk",
            F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"),
        )
    )
    ranked = (
        base.withColumn("_rb", F.row_number().over(wbk))
        .join(offsets, ["source", "_bk"])
        .withColumn("_r", F.col("_off") + F.col("_rb"))
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(
            F.expr("(_r * quota) div n_docs") > F.expr("((_r - 1) * quota) div n_docs")
        )
        .select("source", "doc_id", "quota")
        .orderBy("source", "doc_id")
    )


@register(
    "q_mixture_sample",
    f"""
    WITH per_src AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), fixed AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(toks) * {MIX_SCALE} + 0.5) AS BIGINT) AS s
      FROM per_src
    ), tot AS (SELECT CAST(sum(s) AS BIGINT) AS ss FROM fixed),
    quota AS (
      SELECT source, n_docs,
             (2 * {MIXS_TARGET} * s + ss) // (2 * ss) AS quota
      FROM fixed, tot
    ), ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r
      FROM documents
    )
    SELECT ranked.source, ranked.doc_id, CAST(quota AS BIGINT) AS quota
    FROM ranked JOIN quota USING (source)
    WHERE (r * quota) // n_docs > ((r - 1) * quota) // n_docs
    ORDER BY ranked.source, ranked.doc_id
    """,
    doc="Materialized τ=½ mixture: each source's ⌊target·w+½⌉ quota "
    "filled by a deterministic systematic walk over its docs in id "
    "order — mixing weights turned into an actual reproducible "
    "training draw with no RNG. Exact rational quota rounding and "
    "integer walk arithmetic (all positive — floor-div agrees across "
    "engines); one weight exchange + one per-source window",
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_sample(load(spark, sf_dir, "documents"))
