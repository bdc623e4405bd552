"""Training-data curation queries: repetition signals, quality filtering,
deterministic dataset splitting, stratified sampling, corpus stats.

These are the curation ops a 100 TB LLM-data pipeline runs between raw
scrape and tokenizer (Gopher/C4-style rules): repetition ratios catch
boilerplate/spam, composite threshold filters gate documents, and
hash-based splits/samples must be deterministic so re-runs and backfills
assign every document to the same shard without coordination.

Scale notes:
- Repetition uses explode + two-level groupBy — the distributed path; an
  all-in-array variant would be O(n²) per doc and die on long documents.
- Split/sample are pure arithmetic on ``doc_id`` (no shuffle, no state,
  no RNG): a linear-congruential mix kept within int64 so Spark and
  DuckDB (and any engine) compute bit-identical buckets. Production
  would use ``xxhash64(stable_doc_key)``; the LCG stands in because the
  oracle needs cross-engine-identical arithmetic.
- Filters are single-pass codegen'd column expressions — no UDF, no
  shuffle; at scale they run at scan speed and combine with parquet
  predicate pushdown when materialized as a column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, punct_ratio, stopword_ratio
from ..plans import ensure_parallelism
from ..registry import load, register

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# LCG-style mixers (Knuth/numerical-recipes constants). The id is reduced
# mod 2^31 BEFORE the multiply so the product is at most
# (2^31)·2654435761 ≈ 5.7e18 < int64 max ≈ 9.22e18 — no overflow for ANY
# non-negative doc_id (the pre-fix form overflowed past doc_id ≈ 3.47e9,
# silently wrapping negative on Spark while erroring on ANSI engines).
# For doc_id < 2^31 the reduction is the identity, so buckets are
# unchanged. Production would use pmod(xxhash64(key), 100); the LCG stands
# in because the DuckDB oracle needs cross-engine-identical arithmetic.
_SPLIT_A, _SPLIT_C = 2654435761, 1013904223
_SAMPLE_A, _SAMPLE_C = 2246822519, 3266489917
_MOD31 = 2147483648
_MOD32 = 4294967296


def _hash_bucket(doc_id: Column | str, a: int, c: int) -> Column:
    """Deterministic bucket in [0, 100) from a non-negative integer id —
    identical arithmetic on every engine (no engine-specific hash), and
    overflow-free across the full non-negative int64 domain."""
    return (((F.col(doc_id) % _MOD31) * a + c) % _MOD32) % 100


def _bucket_sql(a: int, c: int) -> str:
    """The oracle-side rendering of :func:`_hash_bucket` — keep in lockstep."""
    return f"(((doc_id % {_MOD31}) * {a} + {c}) % {_MOD32}) % 100"


_SPLIT_B = _bucket_sql(_SPLIT_A, _SPLIT_C)
_SAMPLE_B = _bucket_sql(_SAMPLE_A, _SAMPLE_C)


@register(
    "q_quality_repetition",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), b AS (
      SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
             unnest(list_transform(range(len(toks) - 1),
                                   i -> toks[i+1] || ' ' || toks[i+2])) AS bg
      FROM t WHERE len(toks) >= 2
    ), c AS (
      SELECT doc_id, n_tokens, n_distinct, bg, count(*) AS c
      FROM b GROUP BY ALL
    )
    SELECT doc_id, n_tokens,
           round(n_distinct * 1.0 / n_tokens, 4) AS distinct_frac,
           round(max(c) * 1.0 / (n_tokens - 1), 4) AS top_bigram_frac
    FROM c GROUP BY doc_id, n_tokens, n_distinct
    """,
    doc="Gopher-style repetition signals: distinct-token fraction + "
    "top-bigram fraction via explode + two-level groupBy (the distributed "
    "path — per-doc O(n²) array scans would die on long documents)",
)
def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = ensure_parallelism(docs).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        toks.alias("toks"),
    ).filter(F.col("n_tokens") >= 2)
    bigrams = base.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.explode(
            F.expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))")
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc_id", "n_tokens", "n_distinct", "bg").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("doc_id", "n_tokens", "n_distinct").agg(
        F.max("c").alias("maxbg")
    ).select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_distinct") / F.col("n_tokens"), 4).alias("distinct_frac"),
        F.round(F.col("maxbg") / (F.col("n_tokens") - 1), 4).alias("top_bigram_frac"),
    )


@register(
    "q_quality_filter",
    f"""
    WITH s AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ({_STOP_SQL}))) * 1.0
               / len(string_split(text, ' ')) AS stop_r,
             length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) * 1.0
               / length(lower(text)) AS punct_r,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS distinct_r
      FROM documents)
    SELECT doc_id,
           n_tokens BETWEEN 5 AND 5000 AS ok_len,
           stop_r >= 0.01 AS ok_stopword,
           punct_r <= 0.25 AS ok_punct,
           distinct_r >= 0.2 AS ok_repetition,
           (n_tokens BETWEEN 5 AND 5000) AND stop_r >= 0.01
             AND punct_r <= 0.25 AND distinct_r >= 0.2 AS keep
    FROM s
    """,
    doc="Composite C4/Gopher-style quality gate: length, stopword, "
    "punctuation, repetition thresholds — one codegen'd pass, no shuffle; "
    "thresholds compare unrounded IEEE doubles (identical on both engines "
    "because numerator/denominator are identical longs)",
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    distinct_r = F.size(F.array_distinct(toks)) / n_tokens
    ok_len = n_tokens.between(5, 5000)
    ok_stop = stopword_ratio("text") >= 0.01
    ok_punct = punct_ratio("text") <= 0.25
    ok_rep = distinct_r >= 0.2
    return docs.select(
        "doc_id",
        ok_len.alias("ok_len"),
        ok_stop.alias("ok_stopword"),
        ok_punct.alias("ok_punct"),
        ok_rep.alias("ok_repetition"),
        (ok_len & ok_stop & ok_punct & ok_rep).alias("keep"),
    )


@register(
    "q_dataset_split",
    f"""
    SELECT doc_id,
           {_SPLIT_B} AS bucket,
           CASE WHEN {_SPLIT_B} < 80 THEN 'train'
                WHEN {_SPLIT_B} < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Deterministic train/valid/test split (80/10/10) via arithmetic "
    "hash of doc_id — no RNG, no shuffle, no coordination; every re-run "
    "and backfill assigns each doc to the same shard",
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = _hash_bucket("doc_id", _SPLIT_A, _SPLIT_C)
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test").alias("split"),
    )


@register(
    "q_stratified_sample",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_SAMPLE_B} <
          CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30 WHEN 'fr' THEN 20 ELSE 10 END
    """,
    doc="Deterministic stratified sampling: per-language keep rates via "
    "arithmetic hash threshold — a pushed-down filter, not a shuffle; "
    "rates are per-stratum (en 50%, de 30%, fr 20%, other 10%)",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 50)
        .when(F.col("lang") == "de", 30)
        .when(F.col("lang") == "fr", 20)
        .otherwise(10)
    )
    return docs.filter(_hash_bucket("doc_id", _SAMPLE_A, _SAMPLE_C) < rate).select(
        "doc_id", "lang"
    )


@register(
    "q_source_stats",
    """
    SELECT source,
           count(*) AS n_docs,
           round(avg(n_chars), 2) AS avg_chars,
           count(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY source
    """,
    doc="Per-source corpus stats (docs, avg length, language spread) — "
    "partial-agg groupBy; at scale this is the per-domain/per-crawl "
    "monitoring rollup",
)
def q_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "q_curation_pipeline",
    f"""
    WITH s AS (
      SELECT doc_id, lang, source, text,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ({_STOP_SQL}))) * 1.0
               / len(string_split(text, ' ')) AS stop_r,
             length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) * 1.0
               / length(lower(text)) AS punct_r,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS distinct_r
      FROM documents),
    kept AS (
      SELECT doc_id, lang, source, text FROM s
      WHERE n_tokens BETWEEN 5 AND 5000 AND stop_r >= 0.01
        AND punct_r <= 0.25 AND distinct_r >= 0.2),
    canon AS (
      SELECT doc_id, lang, source,
             min(doc_id) OVER (PARTITION BY list_sort(string_split(text, ' ')))
               AS min_id
      FROM kept)
    SELECT doc_id, lang, source,
           CASE WHEN {_SPLIT_B} < 80 THEN 'train'
                WHEN {_SPLIT_B} < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM canon WHERE doc_id = min_id
    """,
    doc="End-to-end curation manifest: quality gate (scan-speed filter) -> "
    "exact dedup keeping min doc_id per sorted-token content key (one "
    "window exchange) -> deterministic 80/10/10 split (pure arithmetic). "
    "The composition a training-data pipeline runs between raw scrape and "
    "tokenizer, as ONE lazy plan: Catalyst fuses the gate into the scan "
    "and the split into the window's output projection, so the whole "
    "pipeline costs a single shuffle on the content key. At 100 TB swap "
    "the token-array key for its 8-byte doc_fingerprint to shrink the "
    "exchange payload; near-dup removal (banded_minhash_pairs) then runs "
    "on the survivors as a separate anti-join pass",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    keep = (
        n_tokens.between(5, 5000)
        & (stopword_ratio("text") >= 0.01)
        & (punct_ratio("text") <= 0.25)
        & ((F.size(F.array_distinct(toks)) / n_tokens) >= 0.2)
    )
    from .dedup import canonical_fingerprint

    kept = ensure_parallelism(docs).filter(keep)
    # window on the 8-byte canonical fingerprint, not the token array:
    # the key never reaches the output, so the exchange carries longs
    # (the oracle keeps the sorted-token string form — identical groups
    # modulo ~|docs|^2/2^64 collisions)
    w = Window.partitionBy(canonical_fingerprint("text"))
    bucket = _hash_bucket("doc_id", _SPLIT_A, _SPLIT_C)
    return (
        kept.withColumn("min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("min_id"))
        .select(
            "doc_id",
            "lang",
            "source",
            F.when(bucket < 80, "train")
            .when(bucket < 90, "valid")
            .otherwise("test")
            .alias("split"),
        )
    )


@register(
    "q_curation_full",
    None,  # banded-MinHash candidate generation is engine-specific → rows-only;
    # the exact pair set + cluster semantics are pinned by the golden test
    # tests/test_extensions.py::test_curation_full_golden
    doc="FULL curation DAG in one lazy plan: quality gate (scan-speed "
    "filter) -> exact dedup (min doc_id per sorted-token key, one window "
    "exchange) -> NEAR-dup removal (banded MinHash pairs -> connected "
    "components -> keep cluster representative) -> deterministic 80/10/10 "
    "split. This is the E2E 100 TB shape: the gate and exact-dedup fuse "
    "into one exchange; near-dup candidates are bucket-bounded (never "
    "all-pairs); clustering shuffles only the pairs-sized edge set; the "
    "final keep is a small left join against the cluster table (cluster "
    "membership is a vanishing fraction of the corpus) + arithmetic "
    "split. Survivors = docs that pass the gate, win their exact-dup "
    "group, and are either unpaired or their cluster's min-id "
    "representative",
)
def q_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .dedup import banded_minhash_pairs, dup_clusters

    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    keep = (
        n_tokens.between(5, 5000)
        & (stopword_ratio("text") >= 0.01)
        & (punct_ratio("text") <= 0.25)
        & ((F.size(F.array_distinct(toks)) / n_tokens) >= 0.2)
    )
    from .dedup import canonical_fingerprint

    kept = ensure_parallelism(docs).filter(keep)
    # window on the 8-byte canonical fingerprint, not the token array:
    # the key never reaches the output, so the exchange carries longs
    # (the oracle keeps the sorted-token string form — identical groups
    # modulo ~|docs|^2/2^64 collisions)
    w = Window.partitionBy(canonical_fingerprint("text"))
    exact = (
        kept.withColumn("min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("min_id"))
        .drop("min_id")
    )
    pairs = banded_minhash_pairs(exact, min_jaccard=0.5)
    clusters = dup_clusters(pairs)
    survivors = exact.join(clusters, "doc_id", "left").filter(
        F.col("cluster_id").isNull() | (F.col("doc_id") == F.col("cluster_id"))
    )
    bucket = _hash_bucket("doc_id", _SPLIT_A, _SPLIT_C)
    return survivors.select(
        "doc_id",
        "lang",
        "source",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "q_contamination",
    """
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
    ), sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(range(len(tk) - 7),
                    i -> array_to_string(tk[i+1:i+8], ' ')))) AS g
      FROM tok WHERE len(tk) >= 8
    ), ev AS (
      SELECT doc_id, g FROM sh WHERE source = 'src0'
    ), tr AS (
      SELECT doc_id, g FROM sh WHERE source <> 'src0'
    )
    SELECT ev.doc_id, count(DISTINCT tr.doc_id) AS n_contaminating
    FROM ev JOIN tr ON ev.g = tr.g
    GROUP BY ev.doc_id
    """,
    doc="Eval-set decontamination: for each eval document (source src0), "
    "the number of train documents sharing at least one 8-gram — the "
    "GPT-3-style n-gram overlap check run before training. The eval side "
    "is tiny next to the train corpus, so it broadcasts and the train "
    "scan never shuffles its shingles; only the post-join (eval_doc, "
    "train_doc) pairs — a vanishingly small set — reach the aggregation "
    "exchange. The join key is the xxhash64 of each 8-gram (8 bytes — "
    "never the gram string; the broadcast table and every comparison "
    "carry longs), identical counts to the oracle's string join modulo "
    "~|grams|²/2⁶⁴ collisions; string-vs-hash equivalence asserted in "
    "tests/test_extensions.py",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return contamination_counts(load(spark, sf_dir, "documents"), hashed=True)


def contamination_counts(
    docs: DataFrame, eval_source: str = "src0", hashed: bool = True
) -> DataFrame:
    """Eval/train 8-gram overlap counts. ``hashed=True`` joins on hashed
    shingles (dedup.hashed_shingles: xxhash64 over 8 consecutive token
    hashes — the gram STRING is never even built, and the broadcast hash
    table + every comparison carry 8-byte keys; the 100 TB path).
    ``False`` carries the gram strings (oracle-shaped, used by the
    equivalence test)."""
    if hashed:
        from .dedup import hashed_shingles

        grams = hashed_shingles("text", 8)
    else:
        grams = F.array_distinct(
            F.expr(
                "transform(sequence(0, size(split(text, ' ')) - 8),"
                " i -> array_join(slice(split(text, ' '), i + 1, 8), ' '))"
            )
        )
    sh = (
        ensure_parallelism(docs.filter(F.size(F.split("text", " ")) >= 8))
        .select("doc_id", "source", F.explode(grams).alias("g"))
    )
    ev = sh.filter(F.col("source") == eval_source).select(
        F.col("doc_id").alias("eval_doc"), "g"
    )
    tr = sh.filter(F.col("source") != eval_source).select(
        F.col("doc_id").alias("train_doc"), "g"
    )
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy(F.col("eval_doc").alias("doc_id"))
        .agg(F.countDistinct("train_doc").alias("n_contaminating"))
    )


@register(
    "q_sequence_packing",
    """
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens) / 512) AS INT) AS pack_id
    FROM t
    """,
    doc="Sequence packing for training batches: docs are packed into "
    "fixed 512-token budgets per source shard by cumulative token count "
    "over a deterministic order (doc_id) — pack_id = floor(preceding "
    "tokens / budget). One window exchange on the shard key, no RNG, no "
    "state: every re-run assigns identical packs. The per-shard "
    "running sum is the q_dollar_bars two-pass (within-(source, "
    "doc_id-range bucket) window + per-bucket totals with a running "
    "offset joined back), so no task ever sorts a whole shard — the "
    "shard key has ~5 values and would otherwise be a 5-task sort of "
    "the corpus. The greedy first-fit-by-order policy is the standard "
    "streaming-friendly packing; bin-optimal packing would need "
    "global state for ~2% density gain",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    # doc_id-range buckets play the role q_dollar_bars' calendar days
    # play for events: within-bucket windows bound task state, the
    # per-(source, bucket) total table (|docs|/4096 rows, aggregated)
    # carries the running offset.
    base = docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.expr("CAST(doc_id DIV 4096 AS BIGINT)").alias("_bk"),
    )
    wbk = (
        Window.partitionBy("source", "_bk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("_cum_in", F.sum("n_tokens").over(wbk))
    woff = (
        Window.partitionBy("source")
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("source", "_bk")
        .agg(F.sum("n_tokens").alias("_tot"))
        .select(
            "source",
            "_bk",
            F.coalesce(F.sum("_tot").over(woff), F.lit(0)).alias("_off"),
        )
    )
    return within.join(offsets, ["source", "_bk"]).select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(
            "CAST((_off + _cum_in - n_tokens) DIV 512 AS INT)"
        ).alias("pack_id"),
    )


@register(
    "q_heavy_hitters",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ), counts AS (
      SELECT source, token, count(*) AS n FROM tok GROUP BY source, token
    ), ranked AS (
      SELECT source, token, n,
             row_number() OVER (PARTITION BY source ORDER BY n DESC, token) AS rk
      FROM counts
    )
    SELECT source, token, n, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5
    """,
    doc="Per-source heavy-hitter tokens (top-5 by count, deterministic "
    "token tie-break) — the boilerplate/vocabulary drift monitor a "
    "crawl pipeline runs per domain. explode + partial-agg groupBy, then "
    "the rank window runs over the already-aggregated (source, token) "
    "counts — orders of magnitude smaller than the token stream. At "
    "100 TB swap exact counts for count-min sketches per shard if the "
    "token domain itself explodes",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    counts = (
        ensure_parallelism(docs)
        .select("source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), "token")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("source", "token", "n", "rk")
    )


@register(
    "q_split_leakage",
    f"""
    WITH keyed AS (
      SELECT doc_id,
             CASE WHEN {_SPLIT_B} < 80 THEN 'train'
                  WHEN {_SPLIT_B} < 90 THEN 'valid'
                  ELSE 'test' END AS split,
             array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS ck
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.split AS split_a, b.split AS split_b
    FROM keyed a JOIN keyed b
      ON a.ck = b.ck AND a.doc_id < b.doc_id AND a.split <> b.split
    """,
    doc="Cross-split leakage detection: pairs of docs with the same "
    "TOKEN-SET canonical key (sorted distinct tokens — catches "
    "reordered/repetition-edited copies, which is what this corpus "
    "contains; the strict multiset key matches nothing here and would "
    "prove nothing) that landed in DIFFERENT train/valid/test shards — "
    "the eval-integrity check run after splitting. One self-join on the "
    "content key: both sides hash-partition on ck so matches co-locate "
    "and only key-equal pairs materialize. The Spark join key is the "
    "8-byte xxhash64 FINGERPRINT of the sorted-distinct-token string, so "
    "the exchange carries longs, never document-sized keys (the oracle "
    "keeps the string form — identical pairs modulo a ~|docs|²/2⁶⁴ "
    "collision, and the string-vs-fingerprint pair-set equivalence is "
    "asserted at sf0.01 in tests/test_extensions.py). Compose with "
    "q_dedup_near's pairs for near-dup-level leakage",
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_leakage_pairs(load(spark, sf_dir, "documents"))


def split_leakage_pairs(docs: DataFrame, fingerprint_key: bool = True) -> DataFrame:
    """Same-content cross-split pairs. ``fingerprint_key=True`` joins on
    ``xxhash64`` of the canonical token-set string (8-byte shuffle key —
    the 100 TB path); ``False`` joins on the raw string (oracle-shaped,
    used by the equivalence test)."""
    bucket = _hash_bucket("doc_id", _SPLIT_A, _SPLIT_C)
    ck_str = F.array_join(F.sort_array(F.array_distinct(F.split("text", " "))), " ")
    ck = F.xxhash64(ck_str) if fingerprint_key else ck_str
    keyed = ensure_parallelism(docs).select(
        "doc_id",
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test").alias("split"),
        ck.alias("ck"),
    )
    a = keyed.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"), "ck"
    )
    b = keyed.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"), "ck"
    )
    return (
        a.join(b, "ck")
        .filter((F.col("doc_a") < F.col("doc_b")) & (F.col("split_a") != F.col("split_b")))
        .select("doc_a", "doc_b", "split_a", "split_b")
    )


# Linear quality-classifier weights. A production pipeline distills a
# fastText/BERT quality model into features like these; the weights here
# are fixed, documented constants (all exactly representable doubles) so
# the score is reproducible and oracle-checkable. The squash is the
# rational sigmoid x/(1+|x|) — unlike exp(), it uses only IEEE ops that
# round identically on every engine.
_QW_BIAS = -1.0
_QW_MEAN_WL = -0.125   # very long "words" -> junk (URLs, base64 blobs)
_QW_STOP = 1.5         # natural prose carries stopwords
_QW_PUNCT = -2.0       # symbol soup -> junk
_QW_LEN = 0.5          # saturating credit for enough tokens


def quality_score(text_col: str = "text") -> Column:
    """Linear quality score in (0, 1), engine-exact (no exp/log)."""
    n_chars = F.length(text_col).cast("double")
    n_tokens = F.size(F.split(text_col, " ")).cast("double")
    raw = (
        F.lit(_QW_BIAS)
        + F.lit(_QW_MEAN_WL) * (n_chars / n_tokens)
        + F.lit(_QW_STOP) * stopword_ratio(text_col)
        + F.lit(_QW_PUNCT) * punct_ratio(text_col)
        + F.lit(_QW_LEN) * (n_tokens / (n_tokens + 100.0))
    )
    return 0.5 * (1.0 + raw / (1.0 + F.abs(raw)))


_QSCORE_SQL_RAW = f"""(
      {_QW_BIAS}
      + {_QW_MEAN_WL} * (length(text) * 1.0 / len(string_split(text, ' ')))
      + {_QW_STOP} * (len(list_filter(string_split(text, ' '),
                          w -> w IN ({_STOP_SQL}))) * 1.0
                      / len(string_split(text, ' ')))
      + {_QW_PUNCT} * (length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) * 1.0
                       / length(lower(text)))
      + {_QW_LEN} * (len(string_split(text, ' ')) * 1.0
                     / (len(string_split(text, ' ')) + 100.0))
    )"""
_QSCORE_SQL = (
    f"(0.5 * (1.0 + {_QSCORE_SQL_RAW} / (1.0 + abs({_QSCORE_SQL_RAW}))))"
)


@register(
    "q_quality_score",
    f"""
    SELECT doc_id, lang, source,
           floor({_QSCORE_SQL} * 1000000 + 0.5) / 1000000 AS quality
    FROM documents
    """,
    doc="Distilled linear quality classifier: fixed exactly-representable "
    "weights over mean word length / stopword ratio / punct ratio / "
    "saturating length credit, squashed by the rational sigmoid "
    "x/(1+|x|) (identical IEEE rounding on every engine, unlike exp). "
    "Single codegen pass, zero shuffle — runs at scan speed at 100 TB; "
    "the model-distillation pattern for corpus-wide quality gating when "
    "running the real classifier per-document is unaffordable",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.quantize import q as _q

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", "source",
        _q(quality_score("text"), 1_000_000).alias("quality"),
    )


@register(
    "q_score_rank_norm",
    f"""
    WITH scored AS (
      SELECT doc_id,
             floor({_QSCORE_SQL} * 1000000 + 0.5) / 1000000 AS quality
      FROM documents
    ), ranked AS (
      SELECT doc_id, quality,
             row_number() OVER (ORDER BY quality, doc_id) AS rn,
             count(*) OVER () AS n
      FROM scored
    )
    SELECT doc_id, quality,
           floor((rn - 1) * 1.0 / (n - 1) * 1000000 + 0.5) / 1000000 AS pct
    FROM ranked
    """,
    doc="Global percentile normalization of the quality score WITHOUT a "
    "single-partition window: quantile-bucket two-pass row_number "
    "(plans/global_rank.py) gives the exact global rank with every stage "
    "partition-parallel; pct = (rn-1)/(n-1) with doc_id tie-break. The "
    "normalization step that makes per-corpus quality thresholds "
    "comparable across corpora; the oracle's OVER () global window is "
    "exactly the cluster-killer shape the two-pass plan avoids",
)
def q_score_rank_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.quantize import q as _q
    from ..plans.global_rank import global_row_number

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", _q(quality_score("text"), 1_000_000).alias("quality")
    )
    ranked, n = global_row_number(scored, ["quality", "doc_id"])
    return ranked.select(
        "doc_id",
        "quality",
        _q((F.col("_grn") - 1) / F.lit(float(max(n - 1, 1))), 1_000_000).alias("pct"),
    )


# ------------------------------------------------- packing efficiency

PACK_EFF_SCALE = 10**6


def pack_efficiency(docs: DataFrame, budget: int = 512) -> DataFrame:
    """Packing-efficiency audit over q_sequence_packing's assignment:
    per source shard — pack count, mean fill ratio (tokens per pack /
    budget) and the share of packs at ≥90% fill. The wasted-compute
    number a training run reads before launching: fill < 1 is padding,
    fill > 1 is the doc that straddles its pack boundary (greedy
    packing closes a pack only after it overflows, so the LAST doc of
    a pack can push it past budget — documented, not a bug).

    All-integer pack sums; two divisions per shard; the ≥90% test is
    the integer cross-multiplication 10·tokens ≥ 9·budget."""
    from pyspark.sql import Window

    from ..functions.quantize import q as _q

    n_tokens = F.size(F.split("text", " "))
    base = docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.expr("CAST(doc_id DIV 4096 AS BIGINT)").alias("_bk"),
    )
    wbk = (
        Window.partitionBy("source", "_bk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("_cum_in", F.sum("n_tokens").over(wbk))
    woff = (
        Window.partitionBy("source")
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("source", "_bk")
        .agg(F.sum("n_tokens").alias("_tot"))
        .select(
            "source",
            "_bk",
            F.coalesce(F.sum("_tot").over(woff), F.lit(0)).alias("_off"),
        )
    )
    packed = within.join(offsets, ["source", "_bk"]).select(
        "source",
        "n_tokens",
        F.expr(
            f"CAST((_off + _cum_in - n_tokens) DIV {int(budget)} AS BIGINT)"
        ).alias("pack_id"),
    )
    packs = packed.groupBy("source", "pack_id").agg(
        F.sum("n_tokens").alias("ptok")
    )
    agg = packs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("ptok").alias("tok"),
        F.sum(
            F.when(F.col("ptok") * 10 >= 9 * budget, 1).otherwise(0)
        ).alias("n_full"),
    )
    return agg.select(
        "source",
        "n_packs",
        "tok",
        _q(F.col("tok") / (F.col("n_packs") * budget), PACK_EFF_SCALE).alias(
            "mean_fill"
        ),
        _q(F.col("n_full") / F.col("n_packs"), PACK_EFF_SCALE).alias(
            "full_share"
        ),
    )


@register(
    "q_pack_efficiency",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT source, n_tokens,
             CAST(floor((sum(n_tokens) OVER
                 (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - n_tokens) / 512) AS BIGINT) AS pack_id
      FROM t
    ), packs AS (
      SELECT source, pack_id, CAST(sum(n_tokens) AS BIGINT) AS ptok
      FROM packed GROUP BY source, pack_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_packs,
           CAST(sum(ptok) AS BIGINT) AS tok,
           floor(sum(ptok) * 1.0 / (count(*) * 512)
                 * {PACK_EFF_SCALE} + 0.5) / {PACK_EFF_SCALE} AS mean_fill,
           floor(sum(CASE WHEN ptok * 10 >= 9 * 512 THEN 1 ELSE 0 END)
                 * 1.0 / count(*) * {PACK_EFF_SCALE} + 0.5)
             / {PACK_EFF_SCALE} AS full_share
    FROM packs GROUP BY source
    """,
    doc="Packing-efficiency audit per source shard: pack count, mean "
    "fill vs the 512-token budget, share of >=90%-full packs — the "
    "padding-waste number read before a training launch. Integer pack "
    "sums over the q_sequence_packing two-pass assignment, two "
    "divisions per shard",
)
def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_efficiency(load(spark, sf_dir, "documents"))
