"""Deduplication operators for LLM training-data pipelines.

Five strategies, each a different cost/recall point (north-star list in
BASELINE.json; patterns from PAPERS.md distributed-similarity papers):

- :func:`exact_dedup` — hash groupBy on a canonical content key.
- :func:`simhash` — 60-bit bit-vote fingerprint; near-dups differ in few
  bits (Hamming ball search downstream).
- :func:`ngram_jaccard_pairs` — word n-gram shingle Jaccard for candidate
  pairs.
- :func:`minhash_lsh_pairs` — MinHash+LSH banding via MLlib: the sub-
  quadratic 100 TB path (shingle → minhash sketch → band bucket join).
- :func:`embedding_near_dup_pairs` — semantic near-dup via embedding cosine
  within blocking keys.

Scale notes: exact/simhash/fingerprint are single-pass + one shuffle on the
key. Pairwise strategies are quadratic unless blocked — ``block_col``
(label, language, LSH bucket) bounds the join fan-out; MinHashLSH's
``approxSimilarityJoin`` does the same with hash bands. None of them
collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 60  # stay clear of the sign bit of int64


def canonical_token_key(text: str | Column) -> Column:
    """Order-insensitive content key: the sorted whitespace-token multiset.

    Catches 'same words, shuffled order' duplicates that byte-exact dedup
    misses, while staying a pure hash-groupBy (one shuffle on the key).
    """
    return F.sort_array(F.split(text, " "))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by canonical content key → (kept id, group size).

    The kept row is min(id) per group (deterministic). At 100 TB the key
    can be replaced by its fingerprint (functions.text.doc_fingerprint) to
    shuffle 8-byte keys instead of token arrays.
    """
    return (
        df.groupBy(canonical_token_key(text_col).alias("_key"))
        .agg(
            F.min(id_col).alias("doc_id_keep"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_key")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-document SimHash fingerprint via md5 bit votes.

    Each token votes ±1 on every bit of md5(token); fingerprint bit b is 1
    iff the vote sum is positive. Term frequency weights votes naturally
    (each occurrence votes). Fully relational: explode tokens × explode
    bits → two hash aggregations; ~64× token-count intermediate rows but
    map-side partial aggregation collapses them before the shuffle.
    """
    tok = df.select(id_col, F.explode(F.split(text_col, " ")).alias("w"))
    hashed = tok.select(id_col, F.md5("w").alias("m"))
    bit_rows = hashed.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        "m",
    )
    # nibble value of the hex digit holding bit b, then extract the bit
    bit = F.expr(
        "shiftright(instr('0123456789abcdef', substring(m, CAST(b div 4 AS INT) + 1, 1)) - 1,"
        " 3 - b % 4) & 1"
    )
    votes = (
        bit_rows.select(id_col, "b", F.when(bit == 1, 1).otherwise(-1).alias("vote"))
        .groupBy(id_col, "b")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy(id_col).agg(
        F.sum(F.expr("CASE WHEN v > 0 THEN shiftleft(1L, b) ELSE 0L END")).alias("simhash")
    )


def shingles(text: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (documents shorter than n words have
    none — callers filter on token count first)."""
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    parts = lambda i: [F.element_at(toks, i + j) for j in range(n)]  # noqa: E731
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pair_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Jaccard similarity of n-gram shingle sets for given candidate pairs.

    ``pair_df`` holds (doc_a, doc_b) candidates — produced by any blocking
    scheme (LSH buckets, simhash bands, consecutive ids for audits). The
    shingle table is computed once and joined twice; set ops stay JVM-side
    (array_intersect / array_union).
    """
    sh = df.filter(F.size(F.split(text_col, " ")) >= n).select(
        F.col(id_col).alias("_id"), shingles(text_col, n).alias("sh")
    )
    a = sh.select(F.col("_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        pair_df.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hash_tables: int = 5,
    max_distance: float = 0.5,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MinHash + LSH banding (sub-quadratic).

    shingle → HashingTF (binary) → MinHashLSH sketch → band-bucket self-join
    with Jaccard-distance cutoff. This is the 100 TB near-dup path: the
    candidate set is |bucket|² per band, not |corpus|².
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    base = df.filter(F.size(F.split(text_col, " ")) >= n).select(
        id_col, shingles(text_col, n).alias("sh")
    )
    tf = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=num_features, binary=True
    )
    feat = tf.transform(base).filter(F.size("sh") > 0)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, max_distance, distCol="jaccard_dist")
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.4,
) -> DataFrame:
    """Semantic near-dup: same-block pairs with cosine ≥ threshold.

    ``block_col`` bounds the self-join (cluster id / LSH bucket at scale;
    without it this is a full cross join — refuse that at 100 TB).
    """
    from ..functions.vector import cosine_similarity

    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    joined = a.join(b, ["blk"]) if block_col else a.crossJoin(b)
    sim = F.round(cosine_similarity(F.col("va"), F.col("vb")), 4)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
