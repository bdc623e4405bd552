"""q_char_entropy's Arrow histogram pass (round 10).

The rewrite's contract: only exact INTEGER counts cross the Python
boundary (one vectorized bincount per batch) and the -(p log2 p) fold
stays a JVM ``aggregate`` over the SAME ascending count array the old
all-JVM formulation produced — so every output row must be
BIT-IDENTICAL to the previous per-distinct-char literal-scan
formulation. These tests pin that equality on the driver testdata and
on crafted edge cases (empty batch partitions, single-char docs,
repeated-char spam, whitespace, count ties).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trading_data_pipeline_spark.operators.text_queries import (
    _char_counts_sorted,
    q_char_entropy,
)
from trading_data_pipeline_spark.registry import load


def _legacy_char_entropy(docs):
    """The pre-round-10 all-JVM formulation, kept verbatim as the
    identity oracle for the Arrow histogram path."""
    entropy = F.expr(
        "aggregate("
        "  array_sort(transform(array_distinct(split(text, '')),"
        "    c -> length(text) - length(replace(text, c, '')))),"
        "  cast(0.0 as double),"
        "  (acc, c) -> acc - (c / length(text)) * log2(c / length(text)))"
    )
    return docs.filter(F.length("text") > 0).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        (F.floor(entropy * 10000 + 0.5) / 10000).alias("char_entropy"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_char_entropy_matches_legacy_on_testdata(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    assert _rows(q_char_entropy(spark, sf_dir)) == _rows(
        _legacy_char_entropy(docs)
    )


def test_char_entropy_edge_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "a"),  # single char: entropy 0
            (2, "aaaaaaa"),  # repeated-char spam: entropy 0
            (3, "ab" * 50),  # two equal counts (tie in the sort)
            (4, ""),  # filtered out
            (5, "  x  "),  # whitespace-heavy
            (6, "abcabcabcz"),  # ties + a hapax char
            (7, None),  # null text: filtered out (length(null) null)
            # non-ASCII: these route the batch through the exact
            # Counter/code-point fallback (byte != code point), which
            # must match the legacy JVM split('')+length() formulation
            # for BMP text — the round-10 ADVICE coverage gap
            (8, "héllo wörld"),  # accented latin
            (9, "日本語のテキストです 日本語"),  # CJK incl. repeats
            (10, "mix アジア text ascii"),  # mixed-script batch
        ],
        "doc_id long, text string",
    ).repartition(4)  # force some empty/small Arrow partitions
    got = {r[0]: r for r in _legacy_char_entropy(docs).collect()}
    ent = F.expr(
        "aggregate(counts, cast(0.0 as double),"
        "  (acc, c) -> acc - (c / n_chars) * log2(c / n_chars))"
    )
    new = {
        r[0]: r
        for r in _char_counts_sorted(docs)
        .select(
            "doc_id",
            "n_chars",
            (F.floor(ent * 10000 + 0.5) / 10000).alias("char_entropy"),
        )
        .collect()
    }
    assert set(new) == {1, 2, 3, 5, 6, 8, 9, 10} and set(got) == set(new)
    for k in got:
        assert tuple(new[k]) == tuple(got[k])
    assert new[1][2] == 0.0 and new[2][2] == 0.0


def test_char_counts_are_sorted_exact_integers(spark):
    docs = spark.createDataFrame(
        [(1, "mississippi river")], "doc_id long, text string"
    )
    row = _char_counts_sorted(docs).collect()[0]
    # ' '×1 e×1 m×1 v×1 p×2 r×2 s×4 i×5  → ascending with ties
    assert row.n_chars == 17
    assert row.counts == [1, 1, 1, 1, 2, 2, 4, 5]
