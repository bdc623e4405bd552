"""Text-analysis column expressions for LLM-data-pipeline operators.

All JVM-side built-ins (split / higher-order functions / regexp) — the hot
path for trillions of documents must not cross into Python. Patterns follow
the north-star extension list (BASELINE.json): token counting (whitespace +
BPE-ish regex), quality scoring, language-ID heuristic, rolling-hash
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: runs of letters, runs of digits, or single
#: non-alphanumeric marks — the shape GPT-style tokenizers split on first.
BPE_PATTERN = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]"

#: tiny default stopword list for quality scoring (configurable per call)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

MOD = 1_000_000_007


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (keeps internal empty strings exactly like a
    C string-split would — verified identical to DuckDB string_split)."""
    return F.split(text, " ")


def token_count_whitespace(text: Column | str) -> Column:
    return F.size(tokens(text))


def token_count_bpe(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokens via regexp_count (JVM regex engine)."""
    return F.regexp_count(text, F.lit(BPE_PATTERN))


def stopword_ratio(text: Column | str, stopwords=STOPWORDS) -> Column:
    toks = tokens(text)
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    return n_stop / F.size(toks)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercased)."""
    lowered = F.lower(text)
    n_bad = F.length(F.regexp_replace(lowered, "[a-z0-9 ]", ""))
    return n_bad / F.length(lowered)


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic rolling-hash document fingerprint.

    Polynomial hash over tokens, each token hashed by a char-level fold:
    ``tok(w) = fold(a*17 + ascii(c)) mod p``; ``doc = fold(acc*31 + tok(w))
    mod p`` with p = 1e9+7. Stable across engines (verified equal to a
    DuckDB list_reduce implementation) and cheap enough for per-document
    exact-dup keys at 100 TB scale.
    """
    col = text if isinstance(text, str) else None
    expr = (
        f"aggregate(split({col}, ' '), 0L, (acc, w) -> "
        f"(acc*31 + aggregate(split(w, ''), 0L, (a, c) -> (a*17 + ascii(c)) % {MOD})) % {MOD})"
    )
    if col is None:
        raise TypeError("doc_fingerprint requires a column NAME (SQL expr)")
    return F.expr(expr)


def lang_id(text: Column | str, markers: dict[str, tuple[str, ...]] | None = None) -> Column:
    """N-gram/marker-token language-ID heuristic.

    Scores each candidate language by occurrences of its marker tokens and
    returns the argmax (deterministic tiebreak: language order as given,
    'und' when nothing matches). Marker lists are configurable; the default
    is a minimal demo set. Real deployments plug in larger marker
    dictionaries — the plan shape (one pass, no shuffle) is what matters.
    """
    markers = markers or {
        "en": ("the", "a", "of", "and"),
        "de": ("der", "die", "das", "und"),
        "fr": ("le", "la", "et", "les"),
    }
    toks = tokens(text)

    def score(words: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))

    langs = list(markers)
    scores = {lang: score(ws) for lang, ws in markers.items()}
    best = F.greatest(*scores.values()) if len(scores) > 1 else scores[langs[0]]
    out = F.lit("und")
    for lang in reversed(langs):  # earlier language wins ties
        out = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(out)
    return out
