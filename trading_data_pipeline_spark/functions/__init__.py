from .vector import cosine_similarity, dot_product, l2_norm
from .text import (
    tokens,
    token_count_whitespace,
    token_count_bpe,
    doc_fingerprint,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "tokens",
    "token_count_whitespace",
    "token_count_bpe",
    "doc_fingerprint",
]
