from .entropy import entropy2, info_gain, nan_to_zero
from .text import (
    clean_api_expr,
    label_decode,
    label_encode,
    shingles,
    whitespace_tokens,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "entropy2",
    "info_gain",
    "nan_to_zero",
    "clean_api_expr",
    "label_decode",
    "label_encode",
    "shingles",
    "whitespace_tokens",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
