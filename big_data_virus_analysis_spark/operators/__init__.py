from .features import document_tokens, doc_frequency_by_class, info_gain_ranking

__all__ = [
    "document_tokens",
    "doc_frequency_by_class",
    "info_gain_ranking",
]
