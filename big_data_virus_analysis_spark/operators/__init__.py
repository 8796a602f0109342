from .caching import release_tracked_caches, tracked_cache
from .features import doc_frequency_by_class, document_tokens, info_gain_ranking
from .observe import attach_quality_gate, gate_passed

__all__ = [
    "document_tokens",
    "doc_frequency_by_class",
    "info_gain_ranking",
    "tracked_cache",
    "release_tracked_caches",
    "attach_quality_gate",
    "gate_passed",
]
