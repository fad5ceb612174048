from . import corpus, dedup, multimodal, similarity, text

__all__ = ["corpus", "dedup", "multimodal", "similarity", "text"]
