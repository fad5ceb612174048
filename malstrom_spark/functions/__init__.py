from . import corpus, dedup, html, multimodal, robots, similarity, text

__all__ = [
    "corpus", "dedup", "html", "multimodal", "robots", "similarity", "text",
]
