from . import corpus, dedup, html, multimodal, robots, similarity, sitemap, text

__all__ = [
    "corpus", "dedup", "html", "multimodal", "robots", "similarity",
    "sitemap", "text",
]
