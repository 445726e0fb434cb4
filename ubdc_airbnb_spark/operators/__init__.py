from . import (
    chunking,
    dedup,
    graph,
    joins,
    profile,
    sampling,
    similarity,
    sketches,
    spatial,
    tfidf,
    upsert,
    windows,
)

__all__ = [
    "chunking",
    "dedup",
    "graph",
    "joins",
    "profile",
    "sampling",
    "similarity",
    "sketches",
    "spatial",
    "tfidf",
    "upsert",
    "windows",
]
