from . import (
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
