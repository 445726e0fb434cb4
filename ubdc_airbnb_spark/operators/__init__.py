from . import dedup, joins, similarity, spatial, upsert, windows

__all__ = ["dedup", "joins", "similarity", "spatial", "upsert", "windows"]
