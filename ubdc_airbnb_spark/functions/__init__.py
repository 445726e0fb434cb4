from . import geometry, hashing, ids, jsonutils, mercator, quadkey, textstats, timeutils, urltools

__all__ = [
    "geometry",
    "hashing",
    "ids",
    "jsonutils",
    "mercator",
    "quadkey",
    "textstats",
    "timeutils",
    "urltools",
]
