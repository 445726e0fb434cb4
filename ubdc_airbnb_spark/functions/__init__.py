from . import hashing, jsonutils, mercator, quadkey, textstats, timeutils

__all__ = ["hashing", "jsonutils", "mercator", "quadkey", "textstats", "timeutils"]
