"""ubdc_airbnb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of urbanbigdatacentre/ubdc-airbnb (reference:
/root/reference, surveyed in SURVEY.md).

The reference is a Django/PostGIS/Celery harvesting pipeline; this package
re-expresses its data model, operators, and pipeline semantics Spark-first:

- ``session``    — tuned SparkSession builder
- ``schemas``    — StructTypes for the 8 entities + payload shapes
- ``functions``  — native-expression scalar libraries (quadkey codec,
                   Web-Mercator math, time/JSON/string helpers, text stats)
- ``operators``  — joins (semi/anti/prefix/spatial), upserts (MERGE
                   emulation), windows (top-k, latest-per-key, streaks),
                   aggregates, dedup (exact/MinHash-LSH/SimHash/Jaccard),
                   similarity search (cosine/IVF)
- ``sources``    — parquet table loaders, mock HTTP API source, sinks
- ``plans``      — harvest planners, quadtree-BFS discovery, task ledger
- ``streaming``  — Structured Streaming analogs of the incremental semantics
- ``multimodal`` — binary-column plumbing for image/audio payloads
"""

__version__ = "0.1.0"
