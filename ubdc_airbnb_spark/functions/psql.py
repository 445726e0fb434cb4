"""One-parse parameterized SQL over DataFrames, without the pyspark
``SQLStringFormatter`` overhead.

The package's heavy constructors (the dedup contraction joins, the
tf-idf inverted-index cosine) assemble their plan as ONE SQL parse —
the documented alternative to ~20 py4j round trips of Column-chain
latency per build. pyspark's ``spark.sql(..., df=df)`` formatter path
serves that, but pays register + string-vformat + dropTempView churn
on every call: measured 35 ms per call vs 18 ms for a plain
temp-view + parse on this host (BENCH_NOTES r11). At 9 formatter
calls per headline bench sweep that churn was ~0.15 s of pure driver
overhead per sweep — and the same per plan build in production loops.

:func:`psql` keeps the one-parse property and halves the per-call
latency: each DataFrame argument is registered once under a stable
per-kwarg view name (``__psql_<kwarg>``) and the view is LEFT
REGISTERED — ``createOrReplaceTempView`` makes the next call at any
site reuse the slot, and ``spark.sql`` analyzes eagerly, so the
returned frame binds the view's CURRENT definition at creation and is
immune to later re-registration.

Constraint: plan construction must be driver-single-threaded per
SparkSession (true for every builder in this repo — driver loops and
``foreachBatch`` folds, which Structured Streaming serializes per
query). Two threads building with the same kwarg name concurrently
could cross-bind views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def psql(sql: str, **frames: DataFrame) -> DataFrame:
    """Run ``sql`` with ``{name}`` placeholders bound to DataFrame
    kwargs — a drop-in for ``spark.sql(sql, **frames)`` at half the
    driver latency. The placeholder syntax is the same str.format
    style the pyspark formatter uses."""
    spark = next(iter(frames.values())).sparkSession
    names = {}
    for k, df in frames.items():
        view = f"__psql_{k}"
        df.createOrReplaceTempView(view)
        names[k] = view
    return spark.sql(sql.format(**names))
