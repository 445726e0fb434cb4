"""Table profiling (north-star data-quality): one long-format stats row
per column — row/null counts, distinct-cardinality estimate via the
portable HLL sketch, min/max.

This is the "what is in this 100 TB table" primitive a pipeline runs
before training: every per-column statistic is a map-side-combinable
aggregate, and the distinct count is the O(4096)-state sketch from
``operators/sketches.py``, not an exact ``COUNT(DISTINCT)`` shuffle of
the whole column. The per-column loop is a driver loop over the
(schema-sized) column list; each iteration is set-based.

min/max are emitted as strings so one long-format schema fits every
column type; gate queries stick to string/integer columns where the
cast rendering is engine-stable (float/timestamp rendering differs
between engines — compare those numerically instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import hll_distinct_count


def profile_table(df: DataFrame, cols: list[str] | None = None, b: int = 12) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct_est, min_value, max_value)
    — one row per profiled column."""
    cols = cols or df.columns
    spark = df.sparkSession
    out = None
    for c in cols:
        base = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        )
        est = hll_distinct_count(
            df.filter(F.col(c).isNotNull()), F.col(c).cast("string"), b=b
        ).select(F.col("est").alias("n_distinct_est"))
        row = base.join(est).select(
            F.lit(c).alias("column"),
            "n_rows",
            "n_nulls",
            "n_distinct_est",
            "min_value",
            "max_value",
        )
        out = row if out is None else out.unionByName(row)
    return out
