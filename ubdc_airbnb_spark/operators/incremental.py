"""Incremental aggregate maintenance (north-star: don't rescan 100 TB to
update yesterday's rollup).

A production pipeline lands data in batches (a day of events, a crawl
snapshot). Recomputing ``GROUP BY key`` over the full history per batch
is O(history); the scalable pattern is a *materialized partial-state
table* with a merge algebra:

  state(key) = (cnt, sum, min, max, hll-ish distinct words ...)
  new batch  -> partial_state(batch)          (scans only the batch)
  state'     = merge(state, partial_state)    (shuffles only |keys| rows)

``partial_state`` / ``merge_states`` implement that algebra for the
classic algebraic aggregates plus a portable HLL register set (see
operators/sketches.py) so distinct counts also merge without raw data.
``finalize`` turns a state table into user-facing metrics. The identity
``finalize(merge(partial(A), partial(B))) == direct_agg(A ∪ B)`` is the
correctness contract — oracle-gated (``ns_incremental_agg``) and
property-tested.

Streaming is the same algebra at a different trigger: the batch twin of
what ``streaming/jobs.py`` does with watermarked windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("cnt", "sum_v", "min_v", "max_v")


def partial_state(
    df: DataFrame, keys: Sequence[str], value: Column | str
) -> DataFrame:
    """Per-key partial aggregate state of one batch. Sum carried as
    DECIMAL(18,2) so merge order can never change a bit (doubles are
    not associative; decimals are)."""
    v = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(v.cast("decimal(18,2)")).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_states(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> DataFrame:
    """state ⊕ state: unionByName then re-aggregate with the merge side
    of each algebra (count→sum, sum→sum, min→min, max→max). Input is
    2·|keys| rows — trivially cheap no matter how big the batches were."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def finalize(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """User-facing metrics from a state table: count, exact sum (cast
    back to double), min, max, mean = sum/cnt in double."""
    return state.select(
        *keys,
        F.col("cnt"),
        F.col("sum_v").cast("double").alias("sum_value"),
        F.col("min_v").alias("min_value"),
        F.col("max_v").alias("max_value"),
        (F.col("sum_v").cast("double") / F.col("cnt")).alias("avg_value"),
    )
