"""Slowly-changing-dimension (SCD type 2) construction — the lakehouse
dimension-history operator: turn an append-only change log into validity
intervals (valid_from, valid_to, is_current), collapsing consecutive
records whose tracked attributes did not change.

This is the batch complement to the engine's change-detect upsert
(operators/upsert.py, ref managers.py get_or_create parity): the upsert
maintains "latest state + audit rows" incrementally; SCD2 reconstructs
the full interval history from the log in one pass, which is what as-of
joins (operators/joins.py asof_join) and point-in-time training-data
assembly consume.

Scale: both windows are ``partitionBy(key)`` — per-entity state, never a
global sort; a key's history fits a partition by construction (entities
with millions of versions are a data bug, not a plan problem). Change
comparison uses null-safe equality so NULL→value transitions version
correctly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an append-only change log into SCD2 validity intervals.

    A row opens a new version iff any tracked attribute differs
    (null-safely) from the chronologically previous row of the same key;
    ``valid_to`` is the next version's ``valid_from`` (NULL = current).
    ``tiebreak`` makes the order total when timestamps can collide.

    Output: key_cols + attr_cols + (valid_from, valid_to, is_current).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # a previous row exists (lag of a constant marker distinguishes
    # "first row of the key" from "previous attr was NULL") AND every
    # tracked attribute equals it null-safely → NOT a new version
    unchanged = F.lag(F.lit(1)).over(w).isNotNull()
    for c in attr_cols:
        unchanged = unchanged & F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
    changed = ~F.coalesce(unchanged, F.lit(False))

    versions = df.withColumn("__new_version", changed).filter(F.col("__new_version"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w2)
    return versions.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
