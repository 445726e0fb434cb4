"""Snapshot diff — the data-regression operator of a large pipeline:
given two keyed snapshots of a table (yesterday's silver vs today's, a
pipeline run before vs after a code change), classify every key as
added / removed / changed / unchanged and name the changed columns.

This is how a 100 TB pipeline answers "what did this code change do to
the data?" without eyeballing row dumps: diff the outputs, aggregate the
statuses, alert on unexpected churn. The same shape powers CDC extract
(emit only added/removed/changed) between lakehouse snapshots.

Scale: ONE full-outer shuffle join on the key columns — both sides
hash-partition once; the column comparison is a narrow null-safe
expression per compared column, no per-column joins, no windows. The
changed-column list is built with array/filter expressions inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-status diff of two snapshots keyed by ``keys``.

    Output: keys + ``status`` ('added'|'removed'|'changed'|'unchanged')
    + ``changed_cols`` (comma-joined sorted column names; '' unless
    status='changed'). Comparison is null-safe per column, so NULL→value
    and value→NULL count as changes while NULL→NULL does not."""
    cols = compare_cols or [c for c in old.columns if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}") for c in cols])
    n = new.select(*keys, *[F.col(c).alias(f"__n_{c}") for c in cols])
    # presence markers survive the outer join even when every payload
    # column is NULL on a present side
    o = o.withColumn("__in_o", F.lit(1))
    n = n.withColumn("__in_n", F.lit(1))
    j = o.join(n, keys, "full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                )
                for c in sorted(cols)
            ]
        )
    )
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        status.alias("status"),
        F.when(status == "changed", F.array_join(diffs, ","))
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Churn report: row counts per (status, changed_cols) — the tiny
    table a regression gate asserts on."""
    return diff.groupBy("status", "changed_cols").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
