"""Skew-resilient aggregation (north-star: hot keys at 100 TB).

A plain ``groupBy(key)`` shuffles every row of a hot key to one reducer;
at 100 TB a single viral key can hold a 10-TB partition while 999
executors idle. Spark's partial aggregation already absorbs most of this
for *algebraic* aggregates, but collect-style aggregates
(``collect_list``, exact ``count_distinct`` per group) and extreme skew
still bottleneck.

``salted_agg`` makes the classic two-phase repair explicit and reusable:

  phase 1: groupBy(key, salt)  — salt = hash(row) % fanout splits each
           hot key across ``fanout`` reducers; partial aggregate there.
  phase 2: groupBy(key)        — merge the ≤ fanout partials per key
           (tiny input: |keys| × fanout rows).

The salt is a *content* hash (md5 of a caller-chosen unique column), not
``rand()``, so retried tasks and the DuckDB oracle reproduce identical
partials bit-for-bit. Result equals the unsalted aggregate exactly for
any merge-algebra aggregate (sum/count/min/max/bit_or/...).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


class MergeAgg:
    """One aggregate expressed as (partial expr, merge expr) over the
    same output name — e.g. sum/sum, count/sum, min/min, max/max."""

    def __init__(self, name: str, partial: Column, merge_fn) -> None:
        self.name = name
        self.partial = partial.alias(name)
        self.merge = merge_fn(F.col(name)).alias(name)


def sum_agg(col: Column | str, name: str) -> MergeAgg:
    c = F.col(col) if isinstance(col, str) else col
    return MergeAgg(name, F.sum(c), F.sum)


def count_agg(name: str) -> MergeAgg:
    return MergeAgg(name, F.count(F.lit(1)), F.sum)


def min_agg(col: Column | str, name: str) -> MergeAgg:
    c = F.col(col) if isinstance(col, str) else col
    return MergeAgg(name, F.min(c), F.min)


def max_agg(col: Column | str, name: str) -> MergeAgg:
    c = F.col(col) if isinstance(col, str) else col
    return MergeAgg(name, F.max(c), F.max)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_src: Column | str,
    aggs: Sequence[MergeAgg],
    fanout: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregate (see module docstring).

    ``salt_src`` must be unique-ish per row (a row id) so the salt
    spreads hot keys uniformly. Phase 2's input is |keys|·fanout rows —
    the second shuffle is negligible at any scale."""
    keys = list(keys)
    salt = (md5_long(salt_src, salt="skew") % fanout).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(*[a.partial for a in aggs])
    return partial.groupBy(*keys).agg(*[a.merge for a in aggs])


def key_skew_report(
    df: DataFrame,
    key: Column | str,
    top: int = 10,
) -> DataFrame:
    """Join/agg-key skew diagnostic — the measurement that decides
    whether a key needs `salted_join`/`salted_agg` and with what salt
    factor: per hot key its row count and share, plus the global
    imbalance ratio (hottest count / mean count) every row carries.

    One map-side-combinable groupBy over the key, then a TakeOrdered
    top-k and a single-row stats aggregate joined back by broadcast —
    the key-count table is distinct-key-sized, never row-sized, and the
    top-k never sorts it globally (TakeOrderedAndProject).

    Output: (key, cnt, share, imbalance, rank), rank ≤ ``top`` by
    (cnt DESC, key)."""
    k = F.col(key) if isinstance(key, str) else key
    counts = df.select(k.cast("string").alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
        F.max("cnt").alias("__maxcnt"),
    )
    topk = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(top)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    return (
        topk.join(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            (F.col("cnt").cast("double") / F.col("__total").cast("double")).alias("share"),
            (
                F.col("__maxcnt").cast("double")
                / (F.col("__total").cast("double") / F.col("__nkeys").cast("double"))
            ).alias("imbalance"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
    )


def join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    key_a: Column | str,
    key_b: Column | str | None = None,
) -> DataFrame:
    """Exact inner-equi-join output cardinality WITHOUT running the join:
    |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k), computed from the two per-key count
    tables joined on the key. The planning probe that decides broadcast
    vs shuffle vs salted BEFORE committing a cluster to a blowup — the
    count tables are distinct-key-sized, so the probe costs two map-side
    aggregates and one key join however large the fact tables are.

    Also reports the single hottest key's contribution: a join whose
    size is fine in total but 90% one key still needs `salted_join`.

    Output (1 row): (join_rows, n_matching_keys, max_key_rows,
    max_key): the estimated-join row count is EXACT (it is the identity
    above, not an estimate) for inner equi-joins without nulls."""
    ka = F.col(key_a) if isinstance(key_a, str) else key_a
    kb_src = key_b if key_b is not None else key_a
    kb = F.col(kb_src) if isinstance(kb_src, str) else kb_src
    ca = a.select(ka.cast("string").alias("k")).groupBy("k").agg(F.count(F.lit(1)).alias("na"))
    cb = b.select(kb.cast("string").alias("k")).groupBy("k").agg(F.count(F.lit(1)).alias("nb"))
    per_key = ca.join(cb, "k").select("k", (F.col("na") * F.col("nb")).alias("rows"))
    return per_key.agg(
        F.sum("rows").alias("join_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.max("rows").alias("max_key_rows"),
        F.max(F.struct(F.col("rows"), F.col("k")))["k"].alias("max_key"),
    )
