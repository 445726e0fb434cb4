"""Window / top-k / dedup-by-key operators (SURVEY §2.5 W1-W6, §2.4 A5).

All are expressed with Spark window functions or TakeOrderedAndProject —
Catalyst turns the global top-k into a per-partition partial top-k + single
merge, which is the scalable plan at 100 TB (no full sort)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_stalest(
    df: DataFrame,
    ts_col: str,
    k: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """W1: top-k rows with the oldest (NULLS FIRST) ``ts_col`` — the
    reference's work-selection idiom
    ``order_by(F(...).asc(nulls_first=True))[:how_many]``
    (ref operations/reviews.py:118-122, grids.py:144-154).

    Spark compiles ``orderBy(...).limit(k)`` to TakeOrderedAndProject:
    each partition keeps k candidates, a single reduce merges — no global
    shuffle-sort, which is what makes this work on a billion-row backlog.
    """
    order = [F.col(ts_col).asc_nulls_first()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return df.orderBy(*order).limit(k)


def first_row_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """W2/A5: one row per key by explicit ordering — Postgres
    ``DISTINCT ON (keys) ... ORDER BY keys, order`` semantics
    (ref managers.py:316-317, tasks.py:133-138).

    ``row_number() OVER (PARTITION BY keys ORDER BY order) = 1``; with AQE
    the single shuffle hash-partitions by key, and skewed keys are split
    at runtime."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key(df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: str | None = None) -> DataFrame:
    """W2: latest row per key (the "only latest response" export —
    ref README.md:117-119)."""
    order = [F.col(ts_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    return first_row_per_key(df, keys, order)


def assign_batches(df: DataFrame, order_col: str, batch_size: int = 100) -> DataFrame:
    """W6: chunk rows into fixed-size contiguous batches
    (CELERY_TASK_CHUNK_SIZE=100, ref core/settings.py:9) —
    ``batch_id = floor((row_number-1)/n)``.

    The global row_number is the two-pass range-partitioned rank
    (``operators/prefixsum.py``): per-bucket row_number + broadcast
    bucket-count offsets — no single-partition Exchange, so contiguous
    batching survives a table-sized input. ``order_col`` must be numeric
    (the boundary sketch needs it); when batch *membership* rather than
    contiguity is all that matters, plain ``repartition(n_batches)`` is
    cheaper still."""
    from .prefixsum import partitioned_row_number

    ranked = partitioned_row_number(
        df, order=[F.col(order_col)], out_col="__rn", bucket_key=F.col(order_col)
    )
    return ranked.withColumn(
        "batch_id", F.floor((F.col("__rn") - 1) / batch_size).cast("long")
    ).drop("__rn")


def availability_runs(
    df: DataFrame,
    key: str,
    order_col: str,
    available_col: Column | str,
    min_run: int,
) -> DataFrame:
    """W5/S7: first run of ≥ ``min_run`` consecutive available rows per
    key — the booking check-in/check-out derivation that the reference
    does with an imperative scan over calendar days
    (ref airbnb_api.py:447-480).

    Gaps-and-islands: ``island = row_number() - row_number-within-
    available``; group by (key, island) over available rows; keep islands
    of length ≥ min_run; return the earliest island per key.
    Two window passes + one aggregation — all shuffle on ``key``, so the
    plan reuses one hash partitioning end-to-end.
    """
    avail = F.col(available_col) if isinstance(available_col, str) else available_col
    w_all = Window.partitionBy(key).orderBy(order_col)
    with_rn = df.withColumn("__avail", avail).withColumn("__rn", F.row_number().over(w_all))
    w_avail = Window.partitionBy(key, "__avail").orderBy(order_col)
    islands = with_rn.withColumn("__island", F.col("__rn") - F.row_number().over(w_avail))
    runs = (
        islands.filter(F.col("__avail"))
        .groupBy(key, "__island")
        .agg(
            F.min(order_col).alias("run_start"),
            F.max(order_col).alias("run_end"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .filter(F.col("run_len") >= min_run)
    )
    return first_row_per_key(runs, [key], [F.col("run_start").asc()]).drop("__island")
