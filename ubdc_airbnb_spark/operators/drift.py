"""Distribution-drift monitoring — the data-quality watchdog of a
continuously-fed pipeline: compare the histogram of a signal (quality
score, token count, price, latency) between two slices — yesterday's
snapshot vs today's, source A vs the rest, pre- vs post-change — and
quantify the shift per bin.

The per-bin divergence contribution is the χ²-style term

    contrib(bin) = (p_a - p_b)² / (p_a + p_b)      (0 when both empty)

chosen over PSI/KL deliberately: it needs no logarithm, so every value
is plain IEEE rational arithmetic on identical operands — bit-stable
across engines with no quantization plumbing — and it is bounded and
symmetric. Consumers fold the (bins-sized) per-bin table into a scalar
however they like; alert thresholds are calibrated per signal anyway.

Scale: binning is a narrow clamp/floor expression; the aggregation is a
groupBy on (slice, bin) — a key space of ``2·bins``, fully map-side
combined, so the shuffle carries O(partitions · bins) rows regardless of
input volume. Slice totals join back by broadcast (two rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def bin_of(value: Column, lo: float, width: float, bins: int) -> Column:
    """Fixed-width bin id with edge clamping: values below ``lo`` land in
    bin 0, values beyond the top edge in ``bins-1`` — drift in the tails
    still registers instead of being dropped. NULL values get bin -1 (a
    first-class bucket: a null-rate shift IS distribution drift; leaving
    them as NULL bins would split into unjoinable rows in the full-outer
    compare and double-count their mass)."""
    raw = F.floor((value - F.lit(float(lo))) / F.lit(float(width))).cast("long")
    clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    return F.when(value.isNull(), F.lit(-1)).otherwise(clamped)


def binned_slices(
    df: DataFrame,
    value: Column,
    in_slice_a: Column,
    lo: float,
    width: float,
    bins: int,
) -> DataFrame:
    """(grp, bin) rows — the narrow per-row stage of the drift monitor,
    shared by the batch operator and its streaming twin (streaming-safe:
    pure projection, no aggregation)."""
    return df.select(
        F.when(in_slice_a, F.lit("a")).otherwise(F.lit("b")).alias("grp"),
        bin_of(value, lo, width, bins).alias("bin"),
    )


def drift_from_bin_counts(counts: DataFrame) -> DataFrame:
    """Finalize a (grp, bin, n) count table into the drift report — the
    algebra is count-mergeable, so an incrementally maintained state
    table (streaming/jobs.foreach_batch_drift_state) finalizes to
    EXACTLY the batch recompute: probabilities and χ²-style contribs are
    IEEE-exact functions of the integer counts."""
    totals = counts.groupBy("grp").agg(F.sum("n").alias("total"))
    probs = counts.join(broadcast(totals), "grp").select(
        "grp", "bin", (F.col("n").cast("double") / F.col("total").cast("double")).alias("p")
    )
    a = probs.filter(F.col("grp") == "a").select("bin", F.col("p").alias("p_a"))
    b = probs.filter(F.col("grp") == "b").select("bin", F.col("p").alias("p_b"))
    j = a.join(b, "bin", "full_outer").select(
        "bin",
        F.coalesce(F.col("p_a"), F.lit(0.0)).alias("p_a"),
        F.coalesce(F.col("p_b"), F.lit(0.0)).alias("p_b"),
    )
    d = F.col("p_a") - F.col("p_b")
    s = F.col("p_a") + F.col("p_b")
    return j.withColumn(
        "contrib", F.when(s > 0, (d * d) / s).otherwise(F.lit(0.0))
    )


def histogram_drift(
    df: DataFrame,
    value: Column,
    in_slice_a: Column,
    lo: float,
    width: float,
    bins: int,
) -> DataFrame:
    """Per-bin probability comparison of ``value`` between slice A
    (``in_slice_a`` true) and slice B (the rest).

    Output: (bin, p_a, p_b, contrib) — one row per bin observed in
    either slice; absent mass is 0.0."""
    binned = binned_slices(df, value, in_slice_a, lo, width, bins)
    counts = binned.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("n"))
    return drift_from_bin_counts(counts)


def rate_anomaly(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    sigma: float = 3.0,
) -> DataFrame:
    """Per-entity event-rate anomaly days: flag days whose event count
    sits more than ``sigma`` standard deviations from the entity's own
    daily mean — the volume-spike/outage detector of a continuously-fed
    pipeline (a crawler gone hot, a source gone dark-then-flooding).

    Exact arithmetic end-to-end: daily counts are integers, per-entity
    moment sums (Σc, Σc²) are exact int64, and mean/variance/threshold
    are IEEE-exact ops of those integers — deterministic across engines
    and partitionings with no quantization plumbing. The σ compare
    clears denominators — ``(c·n − Σc)² > σ²·(n·Σc² − (Σc)²)`` — so no
    square root is computed; the squares are taken in double space
    (exact below 2^53, which int64 squaring would overflow first).

    Two map-side-combinable aggregates (entity-day, then entity) and one
    broadcast-size join back per entity. Entities with a single active
    day have zero variance and are never flagged (their only day IS the
    mean). Output: (entity, day 'yyyy-MM-dd', c, mean_c, anomaly)."""
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day")
    daily = events.groupBy(F.col(entity_col).alias("ent"), day).agg(
        F.count(F.lit(1)).alias("c")
    )
    return rate_anomaly_from_daily(daily, entity_col, sigma)


def rate_anomaly_from_daily(
    daily: DataFrame, entity_col: str, sigma: float = 3.0
) -> DataFrame:
    """Finalize a (ent, day, c) daily-count table into the anomaly report
    (see :func:`rate_anomaly` for semantics). Daily counts merge by sum,
    so the streaming twin maintains them incrementally and finalizes to
    the exact batch result — the flags are deterministic functions of the
    integer counts."""
    stats = daily.groupBy("ent").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    j = daily.join(stats, "ent")
    dev = (F.col("c") * F.col("n") - F.col("sc")).cast("double")  # n·(c - mean)
    var_n2 = (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")).cast("double")
    return j.select(
        F.col("ent").alias(entity_col),
        "day",
        "c",
        (F.col("sc").cast("double") / F.col("n").cast("double")).alias("mean_c"),
        (dev * dev > F.lit(float(sigma) * float(sigma)) * var_n2).alias("anomaly"),
    )
