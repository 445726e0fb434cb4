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
    binned = df.select(
        F.when(in_slice_a, F.lit("a")).otherwise(F.lit("b")).alias("grp"),
        bin_of(value, lo, width, bins).alias("bin"),
    )
    counts = binned.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("n"))
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
