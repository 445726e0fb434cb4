"""Portable HLL sketch: accuracy, merge algebra, O(m) state."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubdc_airbnb_spark.operators import sketches


def _est(df_one_row) -> float:
    return df_one_row.collect()[0].est


def test_hll_accuracy_within_rse(spark):
    """b=12 → relative standard error 1.04/sqrt(4096) ≈ 1.6%; assert a
    generous 3σ bound over a known cardinality."""
    n = 50_000
    df = spark.range(n).select(F.concat(F.lit("user-"), F.col("id")).alias("v"))
    est = _est(sketches.hll_distinct_count(df, "v", b=12))
    assert abs(est - n) / n < 0.05, est


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities hit the linear-counting correction and stay
    within a few percent."""
    df = spark.range(100).select(F.col("id").cast("string").alias("v"))
    est = _est(sketches.hll_distinct_count(df, "v", b=12))
    assert abs(est - 100) / 100 < 0.1, est


def test_hll_duplicates_do_not_inflate(spark):
    """The sketch sees hashes, not rows: 100× duplication of the same
    keys gives the identical register table and estimate."""
    base = spark.range(1_000).select(F.col("id").cast("string").alias("v"))
    dup = spark.range(100_000).select((F.col("id") % 1_000).cast("string").alias("v"))
    assert _est(sketches.hll_distinct_count(base, "v")) == _est(
        sketches.hll_distinct_count(dup, "v")
    )


def test_hll_merge_equals_union(spark):
    """Register-max merge == sketching the unioned data (the cluster
    rollup path: per-day sketches combine without raw data)."""
    a = spark.range(0, 30_000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(20_000, 60_000).select(F.col("id").cast("string").alias("v"))
    merged = sketches.hll_merge(
        sketches.hll_registers(a, "v"), sketches.hll_registers(b, "v")
    )
    direct = sketches.hll_registers(a.unionByName(b), "v")
    assert sorted(merged.collect()) == sorted(direct.collect())
    est = _est(sketches.hll_estimate(merged))
    assert abs(est - 60_000) / 60_000 < 0.05


def test_hll_state_is_bounded(spark):
    """Register table ≤ m rows regardless of input size (the whole point
    at 100 TB)."""
    df = spark.range(200_000).select(F.col("id").cast("string").alias("v"))
    assert sketches.hll_registers(df, "v", b=8).count() <= 256
