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


# ------------------------------------------------------------ count-min


def test_cm_overestimates_never_under(spark):
    """CM guarantee: est >= exact for every key."""
    from ubdc_airbnb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    key = F.col("user_id").cast("string")
    sk = sketches.cm_sketch(ev, key, d=4, w=1024)
    keys = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    est = sketches.cm_estimate(sk, keys, F.col("user_id").cast("string"), d=4, w=1024)
    bad = est.filter(F.col("est") < F.col("exact")).count()
    assert bad == 0
    # with 150 keys in 1024 slots, most estimates are exact
    exact_frac = est.filter(F.col("est") == F.col("exact")).count() / est.count()
    assert exact_frac > 0.8


def test_cm_state_bounded_and_mergeable(spark):
    a = spark.range(5_000).select((F.col("id") % 37).cast("string").alias("v"))
    b = spark.range(5_000, 9_000).select((F.col("id") % 37).cast("string").alias("v"))
    sa, sb = sketches.cm_sketch(a, "v"), sketches.cm_sketch(b, "v")
    assert sa.count() <= 4 * 1024
    # merging = summing counters == sketching the union
    merged = (
        sa.unionByName(sb).groupBy("row", "slot").agg(F.sum("cnt").alias("cnt"))
    )
    direct = sketches.cm_sketch(a.unionByName(b), "v")
    assert sorted(merged.collect()) == sorted(direct.collect())


# ------------------------------------------------------------ sampling


def test_hash_sample_deterministic_and_proportional(spark):
    from ubdc_airbnb_spark.operators import sampling

    df = spark.range(20_000).select(F.col("id").cast("string").alias("k"))
    s1 = {r.k for r in sampling.hash_sample(df, "k", 0.1).collect()}
    s2 = {r.k for r in sampling.hash_sample(df.repartition(7), "k", 0.1).collect()}
    assert s1 == s2  # stable under repartitioning
    assert abs(len(s1) - 2_000) < 300
    # nested fractions: a 5% sample is a subset of the 10% sample
    s3 = {r.k for r in sampling.hash_sample(df, "k", 0.05).collect()}
    assert s3 <= s1


def test_split_covers_and_respects_weights(spark):
    from ubdc_airbnb_spark.operators import sampling

    df = spark.range(50_000).select(F.col("id").cast("string").alias("k"))
    out = sampling.split(df, "k", (("train", 0.8), ("val", 0.1), ("test", 0.1)))
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}  # no NULL remainder
    assert abs(counts["train"] - 40_000) < 1_000
    assert abs(counts["val"] - 5_000) < 400


# ------------------------------------------------------------ profiling


def test_profile_table_counts_and_nulls(spark):
    from ubdc_airbnb_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, v string"
    )
    got = {r["column"]: r for r in profile_table(df, ["id", "v"]).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_nulls == 0
    assert got["v"].n_nulls == 1
    assert got["v"].min_value == "a" and got["v"].max_value == "b"
    # 2 distinct non-null values; HLL at this size is exact-ish
    assert abs(got["v"].n_distinct_est - 2) < 0.5
    assert abs(got["id"].n_distinct_est - 4) < 1.0
