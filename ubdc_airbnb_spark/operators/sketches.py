"""Distributed sketch operators (north-star: cardinality / frequency at
100 TB without exact state).

The built-in ``approx_count_distinct`` is a black-box HLL++ whose exact
register values differ between engines, so it cannot be oracle-checked.
This module implements a *portable* HyperLogLog entirely as DataFrame
algebra — md5-derived 60-bit hashes, bit-sliced bucket/rho, integer
register table — so DuckDB replays the identical sketch bit-for-bit
(``ns_hll_distinct`` gate). The shape is the production shape: one
map-side-combinable groupBy over ``m`` buckets, a second tiny aggregate
over ≤ m rows; sketch state is O(m), never O(distinct).

Merging sketches (union of datasets) = elementwise MAX of register
tables — the same groupBy run over the unioned register rows, which is
how per-partition / per-day sketches roll up on a cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: rho values live in [1, 49]: the hash is 60 bits, ``b`` bits pick the
#: bucket and the remaining 48 feed the leading-zero count.
_HASH_BITS = 60


def hll_registers(
    df: DataFrame, col: str | Column, b: int = 12
) -> DataFrame:
    """HLL register table: (bucket, m_j = max rho) over distinct hashes.

    bucket = low ``b`` bits of the 60-bit hash; rho = 1 + leading zeros
    of the remaining ``60-b`` bits (computed with ``bin()`` string length
    — identical in Spark and DuckDB, no floating log2). One shuffle on
    the bucket id (m = 2^b keys, uniform)."""
    m = 1 << b
    rest_bits = _HASH_BITS - b
    h = md5_long(col)
    rest = F.shiftright(h, b)
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits + 1) - F.length(F.bin(rest))
    )
    return (
        df.select(
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"), rho.cast("int").alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union of sketches = elementwise max of register tables (the
    cluster rollup path: per-partition/per-day sketches combine without
    touching raw data)."""
    it = iter(register_tables)
    out = next(it)
    for t in it:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("m_j").alias("m_j"))


def hll_estimate(registers: DataFrame, b: int = 12) -> DataFrame:
    """Cardinality estimate from a register table, all-integer harmonic
    sum so the oracle replays it exactly:

    S = Σ_j 2^(49 - m_j) (absent buckets contribute 2^49) — a BIGINT;
    the harmonic mean denominator is S / 2^49 exactly, so
    E_raw = α_m · m² · 2^49 / S with a single float multiply/divide.
    Small-range (linear counting) correction when E ≤ 2.5 m and empty
    buckets remain: E = m · ln(m / V). Returns one row:
    (m, v_zero_buckets, s_harmonic, est_raw, est) — estimates rounded to
    4 decimals (ln/division are the only libm touchpoints)."""
    m = 1 << b
    rest_bits = _HASH_BITS - b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.count(F.lit(1)).alias("n_present"),
        # shift amount is a Column: F.shiftleft rejects it, call_function works
        F.sum(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.lit(rest_bits + 1) - F.col("m_j")).cast("int")
            )
        ).alias("s_present"),
    )
    v = F.lit(m) - F.col("n_present")
    s = F.col("s_present") + v * F.shiftleft(F.lit(1).cast("long"), rest_bits + 1)
    est_raw = F.lit(alpha * m * m * float(1 << (rest_bits + 1))) / s.cast("double")
    est = F.when(
        (est_raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    ).otherwise(est_raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        v.cast("long").alias("v_zero_buckets"),
        s.cast("long").alias("s_harmonic"),
        F.round(est_raw, 4).alias("est_raw"),
        F.round(est, 4).alias("est"),
    )


def hll_distinct_count(df: DataFrame, col: str | Column, b: int = 12) -> DataFrame:
    """One-shot portable-HLL distinct count (register + estimate)."""
    return hll_estimate(hll_registers(df, col, b), b)


# ---------------------------------------------------------------------------
# Count-Min sketch: frequency estimates in O(d·w) state
# ---------------------------------------------------------------------------


def cm_sketch(
    df: DataFrame, col: str | Column, d: int = 4, w: int = 1024
) -> DataFrame:
    """Count-Min sketch as a counter table (row, slot, cnt): ``d``
    salted md5 hash rows × ``w`` slots. Built with one explode(d) +
    map-side-combinable groupBy on (row, slot) — state is O(d·w)
    regardless of input size, and two sketches merge by summing
    counters. Deterministic (salted md5, no RNG), so DuckDB replays it
    exactly."""
    c = F.col(col) if isinstance(col, str) else col
    slots = F.array(
        *[(md5_long(c, salt=f"cm{i}") % w).cast("int") for i in range(d)]
    )
    return (
        df.select(F.posexplode(slots).alias("row", "slot"))
        .groupBy("row", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch: percentiles in O(buckets) state
# ---------------------------------------------------------------------------


def histogram_sketch(df: DataFrame, col: str | Column, width: float) -> DataFrame:
    """Fixed-width histogram as a sketch: ``(bucket = floor(v / width),
    cnt)``. One map-side-combinable groupBy over O(range/width) uniform
    keys — state is independent of row count, and two sketches merge by
    summing counts (the per-day / per-partition rollup path). Width is a
    data-contract constant (like HLL's ``b``), not tuned per batch, so
    sketches from different batches always align."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        df.select(F.floor(c / F.lit(width)).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    sketch: DataFrame, width: float, qs: Sequence[float] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Percentile estimates from a histogram sketch: for each q, the
    upper edge of the first bucket whose cumulative count reaches
    ``ceil(q·n)`` — error ≤ ``width`` by construction (asserted vs exact
    percentile_disc in tests). Runs over ≤ |buckets| rows: a window
    cumsum + one tiny aggregate. All comparisons are integer, so the
    DuckDB oracle replays bit-for-bit; only the final edge→value
    multiply touches floats (identical operands both sides)."""
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bucket", "cnt", F.sum("cnt").over(w).alias("cum"), F.sum("cnt").over(
            Window.partitionBy()
        ).alias("n"),
    )
    out = None
    for q in qs:
        rank = F.ceil(F.lit(q) * F.col("n")).cast("long")
        hit = (
            cum.filter(F.col("cum") >= rank)
            .groupBy()
            .agg(
                F.lit(q).alias("q"),
                ((F.min("bucket") + 1) * F.lit(width)).alias("est"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str | Column,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-frequency estimate for each key: min over the d counters it
    hashes to. The sketch is tiny (≤ d·w rows) and broadcasts; the
    classic guarantee holds: est ≥ true count, est ≤ true + εN w.h.p.
    Output: every ``keys`` column + ``est``."""
    from pyspark.sql.functions import broadcast

    c = F.col(col) if isinstance(col, str) else col
    slots = F.array(
        *[(md5_long(c, salt=f"cm{i}") % w).cast("int") for i in range(d)]
    )
    probed = keys.select("*", F.posexplode(slots).alias("row", "slot"))
    return (
        probed.join(broadcast(sketch), ["row", "slot"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Heavy hitters: sample → sketch-probe → exact verify
# ---------------------------------------------------------------------------


def heavy_hitters(
    df: DataFrame,
    col: str | Column,
    row_key: str | Column,
    threshold: int,
    d: int = 4,
    w: int = 1024,
    sample_fraction: float = 0.25,
    salt: str = "hh",
) -> DataFrame:
    """Keys with frequency ≥ ``threshold``, without a full-key groupBy.

    The 100 TB shape: (1) one pass builds the O(d·w) Count-Min sketch;
    (2) candidates come from a deterministic hash *row* sample — a key
    with freq ≥ T survives with P ≥ 1-(1-p)^T (≈ 1-2e-9 at p=0.25,
    T=70), and the long tail (the expensive part of a full distinct) is
    mostly skipped; (3) the CM probe discards sampled tail keys (one-
    sided error: no true heavy key is lost here); (4) only the few
    survivors are exactly counted via a broadcast semi-join + groupBy
    over the filtered rows. Every stage is deterministic (salted md5,
    no RNG), so the DuckDB oracle replays the identical pipeline.

    Output: (``col``, cnt) with exact counts ≥ threshold."""
    from pyspark.sql.functions import broadcast

    from .sampling import hash_sample

    c = F.col(col) if isinstance(col, str) else col
    name = col if isinstance(col, str) else "key"
    sketch = cm_sketch(df, c, d=d, w=w)
    cand_keys = (
        hash_sample(df, row_key, sample_fraction, salt=salt)
        .select(c.alias(name))
        .distinct()
    )
    est = cm_estimate(sketch, cand_keys, name, d=d, w=w)
    survivors = est.filter(F.col("est") >= threshold).select(name)
    return (
        df.select(c.alias(name))
        .join(broadcast(survivors), name, "left_semi")
        .groupBy(name)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )


# ---------------------------------------------------------------------------
# Grouped sketch variants: one sketch per key, same algebra
# ---------------------------------------------------------------------------


def hll_rows(
    df: DataFrame, keys: Sequence[str], col: str | Column, b: int = 12
) -> DataFrame:
    """Ungrouped per-row HLL observations (keys..., bucket, rho) — the
    narrow select `hll_registers_by` aggregates, exposed separately so
    the streaming twin can feed the same rows into its MAX-merge state."""
    m = 1 << b
    rest_bits = _HASH_BITS - b
    h = md5_long(col)
    rest = F.shiftright(h, b)
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits + 1) - F.length(F.bin(rest))
    )
    return df.select(
        *keys,
        h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
        rho.cast("int").alias("rho"),
    )


def hll_registers_by(
    df: DataFrame, keys: Sequence[str], col: str | Column, b: int = 12
) -> DataFrame:
    """Per-key HLL register tables: (keys..., bucket, m_j). State is
    O(|keys| · m) — the grouped distinct-count shape (distinct users per
    day/type) without O(|keys| · distinct) exact state."""
    return (
        hll_rows(df, keys, col, b)
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate_by(
    registers: DataFrame, keys: Sequence[str], b: int = 12
) -> DataFrame:
    """Per-key cardinality estimates from per-key register tables —
    identical integer harmonic sum as :func:`hll_estimate`, one row per
    key."""
    m = 1 << b
    rest_bits = _HASH_BITS - b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.lit(rest_bits + 1) - F.col("m_j")).cast("int"),
            )
        ).alias("s_present"),
    )
    v = F.lit(m) - F.col("n_present")
    s = F.col("s_present") + v * F.shiftleft(F.lit(1).cast("long"), rest_bits + 1)
    est_raw = F.lit(alpha * m * m * float(1 << (rest_bits + 1))) / s.cast("double")
    est = F.when(
        (est_raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(est_raw)
    return agg.select(
        *keys,
        v.cast("long").alias("v_zero_buckets"),
        s.cast("long").alias("s_harmonic"),
        F.round(est, 4).alias("est"),
    )


def histogram_quantiles_by(
    sketch: DataFrame,
    keys: Sequence[str],
    width: float,
    qs: Sequence[float] = (0.5, 0.95),
) -> DataFrame:
    """Per-key percentile estimates from per-key histogram sketches
    (``sketch``: keys..., bucket, cnt). Window cumsum partitioned by
    key over O(buckets) rows per key; same ≤ width error contract as
    :func:`histogram_quantiles`."""
    from pyspark.sql import Window

    keys = list(keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*keys)
    cum = sketch.select(
        *keys,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    out = None
    for q in qs:
        rank = F.ceil(F.lit(q) * F.col("n")).cast("long")
        hit = (
            cum.filter(F.col("cum") >= rank)
            .groupBy(*keys)
            .agg(
                F.lit(q).alias("q"),
                ((F.min("bucket") + 1) * F.lit(width)).alias("est"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch: set-operation cardinality estimates
# ---------------------------------------------------------------------------


def kmv_sketch(df: DataFrame, col: str | Column, k: int = 256) -> DataFrame:
    """K-minimum-values sketch: the ``k`` smallest distinct 60-bit
    hashes of the key — O(k) state, built with one distinct + a global
    ordered limit (TakeOrdered: per-partition top-k then a tiny merge,
    no full sort materialization). Unlike HLL, two KMV sketches support
    INTERSECTION estimates, not just union — the audience-overlap
    question (users in A ∩ B) at 100 TB without exact distinct state.

    Output: (h) — the k smallest hash values."""
    return (
        df.select(md5_long(col).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: with the k-th smallest
    of n uniform hashes at fraction kth/2^60 of the space,
    E[distinct] = (k-1) / (kth / 2^60). Exact-integer inputs, one double
    division. Returns (n_hashes, kth_min, est); sketches smaller than k
    (set smaller than k) report their exact size."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("h").alias("kth_min")
    )
    space = float(1 << 60)
    return agg.select(
        "n_hashes",
        "kth_min",
        F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
        .otherwise(
            (F.col("n_hashes") - 1).cast("double")
            / (F.col("kth_min").cast("double") / F.lit(space))
        )
        .alias("est"),
    )


def kmv_intersection_estimate(
    a: DataFrame, b: DataFrame, k: int = 256
) -> DataFrame:
    """|A ∩ B| estimate from two KMV sketches: take the k smallest of
    the union of both sketches, measure the fraction also present in
    BOTH (the KMV Jaccard estimator), and scale by the union estimate.
    All set algebra runs over ≤ 2k rows. Returns one row:
    (jaccard, union_est, intersection_est)."""
    u = a.unionByName(b).distinct().orderBy("h").limit(k)
    in_both = u.join(a, "h", "left_semi").join(b, "h", "left_semi")
    ucount = u.agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("h").alias("kth_min")
    )
    space = float(1 << 60)
    union_est = (
        F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
        .otherwise(
            (F.col("n_hashes") - 1).cast("double")
            / (F.col("kth_min").cast("double") / F.lit(space))
        )
    )
    n_both = in_both.count()
    n_union_sketch = u.count()
    jacc = n_both / n_union_sketch if n_union_sketch else 0.0
    return ucount.select(
        F.lit(jacc).alias("jaccard"),
        union_est.alias("union_est"),
        (F.lit(jacc) * union_est).alias("intersection_est"),
    )


def robust_outlier_counts(
    df: DataFrame,
    col: str | Column,
    group_col: str,
    width: float,
    k: int = 3,
) -> DataFrame:
    """Median/MAD outlier screen — the heavy-tail-safe companion to the
    z-score gate (a single 1 GB document drags a mean+stddev screen; the
    median and the median-absolute-deviation don't move): flag rows with
    ``|v - med| > k · MAD`` and report per-group totals.

    Both statistics come from the fixed-width histogram sketch, not a
    global sort: pass 1 sketches ``v`` and reads the 0.5 quantile edge
    (error ≤ width, the documented sketch contract); pass 2 sketches
    ``|v - med|`` for the MAD the same way. Each pass is one
    map-side-combinable groupBy over O(range/width) bucket keys plus a
    bucket-bounded cumsum; the two scalar cutoffs broadcast; the flag
    filter is narrow. All rank comparisons are integer; the only float
    ops (edge·width, the k·MAD compare) have identical operands on both
    engines, so the oracle replays exactly.

    Output: (group_col, n_rows, n_outliers) — one row per group.
    """
    c = F.col(col) if isinstance(col, str) else col
    v = df.select(F.col(group_col), c.cast("double").alias("__x"))

    med = histogram_quantiles(histogram_sketch(v, "__x", width), width, qs=(0.5,)).select(
        F.col("est").alias("__med")
    )
    dev = v.join(F.broadcast(med)).select(
        group_col, F.abs(F.col("__x") - F.col("__med")).alias("__dev")
    )
    mad = histogram_quantiles(histogram_sketch(dev, "__dev", width), width, qs=(0.5,)).select(
        F.col("est").alias("__mad")
    )
    return (
        dev.join(F.broadcast(mad))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("__dev") > F.lit(float(k)) * F.col("__mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )
