"""Table profiling (north-star data-quality): one long-format stats row
per column — row/null counts, distinct-cardinality estimate via the
portable HLL sketch, min/max.

This is the "what is in this 100 TB table" primitive a pipeline runs
before training: every per-column statistic is a map-side-combinable
aggregate, and the distinct count is the O(4096)-state sketch from
``operators/sketches.py``, not an exact ``COUNT(DISTINCT)`` shuffle of
the whole column. The per-column loop is a driver loop over the
(schema-sized) column list; each iteration is set-based.

min/max are emitted as strings so one long-format schema fits every
column type; gate queries stick to string/integer columns where the
cast rendering is engine-stable (float/timestamp rendering differs
between engines — compare those numerically instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import hll_distinct_count


def profile_table(df: DataFrame, cols: list[str] | None = None, b: int = 12) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct_est, min_value, max_value)
    — one row per profiled column."""
    cols = cols or df.columns
    spark = df.sparkSession
    out = None
    for c in cols:
        base = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        )
        est = hll_distinct_count(
            df.filter(F.col(c).isNotNull()), F.col(c).cast("string"), b=b
        ).select(F.col("est").alias("n_distinct_est"))
        row = base.join(est).select(
            F.lit(c).alias("column"),
            "n_rows",
            "n_nulls",
            "n_distinct_est",
            "min_value",
            "max_value",
        )
        out = row if out is None else out.unionByName(row)
    return out


def embedding_health(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension embedding health report — the pre-ANN sanity gate:
    a collapsed dimension (variance ≈ 0), a dead dimension (mean and
    variance 0) or a runaway one (variance orders above its peers) all
    break IVF/LSH bucket balance long before they break recall metrics,
    and are invisible in any per-vector view.

    One posexplode (narrow) + one groupBy on the dimension index —
    ``dim``-way keys, fully map-side combined; the report is dim-sized.

    Determinism: each component quantizes to integer ppm
    (``floor(x·1e6)`` of the float→double-exact value), so Σx and Σx²
    are exact integer sums (Σx² through DECIMAL(38) — it exceeds int64
    at corpus scale); mean and variance are IEEE-exact ops of those
    integers. The 1e-6 quantization is far below any health threshold.

    Output: (pos, n, mean, var) per dimension."""
    ppm = F.floor(F.col("x").cast("double") * F.lit(1e6)).cast("long")
    exploded = vectors.select(F.posexplode(vec_col).alias("pos", "x")).select(
        "pos", ppm.alias("xq")
    )
    g = exploded.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum((F.col("xq") * F.col("xq")).cast("decimal(38,0)")).cast("double").alias("sxx"),
    )
    mean = (F.col("sx").cast("double") / F.lit(1e6)) / F.col("n").cast("double")
    # var = E[x²] − E[x]²  over the ppm-quantized values
    ex2 = (F.col("sxx") / F.lit(1e12)) / F.col("n").cast("double")
    return g.select(
        "pos",
        "n",
        mean.alias("mean"),
        (ex2 - mean * mean).alias("var"),
    )


def norm2_ppm(vec_col: str) -> F.Column:
    """Per-vector squared norm as an exact ppm long: sequential zip-fold
    dot product (engine-identical evaluation order) floored at 1e6 —
    the quantize-before-sum device shared by the batch health report
    and its streaming twin."""
    n2 = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.floor(n2 * F.lit(1e6)).cast("long")


def embedding_norm_health(
    df: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Per-group embedding NORM health — the vector-granularity
    companion to ``embedding_health`` (which profiles dimensions):
    zero/dead vectors break cosine math (0/0) and collapse ANN buckets,
    and a shifted norm distribution between groups or corpus versions
    is the cheapest embedding-drift tripwire.

    Per vector the squared norm is the sequential zip-fold dot product
    (engine-identical evaluation order), quantized to ppm BEFORE the
    group sum so every aggregate is exact int64. One narrow pass + one
    map-side-combinable groupBy over the group keys; no shuffle of the
    vectors themselves.

    Output: (group_col, n_vecs, n_zero, min_norm2_ppm, max_norm2_ppm,
    sum_norm2_ppm).
    """
    q = df.select(F.col(group_col), norm2_ppm(vec_col).alias("__n2"))
    return q.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(F.when(F.col("__n2") == 0, 1).otherwise(0)).cast("long").alias("n_zero"),
        F.min("__n2").alias("min_norm2_ppm"),
        F.max("__n2").alias("max_norm2_ppm"),
        F.sum("__n2").alias("sum_norm2_ppm"),
    )
