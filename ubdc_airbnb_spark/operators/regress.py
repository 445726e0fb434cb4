"""Per-group closed-form linear regression (OLS trend slopes) — the
feature-engineering workhorse for per-entity trend signals (is this
listing's price drifting up? is this source's quality decaying?) at
corpus scale: one grouped aggregate of exact moment sums, no iterative
solver, no per-group data movement beyond the single groupBy.

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = (Σy − slope·Σx) / n

Determinism: x is an exact integer regressor (e.g. day index); y is
cast to DECIMAL before any multiplication, so every moment sum (Σx,
Σy, Σxy, Σx²) is exact and associative — partition order cannot change
a bit. The final slope/intercept are IEEE divisions of identical exact
operands, so results are bit-identical across engines too (same
discipline as queries.py's DECIMAL rule). Groups with a degenerate
denominator (all x equal, or n = 1) return NULL slope/intercept rather
than an arbitrary value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_ols(
    df: DataFrame,
    keys: list[str],
    x: Column,
    y: Column,
    y_scale: int = 6,
) -> DataFrame:
    """Closed-form OLS of ``y`` on integer regressor ``x`` per group.

    Output: keys + (n, slope, intercept)."""
    xd = x.cast("long")
    yd = y.cast(f"decimal(18,{y_scale})")
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = F.when(den != 0, num / den)
    intercept = F.when(
        den != 0,
        (F.col("sy").cast("double") - (num / den) * F.col("sx").cast("double"))
        / F.col("n").cast("double"),
    )
    return g.select(*keys, "n", slope.alias("slope"), intercept.alias("intercept"))
