"""Regression tests for the plan-audit single-partition-window detector
(VERDICT r09 item 2): the pre-fix ``build_vocab`` shape — row_number
over the FULL distinct-word table, size filter applied after — shipped
under a gate for five "plan audit clean" rounds because the audit only
knew broadcast-over-aggregate. The detector must flag that shape and
pass the fixed top-k-then-rank one."""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_audit import single_partition_window_suspect  # noqa: E402


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _counts(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma word%d tok%d" % (i % 7, i % 13)) for i in range(60)],
        "doc_id long, text string",
    )
    return (
        docs.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def test_detector_flags_prefix_build_vocab_shape(spark):
    """The exact pre-fix shape: global row_number window over the full
    count table, THEN the size filter (on rank arithmetic, so Catalyst's
    rescue rules cannot fire)."""
    counts = _counts(spark)
    w = Window.orderBy(F.desc("cnt"), F.col("word"))
    old_shape = (
        counts.withColumn("token_id", F.row_number().over(w) - 1)
        .filter(F.col("token_id") < 5)
        .select("word", "token_id")
    )
    assert single_partition_window_suspect(_plan(old_shape))


def test_detector_passes_fixed_build_vocab(spark):
    from ubdc_airbnb_spark.operators.tfidf import build_vocab

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma word%d" % (i % 7)) for i in range(60)],
        "doc_id long, text string",
    )
    assert not single_partition_window_suspect(_plan(build_vocab(docs, size=5)))


def test_detector_passes_topk_then_rank(spark):
    """The repo's canonical rescue shape: orderBy+limit (TakeOrdered)
    bounds the window input, so the single partition holds <=k rows."""
    counts = _counts(spark)
    w = Window.orderBy(F.desc("cnt"), F.col("word"))
    fixed = (
        counts.orderBy(F.desc("cnt"), "word")
        .limit(5)
        .withColumn("token_id", F.row_number().over(w) - 1)
    )
    assert not single_partition_window_suspect(_plan(fixed))


def test_detector_passes_rescued_raw_rank_filter(spark):
    """`rn <= k` on the raw rank gets LimitPushDownThroughWindow's
    TakeOrderedAndProject — bounded, must not flag."""
    counts = _counts(spark)
    w = Window.orderBy(F.desc("cnt"), F.col("word"))
    rescued = counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    assert not single_partition_window_suspect(_plan(rescued))


def test_detector_passes_scalar_aggregate(spark):
    """A keyless aggregate's SinglePartition feed is a one-row scalar
    reduce (partials combined map-side) — not a window trap."""
    counts = _counts(spark)
    scalar = counts.agg(F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n"))
    assert not single_partition_window_suspect(_plan(scalar))


def test_detector_passes_window_over_scalar_aggregate(spark):
    """A global window whose input is a keyless (one-row) aggregate is
    bounded by construction."""
    counts = _counts(spark)
    one = counts.agg(F.sum("cnt").alias("total"))
    w = Window.orderBy("total")
    assert not single_partition_window_suspect(
        _plan(one.withColumn("rn", F.row_number().over(w)))
    )


def test_detector_flags_unbounded_global_sort_window(spark):
    """A global dense_rank over an ungated fact table — the general
    class, not just the vocab instance."""
    df = spark.range(1000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    w = Window.orderBy(F.desc("v"))
    assert single_partition_window_suspect(
        _plan(df.withColumn("r", F.dense_rank().over(w)))
    )
