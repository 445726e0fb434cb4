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

from conftest import SF_DIR  # noqa: E402
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


# ---------------------------------------------------------------------------
# third detector (r10): unbounded nested-loop joins


def test_nlj_detector_flags_corpus_cross_corpus(spark):
    """crossJoin of two ungated fact tables — |L| x |R| output, the
    quadratic scale-killer the banded/bucketed operators exist to
    avoid. Must flag."""
    from plan_audit import nested_loop_join_suspect

    a = spark.range(500).select(F.col("id").alias("a"))
    b = spark.range(500).select(F.col("id").alias("b"))
    assert nested_loop_join_suspect(_plan(a.crossJoin(b)))


def test_nlj_detector_passes_scalar_cross_corpus(spark):
    """crossJoin against a keyless (one-row) aggregate — the sidecar
    stats-broadcast pattern (totals, norms, thresholds). Linear pass,
    must not flag."""
    from plan_audit import nested_loop_join_suspect

    corpus = spark.range(500).select(F.col("id").alias("a"))
    stats = corpus.agg(F.sum("a").alias("total"))
    assert not nested_loop_join_suspect(_plan(corpus.crossJoin(stats)))


def test_nlj_detector_passes_limit_cross_corpus(spark):
    """crossJoin against an explicit top-k side (limit bounds it) —
    k x N output is a linear pass. Must not flag."""
    from plan_audit import nested_loop_join_suspect

    corpus = spark.range(500).select(F.col("id").alias("a"))
    topk = (
        spark.range(500)
        .select(F.col("id").alias("b"))
        .orderBy(F.desc("b"))
        .limit(3)
    )
    assert not nested_loop_join_suspect(_plan(corpus.crossJoin(topk)))


def test_nlj_detector_flags_inequality_bnlj_corpus_sides(spark):
    """A non-equi theta join Catalyst can only plan as
    BroadcastNestedLoopJoin, with both sides corpus-sized. Must flag —
    this is the shape interval_join's banding exists to avoid."""
    from plan_audit import nested_loop_join_suspect

    a = spark.range(300).select(F.col("id").alias("a"))
    b = spark.range(300).select(F.col("id").alias("b"))
    theta = a.join(b, F.col("a") < F.col("b"))
    assert nested_loop_join_suspect(_plan(theta))


def test_nlj_detector_ignores_hash_joins(spark):
    """Plain equi-joins (broadcast hash / SMJ / shuffled hash) are not
    nested loops — never flagged by this detector."""
    from plan_audit import nested_loop_join_suspect

    a = spark.range(500).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    b = spark.range(500).select(F.col("id").alias("k"), F.lit(2).alias("y"))
    assert not nested_loop_join_suspect(_plan(a.join(b, "k")))


# ---------------------------------------------------------------------------
# fourth detector (r10): row-at-a-time Python UDFs


def test_rowudf_detector_flags_plain_python_udf(spark):
    """A plain @udf pickles row-at-a-time (BatchEvalPython) — the
    10-100x slow path no gate may use."""
    from pyspark.sql.functions import udf
    from pyspark.sql.types import IntegerType

    from plan_audit import row_udf_suspect

    slow = udf(lambda x: x + 1, IntegerType())
    df = spark.range(100).select(slow(F.col("id").cast("int")).alias("v"))
    assert row_udf_suspect(_plan(df))


def test_rowudf_detector_passes_pandas_udf(spark):
    """Arrow-batched pandas_udf plans as ArrowEvalPython — sanctioned,
    must not flag."""
    from pyspark.sql.functions import pandas_udf

    from plan_audit import row_udf_suspect

    # lambda (no type hints): `from __future__ import annotations`
    # stringifies hints in this module, which pandas_udf's inference
    # rejects — the hint-free form defaults to SCALAR
    fast = pandas_udf(lambda s: s + 1, "long")

    df = spark.range(100).select(fast("id").alias("v"))
    assert not row_udf_suspect(_plan(df))


def test_rowudf_detector_passes_map_in_pandas(spark):
    """mapInPandas plans as MapInPandas (Arrow-batched) — sanctioned."""
    from plan_audit import row_udf_suspect

    def gen(it):
        for pdf in it:
            yield pdf

    df = spark.range(100).mapInPandas(gen, "id long")
    assert not row_udf_suspect(_plan(df))


def test_nlj_detector_passes_driver_local_side(spark):
    """A nested loop whose build side reads only driver-local leaves
    (createDataFrame -> LocalTableScan / ExistingRDD) is bounded by
    construction — the data already fit on the driver. The AOI
    cover-union anti-join is this shape."""
    from plan_audit import nested_loop_join_suspect

    corpus = spark.range(500).select(F.col("id").alias("a"))
    aoi = spark.createDataFrame([(1, "0313"), (2, "0312")], "aoi_id int, qk string")
    theta = corpus.join(aoi, F.col("a") > F.col("aoi_id"))
    assert not nested_loop_join_suspect(_plan(theta))


def test_nlj_detector_flags_limit_below_join_inside_child(spark):
    """r11 (ADVICE r10): a limit sitting BELOW a row-expanding join
    inside one child bounds only that join input — the child's output
    is corpus x k, and joining it against the other corpus side is
    still quadratic-class. The old anywhere-in-subtree scan cleared
    this shape; the root-spine scan must flag it."""
    from plan_audit import nested_loop_join_suspect

    corpus = spark.range(500).select(F.col("id").alias("a"))
    other = spark.range(500).select(F.col("id").alias("b"))
    topk = spark.range(500).select(F.col("id").alias("c")).orderBy(F.desc("c")).limit(3)
    # child = other x topk (bounded below a join, output is 500 x 3)
    child = other.crossJoin(topk)
    theta = corpus.join(child, F.col("a") < F.col("b"))
    assert nested_loop_join_suspect(_plan(theta))


def test_nlj_detector_still_passes_spine_limit_after_fix(spark):
    """Sanity: the root-spine restriction must not regress the plain
    limit-on-the-spine clearance (limit ABOVE everything in the
    child)."""
    from plan_audit import nested_loop_join_suspect

    corpus = spark.range(500).select(F.col("id").alias("a"))
    other = spark.range(500).select(F.col("id").alias("b"))
    joined_then_limited = (
        other.join(spark.range(500).select(F.col("id").alias("c")), F.col("b") == F.col("c"))
        .orderBy(F.desc("b"))
        .limit(3)
    )
    theta = corpus.join(joined_then_limited, F.col("a") < F.col("b"))
    assert not nested_loop_join_suspect(_plan(theta))


# ---------------------------------------------------------------------------
# fifth detector (r11): partition-prune verification for index probes


def test_prune_detector_passes_pruned_probe(spark, tmp_path):
    """A literal key filter on the partition column reaches the scan as
    a non-empty PartitionFilters — the healthy index-probe shape."""
    from plan_audit import index_prune_suspect

    path = str(tmp_path / "idx")
    spark.range(200).select(
        (F.col("id") % 8).alias("bucket"), F.col("id").alias("v")
    ).write.partitionBy("bucket").parquet(path)
    probe = spark.read.parquet(path).filter(F.col("bucket") == 3)
    assert not index_prune_suspect(_plan(probe))


def test_prune_detector_flags_stripped_probe(spark, tmp_path):
    """A probe whose predicate mixes the partition column with a DATA
    column (the bucket recomputed from the payload instead of taken as
    a literal) cannot be evaluated from partition values alone —
    partition pruning is defeated and the probe silently full-scans
    the index. Must flag. (A pure partition-column expression, even a
    hash, still prunes: Spark evaluates any deterministic
    partition-only predicate against the partition listing.)"""
    from plan_audit import index_prune_suspect

    path = str(tmp_path / "idx2")
    spark.range(200).select(
        (F.col("id") % 8).alias("bucket"), F.col("id").alias("v")
    ).write.partitionBy("bucket").parquet(path)
    stripped = spark.read.parquet(path).filter(
        F.col("bucket") == F.pmod(F.col("v"), F.lit(8))
    )
    assert index_prune_suspect(_plan(stripped))


def test_prune_detector_on_real_index_probe_gates(spark):
    """The three persisted-index probe gates must plan a pruned index
    scan at gate scale — the exact check the audit now enforces."""
    from plan_audit import INDEX_PROBE_GATES, index_prune_suspect

    from ubdc_airbnb_spark import queries as q_mod

    specs = {s.name: s for s in q_mod.registry()}
    assert INDEX_PROBE_GATES <= set(specs)
    for name in sorted(INDEX_PROBE_GATES):
        df = specs[name].spark(spark, SF_DIR)
        assert not index_prune_suspect(_plan(df)), name
