"""The scale-smoke native partition profile (r09, VERDICT item 2) must
agree with the RDD-boundary profile — the authoritative but
Python-shipping measure it replaces — across every plan shape the
smoke's skew detector has to classify correctly.

The hazard being guarded: ``spark_partition_id()`` naively projected
over a query lets ColumnPruning collapse unreferenced operators (a
global Window whose outputs are unused prunes to its child), so the pid
reports the SCAN's partitioning instead of the final stage's — exactly
the r02 defect class the smoke exists to catch. The native profile pins
every output column with ``max(col)`` aggregates that are collected
(never re-projected away); these tests prove the pinning works.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from scale_smoke import _profile_counts_native, partition_profile  # noqa: E402


def _rdd_counts(df):
    return sorted(
        c for c in df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect() if c
    )


def _shapes(spark):
    # the r02 defect class: a global window collapses to ONE partition
    yield "global_window", spark.range(0, 1000, 1, 8).withColumn(
        "rk", F.row_number().over(Window.orderBy("id"))
    )
    # narrow scan-following chain: keeps the scan's splits
    yield "narrow", spark.range(0, 1000, 1, 8).withColumn("x", F.col("id") * 2)
    # keyed aggregate: shuffle-partitioned output
    yield "aggregate", spark.range(0, 1000, 1, 8).withColumn(
        "k", (F.col("id") % 3).cast("int")
    ).groupBy("k").agg(F.count("*").alias("n"))
    # explicit repartition: plan ends at an Exchange
    yield "repartition", spark.range(0, 1000, 1, 8).repartition(5)
    # skewed partitioned window (the detector's positive case)
    yield "skewed_window", spark.range(0, 1000, 1, 8).withColumn(
        "g", F.when(F.col("id") < 700, 0).otherwise(F.col("id") % 5)
    ).withColumn("rk", F.row_number().over(Window.partitionBy("g").orderBy("id")))
    # non-orderable (map) + binary + array columns: the to_json pin path
    yield "map_binary", spark.range(0, 200, 1, 4).select(
        F.create_map(F.lit("a"), F.col("id")).alias("m"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("b"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("v"),
    )


def test_native_profile_matches_rdd_boundary(spark):
    for name, df in _shapes(spark):
        assert _profile_counts_native(df) == _rdd_counts(df), name


def test_native_profile_sees_single_partition_window(spark):
    """The whole point: the global-window defect must read parts == 1,
    not the scan's split count (what a pruned-away pid would report)."""
    df = spark.range(0, 5000, 1, 8).withColumn(
        "rk", F.row_number().over(Window.orderBy("id"))
    )
    prof = partition_profile(df)
    assert prof == {"parts": 1, "max": 5000, "median": 5000}


def test_empty_output_profile(spark):
    df = spark.range(10).filter("id < 0")
    assert partition_profile(df) == {"parts": 0, "max": 0, "median": 0}
