"""Bound re-verification for the plan-audit benign-ratchet classes
(r11, VERDICT r10 item 4).

The four benign lists in ``tools/plan_audit.py`` encode ~60 human
adjudications as prose — "this window/broadcast/NLJ feed is bounded by
construction". Nothing re-checked those bounds after later edits: a
listed gate whose feed silently became corpus-sized would sail through
the audit behind its benign entry. This file computes the ACTUAL row
count feeding the flagged node for one named representative of each
adjudication class at test scale (sf0.001 via conftest.SF_DIR; the
bounds are scale-INDEPENDENT, which is the whole point) and asserts it
is within the class bound — so unbounding a listed gate fails CI.

Classes and representatives (mirroring the list comments):
- day-grain window           -> w8_moving_avg
- fixed-width histogram      -> ns_quantile_sketch
- prefix-sum bucket offsets  -> ns_sequence_pack / w6_batch_assign
- literal-bounded probe side -> ns_embed_topk (NLJ_BENIGN)
- k-centroid feed            -> ns_embed_kmeans
"""

from __future__ import annotations

from conftest import SF_DIR

from pyspark.sql import functions as F

from ubdc_airbnb_spark.sources.tables import load_table


def test_day_grain_window_feed_bounded(spark):
    """w8_moving_avg's global window runs over the per-day aggregate of
    orders: its cardinality is the distinct-day count of the date
    domain (TPC-H spans ~7 years, <= 2,557 days at EVERY scale factor —
    rows per day grow, days do not)."""
    orders = load_table(spark, SF_DIR, "orders")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    n = daily.count()
    assert n == orders.select("o_orderdate").distinct().count()
    assert n <= 2557, f"per-day aggregate no longer day-bounded: {n} rows"


def test_histogram_sketch_feed_bounded(spark):
    """ns_quantile_sketch's cumsum window runs over the fixed-width
    histogram: <= (max-min)/width + 2 buckets by the sketch contract,
    independent of row count."""
    from ubdc_airbnb_spark.operators import sketches

    li = load_table(spark, SF_DIR, "lineitem")
    width = 100.0
    sk = sketches.histogram_sketch(li, "l_extendedprice", width=width)
    lo, hi = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice")
    ).collect()[0]
    bound = int((float(hi) - float(lo)) / width) + 2
    n = sk.count()
    assert n <= bound, f"sketch {n} buckets > contract bound {bound}"


def test_prefixsum_offsets_feed_bounded(spark):
    """ns_sequence_pack / w6_batch_assign broadcast the per-bucket
    offsets table of the two-pass prefix sum: <= num_buckets rows
    (DEFAULT_BUCKETS) by construction — the exact table the audit sees
    under both the BroadcastExchange and the offset window."""
    from ubdc_airbnb_spark.operators import prefixsum
    from ubdc_airbnb_spark.operators.prefixsum import (
        DEFAULT_BUCKETS,
        _with_buckets,
        release_pins,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    try:
        d = _with_buckets(docs, F.col("doc_id"), DEFAULT_BUCKETS)
        totals = d.groupBy("__rb").agg(F.sum("n").alias("__bt"))
        n = totals.count()
    finally:
        release_pins()
    assert n <= DEFAULT_BUCKETS, f"offsets table {n} rows > {DEFAULT_BUCKETS}"
    assert prefixsum.DEFAULT_BUCKETS <= 256  # the broadcast stays tiny


def test_literal_probe_side_bounded(spark):
    """ns_embed_topk's NLJ probe side is the literal-bounded query
    batch (vec_id < 10): <= 10 rows at any corpus size. The adjudicated
    class covers every NLJ_BENIGN member whose probe is a constant-
    range key filter."""
    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.filter(F.col("vec_id") < 10).count()
    assert n <= 10, f"probe side {n} rows — literal bound broken"


def test_kmeans_centroid_feed_bounded(spark):
    """ns_embed_kmeans broadcasts the centroid table: exactly <= k rows
    out of kmeans_centroids — the class-2 bounded-aggregate feed."""
    from ubdc_airbnb_spark.operators import similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = similarity.kmeans_centroids(emb, k=8, iters=1)
    n = cents.count()
    assert n <= 8, f"centroid table {n} rows > k=8"
