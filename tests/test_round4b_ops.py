"""Unit tests for the round-4 second-wave operators: duplicated-span
detection, int8 scalar quantization, and length-bucketed batching."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ubdc_airbnb_spark.operators.chunking import length_bucket_plan
from ubdc_airbnb_spark.operators.curation import duplicate_spans
from ubdc_airbnb_spark.operators.similarity import scalar_quantize_stats


# ---------------------------------------------------------------------------
# duplicate_spans
# ---------------------------------------------------------------------------


def _spans(spark, rows, k=3):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.n_tokens, r.n_spans, r.dup_tokens)
        for r in duplicate_spans(docs, "doc_id", "text", k=k).collect()
    }


def test_duplicate_spans_cross_doc(spark):
    # docs 1 and 2 share the exact phrase "the quick brown fox" (4 tokens,
    # two 3-gram hits at pos 0 and 1 that merge into one span of 4 tokens)
    got = _spans(
        spark,
        [
            (1, "the quick brown fox jumps high"),
            (2, "again the quick brown fox runs"),
            (3, "nothing here matches at all"),
        ],
        k=3,
    )
    assert got[1] == (6, 1, 4)
    assert got[2] == (6, 1, 4)  # span at pos 1..4
    assert got[3] == (5, 0, 0)


def test_duplicate_spans_within_doc_repeat(spark):
    # "a b c" repeats inside ONE document -> both occurrences flagged
    got = _spans(spark, [(1, "a b c x y z a b c")], k=3)
    n_tokens, n_spans, dup_tokens = got[1]
    assert n_tokens == 9
    assert n_spans == 2
    assert dup_tokens == 6


def test_duplicate_spans_merges_overlaps(spark):
    # shared run of 5 tokens -> three overlapping 3-gram hits, ONE span
    got = _spans(
        spark,
        [(1, "p q r s t tail1"), (2, "p q r s t tail2")],
        k=3,
    )
    assert got[1] == (6, 1, 5)
    assert got[2] == (6, 1, 5)


def test_duplicate_spans_zero_fill_and_short_docs(spark):
    got = _spans(spark, [(1, "solo"), (2, "just two")], k=3)
    assert got[1] == (1, 0, 0)
    assert got[2] == (2, 0, 0)


# ---------------------------------------------------------------------------
# scalar_quantize_stats
# ---------------------------------------------------------------------------


def test_scalar_quantize_error_bound(spark):
    # reconstruction error of min/max affine int8 must be <= scale/2 per dim
    vecs = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [1.0, 20.0]), (3, [0.5, 15.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in scalar_quantize_stats(vecs, levels=255).collect()}
    # dim0 range 1.0 -> scale 1/255; dim1 range 10 -> scale 10/255
    max_half_scale = (10.0 / 255.0) / 2.0
    for r in rows.values():
        assert r.max_err <= max_half_scale + 1e-12
        assert r.mse >= 0.0


def test_scalar_quantize_endpoints_exact(spark):
    # min and max of every dim reconstruct exactly (codes 0 and `levels`)
    vecs = spark.createDataFrame(
        [(1, [0.0, -3.0]), (2, [2.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    rows = scalar_quantize_stats(vecs, levels=255).collect()
    for r in rows:
        assert r.max_err == pytest.approx(0.0, abs=1e-12)


def test_scalar_quantize_constant_dim(spark):
    # degenerate dim (mx == mn) must not divide by zero
    vecs = spark.createDataFrame(
        [(1, [7.0, 1.0]), (2, [7.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    rows = scalar_quantize_stats(vecs, levels=255).collect()
    for r in rows:
        assert r.max_err < 1e-2


# ---------------------------------------------------------------------------
# length_bucket_plan
# ---------------------------------------------------------------------------


def test_length_buckets_partition_and_waste(spark):
    # 4 docs of lengths 1,2,3,4 into 2 buckets -> {1,2} and {3,4}
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d")],
        "doc_id long, text string",
    )
    got = {r.bucket: r for r in length_bucket_plan(docs, n_buckets=2).collect()}
    assert set(got) == {0, 1}
    assert (got[0].min_tokens, got[0].max_tokens, got[0].n_docs) == (1, 2, 2)
    assert (got[1].min_tokens, got[1].max_tokens, got[1].n_docs) == (3, 4, 2)
    # bucket 0: pad to 2 -> waste 1 of 4 slots
    assert got[0].pad_waste == 1
    assert got[0].pad_frac == pytest.approx(0.25)
    # bucketed total waste strictly below global pad-to-max waste
    global_waste = 4 * 4 - (1 + 2 + 3 + 4)
    assert got[0].pad_waste + got[1].pad_waste < global_waste


def test_length_buckets_ties_stay_together(spark):
    # all docs same length -> single bucket 0 regardless of n_buckets
    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(10)], "doc_id long, text string"
    )
    got = length_bucket_plan(docs, n_buckets=4).collect()
    assert len(got) == 1
    assert got[0].bucket == 0
    assert got[0].pad_waste == 0


def test_length_buckets_histogram_bounds_window(spark):
    # the global window must run over the HISTOGRAM aggregate, never the
    # raw doc rows: assert a HashAggregate sits below any SinglePartition
    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(50)], "doc_id long, text string"
    )
    plan = (
        length_bucket_plan(docs, n_buckets=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# line_quality_filter
# ---------------------------------------------------------------------------


def test_line_filter_rules(spark):
    from ubdc_airbnb_spark.operators.curation import line_quality_filter

    text = "\n".join(
        [
            "This line is a keeper.",          # kept
            "too short.",                       # < 3 words
            "No terminal punctuation here",     # no [.!?"]
            "Please accept our cookie policy.", # blacklist
            "Enable JavaScript to continue.",   # blacklist (case-insensitive)
            'He said "stop right there!"',      # ends in quote -> kept
        ]
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = line_quality_filter(docs, "doc_id", "text", min_words=3).collect()[0]
    assert r.n_lines == 6
    assert r.n_kept == 2
    assert r.clean_text.splitlines() == [
        "This line is a keeper.",
        'He said "stop right there!"',
    ]
    assert r.kept_frac == pytest.approx(2 / 6)


def test_line_filter_zero_shuffle_plan(spark):
    from ubdc_airbnb_spark.operators.curation import line_quality_filter

    docs = spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    plan = (
        line_quality_filter(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure narrow per-row op


# ---------------------------------------------------------------------------
# cap_per_group
# ---------------------------------------------------------------------------


def test_cap_per_group_keeps_first_n(spark):
    from ubdc_airbnb_spark.operators.sampling import cap_per_group

    rows = [(i, "s%d" % (i % 2), "t") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = cap_per_group(df, "source", "doc_id", 3)
    got = sorted((r.source, r.doc_id) for r in out.collect())
    # per source, the 3 smallest doc_ids survive
    assert got == [
        ("s0", 0), ("s0", 2), ("s0", 4),
        ("s1", 1), ("s1", 3), ("s1", 5),
    ]
    assert out.columns == df.columns


# ---------------------------------------------------------------------------
# unigram_kl
# ---------------------------------------------------------------------------


def test_unigram_kl_zero_for_identical_slices(spark):
    from ubdc_airbnb_spark.operators.curation import unigram_kl

    # both slices share the same unigram distribution -> KL ~ 0
    rows = [(i, "alpha beta gamma", i % 2 == 0) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, a boolean")
    r = unigram_kl(docs, F.col("a"), "text").collect()[0]
    assert abs(r.kl) < 1e-3
    assert r.n_tokens_a == 30 and r.n_tokens_b == 30


def test_unigram_kl_positive_for_disjoint_slices(spark):
    from ubdc_airbnb_spark.operators.curation import unigram_kl

    rows = [(i, "aaa bbb ccc" if i % 2 == 0 else "xxx yyy zzz", i % 2 == 0)
            for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, a boolean")
    # small bucket space so add-1 smoothing doesn't swamp the tiny corpus
    r = unigram_kl(docs, F.col("a"), "text", buckets=64).collect()[0]
    assert r.kl > 0.2
