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


# ---------------------------------------------------------------------------
# contamination_spans
# ---------------------------------------------------------------------------


def test_contamination_spans_coordinates(spark):
    from ubdc_airbnb_spark.operators.curation import contamination_spans

    eval_df = spark.createDataFrame(
        [(100, "the secret eval answer is forty two")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains the eval 3-grams "secret eval answer"/"eval answer is"
            (1, "intro words the secret eval answer is here"),
            (2, "totally clean document with no overlap"),
        ],
        "doc_id long, text string",
    )
    spans = contamination_spans(train, eval_df, "doc_id", "text", k=3).collect()
    assert len(spans) == 1
    s = spans[0]
    # tokens 3..7 of doc 1: "secret eval answer is" plus the leading "the"
    assert s.doc_id == 1
    assert (s.span_start, s.span_end) == (2, 6)
    assert s.span_tokens == 5


def test_contamination_spans_broadcast_plan(spark):
    from ubdc_airbnb_spark.operators.curation import contamination_spans

    eval_df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    train = spark.createDataFrame([(1, "x a b c d e y")], "doc_id long, text string")
    plan = (
        contamination_spans(train, eval_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# hashed_tf_vectors
# ---------------------------------------------------------------------------


def test_hashing_tf_l2_normalized(spark):
    from ubdc_airbnb_spark.operators.tfidf import hashed_tf_vectors

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "cherry")], "doc_id long, text string"
    )
    rows = hashed_tf_vectors(docs, dim=64).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # per-doc squared weights sum to 1
    for doc_id, rs in by_doc.items():
        assert sum(r.weight**2 for r in rs) == pytest.approx(1.0)
    # doc 1: tf 2 (apple) and 1 (banana) unless they collide in 64 buckets
    tfs = sorted(r.tf for r in by_doc[1])
    assert tfs in ([1, 2], [3])
    assert [r.tf for r in by_doc[2]] == [1]


# ---------------------------------------------------------------------------
# mixture_rates
# ---------------------------------------------------------------------------


def test_mixture_rates_uniform_quota(spark):
    from ubdc_airbnb_spark.operators.sampling import mixture_rates

    rows = [(i, "en" if i < 80 else "de", "web") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    got = {r.lang: r for r in mixture_rates(df, ["lang", "source"], budget=50).collect()}
    # two cells -> quota 25 each
    assert got["en"].quota == 25 and got["de"].quota == 25
    assert got["en"].n_rows == 80 and got["de"].n_rows == 20
    assert got["en"].rate == pytest.approx(25 / 80)
    assert got["de"].rate == 1.0  # capped at 1
    assert got["en"].expected == 25 and got["de"].expected == 20


# ---------------------------------------------------------------------------
# char_entropy
# ---------------------------------------------------------------------------


def test_char_entropy_values(spark):
    import math

    from ubdc_airbnb_spark.functions.textstats import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    ce = char_entropy(F.col("text"))
    got = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            ce["n_chars"].alias("n_chars"),
            ce["n_distinct"].alias("n_distinct"),
            ce["entropy"].alias("entropy"),
        ).collect()
    }
    # single char -> zero entropy
    assert got[1].entropy == pytest.approx(0.0, abs=1e-5)
    assert (got[1].n_chars, got[1].n_distinct) == (4, 1)
    # two equiprobable chars -> ln 2
    assert got[2].entropy == pytest.approx(math.log(2), abs=1e-5)
    # four distinct chars -> ln 4
    assert got[3].entropy == pytest.approx(math.log(4), abs=1e-5)
    assert (got[3].n_chars, got[3].n_distinct) == (4, 4)
    # empty text -> zeros, no crash
    assert (got[4].n_chars, got[4].n_distinct, got[4].entropy) == (0, 0, 0.0)


def test_char_entropy_zero_shuffle(spark):
    from ubdc_airbnb_spark.functions.textstats import char_entropy

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    ce = char_entropy(F.col("text"))
    plan = (
        docs.select("doc_id", ce["entropy"].alias("e"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# ccnet_buckets
# ---------------------------------------------------------------------------


def test_ccnet_buckets_thirds_per_lang(spark):
    from ubdc_airbnb_spark.operators.lm import ccnet_buckets

    # 9 en docs: 3 fluent (repeated common phrase), 3 mixed, 3 gibberish
    fluent = "the cat sat on the mat and the cat sat again"
    mixed = "the cat zq1 on qx7 mat and bb3 cat sat again"
    gib = "zq%d qx%d bb%d kk%d vv%d ww%d mm%d nn%d pp%d rr%d"
    rows = (
        [(i, fluent, "en") for i in range(3)]
        + [(i + 3, mixed, "en") for i in range(3)]
        + [(i + 6, gib % tuple(range(i, i + 10)), "en") for i in range(3)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r.bucket for r in ccnet_buckets(docs).collect()}
    assert len(got) == 9
    # fluent docs rank head, gibberish tail
    assert all(got[i] == "head" for i in range(3))
    assert all(got[i + 6] == "tail" for i in range(3))


def test_ccnet_buckets_no_per_lang_total_sort(spark):
    from ubdc_airbnb_spark.operators.lm import ccnet_buckets

    docs = spark.createDataFrame(
        [(i, "w%d x y z" % i, "en") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    plan = ccnet_buckets(docs)._jdf.queryExecution().executedPlan().toString()
    # the only windows run over the bounded histogram (post-aggregate);
    # the doc-level path must join broadcast cutoffs, not sort per lang
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# power_iteration_top_pc
# ---------------------------------------------------------------------------


def test_top_pc_finds_dominant_axis(spark):
    import math

    from ubdc_airbnb_spark.operators.similarity import power_iteration_top_pc

    # variance concentrated on axis 1 (values +-10), noise on axis 0
    rows = [(i, [0.1 * (i % 3), 10.0 if i % 2 == 0 else -10.0, 0.0]) for i in range(40)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    comp = {r.d: r.v for r in power_iteration_top_pc(vecs, iters=3).collect()}
    # unit norm
    assert sum(x * x for x in comp.values()) == pytest.approx(1.0, abs=1e-6)
    # dominant axis carries nearly all the weight
    assert abs(comp[1]) > 0.99
    assert abs(comp[0]) < 0.1 and abs(comp[2]) < 0.1


def test_top_pc_deterministic(spark):
    from ubdc_airbnb_spark.operators.similarity import power_iteration_top_pc

    rows = [(i, [float(i % 5), float((i * 7) % 11), 1.0]) for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted((r.d, r.v) for r in power_iteration_top_pc(vecs, iters=2).collect())
    b = sorted((r.d, r.v) for r in power_iteration_top_pc(vecs, iters=2).collect())
    assert a == b


def test_remove_top_pc_kills_dominant_axis(spark):
    from ubdc_airbnb_spark.operators.similarity import (
        power_iteration_top_pc,
        remove_top_pc,
    )

    rows = [(i, [10.0 if i % 2 == 0 else -10.0, 0.5, 0.0]) for i in range(20)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    comp_rows = power_iteration_top_pc(vecs, iters=3).collect()
    comp = [0.0] * 3
    for r in comp_rows:
        comp[r["d"]] = r["v"]
    out = remove_top_pc(vecs, comp).collect()
    for r in out:
        # dominant axis removed: residual norm collapses to ~0.5
        assert r.norm_before == pytest.approx((10.0**2 + 0.25) ** 0.5, abs=1e-3)
        assert r.norm_after < 1.0
        assert abs(r.proj) > 9.0


# ---------------------------------------------------------------------------
# content_defined_chunks
# ---------------------------------------------------------------------------


def test_cdc_chunks_cover_text_exactly(spark):
    from ubdc_airbnb_spark.operators.chunking import content_defined_chunks

    text = "the quick brown fox jumps over the lazy dog " * 20
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        content_defined_chunks(docs).collect(), key=lambda r: r.chunk_idx
    )
    # chunks tile the document: contiguous, 1-based, full coverage
    assert rows[0].start == 1
    for a, b in zip(rows, rows[1:]):
        assert b.start == a.start + a.length
    assert rows[-1].start + rows[-1].length - 1 == len(text)


def test_cdc_chunks_insertion_locality(spark):
    from ubdc_airbnb_spark.operators.chunking import content_defined_chunks

    base = "the quick brown fox jumps over the lazy dog " * 30
    edited = "X " + base  # insertion at the very front
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    by_doc: dict[int, list] = {1: [], 2: []}
    for r in content_defined_chunks(docs).collect():
        by_doc[r.doc_id].append(r.chunk_fp)
    a, b = set(by_doc[1]), set(by_doc[2])
    # content-defined boundaries resynchronize: most chunk fingerprints
    # survive the front insertion (fixed-size blocks would share none)
    shared = len(a & b)
    assert shared >= max(1, len(a) - 2)


def test_normalize_text_rules(spark):
    from ubdc_airbnb_spark.functions.textstats import normalize_text

    docs = spark.createDataFrame(
        [(1, "  “Smart”  – quotes\tand\x07control\nchars ‘here’  ")],
        "doc_id long, text string",
    )
    got = docs.select(normalize_text("text").alias("t")).first().t
    assert got == '"Smart" - quotes andcontrol chars \'here\''


def test_negative_samples_deterministic_and_self_free(spark):
    from ubdc_airbnb_spark.operators.sampling import negative_samples

    df = spark.createDataFrame([(i,) for i in range(50)], "vec_id long")
    a = sorted(
        (r.anchor_id, r.k, r.neg_id)
        for r in negative_samples(df, "vec_id", m=3, buckets=8).collect()
    )
    b = sorted(
        (r.anchor_id, r.k, r.neg_id)
        for r in negative_samples(df, "vec_id", m=3, buckets=8).collect()
    )
    assert a == b
    assert all(anchor != neg for anchor, _k, neg in a)
    # every anchor draws its full m negatives (buckets all non-empty here)
    from collections import Counter

    per_anchor = Counter(anchor for anchor, _k, _n in a)
    assert all(v == 3 for v in per_anchor.values())


# ---------------------------------------------------------------------------
# randomized cross-checks vs pure-Python reference implementations
# ---------------------------------------------------------------------------


def _py_duplicate_spans(rows, k):
    from collections import Counter

    grams = Counter()
    toks = {}
    for doc_id, text in rows:
        ws = [w for w in text.lower().split() if w]
        toks[doc_id] = ws
        for i in range(len(ws) - k + 1):
            grams[" ".join(ws[i : i + k])] += 1
    out = {}
    for doc_id, ws in toks.items():
        hits = [
            i
            for i in range(len(ws) - k + 1)
            if grams[" ".join(ws[i : i + k])] >= 2
        ]
        spans = []
        for p in hits:
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + k - 1))
            else:
                spans.append((p, p + k - 1))
        dup = sum(e - s + 1 for s, e in spans)
        out[doc_id] = (len(ws), len(spans), dup)
    return out


def test_duplicate_spans_matches_python_reference(spark):
    import random

    rng = random.Random(42)
    vocab = ["w%d" % i for i in range(30)]
    shared = "alpha beta gamma delta epsilon"
    rows = []
    for i in range(40):
        words_ = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        if i % 3 == 0:
            pos = rng.randint(0, len(words_))
            words_ = words_[:pos] + shared.split() + words_[pos:]
        rows.append((i, " ".join(words_)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_spans, r.dup_tokens)
        for r in duplicate_spans(docs, k=3).collect()
    }
    assert got == _py_duplicate_spans(rows, 3)


def _py_cdc(text, window=8, mask=63, M=2_147_483_647, B=131):
    n = len(text)
    if n == 0:
        return []
    bnd = []
    if n >= window + 1:
        for p in range(window, n):  # 1-based end positions window..n-1
            h = 0
            for ch in text[p - window : p]:
                h = (h * B + ord(ch)) % M
            if h & mask == 0:
                bnd.append(p)
    ends = bnd + [n]
    chunks, prev = [], 0
    for i, e in enumerate(ends):
        fp = 0
        for ch in text[prev:e]:
            fp = (fp * B + ord(ch)) % M
        chunks.append((i, prev + 1, e - prev, fp))
        prev = e
    return chunks


def test_cdc_chunks_match_python_reference(spark):
    import random

    from ubdc_airbnb_spark.operators.chunking import content_defined_chunks

    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("abcdefgh ") for _ in range(rng.randint(0, 400))))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in content_defined_chunks(docs).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start, r.length, r.chunk_fp)
        )
    for doc_id, text in rows:
        expect = _py_cdc(text)
        assert sorted(got.get(doc_id, [])) == expect, doc_id


def test_vocab_coverage_counts(spark):
    from ubdc_airbnb_spark.operators.tfidf import build_vocab, vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a b zz"), (2, "a b"), (3, "qq rr")],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, "text", size=2)  # {a, b} by frequency
    got = {
        r.doc_id: (r.n_tokens, r.n_oov)
        for r in vocab_coverage(docs, vocab).collect()
    }
    assert got == {1: (4, 1), 2: (2, 0), 3: (2, 2)}


def test_interpolated_lm_backoff_helps_common_words(spark):
    from ubdc_airbnb_spark.operators.lm import (
        score_documents,
        score_documents_interpolated,
    )

    # doc 3 pairs COMMON words in an unseen order: pure-bigram scores it
    # like gibberish, interpolation ranks it above the true gibberish doc 4
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "mat the on sat cat the"),
        (4, "zz qq ww ee rr tt"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    interp = {r.doc_id: r.avg_interp_p for r in score_documents_interpolated(docs).collect()}
    assert interp[3] > interp[4]
    assert interp[1] > interp[3]


def test_rolling_active_users_window(spark):
    import datetime

    from ubdc_airbnb_spark.operators.funnel import rolling_active_users

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1 active days 0 and 5 (within one 7d window); user 2 only day 0
    rows.append((1, base, 1))
    rows.append((2, base + datetime.timedelta(days=5), 1))
    rows.append((3, base, 2))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {str(r.day): (r.dau, r.active_w) for r in rolling_active_users(ev).collect()}
    assert got["2024-01-01"] == (2, 2)
    # day 5: dau=1 (user1); trailing 7d still sees both users
    assert got["2024-01-06"] == (1, 2)


def test_last_touch_attribution(spark):
    import datetime

    from ubdc_airbnb_spark.operators.funnel import last_touch_attribution

    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)
    d = datetime.timedelta
    rows = [
        (1, t0 - d(days=2), 7, "click", 0.0, None),
        (2, t0 - d(days=1), 7, "click", 0.0, None),   # latest touch
        (3, t0, 7, "purchase", 9.99, None),            # attributed to #2
        (4, t0 - d(days=30), 8, "click", 0.0, None),   # outside window
        (5, t0, 8, "purchase", 5.00, None),            # unattributed
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.conversion_id: r for r in last_touch_attribution(ev).collect()}
    assert got[3].attributed and got[3].touch_ts == t0 - d(days=1)
    assert not got[5].attributed and got[5].touch_ts is None


def test_source_overlap_matrix(spark):
    from ubdc_airbnb_spark.operators.curation import source_overlap_matrix

    shared = "the quick brown fox jumps"
    rows = [
        (1, shared + " alpha", "A"),
        (2, shared + " beta", "B"),     # B shares 3 of its grams with A
        (3, "totally different text here now", "C"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r.source_a, r.source_b): r
        for r in source_overlap_matrix(docs, ngram=3).collect()
    }
    ab = got[("A", "B")]
    assert ab.n_common == 3  # the 3-grams fully inside `shared`
    assert ab.n_a == 4 and ab.n_b == 4
    assert ab.jaccard == 3 / 5
    assert ("A", "C") not in got and ("B", "C") not in got
