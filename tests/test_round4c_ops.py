"""Unit tests for the round-4 third-wave operators: mixture-plan
execution, image perceptual dHash, split-leakage audit, LSH recall
self-evaluation, and median/MAD outlier screening."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubdc_airbnb_spark.multimodal.binary_ops import image_dhash, synthetic_png_media
from ubdc_airbnb_spark.operators.dedup import lsh_recall_eval
from ubdc_airbnb_spark.operators.sampling import apply_mixture, split_leakage_report
from ubdc_airbnb_spark.operators.sketches import robust_outlier_counts


# ---------------------------------------------------------------------------
# apply_mixture
# ---------------------------------------------------------------------------


def test_apply_mixture_respects_rates_and_is_deterministic(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out1 = apply_mixture(df, ["grp"], "doc_id", budget=40)
    out2 = apply_mixture(df, ["grp"], "doc_id", budget=40)
    kept1 = sorted(r.doc_id for r in out1.collect())
    kept2 = sorted(r.doc_id for r in out2.collect())
    assert kept1 == kept2  # same keys every run
    # two cells of 100 rows, budget 40 -> quota 20/cell, rate 0.2:
    # hash-uniform drift around 20 per cell, never above the cell size
    per = {r.grp: r.n for r in out1.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert set(per) <= {"a", "b"}
    assert all(0 < n < 100 for n in per.values())


def test_apply_mixture_rate_one_keeps_everything(spark):
    df = spark.createDataFrame([(i, "g") for i in range(10)], "doc_id long, grp string")
    out = apply_mixture(df, ["grp"], "doc_id", budget=1000)  # quota >> n -> rate 1.0
    assert out.count() == 10


# ---------------------------------------------------------------------------
# image_dhash
# ---------------------------------------------------------------------------


def test_image_dhash_equal_ids_mod_formula_collide(spark):
    # the PNG fixture is a pure formula of the id, and the formula's
    # geometry/channel/pixel cycle repeats with period lcm(9,7,3,256*...):
    # identical payload bytes MUST give identical hashes; distinct
    # geometries essentially never collide on all 64 bits
    ids = spark.createDataFrame([(1,), (2,), (3,), (1,)], "doc_id long")
    media = synthetic_png_media(ids)
    got = {(r.media_id, r.dhash_hi, r.dhash_lo) for r in image_dhash(media).collect()}
    by_id = {}
    for mid, hi, lo in got:
        by_id.setdefault(mid, set()).add((hi, lo))
    assert all(len(v) == 1 for v in by_id.values())  # deterministic per id
    assert by_id[1] != by_id[2]  # different images -> different hashes
    hi, lo = next(iter(by_id[1]))
    assert 0 <= hi < 2**32 and 0 <= lo < 2**32  # packed as 32-bit halves


def test_image_dhash_is_an_equi_join_dedup_key(spark):
    ids = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    hashes = image_dhash(synthetic_png_media(ids))
    groups = hashes.groupBy("dhash_hi", "dhash_lo").agg(F.count("*").alias("n"))
    # grouping by the hash partitions the corpus: group sizes sum to 30
    assert sum(r.n for r in groups.collect()) == 30


# ---------------------------------------------------------------------------
# split_leakage_report
# ---------------------------------------------------------------------------


def test_split_leakage_by_content_is_zero_and_by_doc_catches_dups(spark):
    # 40 copies of the same text under different ids: with a 50/50 split
    # the by-doc assignment splits the group with overwhelming probability
    rows = [(i, "identical duplicated text") for i in range(40)]
    rows += [(100 + i, f"unique text {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {
        r["mode"]: r
        for r in split_leakage_report(
            df, "doc_id", "text", weights=(("train", 0.5), ("test", 0.5))
        ).collect()
    }
    assert rep["by_content"]["leaked_groups"] == 0
    assert rep["by_content"]["docs_in_leaked"] == 0
    assert rep["by_doc"]["n_dup_groups"] == 1
    assert rep["by_doc"]["leaked_groups"] == 1  # 2^-39 chance of not leaking
    assert rep["by_doc"]["docs_in_leaked"] == 40
    assert rep["by_doc"]["n_groups"] == 11


# ---------------------------------------------------------------------------
# lsh_recall_eval
# ---------------------------------------------------------------------------


def test_lsh_recall_finds_exact_dups(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, text), (2, text)]  # identical docs: jaccard 1, LSH must hit
    rows += [(10 + i, f"totally different words number {i} here now") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    row = lsh_recall_eval(df, "doc_id", "text", threshold=0.3).collect()[0]
    assert row.n_truth >= 1
    assert row.n_hit >= 1  # identical signatures share every band
    assert row.n_cand >= row.n_hit


def test_lsh_recall_absolute_slice_bounded_and_nested(spark):
    """sample_rows caps the quadratic truth branch at an ABSOLUTE doc
    count regardless of corpus size, and a smaller target's slice is a
    strict subset of a larger one's (hash-threshold nesting)."""
    from ubdc_airbnb_spark.operators.sampling import _M, hash_bucket
    from pyspark.sql import functions as F

    rows = [(i, f"word{i} alpha beta gamma delta common tail {i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def slice_ids(target):
        thr = min(_M, (target * _M) // 200)
        return {
            r[0]
            for r in df.filter(
                hash_bucket(F.col("doc_id").cast("string"), "lshrecall") < thr
            ).select("doc_id").collect()
        }

    small, big = slice_ids(40), slice_ids(120)
    assert small <= big  # nesting: comparable metrics across corpus versions
    assert 10 <= len(small) <= 80  # ~target, hash-jittered but bounded
    # sample_rows >= corpus keeps everything (threshold clamps to _M)
    row = lsh_recall_eval(
        df, "doc_id", "text", threshold=0.3, sample_rows=10_000
    ).collect()[0]
    full = lsh_recall_eval(df, "doc_id", "text", threshold=0.3).collect()[0]
    assert (row.n_truth, row.n_cand, row.n_hit) == (
        full.n_truth, full.n_cand, full.n_hit,
    )


# ---------------------------------------------------------------------------
# robust_outlier_counts
# ---------------------------------------------------------------------------


def test_robust_outliers_flags_extremes_not_bulk(spark):
    rows = [(i, "s", 100 + (i % 5)) for i in range(50)]  # tight bulk near 100
    rows += [(900, "s", 10_000)]  # one extreme
    df = spark.createDataFrame(rows, "doc_id long, source string, len long")
    got = robust_outlier_counts(df, "len", "source", width=8.0, k=3).collect()
    assert len(got) == 1
    assert got[0].n_rows == 51
    assert got[0].n_outliers == 1


# ---------------------------------------------------------------------------
# audio_fingerprint
# ---------------------------------------------------------------------------


def test_audio_fingerprint_deterministic_and_discriminative(spark):
    from ubdc_airbnb_spark.multimodal.binary_ops import (
        audio_fingerprint,
        synthetic_wav_media,
    )

    ids = spark.createDataFrame([(1,), (2,), (1,)], "doc_id long")
    got = audio_fingerprint(synthetic_wav_media(ids), frame=8).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.media_id, set()).add((r.n_frames, r.fingerprint))
    assert all(len(v) == 1 for v in by_id.values())  # same clip -> same fp
    assert all(r.n_frames >= 3 for r in got)  # fixtures have >= 20 samples
    assert all(r.fingerprint >= 0 for r in got)


# ---------------------------------------------------------------------------
# group_centroid_similarity
# ---------------------------------------------------------------------------


def test_group_centroid_similarity_identical_groups_cos_one(spark):
    from ubdc_airbnb_spark.operators.similarity import group_centroid_similarity

    rows = [
        (1, "a", [1.0, 0.0]), (2, "a", [1.0, 0.5]),
        (3, "b", [1.0, 0.0]), (4, "b", [1.0, 0.5]),  # same centroid as a
        (5, "c", [0.0, 1.0]), (6, "c", [0.0, 2.0]),  # orthogonal-ish
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    got = {
        (r.label_a, r.label_b): r.cos
        for r in group_centroid_similarity(df, "label").collect()
    }
    assert got[("a", "b")] == 1.0  # identical centroids
    assert got[("a", "c")] < 0.5  # near-orthogonal centroids
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}


# ---------------------------------------------------------------------------
# zipf_slope
# ---------------------------------------------------------------------------


def test_zipf_slope_near_minus_one_for_zipfian_text(spark):
    from ubdc_airbnb_spark.operators.tfidf import zipf_slope

    # freq(rank r) = 120 // r for 12 word types: a discrete Zipf head
    toks = []
    for r in range(1, 13):
        toks += [f"w{r:02d}"] * (120 // r)
    df = spark.createDataFrame([(1, "z", " ".join(toks))], "doc_id long, source string, text string")
    got = zipf_slope(df, "source", "text", max_rank=12).collect()[0]
    assert got.n_ranks == 12
    assert -1.15 < got.slope < -0.85  # near the natural-language ideal
    assert got.slope == got.slope_num / got.slope_den  # ratio contract


def test_zipf_slope_flat_for_uniform_template(spark):
    from ubdc_airbnb_spark.operators.tfidf import zipf_slope

    text = " ".join([f"tok{i}" for i in range(30)] * 5)  # every type freq 5
    df = spark.createDataFrame([(1, "t", text)], "doc_id long, source string, text string")
    got = zipf_slope(df, "source", "text", max_rank=30).collect()[0]
    assert got.slope == 0.0  # constant y: templated feed, flat head


# ---------------------------------------------------------------------------
# mixture_rates_by_tokens
# ---------------------------------------------------------------------------


def test_mixture_rates_by_tokens_plans_in_token_units(spark):
    from ubdc_airbnb_spark.operators.sampling import mixture_rates_by_tokens

    rows = [(1, "big", 1000), (2, "big", 1000), (3, "small", 10), (4, "small", 10)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tok long")
    got = {r.grp: r for r in mixture_rates_by_tokens(df, ["grp"], "n_tok", budget=100).collect()}
    # budget 100 tokens over 2 cells -> quota 50 each
    assert got["big"].quota == 50 and got["small"].quota == 50
    assert got["big"].tokens == 2000 and got["small"].tokens == 20
    assert got["big"].rate == 50 / 2000.0  # few huge docs -> low row rate
    assert got["small"].rate == 1.0  # under budget: keep everything
    assert got["small"].expected == 20 and got["big"].expected == 50
