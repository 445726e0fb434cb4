"""E2E test of the composed corpus-curation plan (plans/curation.py):
a hand-built corpus where every stage has known casualties, so the
stage-by-stage survivor accounting is fully predictable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ubdc_airbnb_spark.plans.curation import run_curation

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the river "
    "bank where the water is clear and the fish are plenty for all of them"
)
GOOD2 = (
    "a merge of the sorted runs begins when the last batch lands and the "
    "scheduler hands each worker a span of keys to fold into the output"
)
GOOD3 = (
    "every morning the harbor fills with small boats and the market opens "
    "while the gulls circle over the stalls looking for an easy meal today"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # survivors: long-enough english text, unique urls and bodies
        (1, GOOD + " one", "en", "https://a.io/1?x=1"),
        (2, GOOD2, "en", "https://a.io/2"),
        # killed by funnel: too short
        (3, "too short", "en", "https://a.io/3"),
        # killed by funnel: wrong language tag
        (4, GOOD + " vier", "de", "https://a.io/4"),
        # killed by URL dedup: same canonical url as doc 1 (tracking junk)
        (5, GOOD + " five", "en", "HTTPS://A.io/1?x=1&utm_source=z#f"),
        # killed by exact dedup: byte-identical to doc 2's text
        (6, GOOD2, "en", "https://a.io/6"),
        # killed by near-dup dedup: shares almost all word 3-grams with doc 1
        (7, GOOD + " one indeed", "en", "https://a.io/7"),
        # killed by decontamination: contains the eval passage verbatim
        (8, GOOD3 + " " + "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "https://a.io/8"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, url string")


@pytest.fixture(scope="module")
def eval_docs(spark):
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )


def test_curation_stage_accounting(spark, corpus, eval_docs):
    res = run_curation(
        spark, corpus, eval_docs=eval_docs, url_col="url", min_tokens=10
    )
    assert res.report["raw"] == 8
    assert res.report["quality_funnel"] == 6   # -3 (short), -4 (lang)
    assert res.report["url_dedup"] == 5        # -5 (canonical twin of 1)
    assert res.report["exact_dedup"] == 4      # -6 (byte twin of 2)
    assert res.report["neardup_dedup"] == 3    # -7 (minhash twin of 1)
    assert res.report["decontaminated"] == 2   # -8 (eval passage)
    ids = sorted(r.doc_id for r in res.corpus.select("doc_id").collect())
    assert ids == [1, 2]


def test_curation_split_is_deterministic(spark, corpus, eval_docs):
    res1 = run_curation(spark, corpus, eval_docs=eval_docs, url_col="url", min_tokens=10)
    res2 = run_curation(spark, corpus, eval_docs=eval_docs, url_col="url", min_tokens=10)
    s1 = {(r.doc_id, r.split) for r in res1.corpus.select("doc_id", "split").collect()}
    s2 = {(r.doc_id, r.split) for r in res2.corpus.select("doc_id", "split").collect()}
    assert s1 == s2


def test_curation_without_optional_stages(spark, corpus):
    res = run_curation(spark, corpus, min_tokens=10)
    assert "url_dedup" not in res.report
    assert "decontaminated" not in res.report
    assert res.report["neardup_dedup"] >= 1


def test_curate_cli(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated") / "corpus")
    from ubdc_airbnb_spark.cli import main

    rc = main(["curate", "--sf-dir", "/root/testdata/sf0.001", "--output", out])
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert "split" in got.columns


def test_curation_with_mixing_and_packing(spark, corpus, eval_docs):
    res = run_curation(
        spark, corpus, eval_docs=eval_docs, url_col="url", min_tokens=10,
        source_weights=None, pack_budget=16,
    )
    rows = res.corpus.collect()
    assert {"pack_id", "pack_offset"} <= set(res.corpus.columns)
    assert res.report["n_packs"] >= 1
    # token-stream invariant over the packed order
    ordered = sorted(rows, key=lambda r: (r.pack_id, r.pack_offset))
    stream = 0
    for r in ordered:
        assert r.pack_id == stream // 16
        assert r.pack_offset == stream % 16
        stream += len(r.text.split())


def test_curation_mixing_upsamples(spark, corpus, eval_docs):
    docs = corpus.withColumn("source", F.lit("web"))
    res = run_curation(
        spark, docs, eval_docs=eval_docs, url_col="url", min_tokens=10,
        source_weights={"web": 2.0},
    )
    assert res.report["mixed"] == 2 * res.report["decontaminated"]
    assert "copy_id" in res.corpus.columns


def test_curation_with_line_filter_and_source_cap(spark):
    lines = [
        "the quick brown fox jumps over the lazy sleeping dog tonight.",
        "a merge of sorted runs begins when the last batch lands here.",
        "every morning the harbor fills with small boats and open stalls.",
        "the scheduler hands each worker a span of keys to fold now.",
        "gulls circle over the market looking for an easy meal today.",
    ]
    junk = "click here"
    rows = [
        # 4 docs from source web (distinct bodies), 1 from wiki; every doc
        # carries one good line and one junk line the line filter removes
        (i, lines[i] + "\n" + junk, "en", "web" if i < 4 else "wiki")
        for i in range(5)
    ] + [
        # all-junk doc: line filter empties it entirely
        (9, junk + "\n" + junk, "en", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    res = run_curation(
        spark,
        docs,
        min_tokens=5,
        min_quality=0.0,
        lang=None,
        line_filter=True,
        max_per_source=2,
    )
    # the all-junk doc died in the line filter
    assert res.report["line_filter"] == 5
    # web had 4 survivors, capped to 2; wiki keeps its 1
    assert res.report["source_cap"] == 3
    per_src = dict(
        (r["source"], r["count"]) for r in res.corpus.groupBy("source").count().collect()
    )
    assert per_src == {"web": 2, "wiki": 1}
    # surviving text lost its junk lines
    texts = [r.text for r in res.corpus.collect()]
    assert all("click here" not in t for t in texts)
    # stage ordering: monotone non-increasing counts through the funnel
    stages = list(res.report.values())
    assert stages == sorted(stages, reverse=True)
