"""Unit tests for corpus-curation operators (decontamination overlap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubdc_airbnb_spark.operators.curation import ngram_overlap


def test_ngram_overlap_counts(spark):
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares two distinct 5-grams with the eval doc
            (1, "alpha beta gamma delta epsilon zeta eta"),
            # shares none (different words)
            (2, "one two three four five six seven"),
            # too short for any 5-gram
            (3, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_overlap
        for r in ngram_overlap(train, eval_df, "doc_id", "text", n=5).collect()
    }
    assert got == {1: 2}


def test_ngram_overlap_plan_broadcasts(spark):
    eval_df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    train = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = ngram_overlap(train, eval_df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_weights_separate_target_from_rest(spark):
    """The point of the scorer: documents from the target slice (en) must
    average a higher importance weight than the rest."""
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.curation import dsir_weights
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    w = dsir_weights(docs, F.col("lang") == "en")
    j = w.join(docs.select("doc_id", "lang"), "doc_id")
    avg = {
        r.grp: r.m
        for r in j.groupBy((F.col("lang") == "en").alias("grp"))
        .agg(F.avg(F.col("weight") / F.col("n_tokens")).alias("m"))
        .collect()
    }
    assert avg[True] > avg[False]
