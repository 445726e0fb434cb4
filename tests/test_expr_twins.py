"""Single-parse Spark-SQL text twins must be VALUE-IDENTICAL to the
Column forms they replace on the hot construction path — if the two
dialects ever diverge, non-gate callers silently change results.

Covers: words / word_ngrams / char_ngrams / quality_score (textstats),
dot / norm / cosine (similarity). Inputs stress the edge semantics:
NULLs, empties, short strings, unicode, multi-space runs, punctuation,
and boundary-magnitude floats for the IEEE-double fold order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

TRICKY_TEXT = [
    (0, None),
    (1, ""),
    (2, " "),
    (3, "a"),
    (4, "a b"),
    (5, "a  b   c"),
    (6, "The quick brown fox, and the lazy dog!!!"),
    (7, "über Straße naïve 日本語 テスト words here"),
    (8, "x" * 500),
    (9, "one two three four five six seven eight nine ten"),
    (10, "!!! ??? ... ;;; :::"),
    (11, "tab\tsep and\nnewline separated tokens"),
]


def _assert_cols_equal(df, pairs):
    """pairs: list of (expr_col, column_col) aliased a{i}/b{i}."""
    sel = []
    for i, (ea, eb) in enumerate(pairs):
        sel += [ea.alias(f"a{i}"), eb.alias(f"b{i}")]
    for row in df.select(*sel).collect():
        for i in range(len(pairs)):
            assert row[f"a{i}"] == row[f"b{i}"], (i, row)


def test_text_twins_match_column_forms(spark):
    from ubdc_airbnb_spark.functions import textstats as ts

    df = spark.createDataFrame(TRICKY_TEXT, "id long, text string")
    _assert_cols_equal(
        df,
        [
            (ts.words("text"), ts.words(F.col("text"))),
            (ts.word_ngrams("text", 2), ts.word_ngrams(F.col("text"), 2)),
            (ts.word_ngrams("text", 3), ts.word_ngrams(F.col("text"), 3)),
            (ts.char_ngrams("text", 3), ts.char_ngrams(F.col("text"), 3)),
            (ts.char_ngrams("text", 5), ts.char_ngrams(F.col("text"), 5)),
            (ts.quality_score("text"), ts.quality_score(F.col("text"))),
        ],
    )


def test_vector_twins_match_column_forms(spark):
    from ubdc_airbnb_spark.operators import similarity as sim

    rows = [
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (2, [0.1, -0.2, 0.3], [-0.4, 0.5, -0.6]),
        (3, [1e-12, 1e12, -1e-6], [1e6, -1e-12, 1e-3]),
        (4, [0.0, 0.0, 1.0], [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    _assert_cols_equal(
        df,
        [
            (
                F.expr(sim.dot_expr("a", "b")),
                sim.dot(F.col("a"), F.col("b")),
            ),
            (F.expr(sim.norm_expr("a")), sim.norm(F.col("a"))),
            (
                sim.cosine_cols("a", "b"),
                sim.cosine(F.col("a"), F.col("b")),
            ),
        ],
    )


def test_word_ngrams_arr_expr_matches(spark):
    from ubdc_airbnb_spark.functions import textstats as ts

    df = spark.createDataFrame(TRICKY_TEXT, "id long, text string").select(
        "id", ts.words("text").alias("ws")
    )
    _assert_cols_equal(
        df,
        [
            (
                F.expr(ts.word_ngrams_arr_expr("ws", 3)),
                ts.word_ngrams_arr(F.col("ws"), 3),
            )
        ],
    )


def test_nested_field_names_fall_back_to_col_semantics(spark):
    """A dotted string like 'meta.text' is a NESTED-FIELD path under
    F.col semantics; the single-parse fast path must not backtick it
    into a (nonexistent) top-level column — it falls back to the
    Column-based construction and resolves the struct field."""
    from ubdc_airbnb_spark.functions import textstats as ts

    df = spark.createDataFrame(
        [(1, ("hello world of spark",))], "id long, meta struct<text: string>"
    )
    got = df.select(
        ts.words("meta.text").alias("ws"),
        ts.word_ngrams("meta.text", 2).alias("g2"),
        ts.quality_score("meta.text").alias("q"),
        ts.char_ngrams("meta.text", 3).alias("c3"),
    ).first()
    assert got.ws == ["hello", "world", "of", "spark"]
    assert got.g2 == ["hello world", "world of", "of spark"]
    assert 0.0 <= got.q <= 1.0 and len(got.c3) > 0
