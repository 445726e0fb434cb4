"""TF-IDF term ranking over a document corpus (north-star text
analysis): per-document top terms by tf·idf, all set-based.

Pipeline: explode words → (doc, term) tf counts → term document
frequencies (one groupBy on term — the only corpus-wide aggregate,
map-side combinable) → smooth idf = ln((N+1)/(df+1)) + 1 (sklearn's
formula) → per-doc rank window. The term-df side is vocabulary-sized
and broadcasts; the big side shuffles once on (doc, term).

tf·idf is rounded to 6 decimals at the boundary: ln() is the only libm
touchpoint and engines may differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.textstats import words


def doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf) rows — lowercased whitespace terms."""
    return (
        df.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
        .withColumn("term", F.lower(F.col("term")))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def term_doc_freq(terms: DataFrame, id_col: str) -> DataFrame:
    """(term, df) — number of documents containing the term. Input is
    already one row per (doc, term), so this is a plain count."""
    return terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` terms per document by smooth tf-idf.

    Output: (id_col, term, tf, df, tfidf, rank); ties broken by term so
    the ranking is total and engine-independent."""
    from pyspark.sql import Window

    terms = doc_terms(df, id_col, text_col)
    n_docs = df.select(id_col).distinct().count()
    dfreq = term_doc_freq(terms, id_col)
    scored = terms.join(broadcast(dfreq), "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf").cast("double")
            * (
                F.log(
                    (F.lit(float(n_docs + 1)))
                    / (F.col("df").cast("double") + F.lit(1.0))
                )
                + F.lit(1.0)
            ),
            round_to,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )
