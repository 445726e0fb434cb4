"""Document chunking (north-star): split long documents into overlapping
word windows — the step every LLM training / RAG ingestion pipeline runs
between cleaning and tokenization.

Spark-first shape: the chunk starts are a generated integer sequence per
row (``F.sequence``), exploded to one row per chunk, and the chunk text
is an array ``slice`` + ``array_join`` — all native higher-order
functions, zero UDF, zero shuffle (a pure narrow explode whose output
fans out rows without moving them). At 100 TB the operator is
embarrassingly parallel: each input split chunks independently and the
output inherits the input partitioning.

Chunk convention (deterministic, engine-replayable): window starts are
``1, 1+stride, 1+2*stride, ...`` while ``start <= n_words``; a start is
kept iff it is the first window or the previous window did not already
reach the end of the document (drops tail windows that would be strict
suffixes of their predecessor). The final window may be shorter than
``size``.

Reference analog: the reference stores full scraped payloads and slices
them downstream (responses.AirBnBResponse payload consumers); chunking
generalizes that to the training-data case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import words


def sliding_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 40,
    stride: int = 30,
) -> DataFrame:
    """One row per (document, chunk): (id, chunk_idx, start_word, n_words,
    chunk_text). ``chunk_idx`` counts from 0 in start order."""
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    ws = words(text_col)
    n = F.size(ws)
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        # keep the first window, and any window whose predecessor stopped
        # short of the document end (suffix-only tails are dropped)
        lambda s: (s == 1) | (s - stride + size - 1 < n),
    )
    out = df.select(
        F.col(id_col),
        ws.alias("__ws"),
        F.explode(starts).alias("start_word"),
    )
    chunk = F.slice(F.col("__ws"), F.col("start_word"), size)
    return out.select(
        id_col,
        (((F.col("start_word") - 1) / stride).cast("long")).alias("chunk_idx"),
        F.col("start_word").cast("long"),
        F.size(chunk).cast("long").alias("n_words"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def sequence_pack(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    budget: int,
    order_col: str | None = None,
) -> DataFrame:
    """Contiguous sequence packing — assign documents to fixed-budget
    training sequences by running token count, the deterministic
    approximation of greedy bin packing every large-scale pretraining
    pipeline uses (T5-style packing): docs are taken in a stable order
    (``order_col``, default the id) and ``pack_id = floor((cumsum -
    tokens) / budget)`` so a pack holds consecutive docs until the
    budget would overflow into the next pack. Oversized docs (> budget)
    own their packs. One window cumsum over the sort order — at scale a
    range-partitioned sort, no join, no driver state.

    Output: (id, n_tokens, pack_id, pack_offset) — offset is the token
    position where the doc starts inside its pack's running stream."""
    from pyspark.sql import Window

    order = order_col or id_col
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    cum = df.select(
        F.col(id_col), token_count.cast("long").alias("n_tokens")
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return cum.select(
        id_col,
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(budget)).alias("pack_id"),
        ((F.col("cum") - F.col("n_tokens")) % F.lit(budget)).alias("pack_offset"),
    )
