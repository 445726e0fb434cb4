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
    (``order_col``, default the id) and a doc belongs to the pack where
    its token stream STARTS: ``pack_id = floor((cumsum - tokens) /
    budget)``. A doc that straddles a budget boundary stays whole in the
    pack where it starts (that pack overflows by up to one doc and the
    next begins under-full); ``pack_offset`` is the doc's global token
    stream position mod budget — the start position inside the budget
    grid, not a within-pack byte offset. Oversized docs (> budget) own
    their packs.

    Scale: the cumulative sum is the two-pass range-partitioned prefix
    sum (``operators/prefixsum.py``) — bucketize on the numeric order
    key, per-bucket totals broadcast back as offsets, within-bucket
    window — so NO single-partition ``Exchange`` ever appears in the
    plan (plan-asserted in tests/test_plans_physical.py). The order key
    must be numeric for the boundary sketch.

    Output: (id, n_tokens, pack_id, pack_offset)."""
    from .prefixsum import partitioned_cumsum

    order = order_col or id_col
    cols = [F.col(id_col)] if order == id_col else [F.col(id_col), F.col(order)]
    base = df.select(*cols, token_count.cast("long").alias("n_tokens"))
    cum = partitioned_cumsum(
        base,
        order=[F.col(order)],
        value=F.col("n_tokens"),
        out_col="cum",
        bucket_key=F.col(order),
    )
    return cum.select(
        id_col,
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(budget)).alias("pack_id"),
        ((F.col("cum") - F.col("n_tokens")) % F.lit(budget)).alias("pack_offset"),
    )


def length_bucket_plan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
) -> DataFrame:
    """Length-bucketed batching plan: assign every document to one of
    ``n_buckets`` quantile buckets of its whitespace-token length and
    report, per bucket, how much padding a pad-to-bucket-max training
    batch would waste — the planner step behind bucketed batching
    (fairseq/HF ``group_by_length``), which cuts padding FLOPs versus
    one global pad-to-max batch.

    Bucket rule (deterministic, tie-stable): all documents of the same
    token length land in the same bucket,
    ``bucket = floor(cum_docs_with_shorter_length · B / N)`` — a pure
    integer formula any engine replays exactly.

    Scale shape: token lengths reduce to a histogram by an exact
    groupBy(n_tokens) whose key space is bounded by the max document
    length (thousands of distinct values at any corpus size), so the
    boundary window runs over histogram rows, not documents — the same
    histogram-prefilter device as the token-budget gate; the per-length
    bucket map broadcasts back and the final per-bucket rollup is a
    map-side-combinable aggregate on ≤ B keys. The corpus shuffles zero
    times (scan → narrow length projection → broadcast join → partial
    agg).

    Output: (bucket, n_docs, min_tokens, max_tokens, sum_tokens,
    pad_waste, pad_frac) — ``pad_waste = n_docs·max_tokens −
    sum_tokens``, ``pad_frac = pad_waste / (n_docs·max_tokens)``.
    """
    from pyspark.sql import Window

    tl = docs.select(
        F.col(id_col), F.size(words(F.col(text_col))).cast("long").alias("n_tokens")
    )
    hist = tl.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, -1)
    total = hist.agg(F.sum("cnt").alias("n_total"))
    bmap = (
        hist.withColumn("cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .select(
            "n_tokens",
            F.floor(F.col("cum_before") * n_buckets / F.col("n_total"))
            .cast("long")
            .alias("bucket"),
        )
    )
    return (
        tl.join(F.broadcast(bmap), "n_tokens")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "min_tokens",
            "max_tokens",
            "sum_tokens",
            (F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens")).alias("pad_waste"),
            (
                (F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens")).cast("double")
                / (F.col("n_docs") * F.col("max_tokens")).cast("double")
            ).alias("pad_frac"),
        )
    )
