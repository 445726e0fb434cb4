"""N-gram language-model corpus scoring — the KenLM-style quality signal
of LLM data pipelines (CCNet/RefinedWeb filter by LM perplexity): train
token statistics over the corpus itself, then score every document by how
"familiar" its token transitions are. Low scores flag garbled or
machine-generated text; abnormally high scores flag boilerplate.

Spark-first design (100 TB):

- Training is two grouped aggregates over the exploded bigram stream —
  both map-side partial-combined, shuffling only ``distinct-bigram``-sized
  partials, never the corpus. Context (first-word) counts are DERIVED
  from the bigram counts (``c1 = Σ_w2 c12``), so the corpus is tokenized
  and exploded exactly once for training.
- Scoring first folds the smoothed probability into a MODEL-sized
  (bigram → quantized p) table — the count tables join each other on
  vocab-bounded keys — and only then joins the per-occurrence stream
  ONCE on the bigram key (r12; the stream used to be shuffled per count
  table). Common bigrams ("of the") are hot keys — at scale AQE's
  skew-join split handles the fan-in; the join is 1:1 per occurrence.
- The per-document mean is aggregated through ``DECIMAL`` (exact,
  associative) so the score is bit-identical across partitionings and
  engines — same rule as the rest of the battery (queries.py header).
- Zero Python UDFs; everything stays in whole-stage codegen.

No reference analog (the reference has no text-quality stage); this is a
training-data-pipeline extension (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import word_ngrams_arr_expr, word_ngrams_expr, words_expr


def doc_bigrams(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-occurrence bigram stream: (id, bigram) with one row per bigram
    occurrence, tokens lowercased whitespace words joined by one space.
    Documents with fewer than two tokens contribute no rows. Single-parse
    assembly (passing a computed Column into the ngram helper falls back
    to its ~40-py4j-call zip_with chain). The lowercased word array is
    factored into its own projection (r11): inlined, the gram builder's
    5 array references re-ran lower()+regex-split 5× per row (HOFs are
    CodegenFallback — no subexpression elimination)."""
    return df.selectExpr(
        f"`{id_col}` AS id",
        f"{words_expr(f'lower(`{text_col}`)')} AS __toks",
    ).selectExpr(
        "id",
        f"explode({word_ngrams_arr_expr('`__toks`', 2)}) AS bigram",
    )


def bigram_model(grams: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train add-one-smoothed bigram statistics from a bigram stream.

    Returns ``(bigram_counts, context_counts)``:
    ``bigram_counts``  — (bigram, c12): occurrences of the pair.
    ``context_counts`` — (w1, c1):      occurrences of the first word as
    a context, derived as Σ c12 so the stream is aggregated once.
    """
    bc = grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    cc = (
        bc.groupBy(F.substring_index("bigram", " ", 1).alias("w1"))
        .agg(F.sum("c12").alias("c1"))
    )
    return bc, cc


def score_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Mean add-one-smoothed conditional probability per document:

        score(d) = mean over bigrams (w1,w2) of  (c12 + 1) / (c1 + V)

    where V is the corpus vocabulary size (distinct lowercased tokens).
    The probability (not its log) is averaged so the whole computation is
    rational arithmetic on integer counts — ``ln`` differs at the ulp
    between libm implementations, which would break cross-engine hash
    parity for zero analytical benefit at ranking time (the mean-prob
    and mean-log-prob rankings agree on the pathological tails this
    filter exists to catch).

    Each per-bigram probability is quantized to integer parts-per-billion
    (``floor(p·1e9)``) before summation: the division operands are exact
    integers so ``p`` is the identical IEEE double on every engine, and
    floor of an identical double is identical — making the per-doc SUM
    exact 64-bit integer arithmetic, bit-stable across engines and
    partition orders (a double→DECIMAL cast would instead round at the
    engine's half-way convention; measured divergence at the 1e-18 ulp).
    The 1e-9 quantization is noise for a ranking/filter signal.

    Output: (doc_id, n_bigrams, avg_cond_p) — documents with < 2 tokens
    are absent (they have no transitions to score).
    """
    from .prefixsum import _pin

    # the bigram stream feeds both the training aggregates and the
    # scoring join; pin it so the tokenize+explode runs once
    # (MEMORY_AND_DISK: spills, never OOMs, at corpus scale)
    grams = _pin(doc_bigrams(df, id_col, text_col))
    bc = grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    # context counts DIRECTLY from the pinned stream (r12, VERDICT r11
    # item 7): Σ_w2 c12 grouped by w1 ≡ count of occurrences whose first
    # word is w1, so one map-side-combined pass replaces the former
    # bc-subtree re-aggregation (Catalyst cannot reuse the bc aggregate
    # across its two consumers — inferred filters + column pruning
    # specialize the subtrees — so `bc.groupBy(w1)` re-counted the whole
    # stream through a second bigram-keyed exchange).
    cc = grams.groupBy(
        F.substring_index("bigram", " ", 1).alias("w1")
    ).agg(F.count(F.lit(1)).alias("c1"))
    vsz = df.selectExpr(
        f"explode({words_expr(f'lower(`{text_col}`)')}) AS w"
    ).agg(F.countDistinct("w").alias("vsz"))
    # Fold the smoothed probability into a MODEL-sized table before it
    # ever meets the occurrence stream (r12, guide §2.3 "aggregate
    # before you shuffle" / §2.4): the former shape joined c12 onto the
    # stream, then shuffled the WHOLE per-occurrence stream a second
    # time on the w1 key to attach c1. Joining cc into bc first costs
    # two distinct-bigram-sized exchanges (vocab²-bounded, ≪ corpus) and
    # shuffles the corpus-sized stream exactly once; the per-bigram
    # quantized probability is computed once per DISTINCT bigram instead
    # of once per occurrence — identical integers by construction (p is
    # a pure function of (c12, c1, vsz), all exact int64 operands, so
    # floor(p·1e9) is the same IEEE double → the same long either way).
    # SHUFFLE_HASH / never broadcast: model tables are vocab(^2)-sized
    # (100x plan audit); vsz is one scalar row (broadcast).
    model = (
        bc.withColumn("w1", F.substring_index("bigram", " ", 1))
        .join(cc.hint("shuffle_hash"), "w1")
        .join(F.broadcast(vsz))
        .select(
            "bigram",
            F.floor(
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("vsz")).cast("double")
                * F.lit(1e9)
            )
            .cast("long")
            .alias("__ppb"),
        )
    )
    # The scoring tail stays in Column form ON PURPOSE: the r06
    # parameterized-SQL rewrite (a211ee1) silently lost the ``_pin``
    # cache reuse — ``spark.sql(stmt, grams=grams, ...)`` re-analyzes
    # the substituted relations in a way the CacheManager no longer
    # matches against the pinned InMemoryRelation, so every consumer
    # re-ran tokenize+explode from the documents table (plan evidence in
    # the r06 notes; the gap GROWS with corpus size).
    scored = (
        grams.join(model.hint("shuffle_hash"), "bigram")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__ppb").alias("sum_ppb"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        (
            (F.col("sum_ppb").cast("double") / F.lit(1e9))
            / F.col("n_bigrams").cast("double")
        ).alias("avg_cond_p"),
    )


def collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top: int = 20,
) -> DataFrame:
    """Collocation mining — statistically-bound phrases ("new york",
    "machine learning") by association lift over the corpus bigram
    model:

        lift(w1,w2) = c12 · N / (c1 · c2)

    with N the total bigram count and c1/c2 the first-/second-position
    marginals of the same bigram distribution (a proper contingency
    table). Lift is the exponentiated PMI, ranked identically to PMI
    (ln is monotone) while staying pure rational arithmetic on integer
    counts — exact, engine-bit-stable, no libm. Phrases feed the
    tokenizer (merge into single tokens), dedup shingling, and
    boilerplate analysis.

    Reuses the bigram/unigram aggregates of `bigram_model` (two
    map-side-combined groupBys over one exploded stream); the candidate
    table is distinct-bigram-sized, the min-count filter prunes it
    before the top-k (TakeOrdered on lift).

    Output: (bigram, c12, c1, c2, lift, rank ≤ top), ties by bigram."""
    from pyspark.sql import Window

    from .prefixsum import _pin

    grams = _pin(doc_bigrams(df, id_col, text_col))
    bc, cc = bigram_model(grams)
    n_bigrams = grams.count()
    c1 = cc.select(F.col("w1"), F.col("c1"))
    c2 = (
        bc.groupBy(F.substring_index("bigram", " ", -1).alias("w2"))
        .agg(F.sum("c12").alias("c2"))
    )
    cand = (
        bc.filter(F.col("c12") >= min_count)
        .withColumn("w1", F.substring_index("bigram", " ", 1))
        .withColumn("w2", F.substring_index("bigram", " ", -1))
        .join(c1.hint("shuffle_hash"), "w1")
        .join(c2.hint("shuffle_hash"), "w2")
        .withColumn(
            "lift",
            (F.col("c12") * F.lit(int(n_bigrams))).cast("double")
            / (F.col("c1") * F.col("c2")).cast("double"),
        )
    )
    w = Window.orderBy(F.desc("lift"), F.col("bigram"))
    return (
        cand.orderBy(F.desc("lift"), F.col("bigram"))
        .limit(top)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("bigram", "c12", "c1", "c2", "lift", "rank")
    )


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    bins: int = 4096,
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing (Wenzek et al. 2020): rank
    every document by its corpus-LM score WITHIN its language and split
    each language into thirds — 'head' (most fluent) feeds pretraining
    first, 'tail' is the candidate-drop slice.

    Scale design — no per-language total order: a per-lang
    ``percent_rank`` would sort each language's entire corpus inside one
    window partition (a handful of lang keys → single-partition sorts at
    100 TB). Instead the score axis quantizes into ``bins`` integer
    cells; tercile CUTOFF CELLS come from a cumulative window over the
    bounded (lang, bin) histogram (≤ langs·bins rows), broadcast back,
    and every document classifies by two integer comparisons — the
    histogram-prefilter device of the token-budget gate. Straddle bins
    assign whole to the lower bucket, deterministically in any engine.

    Output: (id_col, lang, n_bigrams, avg_cond_p, bucket) for docs with
    ≥2 tokens.
    """
    from pyspark.sql import Window

    from .prefixsum import _pin

    scored = score_documents(docs, id_col, text_col)
    # sb feeds BOTH the histogram/cutoff branch and the final classify
    # join; pin it (narrow: id, lang, two numerics, bin) so the scoring
    # pipeline — three model joins + the per-doc aggregate — runs once
    # (r08 A/B: ~6% at sf1, grows with corpus since it is a full
    # re-score; same justification as the grams pin in score_documents)
    sb = _pin(
        docs.select(F.col(id_col), F.col(lang_col))
        .join(scored, id_col)
        .withColumn(
            "b",
            F.least(
                F.floor(F.col("avg_cond_p") * bins).cast("long"), F.lit(bins - 1)
            ),
        )
    )
    hist = sb.groupBy(lang_col, "b").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy(lang_col)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(lang_col))
    )
    cuts = cum.groupBy(lang_col).agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("b"))).alias("cut1"),
        F.min(F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("b"))).alias("cut2"),
    )
    return sb.join(F.broadcast(cuts), lang_col).select(
        F.col(id_col),
        F.col(lang_col),
        "n_bigrams",
        "avg_cond_p",
        F.when(F.col("b") <= F.col("cut1"), F.lit("tail"))
        .when(F.col("b") <= F.col("cut2"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("bucket"),
    )


def score_documents_interpolated(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Jelinek-Mercer interpolated LM score (λ = 1/2): per bigram,

        p = ½·(c12+1)/(c1+V)  +  ½·(c2+1)/(T+V)

    — the bigram estimate backed off toward the unigram distribution,
    the standard fix for the pure-bigram scorer's blind spot (a rare
    continuation after a rare context scores 0-ish even when the word
    itself is common). λ is FIXED at the dyadic ½ so the mixture is one
    exact IEEE expression of integer-exact operands; per-bigram values
    quantize to integer ppb before the per-doc sum (the score_documents
    device — bit-stable across engines and partition orders).

    Scale shape: adds ONE map-side-combinable unigram count aggregate
    and one equi-join on the w2 key to the bigram scorer's plan; model
    tables stay vocabulary-sized, scalars broadcast.

    Output: (doc_id, n_bigrams, avg_interp_p) — docs with < 2 tokens
    absent.
    """
    from .prefixsum import _pin

    grams = _pin(doc_bigrams(df, id_col, text_col))
    bc = grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    # context counts directly from the pinned stream (r12 — same
    # equivalence as score_documents: Σ_w2 c12 per w1 ≡ occurrence count
    # per first word; saves the bc-subtree re-aggregation)
    cc = grams.groupBy(
        F.substring_index("bigram", " ", 1).alias("w1")
    ).agg(F.count(F.lit(1)).alias("c1"))
    toks = df.selectExpr(f"explode({words_expr(f'lower(`{text_col}`)')}) AS w")
    uc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c2"))
    tots = toks.agg(
        F.countDistinct("w").alias("vsz"), F.count(F.lit(1)).alias("tt")
    )
    p = (
        F.lit(0.5)
        * ((F.col("c12") + F.lit(1)).cast("double") / (F.col("c1") + F.col("vsz")).cast("double"))
        + F.lit(0.5)
        * ((F.col("c2") + F.lit(1)).cast("double") / (F.col("tt") + F.col("vsz")).cast("double"))
    )
    # Fold p into a MODEL-sized table before it meets the occurrence
    # stream (r12, guide §2.3/§2.4 — same device as score_documents):
    # the former shape shuffled the whole per-occurrence stream THREE
    # times (bigram, w1, w2 keys); the model assembly joins
    # vocab(^2)-bounded tables instead and the stream is shuffled once.
    # p is a pure function of exact int64 counts, so the per-distinct-
    # bigram floor(p·1e9) is bit-identical to the per-occurrence one.
    model = (
        bc.withColumn("w1", F.substring_index("bigram", " ", 1))
        .withColumn("w2", F.substring_index("bigram", " ", -1))
        .join(cc.hint("shuffle_hash"), "w1")
        .join(uc.withColumnRenamed("w", "w2").hint("shuffle_hash"), "w2")
        .join(F.broadcast(tots))
        .select(
            "bigram",
            F.floor(p * F.lit(1e9)).cast("long").alias("__ppb"),
        )
    )
    scored = (
        grams.join(model.hint("shuffle_hash"), "bigram")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__ppb").alias("sum_ppb"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        (
            (F.col("sum_ppb").cast("double") / F.lit(1e9))
            / F.col("n_bigrams").cast("double")
        ).alias("avg_interp_p"),
    )
