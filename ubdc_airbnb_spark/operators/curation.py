"""Corpus-curation operators for the training-data pipeline: eval-set
decontamination (n-gram overlap), Gopher-style repetition signals, and
C4-style cross-document segment deduplication.

These mirror the published web-corpus pipelines (C4's "three-sentence
dedup", Gopher/MassiveText repetition filters, GPT-3/PaLM benchmark
decontamination) re-expressed as Spark DataFrame algebra:

- decontamination is a broadcast semi-join of corpus n-grams against the
  (small) eval-set n-gram dictionary — the corpus never shuffles except
  the final per-doc tally, which partial-aggregates map-side;
- repetition signals are pure per-row column expressions (sort the token
  array once, fold a max-run-length accumulator) — zero shuffle, stays
  in whole-stage codegen at 100 TB;
- segment dedup is the only genuinely shuffling op (it must compare
  segments *across* documents): one hash-partition on the segment text
  to pick the global first occurrence, one on doc_id to reassemble.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.psql import psql

from ..functions.textstats import (
    word_ngrams_arr_expr,
    words,
    words_expr,
)


# ---------------------------------------------------------------------------
# Eval-set decontamination
# ---------------------------------------------------------------------------


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark-decontamination probe: for every training document,
    count how many of its distinct word ``n``-grams appear anywhere in
    the evaluation set. Documents with ``n_overlap > 0`` are
    contamination suspects (the GPT-3 appendix-C / PaLM approach).

    Scale shape: the eval-set gram dictionary is benchmark-sized (MBs),
    so it broadcasts; the corpus side is a narrow explode → broadcast
    hash join → per-doc count with map-side partial aggregation. The
    100 TB corpus is scanned once and never shuffled on gram.
    """
    # word arrays factored into their own projection (r11): the zip_with
    # gram builder references its input 2n+1 times and HOFs are
    # CodegenFallback, so the inlined form re-ran the regex split that
    # many times per row
    eval_grams = (
        eval_df.selectExpr(f"{words_expr(f'`{text_col}`')} AS __toks")
        .selectExpr(
            f"explode(array_distinct({word_ngrams_arr_expr('`__toks`', n)})) AS gram"
        )
        .distinct()
    )
    train_grams = train.selectExpr(
        f"`{id_col}`", f"{words_expr(f'`{text_col}`')} AS __toks"
    ).selectExpr(
        f"`{id_col}`",
        f"explode(array_distinct({word_ngrams_arr_expr('`__toks`', n)})) AS gram",
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


# ---------------------------------------------------------------------------
# Repetition signals (Gopher / MassiveText quality filters)
# ---------------------------------------------------------------------------


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a *sorted* array — equal
    to the max element frequency, computed row-locally (no explode, no
    shuffle) by folding a (prev, run, best) accumulator."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = (
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_signals(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-style within-document repetition metrics:

    - ``n_words``: whitespace token count
    - ``dup_word_frac``: fraction of tokens that are repeats of an
      earlier token (1 - distinct/total)
    - ``top_word_frac``: frequency of the most common token / total
    - ``top_bigram_frac``: frequency of the most common word bigram /
      bigram count (0 when the doc has < 2 words)

    All four are per-row column expressions over a sorted copy of the
    token array — zero shuffle, whole-stage codegen, embarrassingly
    parallel at any corpus size. MassiveText drops docs with
    ``top_word_frac > 0.2`` or high duplicate-line fractions; the caller
    applies thresholds.

    The token/bigram arrays are factored into their own projections
    (r11): inlined, every ``size``/``array_sort``/``array_distinct``
    reference re-expanded the regex split (HOFs are CodegenFallback, so
    ~20 splits per row across the four metrics)."""
    toksed = docs.selectExpr(
        f"`{id_col}`", f"{words_expr(f'`{text_col}`')} AS __ws"
    ).selectExpr(
        f"`{id_col}`", "__ws", f"{word_ngrams_arr_expr('`__ws`', 2)} AS __bg"
    )
    ws = F.col("__ws")
    bg = F.col("__bg")
    n = F.size(ws).cast("long")
    n_bg = F.size(bg).cast("long")
    return toksed.select(
        F.col(id_col),
        n.alias("n_words"),
        F.when(n > 0, (n - F.size(F.array_distinct(ws)).cast("long")).cast("double") / n)
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
        F.when(n > 0, _max_run(F.array_sort(ws)).cast("double") / n)
        .otherwise(F.lit(0.0))
        .alias("top_word_frac"),
        F.when(n_bg > 0, _max_run(F.array_sort(bg)).cast("double") / n_bg)
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# Cross-document segment dedup (C4-style)
# ---------------------------------------------------------------------------


def segment_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    seg_words: int = 10,
) -> DataFrame:
    """C4-style corpus-level segment dedup: split every document into
    consecutive ``seg_words``-word segments, keep only the globally
    *first* occurrence of each distinct segment (ordered by
    (doc_id, position) — deterministic), and reassemble documents from
    their surviving segments. Documents reduced to nothing disappear.

    Returns (id_col, clean_text, n_kept).

    Scale shape: segments hash-partition by their text exactly once (the
    window that elects the first occurrence), then regroup by doc id —
    the same two-shuffle layout C4's original MapReduce used. Both keys
    are high-cardinality and near-uniform; no broadcast, no driver
    state."""
    # tokenize ONCE into a column: `ws` captured inside the transform
    # lambda would re-evaluate words(text) per segment (the HOF capture
    # trap — O(segments x n) per doc); an attribute deref is O(1)
    wsa = F.col("__ws")
    n_segs = F.ceil(F.size(wsa) / F.lit(seg_words)).cast("int")
    seg_starts = F.sequence(F.lit(0), F.greatest(n_segs - 1, F.lit(0)))
    segs = (
        docs.select(F.col(id_col), words(text_col).alias("__ws"))
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    seg_starts,
                    lambda i: F.struct(
                        i.cast("long").alias("seg_idx"),
                        F.array_join(
                            F.slice(wsa, i * seg_words + 1, seg_words), " "
                        ).alias("seg_text"),
                    ),
                )
            ).alias("s"),
        )
        .select(id_col, "s.seg_idx", "s.seg_text")
        .filter(F.length("seg_text") > 0)
    )
    w = Window.partitionBy("seg_text").orderBy(F.col(id_col), F.col("seg_idx"))
    first = segs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        first.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("seg_idx"), F.col("seg_text")))
            ).alias("kept"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(F.col("kept"), lambda s: s["seg_text"]), " "
            ).alias("clean_text"),
            F.col("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# N-gram novelty (incremental-corpus contribution scoring)
# ---------------------------------------------------------------------------


def ngram_novelty(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
) -> DataFrame:
    """Per-document novelty: the fraction of a document's DISTINCT word
    n-grams whose globally first occurrence (min doc id over the corpus)
    is this document. Near-zero novelty marks documents assembled from
    already-seen text (templates, mirrors, aggregators) even when no
    single pair-wise duplicate crosses a dedup threshold; it is the
    corpus-growth signal used when deciding whether a new crawl slice
    adds anything.

    Scale shape: distinct grams per doc (narrow explode) → one groupBy
    on the gram text electing min(id) — map-side partial MIN, uniform
    high-cardinality key — → equi-join back on the gram → per-doc count
    ratio. Two shuffles on hash keys, no window, no broadcast of
    anything corpus-sized. The join-back carries an explicit
    SHUFFLE_HASH hint: the first-occurrence side is as large as the
    distinct-gram set (corpus-sized), but Catalyst's post-aggregate size
    estimate is tiny, so unhinted it picks a broadcast join that
    materializes the whole gram dictionary on the driver — observed as
    a 3.3 GiB broadcast at the 100x scale smoke. A hash-partitioned
    join is safe at any scale (build side = grams/partitions narrow
    rows), and unlike a MERGE hint it pays no sort on either side.

    Output: (id_col, n_distinct_grams, n_novel, novelty) — documents
    with fewer than ``ngram`` words are absent (no grams to judge)."""
    # lowercased word array factored into its own projection (r11): one
    # lower()+regex-split per row instead of one per gram-builder
    # reference (HOFs are CodegenFallback)
    grams = docs.selectExpr(
        f"`{id_col}` AS id",
        f"{words_expr(f'lower(`{text_col}`)')} AS __toks",
    ).selectExpr(
        "id",
        f"explode(array_distinct({word_ngrams_arr_expr('`__toks`', ngram)})) AS gram",
    )
    first = grams.groupBy("gram").agg(F.min("id").alias("first_id"))
    return (
        grams.join(first.hint("shuffle_hash"), "gram")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.sum((F.col("first_id") == F.col("id")).cast("long")).alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.col("n_novel").cast("double") / F.col("n_distinct_grams").cast("double"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling weights
# ---------------------------------------------------------------------------


def dsir_weights(
    docs: DataFrame,
    in_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """Data-selection importance weights (the hashed-n-gram DSIR recipe,
    Xie et al. 2023): score every document by the log-likelihood ratio of
    a TARGET unigram model (documents where ``in_target``) vs the RAW
    corpus model, over hashed token buckets —

        w(d) = Σ_tok  ln p_t(bucket(tok)) − ln p_r(bucket(tok))

    with add-1 smoothing in a fixed ``buckets``-sized hash space. High
    weight ⇒ the document "looks like" the target slice; resample the
    raw corpus ∝ exp(w) (or top-quantile cut) to shift a 100 TB crawl
    toward a curated distribution without training a classifier.

    Spark shape: tokens bucket via the portable md5-60bit hash (narrow),
    per-(doc,bucket) tf counts partial-aggregate map-side, the two model
    count tables are ≤ ``buckets`` rows (broadcast), scalar totals
    broadcast — ONE shuffle of (doc, bucket) rows regardless of corpus
    size, and the bucket space caps model memory exactly as in the paper.

    Determinism: the two smoothed probabilities fold into ONE ln of a
    ratio of IEEE-exact doubles, quantized to integer micro-units before
    the per-doc sum (the BM25 absorb-the-ulp device), so the weight is
    bit-stable across engines and partitionings.

    Output: (id_col, weight double, n_tokens long) — docs with ≥1 token.
    """
    from ..functions.hashing import md5_long
    from .prefixsum import _pin

    # tf per (doc, word) FIRST (map-side combined), md5 only on the
    # combined rows: one hash per distinct word per doc, not per token
    # occurrence — ~tokens/vocab fewer md5 kernels (measured 2x e2e)
    wt = (
        docs.select(
            F.col(id_col), in_target.alias("__tgt"), F.explode(words(text_col)).alias("__w")
        )
        .groupBy(id_col, "__tgt", F.lower(F.col("__w")).alias("__word"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # the (doc, bucket) stream feeds BOTH the model aggregate and the
    # final scoring join — pin it (release via release_pins() as usual)
    db = _pin(
        wt.select(id_col, "__tgt", (md5_long(F.col("__word")) % buckets).alias("b"), "tf")
        .groupBy(id_col, "__tgt", "b")
        .agg(F.sum("tf").alias("tf"))
    )
    # both unigram models in ONE bucket-key aggregate: raw count = all
    # tokens, target count = conditional sum (0 when the bucket never
    # occurs in the target slice — same value the old left-join coalesced)
    models = db.groupBy("b").agg(
        F.sum("tf").alias("cr"),
        F.sum(F.when(F.col("__tgt"), F.col("tf")).otherwise(F.lit(0))).alias("ct"),
    )
    tots = models.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    bd = float(buckets)
    num = (F.col("ct") + 1).cast("double") * (F.col("tr").cast("double") + F.lit(bd))
    den = (F.col("cr") + 1).cast("double") * (F.col("tt").cast("double") + F.lit(bd))
    lr = models.join(F.broadcast(tots)).select(
        "b", F.floor(F.log(num / den) * F.lit(1e6)).cast("long").alias("lr_u")
    )
    return (
        db.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("tf") * F.col("lr_u")).alias("w_u"),
            F.sum("tf").alias("n_tokens"),
        )
        .select(
            id_col,
            (F.col("w_u").cast("double") / F.lit(1e6)).alias("weight"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Exact duplicated-span detection (suffix-style substring dedup)
# ---------------------------------------------------------------------------


def _merge_hit_spans(dh: DataFrame, k: int) -> DataFrame:
    """Merge positional k-gram hits ``(__id, pos)`` into maximal token
    spans per document: a hit covers tokens [pos, pos+k-1]; hits whose
    intervals overlap or touch coalesce. Two doc-keyed windows (running
    max-end elects span starts, running sum numbers them) — never a
    global window. Returns (__id, span_id, s, e)."""
    w_prev = (
        Window.partitionBy("__id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("__id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = dh.withColumn(
        "is_new",
        F.when(
            F.max(F.col("pos") + (k - 1)).over(w_prev).isNull()
            | (F.col("pos") > F.max(F.col("pos") + (k - 1)).over(w_prev) + 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("span_id", F.sum("is_new").over(w_run))
    return marked.groupBy("__id", "span_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + (k - 1)).alias("e")
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Exact duplicated-SPAN detection — the Spark-able reformulation of
    suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): a token span is
    duplicated when every one of its word ``k``-grams occurs at ≥2
    positions anywhere in the corpus (including elsewhere in the same
    document). Overlapping/adjacent duplicated k-gram hits merge into
    maximal spans, giving per-document span coordinates + the
    duplicated-token fraction that substring-level dedup would excise.

    Equivalence note: a suffix array finds maximal repeated substrings of
    length ≥ k; marking positions covered by any repeated k-gram marks
    exactly the same token set (any repeat of length L ≥ k is a chain of
    L−k+1 repeated k-grams), so the *coverage* is identical — only the
    pairing information (which doc matched which) is dropped, which the
    excision step never needed.

    Scale shape: positional k-grams come from ONE posexplode over the
    zip_with n-gram builder (narrow, O(words·k) per row), derived ONCE;
    the repeated-gram election is a COUNT window over the gram-keyed
    exchange those hits need anyway (r12 — the former count-aggregate +
    join-back shape re-derived every gram a second time, paid a second
    gram exchange, and hash-built a corpus-sized gram dictionary per
    task); span assembly is two doc-keyed windows (running max-end,
    running span counter) — never a global window. No broadcast of
    anything corpus-sized, no driver state; at 100 TB this is one
    gram-keyed + one doc-keyed shuffle of the positional hits, total.

    Output: (id_col, n_tokens, n_spans, dup_tokens, dup_frac) for EVERY
    input document (zero-filled when nothing repeats).
    """
    from ..functions.textstats import word_ngrams_arr_expr, words_expr

    ws = words_expr(f"lower(`{text_col}`)")
    grams = word_ngrams_arr_expr("__ws", k)
    # ONE spark.sql parse for the whole pipeline (same plan as the
    # equivalent DataFrame chain; avoids ~10 eager per-node analyses of
    # pure driver latency). Shapes preserved: hash agg on the gram key,
    # gram-key join-back, two DOC-KEYED windows, and the zero-fill via
    # UNION ALL + one hash aggregate (no SMJ sort, output comes back
    # hash-partitioned on the doc id).
    return psql(
        f"""
        WITH base AS (
          SELECT `{id_col}` AS __id, {ws} AS __ws FROM {{docs}}
        ),
        hits AS (
          SELECT __id, pos, gram
          FROM base LATERAL VIEW posexplode({grams}) AS pos, gram
        ),
        -- repeated-gram election as COUNT over the gram partition (r12,
        -- VERDICT r11 item 4): the former GROUP BY gram HAVING + join-
        -- back re-derived every positional gram a SECOND time (the
        -- zip_with k-gram build over a fresh doc scan — HOFs are
        -- CodegenFallback, the single most expensive per-row work here),
        -- paid a second gram-keyed exchange for the count partials, and
        -- hash-built the corpus-sized repeated-gram dictionary per task
        -- (the r10 OOM hazard the old SHUFFLE_HASH hint existed to
        -- contain). The window rides the ONE hits exchange the join-back
        -- already required — same shuffled bytes, one gram derivation,
        -- no dictionary build; the added per-partition sort on the gram
        -- key is linear-memory and spills (never the all-to-one window
        -- the plan audit flags — gram keys are corpus-cardinality).
        -- Rowset is identical: a position survives iff its gram occurs
        -- >= 2 times corpus-wide (the explicit IS NOT NULL preserves the
        -- inner join's null rejection; grams are non-null concat output).
        dh AS (SELECT __id, pos FROM (
                 SELECT __id, pos,
                        COUNT(*) OVER (PARTITION BY gram) AS __gcnt
                 FROM hits WHERE gram IS NOT NULL)
               WHERE __gcnt >= 2),
        marked AS (
          SELECT __id, pos,
                 CASE WHEN MAX(pos + {k - 1}) OVER w_prev IS NULL
                        OR pos > MAX(pos + {k - 1}) OVER w_prev + 1
                      THEN 1 ELSE 0 END AS is_new
          FROM dh
          WINDOW w_prev AS (PARTITION BY __id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        spans AS (
          SELECT __id, span_id, MIN(pos) AS s, MAX(pos) + {k - 1} AS e
          FROM (SELECT __id, pos,
                       SUM(is_new) OVER (PARTITION BY __id ORDER BY pos
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS span_id
                FROM marked)
          GROUP BY __id, span_id
        ),
        merged AS (
          SELECT __id, CAST(size(__ws) AS BIGINT) AS n_tokens,
                 CAST(0 AS BIGINT) AS one_span, CAST(0 AS BIGINT) AS span_toks
          FROM base
          UNION ALL
          SELECT __id, CAST(0 AS BIGINT), CAST(1 AS BIGINT),
                 CAST(e - s + 1 AS BIGINT)
          FROM spans
        )
        SELECT __id AS `{id_col}`,
               MAX(n_tokens) AS n_tokens,
               CAST(SUM(one_span) AS BIGINT) AS n_spans,
               CAST(SUM(span_toks) AS BIGINT) AS dup_tokens,
               CASE WHEN MAX(n_tokens) > 0
                    THEN CAST(SUM(span_toks) AS DOUBLE)
                         / CAST(MAX(n_tokens) AS DOUBLE)
                    ELSE 0.0 END AS dup_frac
        FROM merged GROUP BY __id
        """,
        docs=docs,
    )


# ---------------------------------------------------------------------------
# C4-style line-level quality filtering
# ---------------------------------------------------------------------------


def line_quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
) -> DataFrame:
    """C4's line-level cleaning rules (Raffel et al. 2020 §2.2), applied
    per document: keep only lines that (a) contain at least
    ``min_words`` whitespace words, (b) end in terminal punctuation
    (``. ! ? "``), and (c) do not contain the boilerplate markers
    'javascript' or 'cookie' (case-insensitive). The surviving lines
    reassemble in order.

    Scale shape: pure per-row higher-order functions (split → filter
    lambda → array_join) — zero shuffle, whole-stage codegen,
    embarrassingly parallel at any corpus size. The predicates are
    restricted to regex/string syntax that evaluates identically in
    Java regex (Spark) and RE2 (DuckDB), so the oracle replays the
    filter character-for-character.

    Output: (id_col, clean_text, n_lines, n_kept, kept_frac).
    """
    lines = F.split(F.col(text_col), "\n")

    def keep(line: Column) -> Column:
        t = F.trim(line)
        wc = F.size(F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0))
        return (
            (wc >= min_words)
            & t.rlike(r'[.!?"]$')
            & ~F.lower(t).contains("javascript")
            & ~F.lower(t).contains("cookie")
        )

    kept = F.filter(lines, keep)
    return docs.select(
        F.col(id_col),
        F.array_join(F.transform(kept, F.trim), "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.when(
            F.size(lines) > 0,
            F.size(kept).cast("double") / F.size(lines).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("kept_frac"),
    )


# ---------------------------------------------------------------------------
# Corpus divergence (KL over hashed unigram buckets)
# ---------------------------------------------------------------------------


def unigram_kl(
    docs: DataFrame,
    in_a: Column,
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """KL divergence KL(A ‖ B) between two corpus slices' unigram
    distributions over a fixed hashed-bucket space with add-1 smoothing
    — the drift/mixture-shift monitor for a training mix (same model
    family as the DSIR scorer, collapsed to one scalar):

        KL = Σ_b p_A(b) · ln(p_A(b) / p_B(b)),   p(b) = (c_b+1)/(T+|B|)

    Scale shape: tokens hash to ``buckets`` ids narrowly; ONE map-side-
    combinable aggregate produces both slices' bucket counts
    (conditional sums); everything after runs on the ≤ ``buckets``-row
    model table. The corpus is scanned once and shuffled never (the
    bucket aggregate's key space is bounded, so the partial aggregates
    collapse to ``buckets`` rows per task before the exchange).

    Determinism: each bucket's ln-ratio quantizes to integer micro-nats
    and weights by the exact integer count c_A(b); the final division
    happens once in double — bit-stable across engines and partition
    orders.

    Output: one row (kl double, n_tokens_a, n_tokens_b).
    """
    from ..functions.hashing import md5_long

    toks = docs.select(
        in_a.alias("__a"),
        F.expr(f"explode({words_expr(f'lower(`{text_col}`)')})").alias("__w"),
    )
    counts = toks.select((md5_long(F.col("__w")) % buckets).alias("b"), "__a").groupBy(
        "b"
    ).agg(
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("__a"), 0).otherwise(1)).alias("cb"),
    )
    tots = counts.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    bd = float(buckets)
    # p_A/p_B = (ca+1)(tb+|B|) / ((cb+1)(ta+|B|)) — one ln of a ratio of
    # IEEE-exact doubles (products of int64-exact values)
    num = (F.col("ca") + 1).cast("double") * (F.col("tb").cast("double") + F.lit(bd))
    den = (F.col("cb") + 1).cast("double") * (F.col("ta").cast("double") + F.lit(bd))
    terms = counts.join(F.broadcast(tots)).select(
        "ta",
        "tb",
        ((F.col("ca") + 1) * F.floor(F.log(num / den) * F.lit(1e6)).cast("long")).alias(
            "t_u"
        ),
    )
    return terms.groupBy("ta", "tb").agg(F.sum("t_u").alias("kl_u")).select(
        (
            F.col("kl_u").cast("double")
            / F.lit(1e6)
            / (F.col("ta").cast("double") + F.lit(bd))
        ).alias("kl"),
        F.col("ta").cast("long").alias("n_tokens_a"),
        F.col("tb").cast("long").alias("n_tokens_b"),
    )


def contamination_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Span-level benchmark decontamination: WHERE exactly a training
    document overlaps the evaluation set. Positions whose word
    ``k``-gram appears anywhere in the eval corpus merge into maximal
    spans (the ``duplicate_spans`` interval algebra) — the output drives
    surgical span excision instead of whole-document dropping, the
    fix-grained upgrade of the GPT-3 appendix-C doc-level filter.

    Scale shape: the eval gram dictionary is benchmark-sized →
    broadcast; the train side is ONE narrow posexplode + broadcast hash
    join (the corpus never shuffles on gram), then the two doc-keyed
    span windows. Strictly cheaper than ``duplicate_spans`` (no
    corpus-wide gram count).

    Output: one row per contaminated span —
    (id_col, span_id, span_start, span_end, span_tokens).
    """
    # lowercased word arrays factored into their own projections (r11):
    # one lower()+regex-split per row instead of one per gram-builder
    # reference (HOFs are CodegenFallback)
    hits = train.selectExpr(
        f"`{id_col}` AS __id",
        f"{words_expr(f'lower(`{text_col}`)')} AS __toks",
    ).selectExpr(
        "__id",
        f"posexplode({word_ngrams_arr_expr('`__toks`', k)}) AS (pos, gram)",
    )
    eval_grams = eval_df.selectExpr(
        f"{words_expr(f'lower(`{text_col}`)')} AS __toks"
    ).selectExpr(
        f"explode(array_distinct({word_ngrams_arr_expr('`__toks`', k)})) AS gram"
    ).distinct()
    dh = hits.join(F.broadcast(eval_grams), "gram").select("__id", "pos")
    return _merge_hit_spans(dh, k).select(
        F.col("__id").alias(id_col),
        F.col("span_id").cast("long").alias("span_id"),
        F.col("s").cast("long").alias("span_start"),
        F.col("e").cast("long").alias("span_end"),
        (F.col("e") - F.col("s") + 1).cast("long").alias("span_tokens"),
    )


def source_overlap_matrix(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """Exact pairwise content overlap between corpus sources: Jaccard
    similarity of each source pair's DISTINCT word n-gram sets — the
    governance matrix that catches mirrored feeds, re-crawled domains,
    and licensing duplicates BEFORE per-document dedup spends compute on
    them.

    Scale shape: the corpus reduces to DISTINCT (gram, source) rows
    (map-side combinable); each gram carries its source SET (bounded by
    the source count, tens not millions) and explodes to its source
    PAIRS — O(|sources|²) per gram worst case but sources are bounded —
    then one pair-key count. Per-source distinct-gram totals come from
    the same reduced stream. No broadcast of anything corpus-sized.

    Output: (source_a, source_b, n_common, n_a, n_b, jaccard) for a<b.
    """
    # lowercased word array factored into its own projection (r11): one
    # lower()+regex-split per row instead of one per gram-builder
    # reference (HOFs are CodegenFallback)
    gs = docs.selectExpr(
        f"`{source_col}` AS src",
        f"{words_expr(f'lower(`{text_col}`)')} AS __toks",
    ).selectExpr(
        "src",
        f"explode(array_distinct({word_ngrams_arr_expr('`__toks`', ngram)})) AS gram",
    ).distinct()
    totals = gs.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    sets = gs.groupBy("gram").agg(F.array_sort(F.collect_set("src")).alias("srcs"))
    pairs = (
        sets.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("srcs"),
                            lambda a: F.transform(
                                F.col("srcs"),
                                lambda b: F.struct(a.alias("a"), b.alias("b")),
                            ),
                        )
                    ),
                    lambda p: p["a"] < p["b"],
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ta = totals.select(F.col("src").alias("source_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("src").alias("source_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )
