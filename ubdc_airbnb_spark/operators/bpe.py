"""BPE tokenizer training over a corpus (north-star: the tokenizer IS
part of the training-data pipeline) — the classic Sennrich et al. (2016)
algorithm re-expressed as Spark DataFrame algebra.

The published trick that makes this tractable at 100 TB: BPE never
iterates over the corpus — it iterates over the WORD-FREQUENCY table
(vocabulary-sized, millions of rows for a trillion-token corpus). The
corpus is touched exactly once (one tokenize + groupBy-count shuffle);
every merge iteration then runs on the word table:

  pair counts   — explode adjacent symbol pairs, groupBy sum(freq)
                  (map-side combinable, pair-key shuffle only)
  argmax        — deterministic top-1 (count desc, pair asc tiebreak),
                  a bounded driver fetch
  merge         — a greedy left-to-right fold over each word's symbol
                  array via ``aggregate`` (whole-stage codegen, no UDF)

State per iteration is one narrow (word, syms, freq) table; iterations
chain lazily and pin via localCheckpoint every few merges to keep the
lineage flat (the PageRank device, operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import words

#: end-of-word marker, per the original BPE paper
EOW = "</w>"


def word_frequencies(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(word, freq) — lowercased whitespace tokens, corpus-wide counts.
    The ONE corpus-wide pass of BPE training."""
    return (
        docs.select(F.explode(words(text_col)).alias("w"))
        .select(F.lower(F.col("w")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols(wf: DataFrame) -> DataFrame:
    """(word, syms, freq) with syms = characters + the end-of-word
    marker — the starting state of BPE training."""
    return wf.select(
        "word",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias("syms"),
        "freq",
    )


def pair_counts(state: DataFrame) -> DataFrame:
    """(left, right, cnt) — adjacent-symbol pair counts weighted by word
    frequency. ``zip_with`` over the two shifted slices keeps the pair
    generation inside codegen; the only shuffle is the pair-key groupBy.

    The slice form (r11) is single-symbol-safe: the previous
    ``transform(sequence(0, size-2), i -> (syms[i], syms[i+1]))`` shape
    crashed the stage once any word merged down to ONE symbol —
    ``sequence(0, -1)`` steps DOWNWARD in Spark, producing [0, -1], and
    ``syms[1]`` on a 1-element array throws INVALID_ARRAY_INDEX under
    ANSI mode. Frequent short words fully merge within ~a dozen rounds,
    so this was a guaranteed mid-training crash at corpus scale (found
    by the r11 plan-ratchet test's 12-merge run)."""
    n = F.size("syms")
    ln = F.greatest(n - 1, F.lit(0))
    pairs = state.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, ln),
                F.slice(F.col("syms"), 2, ln),
                lambda l, r: F.struct(l.alias("left"), r.alias("right")),
            )
        ).alias("p"),
    )
    return (
        pairs.select(F.col("p.left").alias("left"), F.col("p.right").alias("right"), "freq")
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("cnt"))
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def merge_pair(state: DataFrame, left: str, right: str, keep: tuple[str, ...] = ("word", "freq")) -> DataFrame:
    """Greedy left-to-right merge of every (left, right) adjacency into
    the concatenated symbol — the exact replacement semantics of the
    reference algorithm (an overlapping run 'a a a' with merge (a,a)
    yields ['aa','a']), as ONE ``aggregate`` fold per word, no UDF.
    ``keep`` columns pass through unchanged."""
    l, r, lr = _sql_quote(left), _sql_quote(right), _sql_quote(left + right)
    fold = f"""
    aggregate(
      syms,
      named_struct('out', cast(array() as array<string>), 'prev', cast(null as string)),
      (acc, x) -> CASE
          WHEN acc.prev IS NULL THEN named_struct('out', acc.out, 'prev', x)
          WHEN acc.prev = {l} AND x = {r}
            THEN named_struct('out', array_append(acc.out, {lr}),
                              'prev', cast(null as string))
          ELSE named_struct('out', array_append(acc.out, acc.prev), 'prev', x)
        END,
      acc -> CASE WHEN acc.prev IS NULL THEN acc.out
                  ELSE array_append(acc.out, acc.prev) END
    )"""
    return state.select(*keep, F.expr(fold).alias("syms"))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges. Returns (step, left, right, cnt) in
    merge order — the merge table IS the tokenizer artifact. Ties break
    by (left, right) lexicographically, so training is deterministic
    across partitionings and engines; stops early when no pair reaches
    ``min_count``."""
    from .iterstate import CheckpointChain

    spark = docs.sparkSession
    chain = CheckpointChain(spark)
    state = chain.step(initial_symbols(word_frequencies(docs, id_col, text_col)))
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step in range(n_merges):
            top = (
                pair_counts(state)
                .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not top or top[0].cnt < min_count:
                break
            t = top[0]
            merges.append((step, t.left, t.right, t.cnt))
            state = merge_pair(state, t.left, t.right)
            if (step + 1) % checkpoint_every == 0:
                # flatten the fold lineage; the eager step materializes
                # the new state, so the superseded checkpoint frees NOW
                # (otherwise n_merges/checkpoint_every vocab-sized RDDs
                # stay pinned until driver GC)
                state = chain.step(state)
                chain.retire(keep=1)
    finally:
        chain.close()  # output is a driver-local list: all state is dead
    return spark.createDataFrame(
        merges or [], "step int, left string, right string, cnt long"
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment every document's words with a learned merge list (applied
    in training order — BPE inference is replaying the merges). Output:
    (id_col, word, pieces array<string>) per token occurrence position
    collapsed to distinct (id, word) — narrow per-row work, no shuffle
    beyond the initial distinct."""
    from .iterstate import CheckpointChain

    toks = docs.select(
        F.col(id_col), F.explode(words(text_col)).alias("w")
    ).select(id_col, F.lower(F.col("w")).alias("word")).distinct()
    state = toks.select(
        id_col,
        "word",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias("syms"),
    )
    chain = CheckpointChain(docs.sparkSession)
    for i, (left, right) in enumerate(merges):
        state = merge_pair(state, left, right, keep=(id_col, "word"))
        if (i + 1) % 4 == 0:
            # flatten the fold lineage, freeing the superseded
            # checkpoint as soon as the new one materializes; the final
            # checkpoint stays — the returned (lazy) frame reads it
            state = chain.step(state)
            chain.retire(keep=1)
    return state.select(id_col, "word", F.col("syms").alias("pieces"))
