"""TF-IDF term ranking over a document corpus (north-star text
analysis): per-document top terms by tf·idf, all set-based.

Pipeline: explode words → (doc, term) tf counts → term document
frequencies (one groupBy on term — the only corpus-wide aggregate,
map-side combinable) → smooth idf = ln((N+1)/(df+1)) + 1 (sklearn's
formula) → per-doc rank window. The term-df side is vocabulary-sized —
billions of distinct tokens on web text, so it hash-joins shuffled on
the term key (never broadcasts); the per-partition vocabulary slice is
the hash-map build side.

tf·idf is rounded to 6 decimals at the boundary: ln() is the only libm
touchpoint and engines may differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.psql import psql
from pyspark.sql.functions import broadcast

from ..functions.textstats import words, words_expr


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
    # the df table is VOCAB-sized (billions of distinct tokens on web
    # text) — SHUFFLE_HASH, never broadcast (100x plan audit); the
    # vocab partition slice builds the hash map, no sorts
    scored = terms.join(dfreq.hint("shuffle_hash"), "term").withColumn(
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


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    size: int = 1000,
) -> DataFrame:
    """Frequency-ranked word vocabulary: top ``size`` words by global
    count, ids assigned in (count DESC, word ASC) order — fully
    deterministic, so retrained vocabularies are reproducible. One
    explode + map-side-combinable word count, then a top-k rank over
    the (small) distinct-word table.

    Output: (word, token_id) with token_id in [0, size)."""
    from pyspark.sql import Window

    from ..functions.textstats import words, words_expr

    counts = (
        docs.select(F.explode(words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Top-k FIRST (TakeOrderedAndProject: per-partition heaps of size
    # `size`, no global sort), THEN rank inside the <=size survivors.
    # The naive shape — row_number over the FULL distinct-word table
    # with the size filter applied after — funnels the entire corpus
    # vocabulary through one reducer: at web scale the distinct-token
    # table is billions of junk tokens, and InferWindowGroupLimit
    # cannot rescue a predicate on row_number()-1 (rank arithmetic).
    # Rank order IS the limit order, so output is bit-identical.
    topk = counts.orderBy(F.desc("cnt"), F.col("word")).limit(size)
    w = Window.orderBy(F.desc("cnt"), F.col("word"))
    return (
        topk.withColumn("token_id", F.row_number().over(w) - 1)
        .select("word", "token_id")
    )


def tokenize(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_id: int = -1,
) -> DataFrame:
    """Vocabulary tokenization — the corpus→token-id step before
    packing/training: explode words in position order, broadcast-join
    the vocabulary (vocab is model-sized, always broadcastable), emit
    one row per token with its position. Out-of-vocabulary words get
    ``unk_id``. The corpus shuffles once on (doc, position) only if the
    caller re-aggregates to arrays; this per-token layout is the one
    ``sequence_pack`` and loss-masking consume directly.

    Output: (``id_col``, pos, word, token_id)."""
    from pyspark.sql.functions import broadcast

    from ..functions.textstats import words, words_expr

    exploded = docs.select(
        F.col(id_col), F.posexplode(words(text_col)).alias("pos", "word")
    )
    return exploded.join(broadcast(vocab), "word", "left").select(
        F.col(id_col),
        "pos",
        "word",
        F.coalesce(F.col("token_id"), F.lit(unk_id)).cast("long").alias("token_id"),
    )


def cosine_similar_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """All-pairs sparse cosine similarity over term-frequency vectors via
    an inverted-index join (the Bayardo/WHIMP all-pairs-similarity shape)
    — the token-level complement to set-based n-gram Jaccard: weighted by
    occurrence counts, robust to word order, and the standard "same
    article, different boilerplate" detector.

        cos(a,b) = Σ_t tf_a(t)·tf_b(t) / (‖a‖·‖b‖)

    Physical plan: (doc, term, tf) rows self-join on the term — each term
    contributes df² pair fragments, so total cost is Σ_t df(t)², NOT n².
    ``max_df`` is the classic all-pairs prune: terms present in more than
    ``max_df`` documents (stopwords — precisely the terms that carry no
    similarity signal but dominate Σ df²) are dropped from BOTH the dot
    products and the norms, so the score stays a true cosine in the
    pruned term space. At corpus scale always set it (√corpus is a sound
    default); it is the same viral-key guard as LSH's ``max_bucket``.

    Determinism: dot products and squared norms are exact 64-bit integer
    sums of tf products; the final cosine uses only IEEE-exact ops
    (×, ÷, sqrt are correctly rounded by the standard, unlike libm
    transcendentals), so the double — and the threshold compare — is
    bit-identical on every engine and partitioning.

    Output: (id_a, id_b, dot, cos) with id_a < id_b, cos ≥ threshold."""
    from .prefixsum import _pin

    # the (doc, term, tf) table feeds FOUR consumers (df counts, norms,
    # both join sides); Spark has no cross-branch common-subplan reuse,
    # so pin it — MEMORY_AND_DISK persist, computed once during the
    # first-touching stage, spills instead of OOM at corpus scale
    # (measured 2x end-to-end on this operator)
    terms = _pin(doc_terms(docs, id_col, text_col))
    if max_df is not None:
        dfreq = term_doc_freq(terms, id_col)
        terms = _pin(
            terms.join(
                dfreq.filter(F.col("df") <= max_df).select("term").hint("shuffle_hash"),
                "term",
            )
        )
    # the whole tail as ONE parameterized parse (same plan: inverted-
    # index self-join, norm join-backs pinned to SHUFFLE_HASH — the
    # doc-cardinality norms table must never broadcast off its lying
    # post-aggregate estimate; the Column chain costs ~40 py4j calls)
    return psql(
        f"""
        WITH dots AS (
          SELECT a.`{id_col}` AS id_a, b.`{id_col}` AS id_b,
                 SUM(a.tf * b.tf) AS dot
          FROM {{terms}} a JOIN {{terms}} b
            ON a.term = b.term AND a.`{id_col}` < b.`{id_col}`
          GROUP BY a.`{id_col}`, b.`{id_col}`
        ),
        norms AS (
          SELECT `{id_col}` AS id, SUM(tf * tf) AS n2 FROM {{terms}} GROUP BY `{id_col}`
        )
        SELECT id_a, id_b, dot, cos FROM (
          SELECT /*+ SHUFFLE_HASH(na, nb) */ id_a, id_b, dot,
                 CAST(dot AS DOUBLE)
                   / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))) AS cos
          FROM dots JOIN norms na ON na.id = id_a
                    JOIN norms nb ON nb.id = id_b)
        WHERE cos >= {float(threshold)!r}
        """,
        terms=terms,
    )


def trending_terms(
    docs: DataFrame,
    period: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = 10,
    min_count: int = 3,
) -> DataFrame:
    """Week-over-week term momentum — the "what changed in this crawl
    slice" report: per period, term occurrence counts; momentum of term
    t in period p is

        (cnt_p − cnt_{p−1}) / (cnt_{p−1} + 1)

    (+1-smoothed so new terms rank by absolute growth instead of ∞).
    Top movers per period by (momentum DESC, term) — rising boilerplate,
    spam bursts and topic shifts surface before any quality metric moves.

    Shape: one explode+groupBy on (period, term) — map-side combined —
    then a self-join on the term at adjacent periods (equi-join on
    (term, period−1)) and a per-period top-k window over candidate
    movers only (terms with cnt ≥ min_count — the window input is
    filtered before ranking). Momentum is a fixed-order rational of two
    int64 counts: engine-bit-stable.

    Output: (period, term, cnt, prev_cnt, momentum, rank ≤ top)."""
    terms = (
        docs.select(period.alias("period"), F.explode(words(text_col)).alias("term"))
        .withColumn("term", F.lower(F.col("term")))
        .groupBy("period", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    prev = terms.select(
        (F.col("period") + 1).alias("period"),
        F.col("term"),
        F.col("cnt").alias("prev_cnt"),
    )
    from pyspark.sql import Window

    j = (
        terms.join(prev.hint("shuffle_hash"), ["period", "term"], "left")
        .withColumn("prev_cnt", F.coalesce(F.col("prev_cnt"), F.lit(0)))
        .filter(F.col("cnt") >= min_count)
        .withColumn(
            "momentum",
            (F.col("cnt") - F.col("prev_cnt")).cast("double")
            / (F.col("prev_cnt") + F.lit(1)).cast("double"),
        )
    )
    w = Window.partitionBy("period").orderBy(F.desc("momentum"), F.col("term"))
    return (
        j.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top)
        .select("period", "term", "cnt", "prev_cnt", "momentum", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval — the lexical ranker that completes the
    hybrid stack (dense ANN + `rrf_fuse`):

        score(d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)     (Lucene form)

    Physical shape: (doc, term, tf) rows filtered to the query terms at
    the scan (an IN over a literal list — the inverted-index probe), doc
    lengths from one groupBy, query-term dfs from a broadcast-size
    aggregate; scoring touches only docs containing ≥1 query term.

    Determinism: ln() is libm (ulp-divergent across engines), so each
    term contribution quantizes to integer micro-units
    (``floor(c·1e6)``) before the per-doc sum — the same absorb-the-ulp
    device as `top_terms`' 6-dp rounding, and the sum itself becomes
    exact int64. Output: (id, score, rank ≤ k), ties broken by id."""
    from .prefixsum import _pin

    terms = _pin(doc_terms(docs, id_col, text_col))
    dl = terms.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    tot = dl.agg(F.sum("dl").alias("toktot"), F.count(F.lit(1)).alias("n_docs"))
    qt = [t.lower() for t in query_terms]
    qterms = terms.filter(F.col("term").isin(qt))
    dfreq = qterms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return _bm25_rank(qterms, dfreq, dl, tot, id_col, k, k1, b)


def _bm25_rank(
    qterms: DataFrame,
    dfreq: DataFrame,
    dl: DataFrame | None,
    tot: DataFrame,
    id_col: str,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared BM25 scoring tail (inline `bm25_topk` and the persisted
    `query_bm25_index` MUST produce identical rankings, so they share
    this code path): Lucene idf, micro-unit quantized contributions,
    top-k after limit, ties broken by id.

    ``dl=None`` means ``qterms`` already carries the per-doc length as a
    ``dl`` column (the denormalized index layout) — no doc-length join at
    all. When a join IS needed (the inline path, where dl is a corpus-
    sized post-aggregate whose size estimate lies small), it is
    SHUFFLE_HASH: broadcast would materialize every doc length on the
    driver."""
    from pyspark.sql import Window

    scored = qterms.join(broadcast(dfreq), "term")
    if dl is not None:
        scored = scored.join(dl.hint("shuffle_hash"), id_col)
    scored = scored.join(broadcast(tot))
    avgdl = F.col("toktot").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    contrib_u = F.floor(idf * tfn * F.lit(1e6)).cast("long")
    agg = scored.groupBy(id_col).agg(F.sum(contrib_u).alias("score_u"))
    w = Window.orderBy(F.desc("score_u"), F.col(id_col))
    return (
        agg.orderBy(F.desc("score_u"), F.col(id_col))
        .limit(k)
        .withColumn("score", F.col("score_u").cast("double") / F.lit(1e6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(id_col, "score", "rank")
    )


def term_bucket(term: F.Column, n_buckets: int) -> F.Column:
    """Partition key for the persisted inverted index: 60-bit md5 of the
    term mod ``n_buckets`` — portable (Python replays it driver-side to
    compute which partitions a query probes, so pruning never depends on
    a Spark-internal hash)."""
    from ..functions.hashing import md5_long

    return (md5_long(term) % n_buckets).cast("int")


def _py_term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side replay of :func:`term_bucket` (same md5-60bit mod)."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n_buckets


def _comp(path: str, name: str) -> str:
    """Resolve an index component directory, following the manifest
    pointer when the component is manifest-managed (``object_store_safe``
    builds) — a no-op for plain layouts."""
    import os

    from ..sources.layout import current_path

    return current_path(os.path.join(path, name))


def build_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    object_store_safe: bool = False,
) -> None:
    """Build-once inverted-index layout for BM25 serve-many (the NS76
    persisted-IVF pattern applied to lexical retrieval — the inline
    ``bm25_topk`` re-derives (doc, term, tf) from raw text on EVERY
    query, which is one full corpus tokenization per query at 100 TB):

    - ``postings/`` — (term, doc_id, tf, dl) parquet, partitioned by
      ``term_bucket = md5_60bit(term) % n_buckets``: a query touches only
      its terms' bucket partitions (PartitionFilters, plan-asserted).
      ``dl`` (the posting doc's length) is DENORMALIZED into each row —
      the Lucene-norms device — so the serve path never joins the
      corpus-sized doc-length table: one long per posting buys a probe
      plan whose only input is the probed buckets.
    - ``doclen/``   — (doc_id, dl) sidecar (back-compat + introspection;
      the probe reads it only for pre-denormalization layouts).
    - ``params/``   — (n_docs, toktot, n_buckets): the corpus constants
      every scoring formula needs, collected once at build time.

    ``n_buckets`` sizes partitions, not correctness: at corpus scale set
    it so each bucket is a few hundred MB (vocabulary hashes uniformly —
    only stopword terms skew WITHIN a bucket, and those rows are exactly
    what a query's ``term IN`` filter discards at the scan).

    ``object_store_safe=True`` lays every component out as a
    manifest-managed generation table (``sources.layout``): future
    full-table replaces (params merges, compaction) swap a one-line
    pointer file instead of renaming directories — atomic on S3-class
    stores, where rename is copy+delete. Probes and appends resolve
    components through the pointer transparently."""
    import os

    from pyspark.sql import Window

    from ..sources.layout import manifest_init
    from .prefixsum import _pin

    terms = _pin(doc_terms(docs, id_col, text_col))
    post = (
        # denormalize dl with ONE doc-keyed window (hash exchange on the
        # doc id, whole-partition sum) — measurably cheaper than the
        # aggregate + join-back, which pays the same doc-keyed exchange
        # TWICE plus the join (2x wall in the sf0.1 A/B, identical rows)
        terms.withColumn("dl", F.sum("tf").over(Window.partitionBy(id_col)))
        .withColumn("term_bucket", term_bucket(F.col("term"), n_buckets))
        .repartition("term_bucket")
    )
    dl = terms.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    tot_df = lambda: dl.agg(  # noqa: E731 — tiny local thunk
        F.sum("dl").cast("long").alias("toktot"), F.count(F.lit(1)).alias("n_docs")
    ).collect()[0]
    if object_store_safe:
        manifest_init(post, os.path.join(path, "postings"), ["term_bucket"])
        manifest_init(dl, os.path.join(path, "doclen"))
        tot = tot_df()
        # params last: a crashed build leaves no readable index, never a
        # wrong-constant one (same crash contract as ann_index)
        manifest_init(
            docs.sparkSession.createDataFrame(
                [(tot.n_docs, tot.toktot, n_buckets)],
                "n_docs long, toktot long, n_buckets int",
            ),
            os.path.join(path, "params"),
        )
        return
    post.write.mode("overwrite").partitionBy("term_bucket").parquet(
        os.path.join(path, "postings")
    )
    dl.write.mode("overwrite").parquet(os.path.join(path, "doclen"))
    # params last: a crashed build leaves no readable index, never a
    # wrong-constant one (same crash contract as ann_index)
    tot = tot_df()
    docs.sparkSession.createDataFrame(
        [(tot.n_docs, tot.toktot, n_buckets)],
        "n_docs long, toktot long, n_buckets int",
    ).write.mode("overwrite").parquet(os.path.join(path, "params"))


def add_to_bm25_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental maintenance for a ``build_bm25_index`` layout — the
    ``add_to_ivf_index`` pattern applied to lexical retrieval: a daily
    document drop appends into the index instead of forcing a full
    corpus re-tokenization.

    Every index constituent is mergeable, so NO existing file is
    rewritten: postings for the new docs append as new files inside
    their term-bucket partition directories (same portable md5 bucket
    function, read from ``params`` so the layout never drifts); doclen
    rows append; and the corpus constants merge associatively
    (N' = N + N_new, toktot' = toktot + toktot_new). Document
    frequencies need no sidecar at all — ``query_bm25_index`` derives
    df from the pruned postings slice at query time, so appended
    postings update df by construction. Scores after an append are
    therefore EXACTLY equal to a from-scratch rebuild over the union
    corpus (lifecycle-tested).

    Caller contract (same as the IVF append): new doc ids must be new —
    re-adding an id double-counts its postings. ``params`` updates LAST
    via atomic replace, so a crashed append under-counts (new postings
    visible, old constants) rather than phantom-counting.

    Single-appender contract, ENFORCED (r09): the whole append runs
    under the index root's writer lease — a second concurrent appender
    raises ``LeaseHeld``. Interleaved appends are NOT commutative: the
    params update is a read-modify-write (one increment would be
    silently lost) and two jobs appending into one directory race on
    the shared ``_temporary`` staging dir (the first commit's cleanup
    can delete the second's staged files)."""
    import os

    from ..sources.layout import _writer_lease

    spark = new_docs.sparkSession
    params_path = os.path.join(path, "params")
    with _writer_lease(path) as lease:
        _add_to_bm25_index_locked(
            new_docs, path, id_col, text_col, spark, params_path, lease
        )


def _add_to_bm25_index_locked(
    new_docs, path, id_col, text_col, spark, params_path, lease=None
):
    from .prefixsum import _pin
    from .upsert import replace_parquet

    [p] = spark.read.parquet(_comp(path, "params")).collect()
    if "__max_batch_id" in p.asDict():
        # streaming-maintained layout: postings live one level deeper
        # (term_bucket/__batch) — appending at term_bucket depth would
        # mix partition depths (breaking discovery on the next read),
        # and the params swap below would drop the exactly-once marker
        raise ValueError(
            "add_to_bm25_index: index at %r is streaming-maintained "
            "(params carries __max_batch_id); use "
            "streaming.jobs.foreach_batch_bm25_append to fold new "
            "documents into it" % path
        )
    terms = _pin(doc_terms(new_docs, id_col, text_col))
    dl = terms.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # match the EXISTING postings layout: appending dl-carrying files
    # into a pre-denormalization index would mix schemas — readers that
    # sample a new file's schema would see the old rows' dl as NULL and
    # score them silently wrong. Old layout keeps appending old-shape
    # rows (the probe's doclen-sidecar fallback stays correct).
    denormalized = "dl" in spark.read.parquet(_comp(path, "postings")).columns
    if denormalized:
        # a doc's dl depends only on its own text, so the batch-local
        # window denormalizes exactly like the full build's would
        from pyspark.sql import Window

        post = terms.withColumn("dl", F.sum("tf").over(Window.partitionBy(id_col)))
    else:
        post = terms
    # ownership check BEFORE the first irreversible commit (ADVICE r09
    # medium): if the refresher stalled past the TTL and a second writer
    # broke the lease, committing here would interleave two appends'
    # read-modify-write params swaps — the exact lost-increment
    # corruption the lease exists to prevent. Fail loudly instead.
    if lease is not None:
        lease.verify()
    (
        post.withColumn("term_bucket", term_bucket(F.col("term"), p.n_buckets))
        .repartition("term_bucket")
        .write.mode("append")
        .partitionBy("term_bucket")
        .parquet(_comp(path, "postings"))  # appends land in the live generation
    )
    dl.write.mode("append").parquet(_comp(path, "doclen"))
    tot = dl.agg(
        F.sum("dl").cast("long").alias("toktot"), F.count(F.lit(1)).alias("n_docs")
    ).collect()[0]
    if lease is not None:
        lease.verify()  # and again before the params pointer swap
    replace_parquet(
        spark.createDataFrame(
            [(p.n_docs + tot.n_docs, p.toktot + (tot.toktot or 0), p.n_buckets)],
            "n_docs long, toktot long, n_buckets int",
        ),
        params_path,
    )


def query_bm25_index(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Partition-pruned BM25 probe against a ``build_bm25_index`` layout:
    the driver computes the query terms' bucket ids (portable md5 replay),
    the postings scan reads ONLY those partitions (term IN pushes to the
    row groups inside them), document frequencies come from the pruned
    slice, and the scoring tail is byte-identical to ``bm25_topk`` —
    identical rankings by construction, minus the per-query corpus
    tokenization."""
    import os

    [p] = spark.read.parquet(_comp(path, "params")).collect()
    qt = sorted({t.lower() for t in query_terms})
    buckets = sorted({_py_term_bucket(t, p.n_buckets) for t in qt})
    postings = spark.read.parquet(_comp(path, "postings")).filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(qt)
    )
    if "dl" in postings.columns:
        # denormalized layout: the probe's ONLY input is the probed
        # buckets — no corpus-sized doc-length join at serve time
        qterms = postings.select(id_col, "term", "tf", "dl")
        dl = None
    else:
        # pre-denormalization layout (back-compat): join the sidecar
        qterms = postings.select(id_col, "term", "tf")
        dl = spark.read.parquet(_comp(path, "doclen"))
    dfreq = qterms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tot = spark.createDataFrame(
        [(p.toktot, p.n_docs)], "toktot long, n_docs long"
    )
    return _bm25_rank(qterms, dfreq, dl, tot, id_col, k, k1, b)


def hashed_tf_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
) -> DataFrame:
    """Hashing-trick document vectorization (the HashingTF / Weinberger
    2009 feature-hashing recipe): map tokens into a fixed ``dim``-sized
    bucket space by the portable md5 hash, count term frequencies per
    (doc, bucket), and L2-normalize per document — the vocabulary-free
    featurizer that turns a 100 TB text corpus into sparse vectors with
    NO global vocabulary build, no broadcast state, and a memory bound
    chosen up front by ``dim``.

    Scale shape: ONE (doc, bucket) shuffle with map-side combine (the
    DSIR layout); the L2 norm is a doc-keyed window over the already-
    combined rows — no second aggregate pass, no global window.
    Determinism: tf counts are exact integers, the norm is one sqrt of
    an exact integer sum, the weight one IEEE division — bit-stable.

    Output: sparse rows (id_col, bucket, tf, weight), only non-zero
    buckets.
    """
    from pyspark.sql import Window

    from ..functions.textstats import words, words_expr

    tf = (
        docs.select(
            F.col(id_col),
            F.expr(f"explode({words_expr(f'lower(`{text_col}`)')})").alias("__w"),
        )
        .select(id_col, term_bucket(F.col("__w"), dim).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy(id_col)
    return tf.select(
        F.col(id_col),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("tf").cast("long").alias("tf"),
        (
            F.col("tf").cast("double")
            / F.sqrt(F.sum(F.col("tf") * F.col("tf")).over(w).cast("double"))
        ).alias("weight"),
    )


def vocab_coverage(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-coverage / OOV-rate report — the check you run before
    committing a tokenizer vocabulary to a training run: per document,
    how many tokens the vocabulary covers and the OOV fraction a small
    vocab would map to <unk> (high corpus-wide OOV = retrain the vocab,
    per-source OOV spikes = a domain the vocab never saw).

    Scale shape: rides the ``tokenize`` layout — narrow posexplode +
    broadcast vocab join (vocab is model-sized by construction), then a
    map-side-combinable per-doc count. The corpus shuffles once on the
    doc key.

    Output: (id_col, n_tokens, n_oov, oov_frac) for docs with ≥1 token.
    """
    toks = tokenize(docs, vocab, id_col, text_col, unk_id=-1)
    return toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum((F.col("token_id") == -1).cast("long")).cast("long").alias("n_oov"),
        (
            F.sum((F.col("token_id") == -1).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("oov_frac"),
    )


def zipf_slope(
    df: DataFrame,
    group_col: str,
    text_col: str,
    max_rank: int = 200,
) -> DataFrame:
    """Zipf rank-frequency slope per group — the corpus-naturalness
    monitor: natural language sits near slope −1 on log(freq) vs
    log(rank); templated/generated/boilerplate feeds bend the head of
    the curve (flat → mass-duplicated tokens, steep → tiny vocab).

    Fit is the closed-form OLS slope over the top ``max_rank`` ranks
    (the standard head fit — the tail is noise and unbounded). Logs
    quantize to integer micro-nats (the house device) BEFORE the moment
    sums, so with rank ≤ max_rank every Σ term fits int64 exactly and
    the slope is a ratio of two engine-identical integers; the only
    float op is the final division of identical operands.

    Scale shape: one map-side-combined (group, word) count, a
    group-keyed top-``max_rank`` window (AQE skew-splittable), then one
    tiny moment aggregate per group. Output: (group_col, n_ranks,
    slope_num, slope_den, slope) with slope = slope_num/slope_den.
    """
    from pyspark.sql import Window

    wf = (
        df.select(F.col(group_col).alias("g"), F.explode(words(text_col)).alias("w"))
        .groupBy("g", "w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    win = Window.partitionBy("g").orderBy(F.desc("freq"), F.asc("w"))
    ranked = (
        wf.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= max_rank)
        .select(
            "g",
            F.floor(F.log(F.col("rank").cast("double")) * F.lit(1e6))
            .cast("long")
            .alias("x"),
            F.floor(F.log(F.col("freq").cast("double")) * F.lit(1e6))
            .cast("long")
            .alias("y"),
        )
    )
    m = ranked.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_ranks"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        (num.cast("double") / den.cast("double")).alias("slope"),
    )


def compact_bm25_index(spark, path: str) -> int:
    """Maintenance pass for a streaming-maintained BM25 index
    (``streaming.jobs.foreach_batch_bm25_append``): every micro-batch
    leaves one file set per touched (term_bucket, __batch) partition, so
    a long-running ingest accumulates thousands of small files — at
    100 TB the probe's task-per-file overhead and the manifest pressure
    dominate the actual read. Collapses every batch generation into ONE
    per term bucket (postings and doclen), KEEPING the streaming layout
    (the ``__batch`` level carries the current marker value) so
    ingestion continues afterwards with higher batch ids.

    Same temp-write + rename-swap discipline as ``replace_parquet``: the
    compacted tree is fully durable before the swap, so a probe never
    observes a partial index and a crash leaves a recoverable
    ``.__old__``. ``params`` is untouched — compaction moves rows, not
    counts, and the exactly-once marker stays valid. Run it between
    ingests (the standard maintenance-window contract, same as
    ``sources.layout.compact``). Returns the postings parquet-file count
    after compaction.

    Single-writer contract, ENFORCED (r10): compaction holds the index
    ROOT's writer lease — the same lease ``add_to_bm25_index`` and the
    streaming appender take — so an appender arriving mid-compaction
    raises ``LeaseHeld`` loudly and retries after, instead of appending
    files into a postings tree the rename-swap is about to discard."""
    import os
    import shutil

    from ..sources.layout import _writer_lease

    with _writer_lease(path) as lease:
        return _compact_bm25_index_locked(spark, path, lease)


def _compact_bm25_index_locked(spark, path: str, lease=None) -> int:
    import os
    import shutil

    from .upsert import recover_swap

    [p] = spark.read.parquet(_comp(path, "params")).collect()
    if "__max_batch_id" not in p.asDict():
        raise ValueError(
            "compact_bm25_index: %r is a batch-built layout (already one "
            "generation); nothing to compact" % path
        )
    marker = int(p["__max_batch_id"])
    par = spark.sparkContext.defaultParallelism

    from ..sources.layout import current_path, is_manifest_table, manifest_replace

    def _swap_partitioned(df, base: str, parts: list) -> None:
        if is_manifest_table(base):
            # object-store-safe: new generation + one-key pointer swap
            manifest_replace(
                lambda d: df.write.mode("overwrite").partitionBy(*parts).parquet(d),
                base,
            )
            return
        tmp, old = base + ".__tmp__", base + ".__old__"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        df.write.mode("overwrite").partitionBy(*parts).parquet(tmp)
        os.rename(base, old)
        os.rename(tmp, base)
        shutil.rmtree(old, ignore_errors=True)

    postings_path = os.path.join(path, "postings")
    doclen_path = os.path.join(path, "doclen")
    # a prior compaction crashed between its two renames → no table at
    # base; the index readers don't self-repair, so repair here before
    # reading (recover_swap handles all three crash states)
    recover_swap(postings_path)
    recover_swap(doclen_path)
    # drop ORPHANED partitions (__batch > marker): a crashed ingest left
    # their files but never committed the batch to params, so the stream
    # will redeliver it — folding orphans into the durable generation
    # would make the redelivery's dynamic-overwrite double-count them
    post = (
        spark.read.parquet(current_path(postings_path))
        .filter(F.col("__batch") <= marker)
        .withColumn("__batch", F.lit(marker).cast("long"))
    )
    if lease is not None:
        lease.verify()  # root ownership before the first irreversible swap
    _swap_partitioned(
        post.repartition("term_bucket"), postings_path, ["term_bucket", "__batch"]
    )
    dl = (
        spark.read.parquet(current_path(doclen_path))
        .filter(F.col("__batch") <= marker)
        .withColumn("__batch", F.lit(marker).cast("long"))
    )
    _swap_partitioned(dl.repartition(par), doclen_path, ["__batch"])
    n = 0
    for _root, _dirs, files in os.walk(postings_path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n
