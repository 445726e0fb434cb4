"""Trained-model and novelty operators (round 3): bigram LM scoring,
batch perceptron, containment dedup, n-gram novelty — each checked
against a pure-Python oracle on small explicit corpora, plus
partitioning-invariance (the determinism the gates rely on)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _toks(t: str) -> list[str]:
    return [w for w in t.lower().split() if w]


def test_bigram_lm_matches_python_oracle(spark):
    from ubdc_airbnb_spark.operators import lm

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "dogs bark"),
        (4, "x"),  # single token: no bigrams, absent from output
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.avg_cond_p) for r in lm.score_documents(docs).collect()}

    toks = {i: _toks(t) for i, t in corpus}
    bigrams = [(w1, w2) for ws in toks.values() for w1, w2 in zip(ws, ws[1:])]
    c12: dict[tuple[str, str], int] = {}
    for bg in bigrams:
        c12[bg] = c12.get(bg, 0) + 1
    c1: dict[str, int] = {}
    for (w1, _), c in c12.items():
        c1[w1] = c1.get(w1, 0) + c
    vocab = {w for ws in toks.values() for w in ws}
    for i, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            assert i not in got
            continue
        total_ppb = sum(
            math.floor((c12[p] + 1) / (c1[p[0]] + len(vocab)) * 1e9) for p in pairs
        )
        n, avg = got[i]
        assert n == len(pairs)
        assert avg == (total_ppb / 1e9) / len(pairs)


def test_bigram_lm_partitioning_invariant(spark):
    from ubdc_airbnb_spark.operators import lm
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    a = sorted(map(tuple, lm.score_documents(docs).collect()))
    b = sorted(map(tuple, lm.score_documents(docs.repartition(13)).collect()))
    assert a == b  # exact, including the double score (integer-ppb sums)


def test_perceptron_matches_python_oracle(spark):
    from ubdc_airbnb_spark.operators import classifier
    from ubdc_airbnb_spark.functions.textstats import LANG_MARKERS

    corpus = [
        (1, "the cat and the dog of a to a", "en"),
        (2, "der hund und die katze ist das", "de"),
        (3, "le chat et la les des", "fr"),
        (4, "the quick brown fox and the hound", "en"),
        (5, "el que de los la", "es"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    got = {r.doc_id: (r.margin, r.pred_en, r.is_en) for r in classifier.classify_english(docs).collect()}

    def feats(t: str) -> list[int]:
        ws = _toks(t)
        base = [1, len(ws)]
        for lang in LANG_MARKERS:
            base.append(sum(1 for w in ws if w in LANG_MARKERS[lang]))
        return base

    X = {i: feats(t) for i, t, _ in corpus}
    Y = {i: (1 if lang == "en" else -1) for i, _, lang in corpus}
    w = [0] * 6
    for _ in range(2):
        grad = [0] * 6
        for i in X:
            margin = sum(wi * xi for wi, xi in zip(w, X[i]))
            if Y[i] * margin <= 0:
                for k in range(6):
                    grad[k] += Y[i] * X[i][k]
        w = [wi + g for wi, g in zip(w, grad)]
    for i in X:
        m = sum(wi * xi for wi, xi in zip(w, X[i]))
        assert got[i] == (m, m > 0, Y[i] > 0)


def test_containment_catches_subset_dup_jaccard_misses(spark):
    from ubdc_airbnb_spark.operators.dedup import ngram_containment_pairs, ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally different words here entirely now")],
        "doc_id long, text string",
    )
    pairs = ngram_containment_pairs(docs, "doc_id", "text", ngram=3, threshold=0.9).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    r = pairs[0]
    # every 3-gram of the short doc appears in the long one
    assert r.inter == r.min_n == len(short.split()) - 2
    assert r.containment == 1.0
    # symmetric Jaccard at the same strictness sees nothing: union is
    # dominated by the long doc
    assert (
        ngram_jaccard_pairs(docs, "doc_id", "text", ngram=3, threshold=0.9).count() == 0
    )


def test_nondyadic_threshold_no_int64_overflow(spark):
    """threshold=0.3 via float.as_integer_ratio() has den ≈ 1.8e16, so a
    pair sharing ≥512 grams overflowed inter*den in int64 and silently
    dropped out under non-ANSI Spark; the Fraction-based ratio keeps the
    products small and exact."""
    from ubdc_airbnb_spark.operators.dedup import (
        _threshold_ratio,
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    assert _threshold_ratio(0.3) == (3, 10)
    assert _threshold_ratio(0.5) == (1, 2)
    big = " ".join(f"tok{i}" for i in range(700))  # 698 shared word 3-grams
    docs = spark.createDataFrame([(1, big), (2, big)], "doc_id long, text string")
    got = ngram_containment_pairs(docs, "doc_id", "text", ngram=3, threshold=0.3).collect()
    assert [(r.id_a, r.id_b, r.containment) for r in got] == [(1, 2, 1.0)]
    assert ngram_jaccard_pairs(docs, "doc_id", "text", ngram=3, threshold=0.3).count() == 1


def test_containment_contraction_matches_naive_on_replicated_corpus(spark):
    """r07: the digest-contracted containment join must be SET-identical
    to the naive pairwise gram join on a corpus WITH exact duplicates —
    the replica-dense case whose naive form took 249 s at sf1
    (SCALE.md r07). The naive reference is built inline."""
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.functions.textstats import word_ngrams
    from ubdc_airbnb_spark.operators.dedup import (
        _threshold_ratio,
        ngram_containment_pairs,
    )
    from ubdc_airbnb_spark.sources.tables import load_table

    base = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(60)
    )
    mx = base.agg(F.max("doc_id")).first()[0] + 1
    docs = base.crossJoin(spark.range(3).withColumnRenamed("id", "__i")).select(
        (F.col("doc_id") + F.col("__i") * mx).alias("doc_id"), "text"
    )

    grams = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(word_ngrams("text", 3))).alias("gram"),
    )
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    num, den = _threshold_ratio(0.5)
    naive = (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("n_b")), "id_b")
        .withColumn("min_n", F.least("n_a", "n_b"))
        .filter(F.col("inter") * den >= F.col("min_n") * num)
    )
    want = {
        (r.id_a, r.id_b, r.inter, r.min_n, r.inter / r.min_n)
        for r in naive.collect()
    }
    got = {
        (r.id_a, r.id_b, r.inter, r.min_n, r.containment)
        for r in ngram_containment_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    }
    assert got == want
    assert want, "fixture produced no pairs — not exercising anything"


def test_containment_contraction_edge_cases(spark):
    """Degenerate inputs where the contraction branches could diverge
    from the pairwise form: empty/one-word texts (zero grams — absent
    from sizes, so NO pair even between identical copies), duplicate
    groups of 2 and 3, and a subset-dup pair across groups."""
    from ubdc_airbnb_spark.operators.dedup import ngram_containment_pairs

    short = "alpha beta gamma delta"
    longer = short + " extra words beyond the subset here"
    docs = spark.createDataFrame(
        [
            (1, short), (2, short), (3, short),   # dup group of 3
            (4, longer), (5, longer),             # dup group of 2
            (6, ""),  (7, ""),                    # zero-gram group
            (8, "one two"),                       # zero-gram singleton (n<3)
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b, r.inter, r.min_n, r.containment)
        for r in ngram_containment_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    }
    n_short = len(short.split()) - 2   # 2 grams
    n_long = len(longer.split()) - 2   # 8 grams
    want = set()
    for a, b in [(1, 2), (1, 3), (2, 3)]:          # within short group
        want.add((a, b, n_short, n_short, 1.0))
    want.add((4, 5, n_long, n_long, 1.0))          # within longer group
    for a in (1, 2, 3):                            # short contained in longer
        for b in (4, 5):
            want.add((a, b, n_short, n_short, 1.0))
    # empty/one-word docs: zero grams -> no pairs at all, even id 6-7
    assert got == want


def test_ivf_pairs_contraction_edge_cases(spark):
    """Zero-norm vectors and duplicate vector groups. r07 finding: under
    Spark 4's default ANSI mode, cosine with a zero-norm operand used to
    THROW DIVIDE_BY_ZERO — one all-zero embedding would kill the job at
    any scale. cosine now yields NULL for zero norms (fails every
    >= threshold predicate on every engine), so zero vectors are
    deterministically 'similar to nothing', including to each other."""
    from ubdc_airbnb_spark.operators import similarity

    z = [0.0] * 4
    u = [1.0, 0.0, 0.0, 0.0]
    v = [0.9, 0.1, 0.0, 0.0]  # cosine(u, v) ~ 0.994
    w = [-1.0, 0.0, 0.0, 0.0]  # cosine(u, w) = -1 (fails threshold)
    rows = [(1, u), (2, u), (3, v), (4, w), (5, z), (6, z)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, u), (1, w)], "centroid_id long, centroid_vec array<double>"
    )
    got = {
        (r.id_a, r.id_b)
        for r in similarity.ivf_threshold_pairs(
            emb, cents, threshold=0.5, probes=2
        ).collect()
    }
    # probes=2 over 2 centroids -> everyone shares both buckets, so the
    # candidate set is all pairs; verification decides. Zero-norm
    # cosines are NULL -> no pair, not even between identical zeros.
    want = {
        (1, 2),          # identical u's, cosine 1
        (1, 3), (2, 3),  # u~v
    }
    assert got == want

    comp = {
        (r.id, r.component)
        for r in similarity.embedding_components(
            emb, cents, threshold=0.5, probes=2
        ).collect()
    }
    # zero vectors are singletons (self-pair predicate NULL -> false),
    # even though 5 and 6 share a value node
    assert comp == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 6)}


def test_embedding_pair_max_group_composition(spark):
    """r08 cap parity: the contracted embedding pair emitters drop
    viral value groups (B² member-pair blowup) under max_group while
    keeping genuine near-dup pairs; the O(B) exact value pass recovers
    the dropped cluster — the embedding twin of the minhash
    max_bucket/max_group composition tests."""
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators import similarity

    u = [1.0, 0.0, 0.0, 0.0]
    v = [0.95, 0.05, 0.0, 0.0]  # cosine(u, v) ~ 0.998
    w = [0.0, 1.0, 0.0, 0.0]
    rows = [(i, u) for i in range(40)] + [(100, v), (101, v), (102, w)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, u), (1, w)], "centroid_id long, centroid_vec array<double>"
    )
    for fn in (
        lambda **kw: similarity.ivf_threshold_pairs(
            emb, cents, threshold=0.9, probes=2, **kw
        ),
        lambda **kw: similarity.rp_lsh_pairs(
            emb, num_planes=16, bands=4, threshold=0.9, dim=4, **kw
        ),
    ):
        uncapped = {(r.id_a, r.id_b) for r in fn().collect()}
        # the 40-clone cluster contributes 780 pairs + 80 u-v pairs
        assert len({p for p in uncapped if p[0] < 100}) >= 40 * 39 // 2
        capped = {(r.id_a, r.id_b) for r in fn(max_group=10).collect()}
        # viral group gone entirely; the genuine near-dup pair survives
        assert capped == {(100, 101)}
    # and the dropped cluster is exactly what the O(B) exact pass finds
    ex = (
        emb.groupBy("embedding")
        .agg(F.min("vec_id").alias("keep_id"), F.count(F.lit(1)).alias("n"))
        .filter("n > 1")
        .collect()
    )
    assert {(r.keep_id, r.n) for r in ex} == {(0, 40), (100, 2)}


def test_zero_norm_centroid_sorts_last_in_probes(spark):
    """r07 advice: Spark struct ordering is NULLS FIRST, so a bare NULL
    negcos made a zero-norm centroid everyone's TOP probe (consuming a
    probe slot corpus-wide). The coalesce-to-2.0 sentinel makes
    degenerate centroids sort strictly after every real cosine,
    matching the SQL oracle's ORDER BY cos DESC (NULLS LAST)."""
    from ubdc_airbnb_spark.operators.similarity import centroid_probes

    z = [0.0] * 4
    u = [1.0, 0.0, 0.0, 0.0]
    v = [0.0, 1.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(1, u), (2, v)], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(0, z), (1, u), (2, v)], "centroid_id long, centroid_vec array<double>"
    )
    for limit in (10_000, 0):  # inline path AND broadcast-row path
        got = {
            (r.vec_id, r.centroid_id)
            for r in centroid_probes(
                emb, cents, probes=2, inline_limit=limit
            ).collect()
        }
        # with probes=2 of 3 centroids, the zero-norm centroid 0 must
        # never appear: both real centroids beat the sentinel
        assert got == {(1, 1), (1, 2), (2, 2), (2, 1)}, (limit, got)
    # a zero-norm VECTOR has all-NULL cosines -> every probe is the
    # sentinel; tie broken by cid ascending, deterministically
    zv = spark.createDataFrame([(9, z)], "vec_id long, embedding array<double>")
    got = [
        (r.vec_id, r.centroid_id)
        for r in centroid_probes(zv, cents, probes=2).collect()
    ]
    assert got == [(9, 0), (9, 1)]


def test_ngram_novelty_first_occurrence_semantics(spark):
    from ubdc_airbnb_spark.operators.curation import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),            # grams: abc, bcd — all novel (first doc)
            (2, "a b c d"),            # exact copy -> novelty 0
            (3, "a b c x y z"),        # abc seen; bcx, cxy, xyz novel -> 3/4
            (4, "q r"),                # too short: absent
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_distinct_grams, r.n_novel, r.novelty) for r in ngram_novelty(docs, "doc_id", "text").collect()}
    assert got == {
        1: (2, 2, 1.0),
        2: (2, 0, 0.0),
        3: (4, 3, 0.75),
    }


def test_collocations_lift_oracle(spark):
    """A bound phrase (always-adjacent pair) must top free-floating
    words; lift values check against hand-computed contingency."""
    from ubdc_airbnb_spark.operators.lm import collocations

    # "san francisco" always adjacent (6x); "the" floats everywhere
    docs = spark.createDataFrame(
        [(i, "the city of san francisco is the place in san francisco bay") for i in range(3)],
        "doc_id long, text string",
    )
    out = {r.bigram: (r.c12, r.c1, r.c2, r.lift, r.rank) for r in collocations(docs, min_count=3, top=50).collect()}
    assert "san francisco" in out
    c12, c1, c2, lift, rank = out["san francisco"]
    assert (c12, c1, c2) == (6, 6, 6)
    # N = bigrams per doc (11) * 3 docs
    assert lift == (6 * 33) / (6 * 6)
    best = [bg for bg, v in out.items() if v[4] == 1]
    assert best and out[best[0]][3] == max(v[3] for v in out.values())


def test_rp_lsh_viral_near_dup_bucket_cap(spark):
    """r09 cap parity (the embedding twin of lsh_jaccard_pairs
    max_bucket): max_group only bounds EXACT-duplicate vector groups,
    so a dense cluster of DISTINCT near-identical embeddings still
    concentrates one band bucket and goes quadratic. max_bucket drops
    member-weighted-overfull buckets from pair generation; groups
    surviving in no bucket lose their within-pairs too (uncapped-join
    semantics); small genuine clusters are untouched."""
    from ubdc_airbnb_spark.operators import similarity

    # viral cluster: 6 DISTINCT near-identical values x 5 exact copies
    # each = bucket weight 30 from only 6 value nodes (member-weighted
    # capping must fire on 30, not 6)
    viral = [
        (g * 10 + c, [1.0, 1e-9 * g, 0.0, 0.0])
        for g in range(6)
        for c in range(5)
    ]
    # small genuine cluster: 3 exact copies + 1 near-dup (weight 4)
    small = [(100, [0.0, 1.0, 0.0, 0.0])] * 3 + [(103, [0.05, 0.995, 0.0, 0.0])]
    small = [(100 + i, v) for i, (_, v) in enumerate(small)]
    emb = spark.createDataFrame(
        viral + small, "vec_id long, embedding array<double>"
    )

    def run(**kw):
        return {
            (r.id_a, r.id_b)
            for r in similarity.rp_lsh_pairs(
                emb, num_planes=16, bands=4, threshold=0.9, dim=4, **kw
            ).collect()
        }

    uncapped = run()
    assert len({p for p in uncapped if p[0] < 100}) == 30 * 29 // 2
    small_pairs = {p for p in uncapped if p[0] >= 100}
    assert small_pairs == {(100, 101), (100, 102), (101, 102),
                           (100, 103), (101, 103), (102, 103)}
    capped = run(max_bucket=10)
    # viral cluster gone ENTIRELY (cross AND within: its groups survive
    # in no bucket); the small cluster is byte-identical
    assert capped == small_pairs
    # max_group alone would NOT have caught it: every viral group has
    # only 5 members
    assert run(max_group=9) == uncapped
