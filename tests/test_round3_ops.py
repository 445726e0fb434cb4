"""Round-3 operator tests: prefix-sum family auto mode, stratified
sampling, deterministic shuffle, canonical cluster resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_prefixsum_auto_picks_single_below_threshold(spark, monkeypatch):
    """auto = stats-driven physical choice: tiny input -> plain global
    window (no percentile job, no bucket column); forced/large ->
    two-pass. Results identical."""
    from ubdc_airbnb_spark.operators import prefixsum

    df = spark.createDataFrame([(i, i % 7 + 1) for i in range(100)], "id long, v long")
    single = prefixsum.partitioned_cumsum(
        df, order=[F.col("id")], value=F.col("v"), out_col="c", bucket_key=F.col("id")
    )
    # tiny input: the plan must NOT contain the bucket machinery
    assert "__rb" not in single.columns
    plan = single._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower()

    monkeypatch.setattr(prefixsum, "SINGLE_PARTITION_MAX_BYTES", -1)
    two = prefixsum.partitioned_cumsum(
        df, order=[F.col("id")], value=F.col("v"), out_col="c", bucket_key=F.col("id")
    )
    assert sorted(single.collect()) == sorted(two.collect())


def test_stratified_sample_exact_counts_and_determinism(spark):
    from ubdc_airbnb_spark.operators.sampling import stratified_sample_exact
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = stratified_sample_exact(docs, ["source"], "doc_id", 3)
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {s: min(3, n) for s, n in sizes.items()}
    # deterministic: identical keys win on a second run and after repartition
    again = stratified_sample_exact(docs.repartition(7), ["source"], "doc_id", 3)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(r["doc_id"] for r in again.collect())


def test_deterministic_shuffle_contract(spark):
    from ubdc_airbnb_spark.operators.sampling import deterministic_shuffle
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    out = deterministic_shuffle(docs, "doc_id", n_shards=4).select("doc_id", "shard", "position")
    rows = out.collect()
    assert len(rows) == docs.count()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.position)
    assert set(by_shard) <= set(range(4))
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(len(positions)))  # contiguous 0..n-1
    # stable under repartitioning (no RNG anywhere)
    again = deterministic_shuffle(docs.repartition(5), "doc_id", n_shards=4)
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, again.select("doc_id", "shard", "position").collect())
    )


def test_canonical_per_cluster_picks_best_and_counts(spark):
    from ubdc_airbnb_spark.operators.dedup import canonical_per_cluster

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "id long, component long",
    )
    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.2), (6, 0.2)],
        "doc_id long, q double",
    )
    out = {
        r.component: (r.canonical_id, r.n_members)
        for r in canonical_per_cluster(comp, docs, prefer=F.col("q")).collect()
    }
    # cluster 1: quality tie 2 vs 3 -> min id 2; singleton keeps itself;
    # cluster 5: tie 5 vs 6 -> 5
    assert out == {1: (2, 3), 4: (4, 1), 5: (5, 2)}


def test_lsh_viral_bucket_cap(spark):
    """max_bucket drops boilerplate mega-clusters from pair expansion
    (B^2 blowup) while keeping ordinary near-dup pairs; exact_duplicates
    recovers the dropped cluster in O(B)."""
    from ubdc_airbnb_spark.operators.dedup import (
        exact_duplicates,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(i, "empty page please enable javascript to continue") for i in range(40)]
    rows += [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "the quick brown fox jumps over the lazy dog today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs, "doc_id", "text", num_perm=16, ngram=3, shingle="word")

    uncapped = lsh_candidate_pairs(sigs, "doc_id", 16, 4)
    capped = lsh_candidate_pairs(sigs, "doc_id", 16, 4, max_bucket=10)
    # the 40-clone cluster contributes 780 pairs uncapped, none capped
    assert uncapped.filter(F.col("id_a") < 100).count() == 40 * 39 // 2
    assert capped.filter(F.col("id_a") < 100).count() == 0
    # the genuine near-dup pair survives the cap
    assert [(r.id_a, r.id_b) for r in capped.collect()] == [(100, 101)]
    # and the dropped cluster is exactly what the O(B) exact pass resolves
    ex = exact_duplicates(docs, "doc_id", "text").filter(F.col("n_docs") > 1).collect()
    assert len(ex) == 1 and ex[0].n_docs == 40 and ex[0].keep_id == 0


_CONTRACTION_BASE = [
    "the quick brown fox jumps over the lazy dog tonight",
    "the quick brown fox jumps over the lazy dog today",
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs right now",
    "pack my box with five dozen liquor jugs right here",
    "completely unrelated text about spark catalyst optimizer plans",
    "",      # zero grams: all-NULL signature, 0/0 jaccard edge
    "   ",   # different digest, same degenerate signature
]


def _replicated_docs(spark, replicas=3):
    rows = [
        (i * 100 + r, t)
        for i, t in enumerate(_CONTRACTION_BASE)
        for r in range(replicas)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _naive_lsh(docs, max_bucket=None):
    from ubdc_airbnb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(docs, "doc_id", "text", num_perm=16, ngram=3, shingle="word")
    return lsh_candidate_pairs(sigs, "doc_id", 16, 4, max_bucket=max_bucket)


def test_minhash_lsh_contraction_equivalence(spark):
    """r08: the digest-contracted candidate generator must be
    SET-IDENTICAL to the naive banded self-join on a replicated corpus
    (exact dups, near-dups, zero-gram docs), with and without
    max_bucket — the r07-deferral acceptance criterion."""
    from ubdc_airbnb_spark.operators.dedup import minhash_lsh_pairs

    docs = _replicated_docs(spark)
    naive = {(r.id_a, r.id_b) for r in _naive_lsh(docs).collect()}
    got = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "doc_id", "text", 16, 4).collect()
    }
    assert got == naive and len(naive) > 30
    # within-group pairs present (identical sigs share every band)
    assert (0, 1) in got and (600, 601) in got
    # zero-gram docs pair across digest groups (shared degenerate bands)
    assert (600, 700) in got

    # member-weighted max_bucket: naive bucket occupancy counts DOCS,
    # and the fox family (9 members across 3 near-dup groups) overflows
    # a cap of 8 wherever the three groups agree on a band
    for cap in (8, 2):
        naive_c = {(r.id_a, r.id_b) for r in _naive_lsh(docs, max_bucket=cap).collect()}
        got_c = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(
                docs, "doc_id", "text", 16, 4, max_bucket=cap
            ).collect()
        }
        assert got_c == naive_c, cap
    assert len(naive_c) < len(naive)


def test_lsh_jaccard_contraction_equivalence(spark):
    """r08: contracted candidates + rep-level jaccard verify vs the
    naive composition the gate ran through r07 — full-row set equality,
    both verify join strategies."""
    from ubdc_airbnb_spark.functions.textstats import word_ngrams_expr
    from ubdc_airbnb_spark.operators.dedup import lsh_jaccard_pairs

    docs = _replicated_docs(spark)

    def _naive_jaccard(pairs):
        return {
            tuple(r)
            for r in spark.sql(
                f"""
                WITH grams AS (
                  SELECT doc_id, array_distinct({word_ngrams_expr('`text`', 3)}) AS g
                  FROM {{docs}}
                ),
                scored AS (
                  SELECT p.id_a, p.id_b,
                         size(array_intersect(ga.g, gb.g)) AS inter,
                         size(ga.g) + size(gb.g)
                           - size(array_intersect(ga.g, gb.g)) AS union_n
                  FROM {{pairs}} p
                  JOIN grams ga ON ga.doc_id = p.id_a
                  JOIN grams gb ON gb.doc_id = p.id_b
                )
                SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
                       CAST(union_n AS BIGINT) AS union_n
                FROM scored WHERE inter * 10 >= union_n * 3
                """,
                docs=docs,
                pairs=pairs,
            ).collect()
        }

    naive = _naive_jaccard(_naive_lsh(docs))
    got = {
        tuple(r)
        for r in lsh_jaccard_pairs(docs, "doc_id", "text", 16, 4, 3, 0.3).collect()
    }
    assert got == naive
    # r09: the prefiltered-grams verify variant is a pure plan-shape
    # change (grams only for reps appearing in a candidate pair)
    pre = {
        tuple(r)
        for r in lsh_jaccard_pairs(
            docs, "doc_id", "text", 16, 4, 3, 0.3, prefilter_grams=True
        ).collect()
    }
    assert pre == naive
    # sanity: the 0/0 degenerate pairs are IN (naive semantics), and
    # within-group rows carry inter == union_n (J = 1)
    zero = {t for t in naive if t[2] == 0}
    assert zero and all(t[3] == 0 for t in zero)
    assert {t for t in naive if t[0] == 0 and t[1] == 1}.pop()[2] > 0

    # r09 (ADVICE cap-parity): member-weighted max_bucket on the jaccard
    # composition must match the naive capped composition exactly — the
    # near-dup viral-bucket guard minhash_lsh_pairs already had
    for cap in (8, 2):
        naive_c = _naive_jaccard(_naive_lsh(docs, max_bucket=cap))
        got_c = {
            tuple(r)
            for r in lsh_jaccard_pairs(
                docs, "doc_id", "text", 16, 4, 3, 0.3, max_bucket=cap
            ).collect()
        }
        assert got_c == naive_c, cap
    assert len(naive_c) < len(naive)


def test_digest_max_group_composition(spark):
    """max_group drops viral digest groups from pair generation in both
    contracted emitters; exact_duplicates recovers them in O(B) — the
    cap-parity twin of test_lsh_viral_bucket_cap."""
    from ubdc_airbnb_spark.operators.dedup import (
        exact_duplicates,
        lsh_jaccard_pairs,
        minhash_lsh_pairs,
        ngram_containment_pairs,
    )

    rows = [(i, "empty page please enable javascript to continue") for i in range(40)]
    rows += [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "the quick brown fox jumps over the lazy dog tonight"),
        (102, "the quick brown fox jumps over the lazy dog today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in (
        lambda d, **kw: minhash_lsh_pairs(d, "doc_id", "text", 16, 4, **kw),
        lambda d, **kw: lsh_jaccard_pairs(d, "doc_id", "text", 16, 4, 3, 0.3, **kw),
        lambda d, **kw: ngram_containment_pairs(d, "doc_id", "text", 3, 0.5, **kw),
    ):
        capped = fn(docs, max_group=10).select("id_a", "id_b")
        ids = {r.id_a for r in capped.collect()} | {r.id_b for r in capped.collect()}
        assert ids and ids <= {100, 101, 102}          # viral cluster gone
        assert capped.filter("id_a = 100 and id_b = 101").count() == 1
    ex = exact_duplicates(docs, "doc_id", "text").filter(F.col("n_docs") > 1)
    assert {(r.keep_id, r.n_docs) for r in ex.collect()} == {(0, 40), (100, 2)}


def test_temperature_mix_boosts_small_sources(spark):
    """α=0.5 sampling must pick a HIGHER rate for a small source than a
    large one, and the realized counts must track rate·n."""
    from ubdc_airbnb_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(900)] + [(i + 1000, "small") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = temperature_mix(df, "src", "doc_id", target_fraction=0.5)
    rates = {r.src: r.rate_ppm for r in out.select("src", "rate_ppm").distinct().collect()}
    # proportional-to-sqrt: rate ∝ sqrt(n)/n, so small/big = (20/400)/(30/900) = 1.5
    assert abs(rates["small"] / rates["big"] - 1.5) < 1e-5
    picked = {r[0]: r[1] for r in out.groupBy("src").count().collect()}
    for src, n in (("big", 900), ("small", 400)):
        assert abs(picked[src] - n * rates[src] / 1e6) < 0.15 * n  # hash-uniformity tolerance
    # determinism across partitionings
    again = temperature_mix(df.repartition(7), "src", "doc_id", target_fraction=0.5)
    assert sorted(r.doc_id for r in out.collect()) == sorted(r.doc_id for r in again.collect())
