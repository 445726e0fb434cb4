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
