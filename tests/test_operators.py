"""Operator-layer unit tests: upserts, windows, dedup, similarity,
spatial join — small deterministic fixtures with hand-computed oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ubdc_airbnb_spark.operators import dedup, joins, similarity, spatial, upsert, windows


# ------------------------------------------------------------------ upsert


def test_upsert_source_wins(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    source = spark.createDataFrame([(2, "B"), (3, "C")], "id long, v string")
    got = {(r.id, r.v) for r in upsert.upsert(target, source, ["id"]).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "C")}


def test_insert_if_absent_target_wins(spark):
    target = spark.createDataFrame([(1, "a")], "id long, v string")
    source = spark.createDataFrame([(1, "X"), (2, "Y")], "id long, v string")
    got = {(r.id, r.v) for r in upsert.insert_if_absent(target, source, ["id"]).collect()}
    assert got == {(1, "a"), (2, "Y")}


def test_change_detect_upsert_moved_audit(spark):
    """Reference semantics (workunits.py:124-164): insert new; update+audit
    only when moved beyond threshold; keep otherwise."""
    target = spark.createDataFrame(
        [(1, 0.0, []), (2, 100.0, []), (3, 50.0, ["old"])],
        "id long, pos double, notes array<string>",
    )
    source = spark.createDataFrame(
        [(1, 10.0, ), (2, 500.0,), (4, 7.0,)], "id long, pos double"
    )
    out = upsert.change_detect_upsert(
        target,
        source,
        ["id"],
        changed=F.abs(F.col("s.pos") - F.col("t.pos")) > 150.0,
        update_cols=["pos"],
        audit_col="notes",
        audit_value=F.lit("moved"),
    )
    got = {r.id: (r.pos, list(r.notes or [])) for r in out.collect()}
    assert got[1] == (0.0, [])            # moved 10 < 150: keep
    assert got[2] == (500.0, ["moved"])   # moved 400 > 150: update + audit
    assert got[3] == (50.0, ["old"])      # absent from source: untouched
    assert got[4][0] == 7.0               # new: inserted


def test_upsert_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    upsert.upsert_parquet(t1, path, ["id"])
    t2 = spark.createDataFrame([(2, "B"), (3, "C")], "id long, v string")
    upsert.upsert_parquet(t2, path, ["id"])
    got = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "C")}


# ------------------------------------------------------------------ windows


def test_availability_runs_finds_first_window(spark):
    """W5: calendar-style availability — first run of >=3 available days."""
    rows = []
    # key 1: avail days 2,3,4 (run of 3 starting at 2), then 6,7
    for d, a in [(1, False), (2, True), (3, True), (4, True), (5, False), (6, True), (7, True)]:
        rows.append((1, d, a))
    # key 2: never 3 in a row
    for d, a in [(1, True), (2, False), (3, True), (4, False)]:
        rows.append((2, d, a))
    df = spark.createDataFrame(rows, "listing_id long, day int, avail boolean")
    got = {
        r.listing_id: (r.run_start, r.run_end, r.run_len)
        for r in windows.availability_runs(df, "listing_id", "day", "avail", 3).collect()
    }
    assert got == {1: (2, 4, 3)}


def test_topk_stalest_nulls_first(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-05"), (2, None), (3, "2024-01-01"), (4, None)],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = [r.id for r in windows.topk_stalest(df, "ts", 3, tiebreak="id").collect()]
    assert got == [2, 4, 3]


def test_batching_sizes(spark):
    df = spark.range(250).withColumnRenamed("id", "k")
    got = (
        windows.assign_batches(df, "k", 100)
        .groupBy("batch_id")
        .count()
        .orderBy("batch_id")
        .collect()
    )
    assert [(r.batch_id, r["count"]) for r in got] == [(0, 100), (1, 100), (2, 50)]


# ------------------------------------------------------------------ dedup


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "unique text")],
        "doc_id long, text string",
    )
    got = {r.keep_id: r.n_docs for r in dedup.exact_duplicates(df, "doc_id", "text").collect()}
    assert got == {1: 2, 3: 1}


def test_minhash_identical_docs_always_pair(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different content here with other words entirely"),
        ],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(df, "doc_id", "text", num_perm=16)
    pairs = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_estimates_jaccard(spark):
    """MinHash agreement rate approximates exact n-gram Jaccard."""
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy cat again and again"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    exact = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()[0]
    true_j = exact.inter / exact.union_n
    sigs = dedup.minhash_signatures(df, "doc_id", "text", num_perm=64)
    s = {r.doc_id: r.sig for r in sigs.collect()}
    est = sum(1 for x, y in zip(s[1], s[2]) if x == y) / 64
    assert abs(est - true_j) < 0.25


def test_simhash_identical_equal_similar_close(spark):
    df = spark.createDataFrame(
        [
            (1, "spark engine query plan optimizer"),
            (2, "spark engine query plan optimizer"),
            (3, "zebra yoga xylophone watermelon vacuum"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.simhash for r in dedup.simhash(df, "doc_id", "text").collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_lsh_candidates_superset_of_high_jaccard(spark):
    """On real synthetic docs: every pair with exact Jaccard >= 0.8 must
    be produced by LSH (16 perms / 4 bands -> collision prob ~0.98 at 0.8)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", num_perm=16)
    lsh = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4).collect()}
    missed = exact - lsh
    assert len(missed) <= max(1, len(exact) // 10), f"LSH missed {len(missed)}/{len(exact)}"


# ------------------------------------------------------------------ similarity


def test_brute_force_topk_orders_by_cosine(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = similarity.brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    order = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank)]
    assert order == [1, 3]


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=5).collect()
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    approx = similarity.ivf_topk(emb, queries, centroids, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.2, f"IVF recall {recall} implausibly low"
    assert len(approx_set) == len(exact_set)
    # multi-probe is the recall lever: probing 2 buckets must never lose
    # pairs vs 1 bucket, and typically gains boundary neighbors
    multi = similarity.ivf_topk(emb, queries, centroids, k=5, probes=2).collect()
    multi_set = {(r.query_id, r.neighbor_id) for r in multi}
    recall2 = len(exact_set & multi_set) / len(exact_set)
    assert recall2 >= recall, (recall2, recall)
    # all-centroid probing degenerates to exact brute force
    n_cent = centroids.count()
    full = similarity.ivf_topk(emb, queries, centroids, k=5, probes=n_cent).collect()
    assert {(r.query_id, r.neighbor_id) for r in full} == exact_set


# ------------------------------------------------------------------ spatial


def test_points_in_aoi_matches_exact_oracle(spark):
    """J1 end-to-end: quadkey-cover prejoin + boundary exact test equals
    brute-force ray casting for every point."""
    import random

    from ubdc_airbnb_spark.functions import geometry as geo

    wkt = "POLYGON ((-0.2 51.4, 0.15 51.45, 0.1 51.6, -0.25 51.55, -0.2 51.4))"
    mp = geo.parse_wkt(wkt)
    rng = random.Random(11)
    pts = [
        (i, rng.uniform(-0.4, 0.3), rng.uniform(51.3, 51.7)) for i in range(500)
    ]
    df = spark.createDataFrame(pts, "listing_id long, lon double, lat double")
    got = {r.listing_id for r in spatial.points_in_aoi(df, wkt, depth=12).collect()}
    expected = {i for i, lon, lat in pts if geo.point_in_multipolygon(lon, lat, mp)}
    assert got == expected


def test_grids_intersecting_aois(spark):
    from ubdc_airbnb_spark.functions import geometry as geo

    wkt = "POLYGON ((-0.2 51.4, 0.1 51.4, 0.1 51.6, -0.2 51.6, -0.2 51.4))"
    cover = geo.tile_cover(geo.parse_wkt(wkt), 10)
    inside_qk = cover[0]
    far_qk = "3333333333"
    grids = spark.createDataFrame([(inside_qk,), (far_qk,), (inside_qk[:5],)], "quadkey string")
    got = {r.quadkey for r in spatial.grids_intersecting_aois(grids, [(1, wkt)], depth=10).collect()}
    assert inside_qk in got
    assert inside_qk[:5] in got  # ancestor of a cover tile intersects
    assert far_qk not in got


def test_union_cover_normalized(spark):
    a = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    b = "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))"
    cover = spatial.union_cover([(1, a), (2, b)], depth=8)
    s = set(cover)
    for qk in s:
        assert not any(qk != o and qk.startswith(o) for o in s)


def test_salted_join_equals_plain_join(spark):
    """Skew-salted join must produce exactly the plain join's rows."""
    big = spark.createDataFrame(
        [(i % 3, i) for i in range(1000)], "k long, payload long"
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (5, "z")], "k long, v string")
    plain = {(r.k, r.payload, r.v) for r in big.join(small, "k").collect()}
    salted = {
        (r.k, r.payload, r.v)
        for r in joins.salted_join(big, small, "k", salt=8).collect()
    }
    assert salted == plain and len(plain) == 334 + 333


def test_clean_quadkeys_reference_semantics(spark):
    """G16 (ref utils/grids.py:22-58 + tests/units quadkey ops): covered
    candidates drop; candidates with DB descendants are replaced by
    children recursively; disjoint candidates pass through."""
    existing = spark.createDataFrame(
        [("031",), ("1200",), ("12010",)], "quadkey string"
    )
    candidates = spark.createDataFrame(
        [
            ("0311",),   # ancestor 031 in DB -> dropped
            ("031",),    # already present -> dropped
            ("2",),      # disjoint -> kept
            ("120",),    # has descendants 1200,12010 -> split recursively
        ],
        "quadkey string",
    )
    got = sorted(r.quadkey for r in spatial.clean_quadkeys(existing, candidates).collect())
    # 120 -> 1200*,1201,1202,1203; 1200 covered; 1201 has descendant 12010
    #   -> 12010*,12011,12012,12013; 12010 covered
    assert got == sorted(["2", "1202", "1203", "12011", "12012", "12013"])


def test_kmeans_improves_inertia(spark):
    """Lloyd iterations must not worsen the clustering objective, and
    trained centroids must beat the raw seed vectors."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = emb.orderBy("vec_id").limit(8).selectExpr(
        "vec_id AS centroid_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid_vec",
    )
    inertia_seed = similarity.kmeans_inertia(emb, seeds)
    trained = similarity.kmeans_centroids(emb, k=8, iters=3)
    inertia_trained = similarity.kmeans_inertia(emb, trained)
    assert trained.count() <= 8
    assert inertia_trained <= inertia_seed + 1e-9
    r = trained.collect()[0]
    assert len(r.centroid_vec) == 64


def test_ivf_threshold_pairs_recall_vs_exact(spark):
    """Bucketed near-dup pairs are a subset of the exact all-pairs result
    with high recall at 2 probes; every reported pair is exact-verified
    (zero false positives by construction)."""
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators import similarity
    from ubdc_airbnb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.threshold_pairs(emb, threshold=0.4).collect()
    }
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid_vec"),
    )
    got = {
        (r.id_a, r.id_b)
        for r in similarity.ivf_threshold_pairs(
            emb, cents, threshold=0.4, probes=2
        ).collect()
    }
    assert got <= exact  # no false positives: every pair exact-verified
    if exact:
        assert len(got) / len(exact) >= 0.5  # 2-probe recall floor


def _naive_bucket_pairs(assigned_a, assigned_b, keys, threshold):
    """The pre-r07 pairwise reference shape: bucket equi-join over
    DOCUMENTS, distinct, then verify — correct, but shuffles the
    unverified candidate set (kept here as the test oracle)."""
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.similarity import cosine_cols

    cand = (
        assigned_a.join(assigned_b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.filter(cosine_cols("vec_a", "vec_b") >= threshold).select(
        "id_a", "id_b"
    )


def test_ivf_pairs_contraction_matches_naive_on_replicated_corpus(spark):
    """r07: the value-contracted ivf_threshold_pairs must be
    SET-identical to the naive pairwise shape on a corpus WITH exact
    duplicates — the replica-dense case whose naive form took 702 s at
    sf1 (SCALE.md r07). Replication shifts ids the way scale_smoke's
    replicate does, so duplicate groups span id ranges."""
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators import similarity
    from ubdc_airbnb_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    mx = base.agg(F.max("vec_id")).first()[0] + 1
    emb = base.crossJoin(spark.range(3).withColumnRenamed("id", "__i")).select(
        (F.col("vec_id") + F.col("__i") * mx).alias("vec_id"), "embedding"
    )
    cents = base.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid_vec"),
    )
    assigned = similarity.centroid_probes(emb, cents, 2, "vec_id", "embedding")
    naive = _naive_bucket_pairs(
        assigned.select(
            "centroid_id", F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a")
        ),
        assigned.select(
            "centroid_id", F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b")
        ),
        "centroid_id",
        0.4,
    )
    want = {(r.id_a, r.id_b) for r in naive.collect()}
    got = {
        (r.id_a, r.id_b)
        for r in similarity.ivf_threshold_pairs(
            emb, cents, threshold=0.4, probes=2
        ).collect()
    }
    assert got == want
    assert want, "test corpus produced no pairs — not exercising anything"

    # components over the same graph: contracted embedding_components
    # must reproduce connected_components(pairs) labels exactly
    from ubdc_airbnb_spark.operators.graph import connected_components

    ref = {
        (r.id, r.component)
        for r in connected_components(
            similarity.ivf_threshold_pairs(emb, cents, threshold=0.4, probes=2),
            emb.select("vec_id"),
            id_col="vec_id",
        ).collect()
    }
    comp = {
        (r.id, r.component)
        for r in similarity.embedding_components(
            emb, cents, threshold=0.4, probes=2
        ).collect()
    }
    assert comp == ref


def test_rp_lsh_pairs_contraction_matches_naive_on_replicated_corpus(spark):
    """Same equivalence for the RP-LSH banded path."""
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators import similarity
    from ubdc_airbnb_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    mx = base.agg(F.max("vec_id")).first()[0] + 1
    emb = base.crossJoin(spark.range(3).withColumnRenamed("id", "__i")).select(
        (F.col("vec_id") + F.col("__i") * mx).alias("vec_id"), "embedding"
    )
    width = 16 // 4
    sigs = similarity.rp_signature(emb, "vec_id", "embedding", 16, "rp", 64)
    banded = sigs.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.substring(F.col("rp_sig"), b * width + 1, width),
            )
        ).alias("band_id", "band_key"),
    )
    naive = _naive_bucket_pairs(
        banded.select(
            "band_id", "band_key", F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("vec_a"),
        ),
        banded.select(
            "band_id", "band_key", F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("vec_b"),
        ),
        ["band_id", "band_key"],
        0.4,
    )
    want = {(r.id_a, r.id_b) for r in naive.collect()}
    got = {
        (r.id_a, r.id_b)
        for r in similarity.rp_lsh_pairs(emb, threshold=0.4).collect()
    }
    assert got == want
    assert want


# ------------------------------------------------------------------ as-of


def test_asof_join_semantics(spark):
    """Backward inclusive match, tie-break by largest, tolerance
    nullifies stale matches, unmatched lefts keep NULLs."""
    from ubdc_airbnb_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"),
         (1, "2024-01-01 12:00:00", "b"),
         (2, "2024-01-01 09:00:00", "c")],
        "k long, ts string, tag string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 100),
         (1, "2024-01-01 10:00:00", 200),   # equal ts -> inclusive match
         (1, "2024-01-01 11:45:00", 300),
         (2, "2024-01-01 02:00:00", 400)],  # > 1h before left -> tolerance kills
        "k long, rts string, rid long",
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "rid")

    out = {
        (r.k, r.tag): (r.rid, r.rts)
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            tolerance="INTERVAL 1 HOUR", tiebreak="rid",
        ).collect()
    }
    assert out[(1, "a")][0] == 200      # inclusive: rts == ts wins over 09:30
    assert out[(1, "b")][0] == 300      # latest within the hour
    assert out[(2, "c")] == (None, None)  # match exists but outside tolerance

    # without tolerance the stale match survives
    out2 = {
        (r.k, r.tag): r.rid
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts", tiebreak="rid"
        ).collect()
    }
    assert out2[(2, "c")] == 400


def test_asof_join_tie_break_largest(spark):
    from ubdc_airbnb_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, t long").select(
        "k", F.timestamp_seconds("t").alias("t")
    )
    right = spark.createDataFrame(
        [(1, 10, 7), (1, 10, 9), (1, 10, 8)], "k long, rt long, rid long"
    ).select("k", F.timestamp_seconds("rt").alias("rt"), "rid")
    got = asof_join(left, right, key="k", left_ts="t", right_ts="rt", tiebreak="rid").collect()
    assert got[0].rid == 9


def test_asof_join_plan_has_no_join_node(spark):
    """The scale claim: as-of compiles to window carry-forward — no Join
    operator, so no per-key range cross-product can ever materialize."""
    from ubdc_airbnb_spark import queries as q

    plan = q.j13_asof_attribution(spark, "/root/testdata/sf0.001")._sc._jvm.PythonSQLUtils.explainString(
        q.j13_asof_attribution(spark, "/root/testdata/sf0.001")._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_join_rejects_column_collision(spark):
    from ubdc_airbnb_spark.operators.joins import asof_join

    df = spark.createDataFrame([(1, 2)], "k long, ts long").select(
        "k", F.timestamp_seconds("ts").alias("ts")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rename right columns"):
        asof_join(df, df, key="k")


# ------------------------------------------------------------------ tf-idf


def test_tfidf_hand_computed(spark):
    import math

    from ubdc_airbnb_spark.operators import tfidf

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry cherry cherry date")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df, r.tfidf)
        for r in tfidf.top_terms(df, "doc_id", "text", k=2).collect()
    }
    # doc 1: apple tf=2 df=1 -> 2*(ln(4/2)+1); banana tf=1 df=2 -> ln(4/3)+1
    assert got[(1, 1)][0] == "apple"
    assert got[(1, 1)][3] == round(2 * (math.log(4 / 2) + 1), 6)
    assert got[(1, 2)][0] == "banana"
    assert got[(3, 1)][0] == "cherry"
    assert got[(3, 1)][1] == 3 and got[(3, 1)][2] == 2


# ------------------------------------------------------------------ graph


def test_connected_components_chain_and_singleton(spark):
    from ubdc_airbnb_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    # components: {1,2,3,4} (chain), {5,6}, {7} singleton
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (5, 6)], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_raises_without_convergence(spark):
    import pytest as _pytest

    from ubdc_airbnb_spark.operators.graph import connected_components

    n = 8
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, nodes, max_iter=2)
    # enough rounds -> whole chain resolves to 0
    got = {r.id: r.component for r in connected_components(chain, nodes, max_iter=10).collect()}
    assert set(got.values()) == {0}


def test_interval_join_semantics_and_edges(spark):
    """Inclusive [lo, hi], bin-boundary crossing, no dupes."""
    from ubdc_airbnb_spark.operators.joins import interval_join

    left = spark.createDataFrame([(1, 1000), (2, 5000)], "k long, t long").select(
        "k", F.timestamp_seconds("t").alias("t")
    )
    right = spark.createDataFrame(
        # k=1: at lo bound (inclusive), inside, at hi bound (inclusive),
        # just outside; bins of 600s mean 1000->1599 spans two bins
        [(1, 1000, 10), (1, 1500, 11), (1, 1600, 12), (1, 1601, 13), (2, 4000, 20)],
        "k long, rt long, rid long",
    ).select("k", F.timestamp_seconds("rt").alias("rt"), "rid")
    got = sorted(
        r.rid
        for r in interval_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            upper="INTERVAL 600 SECOND", bucket_seconds=600,
        ).collect()
    )
    assert got == [10, 11, 12]
    # negative lower bound: window behind the left ts
    got2 = sorted(
        r.rid
        for r in interval_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            lower="INTERVAL -1000 SECOND", upper="INTERVAL 0 SECOND",
            bucket_seconds=600,
        ).collect()
    )
    assert got2 == [10, 20]


def test_interval_join_plan_is_equi_join(spark):
    from ubdc_airbnb_spark import queries as q

    df = q.j14_interval_join(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_upsert_parquet_recovers_interrupted_swap(spark, tmp_path):
    """upsert_parquet must MERGE with state recovered from an interrupted
    swap — never treat crash debris as 'first write' and drop history
    (the jobs.py foreachBatch discipline, applied to the batch upsert)."""
    from ubdc_airbnb_spark.operators.upsert import upsert_parquet

    base = str(tmp_path / "t")
    # crash state (b): the base dir is gone, old + fully-written tmp remain
    spark.createDataFrame([(1, "old"), (2, "old")], "k long, v string").write.parquet(
        base + ".__old__"
    )
    spark.createDataFrame([(1, "cur"), (2, "cur")], "k long, v string").write.parquet(
        base + ".__tmp__"
    )
    upsert_parquet(
        spark.createDataFrame([(2, "new"), (3, "new")], "k long, v string"), base, ["k"]
    )
    got = {r.k: r.v for r in spark.read.parquet(base).collect()}
    # tmp (the completed pre-crash state) was promoted, then merged
    assert got == {1: "cur", 2: "new", 3: "new"}


def test_packed_prefix_predicate_matches_string_filter(spark):
    """The packed-quadkey prefix predicate (shift + integer IN) must
    select exactly the rows the string substring-IN kernel selects, for
    prefixes of every length including full depth."""
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.functions.quadkey import tile_to_quadkey, tile_to_quadkey_packed
    from ubdc_airbnb_spark.operators.joins import packed_prefix_predicate, prefix_filter

    df = spark.range(20000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 1024).alias("x"),
        ((F.col("id") * 7919) % 1024).alias("y"),
    )
    both = df.withColumn("qk", tile_to_quadkey("x", "y", 10)).withColumn(
        "qkp", tile_to_quadkey_packed("x", "y", 10)
    )
    prefixes = ["0", "12", "301", "2301", "3333333333"]
    want = sorted(r.rid for r in prefix_filter(both, prefixes, "qk").collect())
    got = sorted(
        r.rid
        for r in both.filter(packed_prefix_predicate("qkp", prefixes, 10)).collect()
    )
    assert got == want and len(got) > 0
    # and the packed key is the base-4 reading of the string key
    mism = both.filter(
        F.conv(F.col("qk"), 4, 10).cast("long") != F.col("qkp")
    ).count()
    assert mism == 0
