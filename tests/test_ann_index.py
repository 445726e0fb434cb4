"""Persisted IVF index: build/load/query lifecycle, result parity with
the inline operator, and the partition-pruning claim checked in the
physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubdc_airbnb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_index_query_matches_inline_ivf(spark, tmp_path):
    from ubdc_airbnb_spark.operators import similarity
    from ubdc_airbnb_spark.operators.ann_index import build_ivf_index, query_ivf_index

    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, k=8, iters=2)
    queries = emb.filter(F.col("vec_id") < 6)

    got = sorted(
        map(tuple, query_ivf_index(spark, idx, queries, k=4, probes=2).collect())
    )
    cents = similarity.kmeans_centroids(emb, k=8, iters=2)
    want = sorted(
        map(tuple, similarity.ivf_topk(emb, queries, cents, k=4, probes=2).collect())
    )
    assert got == want  # deterministic training -> identical serving


def test_index_probe_is_partition_pruned(spark, tmp_path):
    """The probe scan must carry PartitionFilters on centroid_id — only
    probed buckets are read from storage."""
    from ubdc_airbnb_spark.operators.ann_index import build_ivf_index, query_ivf_index

    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, k=8, iters=1)
    df = query_ivf_index(spark, idx, emb.filter(F.col("vec_id") < 2), k=3, probes=1)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("centroid_id" in l for l in scan_lines), scan_lines
    assert "SortMergeJoin" not in plan  # query batch broadcasts


def test_index_params_provenance(spark, tmp_path):
    from ubdc_airbnb_spark.operators.ann_index import build_ivf_index

    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, k=8, iters=2)
    [p] = spark.read.parquet(str(tmp_path / "ivf" / "params")).collect()
    assert (p.k, p.iters, p.dim, p.n_vectors) == (8, 2, 64, emb.count())


def test_incremental_add_routes_and_serves(spark, tmp_path):
    from ubdc_airbnb_spark.operators.ann_index import (
        add_to_ivf_index,
        build_ivf_index,
        load_ivf_index,
        query_ivf_index,
    )

    emb = load_table(spark, SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivf")
    build_ivf_index(base, idx, k=8, iters=1)
    add_to_ivf_index(rest, idx)

    _, assigned = load_ivf_index(spark, idx)
    assert assigned.count() == emb.count()
    [p] = spark.read.parquet(str(tmp_path / "ivf" / "params")).collect()
    assert p.n_vectors == emb.count()

    # appended vectors are reachable through the probe path
    q = emb.filter(F.col("vec_id") < 2)
    res = query_ivf_index(spark, idx, q, k=10, probes=8)  # probe all buckets
    neigh = {r.neighbor_id for r in res.collect()}
    assert any(n % 2 == 1 for n in neigh), "appended (odd) vectors never served"


def test_rrf_fuse_python_oracle(spark):
    from ubdc_airbnb_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, neighbor_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, neighbor_id long, rank long"
    )
    got = {(r.neighbor_id): (r.score, r.rank) for r in rrf_fuse([r1, r2], k=4).collect()}
    want_scores = {
        10: 1.0 / 61,
        11: 1.0 / 62 + 1.0 / 61,  # surfaced by BOTH rankers -> wins
        12: 1.0 / 63,
        13: 1.0 / 62,
    }
    order = sorted(want_scores, key=lambda n: (-want_scores[n], n))
    for rank, n in enumerate(order, 1):
        assert got[n] == (want_scores[n], rank)
    assert order[0] == 11


def test_ivf_compact_preserves_results_and_drops_files(spark, tmp_path):
    """compact_partitioned collapses the per-append file generations in
    each centroid bucket without changing probe results, and the probe
    stays partition-pruned on centroid_id."""
    import os

    from ubdc_airbnb_spark.operators.ann_index import (
        add_to_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )
    from ubdc_airbnb_spark.sources.layout import compact_partitioned

    emb = load_table(spark, SF, "embeddings")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 0), idx, k=8, iters=1)
    add_to_ivf_index(emb.filter(F.col("vec_id") % 3 == 1), idx)
    add_to_ivf_index(emb.filter(F.col("vec_id") % 3 == 2), idx)

    def _n_files(sub):
        root = os.path.join(idx, sub)
        return sum(
            1 for _r, _d, fs in os.walk(root) for f in fs if f.endswith(".parquet")
        )

    q = emb.filter(F.col("vec_id") < 2)
    before = [tuple(r) for r in query_ivf_index(spark, idx, q, k=10, probes=8).collect()]
    nf_before = _n_files("assignments")
    compact_partitioned(spark, os.path.join(idx, "assignments"), ["centroid_id"])
    nf_after = _n_files("assignments")
    after = [tuple(r) for r in query_ivf_index(spark, idx, q, k=10, probes=8).collect()]
    assert sorted(after) == sorted(before) and len(after) > 0
    assert nf_after < nf_before
