"""Persisted BM25 inverted index: result parity with the inline ranker,
partition pruning in the probe plan, and the bucket-hash portability
contract (driver-side Python replay == Spark-side md5 bucket)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubdc_airbnb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
QUERY = ["spark", "join", "window"]


def test_index_query_matches_inline_bm25(spark, tmp_path):
    from ubdc_airbnb_spark.operators.tfidf import bm25_topk, build_bm25_index, query_bm25_index

    docs = load_table(spark, SF, "documents")
    idx = str(tmp_path / "bm25")
    build_bm25_index(docs, idx, n_buckets=8)
    got = [tuple(r) for r in query_bm25_index(spark, idx, QUERY, k=10).collect()]
    want = [tuple(r) for r in bm25_topk(docs, QUERY, k=10).collect()]
    assert got == want and len(got) > 0


def test_bm25_probe_is_partition_pruned(spark, tmp_path):
    """The postings scan must carry PartitionFilters on term_bucket —
    only the query terms' buckets are read from storage."""
    from ubdc_airbnb_spark.operators.tfidf import build_bm25_index, query_bm25_index

    docs = load_table(spark, SF, "documents")
    idx = str(tmp_path / "bm25")
    build_bm25_index(docs, idx, n_buckets=8)
    df = query_bm25_index(spark, idx, QUERY, k=5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("term_bucket" in l for l in scan_lines), scan_lines
    # the term IN probe reaches the row groups inside those partitions
    assert any("term" in l for l in plan.splitlines() if "PushedFilters" in l)


def test_bm25_probe_reads_no_doclen(spark, tmp_path):
    """The denormalized layout (dl in each posting row) must keep the
    corpus-sized doclen table entirely OUT of the serve plan — the probe's
    only file input is the probed postings buckets (+ driver-side params)."""
    from ubdc_airbnb_spark.operators.tfidf import build_bm25_index, query_bm25_index

    docs = load_table(spark, SF, "documents")
    idx = str(tmp_path / "bm25")
    build_bm25_index(docs, idx, n_buckets=8)
    df = query_bm25_index(spark, idx, QUERY, k=5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "doclen" not in plan, "serve plan must not scan the doclen table"


def test_bucket_hash_replay_matches_spark(spark):
    from ubdc_airbnb_spark.operators.tfidf import _py_term_bucket, term_bucket

    terms = ["spark", "join", "window", "the", "Straße", "日本語"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r.term: r.b
        for r in df.select("term", term_bucket(F.col("term"), 64).alias("b")).collect()
    }
    assert got == {t: _py_term_bucket(t, 64) for t in terms}


def test_incremental_add_matches_rebuild(spark, tmp_path):
    """Append half the corpus into an index built from the other half:
    every query must score EXACTLY like a from-scratch rebuild over the
    union (df derives from postings, N/toktot merge associatively)."""
    from ubdc_airbnb_spark.operators.tfidf import (
        add_to_bm25_index,
        build_bm25_index,
        query_bm25_index,
    )

    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    inc = str(tmp_path / "bm25_inc")
    full = str(tmp_path / "bm25_full")
    build_bm25_index(base, inc, n_buckets=8)
    add_to_bm25_index(rest, inc)
    build_bm25_index(docs, full, n_buckets=8)

    got = [tuple(r) for r in query_bm25_index(spark, inc, QUERY, k=10).collect()]
    want = [tuple(r) for r in query_bm25_index(spark, full, QUERY, k=10).collect()]
    assert got == want and len(got) > 0

    # merged constants equal the union corpus constants
    [pi] = spark.read.parquet(inc + "/params").collect()
    [pf] = spark.read.parquet(full + "/params").collect()
    assert (pi.n_docs, pi.toktot, pi.n_buckets) == (pf.n_docs, pf.toktot, pf.n_buckets)


def test_incremental_add_appends_only(spark, tmp_path):
    """An append never rewrites existing postings files — the original
    build's files survive byte-identical (new files only)."""
    import os

    from ubdc_airbnb_spark.operators.tfidf import add_to_bm25_index, build_bm25_index

    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "bm25")
    build_bm25_index(base, idx, n_buckets=8)

    def parquet_files(root):
        out = {}
        for dirpath, _, names in os.walk(root):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(dirpath, n)
                    out[p] = os.path.getsize(p)
        return out

    before = parquet_files(os.path.join(idx, "postings"))
    add_to_bm25_index(rest, idx)
    after = parquet_files(os.path.join(idx, "postings"))
    assert set(before) <= set(after)  # nothing deleted
    assert all(after[p] == sz for p, sz in before.items())  # nothing rewritten
    assert len(after) > len(before)  # new files landed


def test_index_params_and_crash_contract(spark, tmp_path):
    from ubdc_airbnb_spark.operators.tfidf import build_bm25_index, doc_terms

    docs = load_table(spark, SF, "documents")
    idx = str(tmp_path / "bm25")
    build_bm25_index(docs, idx, n_buckets=8)
    [p] = spark.read.parquet(idx + "/params").collect()
    terms = doc_terms(docs, "doc_id", "text")
    assert p.n_buckets == 8
    assert p.n_docs == terms.select("doc_id").distinct().count()
    assert p.toktot == terms.agg(F.sum("tf")).collect()[0][0]


def test_append_into_legacy_layout_stays_consistent(spark, tmp_path):
    """Appending into a PRE-denormalization index (postings without dl)
    must keep the old shape — mixing dl-carrying files into a dl-less
    directory would make readers see NULL dl on old rows and score them
    silently wrong. The probe's doclen-sidecar fallback then still
    matches a from-scratch legacy rebuild."""
    import os

    from ubdc_airbnb_spark.operators.tfidf import (
        add_to_bm25_index,
        build_bm25_index,
        query_bm25_index,
    )

    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "bm25_legacy")
    build_bm25_index(base, idx, n_buckets=8)

    # strip dl from postings to simulate the legacy layout
    postings_path = os.path.join(idx, "postings")
    legacy = spark.read.parquet(postings_path).drop("dl")
    tmp = os.path.join(str(tmp_path), "legacy_tmp")
    legacy.write.partitionBy("term_bucket").parquet(tmp)
    import shutil

    shutil.rmtree(postings_path)
    shutil.move(tmp, postings_path)
    assert "dl" not in spark.read.parquet(postings_path).columns

    add_to_bm25_index(rest, idx)
    # still a pure legacy layout (no mixed schema)
    assert "dl" not in spark.read.parquet(postings_path).columns

    full = str(tmp_path / "bm25_full")
    build_bm25_index(docs, full, n_buckets=8)
    got = [tuple(r) for r in query_bm25_index(spark, idx, QUERY, k=10).collect()]
    want = [tuple(r) for r in query_bm25_index(spark, full, QUERY, k=10).collect()]
    assert got == want and len(got) > 0


def test_add_rejects_streaming_layout(spark, tmp_path):
    """add_to_bm25_index on a streaming-maintained index (postings at
    term_bucket/__batch depth, params carrying __max_batch_id) must
    raise: its shallow append would mix partition depths and its params
    swap would drop the exactly-once marker."""
    import pytest

    from ubdc_airbnb_spark.operators.tfidf import add_to_bm25_index
    from ubdc_airbnb_spark.streaming import jobs

    docs = load_table(spark, SF, "documents").limit(60)
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    idx = str(tmp_path / "bm25_stream")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    jobs.foreach_batch_bm25_append(stream, idx, n_buckets=8)

    with pytest.raises(ValueError, match="streaming-maintained"):
        add_to_bm25_index(docs.limit(5), idx)
