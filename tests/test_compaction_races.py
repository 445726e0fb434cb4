"""Two-writer interleavings for the persisted index families (VERDICT
r09 item 4): a partition-pruned PROBE racing a compaction swap must see
the old generation or the new one — never a torn mix — and an appender
arriving mid-compaction must be blocked loudly (``LeaseHeld``) and land
cleanly on retry, with scores matching a from-scratch rebuild."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ubdc_airbnb_spark.sources import layout
from ubdc_airbnb_spark.sources.layout import LeaseHeld, current_path

SF = "/root/testdata/sf0.001"
QUERY = ["spark", "join", "window"]


def _docs(spark, lo=0, hi=40):
    from ubdc_airbnb_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents")
    return d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))


def _vecs(spark, lo=0, hi=40):
    from ubdc_airbnb_spark.sources.tables import load_table

    e = load_table(spark, SF, "embeddings")
    return e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).select(
        "vec_id", "embedding"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# reader vs compaction swap — manifest layouts: a probe that fires in the
# window AFTER the new generation is durable but BEFORE the pointer swap
# must read the complete OLD generation (the pointer still names it).
# ---------------------------------------------------------------------------


def _interleaved_manifest_probe(monkeypatch, probe):
    """Patch layout.manifest_replace so the probe runs inside the swap
    window (new generation written, pointer not yet moved). Returns the
    list the probe's results are appended to."""
    seen = []
    real = layout.manifest_replace

    def patched(write_fn, base, retention=1, ttl_sec=600.0):
        def wrapped(dest):
            write_fn(dest)
            seen.append(probe())  # pointer still names the old gen

        return real(wrapped, base, retention=retention, ttl_sec=ttl_sec)

    monkeypatch.setattr(layout, "manifest_replace", patched)
    return seen


def test_lsh_probe_mid_compaction_sees_old_generation(spark, tmp_path, monkeypatch):
    from ubdc_airbnb_spark.operators.dedup_index import (
        add_to_lsh_index,
        build_lsh_index,
        compact_lsh_index,
        query_lsh_index,
    )

    idx = str(tmp_path / "lsh")
    build_lsh_index(_docs(spark, 0, 40), idx, n_buckets=8, object_store_safe=True)
    add_to_lsh_index(_docs(spark, 40, 60), idx)  # fragment the layout
    before = _rows(query_lsh_index(spark, idx, _docs(spark, 60, 70)))

    seen = _interleaved_manifest_probe(
        monkeypatch, lambda: _rows(query_lsh_index(spark, idx, _docs(spark, 60, 70)))
    )
    compact_lsh_index(spark, idx)
    # the mid-window probe read a COMPLETE index (old generation) …
    assert seen and all(s == before for s in seen)
    # … and the post-swap probe reads the complete new one, score-identical
    assert _rows(query_lsh_index(spark, idx, _docs(spark, 60, 70))) == before


def test_ivf_probe_mid_compaction_sees_old_generation(spark, tmp_path, monkeypatch):
    from ubdc_airbnb_spark.operators.ann_index import (
        add_to_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        query_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(_vecs(spark, 0, 40), idx, k=4, object_store_safe=True)
    add_to_ivf_index(_vecs(spark, 40, 60), idx)
    q = _vecs(spark, 60, 64)
    before = _rows(query_ivf_index(spark, idx, q, k=3, probes=2))

    seen = _interleaved_manifest_probe(
        monkeypatch, lambda: _rows(query_ivf_index(spark, idx, q, k=3, probes=2))
    )
    compact_ivf_index(spark, idx)
    assert seen and all(s == before for s in seen)
    assert _rows(query_ivf_index(spark, idx, q, k=3, probes=2)) == before


def _ingest_docs(spark, docs, src, idx, ckpt):
    from ubdc_airbnb_spark.streaming import jobs

    docs.repartition(2).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_bm25_append(stream, idx, n_buckets=8, checkpoint=ckpt)


def test_bm25_probe_mid_compaction_old_or_error_never_torn(
    spark, tmp_path, monkeypatch
):
    """Streaming-bootstrapped BM25 is a plain (rename-swap) layout: a
    probe firing in the gap between the two renames either fails loudly
    (postings dir briefly absent) or reads a complete generation —
    never a torn mix."""
    from ubdc_airbnb_spark.operators.tfidf import (
        compact_bm25_index,
        query_bm25_index,
    )

    idx = str(tmp_path / "bm25")
    _ingest_docs(
        spark, _docs(spark, 0, 60), str(tmp_path / "src"), idx, str(tmp_path / "ck")
    )
    before = _rows(query_bm25_index(spark, idx, QUERY, k=10))
    assert before

    postings = os.path.join(idx, "postings")
    outcomes = []
    real_rename = os.rename

    def racing_rename(src, dst):
        real_rename(src, dst)
        if src == postings and dst == postings + ".__old__":
            try:
                outcomes.append(
                    ("rows", _rows(query_bm25_index(spark, idx, QUERY, k=10)))
                )
            except Exception as e:  # noqa: BLE001 — loud failure is correct
                outcomes.append(("error", type(e).__name__))

    monkeypatch.setattr(os, "rename", racing_rename)
    compact_bm25_index(spark, idx)
    monkeypatch.undo()

    assert outcomes, "the swap gap was never exercised"
    for kind, val in outcomes:
        assert kind == "error" or val == before, (kind, val)
    assert _rows(query_bm25_index(spark, idx, QUERY, k=10)) == before


# ---------------------------------------------------------------------------
# reader vs PLAIN rename-swap: mid-gap the table directory is absent —
# the reader fails LOUDLY (clean retryable error), never a torn mix.
# ---------------------------------------------------------------------------


def test_plain_swap_reader_fails_loud_never_torn(spark, tmp_path, monkeypatch):
    from ubdc_airbnb_spark.operators.dedup_index import (
        build_lsh_index,
        compact_lsh_index,
        query_lsh_index,
    )

    idx = str(tmp_path / "lsh_plain")
    build_lsh_index(_docs(spark, 0, 40), idx, n_buckets=8)
    probe_docs = _docs(spark, 60, 70)
    before = _rows(query_lsh_index(spark, idx, probe_docs))

    banded = os.path.join(idx, "banded")
    outcomes = []
    real_rename = os.rename

    def racing_rename(src, dst):
        real_rename(src, dst)
        if src == banded and dst == banded + ".__old__":
            # the gap between the two renames: base is absent
            try:
                outcomes.append(("rows", _rows(query_lsh_index(spark, idx, probe_docs))))
            except Exception as e:  # noqa: BLE001 — any loud failure is correct
                outcomes.append(("error", type(e).__name__))

    monkeypatch.setattr(os, "rename", racing_rename)
    compact_lsh_index(spark, idx)
    monkeypatch.undo()

    assert outcomes, "the swap gap was never exercised"
    for kind, val in outcomes:
        # either a clean error (table briefly absent) or a COMPLETE
        # result identical to a generation — never a partial mix
        assert kind == "error" or val == before, (kind, val)
    assert _rows(query_lsh_index(spark, idx, probe_docs)) == before


# ---------------------------------------------------------------------------
# appender vs compaction: blocked loudly mid-compaction, clean on retry,
# scores match a from-scratch rebuild over the union corpus.
# ---------------------------------------------------------------------------


def _appender_blocked_then_retries(spark, monkeypatch, idx, compact_fn, append_fn):
    """Run compact_fn with append_fn fired inside the lease window;
    assert LeaseHeld there, then retry append_fn after and return."""
    attempts = []
    real = layout.compact_partitioned

    def racing(spark_, base, cols):
        with pytest.raises(LeaseHeld):
            append_fn()
        attempts.append("blocked")
        return real(spark_, base, cols)

    monkeypatch.setattr(layout, "compact_partitioned", racing)
    # the wrappers import compact_partitioned at call time from
    # ..sources.layout, so the monkeypatch is seen
    compact_fn()
    monkeypatch.undo()
    assert attempts == ["blocked"]
    append_fn()  # retry after compaction: lands cleanly


def test_lsh_appender_blocked_mid_compaction_retries_clean(
    spark, tmp_path, monkeypatch
):
    from ubdc_airbnb_spark.operators.dedup_index import (
        add_to_lsh_index,
        build_lsh_index,
        compact_lsh_index,
        query_lsh_index,
    )

    idx = str(tmp_path / "lsh")
    build_lsh_index(_docs(spark, 0, 40), idx, n_buckets=8)
    add_to_lsh_index(_docs(spark, 40, 50), idx)

    _appender_blocked_then_retries(
        spark,
        monkeypatch,
        idx,
        lambda: compact_lsh_index(spark, idx),
        lambda: add_to_lsh_index(_docs(spark, 50, 60), idx),
    )

    # scores match a from-scratch rebuild over the union corpus
    rebuilt = str(tmp_path / "rebuilt")
    build_lsh_index(_docs(spark, 0, 60), rebuilt, n_buckets=8)
    probe = _docs(spark, 60, 70)
    assert _rows(query_lsh_index(spark, idx, probe)) == _rows(
        query_lsh_index(spark, rebuilt, probe)
    )


def test_ivf_appender_blocked_mid_compaction_retries_clean(
    spark, tmp_path, monkeypatch
):
    from ubdc_airbnb_spark.operators.ann_index import (
        add_to_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        load_ivf_index,
        query_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(_vecs(spark, 0, 40), idx, k=4)
    add_to_ivf_index(_vecs(spark, 40, 50), idx)

    _appender_blocked_then_retries(
        spark,
        monkeypatch,
        idx,
        lambda: compact_ivf_index(spark, idx),
        lambda: add_to_ivf_index(_vecs(spark, 50, 60), idx),
    )

    # rebuild with the SAME centroids (training is corpus-dependent) —
    # identical routing, so probes must agree exactly
    cents, _ = load_ivf_index(spark, idx)
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(_vecs(spark, 0, 60), rebuilt, centroids=cents)
    q = _vecs(spark, 60, 64)
    assert _rows(query_ivf_index(spark, idx, q, k=3, probes=2)) == _rows(
        query_ivf_index(spark, rebuilt, q, k=3, probes=2)
    )
    # and the params count survived the append-after-compaction
    [p] = spark.read.parquet(current_path(os.path.join(idx, "params"))).collect()
    assert p.n_vectors == 60


def test_bm25_streaming_fold_blocked_mid_compaction(spark, tmp_path):
    """The streaming fold takes the index-root lease (r10): a micro-batch
    arriving while the lease is held (compaction running) fails LOUDLY,
    and re-running the stream on the SAME checkpoint redelivers the
    failed batch, which lands exactly once — scores equal a clean
    single-ingest control."""
    from ubdc_airbnb_spark.operators.tfidf import (
        build_bm25_index,
        compact_bm25_index,
        query_bm25_index,
    )

    idx = str(tmp_path / "bm25")
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _ingest_docs(spark, _docs(spark, 0, 40), src, idx, ck)

    # a fold attempted while the root lease is held fails loudly
    with layout._writer_lease(idx):
        with pytest.raises(Exception) as ei:
            _ingest_docs(spark, _docs(spark, 40, 60), src, idx, ck)
        assert "lease" in str(ei.value).lower()

    # retry after release: the SAME checkpoint redelivers the failed
    # batch(es) and they land exactly once
    _ingest_docs(spark, _docs(spark, 60, 60), src, idx, ck)

    control = str(tmp_path / "control")
    build_bm25_index(_docs(spark, 0, 60), control, n_buckets=8)
    got = _rows(query_bm25_index(spark, idx, QUERY, k=10))
    assert got == _rows(query_bm25_index(spark, control, QUERY, k=10))
    compact_bm25_index(spark, idx)
    assert _rows(query_bm25_index(spark, idx, QUERY, k=10)) == got
