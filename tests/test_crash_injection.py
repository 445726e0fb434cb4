"""Crash-injection (failpoint) tests for the persisted-index swap paths
(r11, VERDICT r10 item 5).

``test_compaction_races.py`` covers two LIVE writers; the untested
failure was a DEAD one. Two failpoints per the verdict:

- kill between the generation write and the pointer swap in
  ``compact_*`` — the finished generation must become a GC-able orphan,
  the index must keep serving the OLD generation byte-identically, and
  a re-run after the (dead holder's) lease expires must compact cleanly
  and GC the orphan;
- kill between the data append and the params replace in
  ``_add_to_*_locked`` — the index must stay servable with the
  documented UNDER-COUNT semantics (params never phantom-count), and a
  later append after lease expiry must land cleanly.

A "kill" is simulated by raising at the failpoint (the pointer/params
swap line is never reached — byte-wise identical on-disk state to a
SIGKILL there) plus re-planting the dead holder's lease file as
expired-but-present, which is what a real crash leaves behind (an
in-process exception releases the lease; a killed process does not).
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from ubdc_airbnb_spark.sources import layout
from ubdc_airbnb_spark.sources.layout import current_path

SF = "/root/testdata/sf0.001"
QUERY = ["spark", "join", "window"]


class _Crash(RuntimeError):
    """The simulated kill."""


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


def _plant_dead_lease(base: str) -> None:
    """What a SIGKILLed holder leaves: a lease file with a foreign
    nonce whose expiry has passed (the refresher died with the
    process)."""
    with open(os.path.join(base.rstrip("/"), ".writer-lease"), "w") as f:
        json.dump({"pid": 999999, "expires": time.time() - 60, "nonce": "dead"}, f)


def _crash_manifest_before_pointer_swap(monkeypatch):
    """Patch layout.manifest_replace so write_fn completes (generation
    durable on disk) and the process then 'dies' — the pointer swap
    line is never reached. Records the orphan generation paths."""
    state = {"left": 1, "orphans": []}
    real = layout.manifest_replace

    def patched(write_fn, base, retention=1, ttl_sec=600.0):
        def wrapped(dest):
            write_fn(dest)
            if state["left"] > 0:
                state["left"] -= 1
                state["orphans"].append(dest)
                raise _Crash("killed between generation write and pointer swap")

        return real(wrapped, base, retention=retention, ttl_sec=ttl_sec)

    monkeypatch.setattr(layout, "manifest_replace", patched)
    return state


# ---------------------------------------------------------------------------
# compact: crash between generation write and pointer swap
# ---------------------------------------------------------------------------


def test_ivf_compact_crash_serves_old_then_recovers(spark, tmp_path, monkeypatch):
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
    assert before

    state = _crash_manifest_before_pointer_swap(monkeypatch)
    with pytest.raises(_Crash):
        compact_ivf_index(spark, idx)
    monkeypatch.undo()

    # the finished-but-unswapped generation is on disk as an orphan …
    assert state["orphans"] and all(os.path.isdir(o) for o in state["orphans"])
    # … and the index still serves the OLD generation byte-identically
    assert _rows(query_ivf_index(spark, idx, q, k=3, probes=2)) == before

    # the dead holder's lease is still on disk (expired); the re-run
    # breaks it, compacts cleanly, and GCs the orphan generation
    _plant_dead_lease(idx)
    for o in state["orphans"]:
        _plant_dead_lease(os.path.dirname(o))
    compact_ivf_index(spark, idx)
    assert all(not os.path.exists(o) for o in state["orphans"])
    assert _rows(query_ivf_index(spark, idx, q, k=3, probes=2)) == before


def test_lsh_compact_crash_serves_old_then_recovers(spark, tmp_path, monkeypatch):
    from ubdc_airbnb_spark.operators.dedup_index import (
        add_to_lsh_index,
        build_lsh_index,
        compact_lsh_index,
        query_lsh_index,
    )

    idx = str(tmp_path / "lsh")
    build_lsh_index(_docs(spark, 0, 40), idx, n_buckets=8, object_store_safe=True)
    add_to_lsh_index(_docs(spark, 40, 60), idx)
    probe = _docs(spark, 60, 70)
    before = _rows(query_lsh_index(spark, idx, probe))

    state = _crash_manifest_before_pointer_swap(monkeypatch)
    with pytest.raises(_Crash):
        compact_lsh_index(spark, idx)
    monkeypatch.undo()

    assert state["orphans"] and all(os.path.isdir(o) for o in state["orphans"])
    assert _rows(query_lsh_index(spark, idx, probe)) == before

    _plant_dead_lease(idx)
    for o in state["orphans"]:
        _plant_dead_lease(os.path.dirname(o))
    compact_lsh_index(spark, idx)
    assert all(not os.path.exists(o) for o in state["orphans"])
    assert _rows(query_lsh_index(spark, idx, probe)) == before


def test_bm25_compact_crash_plain_layout_serves_old_then_recovers(
    spark, tmp_path, monkeypatch
):
    """The streaming-bootstrapped BM25 layout compacts via a plain
    rename-swap: the kill lands after the compacted tree is durable at
    ``.__tmp__`` but before the first rename — the live table is
    untouched, the orphan is the tmp tree, and the re-run's own
    pre-clean is the GC."""
    from ubdc_airbnb_spark.operators.tfidf import (
        compact_bm25_index,
        query_bm25_index,
    )
    from ubdc_airbnb_spark.streaming import jobs

    idx = str(tmp_path / "bm25")
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _docs(spark, 0, 60).repartition(2).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_bm25_append(stream, idx, n_buckets=8, checkpoint=ck)
    before = _rows(query_bm25_index(spark, idx, QUERY, k=10))
    assert before

    postings = os.path.join(idx, "postings")
    real_rename = os.rename

    def dying_rename(src, dst):
        if src == postings and dst == postings + ".__old__":
            raise _Crash("killed between generation write and rename swap")
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", dying_rename)
    with pytest.raises(_Crash):
        compact_bm25_index(spark, idx)
    monkeypatch.undo()

    # live postings untouched; the orphan generation sits at .__tmp__
    assert os.path.isdir(postings + ".__tmp__")
    assert _rows(query_bm25_index(spark, idx, QUERY, k=10)) == before

    _plant_dead_lease(idx)
    compact_bm25_index(spark, idx)
    assert not os.path.exists(postings + ".__tmp__")  # orphan GC'd
    assert _rows(query_bm25_index(spark, idx, QUERY, k=10)) == before


# ---------------------------------------------------------------------------
# append: crash between the data append and the params replace
# ---------------------------------------------------------------------------


def _crash_params_replace(monkeypatch, params_suffix: str):
    """Patch operators.upsert.replace_parquet to 'die' on the next
    params write (the data append has already committed)."""
    from ubdc_airbnb_spark.operators import upsert as upsert_mod

    state = {"left": 1}
    real = upsert_mod.replace_parquet

    def dying(df, path):
        if state["left"] > 0 and path.rstrip("/").endswith(params_suffix):
            state["left"] -= 1
            raise _Crash("killed between data append and params replace")
        return real(df, path)

    monkeypatch.setattr(upsert_mod, "replace_parquet", dying)
    return state


def test_ivf_append_crash_undercounts_then_recovers(spark, tmp_path, monkeypatch):
    """The documented crash semantics (ann_index.add_to_ivf_index): a
    crashed append UNDER-counts (data landed, params didn't) — never
    phantom-counts. The index stays servable, and an append after the
    dead holder's lease expires lands cleanly."""
    from ubdc_airbnb_spark.operators.ann_index import (
        add_to_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(_vecs(spark, 0, 40), idx, k=4)

    _crash_params_replace(monkeypatch, "params")
    with pytest.raises(_Crash):
        add_to_ivf_index(_vecs(spark, 40, 50), idx)
    monkeypatch.undo()

    # servable, params under-count (40, not 50), appended rows present
    [p] = spark.read.parquet(current_path(os.path.join(idx, "params"))).collect()
    assert p.n_vectors == 40
    assigned = spark.read.parquet(current_path(os.path.join(idx, "assignments")))
    assert assigned.count() == 50
    q = _vecs(spark, 60, 64)
    assert _rows(query_ivf_index(spark, idx, q, k=3, probes=2))

    # dead holder's lease on disk; the next appender breaks it
    _plant_dead_lease(idx)
    add_to_ivf_index(_vecs(spark, 50, 60), idx)
    [p] = spark.read.parquet(current_path(os.path.join(idx, "params"))).collect()
    assert p.n_vectors == 50  # 40 + 10 new; the crashed 10 stay uncounted
    got = _rows(query_ivf_index(spark, idx, q, k=3, probes=2))
    assert got  # complete probe over all 60 appended vectors


def test_bm25_append_crash_undercounts_then_recovers(spark, tmp_path, monkeypatch):
    from ubdc_airbnb_spark.operators.tfidf import (
        add_to_bm25_index,
        build_bm25_index,
        query_bm25_index,
    )

    idx = str(tmp_path / "bm25")
    build_bm25_index(_docs(spark, 0, 40), idx, n_buckets=8)
    [p0] = spark.read.parquet(current_path(os.path.join(idx, "params"))).collect()
    assert p0.n_docs == 40

    _crash_params_replace(monkeypatch, "params")
    with pytest.raises(_Crash):
        add_to_bm25_index(_docs(spark, 40, 50), idx)
    monkeypatch.undo()

    # params unchanged (under-count), postings servable with k results
    [p] = spark.read.parquet(current_path(os.path.join(idx, "params"))).collect()
    assert p.n_docs == 40
    assert len(_rows(query_bm25_index(spark, idx, QUERY, k=10))) == 10

    _plant_dead_lease(idx)
    add_to_bm25_index(_docs(spark, 50, 60), idx)
    [p] = spark.read.parquet(current_path(os.path.join(idx, "params"))).collect()
    assert p.n_docs == 50  # 40 + 10 new; the crashed batch stays uncounted
    assert len(_rows(query_bm25_index(spark, idx, QUERY, k=10))) == 10
