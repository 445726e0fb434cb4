"""Streaming steady-state smoke (r07): drive the foreachBatch
index-maintenance jobs over an sf-scale corpus in many availableNow
micro-batches and measure the two properties a long-running 100 TB
ingest actually needs:

1. **Per-batch fold wall stays FLAT as the index grows** — the fold
   reads only ``params`` (a 1-row table) plus its own micro-batch and
   writes only its own ``__batch`` partitions, never the accumulated
   postings/assignments. If fold cost grew with index size, a year-long
   ingest would grind to a halt; flatness is the design claim, this
   measures it.
2. **Probe latency degrades with accumulated per-batch file sets and is
   RESTORED by compaction** — the documented maintenance contract
   (task-per-file overhead is the 100 TB killer; `compact_bm25_index` /
   `compact_streaming_partitioned` collapse batch generations while
   keeping the streaming layout).

Prints one JSON line per family:
  {"family": "bm25", "batches": N, "fold_first5_s": .., "fold_last5_s": ..,
   "fold_growth": .., "probe_pre_s": .., "probe_post_s": ..,
   "files_pre": .., "files_post": .., "verdict": "PASS"|"FAIL"}

Verdict: FAIL if fold_growth > 2.0 (last-5 median vs first-5 median,
batch 0 excluded as JVM warmup) or the post-compaction probe is slower
than 1.5x the pre-compaction probe (compaction must never hurt).

Usage: python tools/streaming_smoke.py [--src /tmp/scale_sf1]
       [--batches 25] [--probe-runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _count_files(root: str) -> int:
    n = 0
    for _dir, _sub, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _fold_durations(query) -> list[float]:
    """Per-micro-batch triggerExecution seconds from the finished
    query's progress history (availableNow retains every batch of the
    run up to the 100-entry default)."""
    out = []
    for p in query.recentProgress:
        d = p.get("durationMs", {}) or {}
        ms = d.get("triggerExecution")
        if ms is not None and p.get("numInputRows", 0) > 0:
            out.append(ms / 1000.0)
    return out


def _best_of(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _verdict(rec: dict) -> str:
    ok = rec["fold_growth"] <= 2.0 and (
        rec["probe_post_s"] <= 1.5 * rec["probe_pre_s"]
    )
    return "PASS" if ok else "FAIL"


def run_bm25(spark, src_dir: str, work: str, batches: int, probe_runs: int) -> dict:
    from ubdc_airbnb_spark.operators.tfidf import compact_bm25_index, query_bm25_index
    from ubdc_airbnb_spark.streaming import jobs

    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    src = os.path.join(work, "bm25_src")
    docs.repartition(batches).write.parquet(src)
    idx = os.path.join(work, "bm25_idx")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = jobs.foreach_batch_bm25_append(stream, idx, n_buckets=64)
    folds = _fold_durations(q)

    terms = ["spark", "join", "window"]
    probe_pre = _best_of(
        lambda: query_bm25_index(spark, idx, terms, k=10).collect(), probe_runs
    )
    files_pre = _count_files(os.path.join(idx, "postings"))
    compact_bm25_index(spark, idx)
    files_post = _count_files(os.path.join(idx, "postings"))
    probe_post = _best_of(
        lambda: query_bm25_index(spark, idx, terms, k=10).collect(), probe_runs
    )
    first5 = statistics.median(folds[1:6])
    last5 = statistics.median(folds[-5:])
    rec = {
        "family": "bm25",
        "batches": len(folds),
        "fold_first5_s": round(first5, 3),
        "fold_last5_s": round(last5, 3),
        "fold_growth": round(last5 / first5, 2),
        "probe_pre_s": probe_pre,
        "probe_post_s": probe_post,
        "files_pre": files_pre,
        "files_post": files_post,
    }
    rec["verdict"] = _verdict(rec)
    return rec


def run_ivf(spark, src_dir: str, work: str, batches: int, probe_runs: int) -> dict:
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.ann_index import build_ivf_index, query_ivf_index
    from ubdc_airbnb_spark.sources.layout import compact_streaming_partitioned
    from ubdc_airbnb_spark.streaming import jobs

    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    # bootstrap on ~1/(batches+1) of the corpus (centroids need training),
    # stream the rest
    boot = emb.filter(F.col("vec_id") % (batches + 1) == 0)
    rest = emb.filter(F.col("vec_id") % (batches + 1) != 0)
    idx = os.path.join(work, "ivf_idx")
    build_ivf_index(boot, idx, k=16, iters=2, streaming=True)
    src = os.path.join(work, "ivf_src")
    rest.repartition(batches).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = jobs.foreach_batch_ivf_append(stream, idx)
    folds = _fold_durations(q)

    qs = emb.filter(F.col("vec_id") < 10)
    probe_pre = _best_of(
        lambda: query_ivf_index(spark, idx, qs, k=5, probes=2).collect(), probe_runs
    )
    assignments = os.path.join(idx, "assignments")
    files_pre = _count_files(assignments)
    [p] = spark.read.parquet(os.path.join(idx, "params")).collect()
    compact_streaming_partitioned(
        spark, assignments, ["centroid_id"], marker=p["__max_batch_id"]
    )
    files_post = _count_files(assignments)
    probe_post = _best_of(
        lambda: query_ivf_index(spark, idx, qs, k=5, probes=2).collect(), probe_runs
    )
    first5 = statistics.median(folds[1:6])
    last5 = statistics.median(folds[-5:])
    rec = {
        "family": "ivf",
        "batches": len(folds),
        "fold_first5_s": round(first5, 3),
        "fold_last5_s": round(last5, 3),
        "fold_growth": round(last5 / first5, 2),
        "probe_pre_s": probe_pre,
        "probe_post_s": probe_post,
        "files_pre": files_pre,
        "files_post": files_post,
    }
    rec["verdict"] = _verdict(rec)
    return rec


def run_lsh(spark, src_dir: str, work: str, batches: int, probe_runs: int) -> dict:
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.dedup_index import build_lsh_index, query_lsh_index
    from ubdc_airbnb_spark.sources.layout import compact_streaming_partitioned

    from ubdc_airbnb_spark.streaming import jobs

    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    boot = docs.filter(F.col("doc_id") % (batches + 1) == 0)
    rest = docs.filter(F.col("doc_id") % (batches + 1) != 0)
    idx = os.path.join(work, "lsh_idx")
    build_lsh_index(boot, idx, n_buckets=64, streaming=True)
    src = os.path.join(work, "lsh_src")
    rest.repartition(batches).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = jobs.foreach_batch_lsh_append(stream, idx)
    folds = _fold_durations(q)

    probe = docs.filter(F.col("doc_id") % 100 == 0).limit(40)
    probe_pre = _best_of(
        lambda: query_lsh_index(spark, idx, probe).collect(), probe_runs
    )
    banded = os.path.join(idx, "banded")
    files_pre = _count_files(banded)
    [p] = spark.read.parquet(os.path.join(idx, "params")).collect()
    compact_streaming_partitioned(
        spark, banded, ["key_bucket"], int(p["__max_batch_id"])
    )
    files_post = _count_files(banded)
    probe_post = _best_of(
        lambda: query_lsh_index(spark, idx, probe).collect(), probe_runs
    )
    first5 = statistics.median(folds[1:6])
    last5 = statistics.median(folds[-5:])
    rec = {
        "family": "lsh",
        "batches": len(folds),
        "fold_first5_s": round(first5, 3),
        "fold_last5_s": round(last5, 3),
        "fold_growth": round(last5 / first5, 2),
        "probe_pre_s": probe_pre,
        "probe_post_s": probe_post,
        "files_pre": files_pre,
        "files_post": files_post,
    }
    rec["verdict"] = _verdict(rec)
    return rec


def main() -> int:
    import shutil
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/scale_sf1")
    ap.add_argument("--batches", type=int, default=25)
    ap.add_argument("--probe-runs", type=int, default=3)
    args = ap.parse_args()

    from ubdc_airbnb_spark.session import get_spark

    spark = get_spark("streaming-smoke")
    work = tempfile.mkdtemp(prefix="stream_smoke_")
    try:
        bad = []
        for fn in (run_bm25, run_ivf, run_lsh):
            rec = fn(spark, args.src, work, args.batches, args.probe_runs)
            print(json.dumps(rec))
            if rec["verdict"] != "PASS":
                bad.append(rec["family"])
        print(json.dumps({"verdict": "FAIL" if bad else "PASS", "failed": bad}))
        return 1 if bad else 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
