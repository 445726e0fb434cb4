"""Persisted MinHash-LSH dedup index: build the corpus banding ONCE,
then screen every incoming drop against it with a partition-pruned probe
— the `ann_index.py` / `tfidf.build_bm25_index` serve-many pattern
applied to near-duplicate detection.

Why this exists at 100 TB: in-session `lsh_candidate_pairs` re-shingles
and re-hashes the ENTIRE corpus per run; a daily-drop pipeline needs the
corpus side amortized. Layout:

- ``banded/``  — (doc_id, band_id, band_key) parquet, partitioned by
  ``key_bucket = md5_60bit(band_key) % n_buckets`` (the portable bucket
  hash — the probe replays it for pruning).
- ``params/``  — (num_perm, bands, ngram, shingle, n_buckets): the probe
  MUST shingle/hash the new batch with the index's own constants or the
  band keys are meaningless; recording them makes the index
  self-describing.

A probe of a small batch touches only its band keys' bucket partitions
(PartitionFilters, plan-asserted); the candidate join shuffles on
(band_id, band_key) only — Σ|bucket|² cost, never all-pairs. New batches
join the corpus via ``add_to_lsh_index`` (parquet append into touched
partitions only, params untouched — banding constants never change after
build).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from .dedup import banded_signatures, minhash_signatures


def _key_bucket(n_buckets: int) -> F.Column:
    return (md5_long(F.col("band_key")) % n_buckets).cast("int")


def build_lsh_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    ngram: int = 3,
    shingle: str = "word",
    n_buckets: int = 64,
    streaming: bool = False,
    object_store_safe: bool = False,
) -> None:
    """Shingle+MinHash+band the corpus once and persist the banded rows
    bucket-partitioned. Params written LAST (crash leaves no readable
    index, never a half-described one).

    ``streaming=True`` lays the banded rows out one partition level
    deeper — ``key_bucket/__batch`` with the build as generation ``-1``
    — and stamps ``__max_batch_id = -1`` into params, so the index can
    be maintained by ``streaming.jobs.foreach_batch_lsh_append`` (stream
    batch ids start at 0). The probe is unaffected: it selects columns
    by name and partition-prunes on the first level.

    ``object_store_safe=True`` lays both components out as
    manifest-managed generation tables (``sources.layout``), same as
    ``build_bm25_index``: full-table replaces (params marker merges,
    compaction) swap a one-line pointer file instead of renaming
    directories — atomic on S3-class stores. Probes and appends resolve
    components through ``current_path`` transparently."""
    from ..sources.layout import manifest_init

    sigs = minhash_signatures(docs, id_col, text_col, num_perm, ngram, shingle)
    banded = banded_signatures(sigs, id_col, num_perm, bands).withColumn(
        "key_bucket", _key_bucket(n_buckets)
    )
    parts = ["key_bucket"]
    if streaming:
        banded = banded.withColumn("__batch", F.lit(-1).cast("long"))
        parts.append("__batch")
    banded = banded.repartition("key_bucket")
    if object_store_safe:
        manifest_init(banded, os.path.join(path, "banded"), parts)
    else:
        (
            banded.write.mode("overwrite")
            .partitionBy(*parts)
            .parquet(os.path.join(path, "banded"))
        )
    if streaming:
        params = docs.sparkSession.createDataFrame(
            [(num_perm, bands, ngram, shingle, n_buckets, -1)],
            "num_perm int, bands int, ngram int, shingle string, "
            "n_buckets int, __max_batch_id long",
        )
    else:
        params = docs.sparkSession.createDataFrame(
            [(num_perm, bands, ngram, shingle, n_buckets)],
            "num_perm int, bands int, ngram int, shingle string, n_buckets int",
        )
    if object_store_safe:
        manifest_init(params, os.path.join(path, "params"))
    else:
        params.write.mode("overwrite").parquet(os.path.join(path, "params"))


def query_lsh_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """Screen a new batch against the index: band the batch with the
    index's own constants, read ONLY the bucket partitions its band keys
    hash into, equi-join on (band_id, band_key).

    The bucket-id collect is bounded by ``n_buckets`` (not batch size),
    so the driver round-trip is O(1). Output: (corpus_id, new_id)
    distinct candidate pairs — feed them to ``ngram_jaccard_pairs``-style
    verification exactly as with in-session LSH.

    ``max_bucket`` is the PROBE-side viral-bucket guard (r10, VERDICT
    item 3): a corpus band bucket holding a B-member boilerplate cluster
    emits B candidates for EVERY probe doc that lands in it — a hot
    stopword-template bucket turns each daily drop's screen quadratic.
    Same contract as ``lsh_candidate_pairs(max_bucket=)``: corpus
    buckets with more than ``max_bucket`` members are dropped from
    candidate generation (their members are near-exact duplicates at
    extreme multiplicity — ``exact_duplicates`` against the batch
    recovers them in O(B)). The cap costs one map-side-combinable count
    over the PRUNED corpus slice only. Default ``None`` (off)."""
    from ..sources.layout import current_path

    [p] = spark.read.parquet(current_path(os.path.join(path, "params"))).collect()
    sigs = minhash_signatures(
        new_docs, id_col, text_col, p.num_perm, p.ngram, p.shingle
    )
    nb = banded_signatures(sigs, id_col, p.num_perm, p.bands).withColumn(
        "key_bucket", _key_bucket(p.n_buckets)
    )
    buckets = [
        r.key_bucket for r in nb.select("key_bucket").distinct().collect()
    ]  # ≤ n_buckets rows by construction
    corpus = spark.read.parquet(current_path(os.path.join(path, "banded"))).filter(
        F.col("key_bucket").isin(buckets)
    )
    if max_bucket is not None:
        small = (
            corpus.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket)
            .select("band_id", "band_key")
        )
        corpus = corpus.join(small.hint("shuffle_hash"), ["band_id", "band_key"], "left_semi")
    new_side = nb.select(
        F.col(id_col).alias("new_id"), "band_id", "band_key"
    )
    return (
        corpus.select(F.col(id_col).alias("corpus_id"), "band_id", "band_key")
        .join(new_side, ["band_id", "band_key"])
        # a drop that was already folded in must not self-match
        .filter(F.col("corpus_id") != F.col("new_id"))
        .select("corpus_id", "new_id")
        .distinct()
    )


def add_to_lsh_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold a screened batch into the corpus index: band it with the
    index's constants and parquet-append into the touched bucket
    partitions only — no rewrite of existing buckets, params unchanged
    (banding constants are fixed at build).

    Single-appender contract, ENFORCED (r09): the append runs under the
    index root's writer lease — a second concurrent appender raises
    ``LeaseHeld``. Unlike the BM25/IVF adds there is no params
    read-modify-write here, but two jobs appending into one directory
    still race on the shared ``_temporary`` staging dir (the first
    commit's cleanup can delete the second job's staged files)."""
    from ..sources.layout import _writer_lease

    spark = new_docs.sparkSession
    with _writer_lease(path) as lease:
        _add_to_lsh_index_locked(new_docs, path, id_col, text_col, spark, lease)


def _add_to_lsh_index_locked(new_docs, path, id_col, text_col, spark, lease=None):
    from ..sources.layout import current_path

    [p] = spark.read.parquet(current_path(os.path.join(path, "params"))).collect()
    if "__max_batch_id" in p.asDict():
        # streaming-maintained layout: banded rows live one level deeper
        # (key_bucket/__batch) — appending at key_bucket depth would mix
        # partition depths and break discovery on the next read
        raise ValueError(
            "add_to_lsh_index: index at %r is streaming-maintained "
            "(params carries __max_batch_id); use "
            "streaming.jobs.foreach_batch_lsh_append to fold new "
            "documents into it" % path
        )
    sigs = minhash_signatures(
        new_docs, id_col, text_col, p.num_perm, p.ngram, p.shingle
    )
    banded = banded_signatures(sigs, id_col, p.num_perm, p.bands)
    # ownership check BEFORE the append commit (ADVICE r09): no params
    # read-modify-write here, but a second writer appending concurrently
    # still races on the shared _temporary staging dir
    if lease is not None:
        lease.verify()
    (
        # append into the LIVE generation on manifest layouts (a no-op
        # resolver for plain ones) — appends are new files only, so no
        # pointer swap is needed
        banded.withColumn("key_bucket", _key_bucket(p.n_buckets))
        .repartition("key_bucket")
        .write.mode("append")
        .partitionBy("key_bucket")
        .parquet(current_path(os.path.join(path, "banded")))
    )


def compact_lsh_index(spark: SparkSession, path: str) -> int:
    """Small-file compaction for an LSH index's banded table — collapses
    the per-append (or per-micro-batch) file sets into one per
    ``key_bucket`` partition, preserving the layout the probe
    partition-prunes on. Streaming-maintained layouts keep their
    ``__batch`` exactly-once marker (orphaned uncommitted batches are
    dropped so redelivery stays idempotent).

    Single-writer contract, ENFORCED (r10): compaction holds the index
    ROOT's writer lease — the same lease ``add_to_lsh_index`` takes —
    so an appender arriving mid-compaction raises ``LeaseHeld`` loudly
    and retries after, instead of appending files into a banded tree
    the rename-swap is about to discard. Returns the parquet file count
    after compaction."""
    from ..sources.layout import (
        _writer_lease,
        compact_partitioned,
        compact_streaming_partitioned,
        current_path,
    )

    with _writer_lease(path):
        [p] = spark.read.parquet(current_path(os.path.join(path, "params"))).collect()
        d = p.asDict()
        base = os.path.join(path, "banded")
        if "__max_batch_id" in d:
            return compact_streaming_partitioned(
                spark, base, ["key_bucket"], int(d["__max_batch_id"])
            )
        return compact_partitioned(spark, base, ["key_bucket"])
