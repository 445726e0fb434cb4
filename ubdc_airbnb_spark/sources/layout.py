"""Data-layout utilities for the lakehouse tables (SURVEY §4: the
reference's B-tree/GIN indexes become partition pruning + min/max stats
+ co-located buckets).

- ``write_clustered``  — range-partition + sort on the cluster keys so
  every output file owns a tight min/max range: filters on those keys
  prune at file/row-group level (the Z-ORDER-lite that parquet stats
  give for free; for multi-dim locality, cluster by the quadkey string,
  which IS a Z-order curve — interleaved x/y bits).
- ``write_bucketed``   — hash-bucketed + sorted table so equi-joins and
  aggregations on the bucket key run with NO shuffle on either side
  (verified by plan assertion in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 16,
) -> None:
    """Range-partition by the cluster keys and sort within partitions;
    each parquet file then covers a disjoint key range (checked via
    footer stats in tests) so predicate pushdown skips whole files."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


#: Pointer file name for manifest-managed tables (generation layout).
MANIFEST = "CURRENT"


def current_path(base: str) -> str:
    """Resolve the ACTIVE generation of a manifest-managed table; plain
    parquet directories resolve to themselves (back-compat no-op).

    Manifest layout: ``base/gen-<n>/`` immutable generation directories
    plus ``base/CURRENT`` — a one-line JSON pointer naming the live
    generation. Readers go through this resolver, so replacing a table
    is one small-file swap instead of a directory rename: on POSIX the
    pointer is ``os.replace``d (atomic); on S3-class object stores it is
    a single-key PUT (atomic per key), which directory rename-swap is
    NOT (rename there is copy+delete, with a visible window where the
    table is missing). See SCALE.md §atomic-swap."""
    import json
    import os

    m = os.path.join(base.rstrip("/"), MANIFEST)
    if os.path.exists(m):
        with open(m) as f:
            gen = json.load(f)["generation"]
        return os.path.join(base.rstrip("/"), gen)
    return base


def is_manifest_table(base: str) -> bool:
    import os

    return os.path.exists(os.path.join(base.rstrip("/"), MANIFEST))


class LeaseHeld(RuntimeError):
    """A second writer attempted a manifest write while another holds
    the table's writer lease. The manifest contract is single-writer
    (two racing replaces are last-pointer-PUT-wins: the loser's
    generation silently becomes an orphan); the lease turns that silent
    loss into THIS loud failure."""


class _Lease:
    """A held writer lease: nonce-owned, expiry-refreshed.

    The lease file carries ``{pid, expires, nonce}``. The nonce is the
    ownership token (r09, was pid+expiry only): every mutation of the
    lease file first checks the on-disk nonce is ours, so a holder whose
    expired lease was broken by a second writer discovers the loss
    LOUDLY (:class:`LeaseHeld`) instead of deleting the new holder's
    lease and admitting a third writer. While held, a daemon thread
    refreshes the expiry every ``ttl/3`` seconds, so a healthy write
    longer than the TTL keeps its lease live (the TTL only fences
    CRASHED holders — a refresher dies with its process)."""

    def __init__(self, path: str, ttl_sec: float):
        import uuid

        self.path = path
        self.ttl_sec = ttl_sec
        self.nonce = uuid.uuid4().hex
        self._stop = None  # threading.Event once the refresher starts

    def _payload(self) -> dict:
        import os
        import time

        return {
            "pid": os.getpid(),
            "expires": time.time() + self.ttl_sec,
            "nonce": self.nonce,
        }

    def _on_disk(self) -> dict:
        import json

        try:
            with open(self.path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _on_disk_nonce(self):
        return self._on_disk().get("nonce")

    def verify(self) -> None:
        """Raise :class:`LeaseHeld` unless the on-disk lease is still
        OURS — call before any irreversible step (the pointer swap)."""
        got = self._on_disk_nonce()
        if got != self.nonce:
            raise LeaseHeld(
                f"writer lease {self.path!r} no longer ours (on-disk "
                f"nonce {got!r}): a second writer broke it — likely the "
                "write outlived the TTL without a refresh, or the lease "
                "file was removed by hand; aborting before the pointer "
                "swap so no generation is silently lost"
            )

    def refresh(self) -> None:
        """Re-stamp the expiry (nonce-checked; tmp+replace so readers
        never see a torn lease file).

        TOCTOU guard (ADVICE r09): verify-then-replace leaves a window
        where a usurper legally breaks a genuinely-EXPIRED lease between
        our read and our ``os.replace`` — and the old holder's replace
        would then clobber the usurper's lease file, admitting a third
        writer. Two mitigations, best-effort CAS on a filesystem with
        no compare-and-swap: (a) if the on-disk lease is already past
        its expiry when we wake (process suspension, refresher stall),
        treat ownership as LOST — a breaker may be mid-takeover — and
        raise instead of replacing; (b) after the replace, re-read: a
        foreign nonce means a usurper replaced after us and wins —
        stop touching the file."""
        import json
        import os
        import time
        import uuid

        info = self._on_disk()
        if info.get("nonce") != self.nonce:
            raise LeaseHeld(
                f"writer lease {self.path!r} no longer ours (on-disk "
                f"nonce {info.get('nonce')!r}): a second writer broke "
                "it; refresher stopping"
            )
        if float(info.get("expires", 0)) <= time.time():
            # our own lease is expired on disk: a breaker may be racing
            # us RIGHT NOW (remove+create is not atomic) — replacing
            # here could clobber the new holder's lease. Concede.
            raise LeaseHeld(
                f"writer lease {self.path!r} expired on disk before the "
                "refresh landed (refresher stalled past the TTL); "
                "conceding ownership instead of racing a breaker"
            )
        tmp = self.path + ".%s.tmp" % uuid.uuid4().hex[:8]
        with open(tmp, "w") as f:
            json.dump(self._payload(), f)
        os.replace(tmp, self.path)
        if self._on_disk_nonce() != self.nonce:
            # a usurper replaced after us — they win; never touch again
            raise LeaseHeld(
                f"writer lease {self.path!r} taken over during refresh"
            )

    def _start_refresher(self) -> None:
        import threading

        self._stop = threading.Event()
        period = max(1.0, self.ttl_sec / 3.0)

        def _run() -> None:
            while not self._stop.wait(period):
                try:
                    self.refresh()
                except LeaseHeld:
                    return  # lost ownership: stop touching the file
                except OSError:
                    pass  # transient fs error: retry next period

        t = threading.Thread(target=_run, daemon=True, name="writer-lease-refresh")
        t.start()
        self._thread = t

    def _release(self) -> None:
        import os

        if self._stop is not None:
            self._stop.set()
            # join BEFORE the conditional remove, and skip the remove if
            # the refresher is somehow still alive (wedged filesystem):
            # an in-flight os.replace racing the remove would resurrect
            # a just-released lease and block new writers for a full TTL
            # (ADVICE r09). Skipping the remove is safe and bounded —
            # the lease then expires naturally, the same worst case the
            # resurrection hazard had, without the race.
            self._thread.join(timeout=5.0)
            if self._thread.is_alive():
                return
        # conditional remove: only delete the lease if it is still OURS —
        # an unconditional remove here was the ADVICE r09 medium finding
        # (deleting the new holder's lease admits a third writer)
        if self._on_disk_nonce() == self.nonce:
            try:
                os.remove(self.path)
            except OSError:
                pass


def _writer_lease(base: str, ttl_sec: float = 600.0):
    """Context manager: acquire ``base/.writer-lease`` via atomic
    create-exclusive (``O_CREAT|O_EXCL`` — the conditional-PUT /
    If-None-Match analog on object stores), holding pid + expiry +
    a per-acquire ownership nonce. Yields the :class:`_Lease`.

    - live lease held by someone else → raise :class:`LeaseHeld`
      (loud, immediately — no waiting).
    - expired lease (holder crashed mid-write) → break it and take
      over. Breaking is best-effort: two breakers racing on the same
      expired lease can still collide (remove/create is not one atomic
      step), which is acceptable for a guard whose job is converting
      the COMMON silent-loss case into an error — the underlying
      contract remains single-writer.
    - while held, the expiry is refreshed every ``ttl/3`` s by a daemon
      thread, so a healthy long write keeps its lease (r09; the TTL now
      only fences crashed holders).
    - released on exit, success or failure — but only if the on-disk
      nonce is still ours (never deletes a usurper's lease)."""
    import contextlib
    import json
    import os
    import time

    @contextlib.contextmanager
    def _cm():
        os.makedirs(base.rstrip("/"), exist_ok=True)  # bootstrap writers
        path = os.path.join(base.rstrip("/"), ".writer-lease")
        lease = _Lease(path, ttl_sec)
        now = time.time()
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                with open(path) as f:
                    info = json.load(f)
            except (OSError, ValueError):
                info = {}
            if float(info.get("expires", 0)) > now:
                raise LeaseHeld(
                    f"manifest table {base!r} writer lease held by pid "
                    f"{info.get('pid')} (expires in "
                    f"{float(info['expires']) - now:.0f}s); a concurrent "
                    "manifest write would silently lose a generation — "
                    "wait for the holder or remove .writer-lease if it "
                    "is known dead"
                )
            try:  # expired: break and take over
                os.remove(path)
            except FileNotFoundError:
                pass
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            json.dump(lease._payload(), f)
        lease._start_refresher()
        try:
            yield lease
        finally:
            lease._release()

    return _cm()


def manifest_replace(
    write_fn, base: str, retention: int = 1, ttl_sec: float = 600.0
) -> str:
    """Atomically replace a manifest-managed table's contents — the
    object-store-safe counterpart of the rename-swap in
    ``upsert.replace_parquet``.

    ``write_fn(dest)`` writes the complete new table into a FRESH
    generation directory (never touching the live one); then the
    ``CURRENT`` pointer file is atomically replaced. The pointer JSON
    carries a ``history`` of superseded generations (most recent last):
    the last ``retention`` of those survive each replace, so a reader
    that resolved :func:`current_path` just before the swap keeps a
    live directory for at least ``retention`` more replace cycles —
    no maintenance-window coordination needed for plain readers.
    Everything else — older history AND orphan generations from crashed
    ``write_fn`` attempts (present on disk but never in the history) —
    is GC'd. Crash windows:

    - during ``write_fn`` → half-written orphan generation; the pointer
      still names the old generation, readers unaffected; the orphan is
      GC'd by the next successful replace (or ``manifest_gc``).
    - after the pointer swap, before GC → extra generations exist,
      readers already see the new one; next replace GCs them.

    There is NO window where the table is missing or partial — the
    property rename-swap loses on object storage. Generation names are
    ``gen-<seq>-<nonce>``: the zero-padded sequence keeps lexical
    ordering, the random nonce makes two racing replaces land in
    DIFFERENT directories instead of silently overwriting each other.
    The single-writer contract is ENFORCED (r08): a writer lease
    (``.writer-lease``, create-exclusive, pid + expiry) makes a second
    concurrent replace raise :class:`LeaseHeld` loudly instead of
    last-pointer-PUT-wins silently orphaning the loser's generation; a
    crashed holder's lease expires and is broken by the next writer.
    r09: the lease is nonce-owned and auto-refreshed every ``ttl/3`` s
    while ``write_fn`` runs (long writes no longer outlive their lease),
    ownership is re-verified immediately before the pointer swap (a
    usurped lease aborts loudly, leaving only an orphan generation), and
    release never deletes a lease that is no longer ours. ``ttl_sec``
    tunes the crash-fencing window. Returns the new generation's path."""
    import json
    import os
    import shutil
    import uuid

    b = base.rstrip("/")
    os.makedirs(b, exist_ok=True)
    with _writer_lease(b, ttl_sec=ttl_sec) as lease:
        cur = os.path.join(b, MANIFEST)
        prev_live, history = None, []
        if os.path.exists(cur):
            with open(cur) as f:
                m = json.load(f)
            prev_live = m["generation"]
            history = list(m.get("history", []))
        gens = sorted(d for d in os.listdir(b) if d.startswith("gen-"))
        seq = (int(gens[-1].split("-")[1]) + 1) if gens else 0
        nxt = "gen-%08d-%s" % (seq, uuid.uuid4().hex[:8])
        dest = os.path.join(b, nxt)
        write_fn(dest)
        if prev_live is not None:
            history.append(prev_live)
        kept = history[-retention:] if retention > 0 else []
        # last ownership check before the irreversible step: if a second
        # writer usurped the lease during write_fn, abort — our finished
        # generation stays an orphan (GC'd later) and the pointer is
        # never contested
        lease.verify()
        tmp = cur + ".%s.tmp" % uuid.uuid4().hex[:8]
        with open(tmp, "w") as f:
            json.dump({"generation": nxt, "history": kept}, f)
        os.replace(tmp, cur)  # POSIX-atomic; object store: one single-key PUT
        keep = set(kept) | {nxt}
        for d in gens:  # GC orphans + history past the retention window
            if d not in keep:
                shutil.rmtree(os.path.join(b, d), ignore_errors=True)
    return dest


def manifest_init(df: DataFrame, base: str, partition_cols: Sequence[str] = ()) -> str:
    """First write of a manifest-managed table (generation 0 + pointer)."""

    def _w(dest: str) -> None:
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(dest)

    return manifest_replace(_w, base)


def manifest_gc(base: str, retention: int = 0) -> int:
    """Drop orphan generations (crashed replaces) and history past
    ``retention`` without writing data; keeps the pointed-at generation
    plus the last ``retention`` superseded ones. Returns the number
    removed."""
    import json
    import os
    import shutil
    import uuid

    b = base.rstrip("/")
    cur = os.path.join(b, MANIFEST)
    if not os.path.exists(cur):
        return 0
    with _writer_lease(b) as lease:  # GC rewrites the pointer: same writer contract
        with open(cur) as f:
            m = json.load(f)
        live = m["generation"]
        history = list(m.get("history", []))
        kept = history[-retention:] if retention > 0 else []
        keep = set(kept) | {live}
        n = 0
        for d in sorted(os.listdir(b)):
            if d.startswith("gen-") and d not in keep:
                shutil.rmtree(os.path.join(b, d), ignore_errors=True)
                n += 1
        if kept != history:
            lease.verify()
            tmp = cur + ".%s.tmp" % uuid.uuid4().hex[:8]
            with open(tmp, "w") as f:
                json.dump({"generation": live, "history": kept}, f)
            os.replace(tmp, cur)
    return n


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
) -> None:
    """Persist as a bucketed+sorted catalog table. Two tables bucketed
    the same way join with zero Exchange — the co-located join the
    reference can't express (Postgres always re-hashes)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def compact(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    preserve_sort: list[str] | None = None,
) -> int:
    """Small-file compaction — the table-maintenance pass every
    streaming/incremental sink needs: micro-batches and MERGEs leave
    thousands of KB-sized files, and at 100 TB the scan's task-per-file
    overhead (and the NameNode/manifest pressure) dominates. Rewrites
    the table into ceil(bytes / target) files (optionally re-sorted so
    min/max stats stay tight), with the same temp-write + rename-swap
    discipline as upsert_parquet — readers never observe a partial
    table. Returns the new file count."""
    import math
    import os

    from ..operators.upsert import replace_parquet

    base = path.rstrip("/")
    # manifest-managed tables: size-walk and read the LIVE generation
    # only (walking base would read the CURRENT pointer as parquet and
    # double-count any retained/orphan generation); the write below
    # routes through replace_parquet, which already swaps manifest
    # tables via the pointer.
    src = current_path(base) if is_manifest_table(base) else base
    total = 0
    for root, _dirs, files in os.walk(src):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    if preserve_sort:
        df = df.repartitionByRange(n_files, *preserve_sort).sortWithinPartitions(
            *preserve_sort
        )
    else:
        df = df.coalesce(n_files)
    replace_parquet(df, base)
    return n_files


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int = 8,
    salt: str = "shuffle",
) -> "DataFrame":
    """Write a training-ready sharded corpus: rows get a deterministic
    (shard, position) from ``deterministic_shuffle`` (salted content
    hash — reproducible epoch order with no RNG), land partitioned by
    shard with rows sorted by position inside each shard file set, and
    a ``_manifest`` parquet records per-shard row counts, token-free
    integrity checksums (md5-60bit XOR of the key), and the position
    extent — what a distributed trainer needs to (a) assign shards to
    workers, (b) verify a shard replica before an epoch, (c) resume
    mid-epoch by position.

    Scale shape: ONE shuffle (the shard hash partition; the within-shard
    sort rides the same exchange via sortWithinPartitions), manifest is
    an n_shards-row aggregate. Readers prune to their shard via the
    partition column.

    Returns the manifest DataFrame.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import md5_long
    from ..operators.sampling import deterministic_shuffle

    sharded = deterministic_shuffle(df, key, n_shards, salt=salt)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("position")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path + "/data")
    )
    spark = df.sparkSession
    manifest = (
        spark.read.parquet(path + "/data")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor(md5_long(F.col(key).cast("string"))).cast("long").alias("key_xor"),
            F.min("position").cast("long").alias("min_pos"),
            F.max("position").cast("long").alias("max_pos"),
        )
        .withColumn("key_col", F.lit(key))
    )
    manifest.write.mode("overwrite").parquet(path + "/_manifest")
    return spark.read.parquet(path + "/_manifest")


def read_training_shard(spark, path: str, shard: int) -> DataFrame:
    """Read ONE shard in training order, verifying it against the
    manifest (count + key checksum) before returning — a corrupted or
    partially-replicated shard fails loudly instead of silently training
    on half the data."""
    from pyspark.sql import functions as F

    from ..functions.hashing import md5_long

    data = spark.read.parquet(path + "/data").filter(F.col("shard") == shard)
    man = (
        spark.read.parquet(path + "/_manifest")
        .filter(F.col("shard") == shard)
        .first()
    )
    if man is None:
        raise ValueError(f"shard {shard} missing from manifest")
    key_col = man.key_col
    got = data.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.bit_xor(md5_long(F.col(key_col).cast("string"))).cast("long").alias("x"),
    ).first()
    if (got.n, got.x) != (man.n_rows, man.key_xor):
        raise ValueError(
            f"shard {shard} integrity mismatch: rows {got.n}!={man.n_rows} "
            f"or checksum {got.x}!={man.key_xor}"
        )
    return data.orderBy("position")


def compact_partitioned(
    spark,
    path: str,
    partition_cols: Sequence[str],
) -> int:
    """Small-file compaction for a PARTITIONED parquet table — the
    maintenance pass for append-style index layouts (`add_to_ivf_index`
    buckets on centroid_id, `add_to_lsh_index` on key_bucket): each
    incremental drop appends a fresh file set into every touched
    partition, so a long append history accumulates thousands of small
    files and the probe's task-per-file overhead dominates the read.

    Rewrites the table to ONE file set per partition value (the
    repartition shuffles rows onto their partition key, so each output
    directory is written by a single task), preserving the directory
    layout the readers partition-prune on. Same temp-write +
    rename-swap discipline as :func:`compact`: the compacted tree is
    durable before the swap, readers never see a partial table, a crash
    leaves a recoverable ``.__old__``. Run between appends (the
    standard maintenance-window contract). Returns the parquet file
    count after compaction."""
    import os
    import shutil

    from ..operators.upsert import recover_swap

    base = path.rstrip("/")
    cols = list(partition_cols)
    if is_manifest_table(base):
        # object-store-safe path: new generation + pointer swap (crashed
        # prior attempts left only orphan generations — GC'd on success)
        df = spark.read.parquet(current_path(base)).repartition(
            *[F.col(c) for c in cols]
        )
        dest = manifest_replace(
            lambda d: df.write.mode("overwrite").partitionBy(*cols).parquet(d),
            base,
        )
        n = 0
        for _root, _dirs, files in os.walk(dest):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n
    # a prior compaction crashed between its two renames → no table at
    # base; the IVF/LSH probes don't self-repair, so repair before
    # reading (recover_swap handles all three crash states)
    recover_swap(base)
    df = spark.read.parquet(base).repartition(*[F.col(c) for c in cols])
    tmp, old = base + ".__tmp__", base + ".__old__"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    df.write.mode("overwrite").partitionBy(*cols).parquet(tmp)
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old, ignore_errors=True)
    n = 0
    for _root, _dirs, files in os.walk(base):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_streaming_partitioned(
    spark,
    path: str,
    partition_cols: Sequence[str],
    marker: int,
) -> int:
    """:func:`compact_partitioned` for a STREAMING-maintained layout
    (``foreach_batch_*_append``): every micro-batch leaves one file set
    per touched ``(*partition_cols, __batch)`` partition, so a long
    ingest accumulates thousands of small files. Collapses every batch
    generation into ONE per first-level partition value, KEEPING the
    ``__batch`` level (at the current ``marker`` value) so ingestion
    continues afterwards with higher batch ids.

    Orphan discipline (the crashed-ingest case): partitions with
    ``__batch > marker`` were written by a batch that never committed to
    ``params`` — the stream WILL redeliver that batch, and its dynamic
    partition overwrite is what makes redelivery idempotent. Folding
    orphans into the durable generation would turn that redelivery into
    a double-append, so they are dropped here instead. Self-repairs a
    half-done rename swap at entry (recover_swap). Returns the parquet
    file count after compaction."""
    import os
    import shutil

    from ..operators.upsert import recover_swap

    base = path.rstrip("/")
    if is_manifest_table(base):
        df = (
            spark.read.parquet(current_path(base))
            .filter(F.col("__batch") <= marker)
            .withColumn("__batch", F.lit(marker).cast("long"))
            .repartition(*[F.col(c) for c in partition_cols])
        )
        dest = manifest_replace(
            lambda d: df.write.mode("overwrite")
            .partitionBy(*partition_cols, "__batch")
            .parquet(d),
            base,
        )
        n = 0
        for _root, _dirs, files in os.walk(dest):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n
    recover_swap(base)
    cols = list(partition_cols)
    df = (
        spark.read.parquet(base)
        .filter(F.col("__batch") <= marker)
        .withColumn("__batch", F.lit(marker).cast("long"))
        .repartition(*[F.col(c) for c in cols])
    )
    tmp, old = base + ".__tmp__", base + ".__old__"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    df.write.mode("overwrite").partitionBy(*cols, "__batch").parquet(tmp)
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old, ignore_errors=True)
    n = 0
    for _root, _dirs, files in os.walk(base):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n
