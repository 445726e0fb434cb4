"""Upsert / MERGE operators (SURVEY §2.3 J10-J11).

The reference's ``get_or_create`` / ``update_or_create`` / moved-listing
audit become set-based MERGE semantics. On a lakehouse these are Delta /
Iceberg ``MERGE INTO`` (ACID, file-level conflict detection); this module
implements the same semantics engine-side as DataFrame algebra so the
logic is testable without a table format, plus a parquet-backed
table helper. At 100 TB the merge is a single shuffle-on-key full outer
join — or with AQE + partitioned storage, a dynamic-partition-overwrite
touching only affected partitions."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """J10: MERGE — WHEN MATCHED UPDATE (source wins), WHEN NOT MATCHED
    INSERT. Equivalent to ``source UNION ALL (target ANTI JOIN source)``,
    which Catalyst executes with one shuffle of each side on ``keys``
    (ref get_or_create/update_or_create sites: workunits.py:145,
    managers.py:241-264,356-363)."""
    keys = list(keys)
    # SHUFFLE_HASH hint: source is same-scale as target by contract (a
    # batch merging into a table), and Catalyst's post-distinct size
    # estimate is unreliably small — unhinted the key set gets broadcast
    # (driver-OOM at corpus scale, caught by the 100x plan audit).
    # Hash-partitioned join keeps that safety; hashing the narrow key
    # set skips the two sort passes a MERGE hint would add.
    kept_target = target.join(
        source.select(*keys).distinct().hint("shuffle_hash"), keys, "left_anti"
    )
    return source.select(*target.columns).unionByName(kept_target)


def insert_if_absent(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """J10 (get_or_create flavor): WHEN NOT MATCHED INSERT only — existing
    target rows win (placeholder-user semantics, ref managers.py:241-264)."""
    keys = list(keys)
    # same-scale contract as upsert(): never broadcast the key set
    new_rows = source.join(
        target.select(*keys).distinct().hint("shuffle_hash"), keys, "left_anti"
    )
    return target.unionByName(new_rows.select(*target.columns))


def change_detect_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    changed: Column,
    update_cols: Sequence[str],
    audit_col: str | None = None,
    audit_value: Column | None = None,
) -> DataFrame:
    """J11: MERGE with a change predicate + audit trail — the
    moved-listing upsert (ref workunits.py:124-164): new key → insert;
    matched and ``changed`` (e.g. moved > 150 m) → update + append audit
    entry; matched and unchanged → keep target row.

    ``changed`` may reference ``target.<col>`` as ``F.col("t." + c)`` and
    source columns as ``F.col("s." + c)``.
    """
    keys = list(keys)
    # explicit presence markers: insert/match classification must not key on
    # data-column nullability (a matched row with a legitimately-NULL update
    # column is NOT an insert)
    t = target.withColumn("__t", F.lit(True)).alias("t")
    s = source.withColumn("__s", F.lit(True)).alias("s")
    joined = t.join(s, keys, "full_outer")

    is_insert = F.col("t.__t").isNull() & F.col("s.__s").isNotNull()
    take_source = is_insert | F.coalesce(changed, F.lit(False))

    out_cols: list[Column] = [F.col(k).alias(k) for k in keys]
    for c in target.columns:
        if c in keys:
            continue
        if c in update_cols:
            out_cols.append(
                F.when(take_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        elif audit_col is not None and c == audit_col:
            out_cols.append(
                F.when(
                    F.coalesce(changed, F.lit(False)) & ~is_insert,
                    F.concat(
                        F.coalesce(F.col(f"t.{c}"), F.array().cast(target.schema[c].dataType)),
                        F.array(audit_value),
                    ),
                )
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
    return joined.select(*out_cols)


def upsert_parquet(
    spark_df: DataFrame,
    path: str,
    keys: Sequence[str],
) -> None:
    """Parquet-backed table upsert: read-merge-swap. A stand-in for Delta
    ``MERGE INTO`` when no transactional format is available; at cluster
    scale use a transactional table format (or dynamic partition overwrite
    on a partitioned table).

    The merged frame is fully written to a sibling temp directory *before*
    the original is touched, then swapped in with directory renames — never
    an overwrite of the files the merge plan is still reading (a cache
    eviction or executor loss mid-overwrite would otherwise recompute from
    half-deleted inputs). A crash between the two renames leaves the old
    table at ``<path>.__old__``, recoverable by hand."""
    import os
    import shutil

    spark = spark_df.sparkSession
    # 'first write' only on a VERIFIED missing table (after repairing any
    # interrupted swap) — a transient read error must re-raise, not
    # silently replace the table with just this batch (the jobs.py
    # foreach_batch_incremental_agg discipline, ADVICE r2).
    if not recover_swap(path):
        spark_df.write.mode("overwrite").parquet(path)
        return
    existing = spark.read.parquet(path)  # real errors re-raise
    merged = upsert(existing, spark_df, keys)
    _swap_write(merged, path)


def replace_parquet(spark_df: DataFrame, path: str) -> None:
    """Full-table atomic replace — for tables whose new state is
    computed wholesale (grid subdivision removes parents; AOI delete
    removes rows), where a keyed MERGE can't express row removal.

    Plain directories use the temp-write + rename-swap discipline of
    :func:`upsert_parquet` (POSIX-atomic). Manifest-managed tables
    (``sources.layout`` generation layout) swap by atomically rewriting
    the small ``CURRENT`` pointer file instead — the object-store-safe
    path, where directory rename is copy+delete and leaves a window
    with no table at all (SCALE.md §atomic-swap)."""
    import os

    from ..sources.layout import is_manifest_table, manifest_replace

    base = path.rstrip("/")
    if is_manifest_table(base):
        manifest_replace(
            lambda dest: spark_df.write.mode("overwrite").parquet(dest), base
        )
        return
    if not os.path.exists(base):
        spark_df.write.mode("overwrite").parquet(path)
        return
    _swap_write(spark_df, path)


def _swap_write(df: DataFrame, path: str) -> None:
    import os
    import shutil

    base = path.rstrip("/")
    tmp, old = base + ".__tmp__", base + ".__old__"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)  # durable before the swap
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old, ignore_errors=True)


def recover_swap(path: str) -> bool:
    """Repair the on-disk state after a crash anywhere inside
    :func:`_swap_write` and report whether a table now exists at ``path``.

    Swap sequence & crash states: (a) ``base``+``tmp`` — tmp may be
    partial, base is the truth → drop tmp; (b) ``old``+``tmp`` (between
    the two renames) — tmp was fully written before the swap began →
    promote tmp; (c) ``base``+``old`` — swap finished, cleanup didn't →
    drop old. Callers that treat a missing path as 'first write' MUST
    call this first, otherwise state (b) silently discards all history
    (ADVICE r2)."""
    import os
    import shutil

    base = path.rstrip("/")
    tmp, old = base + ".__tmp__", base + ".__old__"
    if os.path.exists(base):
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        return True
    if os.path.exists(tmp) and os.path.exists(old):
        os.rename(tmp, base)
        shutil.rmtree(old, ignore_errors=True)
        return True
    if os.path.exists(old):
        os.rename(old, base)
        return True
    shutil.rmtree(tmp, ignore_errors=True)  # lone partial tmp: not trustworthy
    return False
