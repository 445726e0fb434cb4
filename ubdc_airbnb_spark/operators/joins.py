"""Join operators (SURVEY §2.3): semi/anti joins, bridge joins, and the
quadkey-prefix spatial join kernel.

Equi-joins are left to Catalyst (broadcast / sort-merge / AQE skew
handling). The custom piece is the prefix join: point-in-polygon at scale
becomes (a) broadcast the polygon's quadkey tile cover, (b) equi-join on
truncated quadkey — which Catalyst executes as a broadcast hash join with
no shuffle of the big side — then (c) an exact geometry test only for
boundary tiles."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def semi_join(df: DataFrame, other: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J4/J5/J7: EXISTS / IN (ref operations/grids.py:130-139,
    bookings.py:53-56)."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J6: NOT IN in-flight dedup (ref operations/reviews.py:116-117)."""
    return df.join(other, on, "left_anti")


def bridge_join(
    left: DataFrame,
    bridge: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """J9: M2M traversal through a two-column bridge table
    (ref models.py:478,517-518)."""
    return left.join(bridge, left_key).join(right, right_key)


def prefix_filter(
    points: DataFrame, prefixes: list[str], qk_col: str = "quadkey"
) -> DataFrame:
    """J1 fast path: driver-resident cover → pure codegen'd filter
    ``substring(qk,1,len) IN <hash-set>`` per distinct length. No join,
    no shuffle, no dedup; the predicate is pushed into the scan stage."""
    per_len: dict[int, list[str]] = {}
    for p in prefixes:
        per_len.setdefault(len(p), []).append(p)
    cond = None
    for ln, ps in sorted(per_len.items()):
        piece = F.substring(F.col(qk_col), 1, ln).isin(ps)
        cond = piece if cond is None else (cond | piece)
    return points.filter(cond) if cond is not None else points.limit(0)


def prefix_semi_join(
    points: DataFrame,
    covers: DataFrame,
    qk_col: str = "quadkey",
    prefix_col: str = "qk_prefix",
    keep: Sequence[str] | None = None,
) -> DataFrame:
    """J1 kernel: keep points whose quadkey has any cover prefix as an
    ancestor (point-in-tile-cover; ref AOIShape.listings models.py:196-198
    via PostGIS ST_Intersects).

    Implementation for scale: the probe is grouped by distinct prefix
    *length* so membership becomes ``substring(quadkey, 1, len) IN
    <set>``. When the cover fits on the driver (the designed case — tile
    covers are thousands of keys) this compiles to a pure codegen'd
    hash-set filter over the scan: zero shuffles, zero joins, and no
    dedup pass (each point is emitted once regardless of how many
    prefixes match). Covers too big to collect fall back to a broadcast
    equi-join on the exploded per-length truncations.
    """
    cover_rows = covers.select(prefix_col).distinct()
    sample = cover_rows.take(100_001)  # one job: fetch-or-overflow probe
    if not sample:
        return points.limit(0)
    if len(sample) <= 100_000:
        return prefix_filter(points, [r[0] for r in sample], qk_col)
    # big-cover fallback: explode per-length truncations, one broadcast semi-join
    lengths = [r[0] for r in cover_rows.select(F.length(prefix_col).alias("l")).distinct().collect()]
    truncs = F.array(*[F.substring(F.col(qk_col), 1, ln) for ln in sorted(lengths)])
    probe = points.withColumn("__trunc", F.explode(truncs))
    hit = probe.join(
        broadcast(cover_rows), probe["__trunc"] == cover_rows[prefix_col], "left_semi"
    ).drop("__trunc")
    key = keep or [points.columns[0]]
    return hit.dropDuplicates(list(key))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-mitigating equi-join: salt the big side's key with a
    deterministic bucket (``pmod(hash(row), salt)``) and replicate the
    small side across all salt values, so one hot key spreads over
    ``salt`` reducers instead of melting a single task.

    Use when a key's frequency is pathological and AQE's skew-join split
    (enabled in session.py) isn't available — e.g. non-sort-merge plans
    or deliberate pre-partitioning. Results are identical to a plain
    join on ``key``."""
    salted_big = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_big.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def flagged_cover_semi_join(
    points: DataFrame,
    aoi_covers: DataFrame,
    flag_col: str,
    qk_col: str = "quadkey",
    prefix_col: str = "qk_prefix",
    keep: Sequence[str] | None = None,
) -> DataFrame:
    """J2: ``for_purpose(purpose)`` — union the covers of AOIs with the
    given flag set, then one semi-join (ref managers.py:200-224: ST_Union
    of flagged-AOI geoms + intersects). Union-of-covers = distinct prefix
    set, so the "geometric union aggregate" (A3) degenerates to a cheap
    dropDuplicates on the broadcast side."""
    cover = aoi_covers.filter(F.col(flag_col)).select(prefix_col).distinct()
    return prefix_semi_join(points, cover, qk_col, prefix_col, keep)
