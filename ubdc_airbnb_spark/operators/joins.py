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

    Implementation for scale: the cover is exploded per distinct prefix
    *length* so the probe becomes an equi-join on ``substring(quadkey, 1,
    len)`` — a broadcast hash join per length, unioned. No LIKE-range scan,
    no cartesian: a 100 TB point table is never shuffled (cover side is
    broadcast) and the probe is codegen'd substring equality.
    """
    lengths = [r[0] for r in covers.select(F.length(prefix_col).alias("l")).distinct().collect()]
    pieces = []
    for ln in sorted(lengths):
        cov_l = covers.filter(F.length(prefix_col) == ln).select(prefix_col).distinct()
        probe = points.withColumn("__qk_trunc", F.substring(F.col(qk_col), 1, ln))
        pieces.append(
            probe.join(
                broadcast(cov_l), probe["__qk_trunc"] == cov_l[prefix_col], "left_semi"
            ).drop("__qk_trunc")
        )
    if not pieces:
        return points.limit(0)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    key = keep or [points.columns[0]]
    return out.dropDuplicates(list(key))


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
