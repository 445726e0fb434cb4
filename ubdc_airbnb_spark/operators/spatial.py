"""Spatial join operators (SURVEY §2.3 J1-J5, §2.4 A3): the quadkey-
bucketed point-in-polygon join and its building blocks.

Design for 100 TB: polygons (AOIs) are few and small; points (listings)
are the big table. Every join here therefore:

1. computes the AOI's quadkey *tile cover* once, driver-side
   (functions/geometry.tile_cover) — interior tiles vs boundary tiles;
2. broadcasts the cover and prefix-semi-joins the point table on
   native substring equality (operators/joins.prefix_semi_join) — the
   point table is never shuffled;
3. runs the exact ray-casting test ONLY for points that fell in boundary
   tiles, as a vectorized numpy pandas UDF over Arrow batches.

Interior-tile hits skip step 3 entirely, so the Python path touches a
thin boundary band whose area shrinks 2× per extra cover depth.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import broadcast, pandas_udf

from ..functions import geometry as geo
from ..functions.quadkey import lonlat_to_quadkey


def aoi_cover_df(
    spark,
    aois: list[tuple[int, str]],
    depth: int = 12,
) -> DataFrame:
    """Compute (aoi_id, qk_prefix, is_boundary) tile covers for a list of
    (aoi_id, wkt) polygons. Driver-side: AOIs are the small side by
    design (ref ingests them one file at a time — models.py:76-150)."""
    rows = []
    for aoi_id, wkt in aois:
        mp = geo.parse_wkt(wkt)
        for qk in geo.tile_cover(mp, depth):
            west, south, east, north = geo.quadkey_bbox(qk)
            corners_in = all(
                geo.point_in_multipolygon(x, y, mp)
                for x, y in [(west, south), (east, south), (east, north), (west, north)]
            )
            rows.append((aoi_id, qk, not corners_in))
    return spark.createDataFrame(
        rows, "aoi_id long, qk_prefix string, is_boundary boolean"
    )


def make_point_in_polygon_udf(wkt: str):
    """Vectorized exact point-in-polygon test for one polygon; the
    polygon is parsed once per executor (closure), points arrive as Arrow
    batches (ref exact test: PostGIS ST_Intersects, models.py:196-198)."""
    mp = geo.parse_wkt(wkt)

    @pandas_udf(T.BooleanType())
    def pip(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            [geo.point_in_multipolygon(x, y, mp) for x, y in zip(lon, lat)]
        )

    return pip


def points_in_aoi(
    points: DataFrame,
    aoi_wkt: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    depth: int = 12,
    qk_col: str | None = None,
) -> DataFrame:
    """J1: spatial semi-join — rows of ``points`` inside the AOI polygon.

    quadkey-prefix prejoin (broadcast cover) + exact test on boundary
    tiles only."""
    spark = points.sparkSession
    cover = aoi_cover_df(spark, [(0, aoi_wkt)], depth)
    qk = F.col(qk_col) if qk_col else lonlat_to_quadkey(lon_col, lat_col, depth)
    pts = points.withColumn("__qk", qk)

    cov = cover.select(
        F.col("qk_prefix"), F.col("is_boundary"), F.length("qk_prefix").alias("__len")
    )
    lengths = [r[0] for r in cov.select("__len").distinct().collect()]
    pieces = []
    for ln in sorted(lengths):
        cov_l = cov.filter(F.col("__len") == ln)
        probe = pts.withColumn("__trunc", F.substring(F.col("__qk"), 1, ln))
        pieces.append(
            probe.join(broadcast(cov_l), probe["__trunc"] == cov_l["qk_prefix"], "inner")
            .drop("__trunc", "qk_prefix", "__len")
        )
    if not pieces:
        return points.limit(0)
    hit = pieces[0]
    for p in pieces[1:]:
        hit = hit.unionByName(p)

    interior = hit.filter(~F.col("is_boundary"))
    boundary = hit.filter(F.col("is_boundary"))
    pip = make_point_in_polygon_udf(aoi_wkt)
    exact = boundary.filter(pip(F.col(lon_col), F.col(lat_col)))
    out = interior.unionByName(exact).drop("is_boundary", "__qk")
    return out.dropDuplicates([points.columns[0]])


def grids_intersecting_aois(
    grids: DataFrame,
    aois: list[tuple[int, str]],
    qk_col: str = "quadkey",
    depth: int = 12,
) -> DataFrame:
    """J3: polygon-polygon intersects join (grid tiles × AOI list), dedup
    by quadkey — ``intersect_with_aoi`` (ref managers.py:308-318:
    OR of per-AOI geom__intersects + DISTINCT ON quadkey).

    A grid tile intersects an AOI iff the tile's quadkey is an ancestor,
    descendant, or member of the AOI's tile cover — pure string prefix
    algebra on the broadcast cover, zero geometry at query time."""
    spark = grids.sparkSession
    cover = aoi_cover_df(spark, aois, depth).select("qk_prefix").distinct()
    g = grids.alias("g")
    c = broadcast(cover).alias("c")
    cond = F.col(f"g.{qk_col}").startswith(F.col("c.qk_prefix")) | F.col(
        "c.qk_prefix"
    ).startswith(F.col(f"g.{qk_col}"))
    return g.join(c, cond, "inner").select("g.*").dropDuplicates([qk_col])


def clean_quadkeys(
    existing: DataFrame,
    candidates: DataFrame,
    qk_col: str = "quadkey",
    max_depth: int = 22,
) -> DataFrame:
    """G16: normalize candidate quadkeys against the grid table (ref
    utils/grids.py:22-58 ``clean_quadkeys``/``_clean_qk``):

    - a candidate with an ANCESTOR already in the table is dropped
      (covered);
    - a candidate with DESCENDANTS in the table is replaced by its 4
      children, recursively, until no child overlaps a descendant;
    - a candidate already present is dropped.

    The recursion is a driver loop of set-based steps (each iteration
    one anti-join + one semi-join + one explode), bounded by
    ``max_depth`` — the reference recurses per key, we refine the whole
    frontier per wave."""
    ex = existing.select(F.col(qk_col).alias("__ex")).distinct()
    frontier = candidates.select(F.col(qk_col)).distinct()
    out = None
    for _ in range(max_depth + 1):
        if frontier.isEmpty():
            break
        # drop: candidate equal to, or covered by an ancestor in, the table
        covered = frontier.join(
            broadcast(ex),
            (F.col("__ex") == F.col(qk_col))
            | (F.col(qk_col).startswith(F.col("__ex")) & (F.length(qk_col) > F.length("__ex"))),
            "left_semi",
        )
        frontier = frontier.exceptAll(covered)
        # split: candidate with descendants in the table
        with_desc = frontier.join(
            broadcast(ex),
            F.col("__ex").startswith(F.col(qk_col)) & (F.length("__ex") > F.length(qk_col)),
            "left_semi",
        )
        clean = frontier.join(with_desc, qk_col, "left_anti")
        out = clean if out is None else out.unionByName(clean)
        frontier = with_desc.filter(F.length(qk_col) < max_depth).select(
            F.explode(
                F.transform(
                    F.array(F.lit("0"), F.lit("1"), F.lit("2"), F.lit("3")),
                    lambda d: F.concat(F.col(qk_col), d),
                )
            ).alias(qk_col)
        )
    spark = candidates.sparkSession
    return out if out is not None else spark.createDataFrame([], f"{qk_col} string")


def union_cover(aois: list[tuple[int, str]], depth: int = 12) -> list[str]:
    """A3: ST_Union analog — the union of AOI tile covers, normalized so
    no member is an ancestor of another (ref custom Aggregate
    utils/spatial.py:16-20; normalize analog utils/grids.py:22-58)."""
    keys: set[str] = set()
    for _, wkt in aois:
        keys.update(geo.tile_cover(geo.parse_wkt(wkt), depth))
    out = []
    for qk in sorted(keys):
        if not any(qk != other and qk.startswith(other) for other in keys):
            out.append(qk)
    return out
