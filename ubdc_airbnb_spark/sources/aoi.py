"""AOI ingest (SURVEY §2.1 S9/S10, §2.7 G4/G10-G12, grid seeding ref
models.py:76-194): GeoJSON / WKT / bbox → AOI rows + seed grid tiles.

Runs driver-side by design — AOIs arrive one file at a time and number
in the thousands; the outputs (covers, grids) are exactly the small
broadcast sides of every downstream spatial join.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from ..functions import geometry as geo
from ..functions import mercator as m

DEFAULT_FLAGS = {
    "scan_for_new_listings": False,
    "collect_calendars": False,
    "collect_listing_details": False,
    "collect_reviews": False,
    "collect_bookings": False,
}


def _aoi_row(aoi_id: int, name: str, mp: geo.MultiPolygon, flags: dict, notes: dict | None):
    xmin, ymin, xmax, ymax = geo.bbox(mp)
    f = {**DEFAULT_FLAGS, **flags}
    return (
        aoi_id,
        name,
        geo.to_wkt(mp),
        {"xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax},
        json.dumps(notes or {}),
        datetime.now(timezone.utc).replace(tzinfo=None),
        f["scan_for_new_listings"],
        f["collect_calendars"],
        f["collect_listing_details"],
        f["collect_reviews"],
        f["collect_bookings"],
    )


def _to_df(spark: SparkSession, rows: list) -> DataFrame:
    from .. import schemas

    return spark.createDataFrame(rows, schemas.AOI)


def aoi_from_wkt(spark: SparkSession, aoi_id: int, name: str, wkt: str, **flags) -> DataFrame:
    """S10: ``create_from_wkt`` (ref models.py:112-128). POLYGON is
    promoted to MULTIPOLYGON like the reference does."""
    return _to_df(spark, [_aoi_row(aoi_id, name, geo.parse_wkt(wkt), flags, None)])


def aoi_from_bbox(
    spark: SparkSession, aoi_id: int, name: str, west: float, south: float, east: float, north: float, **flags
) -> DataFrame:
    """S10: ``create_from_bbox`` (ref models.py:130-140) via the 5-point
    ring constructor (G10, ref utils/spatial.py:23-47)."""
    mp = geo.bbox_to_polygon(west, south, east, north)
    return _to_df(spark, [_aoi_row(aoi_id, name, mp, flags, None)])


def aoi_from_geojson(spark: SparkSession, aoi_id: int, geojson: str | dict, name: str | None = None, **flags) -> DataFrame:
    """S9: ``create_from_geojson`` (ref models.py:76-110) — first
    feature, Polygon→MultiPolygon promotion, import-note metadata."""
    doc = json.loads(geojson) if isinstance(geojson, str) else geojson
    feature = doc["features"][0] if doc.get("type") == "FeatureCollection" else doc
    geom = feature["geometry"] if "geometry" in feature else feature
    coords = geom["coordinates"]
    if geom["type"] == "Polygon":
        coords = [coords]
    elif geom["type"] != "MultiPolygon":
        raise ValueError(f"unsupported geometry type {geom['type']}")
    mp: geo.MultiPolygon = [
        [[(float(x), float(y)) for x, y in ring] for ring in poly] for poly in coords
    ]
    props = feature.get("properties") or {}
    notes = {"import": "geojson", "properties": props}
    return _to_df(
        spark, [_aoi_row(aoi_id, name or props.get("name", f"aoi-{aoi_id}"), mp, flags, notes)]
    )


def seed_grids(spark: SparkSession, wkt: str, depth: int = 12) -> DataFrame:
    """Grid seeding for an AOI (ref models.py:166-194): cut at prime
    lines (G12 — a straddling geometry's bounding tile degenerates to the
    whole world, ref models.py:160-164), tile-cover each fragment, emit
    grid rows with tile metadata (bbox_ll_ur csv in 3857 — ref
    models.py:318-327 — area and edge lengths)."""
    from .. import schemas

    mp = geo.parse_wkt(wkt)
    quadkeys: set[str] = set()
    for frag in geo.cut_polygon_at_prime_lines(mp):
        quadkeys.update(geo.tile_cover(frag, depth))
    rows = []
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    for qk in sorted(quadkeys):
        x, y, z = geo.quadkey_to_tile(qk)
        west, south, east, north = geo.tile_bounds(x, y, z)
        x1 = west * m.ORIGIN_SHIFT / 180.0
        x2 = east * m.ORIGIN_SHIFT / 180.0
        import math

        def _y(lat):
            return m.EARTH_RADIUS * math.log(math.tan(math.pi / 4.0 + math.radians(lat) / 2.0))

        y1, y2 = _y(south), _y(north)
        rows.append(
            (
                qk,
                x,
                y,
                z,
                f"{x1},{y1},{x2},{y2}",
                abs(x2 - x1) * abs(y2 - y1),
                now,
                None,
                None,
                -1,
            )
        )
    return spark.createDataFrame(rows, schemas.GRID)


FLAG_COLS = tuple(DEFAULT_FLAGS)


def covers_with_flags(aoi_df: DataFrame, depth: int = 12) -> DataFrame:
    """(aoi_id, qk_prefix, is_boundary, <collection flags>) cover rows for
    every AOI row — the production input to
    ``operators.joins.flagged_cover_semi_join`` (ref managers.py:200-224
    derives the same thing live with ST_Union over flagged AOI geoms).

    Driver-side by design: the AOI table is thousands of rows and the
    output is the broadcast side of every downstream spatial semi-join."""
    from ..operators.spatial import aoi_cover_df

    spark = aoi_df.sparkSession
    rows = aoi_df.select("aoi_id", "geom_wkt", *FLAG_COLS).collect()
    covers = aoi_cover_df(spark, [(r.aoi_id, r.geom_wkt) for r in rows], depth)
    flags = spark.createDataFrame(
        [(r.aoi_id, *[bool(r[c]) for c in FLAG_COLS]) for r in rows],
        "aoi_id long, " + ", ".join(f"{c} boolean" for c in FLAG_COLS),
    )
    return covers.join(flags, "aoi_id")
