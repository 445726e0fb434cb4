"""Web-Mercator (EPSG:4326 ↔ EPSG:3857) reprojection + planar distance as
native Spark column math.

Reference delegates these to GDAL/PostGIS (SURVEY §2.7 G7-G9:
/root/reference/src/ubdc_airbnb/ubdc_airbnb/utils/spatial.py:179-251,
/root/reference/src/ubdc_airbnb/ubdc_airbnb/workunits.py:137-141). For
points the closed-form spherical-Mercator formulas are exact, so the whole
moved-listing predicate (dist > 150 m in 3857) runs JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: WGS84 spherical-Mercator radius (meters) — public EPSG:3857 constant.
EARTH_RADIUS = 6378137.0
#: pi * R — Mercator half-extent.
ORIGIN_SHIFT = 20037508.342789244
PI = 3.141592653589793


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def lon_to_x(lon: Column | str) -> Column:
    """G7 forward: x_3857 = lon * pi*R / 180."""
    return _c(lon) * F.lit(ORIGIN_SHIFT / 180.0)


def lat_to_y(lat: Column | str) -> Column:
    """G7 forward: y_3857 = R * ln(tan(pi/4 + lat_rad/2))."""
    lat_rad = F.radians(_c(lat))
    return F.lit(EARTH_RADIUS) * F.log(F.tan(F.lit(PI / 4.0) + lat_rad / F.lit(2.0)))


def x_to_lon(x: Column | str) -> Column:
    """G7 inverse."""
    return _c(x) * F.lit(180.0 / ORIGIN_SHIFT)


def y_to_lat(y: Column | str) -> Column:
    """G7 inverse: lat = degrees(2*atan(exp(y/R)) - pi/2)."""
    return F.degrees(F.lit(2.0) * F.atan(F.exp(_c(y) / F.lit(EARTH_RADIUS))) - F.lit(PI / 2.0))


def planar_distance(x1, y1, x2, y2) -> Column:
    """G8: Euclidean distance in projected meters (ST_DISTANCE on 3857
    points — ref utils/spatial.py:209-216)."""
    dx = _c(x1) - _c(x2)
    dy = _c(y1) - _c(y2)
    return F.sqrt(dx * dx + dy * dy)


def moved_beyond(lon_a, lat_a, lon_b, lat_b, threshold_m: float = 150.0) -> Column:
    """G9/J11: the moved-listing predicate — planar 3857 distance between
    two lon/lat points exceeds ``threshold_m`` (default from
    AIRBNB_LISTINGS_MOVED_MIN_DISTANCE, ref core/settings.py:12)."""
    return (
        planar_distance(lon_to_x(lon_a), lat_to_y(lat_a), lon_to_x(lon_b), lat_to_y(lat_b))
        > F.lit(threshold_m)
    )
