"""Minimal pure-Python computational geometry (driver-side, AOI-scale).

The reference leans on PostGIS/GEOS for polygon predicates
(ST_Intersects/ST_Union/ST_Split — SURVEY §2.7). Neither shapely nor GEOS
is available here, so this module implements the public textbook
algorithms (ray casting, segment intersection, bbox algebra) for the
*small* side of every spatial operation: AOIs and tiles number in the
thousands and are processed once at ingest, while the billion-row point
side only ever sees native quadkey/bbox column math (functions/quadkey.py)
plus the vectorized point-in-polygon UDF in operators/spatial.py.

WKT support covers POLYGON and MULTIPOLYGON (what the reference stores —
models.py:37,44,202).
"""

from __future__ import annotations

import math
import re

Ring = list[tuple[float, float]]
Polygon = list[Ring]  # first ring = exterior, rest = holes
MultiPolygon = list[Polygon]

_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"


def parse_wkt(wkt: str) -> MultiPolygon:
    """Parse POLYGON/MULTIPOLYGON WKT into nested coordinate lists."""
    wkt = wkt.strip()
    head = wkt.split("(", 1)[0].strip().upper()
    body = wkt[wkt.index("(") :]

    def parse_ring(s: str) -> Ring:
        pts = re.findall(rf"({_NUM})\s+({_NUM})", s)
        return [(float(x), float(y)) for x, y in pts]

    def parse_polygon(s: str) -> Polygon:
        rings = re.findall(r"\(([^()]+)\)", s)
        return [parse_ring(r) for r in rings]

    if head == "POLYGON":
        return [parse_polygon(body)]
    if head == "MULTIPOLYGON":
        polys = re.findall(r"\((?:\([^()]+\)\s*,?\s*)+\)", body)
        return [parse_polygon(p) for p in polys]
    raise ValueError(f"unsupported WKT type: {head}")


def to_wkt(mp: MultiPolygon) -> str:
    def ring_s(r: Ring) -> str:
        return "(" + ", ".join(f"{x} {y}" for x, y in r) + ")"

    def poly_s(p: Polygon) -> str:
        return "(" + ", ".join(ring_s(r) for r in p) + ")"

    return "MULTIPOLYGON (" + ", ".join(poly_s(p) for p in mp) + ")"


def bbox(mp: MultiPolygon) -> tuple[float, float, float, float]:
    xs = [x for p in mp for r in p for x, _ in r]
    ys = [y for p in mp for r in p for _, y in r]
    return (min(xs), min(ys), max(xs), max(ys))


def bbox_to_polygon(xmin: float, ymin: float, xmax: float, ymax: float) -> MultiPolygon:
    """G10: bbox → 5-point ring polygon (ref utils/spatial.py:23-47)."""
    return [[[(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)]]]


def bboxes_overlap(a: tuple[float, float, float, float], b: tuple[float, float, float, float]) -> bool:
    return a[0] <= b[2] and b[0] <= a[2] and a[1] <= b[3] and b[1] <= a[3]


def point_in_ring(x: float, y: float, ring: Ring) -> bool:
    """Ray casting (crossing number), boundary counted as inside."""
    inside = False
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if (y1 > y) != (y2 > y):
            xint = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x <= xint:
                inside = not inside
    return inside


def point_in_multipolygon(x: float, y: float, mp: MultiPolygon) -> bool:
    for poly in mp:
        if not poly:
            continue
        if point_in_ring(x, y, poly[0]):
            in_hole = any(point_in_ring(x, y, hole) for hole in poly[1:])
            if not in_hole:
                return True
    return False


def _segments_intersect(p1, p2, p3, p4) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return min(a[0], b[0]) <= c[0] <= max(a[0], b[0]) and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(p1, p2, p3):
        return True
    if o2 == 0 and on_seg(p1, p2, p4):
        return True
    if o3 == 0 and on_seg(p3, p4, p1):
        return True
    if o4 == 0 and on_seg(p3, p4, p2):
        return True
    return False


def multipolygons_intersect(a: MultiPolygon, b: MultiPolygon) -> bool:
    """J3 exact test: boundary crossing, or one contains a vertex of the
    other (covers containment)."""
    if not bboxes_overlap(bbox(a), bbox(b)):
        return False
    a_edges = [(r[i], r[i + 1]) for p in a for r in p for i in range(len(r) - 1)]
    b_edges = [(r[i], r[i + 1]) for p in b for r in p for i in range(len(r) - 1)]
    for e1 in a_edges:
        for e2 in b_edges:
            if _segments_intersect(e1[0], e1[1], e2[0], e2[1]):
                return True
    ax, ay = a[0][0][0]
    bx, by = b[0][0][0]
    return point_in_multipolygon(ax, ay, b) or point_in_multipolygon(bx, by, a)


def area(mp: MultiPolygon) -> float:
    """G14: planar area via the shoelace formula (exterior minus holes;
    ref geom_3857.area, models.py:331)."""

    def ring_area(r: Ring) -> float:
        s = 0.0
        for i in range(len(r) - 1):
            x1, y1 = r[i]
            x2, y2 = r[i + 1]
            s += x1 * y2 - x2 * y1
        return s / 2.0

    total = 0.0
    for poly in mp:
        if not poly:
            continue
        total += abs(ring_area(poly[0]))
        for hole in poly[1:]:
            total -= abs(ring_area(hole))
    return total


def centroid(mp: MultiPolygon) -> tuple[float, float]:
    """G14: area-weighted centroid (exterior rings; ref .centroid use in
    tests/beat_ops)."""
    cx = cy = a_sum = 0.0
    for poly in mp:
        if not poly:
            continue
        r = poly[0]
        a2 = 0.0
        px = py = 0.0
        for i in range(len(r) - 1):
            x1, y1 = r[i]
            x2, y2 = r[i + 1]
            cross = x1 * y2 - x2 * y1
            a2 += cross
            px += (x1 + x2) * cross
            py += (y1 + y2) * cross
        if a2 != 0:
            cx += px / (3.0 * a2) * abs(a2 / 2.0)
            cy += py / (3.0 * a2) * abs(a2 / 2.0)
            a_sum += abs(a2 / 2.0)
    if a_sum == 0:
        xs = [x for p in mp for r in p for x, _ in r]
        ys = [y for p in mp for r in p for _, y in r]
        return sum(xs) / len(xs), sum(ys) / len(ys)
    return cx / a_sum, cy / a_sum


def buffer_bbox(mp: MultiPolygon, distance: float) -> MultiPolygon:
    """G13: bbox-expansion buffer — the reference buffers a grid tile by
    100 m only to build a rectangular test area (ref
    create-test-area.py:33), so an axis-aligned expansion reproduces that
    use exactly. (A true Minkowski buffer is out of scope without GEOS.)"""
    xmin, ymin, xmax, ymax = bbox(mp)
    return bbox_to_polygon(xmin - distance, ymin - distance, xmax + distance, ymax + distance)


def _clip_ring_halfplane(ring: Ring, axis: int, threshold: float, keep_ge: bool) -> Ring:
    """Sutherland–Hodgman clip of a ring against one axis-aligned
    half-plane (axis 0 = x/lon, 1 = y/lat)."""

    def inside(p):
        return (p[axis] >= threshold) if keep_ge else (p[axis] <= threshold)

    def intersect(p1, p2):
        t = (threshold - p1[axis]) / (p2[axis] - p1[axis])
        return (
            p1[0] + t * (p2[0] - p1[0]),
            p1[1] + t * (p2[1] - p1[1]),
        )

    out: Ring = []
    n = len(ring) - 1  # closed ring
    for i in range(n):
        cur, nxt = ring[i], ring[i + 1]
        if inside(cur):
            out.append(cur)
            if not inside(nxt) and nxt[axis] != cur[axis]:
                out.append(intersect(cur, nxt))
        elif inside(nxt) and nxt[axis] != cur[axis]:
            out.append(intersect(cur, nxt))
    if out and out[0] != out[-1]:
        out.append(out[0])
    return out if len(out) >= 4 else []


def clip_polygon_bbox(mp: MultiPolygon, xmin: float, ymin: float, xmax: float, ymax: float) -> MultiPolygon:
    """Clip a multipolygon to a bbox (exterior rings only — holes are
    rare in AOIs; the reference's ST_Split use is exterior-only too)."""
    out: MultiPolygon = []
    for poly in mp:
        if not poly:
            continue
        ring = poly[0]
        for axis, thr, keep_ge in (
            (0, xmin, True),
            (0, xmax, False),
            (1, ymin, True),
            (1, ymax, False),
        ):
            ring = _clip_ring_halfplane(ring, axis, thr, keep_ge)
            if not ring:
                break
        if ring:
            out.append([ring])
    return out


def crosses_prime_lines(mp: MultiPolygon) -> tuple[bool, bool]:
    """G11: does the geometry straddle the prime meridian / equator?
    (ref utils/spatial.py:50-64 ``get_world_cross``)."""
    xmin, ymin, xmax, ymax = bbox(mp)
    return (xmin < 0.0 < xmax), (ymin < 0.0 < ymax)


def cut_polygon_at_prime_lines(mp: MultiPolygon) -> list[MultiPolygon]:
    """G12: split a polygon at the prime meridian and equator into up to
    4 quadrant fragments (ref utils/spatial.py:67-112 delegates to
    PostGIS ST_Split; same output shape: one fragment per quadrant
    touched). Needed because a bounding tile for a geometry straddling
    lon=0 or lat=0 degenerates to the whole world (ref models.py:160-164)."""
    cross_x, cross_y = crosses_prime_lines(mp)
    if not cross_x and not cross_y:
        return [mp]
    xmin, ymin, xmax, ymax = bbox(mp)
    x_edges = [xmin, 0.0, xmax] if cross_x else [xmin, xmax]
    y_edges = [ymin, 0.0, ymax] if cross_y else [ymin, ymax]
    fragments: list[MultiPolygon] = []
    for xi in range(len(x_edges) - 1):
        for yi in range(len(y_edges) - 1):
            frag = clip_polygon_bbox(
                mp, x_edges[xi], y_edges[yi], x_edges[xi + 1], y_edges[yi + 1]
            )
            if frag:
                fragments.append(frag)
    return fragments


def bounding_tile(mp: MultiPolygon, max_depth: int = 28) -> str:
    """G4: smallest single tile containing the geometry = longest common
    quadkey prefix of the bbox corners (ref mercantile.bounding_tile use,
    models.py:160-164, utils/grids.py:88-104). Empty string = world."""
    xmin, ymin, xmax, ymax = bbox(mp)
    qk_sw = tile_to_quadkey(*_lonlat_tile(xmin, ymin, max_depth), max_depth)
    qk_ne = tile_to_quadkey(*_lonlat_tile(xmax, ymax, max_depth), max_depth)
    common = []
    for a, b in zip(qk_sw, qk_ne):
        if a != b:
            break
        common.append(a)
    return "".join(common)


def _lonlat_tile(lon: float, lat: float, z: int) -> tuple[int, int]:
    lat = min(max(lat, -85.051128779806589), 85.051128779806589)
    n = 2.0**z
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    y = int(math.floor((1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * n))
    return min(max(x, 0), int(n) - 1), min(max(y, 0), int(n) - 1)


# ---------------------------------------------------------------- tiles

def tile_bounds(x: int, y: int, z: int) -> tuple[float, float, float, float]:
    """Slippy-map tile → (west, south, east, north) lon/lat degrees."""
    n = 2.0**z

    def lon(xx: float) -> float:
        return xx / n * 360.0 - 180.0

    def lat(yy: float) -> float:
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * yy / n))))

    return (lon(x), lat(y + 1), lon(x + 1), lat(y))


def quadkey_to_tile(qk: str) -> tuple[int, int, int]:
    x = y = 0
    for d in qk:
        x = (x << 1) | (int(d) & 1)
        y = (y << 1) | ((int(d) >> 1) & 1)
    return x, y, len(qk)


def tile_to_quadkey(x: int, y: int, z: int) -> str:
    return "".join(str(((x >> (z - i)) & 1) + 2 * ((y >> (z - i)) & 1)) for i in range(1, z + 1))


def quadkey_bbox(qk: str) -> tuple[float, float, float, float]:
    x, y, z = quadkey_to_tile(qk)
    return tile_bounds(x, y, z)


def tile_cover(mp: MultiPolygon, max_depth: int, qk: str = "") -> list[str]:
    """G4/G16-style adaptive tile cover: recursively subdivide from the
    root, keeping tiles fully inside the polygon and refining boundary
    tiles until ``max_depth``. Output quadkeys are mutually non-nested —
    exactly the cover shape the prefix semi-join (J1) broadcasts."""
    west, south, east, north = quadkey_bbox(qk) if qk else (-180.0, -85.051128779806589, 180.0, 85.051128779806589)
    tile_poly = bbox_to_polygon(west, south, east, north)
    if not multipolygons_intersect(tile_poly, mp):
        return []
    corners_inside = all(
        point_in_multipolygon(cx, cy, mp)
        for cx, cy in [(west, south), (east, south), (east, north), (west, north)]
    )
    boundary_crosses = any(
        _segments_intersect(e1[0], e1[1], e2[0], e2[1])
        for p in mp
        for r in p
        for i in range(len(r) - 1)
        for e1 in [(r[i], r[i + 1])]
        for ring in tile_poly[0]
        for j in range(len(ring) - 1)
        for e2 in [(ring[j], ring[j + 1])]
    )
    if corners_inside and not boundary_crosses:
        return [qk] if qk else ["0", "1", "2", "3"]
    if len(qk) >= max_depth:
        return [qk]
    out: list[str] = []
    for d in "0123":
        out.extend(tile_cover(mp, max_depth, qk + d))
    return out
