"""Pure-Python geometry kernel: WKT round-trip, point-in-polygon,
intersects, tile cover invariants."""

from __future__ import annotations

from ubdc_airbnb_spark.functions import geometry as geo

SQUARE = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
DONUT = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
MULTI = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"


def test_wkt_roundtrip():
    mp = geo.parse_wkt(MULTI)
    assert len(mp) == 2
    mp2 = geo.parse_wkt(geo.to_wkt(mp))
    assert mp2 == mp


def test_point_in_polygon():
    sq = geo.parse_wkt(SQUARE)
    assert geo.point_in_multipolygon(5, 5, sq)
    assert not geo.point_in_multipolygon(15, 5, sq)
    donut = geo.parse_wkt(DONUT)
    assert geo.point_in_multipolygon(1, 1, donut)
    assert not geo.point_in_multipolygon(5, 5, donut)  # in the hole
    multi = geo.parse_wkt(MULTI)
    assert geo.point_in_multipolygon(1, 1, multi)
    assert geo.point_in_multipolygon(6, 6, multi)
    assert not geo.point_in_multipolygon(3, 3, multi)


def test_intersects():
    a = geo.parse_wkt(SQUARE)
    b = geo.parse_wkt("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    c = geo.parse_wkt("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))")
    inner = geo.parse_wkt("POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))")
    assert geo.multipolygons_intersect(a, b)
    assert not geo.multipolygons_intersect(a, c)
    assert geo.multipolygons_intersect(a, inner)  # containment
    assert geo.multipolygons_intersect(inner, a)


def test_tile_cover_invariants():
    wkt = "POLYGON ((-0.2 51.4, 0.1 51.4, 0.1 51.6, -0.2 51.6, -0.2 51.4))"  # London-ish
    mp = geo.parse_wkt(wkt)
    cover = geo.tile_cover(mp, 10)
    assert cover, "cover must be non-empty"
    # non-nested: no member is an ancestor of another
    s = set(cover)
    for qk in s:
        for other in s:
            assert qk == other or not other.startswith(qk) or len(other) <= len(qk)
    # every cover tile's bbox intersects the polygon bbox
    pb = geo.bbox(mp)
    for qk in cover:
        assert geo.bboxes_overlap(geo.quadkey_bbox(qk), pb)
    # a point well inside the polygon is covered by some tile
    qk_hits = [qk for qk in cover if geo.point_in_multipolygon(-0.05, 51.5, geo.bbox_to_polygon(*geo.quadkey_bbox(qk)))]
    assert qk_hits
