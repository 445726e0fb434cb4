"""Native quadkey/tile expressions vs a pure-Python oracle (the public
slippy-map / Bing-quadkey formulas, same math mercantile implements)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from ubdc_airbnb_spark.functions import geometry as geo
from ubdc_airbnb_spark.functions import quadkey as qk


def _oracle_tile(lon: float, lat: float, z: int) -> tuple[int, int]:
    lat = min(max(lat, -85.051128779806589), 85.051128779806589)
    n = 2.0**z
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    lat_rad = math.radians(lat)
    y = int(math.floor((1.0 - math.asinh(math.tan(lat_rad)) / math.pi) / 2.0 * n))
    return min(max(x, 0), int(n) - 1), min(max(y, 0), int(n) - 1)


def test_quadkey_roundtrip(spark):
    rng = random.Random(42)
    rows = []
    for z in (1, 5, 10, 16, 22):
        for _ in range(20):
            x = rng.randrange(2**z)
            y = rng.randrange(2**z)
            rows.append((x, y, z, geo.tile_to_quadkey(x, y, z)))
    df = spark.createDataFrame(rows, "x long, y long, z int, expected string")
    out = df.select(
        "x",
        "y",
        "expected",
        qk.tile_to_quadkey("x", "y", F.col("z")).alias("got"),
    ).collect()
    for r in out:
        assert r.got == r.expected, (r.x, r.y)

    back = (
        df.select("x", "y", F.col("expected").alias("quadkey"))
        .select(
            "x",
            "y",
            qk.quadkey_to_tile_x("quadkey").alias("x2"),
            qk.quadkey_to_tile_y("quadkey").alias("y2"),
        )
        .collect()
    )
    for r in back:
        assert (r.x2, r.y2) == (r.x, r.y)


def test_lonlat_to_tile_matches_oracle(spark):
    rng = random.Random(7)
    pts = [(rng.uniform(-179.9, 179.9), rng.uniform(-84.9, 84.9)) for _ in range(200)]
    pts += [(0.0, 0.0), (-180.0, 85.05), (179.999, -85.05)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for z in (3, 10, 15):
        got = df.select(
            "lon",
            "lat",
            qk.lonlat_to_tile_x("lon", z).alias("tx"),
            qk.lonlat_to_tile_y("lat", z).alias("ty"),
        ).collect()
        for r in got:
            ex, ey = _oracle_tile(r.lon, r.lat, z)
            assert (r.tx, r.ty) == (ex, ey), (r.lon, r.lat, z)


def test_quadkey_bbox_matches_oracle(spark):
    rows = [(geo.tile_to_quadkey(x, y, z),) for x, y, z in [(3, 5, 4), (100, 200, 9), (0, 0, 1)]]
    df = spark.createDataFrame(rows, "quadkey string")
    got = df.select("quadkey", qk.quadkey_bbox("quadkey").alias("b")).collect()
    for r in got:
        ow, os_, oe, on = geo.quadkey_bbox(r.quadkey)
        assert abs(r.b.west - ow) < 1e-9
        assert abs(r.b.south - os_) < 1e-9
        assert abs(r.b.east - oe) < 1e-9
        assert abs(r.b.north - on) < 1e-9


def test_children_parent_ancestors(spark):
    df = spark.createDataFrame([("0231",), ("3",)], "quadkey string")
    got = {
        r.quadkey: r
        for r in df.select(
            "quadkey",
            qk.children("quadkey").alias("ch"),
            qk.parent("quadkey").alias("p"),
            qk.ancestors("quadkey").alias("anc"),
        ).collect()
    }
    assert got["0231"].ch == ["02310", "02311", "02312", "02313"]
    assert got["0231"].p == "023"
    assert got["0231"].anc == ["0", "02", "023"]
    assert got["3"].anc == []
