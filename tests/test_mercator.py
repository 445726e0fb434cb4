"""Web-Mercator reprojection vs the closed-form EPSG:3857 oracle."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from ubdc_airbnb_spark.functions import mercator as m


def _fwd(lon: float, lat: float) -> tuple[float, float]:
    x = lon * m.ORIGIN_SHIFT / 180.0
    y = m.EARTH_RADIUS * math.log(math.tan(math.pi / 4.0 + math.radians(lat) / 2.0))
    return x, y


def test_roundtrip_and_forward(spark):
    rng = random.Random(3)
    pts = [(rng.uniform(-180, 180), rng.uniform(-85, 85)) for _ in range(100)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = df.select(
        "lon",
        "lat",
        m.lon_to_x("lon").alias("x"),
        m.lat_to_y("lat").alias("y"),
        m.x_to_lon(m.lon_to_x("lon")).alias("lon2"),
        m.y_to_lat(m.lat_to_y("lat")).alias("lat2"),
    ).collect()
    for r in got:
        ex, ey = _fwd(r.lon, r.lat)
        assert abs(r.x - ex) < 1e-6
        assert abs(r.y - ey) < 1e-6
        assert abs(r.lon2 - r.lon) < 1e-9
        assert abs(r.lat2 - r.lat) < 1e-9


def test_moved_beyond_threshold(spark):
    # ~150 m at the equator is ~0.00135 degrees of longitude in 3857 meters
    df = spark.createDataFrame(
        [
            (0.0, 0.0, 0.0010, 0.0),   # ~111 m -> not moved
            (0.0, 0.0, 0.0020, 0.0),   # ~222 m -> moved
            (10.0, 50.0, 10.0, 50.0),  # same point
        ],
        "lon_a double, lat_a double, lon_b double, lat_b double",
    )
    got = df.select(
        m.moved_beyond("lon_a", "lat_a", "lon_b", "lat_b", 150.0).alias("moved")
    ).collect()
    assert [r.moved for r in got] == [False, True, False]
