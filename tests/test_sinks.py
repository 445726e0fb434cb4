"""Export sinks (S12-S14) round-trips."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ubdc_airbnb_spark.sources import sinks


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    path = str(tmp_path / "csv_out")
    sinks.write_csv(df, path, columns=["id", "name"])
    back = spark.read.option("header", "true").csv(path)
    assert {(int(r.id), r.name) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_grids_geojson(spark):
    grids = spark.createDataFrame([("031",), ("12",)], "quadkey string")
    fc = json.loads(sinks.grids_geojson(grids))
    assert fc["type"] == "FeatureCollection"
    assert {f["properties"]["quadkey"] for f in fc["features"]} == {"031", "12"}
    ring = fc["features"][0]["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]


def test_jsonl_export_only_latest_since(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "old"),
            (1, "2024-02-01 00:00:00", "new"),
            (2, "2023-01-01 00:00:00", "ancient"),
        ],
        "listing_id long, created_at string, v string",
    ).withColumn("created_at", F.col("created_at").cast("timestamp"))
    path = str(tmp_path / "jsonl_out")
    sinks.export_jsonl(
        df,
        path,
        only_latest_per=["listing_id"],
        since_expr="TIMESTAMP '2023-06-01 00:00:00'",
    )
    back = spark.read.json(path)
    rows = back.collect()
    assert len(rows) == 1 and rows[0].v == "new"
