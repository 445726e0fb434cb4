"""Export sinks (SURVEY §2.1 S12-S14): CSV, GeoJSON, JSONL with the
reference's export semantics."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geometry as geo
from ..operators.windows import latest_per_key


def write_csv(df: DataFrame, path: str, columns: list[str] | None = None) -> None:
    """S12: CSV export (``list-aoi --csv`` — ref list-aoi.py:101-138)."""
    out = df.select(*columns) if columns else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def grids_geojson(grids: DataFrame, qk_col: str = "quadkey") -> str:
    """S13: grid tiles → GeoJSON FeatureCollection (ref
    models.py:284-305 ``UBDCGrid.as_geojson``). Collects — export-sized
    data only (grids are thousands, not billions)."""
    rows = grids.select(qk_col).collect()
    features = []
    for r in rows:
        west, south, east, north = geo.quadkey_bbox(r[qk_col])
        features.append(
            {
                "type": "Feature",
                "properties": {"quadkey": r[qk_col]},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [
                            [west, south],
                            [east, south],
                            [east, north],
                            [west, north],
                            [west, south],
                        ]
                    ],
                },
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": features})


def export_jsonl(
    df: DataFrame,
    path: str,
    only_latest_per: list[str] | None = None,
    ts_col: str = "created_at",
    since_expr: str | None = None,
) -> None:
    """S14: JSONL export with ``--only-latest`` (W2 latest-per-key) and
    ``--since`` (P8) semantics (ref README.md:113-126, extract-data.py)."""
    out = df
    if since_expr:
        out = out.filter(F.col(ts_col) >= F.expr(since_expr))
    if only_latest_per:
        out = latest_per_key(out, only_latest_per, ts_col)
    out.write.mode("overwrite").json(path)
