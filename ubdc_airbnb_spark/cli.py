"""CLI parity with the reference's management commands (SURVEY §2.1,
§3.1; ref app/management/commands/: add-aoi, list-aoi, create-test-area,
run-beat-job, extract-data).

Tables live as parquet directories under ``--warehouse``. This is the
ops surface a reference user would drive; each subcommand is a thin
wrapper over the library.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F


def _spark():
    from .session import get_spark

    return get_spark("ubdc-airbnb-spark-cli")


def _table(warehouse: str, name: str) -> str:
    return os.path.join(warehouse, name)


def cmd_add_aoi(args) -> int:
    """ref add-aoi.py: ingest WKT / bbox / GeoJSON as a new AOI row and
    seed its grid tiles."""
    from .sources import aoi as aoi_mod
    from .operators.upsert import upsert_parquet

    spark = _spark()
    flags = {
        "scan_for_new_listings": args.scan,
        "collect_calendars": args.calendars,
        "collect_listing_details": args.details,
        "collect_reviews": args.reviews,
        "collect_bookings": args.bookings,
    }
    if args.wkt:
        df = aoi_mod.aoi_from_wkt(spark, args.id, args.name, args.wkt, **flags)
        wkt = args.wkt
    elif args.bbox:
        w, s, e, n = (float(v) for v in args.bbox.split(","))
        df = aoi_mod.aoi_from_bbox(spark, args.id, args.name, w, s, e, n, **flags)
        wkt = df.collect()[0].geom_wkt
    else:
        with open(args.geojson) as fh:
            df = aoi_mod.aoi_from_geojson(spark, args.id, fh.read(), name=args.name, **flags)
        wkt = df.collect()[0].geom_wkt
    upsert_parquet(df, _table(args.warehouse, "aoi"), ["aoi_id"])
    grids = aoi_mod.seed_grids(spark, wkt, depth=args.depth)
    upsert_parquet(grids, _table(args.warehouse, "grid"), ["quadkey"])
    print(f"aoi {args.id} added; {grids.count()} seed grids")
    return 0


def cmd_list_aoi(args) -> int:
    """ref list-aoi.py: project the 7 display columns, optional filter +
    CSV export (P4 icontains, S12)."""
    spark = _spark()
    df = spark.read.parquet(_table(args.warehouse, "aoi"))
    if args.name_contains:
        df = df.filter(F.lower(F.col("name")).contains(args.name_contains.lower()))
    cols = [
        "aoi_id",
        "name",
        "created_at",
        "scan_for_new_listings",
        "collect_calendars",
        "collect_listing_details",
        "collect_reviews",
    ]
    out = df.select(*cols).orderBy("name")
    if args.csv:
        from .sources.sinks import write_csv

        write_csv(out, args.csv, cols)
        print(f"wrote {args.csv}")
    else:
        for r in out.collect():
            print("\t".join(str(r[c]) for c in cols))
    return 0


def cmd_add_quadkey(args) -> int:
    """ref add-quadkey.py: register a single grid tile by quadkey."""
    from .functions import geometry as geo
    from .operators.upsert import upsert_parquet
    from .sources.aoi import seed_grids

    spark = _spark()
    west, south, east, north = geo.quadkey_bbox(args.quadkey)
    wkt = geo.to_wkt(geo.bbox_to_polygon(west, south, east, north))
    grids = seed_grids(spark, wkt, depth=len(args.quadkey)).filter(
        F.col("quadkey") == args.quadkey
    )
    upsert_parquet(grids, _table(args.warehouse, "grid"), ["quadkey"])
    print(f"grid {args.quadkey} added")
    return 0


def cmd_discover(args) -> int:
    """ref run-beat-job op_discover_new_listings_periodical: BFS over the
    flagged AOIs' grids with the mock source (swap in a real source for
    deployment)."""
    from .plans.discovery import discover
    from .sources.mock_api import MockAirbnbApi
    from .operators.upsert import upsert_parquet

    spark = _spark()
    grids = spark.read.parquet(_table(args.warehouse, "grid"))
    seeds = [r.quadkey for r in grids.select("quadkey").collect()]
    res = discover(spark, MockAirbnbApi(), seeds, max_waves=args.max_waves)
    upsert_parquet(
        res.listings.withColumn("created_at", F.current_timestamp()),
        _table(args.warehouse, "listings"),
        ["listing_id"],
    )
    from .sources.bronze import partitioned_bronze_writer

    partitioned_bronze_writer(
        res.bronze.drop("quadkey", "items_offset"), _table(args.warehouse, "responses")
    )
    print(
        f"waves={res.waves} fetches={res.fetches} splits={len(res.splits)} "
        f"listings={res.listings.count()}"
    )
    return 0


def cmd_export_data(args) -> int:
    """ref extract-data.py / README export: JSONL with --only-latest /
    --since (S14, W2, P8)."""
    from .sources.sinks import export_jsonl

    spark = _spark()
    df = spark.read.parquet(_table(args.warehouse, args.table))
    export_jsonl(
        df,
        args.output,
        only_latest_per=[args.latest_per] if args.latest_per else None,
        ts_col=args.ts_col,
        since_expr=f"TIMESTAMP '{args.since}'" if args.since else None,
    )
    print(f"wrote {args.output}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ubdc-airbnb-spark")
    p.add_argument("--warehouse", default=os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/ubdc_warehouse"))
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("add-aoi", help="ingest an AOI from WKT/bbox/GeoJSON and seed grids")
    a.add_argument("--id", type=int, required=True)
    a.add_argument("--name", default="")
    g = a.add_mutually_exclusive_group(required=True)
    g.add_argument("--wkt")
    g.add_argument("--bbox", help="west,south,east,north")
    g.add_argument("--geojson", help="path to a GeoJSON file")
    a.add_argument("--depth", type=int, default=12)
    for flag in ("scan", "calendars", "details", "reviews", "bookings"):
        a.add_argument(f"--{flag}", action="store_true")
    a.set_defaults(fn=cmd_add_aoi)

    l = sub.add_parser("list-aoi", help="list AOIs (optionally CSV)")
    l.add_argument("--name-contains")
    l.add_argument("--csv", help="output directory for CSV")
    l.set_defaults(fn=cmd_list_aoi)

    aq = sub.add_parser("add-quadkey", help="insert one grid tile by quadkey")
    aq.add_argument("--quadkey", required=True)
    aq.set_defaults(fn=cmd_add_quadkey)

    d = sub.add_parser("discover", help="run the BFS discovery sweep (mock source)")
    d.add_argument("--max-waves", type=int, default=10)
    d.set_defaults(fn=cmd_discover)

    e = sub.add_parser("export-data", help="JSONL export with --only-latest/--since")
    e.add_argument("--table", default="responses")
    e.add_argument("--output", required=True)
    e.add_argument("--latest-per")
    e.add_argument("--ts-col", default="created_at")
    e.add_argument("--since")
    e.set_defaults(fn=cmd_export_data)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
