"""Recursive quadtree discovery as a driver-side BFS loop (SURVEY §2.10
T7/T8, §3.1; ref app/tasks.py:230-310 ``task_register_listings_or_divide_
at_quadkey``, split guard ref tasks.py:270-291, depth cap
MAX_GRID_LEVEL=22 ref core/settings.py:14, transactional split ref
utils/grids.py:107-118).

Spark has no recursion; the reference's per-task recursion becomes
breadth-first *waves*: the whole frontier is fetched as one batch per
iteration, so one wave = one bronze append + one listing MERGE + one
frontier computation — all set-based. At cluster scale the fetch step
runs inside ``mapInPandas`` over a repartitioned frontier (rate-limited
HTTP per partition); with the mock source it is a driver loop with the
same semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import search_listings, search_pagination
from ..operators.upsert import upsert
from ..sources.bronze import make_response_rows
from ..sources.mock_api import MockAirbnbApi

MAX_GRID_LEVEL = 22  # ref core/settings.py:14


def schemas_bronze_ddl() -> str:
    return (
        "response_id long, listing_id long, _type string, status_code int, "
        "payload string, url string, seconds_to_complete int, created_at timestamp, "
        "task_id string, was_successful boolean, is_retriable boolean, "
        "quadkey string, items_offset int"
    )


@dataclass
class DiscoveryResult:
    bronze: DataFrame
    listings: DataFrame
    grids: DataFrame  # final grid table after splits
    waves: int = 0
    fetches: int = 0
    splits: list[str] = field(default_factory=list)


def discover(
    spark: SparkSession,
    api: MockAirbnbApi,
    seed_quadkeys: list[str],
    max_level: int = MAX_GRID_LEVEL,
    max_waves: int = 50,
) -> DiscoveryResult:
    """BFS over the grid frontier.

    Per wave, for every (quadkey, items_offset) work item:
    fetch → bronze rows → extract listings (X1) + pagination (X3) →
    three-way branch per the reference (ref tasks.py:266-309):

    - paginated and ``len(qk) < max_level`` → replace grid with its 4
      children (next wave fetches them at offset 0) — T7;
    - paginated at max depth → continue with the next page offset — T8;
    - not paginated → grid finalized; record ``estimated_listings``.
    """
    frontier: list[tuple[str, int]] = [(qk, 0) for qk in seed_quadkeys]
    bronze_parts: list[DataFrame] = []
    all_listings: DataFrame | None = None
    grid_rows: dict[str, int] = {}  # quadkey -> estimated listings
    splits: list[str] = []
    response_id = 0
    waves = fetches = 0

    while frontier and waves < max_waves:
        waves += 1
        raw_rows = []
        for qk, offset in frontier:
            resp = api.get_homes(qk, items_offset=offset)
            fetches += 1
            response_id += 1
            raw_rows.append(
                (
                    response_id,
                    None,
                    "SRH",
                    resp.status_code,
                    resp.payload,
                    resp.url,
                    resp.seconds_to_complete,
                    datetime.now(timezone.utc).replace(tzinfo=None),
                    None,
                    qk,
                    offset,
                )
            )
        raw = spark.createDataFrame(
            raw_rows,
            "response_id long, listing_id long, _type string, status_code int, "
            "body string, url string, seconds_to_complete int, created_at timestamp, "
            "task_id string, quadkey string, items_offset int",
        )
        bronze = make_response_rows(raw.drop("quadkey", "items_offset")).join(
            raw.select("response_id", "quadkey", "items_offset"), "response_id"
        )
        bronze_parts.append(bronze)

        ok = bronze.filter(F.col("was_successful"))
        wave_listings = search_listings(ok).join(
            ok.select("response_id", F.col("quadkey").alias("grid_qk")), "response_id"
        )
        wave_new = wave_listings.select(
            "listing_id", "lon", "lat", "quadkey", "host_id", "city"
        ).dropDuplicates(["listing_id"])
        all_listings = (
            wave_new
            if all_listings is None
            else upsert(all_listings, wave_new, ["listing_id"])
        )

        pagination = {
            r.response_id: r
            for r in search_pagination(ok).collect()
        }
        qk_of = {r.response_id: (r.quadkey, r.items_offset) for r in raw.select("response_id", "quadkey", "items_offset").collect()}
        counts = {
            r.grid_qk: r.n
            for r in wave_listings.groupBy("grid_qk").agg(F.countDistinct("listing_id").alias("n")).collect()
        }

        next_frontier: list[tuple[str, int]] = []
        for rid, (qk, offset) in qk_of.items():
            meta = pagination.get(rid)
            has_next = bool(meta and meta.has_next_page)
            if has_next and len(qk) < max_level:
                # T7: split — replace parent with 4 children (G17)
                splits.append(qk)
                grid_rows.pop(qk, None)
                for d in "0123":
                    next_frontier.append((qk + d, 0))
            elif has_next:
                # T8: depth cap — follow pagination instead
                next_offset = int(meta.items_offset) if meta.items_offset is not None else offset + 10
                grid_rows[qk] = grid_rows.get(qk, 0) + counts.get(qk, 0)
                next_frontier.append((qk, next_offset))
            else:
                grid_rows[qk] = grid_rows.get(qk, 0) + counts.get(qk, 0)
        frontier = next_frontier

    if not bronze_parts:
        empty = spark.createDataFrame([], "quadkey string, estimated_listings long")
        return DiscoveryResult(
            bronze=spark.createDataFrame([], schemas_bronze_ddl()),
            listings=spark.createDataFrame(
                [], "listing_id long, lon double, lat double, quadkey string, host_id long, city string"
            ),
            grids=empty,
        )
    bronze_all = bronze_parts[0]
    for p in bronze_parts[1:]:
        bronze_all = bronze_all.unionByName(p)
    grids = spark.createDataFrame(
        [(qk, n) for qk, n in sorted(grid_rows.items())],
        "quadkey string, estimated_listings long",
    )
    return DiscoveryResult(
        bronze=bronze_all,
        listings=all_listings,
        grids=grids,
        waves=waves,
        fetches=fetches,
        splits=splits,
    )
