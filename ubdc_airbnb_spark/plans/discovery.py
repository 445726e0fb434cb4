"""Recursive quadtree discovery as a driver-side BFS over *distributed*
fetch waves (SURVEY §2.10 T7/T8, §3.1; ref app/tasks.py:230-310
``task_register_listings_or_divide_at_quadkey``, split guard ref
tasks.py:270-291, depth cap MAX_GRID_LEVEL=22 ref core/settings.py:14,
transactional split ref utils/grids.py:107-118).

Spark has no recursion; the reference's per-task recursion becomes
breadth-first *waves*: the whole frontier is fetched as ONE Spark stage
per iteration (``sources/http_fetch.fetch_batch`` — rate-limited
``mapInPandas``, the same distributed fetch the other composed ops use),
so one wave = one fetch stage + one bronze materialization + one listing
MERGE + one frontier computation. Only the frontier bookkeeping — a list
of (quadkey, offset) work items, by construction tiny relative to the
data fetched — lives on the driver.

Test doubles: the reference's FIFO-queue mock client is inherently
driver-stateful, so when a :class:`MockAirbnbApi` is passed instead of a
``Fetcher`` callable, each wave pre-assigns its queued responses to the
wave's (sorted) work items driver-side and ships the resulting pure
lookup table through ``fetch_batch`` — FIFO semantics for tests, Spark
tasks for execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..operators.extract import search_listings, search_pagination
from ..operators.upsert import upsert
from ..sources.bronze import make_response_rows
from ..sources.http_fetch import Fetcher, fetch_batch, materialize
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


def _wave_fetcher(
    source: Fetcher | MockAirbnbApi, frontier: list[tuple[str, int]]
) -> Fetcher:
    """Resolve the fetcher for one wave.

    A plain callable is used as-is (stateless, executor-safe). A FIFO
    ``MockAirbnbApi`` is drained driver-side: its queued responses are
    assigned to the frontier's work items in order (the order the parent
    wave created them), producing a picklable dict-lookup fetcher; with an
    empty queue in auto mode it falls back to the same deterministic
    synthetic payloads ``MockAirbnbApi.get_homes`` would generate."""
    if not isinstance(source, MockAirbnbApi):
        return source

    api = source
    assigned: dict[tuple[str, int], tuple[int, str, str]] = {}
    for qk, offset in frontier:
        api.calls.append(("get_homes", qk, offset))
        url = f"https://mock/explore_tabs?qk={qk}&items_offset={offset}"
        if api.queue:
            r = api.queue.popleft()
            assigned[(qk, offset)] = (r.status_code, r.payload, url)
        elif not api.auto:
            raise RuntimeError("mock queue empty for search")

    auto = api.auto

    def fetcher(kind: str, key: str, offset: int) -> tuple[int, str, str]:
        hit = assigned.get((key, int(offset)))
        if hit is not None:
            return hit
        if auto:
            from ..sources import payloads

            return (
                200,
                payloads.search_payload(key, items_offset=int(offset)),
                f"https://mock/explore_tabs?qk={key}&items_offset={offset}",
            )
        return 404, "", f"https://mock/explore_tabs?qk={key}"

    return fetcher


def discover(
    spark: SparkSession,
    source: Fetcher | MockAirbnbApi,
    seed_quadkeys: list[str],
    max_level: int = MAX_GRID_LEVEL,
    max_waves: int = 50,
    rate_per_sec: float | None = None,
    partitions: int | None = None,
) -> DiscoveryResult:
    """BFS over the grid frontier.

    Per wave, the whole frontier of (quadkey, items_offset) work items is
    fetched as one ``fetch_batch`` stage (Spark tasks, rate-limited per
    partition), then: bronze rows → extract listings (X1) + pagination
    (X3) → three-way branch per the reference (ref tasks.py:266-309):

    - paginated and ``len(qk) < max_level`` → replace grid with its 4
      children (next wave fetches them at offset 0) — T7;
    - paginated at max depth → continue with the next page offset — T8;
    - not paginated → grid finalized; record ``estimated_listings``.
    """
    from ..operators.iterstate import CheckpointChain

    frontier: list[tuple[str, int]] = sorted((qk, 0) for qk in seed_quadkeys)
    bronze_parts: list[DataFrame] = []
    all_listings: DataFrame | None = None
    grid_rows: dict[str, int] = {}  # quadkey -> estimated listings
    splits: list[str] = []
    waves = fetches = 0
    # the accumulated-listings MERGE references its previous state twice
    # (anti-join + union), so an un-severed chain DOUBLES the logical
    # plan per wave: a deep pagination chain (40+ waves at the depth
    # cap — the real city-center case) pins Catalyst analysis at 100%
    # of one core before any task runs (r10 hot-tile smoke finding).
    # CheckpointChain keeps the state bounded at O(1) generations.
    chain = CheckpointChain(spark)

    while frontier and waves < max_waves:
        waves += 1
        fetches += len(frontier)
        fetcher = _wave_fetcher(source, frontier)

        work = spark.createDataFrame(
            [("search", qk, offset) for qk, offset in frontier],
            "kind string, key string, offset long",
        )
        # one Spark stage fetches the whole wave; materialize = the fetch
        # runs exactly once no matter how many consumers follow
        fetched = materialize(
            fetch_batch(work, fetcher, rate_per_sec=rate_per_sec, partitions=partitions)
        )
        raw = fetched.select(
            md5_long(
                F.concat_ws("#", F.lit(str(waves)), "kind", "key", "offset")
            ).alias("response_id"),
            F.lit(None).cast("long").alias("listing_id"),
            F.lit("SRH").alias("_type"),
            "status_code",
            "body",
            "url",
            "seconds_to_complete",
            F.current_timestamp().alias("created_at"),
            F.lit(None).cast("string").alias("task_id"),
            F.col("key").alias("quadkey"),
            F.col("offset").cast("int").alias("items_offset"),
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
        all_listings = chain.step(
            wave_new
            if all_listings is None
            else upsert(all_listings, wave_new, ["listing_id"])
        )
        chain.retire(keep=1)

        # frontier bookkeeping: one collect of frontier-sized metadata
        # (pagination flags + per-grid counts), never listing-scale data
        meta_rows = (
            search_pagination(ok)
            .select(
                "response_id",
                "has_next_page",
                F.col("items_offset").alias("next_offset"),
            )
            .join(
                ok.select(
                    "response_id", "quadkey", F.col("items_offset").alias("req_offset")
                ),
                "response_id",
            )
            .collect()
        )
        pagination = {(r.quadkey, r.req_offset): r for r in meta_rows}
        counts = {
            r.grid_qk: r.n
            for r in wave_listings.groupBy("grid_qk")
            .agg(F.countDistinct("listing_id").alias("n"))
            .collect()
        }

        next_frontier: list[tuple[str, int]] = []
        for qk, offset in frontier:
            meta = pagination.get((qk, offset))
            has_next = bool(meta and meta.has_next_page)
            if has_next and len(qk) < max_level:
                # T7: split — replace parent with 4 children (G17)
                splits.append(qk)
                grid_rows.pop(qk, None)
                for d in "0123":
                    next_frontier.append((qk + d, 0))
            elif has_next:
                # T8: depth cap — follow pagination instead
                next_offset = (
                    int(meta.next_offset) if meta.next_offset is not None else offset + 10
                )
                grid_rows[qk] = grid_rows.get(qk, 0) + counts.get(qk, 0)
                next_frontier.append((qk, next_offset))
            else:
                grid_rows[qk] = grid_rows.get(qk, 0) + counts.get(qk, 0)
        frontier = sorted(next_frontier)

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
    # the returned listings frame IS the last generation: keep it live,
    # free everything else the chain pinned
    chain.close(keep_last=True)
    return DiscoveryResult(
        bronze=bronze_all,
        listings=all_listings,
        grids=grids,
        waves=waves,
        fetches=fetches,
        splits=splits,
    )
