"""Composed beat-op jobs — the Spark translation of the reference's
periodic operations, end to end (SURVEY §3.2; ref
app/operations/calendars.py, grids.py). Each run is one batch job:
due-selection → distributed rate-limited fetch → bronze append → silver
extraction → freshness MERGE, all set-based.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..operators import extract
from ..operators.upsert import upsert
from ..sources.bronze import make_response_rows
from ..sources.http_fetch import Fetcher, fetch_batch, materialize, mock_fetcher
from . import harvest


@dataclass
class CalendarHarvestResult:
    bronze: DataFrame
    calendar_days: DataFrame
    listings: DataFrame          # with advanced freshness stamps
    listing_responses: DataFrame  # J9 bridge rows
    n_due: int


def run_calendar_harvest(
    spark: SparkSession,
    listings: DataFrame,
    aoi_covers: DataFrame,
    inflight: DataFrame | None = None,
    fetcher: Fetcher = mock_fetcher,
    how_many: int = 500_000,
    now_expr: str = "current_timestamp()",
    rate_per_sec: float | None = None,
) -> CalendarHarvestResult:
    """op_update_calendar_periodical (ref operations/calendars.py:84-133
    + worker task tasks.py:97-123), as one batch job:

    1. due-selection (J2+P7+J6+W1+W6);
    2. ``mapInPandas`` fetch of 12-month calendars (S2, rate-limited);
    3. bronze append with status routing (S11);
    4. silver ``calendar_days`` explode (X11);
    5. MERGE ``calendar_updated_at`` stamps + M2M bridge rows (J9/T10)
       for successful fetches only (the reference stamps after linking
       the response — tasks.py:119-122).
    """
    due = harvest.select_due_calendars(listings, aoi_covers, inflight, how_many=how_many)
    n_due = due.count()
    work = due.select(
        F.lit("calendar").alias("kind"),
        F.col("listing_id").cast("string").alias("key"),
        F.lit(0).cast("long").alias("offset"),
    )
    fetched = fetch_batch(work, fetcher, rate_per_sec=rate_per_sec)
    raw = fetched.select(
        md5_long(F.concat_ws("#", "kind", "key", "offset")).alias("response_id"),
        F.col("key").cast("long").alias("listing_id"),
        F.lit("CAL").alias("_type"),
        "status_code",
        "body",
        "url",
        "seconds_to_complete",
        F.expr(now_expr).alias("created_at"),
        F.lit(None).cast("string").alias("task_id"),
    )
    # one-shot barrier: bronze fans out to days/stamps/bridge and the
    # returned frame — without it each action would re-run the HTTP stage
    bronze = materialize(make_response_rows(raw))
    ok = bronze.filter(F.col("was_successful"))
    days = extract.calendar_days(ok)
    stamped = upsert(
        listings,
        listings.join(ok.select("listing_id").distinct(), "listing_id", "left_semi")
        .withColumn("calendar_updated_at", F.expr(now_expr)),
        ["listing_id"],
    )
    bridge = ok.select("listing_id", "response_id")
    return CalendarHarvestResult(bronze, days, stamped, bridge, n_due)


@dataclass
class ReviewHarvestResult:
    bronze: DataFrame
    reviews: DataFrame
    users: DataFrame
    listings: DataFrame
    n_due: int
    n_pages: int


def run_review_harvest(
    spark: SparkSession,
    listings: DataFrame,
    aoi_covers: DataFrame,
    inflight: DataFrame | None = None,
    fetcher: Fetcher = mock_fetcher,
    how_many: int = 50,
    page_size: int = 100,
    now_expr: str = "current_timestamp()",
) -> ReviewHarvestResult:
    """op_update_reviews_periodical + task_add_reviews_of_listing (ref
    operations/reviews.py:79-139, tasks.py:32-94), with the parallel
    improvement SURVEY §3.3 notes: page offsets are computed up front
    from page 1's ``reviews_count`` and fetched as one batch instead of
    sequential task chaining. Users are get_or_create'd with placeholder
    defaults; review rows are persisted (the reference builds but never
    saves them — we implement the intended behavior its tests assert)."""
    due = harvest.select_due(
        listings,
        aoi_covers,
        inflight,
        flag_col="collect_reviews",
        freshness_col="reviews_updated_at",
        threshold_expr=f"{now_expr} - INTERVAL 504 HOUR",  # 21 days
        how_many=how_many,
    )
    n_due = due.count()
    first_pages = fetch_batch(
        due.select(
            F.lit("reviews").alias("kind"),
            F.col("listing_id").cast("string").alias("key"),
            F.lit(0).cast("long").alias("offset"),
        ),
        fetcher,
    )

    def _bronze(fetched: DataFrame) -> DataFrame:
        raw = fetched.select(
            md5_long(F.concat_ws("#", "kind", "key", "offset")).alias("response_id"),
            F.col("key").cast("long").alias("listing_id"),
            F.lit("RVW").alias("_type"),
            "status_code",
            "body",
            "url",
            "seconds_to_complete",
            F.expr(now_expr).alias("created_at"),
            F.lit(None).cast("string").alias("task_id"),
        )
        return make_response_rows(raw)

    bronze0 = materialize(_bronze(first_pages))  # page-1 fetch runs once
    counts = extract.reviews_count(bronze0.filter(F.col("was_successful")))
    offsets = harvest.review_page_offsets(counts, page_size).filter(F.col("offset") > 0)
    rest = fetch_batch(
        offsets.select(
            F.lit("reviews").alias("kind"),
            F.col("listing_id").cast("string").alias("key"),
            F.col("offset").cast("long").alias("offset"),
        ),
        fetcher,
    )
    bronze = materialize(bronze0.unionByName(_bronze(rest)))
    n_pages = bronze.count()
    ok = bronze.filter(F.col("was_successful"))
    reviews = extract.review_rows(ok).dropDuplicates(["review_id"])
    users = extract.review_users(ok)
    stamped = upsert(
        listings,
        listings.join(ok.select("listing_id").distinct(), "listing_id", "left_semi")
        .withColumn("reviews_updated_at", F.expr(now_expr)),
        ["listing_id"],
    )
    return ReviewHarvestResult(bronze, reviews, users, stamped, n_due, n_pages)


@dataclass
class BookingQuoteResult:
    windows: DataFrame  # listing_id, check_in, check_out
    bronze: DataFrame
    n_quoted: int


def run_booking_quotes(
    spark: SparkSession,
    calendar_days: DataFrame,
    fetcher: Fetcher = mock_fetcher,
    today_expr: str = "DATE '2024-01-01'",
    now_expr: str = "current_timestamp()",
) -> BookingQuoteResult:
    """S7 booking-quote flow (ref airbnb_api.py:408-491 +
    operations/bookings.py): derive the first feasible (check_in,
    check_out) per listing from silver calendar days (W5 window algebra,
    not an imperative scan), then fetch one quote per feasible listing.
    Listings with no feasible window are skipped (the reference raises
    NoBookingDatesError per listing; set-semantics drop them)."""
    windows = harvest.derive_booking_window(calendar_days, today_expr=today_expr)
    work = windows.select(
        F.lit("listing").alias("kind"),
        F.col("listing_id").cast("string").alias("key"),
        F.lit(0).cast("long").alias("offset"),
    )
    fetched = fetch_batch(work, fetcher)
    raw = fetched.select(
        md5_long(F.concat_ws("#", "kind", "key", "offset")).alias("response_id"),
        F.col("key").cast("long").alias("listing_id"),
        F.lit("BQT").alias("_type"),
        "status_code",
        "body",
        "url",
        "seconds_to_complete",
        F.expr(now_expr).alias("created_at"),
        F.lit(None).cast("string").alias("task_id"),
    )
    bronze = materialize(make_response_rows(raw))
    return BookingQuoteResult(windows, bronze, bronze.count())


@dataclass
class GridEstimateResult:
    grids: DataFrame
    bronze: DataFrame
    n_scanned: int
    n_split: int


def run_grid_estimate(
    spark: SparkSession,
    grids: DataFrame,
    fetcher: Fetcher = mock_fetcher,
    less_than: int = 50,
    max_level: int = 22,
    age_hours: int = 14 * 24,
    how_many: int = 500,
    now_expr: str = "current_timestamp()",
) -> GridEstimateResult:
    """op_estimate_listings_or_divide_periodical (ref
    operations/grids.py:20-84,100-160): stale grids get a metadata-only
    search (S6); a grid whose ``listings_count`` estimate exceeds
    ``less_than`` and is above tile depth ``max_level`` is replaced by
    its 4 children (G17, one generation per run — the reference recurses
    via task fan-out, the next periodic run refines further); otherwise
    its estimate and scan stamp are updated (T10)."""
    stale = grids.filter(
        F.col("last_estimated_scan_at").isNull()
        | (F.col("last_estimated_scan_at") < F.expr(f"{now_expr} - INTERVAL {age_hours} HOUR"))
    )
    picked = stale.orderBy(F.col("last_estimated_scan_at").asc_nulls_first(), F.col("quadkey")).limit(
        how_many
    )
    work = picked.select(
        F.lit("search").alias("kind"), F.col("quadkey").alias("key"), F.lit(0).cast("long").alias("offset")
    )
    fetched = fetch_batch(work, fetcher)
    raw = fetched.select(
        md5_long(F.concat_ws("#", "kind", "key", "offset")).alias("response_id"),
        F.lit(None).cast("long").alias("listing_id"),
        F.lit("SHM").alias("_type"),
        "status_code",
        "body",
        "url",
        "seconds_to_complete",
        F.expr(now_expr).alias("created_at"),
        F.col("key").alias("task_id"),  # carry quadkey through
    )
    bronze = materialize(make_response_rows(raw))
    counts = (
        extract.search_pagination(bronze.filter(F.col("was_successful")))
        .join(bronze.select("response_id", F.col("task_id").alias("quadkey")), "response_id")
        .select("quadkey", F.coalesce("listings_count", F.lit(0)).alias("estimate"))
    )
    scanned = picked.join(counts, "quadkey", "left")
    to_split = scanned.filter(
        (F.col("estimate") >= less_than) & (F.length("quadkey") < max_level)
    )
    kept = scanned.join(to_split.select("quadkey"), "quadkey", "left_anti").select(
        "quadkey",
        F.coalesce("estimate", F.col("estimated_listings")).cast("int").alias("estimated_listings"),
        F.expr(now_expr).alias("last_estimated_scan_at"),
    )
    children = to_split.select(
        F.explode(
            F.transform(
                F.array(F.lit("0"), F.lit("1"), F.lit("2"), F.lit("3")),
                lambda d: F.concat(F.col("quadkey"), d),
            )
        ).alias("quadkey"),
        F.lit(-1).alias("estimated_listings"),
        F.lit(None).cast("timestamp").alias("last_estimated_scan_at"),
    )
    untouched = grids.join(picked.select("quadkey"), "quadkey", "left_anti").select(
        "quadkey", "estimated_listings", "last_estimated_scan_at"
    )
    new_grids = untouched.unionByName(kept).unionByName(children)
    return GridEstimateResult(
        grids=new_grids,
        bronze=bronze,
        n_scanned=picked.count(),
        n_split=to_split.count(),
    )
