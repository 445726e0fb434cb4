"""Mock HTTP source (S1-S8): a FIFO response queue exactly like the
reference's test double (ref tests/conftest.py:29-180 —
``mock_airbnb_client`` pops queued payloads per call), plus a
deterministic auto-generating mode for large runs.

The real-source contract is the same surface the reference's
``AirbnbApi`` exposes (ref airbnb_interface/airbnb_api.py): each method
returns (status_code, payload_text, meta). A production deployment would
implement this interface with rate-limited HTTP inside ``mapInPandas``
partitions (SURVEY §4: token bucket per executor); everything downstream
(bronze append, extraction, MERGE) is source-agnostic.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from . import payloads


@dataclass
class MockResponse:
    status_code: int
    payload: str
    url: str = ""
    seconds_to_complete: int = 0


@dataclass
class MockAirbnbApi:
    """FIFO-queue mock: queued responses are served first; when the queue
    is empty, deterministic synthetic payloads are generated (seeded by
    the request arguments)."""

    queue: deque = field(default_factory=deque)
    calls: list = field(default_factory=list)
    auto: bool = True

    def enqueue(self, status_code: int, payload: str) -> None:
        self.queue.append(MockResponse(status_code, payload))

    def _next(self, kind: str, gen) -> MockResponse:
        if self.queue:
            return self.queue.popleft()
        if not self.auto:
            raise RuntimeError(f"mock queue empty for {kind}")
        return MockResponse(200, gen())

    # --- S1: bbox search (ref airbnb_api.py:244-317)
    def get_homes(self, quadkey: str, items_offset: int = 0, **kw) -> MockResponse:
        self.calls.append(("get_homes", quadkey, items_offset))
        r = self._next("search", lambda: payloads.search_payload(quadkey, items_offset=items_offset))
        r.url = f"https://mock/explore_tabs?qk={quadkey}&items_offset={items_offset}"
        return r

    # --- S6: metadata-only search (ref airbnb_api.py:390-406)
    def bbox_metadata_search(self, quadkey: str, **kw) -> MockResponse:
        self.calls.append(("bbox_metadata_search", quadkey))
        r = self._next("meta", lambda: payloads.metadata_search_payload(quadkey, listings_count=10))
        r.url = f"https://mock/explore_tabs?qk={quadkey}&metadata_only=true"
        return r

    # --- S2: calendar (ref airbnb_api.py:189-215)
    def get_calendar(self, listing_id: int, calendar_months: int = 12) -> MockResponse:
        self.calls.append(("get_calendar", listing_id))
        r = self._next("calendar", lambda: payloads.calendar_payload(listing_id, months=calendar_months))
        r.url = f"https://mock/calendar_months?listing_id={listing_id}"
        return r

    # --- S3: reviews page (ref airbnb_api.py:217-232)
    def get_reviews(self, listing_id: int, offset: int = 0, limit: int = 20) -> MockResponse:
        self.calls.append(("get_reviews", listing_id, offset))
        r = self._next(
            "reviews", lambda: payloads.review_payload(listing_id, n_reviews=limit, offset=offset)
        )
        r.url = f"https://mock/reviews?listing_id={listing_id}&_offset={offset}&_limit={limit}"
        return r

    # --- S4: listing details (ref airbnb_api.py:319-334)
    def get_listing_details(self, listing_id: int) -> MockResponse:
        self.calls.append(("get_listing_details", listing_id))
        r = self._next("detail", lambda: payloads.listing_detail_payload(listing_id))
        r.url = f"https://mock/pdp_listing_details?listing_id={listing_id}"
        return r

    # --- S5: user profile (ref airbnb_api.py:383-388)
    def get_user(self, user_id: int) -> MockResponse:
        self.calls.append(("get_user", user_id))
        r = self._next("user", lambda: payloads.user_payload(user_id))
        r.url = f"https://mock/users/show/{user_id}"
        return r
