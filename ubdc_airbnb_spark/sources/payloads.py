"""Deterministic synthetic payload generators, structurally faithful to
the reference's Faker-based generators (ref tests/payload_generators.py)
and golden samples (ref samples/*.json) — but fully seeded so pipeline
tests are reproducible without faker.
"""

from __future__ import annotations

import json
import random
from datetime import date, timedelta

from ..functions import geometry as geo


def _rng(seed) -> random.Random:
    return random.Random(f"payload-{seed}")


def search_payload(
    qk: str,
    has_next_page: bool = False,
    number_of_listings: int = 10,
    listings_count: int | None = None,
    items_offset: int = 0,
    session_id: str = "00000000-0000-0000-0000-000000000000",
    seed: str | int = 0,
) -> str:
    """Search/bbox payload (ref payload_generators.py:34-108): listings
    placed inside the quadkey's tile bbox."""
    rng = _rng(("search", qk, seed))
    west, south, east, north = geo.quadkey_bbox(qk)
    listings = []
    for _ in range(number_of_listings):
        lid = rng.randint(10_000, 10_000_000)
        listings.append(
            {
                "listing": {
                    "id": lid,
                    "id_str": str(lid),
                    "lat": rng.uniform(south, north),
                    "lng": rng.uniform(west, east),
                    "city": f"city{rng.randint(0, 99)}",
                    "user": {"id": rng.randint(300_000, 1_000_000), "first_name": f"host{rng.randint(0,999)}"},
                }
            }
        )
    geography = {"ne_lat": north, "ne_lng": east, "sw_lat": south, "sw_lng": west}
    return json.dumps(
        {
            "explore_tabs": [
                {
                    "tab_id": "home_tab",
                    "pagination_metadata": {
                        "has_next_page": has_next_page,
                        "items_offset": items_offset + number_of_listings,
                        "previous_page_items_offset": items_offset,
                    },
                    "sections": [{}, {}, {"listings": listings}],
                    "home_tab_metadata": {
                        "listings_count": listings_count
                        if listings_count is not None
                        else number_of_listings,
                        "geography": geography,
                    },
                }
            ],
            "metadata": {"federated_search_session_id": session_id, "geography": geography},
        }
    )


def metadata_search_payload(qk: str, listings_count: int, seed: str | int = 0) -> str:
    """Metadata-only search with price histogram (S6; ref
    tests/units/test_units_test.py:31-99 shape)."""
    rng = _rng(("meta", qk, seed))
    hist = [rng.randint(0, 20) for _ in range(50)]
    body = json.loads(search_payload(qk, number_of_listings=0, listings_count=listings_count, seed=seed))
    body["price_histogram"] = {"histogram": hist, "average_price": sum(hist) / 50.0}
    return json.dumps(body)


def calendar_payload(
    listing_id: int, months: int = 12, start: date = date(2024, 1, 1), seed: str | int = 0
) -> str:
    """Calendar payload (ref samples/calendar_response.sample.json,
    payload_generators.py:173-204) with availability runs so the booking
    check-in/out derivation has solutions."""
    rng = _rng(("cal", listing_id, seed))
    cal_months = []
    d = start
    for _ in range(months):
        days = []
        for _ in range(30):
            available = rng.random() > 0.4
            days.append(
                {
                    "date": d.isoformat(),
                    "price": {
                        "local_price": round(rng.uniform(30, 300), 0),
                        "native_price": round(rng.uniform(30, 300), 0),
                        "local_currency": "GBP",
                        "native_currency": "EUR",
                    },
                    "available": available,
                    "available_for_checkin": available and rng.random() > 0.2,
                    "min_nights": rng.randint(1, 4),
                    "max_nights": 1125,
                }
            )
            d += timedelta(days=1)
        cal_months.append({"listing_id": listing_id, "days": days})
    return json.dumps({"metadata": {}, "calendar_months": cal_months})


def review_payload(
    listing_id: int, n_reviews: int = 20, reviews_count: int = 350, offset: int = 0, seed: str | int = 0
) -> str:
    """Reviews page (ref payload_generators.py:111-143)."""
    rng = _rng(("rvw", listing_id, offset, seed))
    reviews = []
    for i in range(n_reviews):
        rid = offset * 1000 + i + rng.randint(300_000, 900_000)
        author = rng.randint(300_000, 1_000_000)
        recipient = rng.randint(300_000, 1_000_000)
        reviews.append(
            {
                "id": rid,
                "id_str": str(rid),
                "role": "guest",
                "comments": " ".join(rng.choice(["great", "stay", "clean", "host", "lovely", "noisy"]) for _ in range(12)),
                "language": rng.choice(["en", "de", "fr", ""]),
                "created_at": f"2024-0{rng.randint(1,9)}-{rng.randint(10,28)}T12:00:00+00:00",
                "author": {"id": author, "first_name": f"a{author % 100}", "picture_url": f"https://img/{author}.jpg?size=small"},
                "recipient": {"id": recipient, "first_name": f"r{recipient % 100}", "picture_url": f"https://img/{recipient}.jpg"},
            }
        )
    return json.dumps({"reviews": reviews, "metadata": {"reviews_count": reviews_count}})


def user_payload(user_id: int, seed: str | int = 0) -> str:
    """User profile (ref payload_generators.py:15-31, samples/user_detail)."""
    rng = _rng(("usr", user_id, seed))
    return json.dumps(
        {
            "user": {
                "id": user_id,
                "first_name": f"user{user_id % 1000}",
                "about": " ".join("word" + str(rng.randint(0, 50)) for _ in range(10)),
                "picture_url": f"https://img/{user_id}.jpg?v=2",
                "picture_urls": [f"https://img/{user_id}-{i}.jpg" for i in range(3)],
                "is_superhost": rng.random() > 0.5,
                "location": f"country{rng.randint(0, 30)}",
                "listings_count": rng.randint(0, 100),
                "verifications": [rng.choice(["email", "phone", "id"]) for _ in range(2)],
                "created_at": "2020-05-01T00:00:00+00:00",
            }
        }
    )


def listing_detail_payload(listing_id: int, lat: float = 51.5, lng: float = -0.1, seed: str | int = 0) -> str:
    """Listing-detail payload (ref payload_generators.py:146-170)."""
    rng = _rng(("lst", listing_id, seed))
    return json.dumps(
        {
            "metadata": {},
            "pdp_listing_detail": {
                "id": listing_id,
                "lat": lat,
                "lng": lng,
                "city": "London",
                "state": "ENG",
                "country": "UK",
                "star_rating": round(rng.uniform(3, 5), 1),
                "is_hotel": False,
                "primary_host": {"id": rng.randint(300_000, 1_000_000), "is_superhost": True},
                "additional_hosts": [
                    {"id": rng.randint(300_000, 1_000_000), "is_superhost": False}
                ],
                "photos": [{"id": rng.randint(1, 10**6)} for _ in range(3)],
            },
        }
    )
