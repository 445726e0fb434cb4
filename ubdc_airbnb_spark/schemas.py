"""StructType schemas for the 8 persistent entities (SURVEY §1, ref
app/models.py via migrations 0001_initial.py) and the 5 JSON payload
shapes (ref tests/payload_generators.py, samples/*.json).

Payloads are schema-on-read in the reference (jsonpath over ``payload``);
here the known shapes are declared so extraction compiles to native
``from_json`` + field access (SURVEY §2.8), with the raw string kept in
bronze for the generic escape hatch (X7).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ------------------------------------------------------------ entities

AOI = T.StructType(
    [
        T.StructField("aoi_id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("geom_wkt", T.StringType(), True),  # EPSG:4326 MultiPolygon
        T.StructField(
            "bbox",
            T.StructType(
                [
                    T.StructField("xmin", T.DoubleType()),
                    T.StructField("ymin", T.DoubleType()),
                    T.StructField("xmax", T.DoubleType()),
                    T.StructField("ymax", T.DoubleType()),
                ]
            ),
            True,
        ),
        T.StructField("notes", T.StringType(), True),  # JSON
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("scan_for_new_listings", T.BooleanType(), True),
        T.StructField("collect_calendars", T.BooleanType(), True),
        T.StructField("collect_listing_details", T.BooleanType(), True),
        T.StructField("collect_reviews", T.BooleanType(), True),
        T.StructField("collect_bookings", T.BooleanType(), True),
    ]
)

GRID = T.StructType(
    [
        T.StructField("quadkey", T.StringType(), False),
        T.StructField("tile_x", T.LongType(), True),
        T.StructField("tile_y", T.LongType(), True),
        T.StructField("tile_z", T.IntegerType(), True),
        T.StructField("bbox_ll_ur", T.StringType(), True),  # "minx,miny,maxx,maxy"
        T.StructField("area", T.DoubleType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("last_estimated_scan_at", T.TimestampType(), True),
        T.StructField("last_listings_scan_at", T.TimestampType(), True),
        T.StructField("estimated_listings", T.IntegerType(), True),  # -1 unknown
    ]
)

LISTING = T.StructType(
    [
        T.StructField("listing_id", T.LongType(), False),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("quadkey", T.StringType(), True),  # depth-22 bucketing key
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("listing_updated_at", T.TimestampType(), True),
        T.StructField("calendar_updated_at", T.TimestampType(), True),
        T.StructField("booking_quote_updated_at", T.TimestampType(), True),
        T.StructField("reviews_updated_at", T.TimestampType(), True),
        T.StructField(
            "notes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("moved_at", T.TimestampType()),
                        T.StructField("from_lon", T.DoubleType()),
                        T.StructField("from_lat", T.DoubleType()),
                        T.StructField("to_lon", T.DoubleType()),
                        T.StructField("to_lat", T.DoubleType()),
                        T.StructField("distance_m", T.DoubleType()),
                    ]
                )
            ),
            True,
        ),
    ]
)

#: response _type enum (ref models.py:337-346)
RESPONSE_TYPES = ("UNK", "BQT", "CAL", "RVW", "LST", "SRH", "SHM", "USR")

RESPONSE = T.StructType(
    [
        T.StructField("response_id", T.LongType(), False),
        T.StructField("listing_id", T.LongType(), True),
        T.StructField("_type", T.StringType(), True),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("payload", T.StringType(), True),  # JSON text (bronze)
        T.StructField("request_headers", T.StringType(), True),
        T.StructField("query_params", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("seconds_to_complete", T.IntegerType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("task_id", T.StringType(), True),
    ]
)

USER = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("about", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("airbnb_listing_count", T.IntegerType(), True),
        T.StructField("verifications", T.ArrayType(T.StringType()), True),
        T.StructField("picture_url", T.StringType(), True),
        T.StructField("is_superhost", T.BooleanType(), True),
        T.StructField("profile_created_at", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("last_updated", T.TimestampType(), True),
    ]
)

REVIEW = T.StructType(
    [
        T.StructField("review_id", T.LongType(), False),
        T.StructField("listing_id", T.LongType(), True),
        T.StructField("author_id", T.LongType(), True),
        T.StructField("recipient_id", T.LongType(), True),
        T.StructField("response_id", T.LongType(), True),
        T.StructField("review_created_at", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("review_text", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
    ]
)

CALENDAR_DAY = T.StructType(
    [
        T.StructField("listing_id", T.LongType(), False),
        T.StructField("date", T.DateType(), True),
        T.StructField("available", T.BooleanType(), True),
        T.StructField("available_for_checkin", T.BooleanType(), True),
        T.StructField("min_nights", T.IntegerType(), True),
        T.StructField("max_nights", T.IntegerType(), True),
        T.StructField("local_price", T.DoubleType(), True),
        T.StructField("native_price", T.DoubleType(), True),
        T.StructField("local_currency", T.StringType(), True),
        T.StructField("native_currency", T.StringType(), True),
    ]
)

#: task statuses (ref models.py:630-637)
TASK_STATUSES = ("SUBMITTED", "STARTED", "SUCCESS", "FAILURE", "REVOKED", "RETRY", "UNKNOWN")

TASK_LEDGER = T.StructType(
    [
        T.StructField("task_id", T.StringType(), False),
        T.StructField("task_name", T.StringType(), True),
        T.StructField("task_kwargs", T.StringType(), True),  # JSON
        T.StructField("status", T.StringType(), True),
        T.StructField("submitted_at", T.TimestampType(), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("finished_at", T.TimestampType(), True),
        T.StructField("retries", T.IntegerType(), True),
        T.StructField("group_task_id", T.StringType(), True),
        T.StructField("expires_at", T.TimestampType(), True),
    ]
)

# ------------------------------------------------------- payload shapes
# (ref tests/payload_generators.py:34-108, samples/*.json)

_GEOGRAPHY = T.StructType(
    [
        T.StructField("ne_lat", T.DoubleType()),
        T.StructField("ne_lng", T.DoubleType()),
        T.StructField("sw_lat", T.DoubleType()),
        T.StructField("sw_lng", T.DoubleType()),
    ]
)

SEARCH_PAYLOAD = T.StructType(
    [
        T.StructField(
            "explore_tabs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tab_id", T.StringType()),
                        T.StructField(
                            "pagination_metadata",
                            T.StructType(
                                [
                                    T.StructField("has_next_page", T.BooleanType()),
                                    T.StructField("items_offset", T.LongType()),
                                    T.StructField("previous_page_items_offset", T.LongType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "sections",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "listings",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "listing",
                                                            T.StructType(
                                                                [
                                                                    T.StructField("id", T.LongType()),
                                                                    T.StructField("id_str", T.StringType()),
                                                                    T.StructField("lat", T.DoubleType()),
                                                                    T.StructField("lng", T.DoubleType()),
                                                                    T.StructField("city", T.StringType()),
                                                                    T.StructField(
                                                                        "user",
                                                                        T.StructType(
                                                                            [
                                                                                T.StructField("id", T.LongType()),
                                                                                T.StructField(
                                                                                    "first_name", T.StringType()
                                                                                ),
                                                                            ]
                                                                        ),
                                                                    ),
                                                                ]
                                                            ),
                                                        )
                                                    ]
                                                )
                                            ),
                                        )
                                    ]
                                )
                            ),
                        ),
                        T.StructField(
                            "home_tab_metadata",
                            T.StructType(
                                [
                                    T.StructField("listings_count", T.LongType()),
                                    T.StructField("geography", _GEOGRAPHY),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("federated_search_session_id", T.StringType()),
                    T.StructField("geography", _GEOGRAPHY),
                ]
            ),
        ),
        T.StructField(
            "price_histogram",
            T.StructType(
                [
                    T.StructField("histogram", T.ArrayType(T.LongType())),
                    T.StructField("average_price", T.DoubleType()),
                ]
            ),
        ),
    ]
)

CALENDAR_PAYLOAD = T.StructType(
    [
        T.StructField(
            "calendar_months",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("listing_id", T.LongType()),
                        T.StructField(
                            "days",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("date", T.StringType()),
                                        T.StructField(
                                            "price",
                                            T.StructType(
                                                [
                                                    T.StructField("local_price", T.DoubleType()),
                                                    T.StructField("native_price", T.DoubleType()),
                                                    T.StructField("local_currency", T.StringType()),
                                                    T.StructField("native_currency", T.StringType()),
                                                ]
                                            ),
                                        ),
                                        T.StructField("available", T.BooleanType()),
                                        T.StructField("available_for_checkin", T.BooleanType()),
                                        T.StructField("min_nights", T.IntegerType()),
                                        T.StructField("max_nights", T.IntegerType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

REVIEW_PAYLOAD = T.StructType(
    [
        T.StructField(
            "reviews",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("id_str", T.StringType()),
                        T.StructField("role", T.StringType()),
                        T.StructField("comments", T.StringType()),
                        T.StructField("language", T.StringType()),
                        T.StructField("created_at", T.StringType()),
                        T.StructField(
                            "author",
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField("first_name", T.StringType()),
                                    T.StructField("picture_url", T.StringType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "recipient",
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField("first_name", T.StringType()),
                                    T.StructField("picture_url", T.StringType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "metadata",
            T.StructType([T.StructField("reviews_count", T.LongType())]),
        ),
    ]
)

USER_PAYLOAD = T.StructType(
    [
        T.StructField(
            "user",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("first_name", T.StringType()),
                    T.StructField("about", T.StringType()),
                    T.StructField("picture_url", T.StringType()),
                    T.StructField("picture_urls", T.ArrayType(T.StringType())),
                    T.StructField("is_superhost", T.BooleanType()),
                    T.StructField("location", T.StringType()),
                    T.StructField("listings_count", T.IntegerType()),
                    T.StructField("verifications", T.ArrayType(T.StringType())),
                    T.StructField("created_at", T.StringType()),
                ]
            ),
        )
    ]
)

LISTING_DETAIL_PAYLOAD = T.StructType(
    [
        T.StructField(
            "pdp_listing_detail",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("lng", T.DoubleType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("state", T.StringType()),
                    T.StructField("country", T.StringType()),
                    T.StructField("star_rating", T.DoubleType()),
                    T.StructField("is_hotel", T.BooleanType()),
                    T.StructField(
                        "primary_host",
                        T.StructType(
                            [
                                T.StructField("id", T.LongType()),
                                T.StructField("is_superhost", T.BooleanType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "additional_hosts",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField("is_superhost", T.BooleanType()),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "photos",
                        T.ArrayType(T.StructType([T.StructField("id", T.LongType())])),
                    ),
                ]
            ),
        )
    ]
)
