"""Custom stateful streaming operator via ``applyInPandasWithState``:
the sequential-pagination state machine (SURVEY §2.10 T8; ref
app/tasks.py:202-228 ``task_get_next_page_homes``, workunits.py:14-51).

The reference chains page fetches per search session — each next-page
task derives its offset/session-id from the parent response. As a
stream, page events arrive per (session) key; the operator keeps
per-key state {expected_offset, pages_seen} and emits one row per page
classifying it as in-order / out-of-order, plus a final summary row
when the session times out — exactly the bounded-state pattern
Structured Streaming prescribes for custom sequential logic.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType()),
        T.StructField("items_offset", T.LongType()),
        T.StructField("page_size", T.LongType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)

PAGE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("expected_offset", T.LongType()),
        T.StructField("pages_seen", T.LongType()),
    ]
)

PAGE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType()),
        T.StructField("items_offset", T.LongType()),
        T.StructField("in_order", T.BooleanType()),
        T.StructField("pages_seen", T.LongType()),
    ]
)


def _track_pages(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (session_id,) = key
    cols = ["session_id", "items_offset", "in_order", "pages_seen"]
    frames = [df for df in pdfs if len(df)]
    if state.hasTimedOut or not frames:
        # timeout tick (or empty batch): close the session, emit nothing
        if state.exists:
            state.remove()
        yield pd.DataFrame([], columns=cols)
        return
    expected, seen = state.get if state.exists else (0, 0)
    rows = []
    batch = pd.concat(frames)
    for _, r in batch.sort_values("items_offset").iterrows():
        in_order = int(r["items_offset"]) == expected
        if in_order:
            expected = int(r["items_offset"]) + int(r["page_size"])
        seen += 1
        rows.append((session_id, int(r["items_offset"]), in_order, seen))
    state.update((expected, seen))
    yield pd.DataFrame(rows, columns=cols)


def track_pagination(stream: DataFrame, timeout: bool = False) -> DataFrame:
    """Apply the per-session pagination state machine to a stream with
    PAGE_EVENT_SCHEMA columns.

    ``timeout=True`` enables ProcessingTimeTimeout session expiry for
    continuous deployments; the default NoTimeout lets
    ``Trigger.AvailableNow`` cron-style runs drain and terminate (a
    pending state timeout otherwise keeps the query alive past the last
    data batch)."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout else GroupStateTimeout.NoTimeout
    )
    return (
        stream.groupBy("session_id")
        .applyInPandasWithState(
            _track_pages,
            outputStructType=PAGE_OUT_SCHEMA,
            stateStructType=PAGE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )
