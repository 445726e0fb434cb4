"""Declarative beat schedule (T1) — the batch analog of the reference's
Celery beat crontab (ref core/celery.py:39-66: listing-details at 05:00
on the 12th/24th, calendars daily at 02:00, discovery at 05:00 on the
7th/14th/21st/28th).

No daemon runs in this engine; instead the cadence lives in a tiny
``schedules`` parquet table (job, cron, last_run_at) and the
``run-due-jobs`` CLI executes whatever is due at invocation time — call
it from any external scheduler (cron, Airflow, a CI timer) and the
semantics match beat: a job fires when its most recent cron fire time is
later than its recorded last run. The table is a handful of rows by
construction; all schedule math is driver-side on purpose.

Cron support: the 5 standard fields (minute hour day-of-month month
day-of-week) with ``*``, lists ``a,b``, ranges ``a-b``, and steps
``*/n`` — the subset the reference's crontab() calls use, plus the
common extensions.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

#: ref core/celery.py:39-66 (enabled entries only; the commented-out
#: reviews/tidy-grids cadences ship disabled there too)
DEFAULT_SCHEDULE: tuple[tuple[str, str], ...] = (
    ("op_update_listing_details_periodical", "0 5 12,24 * *"),
    ("op_update_calendar_periodical", "0 2 * * *"),
    ("op_discover_new_listings_periodical", "0 5 7,14,21,28 * *"),
)

SCHEDULE_SCHEMA = "job string, cron string, last_run_at timestamp"


def _field_matches(field: str, value: int, lo: int, hi: int) -> bool:
    for part in field.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = end = int(part)
        if start <= value <= end and (value - start) % step == 0:
            return True
    return False


def cron_matches(expr: str, dt: datetime) -> bool:
    """True if ``dt`` (minute resolution) is a fire time of ``expr``.
    Day-of-month and day-of-week combine like vixie-cron: when BOTH are
    restricted, either may match; otherwise the restricted one governs."""
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"cron expr needs 5 fields: {expr!r}")
    minute, hour, dom, month, dow = fields
    if not _field_matches(minute, dt.minute, 0, 59):
        return False
    if not _field_matches(hour, dt.hour, 0, 23):
        return False
    if not _field_matches(month, dt.month, 1, 12):
        return False
    dom_any, dow_any = dom.strip() == "*", dow.strip() == "*"
    dom_ok = _field_matches(dom, dt.day, 1, 31)
    # cron day-of-week: 0=Sunday; Python weekday(): 0=Monday
    dow_ok = _field_matches(dow, (dt.weekday() + 1) % 7, 0, 6)
    if dom_any and dow_any:
        return True
    if dom_any:
        return dow_ok
    if dow_any:
        return dom_ok
    return dom_ok or dow_ok


def prev_fire(expr: str, now: datetime, lookback_days: int = 62) -> datetime | None:
    """Most recent fire time <= ``now``: a bounded minute scan backwards
    (every entry with a day-of-month list fires at least monthly, so 62
    days always finds it; bounded driver work, never a Spark job)."""
    t = now.replace(second=0, microsecond=0)
    for _ in range(lookback_days * 24 * 60):
        if cron_matches(expr, t):
            return t
        t -= timedelta(minutes=1)
    return None


@dataclass
class DueJob:
    job: str
    cron: str
    fire_time: datetime
    last_run_at: datetime | None


def due_jobs(
    rows: list[tuple[str, str, datetime | None]], now: datetime
) -> list[DueJob]:
    """Beat semantics: a job is due when its latest fire time <= now is
    after its recorded last run (never-run jobs are due once a fire time
    exists)."""
    out = []
    for job, cron, last in rows:
        fire = prev_fire(cron, now)
        if fire is None:
            continue
        if last is None or last < fire:
            out.append(DueJob(job, cron, fire, last))
    return out


def load_or_seed(spark, path: str):
    """Read the schedules table, seeding it with the reference cadence on
    first use."""
    import os

    if not os.path.exists(path.rstrip("/")):
        seed = spark.createDataFrame(
            [(j, c, None) for j, c in DEFAULT_SCHEDULE], SCHEDULE_SCHEMA
        )
        seed.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def mark_ran(spark, path: str, job: str, at: datetime) -> None:
    """Stamp ``last_run_at`` for one job with the atomic swap used by
    every other warehouse table."""
    from pyspark.sql import functions as F

    from ..operators.upsert import replace_parquet

    df = spark.read.parquet(path)
    updated = df.withColumn(
        "last_run_at",
        F.when(F.col("job") == job, F.lit(at)).otherwise(F.col("last_run_at")),
    )
    replace_parquet(updated, path)
