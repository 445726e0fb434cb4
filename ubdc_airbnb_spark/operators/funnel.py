"""Ordered-funnel analysis — the event-sequence operator of product and
pipeline analytics: per entity, how far through an ordered step sequence
(view → click → purchase; crawl → parse → index) did it get, requiring
each step to occur strictly after the chosen occurrence of the previous
one.

Semantics: greedy earliest-qualifying — step i's timestamp is the MIN
event time of step i's type that is strictly later than step i-1's
chosen time. Greedy-earliest is exact for reachability: taking the
earliest possible previous step can only widen the window for the next
one, so if any qualifying sequence exists the greedy one is found.

Spark-first shape: one conditional aggregate per step — pass i filters
the events to step i's type (a narrow predicate that prunes at the
scan), joins the per-entity result of pass i-1 on the entity key, and
MIN-aggregates. k steps → k slice-sized hash aggregations, each map-side
combinable; no windows, no per-entity event collection (an entity with
millions of events costs the same as one with ten), no UDF. The
intermediate per-entity tables carry one row per entity that reached the
step — monotonically shrinking down the funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Furthest-step funnel over ``steps`` (ordered).

    Output: (entity_col, reached, t_0, …, t_{k-1}) where ``reached`` is
    the number of completed steps and ``t_i`` the chosen timestamp of
    step i (NULL past the drop-off point). Entities that never performed
    step 0 are absent."""
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(entity_col)
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(entity_col, f"t_{i - 1}").hint("shuffle_hash"), entity_col)
            .filter(F.col(ts_col) > F.col(f"t_{i - 1}"))
            .groupBy(entity_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        cur = cur.join(nxt.hint("shuffle_hash"), entity_col, "left")
    reached = sum(
        (F.col(f"t_{i}").isNotNull().cast("long") for i in range(len(steps))),
        F.lit(0).cast("long"),
    )
    return cur.select(
        entity_col, reached.alias("reached"), *[f"t_{i}" for i in range(len(steps))]
    )


def cohort_retention(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: entities grouped by the period of their
    FIRST event (the cohort); for each later period offset, how many of
    the cohort were active. The standard product/ops view of "do users
    come back", and for a crawl pipeline "do sources keep producing".

    Spark-first shape: one groupBy(entity) MIN to elect cohorts, an
    equi-join back on the entity key, then one distinct + groupBy on
    (cohort, offset) — all hash-shuffles on high-cardinality or tiny
    keys, no windows. Period arithmetic is integer floor-division on
    epoch days, so engines agree bit-for-bit.

    Output: (cohort_period, period_offset, n_active, n_cohort,
    retention) with retention = n_active/n_cohort as double."""
    days = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400)).cast("long")
    ev = events.select(
        F.col(entity_col).alias("ent"),
        # floor, not truncate-toward-zero: pre-1970 timestamps have
        # negative epoch days and must round down to match // semantics
        F.floor(days / period_days).cast("long").alias("period"),
    )
    first = ev.groupBy("ent").agg(F.min("period").alias("cohort_period"))
    sizes = first.groupBy("cohort_period").agg(F.count(F.lit(1)).alias("n_cohort"))
    active = (
        ev.join(first.hint("shuffle_hash"), "ent")
        .select("ent", "cohort_period", (F.col("period") - F.col("cohort_period")).alias("period_offset"))
        .distinct()
        .groupBy("cohort_period", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return active.join(sizes, "cohort_period").select(
        "cohort_period",
        "period_offset",
        "n_active",
        "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias("retention"),
    )


def rolling_active_users(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """DAU / trailing-window active users (the DAU/WAU/MAU board): for
    every calendar day with events, the distinct users active that day
    and over the trailing ``window_days`` window.

    Scale shape: events first collapse to the DISTINCT (user, day)
    activity grid (map-side combinable; users×days ≪ events), then each
    activity row fans out to the ≤ ``window_days`` report days it
    supports — a BOUNDED narrow explode that turns the rolling-window
    distinct into one plain groupBy(day) COUNT(DISTINCT), instead of a
    day-range theta-join (which Spark executes as a nested loop) or a
    window-over-days sort. Report days restrict to days that actually
    have events via a broadcast semi-join on the (tiny) day list.

    Output: (day, dau, active_w) — ``active_w`` = distinct users in
    [day−window_days+1, day].
    """
    act = events.select(
        F.to_date(F.col(ts_col)).alias("day"), F.col(user_col).alias("u")
    ).distinct()
    days = act.select("day").distinct()
    dau = act.groupBy("day").agg(F.countDistinct("u").cast("long").alias("dau"))
    fanned = act.select(
        "u",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(window_days - 1)),
                lambda i: F.date_add(F.col("day"), i),
            )
        ).alias("day"),
    )
    wau = (
        fanned.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("u").cast("long").alias("active_w"))
    )
    return dau.join(wau, "day").select("day", "dau", "active_w")


def last_touch_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    touch_type: str = "click",
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: every conversion event attributes to the
    most recent STRICTLY-PRIOR touch event by the same user within the
    trailing ``window_days`` (a click in the same second as the purchase
    is not credited — it may have been logged after) — the revenue-credit
    join behind every marketing dashboard, and the canonical "needs an
    as-of join" workload.

    Scale shape: ONE user-keyed window (range frame over the epoch-
    second axis bounded to the attribution window) carries the latest
    touch forward — no self-join, no unbounded state; user keys are
    high-cardinality so the shuffle is uniform and AQE-splittable.

    Output: (conversion id, user, conversion ts, touch ts or NULL,
    attributed flag) — one row per conversion.
    """
    from pyspark.sql import Window

    sec = F.unix_timestamp(F.col(ts_col))
    w = (
        Window.partitionBy(user_col)
        .orderBy(sec)
        .rangeBetween(-window_days * 86400, -1)
    )
    last_touch = F.max(
        F.when(F.col("event_type") == touch_type, sec)
    ).over(w)
    flagged = events.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col),
        F.col("event_type"),
        last_touch.alias("__lt"),
    )
    return (
        flagged.filter(F.col("event_type") == convert_type)
        .select(
            F.col(id_col).alias("conversion_id"),
            user_col,
            F.col(ts_col).alias("conversion_ts"),
            F.to_timestamp(F.from_unixtime(F.col("__lt"))).alias("touch_ts"),
            F.col("__lt").isNotNull().alias("attributed"),
        )
    )
