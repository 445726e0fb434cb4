"""Funnel and per-group OLS vs explicit Python oracles."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def test_funnel_greedy_earliest_and_strict_order(spark):
    from ubdc_airbnb_spark.operators.funnel import funnel

    T = datetime
    rows = [
        # u1 completes all three in order
        (1, T(2024, 1, 1), "view"),
        (1, T(2024, 1, 2), "click"),
        (1, T(2024, 1, 3), "purchase"),
        # u2: purchase BEFORE click -> stops at click
        (2, T(2024, 1, 1), "view"),
        (2, T(2024, 1, 3), "click"),
        (2, T(2024, 1, 2), "purchase"),
        # u3: click only, never viewed -> absent (no step 0)
        (3, T(2024, 1, 1), "click"),
        # u4: same-timestamp click does NOT count (strictly after)
        (4, T(2024, 1, 1), "view"),
        (4, T(2024, 1, 1), "click"),
        # u5: greedy-earliest — the LATER view would miss the click, the
        # earliest one catches it
        (5, T(2024, 1, 2), "view"),
        (5, T(2024, 1, 5), "view"),
        (5, T(2024, 1, 3), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.user_id: (r.reached, r.t_0, r.t_1, r.t_2)
        for r in funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()
    }
    assert got[1] == (3, T(2024, 1, 1), T(2024, 1, 2), T(2024, 1, 3))
    assert got[2] == (2, T(2024, 1, 1), T(2024, 1, 3), None)
    assert 3 not in got
    assert got[4] == (1, T(2024, 1, 1), None, None)
    assert got[5] == (2, T(2024, 1, 2), T(2024, 1, 3), None)


def test_group_ols_matches_numpy_and_degenerate_null(spark):
    import numpy as np

    from ubdc_airbnb_spark.operators.regress import group_ols

    rows = [
        # group 1: perfect line y = 2x + 1
        *[(1, x, 2.0 * x + 1.0) for x in range(5)],
        # group 2: noisy-ish points
        (2, 0, 1.5), (2, 1, 2.25), (2, 2, 2.5), (2, 3, 4.0),
        # group 3: single point -> NULL
        (3, 7, 9.0),
        # group 4: all x equal -> NULL
        (4, 2, 1.0), (4, 2, 5.0),
    ]
    df = spark.createDataFrame(rows, "g long, x long, y double")
    got = {r.g: (r.n, r.slope, r.intercept) for r in group_ols(df, ["g"], F.col("x"), F.col("y")).collect()}
    assert got[1] == (5, 2.0, 1.0)
    s2, i2 = np.polyfit([0, 1, 2, 3], [1.5, 2.25, 2.5, 4.0], 1)
    assert abs(got[2][1] - s2) < 1e-9 and abs(got[2][2] - i2) < 1e-9
    assert got[3] == (1, None, None)
    assert got[4] == (2, None, None)


def test_group_ols_partitioning_invariant(spark):
    from ubdc_airbnb_spark.operators.regress import group_ols
    from ubdc_airbnb_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    x = F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("2024-01-01")))
    a = sorted(map(tuple, group_ols(ev, ["user_id"], x, F.col("value")).collect()))
    b = sorted(
        map(tuple, group_ols(ev.repartition(17), ["user_id"], x, F.col("value")).collect())
    )
    assert a == b  # exact doubles: decimal moment sums are order-free


def test_funnel_random_vs_bruteforce(spark):
    """Seeded random event log vs a brute-force Python funnel."""
    import random
    from datetime import datetime, timedelta

    rnd = random.Random(7)
    steps = ["view", "click", "purchase"]
    rows = []
    base = datetime(2024, 1, 1)
    for uid in range(40):
        for _ in range(rnd.randrange(0, 12)):
            rows.append(
                (
                    uid,
                    base + timedelta(minutes=rnd.randrange(0, 500)),
                    rnd.choice(steps + ["error", "signup"]),
                )
            )
    from ubdc_airbnb_spark.operators.funnel import funnel

    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.user_id: (r.reached, r.t_0, r.t_1, r.t_2)
        for r in funnel(ev, "user_id", "ts", "event_type", steps).collect()
    }

    want = {}
    for uid in {r[0] for r in rows}:
        mine = [(ts, et) for u, ts, et in rows if u == uid]
        t_prev, times = None, []
        for step in steps:
            cand = [ts for ts, et in mine if et == step and (t_prev is None or ts > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            times.append(t_prev)
        if times:
            want[uid] = (len(times), *(times + [None] * (3 - len(times))))
    assert got == want


def test_cohort_retention_python_oracle(spark):
    from datetime import datetime, timedelta

    from ubdc_airbnb_spark.operators.funnel import cohort_retention

    base = datetime(2024, 1, 1)
    rows = []
    # cohort 0: users 1,2 start week 0; user 1 returns weeks 1 and 2; 2 never
    rows += [(1, base), (1, base + timedelta(days=8)), (1, base + timedelta(days=15))]
    rows += [(2, base + timedelta(days=2))]
    # cohort 1: user 3 starts week 1, returns week 3
    rows += [(3, base + timedelta(days=9)), (3, base + timedelta(days=22))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_period, r.period_offset): (r.n_active, r.n_cohort, r.retention)
        for r in cohort_retention(ev, "user_id", "ts", period_days=7).collect()
    }
    w0 = (datetime(2024, 1, 1) - datetime(1970, 1, 1)).days // 7
    assert got == {
        (w0, 0): (2, 2, 1.0),
        (w0, 1): (1, 2, 0.5),
        (w0, 2): (1, 2, 0.5),
        (w0 + 1, 0): (1, 1, 1.0),
        (w0 + 1, 2): (1, 1, 1.0),
    }


def test_cohort_retention_pre_epoch_floor_division(spark):
    """Pre-1970 timestamps have negative epoch days: the period must be
    floor(days / period_days) (// semantics, matching the oracle), not
    double-division truncated toward zero."""
    from datetime import datetime, timedelta

    from ubdc_airbnb_spark.operators.funnel import cohort_retention

    base = datetime(1969, 12, 25)  # epoch day -7 .. -1 span
    ev = spark.createDataFrame(
        [(1, base), (1, base + timedelta(days=10))], "user_id long, ts timestamp"
    )
    got = {
        (r.cohort_period, r.period_offset): r.n_active
        for r in cohort_retention(ev, "user_id", "ts", period_days=7).collect()
    }
    d0 = (base - datetime(1970, 1, 1)).days
    d1 = d0 + 10
    assert got == {(d0 // 7, 0): 1, (d0 // 7, d1 // 7 - d0 // 7): 1}
