"""Snapshot-diff and histogram-drift operators vs explicit oracles."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_snapshot_diff_statuses_and_columns(spark):
    from ubdc_airbnb_spark.operators.diff import diff_summary, snapshot_diff

    old = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (4, None, 4.0)],
        "k long, a string, b double",
    )
    new = spark.createDataFrame(
        [(1, "x", 1.0), (2, "Y", 2.0), (4, None, 9.0), (5, "w", 5.0)],
        "k long, a string, b double",
    )
    got = {r.k: (r.status, r.changed_cols) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: ("unchanged", ""),
        2: ("changed", "a"),
        3: ("removed", ""),
        4: ("changed", "b"),  # NULL==NULL on a, b differs
        5: ("added", ""),
    }
    summary = {
        (r.status, r.changed_cols): r.n_rows
        for r in diff_summary(snapshot_diff(old, new, ["k"])).collect()
    }
    assert summary == {
        ("unchanged", ""): 1,
        ("changed", "a"): 1,
        ("changed", "b"): 1,
        ("removed", ""): 1,
        ("added", ""): 1,
    }


def test_snapshot_diff_null_to_value_is_change(spark):
    from ubdc_airbnb_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, a string")
    new = spark.createDataFrame([(1, "v")], "k long, a string")
    [r] = snapshot_diff(old, new, ["k"]).collect()
    assert (r.status, r.changed_cols) == ("changed", "a")


def test_histogram_drift_python_oracle(spark):
    from ubdc_airbnb_spark.operators.drift import histogram_drift

    rows = [(i, float(i % 40)) for i in range(400)]  # uniform over [0,40)
    df = spark.createDataFrame(rows, "id long, v double")
    # slice a = ids < 200 shifted into the top tail
    out = histogram_drift(
        df.withColumn("v", F.when(F.col("id") < 200, F.col("v") + 100.0).otherwise(F.col("v"))),
        F.col("v"),
        F.col("id") < 200,
        lo=0.0,
        width=10.0,
        bins=5,
    ).collect()
    got = {r.bin: (r.p_a, r.p_b, r.contrib) for r in out}
    # slice a: all values >= 100 -> clamped to top bin 4; slice b: bins 0-3
    assert got[4][0] == 1.0 and got[4][1] == 0.0 and got[4][2] == 1.0
    for b in range(4):
        assert got[b][0] == 0.0 and got[b][1] == 0.25 and got[b][2] == 0.25


def test_histogram_drift_identical_slices_zero(spark):
    from ubdc_airbnb_spark.operators.drift import histogram_drift

    rows = [(i, float(i % 30)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = histogram_drift(df, F.col("v"), F.col("id") % 2 == 0, 0.0, 10.0, 3).collect()
    assert all(r.contrib == 0.0 for r in out)
    assert all(r.p_a == r.p_b for r in out)


def test_harmonize_widens_and_nulls(spark):
    import pytest

    from ubdc_airbnb_spark.sources.harmonize import harmonize, merged_schema

    a = spark.createDataFrame([(1, 2, 1.5)], "id int, v int, w float")
    b = spark.createDataFrame([(2, 3)], "id long, extra long")
    out = harmonize([a, b], source_col="drop_idx")
    # id widens int->long across frames; w (single-frame) keeps its type
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint", "v:int", "w:float", "extra:bigint", "drop_idx:int",
    ]
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(1, 2, 1.5, None, 0), (2, None, None, 3, 1)]

    # int vs float family widens to double
    c = spark.createDataFrame([(1.0,)], "v double")
    assert dict((n, d.simpleString()) for n, d in merged_schema([a, c]))["v"] == "double"

    # non-widening conflict raises instead of corrupting
    d = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(TypeError):
        merged_schema([a, d])


def test_harmonize_no_shuffle(spark):
    from ubdc_airbnb_spark.sources.harmonize import harmonize

    a = spark.createDataFrame([(1, 2)], "id int, v int")
    b = spark.createDataFrame([(2, 3)], "id long, w long")
    df = harmonize([a, b])
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan and "Join" not in plan


def test_snapshot_diff_random_vs_bruteforce(spark):
    import random

    from ubdc_airbnb_spark.operators.diff import snapshot_diff

    rnd = random.Random(13)
    old = {k: (rnd.choice(["a", "b", None]), rnd.randrange(5)) for k in range(60) if rnd.random() < 0.8}
    new = {k: (rnd.choice(["a", "b", None]), rnd.randrange(5)) for k in range(60) if rnd.random() < 0.8}
    o_df = spark.createDataFrame([(k, *v) for k, v in old.items()], "k long, s string, n long")
    n_df = spark.createDataFrame([(k, *v) for k, v in new.items()], "k long, s string, n long")
    got = {r.k: (r.status, r.changed_cols) for r in snapshot_diff(o_df, n_df, ["k"]).collect()}

    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = ("added", "")
        elif k not in new:
            want[k] = ("removed", "")
        else:
            diffs = [c for c, (a, b) in zip(["n", "s"], [(old[k][1], new[k][1]), (old[k][0], new[k][0])]) if a != b]
            diffs = sorted(diffs)
            want[k] = ("changed", ",".join(diffs)) if diffs else ("unchanged", "")
    assert got == want


def test_histogram_drift_null_values_are_a_bin(spark):
    """A null-rate shift between slices must register as drift (bin -1),
    not split into unjoinable NULL-bin rows."""
    from ubdc_airbnb_spark.operators.drift import histogram_drift

    rows = [(i, None if i < 50 else float(i % 30)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r.bin: (r.p_a, r.p_b) for r in histogram_drift(df, F.col("v"), F.col("id") < 50, 0.0, 10.0, 3).collect()}
    assert out[-1] == (1.0, 0.0)  # slice a is all-null; one row, fully joined


def test_rate_anomaly_flags_spike_day(spark):
    from datetime import datetime, timedelta

    from ubdc_airbnb_spark.operators.drift import rate_anomaly

    base = datetime(2024, 1, 1)
    rows = []
    # user 1: 2 events/day for 20 days, then one 40-event spike day
    for d in range(20):
        rows += [(1, base + timedelta(days=d, hours=h)) for h in (1, 2)]
    rows += [(1, base + timedelta(days=20, minutes=m)) for m in range(40)]
    # user 2: perfectly flat -> never anomalous
    for d in range(10):
        rows += [(2, base + timedelta(days=d))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.user_id, r.day): r.anomaly for r in rate_anomaly(ev, "user_id", "ts").collect()}
    assert out[(1, "2024-01-21")] is True
    assert all(not v for k, v in out.items() if k != (1, "2024-01-21"))

    # python-oracle spot check of the flag math for user 1
    import statistics
    counts = [2] * 20 + [40]
    mean = statistics.fmean(counts)
    pstd = statistics.pstdev(counts)
    assert abs(40 - mean) > 3 * pstd  # the spike really is >3 sigma
