"""The driver contract itself: __spark_entry__ must expose entry() /
queries() / oracle_sql() with matching keys, stable ordering (cheap
before slow), and a working flagship query."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert len(qs) >= 141
    assert set(sqls) == set(qs)  # every query is value-hash gated
    assert all(callable(fn) for fn in qs.values())


def test_slow_queries_run_last():
    names = list(entry_mod.queries())
    first_slow = min(
        (names.index(n) for n in entry_mod._SLOW if n in names), default=len(names)
    )
    after = names[first_slow:]
    # every query after the first slow one is itself slow-listed
    assert all(n in entry_mod._SLOW for n in after)


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty"}
