"""The driver contract itself: __spark_entry__ must expose entry() /
queries() / oracle_sql() with matching keys, stable registry ordering,
and a working flagship query."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert len(qs) >= 141
    assert set(sqls) == set(qs)  # every query is value-hash gated
    assert all(callable(fn) for fn in qs.values())


def test_queries_in_registry_order():
    """All 221 registry entries are driver-certified (cumulative
    r01-r06), so queries() returns plain registry order — deterministic
    and free of the retired certification-rotation machinery."""
    from ubdc_airbnb_spark import queries as q_mod

    assert list(entry_mod.queries()) == [s.name for s in q_mod.registry()]


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty"}
