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


def test_queries_ordered_for_driver_certification():
    """The driver records exactly the first 50 queries() entries, so the
    contract is: never-driver-certified queries first (so the whole
    registry rotates through certification across rounds), cheap before
    slow within each class, and the certified block preserves the same
    cheap-before-slow ordering."""
    names = list(entry_mod.queries())
    done = entry_mod._certified()

    def cls(n: str) -> tuple[bool, bool]:
        return (n in done, n in entry_mod._SLOW)

    classes = [cls(n) for n in names]
    assert classes == sorted(classes), "ordering must be (certified, slow)-grouped"
    # the driver's window contains only uncertified queries while any remain
    n_uncert = sum(1 for n in names if n not in done)
    window = names[: min(50, n_uncert)]
    assert all(n not in done for n in window)
    # and no heavyweight eats the driver's time budget while cheap
    # uncertified queries remain: the slow-free prefix is bounded by how
    # many cheap uncertified queries exist, not by the window size (the
    # driver's own artifact drop can leave fewer than 50 cheap ones)
    n_cheap_uncert = sum(1 for n in names if n not in done and n not in entry_mod._SLOW)
    cheap_window = names[: min(50, n_cheap_uncert)]
    assert all(n not in entry_mod._SLOW for n in cheap_window)


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty"}
