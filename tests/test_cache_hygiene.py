"""Session-cache hygiene: operators that _pin() multi-pass inputs must
leave nothing persisted once release_pins() runs — the gate runner,
bench harness, and report CLI all call it per query, so a 173-query
session never accumulates dead cache entries (round-3 verdict item 7)."""

from __future__ import annotations

from ubdc_airbnb_spark import queries as q_mod
from ubdc_airbnb_spark.operators.prefixsum import _PINNED, _pin, release_pins

from conftest import SF_DIR


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _spec(name):
    return next(s for s in q_mod.registry() if s.name == name)


def test_pin_dedupes_same_plan(spark):
    release_pins()  # other tests' operators may have left session pins
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    a = _pin(df)
    b = _pin(spark.range(100).selectExpr("id", "id * 2 as v"))
    assert a is b, "same semantic plan must reuse the existing pin handle"
    assert len(_PINNED) == 1
    release_pins()
    assert len(_PINNED) == 0


def test_gate_queries_release_all_pins(spark):
    release_pins()
    before = _persistent_rdd_count(spark)
    any_pinned = False
    # ns_bm25_topk / ns_token_budget pin unconditionally; the prefix-sum
    # family pins only on its two-pass path (size-adaptive, so toy SF may
    # legitimately take the pin-free single-partition plan)
    for name in ("ns_sequence_pack", "ns_bm25_topk", "ns_token_budget"):
        _spec(name).spark(spark, SF_DIR).collect()
        any_pinned = any_pinned or len(_PINNED) > 0
        release_pins()
        assert len(_PINNED) == 0
    assert any_pinned, "at least one gate query should have pinned input"
    # non-blocking unpersist: registry is the contract surface; the JVM
    # side must also drain back to the pre-test level
    import time

    for _ in range(50):
        if _persistent_rdd_count(spark) <= before:
            break
        time.sleep(0.1)
    assert _persistent_rdd_count(spark) <= before
