"""Per-commit pin of the four plan-audit detectors over a representative
gate subset (r10): the full 221-gate sweeps run per-round at sf1/sf10
(BENCH_REPLAYS artifacts); this test makes the ratchet self-enforcing at
commit time — an operator change that introduces an unbounded nested
loop, a row-at-a-time UDF, a single-partition window, or a
broadcast-over-corpus-aggregate into one of these gates fails the suite
immediately instead of waiting for the round artifact.

Expected values were computed at sf0.001 with the audit's at-scale
settings and cross-checked against the sf0.01/sf1/sf10 sweeps'
adjudications. Flags here are EXPECTED shapes, not defects: each
expected-True name is in the matching adjudicated-benign list, which
this test also asserts (nothing flagged may be unadjudicated)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

import plan_audit as pa  # noqa: E402

SF = "/root/testdata/sf0.001"

#: name -> (broadcast_over_agg, single_partition_window, nested_loop, row_udf)
EXPECTED = {
    "q1_pricing_summary": (False, False, False, False),
    "w3_ranked_sort": (False, False, False, False),
    "x1_search_extract": (False, False, False, False),
    "ns_dedup_minhash_lsh": (False, False, False, False),
    # post-r10 build_vocab fix: top-k-then-rank, no global window
    "ns_tokenize_vocab": (True, False, False, False),
    # fixed-bucket histogram cumsum (WINDOW_BENIGN)
    "ns_quantile_sketch": (False, True, False, False),
    # two-pass prefix-sum offsets broadcast + bounded window (both benign)
    "ns_sequence_pack": (True, True, False, False),
    # literal-bounded query batch x corpus (NLJ_BENIGN)
    "ns_embed_topk": (False, False, True, False),
    # per-source counts x scalar totals (BENIGN + NLJ_BENIGN)
    "ns_source_balance_gini": (True, False, True, False),
    # AOI anti-join: broadcast-benign; NLJ cleared by driver-local leaves
    "a3_cover_union": (True, False, False, False),
    "j3_prefix_intersects": (False, False, False, False),
    # query-term df sidecar broadcast (BENIGN); params ExistingRDD NLJ cleared
    "ns_bm25_topk": (True, False, False, False),
}


def _broadcast_over_agg(plan: str) -> bool:
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        indent = len(line) - len(line.lstrip(" :+-"))
        for l2 in lines[i + 1 :]:
            if (len(l2) - len(l2.lstrip(" :+-"))) <= indent:
                break
            if "HashAggregate" in l2 or "SortAggregate" in l2:
                return True
    return False


@pytest.fixture(scope="module")
def plans(spark):
    from ubdc_airbnb_spark import queries as q_mod
    from ubdc_airbnb_spark.operators import prefixsum
    from ubdc_airbnb_spark.operators.prefixsum import release_pins

    old = prefixsum.SINGLE_PARTITION_MAX_BYTES
    prefixsum.SINGLE_PARTITION_MAX_BYTES = -1  # audit the at-scale plan
    out = {}
    try:
        for s in q_mod.registry():
            if s.name not in EXPECTED:
                continue
            df = s.spark(spark, SF)
            out[s.name] = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            release_pins()
    finally:
        prefixsum.SINGLE_PARTITION_MAX_BYTES = old
    return out


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_detector_pins(plans, name):
    plan = plans[name]
    got = (
        _broadcast_over_agg(plan),
        pa.single_partition_window_suspect(plan),
        pa.nested_loop_join_suspect(plan),
        pa.row_udf_suspect(plan),
    )
    assert got == EXPECTED[name], (
        f"{name}: detector flags changed "
        f"(broadcast, window, nlj, rowudf) = {got}, expected {EXPECTED[name]}"
    )


def test_every_expected_flag_is_adjudicated():
    """The ratchet invariant: an expected-True flag must appear in the
    matching adjudicated-benign list — a pin may never encode an
    unadjudicated suspect as normal."""
    for name, (bcast, win, nlj, rowudf) in EXPECTED.items():
        if bcast:
            assert name in pa.BENIGN, name
        if win:
            assert name in pa.WINDOW_BENIGN, name
        if nlj:
            assert name in pa.NLJ_BENIGN, name
        assert not rowudf, f"{name}: no gate may pin a row UDF as expected"
