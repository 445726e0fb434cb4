"""Plan-size ratchet for every iterative driver loop (r11, VERDICT r10
item 3).

The r10 hot-tile hang is a CLASS, not an instance: any wave/fixpoint
loop whose next state references its previous state twice doubles its
analyzed logical plan per round, and the failure mode is a
Catalyst-analysis HANG — no artifact, no detector, no stack trace. The
fix class is lineage severing via ``CheckpointChain``; this file is the
regression ratchet: run >=10 rounds of each iterative site and assert
the per-step input-plan node count (recorded by the chain) stays FLAT
across steady-state rounds. Reverting a site's CheckpointChain wiring
makes its steady-state sizes double per round — this fails in seconds,
long before the round count where analysis would hang.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ubdc_airbnb_spark.operators import iterstate
from ubdc_airbnb_spark.operators.iterstate import (
    _CHAIN_REGISTRY,
    plan_node_count,
    reset_chain_registry,
)

#: steady-state flatness: sizes[2:] of any chain with >= MIN_STEPS steps
#: may wobble by at most this many nodes (a doubling loop adds the
#: whole previous plan per round — hundreds of nodes by round 4)
_SLACK = 2
_ABS_BOUND = 250  # absolute sanity cap on any recorded step plan


def _assert_flat_chains(min_steps: int, expect_chains: int = 1) -> None:
    """Every registered chain with >= min_steps steps must be flat in
    its steady state; at least ``expect_chains`` such chains must exist
    (so reverting the chain wiring fails the test instead of passing it
    vacuously)."""
    deep = [c.step_plan_sizes for c in _CHAIN_REGISTRY if len(c.step_plan_sizes) >= min_steps]
    assert len(deep) >= expect_chains, (
        f"expected >= {expect_chains} chains with >= {min_steps} steps, "
        f"got sizes {[c.step_plan_sizes for c in _CHAIN_REGISTRY]}"
    )
    for sizes in deep:
        # interior steps only: step 0 is the seed (smaller by design)
        # and the final step may be a post-loop flatten of an
        # already-checkpointed frame (smaller by design)
        tail = sizes[1:-1]
        assert max(tail) - min(tail) <= _SLACK, f"plan growth across rounds: {sizes}"
        assert sizes[-1] <= max(tail) + _SLACK, f"plan growth at the end: {sizes}"
        assert max(sizes) <= _ABS_BOUND, f"plan unexpectedly large: {sizes}"


def test_connected_components_plan_flat_across_rounds(spark):
    """A 700-node path graph: pointer-jumping needs ~10 propagation
    rounds — every round's label-state plan must be the same size."""
    from ubdc_airbnb_spark.operators.graph import connected_components

    n = 700
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    ).coalesce(4)
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long").coalesce(4)
    reset_chain_registry()
    out = connected_components(edges, nodes, src="id_a", dst="id_b")
    assert out.filter(F.col("component") != 0).count() == 0
    _assert_flat_chains(min_steps=5)


def test_pagerank_plan_flat_across_iterations(spark):
    from ubdc_airbnb_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 40) for i in range(120)], "src long, dst long"
    ).coalesce(4)
    reset_chain_registry()
    ranks = pagerank(edges, iterations=10, checkpoint_every=1)
    assert ranks.count() > 0
    _assert_flat_chains(min_steps=10)


def test_bpe_train_plan_flat_across_merges(spark):
    from ubdc_airbnb_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(i, "low lower lowest newer newest wide widen slow slower") for i in range(30)],
        "doc_id long, text string",
    ).coalesce(2)
    reset_chain_registry()
    merges = bpe_train(docs, n_merges=12, min_count=2, checkpoint_every=1)
    assert merges.count() >= 10
    _assert_flat_chains(min_steps=10)


def test_discover_plan_flat_across_waves(spark):
    """A max-depth pagination chain (the real city-center shape): 12
    pages = 12 BFS waves, each wave MERGEs into the accumulated
    listings state — the exact site that hung at 52 waves pre-fix."""
    from ubdc_airbnb_spark.plans import discovery
    from ubdc_airbnb_spark.sources import payloads
    from ubdc_airbnb_spark.sources.mock_api import MockAirbnbApi

    deep = "0313131311" + "0" * 12  # depth 22 == MAX_GRID_LEVEL
    api = MockAirbnbApi(auto=False)
    pages = 12
    for p in range(pages):
        api.enqueue(
            200,
            payloads.search_payload(
                deep,
                has_next_page=(p < pages - 1),
                items_offset=10 * p,
            ),
        )
    reset_chain_registry()
    res = discovery.discover(spark, api, [deep], max_level=22)
    assert res.waves == pages and res.fetches == pages
    _assert_flat_chains(min_steps=10)


def test_plan_node_count_detects_doubling(spark):
    """The counter itself: an un-severed self-referencing merge must
    show multiplicative growth round over round — the signal every
    test above asserts the absence of."""
    state = spark.range(50).select(F.col("id"), F.lit(0).alias("v"))
    sizes = []
    for i in range(4):
        delta = spark.range(10).select(F.col("id"), F.lit(i + 1).alias("v"))
        # the MERGE shape: keep unmatched state rows + update matched
        # ones — references `state` TWICE, so the plan doubles per round
        state = state.join(delta, "id", "left_anti").unionByName(
            state.join(delta.select("id"), "id", "left_semi")
            .select("id", F.lit(i + 1).alias("v"))
        )
        sizes.append(plan_node_count(state))
    assert sizes[-1] > sizes[0] * 4, sizes


def test_chain_registry_bounded():
    reset_chain_registry()

    class _Fake:  # registry cares only about list length
        pass

    for _ in range(40):
        iterstate._CHAIN_REGISTRY.append(_Fake())
        while len(iterstate._CHAIN_REGISTRY) > iterstate._CHAIN_REGISTRY_MAX:
            iterstate._CHAIN_REGISTRY.pop(0)
    assert len(iterstate._CHAIN_REGISTRY) == iterstate._CHAIN_REGISTRY_MAX
    reset_chain_registry()
