"""CheckpointChain: iterative state must hold O(1) generations of
executor storage, not O(rounds) — the r05 sf1 registry sweep OOMed an
8 GiB JVM because every label-propagation round's localCheckpoint
stayed pinned until driver GC."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubdc_airbnb_spark.operators.iterstate import CheckpointChain, _persistent_ids


def _storage_rdd_count(spark) -> int:
    return len(_persistent_ids(spark.sparkContext._jsc.sc()))


def test_chain_retires_superseded_generations(spark):
    base = _storage_rdd_count(spark)
    chain = CheckpointChain(spark)
    df = spark.range(1000).selectExpr("id", "id % 5 as k")
    frames = []
    for i in range(4):
        df = chain.step(df.withColumn(f"c{i}", F.col("id") + i))
        frames.append(df)
        chain.retire(keep=1)
        # never more than ONE generation of checkpoint storage live
        assert _storage_rdd_count(spark) - base <= 1
    # the surviving generation is readable; retired ones are freed
    assert frames[-1].count() == 1000
    chain.close()
    assert _storage_rdd_count(spark) - base == 0


def test_connected_components_storage_bounded(spark):
    """A 6-round chain graph must not accumulate per-round label RDDs:
    after the run, only (at most) the returned frame's checkpoint
    remains, and it is still readable."""
    from ubdc_airbnb_spark.operators.graph import connected_components

    base = _storage_rdd_count(spark)
    # path graph 0-1-2-...-8: diameter forces multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(9)], "id long")
    out = connected_components(edges, nodes)
    # sym + every superseded round freed; only the result's checkpoint
    # (1 RDD) may remain pinned
    assert _storage_rdd_count(spark) - base <= 1
    got = {r.id: r.component for r in out.collect()}
    assert got == {i: 0 for i in range(9)}


def test_bpe_train_storage_bounded(spark):
    from ubdc_airbnb_spark.operators.bpe import bpe_train

    base = _storage_rdd_count(spark)
    docs = spark.createDataFrame(
        [(i, "low lower lowest newer newest wide widen") for i in range(20)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=12, min_count=2, checkpoint_every=3)
    assert merges.count() >= 6
    # train output is a driver-local merge list: NO checkpoint survives
    assert _storage_rdd_count(spark) - base == 0


def test_chain_never_frees_foreign_caches(spark):
    """A cache the chain does not own — e.g. a prefixsum._pin whose RDD
    first materializes DURING a checkpoint job — must survive step/retire:
    the chain claims exactly the LogicalRDD id it checkpointed, never a
    storage-snapshot diff that would swallow bystanders."""
    from ubdc_airbnb_spark.operators.prefixsum import _pin, release_pins

    release_pins()
    base = _storage_rdd_count(spark)
    # pin an upstream frame but do NOT materialize it: its cached RDD
    # first appears in storage inside the chain's eager checkpoint job
    pinned = _pin(spark.range(500).selectExpr("id", "id * 7 as v"))
    chain = CheckpointChain(spark)
    df = chain.step(pinned.withColumn("w", F.col("v") + 1))
    df2 = chain.step(df.withColumn("w2", F.col("w") + 1))
    chain.retire(keep=1)
    chain.close(keep_last=True)
    # the pin is still genuinely cached: its storage survives the retire
    assert pinned.storageLevel.useMemory or pinned.storageLevel.useDisk
    # and reading it does not recompute from scratch (still materialized)
    assert pinned.count() == 500 and df2.count() == 500
    release_pins()
    assert _storage_rdd_count(spark) - base <= 1  # only df2's checkpoint
