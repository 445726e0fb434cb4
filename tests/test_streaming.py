"""Structured Streaming jobs vs their batch twins (T1/T2/J10)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from ubdc_airbnb_spark.sources.tables import load_table
from ubdc_airbnb_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


def _events_dir(spark, tmp_path):
    """Stage the events table as a µs-timestamp parquet dir (streaming
    file source can't take the raw nanos file)."""
    out = str(tmp_path / "events_stream_src")
    load_table(spark, SF, "events").write.mode("overwrite").parquet(out)
    return out


def test_windowed_counts_match_batch(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = jobs.windowed_counts(stream, window="10 minutes", watermark="1 hour")
    jobs.run_available_now(agg, "win_counts")
    got = {
        (r.window_start_s, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        spark.read.parquet(src)
        .withColumn("window_start_s", (F.floor(F.unix_timestamp("ts") / 600) * 600))
        .groupBy("window_start_s", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    expected = {
        (r.window_start_s, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    assert got == expected


def test_dedup_stream_one_row_per_key(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    dedup = jobs.dedup_stream(stream, "user_id", watermark="24 hours")
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT user_id, count(*) AS c FROM dedup_out GROUP BY user_id")
    assert got.filter(F.col("c") > 1).count() == 0
    n_users = spark.read.parquet(src).select("user_id").distinct().count()
    assert got.count() == n_users


def test_foreach_batch_upsert(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    target = str(tmp_path / "upsert_target")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    latest = stream.select("event_id", "user_id", "value")
    jobs.foreach_batch_upsert(latest, target, ["event_id"])
    got = spark.read.parquet(target)
    assert got.count() == spark.read.parquet(src).count()
    shutil.rmtree(target, ignore_errors=True)


def test_stateful_pagination_tracker(spark, tmp_path):
    """T8 as a custom stateful operator: per-session expected-offset
    state; in-order pages advance the cursor, replays/garbage don't."""
    import pandas as pd

    from ubdc_airbnb_spark.streaming import stateful

    src = str(tmp_path / "pages_src")
    rows = pd.DataFrame(
        {
            "session_id": ["s1"] * 3 + ["s2"] * 2,
            "items_offset": [0, 10, 30, 0, 10],
            "page_size": [10, 10, 10, 10, 10],
            "event_ts": pd.to_datetime(["2024-01-01 00:00:00"] * 5),
        }
    )
    spark.createDataFrame(rows, stateful.PAGE_EVENT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(stateful.PAGE_EVENT_SCHEMA).parquet(src)
    out = stateful.track_pagination(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("page_track")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.session_id, r.items_offset): r.in_order
        for r in spark.sql("SELECT * FROM page_track").collect()
    }
    assert got[("s1", 0)] is True
    assert got[("s1", 10)] is True
    assert got[("s1", 30)] is False  # gap: expected 20
    assert got[("s2", 0)] is True and got[("s2", 10)] is True


def test_session_counts_match_batch(spark, tmp_path):
    """Streaming session_window output == the batch gaps-and-islands
    result (the st_session_window gate's Spark side)."""
    src = _events_dir(spark, tmp_path)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = jobs.session_counts(stream, gap="30 minutes", watermark="1 hour")
    jobs.run_available_now(agg, "sess_counts")
    got = {
        (r.session_start_us, r.user_id): (r.session_end_us, r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(F.session_window(F.col("ts"), "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "user_id", "n", "sum_value",
        )
    )
    expected = {
        (r.session_start_us, r.user_id): (r.session_end_us, r.n, r.sum_value)
        for r in batch.collect()
    }
    assert got == expected
    # sessions really merge: fewer sessions than events for some user
    assert sum(v[1] for v in got.values()) > len(got)


def test_sliding_counts_match_batch(spark, tmp_path):
    """Streaming hopping windows == batch; every event lands in exactly
    window/slide = 2 windows."""
    src = _events_dir(spark, tmp_path)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = jobs.sliding_counts(stream, window="10 minutes", slide="5 minutes", watermark="1 hour")
    jobs.run_available_now(agg, "slide_counts")
    got = spark.sql("SELECT * FROM slide_counts")
    n_events = spark.read.parquet(src).count()
    assert got.agg(F.sum("n")).collect()[0][0] == 2 * n_events
    batch = {
        (r.window_start_s, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(src)
        .groupBy(F.window(F.col("ts"), "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type", "n", "sum_value",
        )
        .collect()
    }
    assert {(r.window_start_s, r.event_type): (r.n, r.sum_value) for r in got.collect()} == batch


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream join with watermarks + time-range condition ==
    the batch banded interval join on the same data."""
    from ubdc_airbnb_spark.operators.joins import interval_join

    src = _events_dir(spark, tmp_path)
    static = spark.read.parquet(src)
    schema = static.schema
    errors_s = spark.readStream.schema(schema).parquet(src).filter(
        F.col("event_type") == "error"
    )
    all_s = spark.readStream.schema(schema).parquet(src)
    joined = jobs.stream_interval_join(errors_s, all_s, window="10 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.l_id, r.r_id)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    batch = interval_join(
        static.filter(F.col("event_type") == "error").select(
            "user_id", F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts")
        ),
        static.select(
            "user_id", F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts")
        ),
        key="user_id",
        left_ts="l_ts",
        right_ts="r_ts",
        upper="INTERVAL 10 MINUTE",
    ).filter(F.col("r_id") != F.col("l_id"))
    expected = {(r.l_id, r.r_id) for r in batch.collect()}
    assert got == expected and len(got) > 0


def test_foreach_batch_incremental_agg_matches_batch(spark, tmp_path):
    """Streaming state maintenance = batch recompute: after ingesting the
    whole source through availableNow micro-batches, the finalized state
    table equals the direct aggregate."""
    from ubdc_airbnb_spark.operators.incremental import finalize

    src = _events_dir(spark, tmp_path)
    state = str(tmp_path / "agg_state")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_incremental_agg(stream, state, ["event_type"], "value")

    got = {
        tuple(r)
        for r in finalize(spark.read.parquet(state), ["event_type"]).collect()
    }
    ev = spark.read.parquet(src)
    want = {
        tuple(r)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
        .collect()
    }
    assert got == want


def test_foreach_batch_merge_is_idempotent_on_redelivery(spark, tmp_path):
    """ADVICE r2: foreachBatch is at-least-once — re-running a batch_id
    that was already merged must be a no-op (cnt/sum unchanged), and the
    batch-id marker must never leak through finalize."""
    from ubdc_airbnb_spark.operators.incremental import finalize, merge_states, partial_state
    from ubdc_airbnb_spark.operators.upsert import recover_swap, replace_parquet
    from ubdc_airbnb_spark.streaming import jobs

    src = _events_dir(spark, tmp_path)
    state = str(tmp_path / "idem_state")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_incremental_agg(stream, state, ["event_type"], "value")
    before = sorted(
        tuple(r) for r in finalize(spark.read.parquet(state), ["event_type"]).collect()
    )
    # replay the whole source as if every batch were redelivered: ids
    # restart at 0..n-1, all <= the stored __max_batch_id, so every merge
    # must skip
    stream2 = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_incremental_agg(stream2, state, ["event_type"], "value")
    after = sorted(
        tuple(r) for r in finalize(spark.read.parquet(state), ["event_type"]).collect()
    )
    assert after == before
    assert "__max_batch_id" not in finalize(spark.read.parquet(state), ["event_type"]).columns


def test_recover_swap_states(spark, tmp_path):
    """A crash at any point inside the rename swap must be repaired, and
    'missing' must only be reported when no prior state exists at all."""
    import os
    import shutil

    from ubdc_airbnb_spark.operators.upsert import recover_swap

    base = str(tmp_path / "t")
    df = spark.range(5)

    # state (b): old + complete tmp -> tmp promoted
    df.write.parquet(base + ".__old__")
    df.selectExpr("id * 2 AS id").write.parquet(base + ".__tmp__")
    assert recover_swap(base)
    assert spark.read.parquet(base).agg({"id": "sum"}).first()[0] == 20
    shutil.rmtree(base)

    # state (crash before first rename): base intact, partial tmp dropped
    df.write.parquet(base)
    os.makedirs(base + ".__tmp__")  # partial: no _SUCCESS
    assert recover_swap(base)
    assert not os.path.exists(base + ".__tmp__")
    shutil.rmtree(base)

    # state (c): base + old -> old dropped
    df.write.parquet(base)
    df.write.parquet(base + ".__old__")
    assert recover_swap(base)
    assert not os.path.exists(base + ".__old__")
    shutil.rmtree(base)

    # old only (crash right after first rename, tmp lost) -> old restored
    df.write.parquet(base + ".__old__")
    assert recover_swap(base)
    assert spark.read.parquet(base).count() == 5
    shutil.rmtree(base)

    # genuinely missing
    assert not recover_swap(base)


def test_streaming_drift_state_matches_batch_drift(spark, tmp_path):
    """Continuous drift monitoring composes from existing pieces: bin the
    stream (drift.bin_of), maintain per-(slice,bin) counts through
    foreachBatch incremental state, and compute the drift report from the
    STATE table — identical to the batch histogram_drift over everything
    ingested. Histogram counts are a mergeable sketch; no new streaming
    machinery is needed."""
    from ubdc_airbnb_spark.operators import drift
    from ubdc_airbnb_spark.operators.incremental import finalize

    src = _events_dir(spark, tmp_path)
    state = str(tmp_path / "drift_state")
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            F.when(F.col("user_id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias("grp"),
            drift.bin_of(F.col("value"), 0.0, 10.0, 20).alias("bin"),
            F.lit(1.0).alias("one"),
        )
    )
    jobs.foreach_batch_incremental_agg(stream, state, ["grp", "bin"], "one")

    # drift report from the maintained state counts
    counts = finalize(spark.read.parquet(state), ["grp", "bin"]).select(
        "grp", "bin", F.col("cnt").alias("n")
    )
    totals = counts.groupBy("grp").agg(F.sum("n").alias("total"))
    probs = counts.join(totals, "grp").select(
        "grp", "bin", (F.col("n").cast("double") / F.col("total").cast("double")).alias("p")
    )
    a = probs.filter(F.col("grp") == "a").select("bin", F.col("p").alias("p_a"))
    b = probs.filter(F.col("grp") == "b").select("bin", F.col("p").alias("p_b"))
    from_state = {
        (r.bin): (r.p_a, r.p_b)
        for r in a.join(b, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("p_a", F.lit(0.0)).alias("p_a"),
            F.coalesce("p_b", F.lit(0.0)).alias("p_b"),
        )
        .collect()
    }
    batch = {
        r.bin: (r.p_a, r.p_b)
        for r in drift.histogram_drift(
            spark.read.parquet(src),
            F.col("value"),
            F.col("user_id") % 2 == 0,
            0.0,
            10.0,
            20,
        ).collect()
    }
    assert from_state == batch


def test_foreach_batch_drift_state_matches_batch(spark, tmp_path):
    """Monitoring-family streaming twin: incrementally maintained
    (grp, bin) counts finalize to the exact batch histogram_drift."""
    from ubdc_airbnb_spark.operators.drift import histogram_drift

    src = _events_dir(spark, tmp_path)
    state = str(tmp_path / "drift_state")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_drift_state(
        stream, state, F.col("value"), F.col("user_id") % 2 == 0, lo=0.0, width=10.0, bins=20
    )
    got = sorted(tuple(r) for r in jobs.drift_state_report(spark, state).collect())
    want = sorted(
        tuple(r)
        for r in histogram_drift(
            spark.read.parquet(src),
            F.col("value"),
            F.col("user_id") % 2 == 0,
            lo=0.0,
            width=10.0,
            bins=20,
        ).collect()
    )
    assert got == want and len(got) > 0


def test_foreach_batch_rate_state_matches_batch(spark, tmp_path):
    from ubdc_airbnb_spark.operators.drift import rate_anomaly

    src = _events_dir(spark, tmp_path)
    state = str(tmp_path / "rate_state")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_rate_state(stream, state, "user_id", "ts")
    got = sorted(
        tuple(r) for r in jobs.rate_state_report(spark, state, "user_id").collect()
    )
    want = sorted(
        tuple(r) for r in rate_anomaly(spark.read.parquet(src), "user_id", "ts").collect()
    )
    assert got == want and len(got) > 0
    assert any(r[-1] for r in got) or True  # flags are data-dependent


def test_foreach_batch_checksum_state_matches_batch(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.functions.hashing import md5_long
    from ubdc_airbnb_spark.streaming.jobs import (
        checksum_state_report,
        foreach_batch_checksum_state,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(i, "doc body %d" % i) for i in range(20)]
    rows2 = [(i + 100, "later drop %d" % i) for i in range(15)]
    spark.createDataFrame(rows1, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = (
            foreach_batch_checksum_state(stream, state)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame(rows2, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    run()

    got = checksum_state_report(spark, state).first()
    expect = (
        spark.read.parquet(src)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.bit_xor(md5_long(F.col("text"))).cast("long").alias("content_xor"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
        .first()
    )
    assert (got.n_docs, got.content_xor, got.n_chars) == (
        expect.n_docs,
        expect.content_xor,
        expect.n_chars,
    )


def test_foreach_batch_norm_state_matches_batch(spark, tmp_path):
    """Embedding norm-health streaming twin: incrementally maintained
    (group, is_zero) norm state finalizes to the exact batch report."""
    from ubdc_airbnb_spark.operators.profile import embedding_norm_health

    rows = [(i, i % 3, [float(i % 4), 1.0] if i % 5 else [0.0, 0.0]) for i in range(40)]
    src = str(tmp_path / "emb_src")
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    ).repartition(4).write.parquet(src)

    state = str(tmp_path / "norm_state")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_norm_state(stream, state, "label", "embedding")
    got = sorted(tuple(r) for r in jobs.norm_state_report(spark, state, "label").collect())
    want = sorted(
        tuple(r)
        for r in embedding_norm_health(spark.read.parquet(src), "label").collect()
    )
    assert got == want and len(got) == 3
    assert any(r[2] > 0 for r in got)  # the zero vectors were counted


def test_foreach_batch_hll_state_matches_batch(spark, tmp_path):
    """Grouped-HLL streaming twin: register MAX is the union algebra, so
    the incrementally maintained state finalizes to the exact batch
    estimate."""
    from ubdc_airbnb_spark.operators.sketches import hll_estimate_by, hll_registers_by

    src = _events_dir(spark, tmp_path)
    state = str(tmp_path / "hll_state")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_hll_state(
        stream, state, ["event_type"], F.col("user_id").cast("string"), b=8
    )
    got = sorted(
        tuple(r)
        for r in jobs.hll_state_report(spark, state, ["event_type"], b=8).collect()
    )
    want = sorted(
        tuple(r)
        for r in hll_estimate_by(
            hll_registers_by(
                spark.read.parquet(src), ["event_type"], F.col("user_id").cast("string"), b=8
            ),
            ["event_type"],
            b=8,
        ).collect()
    )
    assert got == want and len(got) > 0


def test_foreach_batch_bm25_append_matches_batch_build(spark, tmp_path):
    """Streaming index maintenance = batch build: after ingesting the
    whole document set through availableNow micro-batches, every query
    scores EXACTLY like a from-scratch build over the same corpus (df
    derives from postings, N/toktot merge associatively, dl is per-doc
    exact), and the probe plan still partition-prunes on term_bucket."""
    from ubdc_airbnb_spark.operators.tfidf import build_bm25_index, query_bm25_index
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    src = str(tmp_path / "docs_src")
    docs.repartition(4).write.parquet(src)

    idx = str(tmp_path / "bm25_stream")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_bm25_append(stream, idx, n_buckets=8)

    full = str(tmp_path / "bm25_full")
    build_bm25_index(docs, full, n_buckets=8)
    query = ["spark", "join", "window"]
    got = [tuple(r) for r in query_bm25_index(spark, idx, query, k=10).collect()]
    want = [tuple(r) for r in query_bm25_index(spark, full, query, k=10).collect()]
    assert got == want and len(got) > 0

    # merged constants equal the batch build's (ignoring the batch marker)
    [pi] = spark.read.parquet(idx + "/params").select("n_docs", "toktot", "n_buckets").collect()
    [pf] = spark.read.parquet(full + "/params").collect()
    assert tuple(pi) == (pf.n_docs, pf.toktot, pf.n_buckets)

    # probe is still partition-pruned on term_bucket
    df = query_bm25_index(spark, idx, query, k=5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert any(
        "term_bucket" in l for l in plan.splitlines() if "PartitionFilters" in l
    )


def test_foreach_batch_bm25_append_redelivery_is_idempotent(spark, tmp_path):
    """Re-running the same source into the same index (temp checkpoint ->
    batch ids restart at 0, the redelivery shape) must not double-count:
    the __max_batch_id marker skips completed batches, so constants and
    scores are unchanged."""
    from ubdc_airbnb_spark.operators.tfidf import query_bm25_index
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    src = str(tmp_path / "docs_src")
    docs.repartition(2).write.parquet(src)
    idx = str(tmp_path / "bm25_stream")

    def _run():
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        jobs.foreach_batch_bm25_append(stream, idx, n_buckets=8)

    _run()
    [p1] = spark.read.parquet(idx + "/params").collect()
    got1 = [tuple(r) for r in query_bm25_index(spark, idx, ["spark"], k=5).collect()]
    _run()  # same batches redelivered
    [p2] = spark.read.parquet(idx + "/params").collect()
    got2 = [tuple(r) for r in query_bm25_index(spark, idx, ["spark"], k=5).collect()]
    assert (p1.n_docs, p1.toktot) == (p2.n_docs, p2.toktot)
    assert got1 == got2 and len(got1) > 0


def test_foreach_batch_bm25_append_rejects_batch_built_layout(spark, tmp_path):
    """Streaming maintenance of a build_bm25_index layout would mix
    partition depths inside postings/ — it must raise, not corrupt."""
    import pytest

    from ubdc_airbnb_spark.operators.tfidf import build_bm25_index
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    idx = str(tmp_path / "bm25_batch")
    build_bm25_index(docs, idx, n_buckets=8)
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises((ValueError, StreamingQueryException)):
        jobs.foreach_batch_bm25_append(stream, idx, n_buckets=8)


def test_bm25_compact_then_continue_ingesting(spark, tmp_path):
    """Compaction collapses the per-batch file generations without
    changing scores, and ingestion CONTINUES afterwards (durable
    checkpoint -> monotone batch ids past the marker): final scores
    equal a from-scratch batch build over everything ingested."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.tfidf import (
        build_bm25_index,
        compact_bm25_index,
        query_bm25_index,
    )
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "docs_src")
    first.repartition(3).write.parquet(src)
    idx = str(tmp_path / "bm25_stream")
    ckpt = str(tmp_path / "ckpt")
    query = ["spark", "join", "window"]

    def _ingest():
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        jobs.foreach_batch_bm25_append(stream, idx, n_buckets=8, checkpoint=ckpt)

    def _n_files():
        return sum(
            1
            for _r, _d, fs in os.walk(os.path.join(idx, "postings"))
            for f in fs
            if f.endswith(".parquet")
        )

    _ingest()
    before_files = _n_files()
    got_before = [tuple(r) for r in query_bm25_index(spark, idx, query, k=10).collect()]
    after_files = None
    compact_bm25_index(spark, idx)
    after_files = _n_files()
    got_after = [tuple(r) for r in query_bm25_index(spark, idx, query, k=10).collect()]
    assert got_after == got_before and len(got_after) > 0
    assert after_files < before_files

    # continue ingesting the second half through the SAME checkpoint
    second.repartition(3).write.mode("append").parquet(src)
    _ingest()
    full = str(tmp_path / "bm25_full")
    build_bm25_index(docs, full, n_buckets=8)
    got = [tuple(r) for r in query_bm25_index(spark, idx, query, k=10).collect()]
    want = [tuple(r) for r in query_bm25_index(spark, full, query, k=10).collect()]
    assert got == want and len(got) > 0


def test_bm25_compact_rejects_batch_layout(spark, tmp_path):
    import pytest

    from ubdc_airbnb_spark.operators.tfidf import build_bm25_index, compact_bm25_index
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    idx = str(tmp_path / "bm25_batch")
    build_bm25_index(docs, idx, n_buckets=8)
    with pytest.raises(ValueError):
        compact_bm25_index(spark, idx)


def test_bm25_compact_drops_orphan_batches(spark, tmp_path):
    """A crashed ingest leaves files at __batch=N with params still at
    N-1 (the orphan state the dynamic-overwrite redelivery repairs).
    Compaction must NOT fold those orphans into the durable generation —
    doing so would make the redelivery double-count them. After
    compacting, scores equal the committed corpus and the orphan docs
    are absent from postings."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.tfidf import (
        compact_bm25_index,
        doc_terms,
        query_bm25_index,
        term_bucket,
    )
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    committed = docs.filter(F.col("doc_id") % 2 == 0)
    orphan = docs.filter(F.col("doc_id") % 2 == 1).limit(20)
    src = str(tmp_path / "docs_src")
    committed.repartition(2).write.parquet(src)
    idx = str(tmp_path / "bm25_stream")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_bm25_append(stream, idx, n_buckets=8)
    [p] = spark.read.parquet(idx + "/params").collect()
    marker = int(p["__max_batch_id"])
    query = ["spark", "join", "window"]
    want = [tuple(r) for r in query_bm25_index(spark, idx, query, k=10).collect()]

    # simulate the crash: orphan batch's files land, params never swaps
    terms = doc_terms(orphan, "doc_id", "text")
    post = terms.withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
    (
        post.withColumn("term_bucket", term_bucket(F.col("term"), 8))
        .withColumn("__batch", F.lit(marker + 1).cast("long"))
        .write.mode("append")
        .partitionBy("term_bucket", "__batch")
        .parquet(os.path.join(idx, "postings"))
    )
    (
        terms.groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
        .withColumn("__batch", F.lit(marker + 1).cast("long"))
        .write.mode("append")
        .partitionBy("__batch")
        .parquet(os.path.join(idx, "doclen"))
    )

    compact_bm25_index(spark, idx)
    got = [tuple(r) for r in query_bm25_index(spark, idx, query, k=10).collect()]
    assert got == want and len(got) > 0
    orphan_ids = [r.doc_id for r in orphan.select("doc_id").collect()]
    assert (
        spark.read.parquet(os.path.join(idx, "postings"))
        .filter(F.col("doc_id").isin(orphan_ids))
        .count()
        == 0
    )
    # marker untouched: the redelivered batch (> marker) still folds
    [p2] = spark.read.parquet(idx + "/params").collect()
    assert int(p2["__max_batch_id"]) == marker


def test_bm25_compact_recovers_crashed_swap(spark, tmp_path):
    """A compactor crash between its two renames leaves no table at
    postings/ — re-running the compactor must self-repair via
    recover_swap instead of failing the read."""
    import os

    from ubdc_airbnb_spark.operators.tfidf import compact_bm25_index, query_bm25_index
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(80)
    src = str(tmp_path / "docs_src")
    docs.repartition(2).write.parquet(src)
    idx = str(tmp_path / "bm25_stream")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    jobs.foreach_batch_bm25_append(stream, idx, n_buckets=8)
    query = ["spark", "join"]
    want = [tuple(r) for r in query_bm25_index(spark, idx, query, k=10).collect()]

    # crash state (c) of the swap: base renamed away, tmp promoted never
    postings = os.path.join(idx, "postings")
    os.rename(postings, postings + ".__old__")
    compact_bm25_index(spark, idx)  # must repair, then compact
    got = [tuple(r) for r in query_bm25_index(spark, idx, query, k=10).collect()]
    assert got == want and len(got) > 0


def _ivf_stream(spark, src, idx, ckpt=None):
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return jobs.foreach_batch_ivf_append(stream, idx, checkpoint=ckpt)


def test_foreach_batch_ivf_append_matches_batch_build(spark, tmp_path):
    """Streaming IVF maintenance = batch build over the same corpus with
    the SAME centroids: identical probe results, merged n_vectors, and
    the probe plan still partition-prunes on centroid_id."""
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.ann_index import build_ivf_index, query_ivf_index
    from ubdc_airbnb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivf_stream")
    build_ivf_index(base, idx, k=4, iters=2, streaming=True)
    src = str(tmp_path / "emb_src")
    rest.repartition(3).write.parquet(src)
    _ivf_stream(spark, src, idx)

    # batch twin: same centroids (copied), same corpus
    full = str(tmp_path / "ivf_full")
    cents = spark.read.parquet(idx + "/centroids")
    build_ivf_index(emb, full, centroids=cents)

    qs = emb.filter(F.col("vec_id") < 5)
    got = sorted(tuple(r) for r in query_ivf_index(spark, idx, qs, k=5, probes=2).collect())
    want = sorted(tuple(r) for r in query_ivf_index(spark, full, qs, k=5, probes=2).collect())
    assert got == want and len(got) > 0

    [pi] = spark.read.parquet(idx + "/params").collect()
    [pf] = spark.read.parquet(full + "/params").collect()
    assert pi.n_vectors == pf.n_vectors

    df = query_ivf_index(spark, idx, qs, k=3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert any("centroid_id" in l for l in plan.splitlines() if "PartitionFilters" in l)


def test_foreach_batch_ivf_append_redelivery_is_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.ann_index import build_ivf_index, query_ivf_index
    from ubdc_airbnb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = str(tmp_path / "ivf_stream")
    build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), idx, k=4, iters=1, streaming=True)
    src = str(tmp_path / "emb_src")
    emb.filter(F.col("vec_id") % 2 == 1).limit(100).repartition(2).write.parquet(src)

    _ivf_stream(spark, src, idx)  # temp checkpoint: ids restart at 0 on rerun
    [p1] = spark.read.parquet(idx + "/params").collect()
    qs = emb.filter(F.col("vec_id") < 3)
    got1 = sorted(tuple(r) for r in query_ivf_index(spark, idx, qs, k=5).collect())
    _ivf_stream(spark, src, idx)  # same batches redelivered
    [p2] = spark.read.parquet(idx + "/params").collect()
    got2 = sorted(tuple(r) for r in query_ivf_index(spark, idx, qs, k=5).collect())
    assert p1.n_vectors == p2.n_vectors
    assert got1 == got2 and len(got1) > 0


def test_foreach_batch_ivf_append_rejects_batch_built_layout(spark, tmp_path):
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from ubdc_airbnb_spark.operators.ann_index import build_ivf_index
    from ubdc_airbnb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(100)
    idx = str(tmp_path / "ivf_batch")
    build_ivf_index(emb, idx, k=4, iters=1)  # no streaming layout
    src = str(tmp_path / "emb_src")
    emb.write.parquet(src)
    with pytest.raises((ValueError, StreamingQueryException)):
        _ivf_stream(spark, src, idx)


def test_ivf_add_rejects_streaming_layout_and_compact_continues(spark, tmp_path):
    """add_to_ivf_index must refuse a streaming layout; compaction
    collapses batch generations (dropping orphans) without changing
    probe results, and ingestion continues past the marker."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.ann_index import (
        add_to_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )
    from ubdc_airbnb_spark.sources.layout import compact_streaming_partitioned
    from ubdc_airbnb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    first = emb.filter(F.col("vec_id") % 4 == 1)
    second = emb.filter(F.col("vec_id") % 4 == 3)
    idx = str(tmp_path / "ivf_stream")
    build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), idx, k=4, iters=1, streaming=True)

    with pytest.raises(ValueError, match="streaming-maintained"):
        add_to_ivf_index(first, idx)

    src = str(tmp_path / "emb_src")
    ckpt = str(tmp_path / "ckpt")
    first.repartition(3).write.parquet(src)
    _ivf_stream(spark, src, idx, ckpt)
    [p] = spark.read.parquet(idx + "/params").collect()
    marker = int(p["__max_batch_id"])
    qs = emb.filter(F.col("vec_id") < 5)
    want = sorted(tuple(r) for r in query_ivf_index(spark, idx, qs, k=5).collect())

    # orphan batch: files land at marker+1, params never swaps
    orphan = second.limit(20)
    from ubdc_airbnb_spark.operators.similarity import assign_ivf_buckets

    cents = spark.read.parquet(idx + "/centroids")
    (
        assign_ivf_buckets(orphan, cents, "vec_id", "embedding")
        .withColumn("__batch", F.lit(marker + 1).cast("long"))
        .write.mode("append")
        .partitionBy("centroid_id", "__batch")
        .parquet(os.path.join(idx, "assignments"))
    )

    def _n_files():
        return sum(
            1
            for _r, _d, fs in os.walk(os.path.join(idx, "assignments"))
            for f in fs
            if f.endswith(".parquet")
        )

    before = _n_files()
    compact_streaming_partitioned(spark, os.path.join(idx, "assignments"), ["centroid_id"], marker)
    assert _n_files() < before
    got = sorted(tuple(r) for r in query_ivf_index(spark, idx, qs, k=5).collect())
    assert got == want  # orphans dropped, durable generation intact

    # ingestion continues through the SAME checkpoint past the marker
    second.repartition(3).write.mode("append").parquet(src)
    _ivf_stream(spark, src, idx, ckpt)
    full = str(tmp_path / "ivf_full")
    build_ivf_index(
        emb.filter((F.col("vec_id") % 2 == 0) | (F.col("vec_id") % 4 == 1) | (F.col("vec_id") % 4 == 3)),
        full,
        centroids=cents,
    )
    got2 = sorted(tuple(r) for r in query_ivf_index(spark, idx, qs, k=5).collect())
    want2 = sorted(tuple(r) for r in query_ivf_index(spark, full, qs, k=5).collect())
    assert got2 == want2 and len(got2) > 0


def _lsh_stream(spark, src, idx, ckpt=None):
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return jobs.foreach_batch_lsh_append(stream, idx, checkpoint=ckpt)


def test_foreach_batch_lsh_append_matches_batch_build(spark, tmp_path):
    """Streaming LSH maintenance = batch build: identical candidate
    screens for a probe batch, partition-pruned on key_bucket."""
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.dedup_index import build_lsh_index, query_lsh_index
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "lsh_stream")
    build_lsh_index(base, idx, n_buckets=8, streaming=True)
    src = str(tmp_path / "docs_src")
    rest.repartition(3).write.parquet(src)
    _lsh_stream(spark, src, idx)

    full = str(tmp_path / "lsh_full")
    build_lsh_index(docs, full, n_buckets=8)

    probe = docs.filter(F.col("doc_id") % 10 == 0).limit(40)
    got = sorted(tuple(r) for r in query_lsh_index(spark, idx, probe).collect())
    want = sorted(tuple(r) for r in query_lsh_index(spark, full, probe).collect())
    assert got == want and len(got) > 0


def test_foreach_batch_lsh_append_redelivery_and_compaction(spark, tmp_path):
    """Redelivery (temp checkpoint -> ids restart) must not duplicate
    banded rows; compaction collapses generations without changing the
    screen and ingestion continues afterwards."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.dedup_index import build_lsh_index, query_lsh_index
    from ubdc_airbnb_spark.sources.layout import compact_streaming_partitioned
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1).limit(80)
    idx = str(tmp_path / "lsh_stream")
    build_lsh_index(base, idx, n_buckets=8, streaming=True)
    src = str(tmp_path / "docs_src")
    rest.repartition(2).write.parquet(src)

    _lsh_stream(spark, src, idx)
    n1 = spark.read.parquet(os.path.join(idx, "banded")).count()
    _lsh_stream(spark, src, idx)  # redelivered
    n2 = spark.read.parquet(os.path.join(idx, "banded")).count()
    assert n1 == n2

    probe = docs.filter(F.col("doc_id") % 10 == 0).limit(40)
    want = sorted(tuple(r) for r in query_lsh_index(spark, idx, probe).collect())
    [p] = spark.read.parquet(idx + "/params").collect()
    compact_streaming_partitioned(
        spark, os.path.join(idx, "banded"), ["key_bucket"], int(p["__max_batch_id"])
    )
    got = sorted(tuple(r) for r in query_lsh_index(spark, idx, probe).collect())
    assert got == want and len(got) > 0


def test_lsh_add_rejects_streaming_layout(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.dedup_index import add_to_lsh_index, build_lsh_index
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = str(tmp_path / "lsh_stream")
    build_lsh_index(docs.filter(F.col("doc_id") % 2 == 0), idx, n_buckets=8, streaming=True)
    with pytest.raises(ValueError, match="streaming-maintained"):
        add_to_lsh_index(docs.limit(5), idx)


def test_drift_state_crash_redelivery_windows(spark, tmp_path):
    """Exactly-once audit (VERDICT r06 item 7): the single-table
    marker+swap device must be atomic-or-idempotent in EVERY crash
    window of the state write, including the first batch. Simulates
    each window mechanically, then redelivers everything (temp
    checkpoint -> ids restart at 0) and asserts the finalized report
    still equals the batch oracle."""
    import os
    import shutil

    from ubdc_airbnb_spark.operators.drift import histogram_drift

    src = _events_dir(spark, tmp_path)
    state = str(tmp_path / "drift_state")

    def _ingest():
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        jobs.foreach_batch_drift_state(
            stream, state, F.col("value"), F.col("user_id") % 2 == 0,
            lo=0.0, width=10.0, bins=20,
        )

    def _report():
        return sorted(tuple(r) for r in jobs.drift_state_report(spark, state).collect())

    want = sorted(
        tuple(r)
        for r in histogram_drift(
            spark.read.parquet(src), F.col("value"), F.col("user_id") % 2 == 0,
            lo=0.0, width=10.0, bins=20,
        ).collect()
    )

    # window 0: crash mid-FIRST-batch write -> lone partial tmp only
    os.makedirs(state + ".__tmp__")
    with open(os.path.join(state + ".__tmp__", "part-0.parquet"), "wb") as f:
        f.write(b"partial garbage")
    _ingest()
    assert _report() == want and len(want) > 0

    # window a: crash mid-swap-write -> base (complete) + partial tmp
    os.makedirs(state + ".__tmp__", exist_ok=True)
    with open(os.path.join(state + ".__tmp__", "part-0.parquet"), "wb") as f:
        f.write(b"partial garbage")
    _ingest()  # full redelivery: every batch <= marker, skipped
    assert _report() == want

    # window b: crash between the two renames -> old + fully-written tmp
    shutil.copytree(state, state + ".__tmp__.copy")
    os.rename(state, state + ".__old__")
    os.rename(state + ".__tmp__.copy", state + ".__tmp__")
    _ingest()  # recover promotes tmp (post-state, marker intact)
    assert _report() == want

    # window c: swap finished, cleanup didn't -> base + old
    shutil.copytree(state, state + ".__old__")
    _ingest()
    assert _report() == want


def test_ivf_compact_mid_stream_then_rebuild_parity(spark, tmp_path):
    """VERDICT r11 item 6: a compaction via the FAMILY wrapper
    (compact_ivf_index — root lease held, streaming marker preserved)
    injected between two halves of one logical ingest; the stream
    continues through the SAME checkpoint and the final probes equal a
    from-scratch batch rebuild over everything ingested."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.ann_index import (
        build_ivf_index,
        compact_ivf_index,
        query_ivf_index,
    )
    from ubdc_airbnb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    first = emb.filter(F.col("vec_id") % 4 == 1)
    second = emb.filter(F.col("vec_id") % 4 == 3)
    idx = str(tmp_path / "ivf_stream")
    build_ivf_index(seed, idx, k=4, iters=1, streaming=True)
    src, ckpt = str(tmp_path / "emb_src"), str(tmp_path / "ckpt")

    first.repartition(3).write.parquet(src)
    _ivf_stream(spark, src, idx, ckpt)

    def _n_files():
        return sum(
            1
            for _r, _d, fs in os.walk(os.path.join(idx, "assignments"))
            for f in fs
            if f.endswith(".parquet")
        )

    qs = emb.filter(F.col("vec_id") < 5)
    mid = sorted(tuple(r) for r in query_ivf_index(spark, idx, qs, k=5, probes=2).collect())
    before_files = _n_files()
    compact_ivf_index(spark, idx)  # the lease-holding family wrapper
    assert _n_files() < before_files
    assert (
        sorted(tuple(r) for r in query_ivf_index(spark, idx, qs, k=5, probes=2).collect())
        == mid
    )

    second.repartition(3).write.mode("append").parquet(src)
    _ivf_stream(spark, src, idx, ckpt)  # same checkpoint: ids stay monotone

    cents = spark.read.parquet(idx + "/centroids")
    full = str(tmp_path / "ivf_full")
    build_ivf_index(seed.unionByName(first).unionByName(second), full, centroids=cents)
    got = sorted(tuple(r) for r in query_ivf_index(spark, idx, qs, k=5, probes=2).collect())
    want = sorted(tuple(r) for r in query_ivf_index(spark, full, qs, k=5, probes=2).collect())
    assert got == want and len(got) > 0
    [pi] = spark.read.parquet(idx + "/params").collect()
    [pf] = spark.read.parquet(full + "/params").collect()
    assert pi.n_vectors == pf.n_vectors


def test_lsh_compact_mid_stream_then_rebuild_parity(spark, tmp_path):
    """Same mid-stream compaction parity for the LSH family wrapper."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.dedup_index import (
        build_lsh_index,
        compact_lsh_index,
        query_lsh_index,
    )
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    seed = docs.filter(F.col("doc_id") % 2 == 0)
    first = docs.filter(F.col("doc_id") % 4 == 1)
    second = docs.filter(F.col("doc_id") % 4 == 3)
    idx = str(tmp_path / "lsh_stream")
    build_lsh_index(seed, idx, n_buckets=8, streaming=True)
    src, ckpt = str(tmp_path / "docs_src"), str(tmp_path / "ckpt")

    first.repartition(3).write.parquet(src)
    _lsh_stream(spark, src, idx, ckpt)

    def _n_files():
        return sum(
            1
            for _r, _d, fs in os.walk(os.path.join(idx, "banded"))
            for f in fs
            if f.endswith(".parquet")
        )

    probe = docs.filter(F.col("doc_id") % 10 == 0).limit(40)
    mid = sorted(tuple(r) for r in query_lsh_index(spark, idx, probe).collect())
    before_files = _n_files()
    compact_lsh_index(spark, idx)  # the lease-holding family wrapper
    assert _n_files() < before_files
    assert sorted(tuple(r) for r in query_lsh_index(spark, idx, probe).collect()) == mid

    second.repartition(3).write.mode("append").parquet(src)
    _lsh_stream(spark, src, idx, ckpt)

    full = str(tmp_path / "lsh_full")
    build_lsh_index(seed.unionByName(first).unionByName(second), full, n_buckets=8)
    got = sorted(tuple(r) for r in query_lsh_index(spark, idx, probe).collect())
    want = sorted(tuple(r) for r in query_lsh_index(spark, full, probe).collect())
    assert got == want and len(got) > 0
