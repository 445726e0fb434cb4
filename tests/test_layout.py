"""Data-layout tests: clustered files carry disjoint min/max ranges;
bucketed joins run shuffle-free (plan-asserted)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from ubdc_airbnb_spark.sources import layout
from ubdc_airbnb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_clustered_write_has_disjoint_file_ranges(spark, tmp_path):
    out = str(tmp_path / "clustered")
    li = load_table(spark, SF, "lineitem")
    layout.write_clustered(li, out, ["l_orderkey"], num_files=8)
    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index("l_orderkey")
        stats = md.row_group(0).column(idx).statistics
        ranges.append((stats.min, stats.max))
    ranges.sort()
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file key ranges must be disjoint for pruning"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
        orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
        layout.write_bucketed(li, "li_bkt", "l_orderkey", 8)
        layout.write_bucketed(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_bkt", "l_orderkey", 8
        )
        a = spark.table("li_bkt")
        b = spark.table("ord_bkt")
        joined = a.join(b, "l_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # same join on the raw (unbucketed) tables DOES shuffle
        raw = li.join(orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        assert "Exchange" in _plan(raw)
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_compact_small_files(spark, tmp_path):
    from ubdc_airbnb_spark.sources.layout import compact

    path = str(tmp_path / "frag")
    # simulate a micro-batch sink: 40 tiny files
    spark.range(0, 4000).selectExpr("id", "id % 7 AS k").repartition(40).write.mode(
        "overwrite"
    ).parquet(path)
    import glob

    assert len(glob.glob(path + "/*.parquet")) == 40
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    n = compact(spark, path, target_file_bytes=1 << 30)
    files = glob.glob(path + "/*.parquet")
    assert len(files) == n == 1
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before


def test_compact_preserving_sort_keeps_disjoint_ranges(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from ubdc_airbnb_spark.sources.layout import compact

    path = str(tmp_path / "frag2")
    spark.range(0, 50_000).selectExpr("id AS k", "id * 2 AS v").repartition(30).write.mode(
        "overwrite"
    ).parquet(path)
    compact(spark, path, target_file_bytes=200_000, preserve_sort=["k"])
    ranges = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.read_metadata(f)
        st = md.row_group(0).column(0).statistics
        lo, hi = st.min, st.max
        for rg in range(1, md.num_row_groups):
            s2 = md.row_group(rg).column(0).statistics
            lo, hi = min(lo, s2.min), max(hi, s2.max)
        ranges.append((lo, hi))
    assert len(ranges) > 1
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 <= l2  # disjoint key ranges -> file-level pruning works


def test_training_shards_roundtrip_and_integrity(spark, tmp_path):
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.sources.layout import (
        read_training_shard,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, "text %d" % i) for i in range(200)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    man = write_training_shards(docs, path, "doc_id", n_shards=4)
    rows = {r.shard: r for r in man.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert sum(r.n_rows for r in rows.values()) == 200
    # every shard reads back verified, in contiguous position order
    seen = 0
    for s in range(4):
        got = read_training_shard(spark, path, s).collect()
        assert [r.position for r in got] == list(range(len(got)))
        seen += len(got)
    assert seen == 200
    # same salt -> identical manifest on rewrite (deterministic order)
    man2 = write_training_shards(docs, str(tmp_path / "shards2"), "doc_id", n_shards=4)
    assert sorted((r.shard, r.n_rows, r.key_xor) for r in man2.collect()) == sorted(
        (r.shard, r.n_rows, r.key_xor) for r in man.collect()
    )
    # corrupt a shard -> loud failure
    import glob, os

    victim = glob.glob(path + "/data/shard=0/*.parquet")[0]
    os.remove(victim)
    try:
        read_training_shard(spark, path, 0)
        raise AssertionError("expected integrity failure")
    except ValueError as e:
        assert "integrity" in str(e) or "missing" in str(e)


def test_compact_partitioned_recovers_crashed_swap(spark, tmp_path):
    """A compaction crash between the two renames leaves no table at the
    base path; the IVF/LSH probes don't self-repair, so the compactor
    must call recover_swap at entry and succeed on re-run."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.sources.layout import compact_partitioned

    base = str(tmp_path / "tbl")
    df = spark.range(200).withColumn("b", (F.col("id") % 4).cast("int"))
    df.repartition(8).write.partitionBy("b").parquet(base)
    want = df.count()

    os.rename(base, base + ".__old__")  # crash state: swap half-done
    compact_partitioned(spark, base, ["b"])
    assert spark.read.parquet(base).count() == want


def test_manifest_replace_atomicity_and_crash_windows(spark, tmp_path):
    """Manifest-pointer swap: readers always see a complete generation;
    a crash between the generation write and the pointer swap leaves an
    orphan that the next replace GCs; the pointer file is the only
    mutation (no directory rename)."""
    import json
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.sources.layout import (
        current_path,
        is_manifest_table,
        manifest_gc,
        manifest_init,
        manifest_replace,
    )

    base = str(tmp_path / "tbl")
    df1 = spark.range(100).withColumn("v", F.lit(1))
    manifest_init(df1, base)
    assert is_manifest_table(base)
    assert spark.read.parquet(current_path(base)).agg(F.sum("v")).first()[0] == 100

    gen0 = os.path.basename(current_path(base))
    assert gen0.startswith("gen-00000000-")  # seq prefix + random nonce

    # crash window: a half-written generation lands, pointer never swaps
    orphan = os.path.join(base, "gen-00000001-deadbeef")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-0.parquet"), "wb").write(b"garbage")
    # readers are unaffected — the pointer still names gen 0
    assert os.path.basename(current_path(base)) == gen0
    assert spark.read.parquet(current_path(base)).count() == 100

    # the next replace cannot collide with the orphan's name (nonce),
    # GCs the orphan, and RETAINS the superseded generation (default
    # retention=1) so an in-flight reader of gen0 isn't yanked
    df2 = spark.range(50).withColumn("v", F.lit(2))
    manifest_replace(lambda d: df2.write.mode("overwrite").parquet(d), base)
    assert spark.read.parquet(current_path(base)).agg(F.sum("v")).first()[0] == 100
    gens = sorted(d for d in os.listdir(base) if d.startswith("gen-"))
    assert gens[0] == gen0 and len(gens) == 2  # orphan collected, gen0 kept
    with open(os.path.join(base, "CURRENT")) as f:
        m = json.load(f)
    assert m["generation"] == gens[1] and m["history"] == [gen0]
    # gen0 is still a readable complete table (the retention guarantee)
    assert spark.read.parquet(os.path.join(base, gen0)).count() == 100

    # a second replace rolls the retention window: gen0 now collected
    df3 = spark.range(25).withColumn("v", F.lit(4))
    manifest_replace(lambda d: df3.write.mode("overwrite").parquet(d), base)
    gens = sorted(d for d in os.listdir(base) if d.startswith("gen-"))
    assert gen0 not in gens and len(gens) == 2

    assert manifest_gc(base) == 1  # drops the one retained generation
    assert manifest_gc(base) == 0  # idempotent
    assert len([d for d in os.listdir(base) if d.startswith("gen-")]) == 1

    # retention=0 opts back into immediate single-generation GC
    manifest_replace(
        lambda d: df2.write.mode("overwrite").parquet(d), base, retention=0
    )
    assert len([d for d in os.listdir(base) if d.startswith("gen-")]) == 1


def test_replace_parquet_routes_manifest_tables(spark, tmp_path):
    """upsert.replace_parquet must swap manifest-managed tables via the
    pointer (object-store-safe), leaving no rename artifacts."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.upsert import replace_parquet
    from ubdc_airbnb_spark.sources.layout import current_path, manifest_init

    base = str(tmp_path / "params")
    manifest_init(spark.range(3).withColumn("v", F.lit(1)), base)
    replace_parquet(spark.range(5).withColumn("v", F.lit(2)), base)
    got = spark.read.parquet(current_path(base))
    assert got.count() == 5 and got.agg(F.max("v")).first()[0] == 2
    assert not os.path.exists(base + ".__old__")
    assert not os.path.exists(base + ".__tmp__")


def test_compact_partitioned_manifest_table(spark, tmp_path):
    """compact_partitioned on a manifest-managed table compacts into a
    fresh generation and repoints — row-identical, generations GC'd."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.sources.layout import (
        compact_partitioned,
        current_path,
        manifest_init,
    )

    base = str(tmp_path / "tbl")
    df = spark.range(400).withColumn("b", (F.col("id") % 4).cast("int"))
    manifest_init(df.repartition(8), base, ["b"])
    want = sorted(tuple(r) for r in spark.read.parquet(current_path(base)).collect())
    n_before = sum(
        1 for _r, _d, fs in os.walk(current_path(base)) for f in fs if f.endswith(".parquet")
    )
    compact_partitioned(spark, base, ["b"])
    got = sorted(tuple(r) for r in spark.read.parquet(current_path(base)).collect())
    assert got == want
    n_after = sum(
        1 for _r, _d, fs in os.walk(current_path(base)) for f in fs if f.endswith(".parquet")
    )
    assert n_after < n_before
    # live + one retained (reader-safety window); older ones collected
    assert len([d for d in os.listdir(base) if d.startswith("gen-")]) == 2


def test_bm25_object_store_safe_lifecycle(spark, tmp_path):
    """object_store_safe BM25 index: build + append + query are
    score-identical to the plain layout, with every full-table replace
    going through the pointer (no rename artifacts anywhere)."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.tfidf import (
        add_to_bm25_index,
        build_bm25_index,
        query_bm25_index,
    )
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    base_half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    oss = str(tmp_path / "bm25_oss")
    plain = str(tmp_path / "bm25_plain")
    build_bm25_index(base_half, oss, n_buckets=8, object_store_safe=True)
    add_to_bm25_index(rest, oss)
    build_bm25_index(docs, plain, n_buckets=8)

    query = ["spark", "join", "window"]
    got = [tuple(r) for r in query_bm25_index(spark, oss, query, k=10).collect()]
    want = [tuple(r) for r in query_bm25_index(spark, plain, query, k=10).collect()]
    assert got == want and len(got) > 0

    for comp in ("postings", "doclen", "params"):
        d = os.path.join(oss, comp)
        assert os.path.exists(os.path.join(d, "CURRENT")), comp
        assert not os.path.exists(d + ".__old__")
        assert not os.path.exists(d + ".__tmp__")


def test_compact_manifest_table_no_double_read(spark, tmp_path):
    """layout.compact on a manifest-managed table must size-walk and
    read ONLY the live generation — not the CURRENT pointer file, not a
    retained/orphan generation (which would double-count rows into the
    compacted output). Regression for the compact-index bm25 doclen
    path (ADVICE r06)."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.sources.layout import (
        compact,
        current_path,
        manifest_init,
        manifest_replace,
    )

    base = str(tmp_path / "doclen")
    manifest_init(spark.range(100).withColumn("v", F.lit(1)).repartition(8), base)
    # a replace leaves a RETAINED superseded generation on disk
    manifest_replace(
        lambda d: spark.range(200)
        .withColumn("v", F.lit(2))
        .repartition(8)
        .write.mode("overwrite")
        .parquet(d),
        base,
    )
    assert len([d for d in os.listdir(base) if d.startswith("gen-")]) == 2

    compact(spark, base)
    got = spark.read.parquet(current_path(base))
    assert got.count() == 200  # live rows only — no double-read
    assert got.agg(F.min("v")).first()[0] == 2
    assert os.path.exists(os.path.join(base, "CURRENT"))
    assert not os.path.exists(base + ".__old__")


def test_compact_index_cli_bm25_object_store_safe(spark, tmp_path):
    """compact-index --kind bm25 end-to-end on a BATCH-built
    object_store_safe index (the manifest layout the CLI previously
    tripped over): scores identical before/after, no rename artifacts."""
    import os

    from ubdc_airbnb_spark import cli
    from ubdc_airbnb_spark.operators.tfidf import build_bm25_index, query_bm25_index
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = str(tmp_path / "bm25_oss")
    build_bm25_index(docs, idx, n_buckets=8, object_store_safe=True)
    query = ["spark", "join", "window"]
    want = [tuple(r) for r in query_bm25_index(spark, idx, query, k=10).collect()]

    rc = cli.main(["compact-index", "--kind", "bm25", "--path", idx])
    assert rc == 0
    got = [tuple(r) for r in query_bm25_index(spark, idx, query, k=10).collect()]
    assert got == want and len(got) > 0
    for comp in ("postings", "doclen", "params"):
        d = os.path.join(idx, comp)
        assert not os.path.exists(d + ".__old__")
        assert not os.path.exists(d + ".__tmp__")


def test_ivf_object_store_safe_lifecycle(spark, tmp_path):
    """object_store_safe IVF index: build + incremental add + probe are
    result-identical to the plain layout; every component is
    manifest-managed (pointer swap, no rename artifacts); compaction
    goes through a fresh generation."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.ann_index import (
        add_to_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )
    from ubdc_airbnb_spark.sources.layout import compact_partitioned
    from ubdc_airbnb_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    oss = str(tmp_path / "ivf_oss")
    plain = str(tmp_path / "ivf_plain")
    build_ivf_index(half, oss, k=4, iters=1, object_store_safe=True)
    add_to_ivf_index(rest, oss)
    build_ivf_index(emb, plain, k=4, iters=1)
    # NOTE: centroids differ (trained on half vs full), so compare the
    # oss index against a plain index built with the SAME centroids
    cents = spark.read.parquet(
        __import__("ubdc_airbnb_spark.sources.layout", fromlist=["current_path"]).current_path(
            os.path.join(oss, "centroids")
        )
    )
    plain2 = str(tmp_path / "ivf_plain2")
    build_ivf_index(half, plain2, centroids=cents)
    add_to_ivf_index(rest, plain2)

    q = emb.limit(5)
    got = sorted(
        tuple(r) for r in query_ivf_index(spark, oss, q, k=3, probes=2).collect()
    )
    want = sorted(
        tuple(r) for r in query_ivf_index(spark, plain2, q, k=3, probes=2).collect()
    )
    assert got == want and len(got) > 0

    compact_partitioned(spark, os.path.join(oss, "assignments"), ["centroid_id"])
    after = sorted(
        tuple(r) for r in query_ivf_index(spark, oss, q, k=3, probes=2).collect()
    )
    assert after == want

    for comp in ("assignments", "centroids", "params"):
        d = os.path.join(oss, comp)
        assert os.path.exists(os.path.join(d, "CURRENT")), comp
        assert not os.path.exists(d + ".__old__")
        assert not os.path.exists(d + ".__tmp__")


def test_lsh_object_store_safe_lifecycle(spark, tmp_path):
    """object_store_safe LSH dedup index: build + add + probe are
    result-identical to the plain layout; components manifest-managed;
    compaction preserves probe results."""
    import os

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.dedup_index import (
        add_to_lsh_index,
        build_lsh_index,
        query_lsh_index,
    )
    from ubdc_airbnb_spark.sources.layout import compact_partitioned
    from ubdc_airbnb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    oss = str(tmp_path / "lsh_oss")
    plain = str(tmp_path / "lsh_plain")
    build_lsh_index(half, oss, n_buckets=8, object_store_safe=True)
    add_to_lsh_index(rest, oss)
    build_lsh_index(half, plain, n_buckets=8)
    add_to_lsh_index(rest, plain)

    probe = docs.limit(40)
    got = sorted(tuple(r) for r in query_lsh_index(spark, oss, probe).collect())
    want = sorted(tuple(r) for r in query_lsh_index(spark, plain, probe).collect())
    assert got == want and len(got) > 0

    compact_partitioned(spark, os.path.join(oss, "banded"), ["key_bucket"])
    after = sorted(tuple(r) for r in query_lsh_index(spark, oss, probe).collect())
    assert after == want

    for comp in ("banded", "params"):
        d = os.path.join(oss, comp)
        assert os.path.exists(os.path.join(d, "CURRENT")), comp
        assert not os.path.exists(d + ".__old__")
        assert not os.path.exists(d + ".__tmp__")


def test_writer_lease_loud_failure_and_recovery(spark, tmp_path):
    """r08: the manifest single-writer contract is enforced — a second
    concurrent writer fails LOUDLY (LeaseHeld) instead of silently
    losing a generation; an expired lease (crashed holder) is broken;
    the lease is released on success AND on write_fn failure."""
    import json
    import os
    import time

    import pytest

    from ubdc_airbnb_spark.sources.layout import (
        LeaseHeld,
        current_path,
        manifest_gc,
        manifest_init,
        manifest_replace,
    )

    base = str(tmp_path / "t")
    df = spark.range(5).withColumnRenamed("id", "k")
    manifest_init(df, base)
    lease = os.path.join(base, ".writer-lease")
    assert not os.path.exists(lease)  # released after success

    # live lease held by "another writer" -> loud failure, no new gen
    with open(lease, "w") as f:
        json.dump({"pid": 99999, "expires": time.time() + 600}, f)
    gens_before = sorted(d for d in os.listdir(base) if d.startswith("gen-"))
    with pytest.raises(LeaseHeld, match="writer lease held"):
        manifest_replace(lambda d: df.write.parquet(d), base)
    with pytest.raises(LeaseHeld):
        manifest_gc(base)
    assert sorted(d for d in os.listdir(base) if d.startswith("gen-")) == gens_before
    assert os.path.exists(lease)  # someone else's lease is NOT cleared

    # expired lease (crashed holder) -> broken, write proceeds
    with open(lease, "w") as f:
        json.dump({"pid": 99999, "expires": time.time() - 1}, f)
    dest = manifest_replace(lambda d: df.write.parquet(d), base)
    assert current_path(base) == dest
    assert not os.path.exists(lease)

    # write_fn failure -> lease released, pointer untouched
    with pytest.raises(ValueError, match="boom"):
        manifest_replace(lambda d: (_ for _ in ()).throw(ValueError("boom")), base)
    assert not os.path.exists(lease)
    assert current_path(base) == dest


def test_writer_lease_nonce_refresh_and_usurper(spark, tmp_path):
    """r09 (ADVICE medium): the lease is nonce-owned and refreshed while
    held — (a) a healthy write LONGER than the TTL keeps its lease live,
    so a second writer still fails loudly mid-write; (b) a usurped lease
    (second writer broke a genuinely-expired one) aborts the first
    writer BEFORE the pointer swap, and its release does NOT delete the
    usurper's lease file."""
    import json
    import os
    import time

    import pytest

    from ubdc_airbnb_spark.sources.layout import (
        LeaseHeld,
        current_path,
        manifest_replace,
    )

    base = str(tmp_path / "t")
    df = spark.range(5).withColumnRenamed("id", "k")
    lease = os.path.join(base, ".writer-lease")

    # (a) long write vs short TTL: the refresher (period ttl/3 = 1 s)
    # keeps the on-disk expiry live past the original 2 s TTL, so a
    # concurrent writer probing DURING the write still gets LeaseHeld
    probed = {}

    def _slow_write(dest):
        df.write.parquet(dest)
        time.sleep(3.2)  # > ttl_sec: pre-r09 the lease would be expired now
        with open(lease) as f:
            probed["expires_margin"] = json.load(f)["expires"] - time.time()
        with pytest.raises(LeaseHeld, match="writer lease held"):
            manifest_replace(lambda d: df.write.parquet(d), base)

    dest = manifest_replace(_slow_write, base, ttl_sec=2.0)
    assert probed["expires_margin"] > 0, "refresher failed to keep the lease live"
    assert current_path(base) == dest
    assert not os.path.exists(lease)

    # (b) usurped mid-write: swap in a foreign-nonce lease during
    # write_fn -> the first writer aborts before the pointer swap and
    # leaves the usurper's lease untouched
    def _usurped_write(dest):
        df.write.parquet(dest)
        with open(lease, "w") as f:
            json.dump(
                {"pid": 99999, "expires": time.time() + 600, "nonce": "foreign"}, f
            )

    with pytest.raises(LeaseHeld, match="no longer ours"):
        manifest_replace(_usurped_write, base)
    assert current_path(base) == dest  # pointer never swapped
    with open(lease) as f:
        assert json.load(f)["nonce"] == "foreign"  # usurper's lease survives
    os.remove(lease)


def test_lease_refresh_concedes_on_expired_and_foreign(tmp_path):
    """r10 (ADVICE low, the verify-then-replace TOCTOU): refresh() must
    CONCEDE ownership instead of re-stamping when the on-disk lease is
    already past its expiry (a breaker may legally be mid-takeover —
    re-stamping could clobber the new holder's lease), and must stop
    permanently when the on-disk nonce is foreign."""
    import json
    import os
    import time

    import pytest

    from ubdc_airbnb_spark.sources.layout import LeaseHeld, _Lease

    path = str(tmp_path / ".writer-lease")

    # healthy refresh: re-stamps the expiry
    lease = _Lease(path, ttl_sec=600.0)
    with open(path, "w") as f:
        json.dump(lease._payload(), f)
    before = json.load(open(path))["expires"]
    time.sleep(0.05)
    lease.refresh()
    assert json.load(open(path))["expires"] > before

    # expired-on-disk (refresher stalled past the TTL): concede, never
    # replace — the file must be byte-untouched afterwards
    stale = {"pid": os.getpid(), "expires": time.time() - 1, "nonce": lease.nonce}
    with open(path, "w") as f:
        json.dump(stale, f)
    with pytest.raises(LeaseHeld, match="expired on disk"):
        lease.refresh()
    assert json.load(open(path)) == stale  # no clobber

    # foreign nonce: a usurper owns the file — stop loudly
    with open(path, "w") as f:
        json.dump({"pid": 1, "expires": time.time() + 600, "nonce": "foreign"}, f)
    with pytest.raises(LeaseHeld, match="no longer ours"):
        lease.refresh()
    assert json.load(open(path))["nonce"] == "foreign"


def test_lease_release_skips_remove_when_refresher_wedged(tmp_path):
    """r10 (ADVICE low): _release joins the refresher BEFORE the
    conditional remove and SKIPS removal if the thread is still alive —
    an in-flight os.replace racing the remove would resurrect a
    just-released lease and block new writers for a full TTL."""
    import json
    import os
    import threading
    import time

    from ubdc_airbnb_spark.sources.layout import _Lease

    path = str(tmp_path / ".writer-lease")
    lease = _Lease(path, ttl_sec=600.0)
    with open(path, "w") as f:
        json.dump(lease._payload(), f)

    # normal release: refresher joined, lease removed
    lease._start_refresher()
    lease._release()
    assert not os.path.exists(path)

    # wedged refresher (simulated with a thread that ignores the stop
    # event): release must leave the lease file in place
    with open(path, "w") as f:
        json.dump(lease._payload(), f)
    hang = threading.Event()
    lease._stop = threading.Event()
    lease._thread = threading.Thread(target=hang.wait, daemon=True)
    lease._thread.start()
    t0 = time.time()
    lease._release()
    assert time.time() - t0 < 10  # bounded exit (5 s join timeout)
    assert os.path.exists(path), "wedged refresher must skip the remove"
    hang.set()
