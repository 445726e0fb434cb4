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
