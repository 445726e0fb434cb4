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
