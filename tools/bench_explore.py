"""One-off bench exploration: time selected headline queries under
different shuffle-partition settings to locate the toy-scale floor.

Usage: python tools/bench_explore.py [parts ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ubdc_airbnb_spark import queries as q_mod
from ubdc_airbnb_spark.session import get_spark
from ubdc_airbnb_spark.sources.tables import warm_cache

QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "j1_prefix_cover_semi",
    "j9_bridge_join",
    "ns_dedup_minhash_lsh",
    "ns_dedup_ngram_jaccard",
    "ns_dedup_simhash",
]


def checksum(df):
    df.agg(F.bit_xor(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])))).collect()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    parts_list = [int(a) for a in sys.argv[1:]] or [8, 32, 64]
    specs = {s.name: s for s in q_mod.registry()}
    for parts in parts_list:
        spark = get_spark("bench-explore", shuffle_partitions=parts)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        warm_cache(spark, sf_dir)
        total = 0.0
        out = []
        for name in QUERIES:
            fn = specs[name].spark
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                checksum(fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            out.append(f"{name}={best:.3f}")
            total += best
        print(f"parts={spark.conf.get('spark.sql.shuffle.partitions')}: total={total:.3f}  " + " ".join(out), flush=True)
        from ubdc_airbnb_spark.sources.tables import clear_cache

        clear_cache()
        spark.stop()


if __name__ == "__main__":
    main()


def variant(name, conf):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = {s.name: s for s in q_mod.registry()}
    spark = get_spark("bench-explore-" + name, shuffle_partitions=32, extra_conf=conf)
    for k, v in conf.items():
        spark.conf.set(k, v)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_cache(spark, sf_dir)
    total = 0.0
    out = []
    for qn in QUERIES:
        fn = specs[qn].spark
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            checksum(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out.append(f"{qn}={best:.3f}")
        total += best
    print(f"{name}: total={total:.3f}  " + " ".join(out), flush=True)
    from ubdc_airbnb_spark.sources.tables import clear_cache
    clear_cache()
    spark.stop()
