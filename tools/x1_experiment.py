"""A/B the x1_search_extract shapes: the InferFiltersFromGenerate rule
duplicates the from_json into the pushed-down filter (3 evaluations per
row: size(), isnotnull(), projection). Candidates:

  A  current shape (from_json + explode)                    [control]
  B  A + excludedRules=InferFiltersFromGenerate             [conf fix]

Interleaved rounds, noop sink, best-of-N, same session, warm cache.
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

RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def timed(spark, fn, sf_dir, n=6):
    best = float("inf")
    for _ in range(n):
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        "x1ab",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    warm_cache(spark, sf_dir, partitions=8)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    fn = {s.name: s.spark for s in q_mod.registry()}["x1_search_extract"]

    # warmup both shapes
    timed(spark, fn, sf_dir, n=2)
    spark.conf.set("spark.sql.optimizer.excludedRules", RULE)
    timed(spark, fn, sf_dir, n=2)
    spark.conf.unset("spark.sql.optimizer.excludedRules")

    a_best, b_best = float("inf"), float("inf")
    for _ in range(3):
        a_best = min(a_best, timed(spark, fn, sf_dir, n=3))
        spark.conf.set("spark.sql.optimizer.excludedRules", RULE)
        b_best = min(b_best, timed(spark, fn, sf_dir, n=3))
        spark.conf.unset("spark.sql.optimizer.excludedRules")
    print(f"A current              : {a_best:.3f} s")
    print(f"B excl InferFilters    : {b_best:.3f} s")

    # plan shape check: count from_json occurrences in each plan
    df = fn(spark, sf_dir)
    plan_a = df._jdf.queryExecution().executedPlan().toString()
    spark.conf.set("spark.sql.optimizer.excludedRules", RULE)
    df = fn(spark, sf_dir)
    plan_b = df._jdf.queryExecution().executedPlan().toString()
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    print("from_json count A:", plan_a.count("from_json"))
    print("from_json count B:", plan_b.count("from_json"))


if __name__ == "__main__":
    main()
