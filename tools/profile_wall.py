"""Per-query wall breakdown for the headline set: build (py4j frame
construction), plan (analyze/optimize/physical), exec (collect) — the
diagnostic behind the bench's wall-exec gap. Prints one JSON line per
query plus a totals line, best-of-3 per phase.

Usage: python tools/profile_wall.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from ubdc_airbnb_spark import queries as q_mod
from ubdc_airbnb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or HEADLINE
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    def _input_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _dd, fs in os.walk(d)
            for f in fs
        )

    parts = min(cpus, max(4, _input_bytes(sf_dir) // (4 << 20)))
    spark = get_spark(
        "profile",
        shuffle_partitions=parts,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ubdc_airbnb_spark.sources.tables import warm_cache

    warm_cache(spark, sf_dir, partitions=parts)

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.prefixsum import release_pins

    specs = {s.name: s for s in q_mod.registry()}
    tot = {"build": 0.0, "plan": 0.0, "exec": 0.0}
    for name in names:
        fn = specs[name].spark
        best = {"build": float("inf"), "plan": float("inf"), "exec": float("inf")}
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            cs = df.agg(
                F.bit_xor(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])))
            )
            t1 = time.perf_counter()
            cs._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            cs.collect()
            t3 = time.perf_counter()
            best["build"] = min(best["build"], t1 - t0)
            best["plan"] = min(best["plan"], t2 - t1)
            best["exec"] = min(best["exec"], t3 - t2)
        release_pins()
        for k in tot:
            tot[k] += best[k]
        print(
            json.dumps(
                {"q": name, **{k: round(v, 3) for k, v in best.items()}}
            )
        )
    print(json.dumps({"q": "TOTAL", **{k: round(v, 3) for k, v in tot.items()}}))


if __name__ == "__main__":
    main()
