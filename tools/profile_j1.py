"""Round-5 one-off: reproduce bench.py's exact conditions for selected
queries and report wall/exec best-of-N plus build-phase split, to name
the j1_prefix_cover_semi +16% from BENCH_r04.

Usage: python tools/profile_j1.py [query ...]
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


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["j1_prefix_cover_semi"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    def _input_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )

    # keep IDENTICAL to bench.py's partition proxy (4 MB/partition) —
    # this tool's whole purpose is reproducing bench's exact conditions
    parts = min(cpus, max(4, _input_bytes(sf_dir) // (4 << 20)))
    spark = get_spark(
        "profile-j1",
        shuffle_partitions=parts,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_cache(spark, sf_dir, partitions=parts)
    specs = {s.name: s for s in q_mod.registry()}

    for name in names:
        fn = specs[name].spark
        runs = []
        for _ in range(7):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            cs = df.agg(F.bit_xor(F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))))
            t1 = time.perf_counter()
            cs._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            cs.collect()
            t3 = time.perf_counter()
            runs.append((t3 - t0, t1 - t0, t2 - t1, t3 - t2))
            from ubdc_airbnb_spark.operators.prefixsum import release_pins

            release_pins()
        best = min(runs, key=lambda r: r[0])
        print(
            f"{name}: wall={best[0]:.3f} pybuild={best[1]:.3f} "
            f"plan={best[2]:.3f} exec={best[3]:.3f}  "
            f"(all execs: {[round(r[3],3) for r in runs]})"
        )


if __name__ == "__main__":
    main()
