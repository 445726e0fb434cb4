"""Broadcast-over-corpus-aggregate audit (round-5): build every
registry query's physical plan against a large replica dir and flag
BroadcastExchange nodes whose build subtree contains a HashAggregate —
the signature of the sf10 scale-killer found in ngram_novelty /
duplicate_spans (Catalyst's post-aggregate size estimate is tiny, so a
corpus-sized gram/term dictionary sails under the broadcast threshold
and materializes on the driver).

Flagged != guilty: bounded aggregates (histograms, centroids, params,
top-k) are legitimately broadcastable. Review each hit; fix real ones
with an explicit MERGE/SHUFFLE_HASH hint.

Usage: python tools/plan_audit.py <sf_dir> [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf10"
    only = set(sys.argv[2:])

    from ubdc_airbnb_spark import queries as q_mod
    from ubdc_airbnb_spark.operators.prefixsum import release_pins
    from ubdc_airbnb_spark.session import get_spark

    spark = get_spark("plan-audit", extra_conf={
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
    })
    suspects = []
    for s in q_mod.registry():
        if only and s.name not in only:
            continue
        try:
            df = s.spark(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            print(f"{s.name}: PLAN-ERROR {str(e)[:100]}", flush=True)
            release_pins()
            continue
        tree = plan.split("\n\n")[0]
        lines = tree.splitlines()
        hit = False
        for i, line in enumerate(lines):
            if "BroadcastExchange" not in line:
                continue
            indent = len(line) - len(line.lstrip(" :+-"))
            sub = []
            for l2 in lines[i + 1 :]:
                ind2 = len(l2) - len(l2.lstrip(" :+-"))
                if ind2 <= indent:
                    break
                sub.append(l2)
            if any("HashAggregate" in l2 or "SortAggregate" in l2 for l2 in sub):
                hit = True
                break
        print(f"{s.name}: {'SUSPECT' if hit else 'ok'}", flush=True)
        if hit:
            suspects.append(s.name)
        release_pins()
    print("SUSPECTS:", sorted(set(suspects)), flush=True)


if __name__ == "__main__":
    main()
