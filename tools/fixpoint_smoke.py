"""Third-decade evidence for the iterative fixpoints — r09, VERDICT
item 3. sf100 growth had only been measured for the pair gates; the
most scale-suspect shapes are the ITERATIVE ones. For each requested
scale this harness runs:

- ``ns_dedup_components``'s exact shape (simhash sketch → value
  contraction → pointer-jump min-label fixpoint) with per-round walls,
  change counts, and the live persistent-RDD count sampled per round —
  rounds must stay O(log diameter) and CheckpointChain storage flat
  (retire(keep=1) frees each round as the convergence diff consumes it);
- ``ns_dedup_canonical``'s shape (the same fixpoint + quality-scored
  canonical pick) — total wall, proving the tail is non-iterative;
- ``pagerank`` at iterations=2 and iterations=4 — the (w4 - w2)/2
  marginal round cost is the honest per-round number (it excludes the
  static edge/degree/vertex setup both runs share), and must grow
  linearly with data, not with iteration count.

Usage: python tools/fixpoint_smoke.py [--dirs /tmp/scale_sf10 /tmp/scale_sf100]
One JSON line per measurement; exit 0 always (this is evidence
collection; convergence failures raise loudly from the operator).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _live_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="*",
                    default=["/tmp/scale_sf10", "/tmp/scale_sf100"])
    ap.add_argument("--pagerank-iters", type=int, nargs=2, default=[2, 10])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.functions import textstats
    from ubdc_airbnb_spark.operators import dedup
    from ubdc_airbnb_spark.operators.graph import pagerank
    from ubdc_airbnb_spark.session import get_spark
    from ubdc_airbnb_spark.sources.tables import load_table

    spark = get_spark("fixpoint-smoke")
    spark.range(10**7).selectExpr("sum(id)").collect()  # session warmup

    for sf_dir in args.dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        docs = load_table(spark, sf_dir, "documents")

        # --- components fixpoint (ns_dedup_components shape) ---------
        rounds: list[dict] = []

        def _on_round(r, ch, w):
            rounds.append({
                "round": r, "changed": ch, "sec": round(w, 2),
                "live_rdds": _live_rdds(spark),
            })

        sketches = dedup.simhash(docs, "doc_id", "text", bits=32)
        t0 = time.perf_counter()
        comp = dedup.simhash_components(
            sketches, "doc_id", bits=32, bands=4, max_hamming=3,
            on_round=_on_round,
        )
        n_comp = comp.select("component").distinct().count()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "check": f"components:{tag}", "sec": wall,
            "rounds": len(rounds), "n_components": n_comp,
            "round_log": rounds,
            "max_live_rdds": max(r["live_rdds"] for r in rounds),
        }))
        sys.stdout.flush()

        # --- canonical (fixpoint + non-iterative pick tail) -----------
        rounds2: list[dict] = []
        t0 = time.perf_counter()
        comp2 = dedup.simhash_components(
            sketches, "doc_id", bits=32, bands=4, max_hamming=3,
            on_round=lambda r, ch, w: rounds2.append(
                {"round": r, "changed": ch, "sec": round(w, 2)}
            ),
        )
        scored = docs.select(
            "doc_id", F.round(textstats.quality_score("text"), 6).alias("__q")
        )
        canon = dedup.canonical_per_cluster(comp2, scored, id_col="doc_id",
                                            prefer=F.col("__q"))
        n_canon = canon.count()
        print(json.dumps({
            "check": f"canonical:{tag}",
            "sec": round(time.perf_counter() - t0, 2),
            "rounds": len(rounds2), "rows": n_canon,
            "fixpoint_sec": round(sum(r["sec"] for r in rounds2), 2),
        }))
        sys.stdout.flush()

        # --- pagerank marginal round cost ------------------------------
        # dst spreads over a 500M key space: a narrow modulus (the first
        # r09 attempt used % 10k) SATURATES the distinct edge set at
        # ~100k rows by sf10, so every decade ran the same per-round
        # input and "linear growth" was unmeasurable — pagerank's
        # per-round cost is driven by the DISTINCT edge table (the
        # static_chain contraction), which itself is evidence, but the
        # growth claim needs edges that actually grow.
        lo, hi = args.pagerank_iters
        ev = load_table(spark, sf_dir, "events")
        edges = ev.select(
            F.col("user_id").alias("src"),
            F.pmod(F.xxhash64("event_id"), F.lit(500_000_000)).alias("dst"),
        )
        n_edges = edges.distinct().count()
        walls = {}
        for iters in (lo, hi):
            t0 = time.perf_counter()
            pagerank(edges, iterations=iters).agg(
                F.sum("rank"), F.count(F.lit(1))
            ).collect()
            walls[iters] = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "check": f"pagerank:{tag}", "walls": walls,
            "n_distinct_edges": n_edges,
            "marginal_round_sec": round((walls[hi] - walls[lo]) / (hi - lo), 3),
        }))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
