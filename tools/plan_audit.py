"""Broadcast-over-corpus-aggregate audit (round-5): build every
registry query's physical plan against a large replica dir and flag
BroadcastExchange nodes whose build subtree contains a HashAggregate —
the signature of the sf10 scale-killer found in ngram_novelty /
duplicate_spans (Catalyst's post-aggregate size estimate is tiny, so a
corpus-sized gram/term dictionary sails under the broadcast threshold
and materializes on the driver).

Flagged != guilty — r05 triage taxonomy (all 45 residual sf0.1 flags
classified):

1. GUILTY (fixed with SHUFFLE_HASH hints, r05): build side is an aggregate
   keyed by a corpus-cardinality key (gram/term/digest/doc/user/node/
   partkey/suppkey) — its real size grows linearly with the fact table
   while its estimate stays tiny. Fixed sites: ngram_novelty,
   duplicate_spans, upsert/insert_if_absent, q17/q18/q20 key sets,
   t2/j12/ns_dedup_apply, curation keeper sets, tfidf (top_terms df,
   cosine df-filter + norms, trending prev, bm25 doclen), lm (bigram/
   unigram model joins x3), containment sizes, connected-components
   label joins, pagerank rank/outdeg joins, funnel step tables,
   cohort first-event table, dupe_rate digest groups.
2. BENIGN — bounded by construction: scalars (totals, averages, max),
   histograms (fixed bucket count), centroids (k), sketches (w x d),
   per-source/per-period tables (group cardinality), top-k outputs,
   eval-set-derived tables (decontamination contract), bloom words
   (m_bits/32), the 2500-doc lsh_recall sample.
3. BENIGN — accurate stats: the build side is an InMemoryTableScan of
   a pinned relation; Spark knows its EXACT materialized size, so the
   broadcast decision flips to SMJ on its own when the data grows
   (unlike class 1, where the estimate is structurally wrong at every
   scale).

Usage: python tools/plan_audit.py <sf_dir> [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: broadcast-over-aggregate sites ADJUDICATED BENIGN (class 2/3 of the
#: taxonomy above — bounded-by-construction or accurate-stats). The
#: sweep reports only NEW suspects outside this set, making it a
#: regression ratchet: a name appearing here means a human traced the
#: build side to a bounded cardinality (scalar totals, fixed-bin
#: histograms, k centroids, top-k outputs, query-term dfs, mixture
#: cells, per-source/period tables, the 2500-doc lsh_recall slice...).
#: Re-adjudicate before extending this list.
BENIGN = frozenset(
    {
        "a3_cover_union", "j15_bloom_prune_semi", "ns_bigram_lm",
        "ns_bm25_index", "ns_bm25_topk", "ns_boilerplate_prefix",
        "ns_ccnet_buckets", "ns_cmsketch_freq", "ns_cohort_retention",
        "ns_contamination_spans", "ns_decontaminate", "ns_drift_histogram",
        "ns_dsir_weights", "ns_embed_kmeans", "ns_embed_quantize",
        "ns_graph_pagerank", "ns_heavy_hitters", "ns_interp_lm",
        "ns_join_size_probe", "ns_key_skew_report", "ns_label_centroid_sim",
        "ns_length_buckets", "ns_lsh_recall", "ns_mixture_apply",
        "ns_mixture_apply_tokens", "ns_mixture_rates", "ns_mixture_tokens",
        "ns_outlier_mad", "ns_outlier_zscore", "ns_profile_orders",
        "ns_rate_anomaly", "ns_rolling_active_users",
        "ns_source_balance_gini", "ns_source_overlap", "ns_temperature_mix",
        "ns_tfidf_cosine_pairs", "ns_token_budget", "ns_tokenize_vocab",
        "ns_unigram_kl", "ns_vocab_coverage", "ns_winsorize",
        "q11_important_parts", "q15_top_supplier", "q22_idle_balances",
    }
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf10"
    only = set(sys.argv[2:])

    # The audit EXECUTES construction-time work at replica scale (the
    # components fixpoint, sidecar collects), not just plan building —
    # and the replica corpus's near-dup graph is quadratically dense
    # (~17% of all doc pairs are within hamming<=3), so the sym-edge
    # checkpoint is ~200M rows at sf1. The default 8g heap models a
    # bench session; the r06/r07 sweeps that "died near the end with
    # connection refused" were THIS undersizing (GCLocker storm -> JVM
    # OOM), not infrastructure. Size the single local JVM like the
    # multi-executor cluster the conf simulates.
    if "SPARK_DRIVER_MEMORY" not in os.environ:
        # Derive from the host instead of assuming a 48 GiB box (r07
        # advice): cap at the 48g the sf1 audit actually needs, floor
        # at 4g, and leave ~25% of RAM for the OS + Python workers so
        # a small dev machine degrades to a slower-but-alive sweep
        # instead of an OOM-killed JVM with a confusing error.
        try:
            avail_kb = 0
            with open("/proc/meminfo") as fh:
                for line in fh:
                    if line.startswith("MemAvailable:"):
                        avail_kb = int(line.split()[1])
                        break
            gib = max(4, min(48, int(avail_kb / 1024 / 1024 * 0.75)))
        except OSError:
            gib = 8
        os.environ["SPARK_DRIVER_MEMORY"] = f"{gib}g"
        if gib < 48:
            print(
                f"[plan-audit] host has limited memory; driver heap set to "
                f"{gib}g (sf1 audit is sized for 48g — expect slower spills "
                f"or set SPARK_DRIVER_MEMORY explicitly)",
                file=sys.stderr,
            )

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
    new = sorted(set(suspects) - BENIGN)
    print("NEW SUSPECTS (not adjudicated benign):", new, flush=True)
    sys.exit(1 if new else 0)


if __name__ == "__main__":
    main()
