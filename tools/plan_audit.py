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

Second detector (round-10, VERDICT r09 item 2): single-partition
windows. A full-table ``Exchange SinglePartition`` feeding a
``Sort``/``Window`` is the build_vocab trap — the whole input sorts on
ONE reducer, invisible to the broadcast detector and to five rounds of
"plan audit clean". Flag any gate whose plan has a SinglePartition
exchange consumed by a Window/Sort UNLESS the exchange's own subtree is
bounded (TakeOrderedAndProject / Limit / WindowGroupLimit / a keyless
= one-row aggregate). Bounded-by-adjudication names (day-grain tables,
post-limit rank windows, fixed-bucket histograms) live in
WINDOW_BENIGN. The pre-fix build_vocab shape is the regression test
(tests/test_plan_audit_detector.py).

Usage: python tools/plan_audit.py <sf_dir> [name ...]
"""

from __future__ import annotations

import os
import re
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
        # r10 (two-pass forced in the audit, see main): the prefixsum
        # family broadcasts its per-bucket offsets table — a groupBy on
        # __rb whose key space is num_buckets (bounded by construction,
        # class 2), broadcast by explicit F.broadcast hint
        "ns_dedup_sorted_neighborhood", "ns_sequence_pack", "w6_batch_assign",
    }
)


#: single-partition-window sites ADJUDICATED BENIGN (r10 seeding): the
#: window's input is bounded by construction but not by a plan node the
#: detector can see — a KEYED aggregate whose key space is bounded.
#: Classes traced:
#: - day-grain: window over a per-day aggregate (~2.4k rows at any
#:   scale): w8_moving_avg, w9_lag_delta
#: - fixed-width histogram sketch: cumsum over O(range/width) bucket
#:   rows (sketches.histogram_quantiles contract): ns_quantile_sketch,
#:   ns_winsorize, ns_outlier_mad
#: - length histogram: window over groupBy(n_tokens) rows, bounded by
#:   max document length: ns_length_buckets, ns_token_budget
#: - two-pass prefix-sum offsets: window over the per-bucket totals
#:   table, <= num_buckets rows (operators/prefixsum.py:239):
#:   ns_sequence_pack, w6_batch_assign
#: Re-adjudicate before extending.
WINDOW_BENIGN = frozenset(
    {
        "w8_moving_avg", "w9_lag_delta",
        "ns_quantile_sketch", "ns_winsorize", "ns_outlier_mad",
        "ns_length_buckets", "ns_token_budget",
        "ns_sequence_pack", "w6_batch_assign",
    }
)


def _parse_formatted(plan: str):
    """Formatted explain → (tree nodes, id→detail map). Tree nodes are
    (indent, name, id) in top-down order; details carry the Arguments
    lines the tree section omits (SinglePartition lives there)."""
    parts = plan.split("\n\n")
    tree = parts[0].splitlines()
    details = "\n\n".join(parts[1:])
    blocks = {
        m.group(1): m.group(0)
        for m in re.finditer(
            r"^\((\d+)\) \S.*?(?=^\(\d+\) |\Z)", details, re.S | re.M
        )
    }
    # name = FIRST identifier on the tree line, id = the trailing
    # "(n)": multi-token lines like "BroadcastNestedLoopJoin Cross
    # BuildRight (6)" must parse as the join node, not "BuildRight"
    name_re = re.compile(r"([A-Za-z][\w.]*)")
    id_re = re.compile(r"\((\d+)\)\s*$")
    parsed = []
    for line in tree:
        m = name_re.search(line)
        mid = id_re.search(line)
        if not m or not mid:
            continue
        indent = len(line) - len(line.lstrip(" :+-*"))
        parsed.append((indent, m.group(1), mid.group(1)))
    return parsed, blocks


_BOUNDING_NODES = frozenset(
    {
        "TakeOrderedAndProject",
        "CollectLimit",
        "GlobalLimit",
        "LocalLimit",
        "WindowGroupLimit",
    }
)


def single_partition_window_suspect(plan: str) -> bool:
    """True if the plan funnels an UNBOUNDED input through an
    ``Exchange SinglePartition`` consumed by a Sort/Window — the
    one-reducer global sort that dies at 100x scale. Bounded feeds
    (top-k, limit, keyless one-row aggregates) are fine: the single
    partition then holds <=k rows by construction."""
    parsed, blocks = _parse_formatted(plan)
    for i, (ind, name, nid) in enumerate(parsed):
        if name != "Exchange" or "SinglePartition" not in blocks.get(nid, ""):
            continue
        # consumer chain: nearest ancestors (strictly shallower indent)
        ancestors = []
        cur = ind
        for j in range(i - 1, -1, -1):
            pind, pname, _ = parsed[j]
            if pind < cur:
                ancestors.append(pname)
                cur = pind
        # hazard only when a Sort/Window consumes the exchange (a
        # keyless HashAggregate's SinglePartition feed is a scalar
        # reduce — partials already combined map-side)
        consumers = ancestors[:2]
        if not any(c in ("Window", "Sort") for c in consumers):
            continue
        # bounded below? walk the exchange's subtree
        bounded = False
        for j in range(i + 1, len(parsed)):
            sind, sname, sid = parsed[j]
            if sind <= ind:
                break
            if sname in _BOUNDING_NODES:
                bounded = True
                break
            if sname.endswith("Aggregate") and re.search(
                r"Keys(?: \[\d+\])?: \[\]", blocks.get(sid, "")
            ):
                bounded = True
                break
        if not bounded:
            return True
    return False


_DRIVER_LOCAL_LEAF = re.compile(
    r"^\(\d+\) (Scan ExistingRDD|LocalTableScan|Scan OneRowRelation)"
)


#: row-expanding operators: a bounding node BELOW one of these no
#: longer bounds the subtree's output (limit-k joined against the
#: corpus is corpus x k rows). Expand (grouping sets) multiplies by a
#: constant, but conservatively counts as expanding — false positives
#: go to adjudication, false negatives hide scale-killers (ADVICE r10).
_EXPANDING_NODES = re.compile(
    r"Join$|^CartesianProduct$|^Generate$|^Expand$"
)


def _subtree_bounded(parsed, blocks, start, root_indent) -> bool:
    """True if the subtree rooted at ``parsed[start]`` (whose indent is
    ``root_indent``) contains a row-bounding node — an explicit limit /
    top-k, or a keyless (= one-row) aggregate — ON ITS ROOT SPINE
    (r11, ADVICE: a limit sitting BELOW a join/generate inside the
    child bounds only that join input, not the child's output, so the
    scan stops crediting bounding nodes whose path to the child root
    crosses a row-expanding operator) — OR reads only driver-local
    leaves (ExistingRDD / LocalTableScan: data that was already
    materialized on the driver is definitionally not corpus-scale)."""
    end = start
    leaves_local = True
    saw_leaf = False
    # stack of (indent, under_expander) mirroring the path from the
    # subtree root to the current node
    path: list[tuple[int, bool]] = []
    for j in range(start, len(parsed)):
        sind, sname, sid = parsed[j]
        if j > start and sind <= root_indent:
            break
        end = j
        while path and path[-1][0] >= sind:
            path.pop()
        under_expander = path[-1][1] if path else False
        path.append((sind, under_expander or bool(_EXPANDING_NODES.search(sname))))
        if under_expander:
            continue
        if sname in _BOUNDING_NODES:
            return True
        if sname.endswith("Aggregate") and re.search(
            r"Keys(?: \[\d+\])?: \[\]", blocks.get(sid, "")
        ):
            return True
    for j in range(start, end + 1):
        sind, _, sid = parsed[j]
        is_leaf = j == end or parsed[j + 1][0] <= sind
        if not is_leaf:
            continue
        saw_leaf = True
        if not _DRIVER_LOCAL_LEAF.match(blocks.get(sid, "")):
            leaves_local = False
    return saw_leaf and leaves_local


def nested_loop_join_suspect(plan: str) -> bool:
    """Third detector (r10): unbounded nested-loop joins. A
    ``CartesianProduct`` or ``BroadcastNestedLoopJoin`` whose output is
    |L| x |R| rows is fine when one side is bounded by construction
    (k-row params / 1-row stats joined against the corpus — a linear
    pass) and a quadratic scale-killer when BOTH sides grow with the
    data. Flag joins where neither child subtree carries a bounding
    node; keyed-but-bounded feeds (fixed histograms, k centroids) go in
    NLJ_BENIGN by adjudication."""
    parsed, blocks = _parse_formatted(plan)
    for i, (ind, name, _) in enumerate(parsed):
        if name not in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            continue
        # child roots: minimal-indent nodes inside the join's region
        region_end = i + 1
        while region_end < len(parsed) and parsed[region_end][0] > ind:
            region_end += 1
        if region_end == i + 1:
            continue
        child_indent = min(p[0] for p in parsed[i + 1 : region_end])
        roots = [
            j
            for j in range(i + 1, region_end)
            if parsed[j][0] == child_indent
        ]
        if not any(
            _subtree_bounded(parsed, blocks, j, child_indent) for j in roots
        ):
            return True
    return False


#: Arrow-batched Python evaluation nodes — the sanctioned slow paths.
#: ``BatchEvalPython`` (row-at-a-time pickling, ~10-100x slower) is the
#: one the fourth detector flags.
def row_udf_suspect(plan: str) -> bool:
    """Fourth detector (r10): row-at-a-time Python UDFs in a gate plan.
    ``BatchEvalPython`` pickles row by row; every sanctioned Python
    escape in this repo is Arrow-batched (ArrowEvalPython, MapInPandas,
    FlatMapGroupsInPandas). The only adjudicated row-UDF site is the X7
    generic-JSONPath escape hatch, which is not a gate."""
    return "BatchEvalPython" in plan


#: nested-loop sites ADJUDICATED BENIGN — seeded r10 from a
#: full-registry sweep at sf0.01 (each traced to source). Classes:
#: - literal-bounded query batch: the probe side is a constant-range
#:   key filter (``vec_id < 10`` / ``< 16``) — <=k rows at any corpus
#:   size, invisible to the plan: ns_embed_topk, ns_embed_ivf_topk,
#:   ns_embed_ivf_multiprobe, ns_embed_ivf_index, ns_embed_outliers,
#:   ns_rank_fusion, ns_ann_recall (the 2500-doc recall sample)
#: - keyed-but-bounded aggregate feed (class 2 of the broadcast
#:   taxonomy): per-label centroids (#labels) x per-label centroids:
#:   ns_label_centroid_sim; per-source counts (#sources) x scalar
#:   totals: ns_source_balance_gini; k-centroid Lloyd-update feed
#:   (groupBy(centroid_id) with <= k groups): ns_embed_kmeans — newly
#:   FLAGGED r11 when the root-spine fix removed the old scan's false
#:   negative (the seed LIMIT sits below the assignment join and never
#:   bounded the iter-2 side); the <= k bound is machine-re-verified by
#:   tests/test_benign_bounds.py::test_kmeans_centroid_feed_bounded
#: Driver-local feeds (Scan ExistingRDD / LocalTableScan) are cleared
#: mechanically by _subtree_bounded, not listed here. Re-adjudicate
#: before extending.
NLJ_BENIGN = frozenset(
    {
        "ns_ann_recall", "ns_embed_ivf_index", "ns_embed_ivf_multiprobe",
        "ns_embed_ivf_topk", "ns_embed_kmeans", "ns_embed_outliers",
        "ns_embed_topk", "ns_label_centroid_sim", "ns_rank_fusion",
        "ns_source_balance_gini",
    }
)

#: row-UDF sites ADJUDICATED BENIGN — none; the registry is expected to
#: stay BatchEvalPython-free (X7 is the only row-UDF and has no gate).
ROWUDF_BENIGN = frozenset(set())


#: Fifth detector (r11, VERDICT r10 item 2): the persisted-index probe
#: gates are partition-pruned BY DESIGN (postings bucketed by term
#: md5-bucket, IVF by centroid_id, LSH by band bucket) — an edit that
#: wraps the probe key in an expression would silently turn the probe
#: into a full index scan, and the structural detectors cannot see it
#: because an unpruned scan is a missing annotation, not a suspicious
#: node. These gates therefore REQUIRE >=1 parquet scan with non-empty
#: ``PartitionFilters`` in their plan. No benign list: a hit is always
#: a regression (tests/test_plan_audit_detector.py has the
#: prune-stripped shape).
INDEX_PROBE_GATES = frozenset(
    {"ns_bm25_index", "ns_embed_ivf_index", "ns_dedup_lsh_index"}
)

_PRUNE_LIST = re.compile(r"PartitionFilters: \[([^\]]*)\]")
#: trivial null-guards Catalyst attaches to ANY partition-column
#: reference — present even when the real predicate cannot prune
_TRIVIAL_FILTER = re.compile(r"^(isnotnull|isnull)\([^()]*\)$")


def index_prune_suspect(plan: str) -> bool:
    """True when NO scan in the plan carries a NON-TRIVIAL
    ``PartitionFilters`` entry — for :data:`INDEX_PROBE_GATES` that
    means the probe key stopped reaching the partitioned index layout
    and the probe reads every partition. ``isnotnull(bucket)`` alone
    does not count: Catalyst emits that null-guard even when the
    actual predicate mixes in a data column and cannot prune."""
    for m in _PRUNE_LIST.finditer(plan):
        for term in m.group(1).split(","):
            term = term.strip()
            if term and not _TRIVIAL_FILTER.match(term):
                return False
    return True


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
    from ubdc_airbnb_spark.operators import prefixsum
    from ubdc_airbnb_spark.operators.prefixsum import release_pins
    from ubdc_airbnb_spark.session import get_spark

    # The audit validates the AT-SCALE physical plan (same rationale as
    # scale_smoke): auto mode legitimately picks the single-partition
    # window below its size threshold — Catalyst's estimate of a small
    # audit table is tiny — but that's the plan we're NOT here to test.
    prefixsum.SINGLE_PARTITION_MAX_BYTES = -1

    spark = get_spark("plan-audit", extra_conf={
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
    })
    suspects = []
    prune_suspects = []
    win_suspects = []
    nlj_suspects = []
    rowudf_suspects = []
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
        win_hit = single_partition_window_suspect(plan)
        nlj_hit = nested_loop_join_suspect(plan)
        rowudf_hit = row_udf_suspect(plan)
        prune_hit = s.name in INDEX_PROBE_GATES and index_prune_suspect(plan)
        verdicts = (
            ("SUSPECT" if hit else "ok")
            + (" WINDOW-SUSPECT" if win_hit else "")
            + (" NLJ-SUSPECT" if nlj_hit else "")
            + (" ROWUDF-SUSPECT" if rowudf_hit else "")
            + (" PRUNE-SUSPECT" if prune_hit else "")
        )
        print(f"{s.name}: {verdicts}", flush=True)
        if hit:
            suspects.append(s.name)
        if win_hit:
            win_suspects.append(s.name)
        if nlj_hit:
            nlj_suspects.append(s.name)
        if rowudf_hit:
            rowudf_suspects.append(s.name)
        if prune_hit:
            prune_suspects.append(s.name)
        release_pins()
    print("SUSPECTS:", sorted(set(suspects)), flush=True)
    new = sorted(set(suspects) - BENIGN)
    print("NEW SUSPECTS (not adjudicated benign):", new, flush=True)
    print("WINDOW SUSPECTS:", sorted(set(win_suspects)), flush=True)
    new_win = sorted(set(win_suspects) - WINDOW_BENIGN)
    print("NEW WINDOW SUSPECTS (not adjudicated benign):", new_win, flush=True)
    print("NLJ SUSPECTS:", sorted(set(nlj_suspects)), flush=True)
    new_nlj = sorted(set(nlj_suspects) - NLJ_BENIGN)
    print("NEW NLJ SUSPECTS (not adjudicated benign):", new_nlj, flush=True)
    print("ROWUDF SUSPECTS:", sorted(set(rowudf_suspects)), flush=True)
    new_rowudf = sorted(set(rowudf_suspects) - ROWUDF_BENIGN)
    print(
        "NEW ROWUDF SUSPECTS (not adjudicated benign):", new_rowudf, flush=True
    )
    print("PRUNE SUSPECTS (no benign list — any hit is a regression):",
          sorted(set(prune_suspects)), flush=True)
    sys.exit(
        1 if (new or new_win or new_nlj or new_rowudf or prune_suspects) else 0
    )


if __name__ == "__main__":
    main()
