"""Adversarial (zipfian) corpus smoke — r09, VERDICT item 1.

Every prior smoke ran on near-uniform synthetic data, so the skew
detector NEVER fired and the viral-cluster machinery (``max_bucket`` /
``max_group`` caps, ``salted_join``/``salted_agg``, AQE skew-join) had
only composition pytests behind it. This harness generates a hostile
variant of the sf1 replica and proves, on data-scale inputs, that:

1. the skew detector actually fires (zipf keys, hot join key), and the
   repairs (salted join, AQE skew split) measurably flatten the same
   workload, result-identical;
2. the caps measurably truncate a viral exact-duplicate cluster AND a
   viral NEAR-dup band bucket (distinct texts/vectors), with
   ``exact_duplicates`` recovering the capped mass in O(B);
3. ``connected_components`` converges on the giant cluster and on a
   100k-node chain within the pointer-jump bound (rounds ~ log2 d).

Adversarial ingredients (written to --out as parquet, same schemas as
the driver tables):
- documents: base replica + a 3,500-copy boilerplate cluster (ONE text
  — exact-duplicate mass) + a 1,200-doc near-dup family (DISTINCT
  texts sharing a 60-word prefix — they collide in minhash bands
  without being exact duplicates, the case max_group cannot catch) +
  zipf(1.5)-distributed source over 20 values.
- events: 25% of rows reassigned to ONE user id (hot join/agg key).
- embeddings: base + 400 DISTINCT near-identical vectors x 5 exact
  copies each (member-weighted bucket cap must fire on 2,000, not 400).

Usage: python tools/adversarial_smoke.py [--src /tmp/scale_sf1]
       [--out /tmp/adv_sf1] [--skip-gen]
Prints one JSON line per check plus a verdict; exit 1 if any
expectation fails (detector silent where it must fire, caps not
truncating, equality broken, fixpoint overrun).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

N_BOILER = 3_500
N_HOT = 1_200
N_DENSE_VALS = 400
DENSE_COPIES = 5
ZIPF_S = 1.5
ZIPF_K = 20
HOT_USER_PCT = 25

BOILER_TEXT = (
    "please enable javascript to continue your browser settings are "
    "blocking required content on this page contact support if the "
    "problem persists error code seven zero three"
)
HOT_PREFIX = " ".join(
    f"w{i} shared boilerplate navigation header footer term{i % 7}"
    for i in range(12)
)  # 60 words shared by every hot-family doc


def _zipf_thresholds(k: int, s: float) -> list[float]:
    ws = [1.0 / (i + 1) ** s for i in range(k)]
    tot = sum(ws)
    acc, out = 0.0, []
    for w in ws:
        acc += w / tot
        out.append(acc)
    return out


def generate(spark, src: str, out: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    # --- documents: base + boilerplate cluster + near-dup family, zipf source
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    max_id = docs.agg(F.max("doc_id")).first()[0]
    cum = _zipf_thresholds(ZIPF_K, ZIPF_S)
    # deterministic zipf via inverse CDF over a content-hash uniform
    u = (F.pmod(F.xxhash64(F.col("doc_id"), F.lit("zipf")), F.lit(1_000_000))
         / F.lit(1_000_000.0))
    zipf_idx = F.lit(ZIPF_K - 1)
    for i in range(ZIPF_K - 1, -1, -1):
        zipf_idx = F.when(u < cum[i], F.lit(i)).otherwise(zipf_idx)
    base = docs.withColumn("source", F.concat(F.lit("src"), zipf_idx.cast("string")))
    boiler = spark.range(N_BOILER).select(
        (F.lit(max_id) + 1 + F.col("id")).alias("doc_id"),
        F.lit(BOILER_TEXT).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.lit(len(BOILER_TEXT)).cast("long").alias("n_chars"),
    )
    hot = spark.range(N_HOT).select(
        (F.lit(max_id) + 1 + N_BOILER + F.col("id")).alias("doc_id"),
        F.concat(
            F.lit(HOT_PREFIX + " variant "),
            F.col("id").cast("string"),
            F.lit(" end"),
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        (F.lit(len(HOT_PREFIX)) + 12).cast("long").alias("n_chars"),
    )
    (
        base.unionByName(boiler).unionByName(hot)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    # --- events: hot user key (25% of all rows on user 0)
    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    ev = ev.withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64(F.col("event_id"), F.lit("hot")), F.lit(100))
            < HOT_USER_PCT,
            F.lit(0),
        ).otherwise(F.col("user_id")),
    )
    ev.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    # the user dim as a real table: AQE's OptimizeSkewedJoin only
    # pattern-matches SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — an
    # in-plan distinct() on the dim side makes that child an aggregate
    # output and silently disables the skew split for the WHOLE join
    # (found by this harness's first run); production dims are tables
    ev.select("user_id").distinct().withColumn(
        "segment", F.pmod(F.col("user_id"), F.lit(7))
    ).coalesce(4).write.mode("overwrite").parquet(os.path.join(out, "users.parquet"))
    # --- embeddings: base + dense DISTINCT near-identical cluster
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    max_vid = emb.agg(F.max("vec_id")).first()[0]
    dim = emb.select(F.size("embedding").alias("d")).first().d
    dense = spark.range(N_DENSE_VALS * DENSE_COPIES).select(
        (F.lit(max_vid) + 1 + F.col("id")).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(i == 0, F.lit(1.0))
            .when(i == 1, (F.col("id") / F.lit(DENSE_COPIES)).cast("int") * 1e-7)
            .otherwise(F.lit(0.0))
            .cast("float"),
        ).alias("embedding"),
        F.lit(999).alias("label"),
    )
    emb.unionByName(dense).repartition(16).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )


def _emit(rec: dict) -> None:
    print(json.dumps(rec))
    sys.stdout.flush()


def _skew_verdict(prof: dict, min_rows: int = 10_000, factor: float = 4.0) -> bool:
    return (
        prof["parts"] > 0
        and prof["max"] >= min_rows
        and (prof["parts"] == 1 or prof["max"] > factor * max(prof["median"], 1))
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/scale_sf1")
    ap.add_argument("--out", default="/tmp/adv_sf1")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--only-indexes", action="store_true",
                    help="run only section 6 (skewed-index probe paths) "
                         "against an existing --out corpus")
    ap.add_argument("--only-streaming", action="store_true",
                    help="run only section 7 (streaming folds under "
                         "hostile ingest) against an existing --out corpus")
    ap.add_argument("--only-funnel", action="store_true",
                    help="run only section 8 (composed curation funnel "
                         "on the hostile corpus) against an existing "
                         "--out corpus")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scale_smoke import partition_profile, replicate
    from ubdc_airbnb_spark.session import get_spark

    spark = get_spark("adversarial-smoke", extra_conf={
        # the detector must see the PLAN's partitioning, as in scale_smoke
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
    })
    spark.range(10**7).selectExpr("sum(id)").collect()  # session warmup

    if not os.path.exists(os.path.join(args.src, "documents.parquet")):
        replicate("/root/testdata/sf0.1", args.src, 10)
    if not args.skip_gen:
        t0 = time.perf_counter()
        generate(spark, args.src, args.out)
        _emit({"check": "generate", "sec": round(time.perf_counter() - t0, 2)})

    failures: list[str] = []

    def expect(cond: bool, name: str) -> bool:
        if not cond:
            failures.append(name)
        return cond

    docs = spark.read.parquet(os.path.join(args.out, "documents.parquet"))
    ev = spark.read.parquet(os.path.join(args.out, "events.parquet"))
    emb = spark.read.parquet(os.path.join(args.out, "embeddings.parquet"))

    if args.only_indexes or args.only_streaming or args.only_funnel:
        if args.only_indexes:
            run_index_probes(spark, args.out, docs, emb, expect, partition_profile)
        if args.only_streaming:
            run_streaming_folds(spark, args.out, docs, emb, expect)
        if args.only_funnel:
            run_curation_funnel(spark, args.out, docs, expect)
        _emit({"verdict": "FAIL" if failures else "PASS", "failures": failures})
        return 1 if failures else 0

    # ---- 1. the skew detector fires on the zipf keys -------------------
    from ubdc_airbnb_spark.operators.skew import key_skew_report

    for name, df, key in (("documents.source", docs, "source"),
                          ("events.user_id", ev, "user_id")):
        top = key_skew_report(df, key, top=3).collect()
        rec = {"check": f"skew_report:{name}",
               "top": [(r.key, r.cnt, round(r.share, 4)) for r in top],
               "imbalance": round(top[0].imbalance, 2)}
        rec["fired"] = top[0].imbalance > 4.0
        expect(rec["fired"], f"skew_report:{name} must fire")
        _emit(rec)

    # ---- 2. hot-key join: plain fires, salted passes, AQE-split passes -
    from ubdc_airbnb_spark.operators.joins import salted_join

    dim = spark.read.parquet(os.path.join(args.out, "users.parquet"))
    legs = {}
    # plain sort-merge, AQE skew split OFF: the hot user's rows land on
    # ONE reducer — the detector MUST fire
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t0 = time.perf_counter()
    plain = ev.join(dim.hint("merge"), "user_id")
    n_plain = plain.count()
    prof = partition_profile(plain)
    legs["plain"] = {"sec": round(time.perf_counter() - t0, 2), **prof,
                     "skewed": _skew_verdict(prof)}
    expect(legs["plain"]["skewed"], "plain hot-key join must show skew")
    # salted: same result, hot key spread over 16 reducers
    t0 = time.perf_counter()
    salted = salted_join(ev, dim, "user_id")
    n_salted = salted.count()
    prof = partition_profile(salted)
    legs["salted"] = {"sec": round(time.perf_counter() - t0, 2), **prof,
                      "skewed": _skew_verdict(prof)}
    expect(not legs["salted"]["skewed"], "salted join must flatten the skew")
    expect(n_salted == n_plain, "salted join must be result-identical")
    # AQE skew split: runtime repair of the SAME plain plan (thresholds
    # lowered so the toy-scale hot partition qualifies; at 100 TB the
    # defaults fire on real bytes)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    t0 = time.perf_counter()
    aqe = ev.join(dim.hint("merge"), "user_id")
    n_aqe = aqe.count()
    prof = partition_profile(aqe)
    legs["aqe_skew_split"] = {"sec": round(time.perf_counter() - t0, 2), **prof,
                              "skewed": _skew_verdict(prof)}
    expect(not legs["aqe_skew_split"]["skewed"], "AQE skew split must flatten")
    expect(n_aqe == n_plain, "AQE join must be result-identical")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    _emit({"check": "hot_key_join", "rows": n_plain, "legs": legs})

    # ---- 2b. salted_agg == plain agg on the zipf key --------------------
    from ubdc_airbnb_spark.operators.skew import count_agg, salted_agg, sum_agg

    plain_agg = {
        r.user_id: (r.n, round(r.v, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    salted = {
        r.user_id: (r.n, round(r.v, 6))
        for r in salted_agg(
            ev, ["user_id"], F.col("event_id").cast("string"),
            [count_agg("n"), sum_agg("value", "v")],
        ).collect()
    }
    expect(salted == plain_agg, "salted_agg must equal plain agg")
    _emit({"check": "salted_agg_equality", "n_keys": len(plain_agg),
           "hot_key_rows": plain_agg[0][0], "equal": salted == plain_agg})

    # ---- 3. dedup caps truncate the viral clusters ----------------------
    from ubdc_airbnb_spark.operators import dedup

    # pre-cap bucket occupancy: the evidence the hot bucket EXISTS
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", 16, 3, "word")
    banded = dedup.banded_signatures(sigs, "doc_id", 16, 4)
    occ = (
        banded.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"),
             F.sum(F.when(F.col("n") > 500, 1).otherwise(0)).alias("over_500"))
        .first()
    )
    _emit({"check": "band_bucket_occupancy", "max_bucket_members": occ.mx,
           "buckets_over_500": occ.over_500})
    expect(occ.mx >= N_BOILER, "boilerplate cluster must concentrate a band bucket")

    t0 = time.perf_counter()
    n_uncapped = dedup.minhash_lsh_pairs(docs, "doc_id", "text", 16, 4).count()
    sec_uncapped = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    capped_df = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", 16, 4, max_bucket=500, max_group=100
    )
    n_capped = capped_df.count()
    sec_capped = round(time.perf_counter() - t0, 2)
    prof = partition_profile(capped_df)
    _emit({"check": "minhash_caps", "uncapped_pairs": n_uncapped,
           "capped_pairs": n_capped, "truncated": n_uncapped - n_capped,
           "sec_uncapped": sec_uncapped, "sec_capped": sec_capped, **prof,
           "skewed": _skew_verdict(prof)})
    # the boilerplate cluster alone is B(B-1)/2 pairs; capping must
    # remove at least that mass
    expect(n_uncapped - n_capped >= N_BOILER * (N_BOILER - 1) // 2,
           "caps must truncate the viral clusters")

    t0 = time.perf_counter()
    n_jac = dedup.lsh_jaccard_pairs(
        docs, "doc_id", "text", 16, 4, 3, 0.3, max_group=100, max_bucket=500
    ).count()
    _emit({"check": "jaccard_caps", "capped_pairs": n_jac,
           "sec": round(time.perf_counter() - t0, 2)})
    expect(n_jac <= n_capped, "jaccard verify only filters candidates")

    # the capped mass is recovered by the O(B) exact pass
    t0 = time.perf_counter()
    ex = {
        (r.keep_id, r.n_docs)
        for r in dedup.exact_duplicates(docs, "doc_id", "text")
        .filter(F.col("n_docs") >= 100).collect()
    }
    _emit({"check": "exact_recovery", "clusters": sorted(ex),
           "sec": round(time.perf_counter() - t0, 2)})
    expect(any(n == N_BOILER for _, n in ex),
           "exact_duplicates must recover the capped boilerplate cluster")

    # ---- 4. components: giant cluster + 100k chain, pointer-jump bound -
    from ubdc_airbnb_spark.operators.graph import connected_components

    rounds: list[tuple[int, int, float]] = []
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", 16, 4)
    t0 = time.perf_counter()
    comp = connected_components(
        pairs, docs.select("doc_id"), id_col="doc_id",
        on_round=lambda r, ch, w: rounds.append((r, ch, round(w, 2))),
    )
    giant = (
        comp.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n")).first()[0]
    )
    _emit({"check": "components_giant_cluster",
           "sec": round(time.perf_counter() - t0, 2),
           "rounds": len(rounds), "round_log": rounds, "giant_component": giant})
    expect(len(rounds) <= 8, "giant-cluster components must converge fast")
    expect(giant >= N_BOILER, "the boilerplate cluster must form one component")

    chain_n = 100_000
    chain_edges = spark.range(chain_n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    rounds2: list[tuple[int, int, float]] = []
    t0 = time.perf_counter()
    ccomp = connected_components(
        chain_edges, spark.range(chain_n).withColumnRenamed("id", "node"),
        id_col="node",
        on_round=lambda r, ch, w: rounds2.append((r, ch, round(w, 2))),
    )
    one = ccomp.select("component").distinct().count()
    _emit({"check": "components_chain_100k",
           "sec": round(time.perf_counter() - t0, 2),
           "rounds": len(rounds2), "round_log": rounds2, "components": one})
    expect(one == 1, "chain must collapse to one component")
    expect(len(rounds2) <= 25, "100k chain must stay inside the jump bound")

    # ---- 5. embedding near-dup bucket cap (member-weighted) ------------
    from ubdc_airbnb_spark.operators.similarity import rp_lsh_pairs

    # 32 planes / 4 bands = 8-bit band keys (256 buckets per band): the
    # base corpus spreads to ~90 members per bucket while the dense
    # cluster still concentrates ONE (2,086 members) — so the cap has to
    # be SELECTIVE, truncating the viral bucket while the base corpus's
    # pairs survive (a 4-bit key space would overfill every bucket on a
    # replica corpus and make the cap look like `return empty`)
    t0 = time.perf_counter()
    n_eun = rp_lsh_pairs(emb, num_planes=32, bands=4, threshold=0.99).count()
    sec_eun = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ecap_df = rp_lsh_pairs(emb, num_planes=32, bands=4, threshold=0.99,
                           max_bucket=500)
    n_ecap = ecap_df.count()
    sec_ecap = round(time.perf_counter() - t0, 2)
    dense_pairs = (N_DENSE_VALS * DENSE_COPIES) * (N_DENSE_VALS * DENSE_COPIES - 1) // 2
    _emit({"check": "rp_lsh_bucket_cap", "uncapped_pairs": n_eun,
           "capped_pairs": n_ecap, "truncated": n_eun - n_ecap,
           "sec_uncapped": sec_eun, "sec_capped": sec_ecap,
           "dense_cluster_pairs": dense_pairs})
    expect(n_eun - n_ecap >= dense_pairs * 0.9,
           "member-weighted bucket cap must truncate the dense cluster")
    expect(n_ecap > 0, "the cap must be selective, not a blanket drop")

    run_index_probes(spark, args.out, docs, emb, expect, partition_profile)
    run_streaming_folds(spark, args.out, docs, emb, expect)
    run_curation_funnel(spark, args.out, docs, expect)

    _emit({"verdict": "FAIL" if failures else "PASS", "failures": failures})
    return 1 if failures else 0


def run_index_probes(spark, out, docs, emb, expect, partition_profile) -> None:
    # ---- 6. skewed-index PROBE paths (r10, VERDICT item 3) --------------
    # The zipfian corpus exercised the BUILD-side machinery; the serving
    # paths were untested under skew: a hot term bucket in the BM25
    # index (a stopword-like posting list), a hot IVF centroid (the
    # dense embedding cluster), and a hot LSH band bucket at query time.
    # Each probe is machine-adjudicated: either the hot-partition cost
    # is BOUNDED by construction (pruning + a partial top-k/TakeOrdered
    # tail) or a cap repairs it; walls and scan profiles are recorded
    # against a uniform control.
    import shutil

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.ann_index import build_ivf_index, query_ivf_index
    from ubdc_airbnb_spark.operators.dedup_index import (
        build_lsh_index,
        query_lsh_index,
    )
    from ubdc_airbnb_spark.operators.tfidf import build_bm25_index, query_bm25_index

    idx_root = os.path.join(out, "indexes")
    shutil.rmtree(idx_root, ignore_errors=True)

    # -- 6a. BM25: the boilerplate terms are stopword-like (df >= N_BOILER)
    bm25 = os.path.join(idx_root, "bm25")
    t0 = time.perf_counter()
    build_bm25_index(docs, bm25, n_buckets=64)
    sec_b = round(time.perf_counter() - t0, 2)
    hot_terms = ["javascript", "browser", "blocking"]
    postings = spark.read.parquet(os.path.join(bm25, "postings"))
    total_rows = postings.count()
    dfs = {
        r.term: r.n
        for r in postings.filter(F.col("term").isin(hot_terms))
        .groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # uniform control: 3 lowest-df base-corpus terms (replica corpora
    # multiply every df by the factor, so no fixed band is portable —
    # take the quietest terms that still hit >= 2 docs)
    cold_terms = [
        r.term
        for r in postings.filter(~F.col("term").isin(hot_terms))
        .groupBy("term").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .orderBy("n", "term").limit(3).collect()
    ]
    t0 = time.perf_counter()
    hot_hits = query_bm25_index(spark, bm25, hot_terms, k=10).collect()
    sec_hot = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    cold_hits = query_bm25_index(spark, bm25, cold_terms, k=10).collect()
    sec_cold = round(time.perf_counter() - t0, 2)
    # the hot probe's scan is bounded by the probed buckets' postings,
    # never the corpus: measure the pruned slice it actually reads
    from ubdc_airbnb_spark.operators.tfidf import _py_term_bucket

    hb = sorted({_py_term_bucket(t, 64) for t in hot_terms})
    hot_slice = postings.filter(
        F.col("term_bucket").isin(hb) & F.col("term").isin(hot_terms)
    )
    slice_rows = hot_slice.count()
    plan = (
        query_bm25_index(spark, bm25, hot_terms, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    _emit({"check": "bm25_hot_term_probe", "sec_build": sec_b,
           "hot_term_dfs": dfs, "cold_terms": cold_terms,
           "sec_hot": sec_hot, "sec_cold": sec_cold,
           "hot_slice_rows": slice_rows, "total_postings_rows": total_rows,
           "scan_profile": partition_profile(hot_slice),
           "bounded_tail": "TakeOrderedAndProject" in plan})
    expect(max(dfs.values() or [0]) >= N_BOILER,
           "boilerplate terms must form a hot posting list")
    expect(len(hot_hits) == 10 and len(cold_hits) >= 1,
           "BM25 probes must return rows (hot: full k)")
    expect(slice_rows < total_rows * 0.5,
           "bucket pruning must bound the hot probe's scan")
    expect("TakeOrderedAndProject" in plan,
           "BM25 tail must stay top-k-bounded (agg -> TakeOrdered)")

    # -- 6b. IVF: the dense cluster concentrates one centroid cell
    ivf = os.path.join(idx_root, "ivf")
    t0 = time.perf_counter()
    build_ivf_index(emb, ivf, k=32, iters=2)
    sec_b = round(time.perf_counter() - t0, 2)
    assigned = spark.read.parquet(os.path.join(ivf, "assignments"))
    cells = assigned.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n"))
    hot_cell = cells.orderBy(F.desc("n")).first()
    n_dense = N_DENSE_VALS * DENSE_COPIES
    max_vid_base = (
        emb.filter(F.col("label") != 999).agg(F.max("vec_id")).first()[0]
    )
    hot_q = emb.filter(F.col("vec_id") == max_vid_base + 1)  # a dense vector
    cold_q = emb.filter(F.col("vec_id") == 42)               # a base vector
    t0 = time.perf_counter()
    hot_nn = query_ivf_index(spark, ivf, hot_q, k=10, probes=1).collect()
    sec_hot = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    cold_nn = query_ivf_index(spark, ivf, cold_q, k=10, probes=1).collect()
    sec_cold = round(time.perf_counter() - t0, 2)
    plan = (
        query_ivf_index(spark, ivf, hot_q, k=10, probes=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the rescue that keeps the hot cell off one reducer: the rank<=k
    # filter gets a PARTIAL WindowGroupLimit per scan split, so the
    # query_id shuffle carries <= k rows per split, not the whole cell
    _emit({"check": "ivf_hot_cell_probe", "sec_build": sec_b,
           "hot_cell": [hot_cell.centroid_id, hot_cell.n],
           "dense_cluster": n_dense,
           "sec_hot": sec_hot, "sec_cold": sec_cold,
           "partial_topk": "WindowGroupLimit" in plan})
    expect(hot_cell.n >= n_dense, "dense cluster must concentrate one cell")
    expect(len(hot_nn) == 10 and len(cold_nn) == 10,
           "both IVF probes must return k rows")
    expect("WindowGroupLimit" in plan,
           "IVF rerank must carry the partial top-k rescue")

    # -- 6c. LSH: a probe batch hitting the viral band bucket
    lsh = os.path.join(idx_root, "lsh")
    t0 = time.perf_counter()
    build_lsh_index(docs, lsh, num_perm=16, bands=4, n_buckets=64)
    sec_b = round(time.perf_counter() - t0, 2)
    m2 = docs.agg(F.max("doc_id")).first()[0]
    hot_batch = spark.range(20).select(
        (F.lit(m2) + 1 + F.col("id")).alias("doc_id"),
        F.lit(BOILER_TEXT).alias("text"),
    )
    # uniform control: 20 base docs re-identified (each finds its source)
    base_batch = (
        docs.filter(F.col("doc_id") < 10_000).orderBy("doc_id").limit(20)
        .select((F.col("doc_id") + m2 + 1000).alias("doc_id"), "text")
    )
    t0 = time.perf_counter()
    n_hot_unc = query_lsh_index(spark, lsh, hot_batch).count()
    sec_hot_unc = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    capped_df = query_lsh_index(spark, lsh, hot_batch, max_bucket=500)
    n_hot_cap = capped_df.count()
    sec_hot_cap = round(time.perf_counter() - t0, 2)
    n_base_unc = query_lsh_index(spark, lsh, base_batch).count()
    n_base_cap = query_lsh_index(spark, lsh, base_batch, max_bucket=500).count()
    _emit({"check": "lsh_hot_bucket_probe", "sec_build": sec_b,
           "hot_uncapped": n_hot_unc, "hot_capped": n_hot_cap,
           "sec_hot_uncapped": sec_hot_unc, "sec_hot_capped": sec_hot_cap,
           "base_uncapped": n_base_unc, "base_capped": n_base_cap,
           "profile_capped": partition_profile(capped_df)})
    expect(n_hot_unc >= 20 * N_BOILER * 0.9,
           "uncapped hot probe must show the quadratic candidate blowup")
    expect(n_hot_cap <= n_hot_unc * 0.05,
           "probe-side max_bucket must truncate the viral bucket")
    expect(n_base_cap == n_base_unc and n_base_cap >= 20,
           "the probe cap must be selective (small buckets untouched)")




def run_streaming_folds(spark, out, docs, emb, expect) -> None:
    # ---- 7. streaming maintenance under hostile ingest (r10b) -----------
    # The batch index families have skewed-PROBE evidence (section 6) and
    # small-scale equality/redelivery pytests; what nothing measured is
    # the streaming folds' AT-SCALE property: fold cost must be
    # O(micro-batch), not O(index) — a fold that re-reads or re-tokenizes
    # the accumulated index gets linearly slower as ingestion proceeds
    # and dies on a long-running stream. Each family ingests the HOSTILE
    # corpus (boilerplate stopword cluster / dense embedding cluster) in
    # M staged availableNow micro-batches on ONE persistent checkpoint,
    # timing every fold; the machine check is late-batch wall ~= early-
    # batch wall. BM25 additionally closes the loop e2e: mid-stream
    # compaction, then more folds, then score equality against a
    # from-scratch batch build of the same corpus.
    import shutil

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.ann_index import build_ivf_index, query_ivf_index
    from ubdc_airbnb_spark.operators.dedup_index import build_lsh_index, query_lsh_index
    from ubdc_airbnb_spark.operators.tfidf import (
        build_bm25_index,
        compact_bm25_index,
        query_bm25_index,
    )
    from ubdc_airbnb_spark.streaming import jobs

    M = 8
    root = os.path.join(out, "stream_smoke")
    shutil.rmtree(root, ignore_errors=True)

    def _flat(walls: list[float]) -> bool:
        early = sorted(walls[:3])[1]  # median of first 3
        late = sum(walls[-3:]) / 3
        return late <= 2.5 * max(early, 0.5)

    def _staged_ingest(frames, src, idx, ckpt, fold) -> list[float]:
        walls = []
        schema = frames[0].schema
        for batch in frames:
            batch.coalesce(1).write.mode("append").parquet(src)
            stream = spark.readStream.schema(schema).parquet(src)
            t0 = time.perf_counter()
            fold(stream, idx, ckpt)
            walls.append(round(time.perf_counter() - t0, 2))
        return walls

    # -- 7a. BM25: hot stopword terms grow across every batch ------------
    src = os.path.join(root, "bm25_src")
    idx = os.path.join(root, "bm25_idx")
    ckpt = os.path.join(root, "bm25_ckpt")
    slices = [
        docs.filter(F.pmod(F.col("doc_id"), F.lit(M)) == i) for i in range(M)
    ]
    walls = _staged_ingest(
        slices[: M - 2], src, idx, ckpt,
        lambda s, i, c: jobs.foreach_batch_bm25_append(
            s, i, n_buckets=64, checkpoint=c
        ),
    )
    # mid-stream compaction, then the remaining folds on the SAME
    # checkpoint — the single-writer lease serializes them
    n_files_before = compact_bm25_index(spark, idx)
    walls += _staged_ingest(
        slices[M - 2:], src, idx, ckpt,
        lambda s, i, c: jobs.foreach_batch_bm25_append(
            s, i, n_buckets=64, checkpoint=c
        ),
    )
    hot_terms = ["javascript", "browser", "blocking"]
    t0 = time.perf_counter()
    got = [tuple(r) for r in query_bm25_index(spark, idx, hot_terms, k=10).collect()]
    sec_hot = round(time.perf_counter() - t0, 2)
    control = os.path.join(root, "bm25_control")
    build_bm25_index(docs, control, n_buckets=64)
    want = [tuple(r) for r in query_bm25_index(spark, control, hot_terms, k=10).collect()]
    _emit({"check": "stream_bm25_fold", "batches": len(walls),
           "fold_walls": walls, "compacted_files": n_files_before,
           "sec_hot_probe": sec_hot, "rows": len(got),
           "matches_batch_build": got == want})
    expect(_flat(walls), "bm25 fold wall must stay flat as the index grows")
    expect(got == want and len(got) > 0,
           "streamed+compacted bm25 must score exactly like a batch build")

    # -- 7b. IVF: the dense cluster floods one centroid cell -------------
    src = os.path.join(root, "ivf_src")
    idx = os.path.join(root, "ivf_idx")
    ckpt = os.path.join(root, "ivf_ckpt")
    is_dense = F.col("label") == 999
    base = emb.filter(~is_dense).select("vec_id", "embedding")
    rest = emb.filter(is_dense).select("vec_id", "embedding")
    seed = base.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    build_ivf_index(seed, idx, k=16, iters=2, streaming=True)
    stream_side = base.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1).unionByName(rest)
    # hash-spread: the stream side holds only ODD base ids, so
    # pmod(vec_id, M) would leave even residues dense-only and make
    # batch sizes oscillate 10x — the flat-wall check needs equal batches
    frames = [
        stream_side.filter(
            F.pmod(F.xxhash64(F.col("vec_id"), F.lit("b")), F.lit(M)) == i
        )
        for i in range(M)
    ]
    walls = _staged_ingest(
        frames, src, idx, ckpt,
        lambda s, i, c: jobs.foreach_batch_ivf_append(s, i, checkpoint=c),
    )
    hot_q = rest.limit(5)
    t0 = time.perf_counter()
    n_hot = query_ivf_index(spark, idx, hot_q, k=5, probes=1).count()
    sec_hot = round(time.perf_counter() - t0, 2)
    _emit({"check": "stream_ivf_fold", "batches": len(walls),
           "fold_walls": walls, "hot_cell_rows": n_hot,
           "sec_hot_probe": sec_hot})
    expect(_flat(walls), "ivf fold wall must stay flat as the index grows")
    expect(n_hot == 25, "hot-cell probe must return exactly k per query")

    # -- 7c. LSH: every boilerplate doc lands in the same viral buckets --
    src = os.path.join(root, "lsh_src")
    idx = os.path.join(root, "lsh_idx")
    ckpt = os.path.join(root, "lsh_ckpt")
    seed_docs = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    build_lsh_index(seed_docs, idx, streaming=True)
    stream_docs = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    frames = [
        stream_docs.filter(F.pmod(F.col("doc_id"), F.lit(2 * M)) == 2 * i + 1)
        for i in range(M)
    ]
    walls = _staged_ingest(
        frames, src, idx, ckpt,
        lambda s, i, c: jobs.foreach_batch_lsh_append(s, i, checkpoint=c),
    )
    hot_batch = (
        spark.range(20)
        .select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.lit(BOILER_TEXT).alias("text"),
        )
    )
    t0 = time.perf_counter()
    n_unc = query_lsh_index(spark, idx, hot_batch).count()
    sec_unc = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_cap = query_lsh_index(spark, idx, hot_batch, max_bucket=500).count()
    sec_cap = round(time.perf_counter() - t0, 2)
    _emit({"check": "stream_lsh_fold", "batches": len(walls),
           "fold_walls": walls, "hot_uncapped": n_unc, "hot_capped": n_cap,
           "sec_hot_uncapped": sec_unc, "sec_hot_capped": sec_cap})
    expect(_flat(walls), "lsh fold wall must stay flat as the index grows")
    expect(n_unc > 20 * 1000,
           "uncapped viral-bucket probe must show the candidate blowup "
           "on the STREAMED index")
    expect(n_cap <= n_unc * 0.05,
           "probe-side max_bucket must hold on the streamed layout")

def run_curation_funnel(spark, out, docs, expect) -> None:
    # ---- 8. composed curation funnel on the hostile corpus (r10b) -------
    # Every adversarial check so far is per-operator; the composed
    # curation plan (NS40) had e2e profiles only on uniform replicas.
    # The hostile corpus is exactly what the funnel's STAGE ORDER is
    # designed for: quality/cap/exact-dedup run FIRST, so the 3,500-copy
    # boilerplate cluster is collapsed to one doc before the banded
    # near-dup stage (quadratic in cluster size) ever sees it, and the
    # 1,200-doc shared-prefix family is what near-dup then removes.
    # Machine checks are semantic (survivor counts), not walls.
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.prefixsum import release_pins
    from ubdc_airbnb_spark.plans.curation import run_curation

    max_id = docs.agg(F.max("doc_id")).first()[0]
    orig_limit = (int(max_id) + 1) // 10  # the sf1 replica's i=0 id range
    eval_docs = docs.filter(
        (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < orig_limit)
    ).select("doc_id", "text")
    t0 = time.perf_counter()
    res = run_curation(
        spark, docs, eval_docs=eval_docs,
        min_tokens=10, min_quality=0.3, max_per_source=10**9,
    )
    corpus = res.corpus.cache()
    n_out = corpus.count()
    sec = round(time.perf_counter() - t0, 2)
    n_boiler = corpus.filter(F.col("text") == BOILER_TEXT).count()
    n_hot = corpus.filter(F.col("text").startswith(HOT_PREFIX)).count()
    corpus.unpersist()
    release_pins()
    _emit({"check": "curation_funnel_hostile", "sec": sec,
           "rows_out": n_out, "report": res.report,
           "stage_seconds": res.stage_seconds,
           "boiler_survivors": n_boiler, "hot_family_survivors": n_hot})
    expect(n_boiler <= 1,
           "exact dedup inside the funnel must collapse the boilerplate "
           "cluster to at most one survivor")
    expect(n_hot <= N_HOT * 0.05,
           "near-dup inside the funnel must collapse the shared-prefix "
           "family (>=95%)")
    expect(n_out > 0, "the funnel must not empty the corpus")
    # the stage ORDER is the scale defence: by the time the banded
    # near-dup stage runs, exact dedup has already removed the viral
    # exact cluster, so its input is the deduped corpus, not raw
    expect(res.report["exact_dedup"] <= res.report["source_cap"] - (N_BOILER - 1),
           "exact dedup must run before near-dup and remove the cluster")



if __name__ == "__main__":
    sys.exit(main())
