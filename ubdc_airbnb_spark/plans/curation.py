"""The composed corpus-curation pipeline (north-star): the full
pretraining pass a data team runs over a raw crawl, as ONE plan built
from the engine's oracle-gated operators:

  0. line cleaning      — optional C4 line-level filter (narrow,
                          rewrites text before any doc-level judgment)
  1. quality funnel     — token-count / language / quality gates
                          (narrow projection, no text shuffle)
  2.5 domain balancing  — optional per-source hard cap (one keyed
                          window)
  2. URL-level dedup    — canonical-URL keep-earliest (cheapest pass
                          first: one groupBy on a short key)
  3. exact dedup        — md5 digest keep-first
  4. near-dup dedup     — MinHash+LSH candidates → connected
                          components → canonical keep
  5. decontamination    — eval-set n-gram overlap (broadcast)
  6. split assignment   — deterministic hash train/val/test

Order matters and is the production order: each stage runs over the
survivors of the previous one, so the expensive passes (MinHash, overlap
join) see the smallest possible corpus. Every stage keeps its
row-accounting so the run report shows where documents died — the same
funnel discipline the per-stage gates (`ns_curation_funnel`,
`ns_url_canonical`, `ns_dedup_exact`, `ns_dedup_components`,
`ns_decontaminate`, `ns_consistent_split`) verify in isolation.

At 100 TB: stages 1-2 are narrow or short-key shuffles; stage 3 shuffles
digests, not text; stage 4 shuffles band buckets and component labels;
stage 5 broadcasts the (small) eval set; stage 6 is narrow. Text bodies
are shuffled at most once (stage-4 gram materialization is per-doc
local).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textstats
from ..functions.hashing import md5_long
from ..functions.urltools import canonical_url
from ..operators import chunking, dedup, sampling
from ..operators.curation import line_quality_filter, ngram_overlap
from ..operators.graph import connected_components


from dataclasses import field


@dataclass
class CurationResult:
    corpus: DataFrame          # surviving docs + split label
    report: dict[str, int]     # stage -> surviving doc count
    stage_seconds: dict[str, float] = field(default_factory=dict)


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    lang: str | None = "en",
    min_quality: float = 0.5,
    minhash_perms: int = 16,
    lsh_bands: int = 4,
    lsh_max_bucket: int | None = None,
    decontam_min_overlap: int = 5,
    source_weights: dict[str, float] | None = None,
    pack_budget: int | None = None,
    line_filter: bool = False,
    max_per_source: int | None = None,
    pin_stages: bool = True,
) -> CurationResult:
    """Run the full curation pass (module docstring). ``eval_docs``
    (id, text) enables stage 5; ``url_col`` enables stage 2. The
    report counts survivors after each stage (a driver-side count per
    stage — bounded, and exactly what the run log needs).

    ``pin_stages`` (default on) persists each stage's survivor frame
    (MEMORY_AND_DISK, spills past memory) and drops the previous
    stage's pin once the next stage materializes — without it, every
    per-stage count (and the final corpus evaluation) RE-RUNS all prior
    stages, turning the linear funnel quadratic in stage count. At most
    two stage frames are pinned at any moment; the production
    alternative for a cluster that can't cache the survivor set is a
    parquet checkpoint per stage, same lifecycle."""
    import time as _time

    from .. operators.prefixsum import _pin, unpin

    report: dict[str, int] = {}
    stage_seconds: dict[str, float] = {}
    _prev: list[DataFrame] = []

    def _materialize(df: DataFrame, name: str) -> DataFrame:
        t0 = _time.perf_counter()
        if pin_stages:
            df = _pin(df)
        report[name] = df.count()
        stage_seconds[name] = round(_time.perf_counter() - t0, 3)
        if pin_stages:
            while _prev:
                # release through unpin() so the _PINNED registry entry
                # dies with the cache — a bare unpersist() would leave a
                # dead handle that a later identical _pin returns as
                # "cached" (silent full-lineage recompute per pass)
                unpin(_prev.pop())
            _prev.append(df)
        return df

    t0 = _time.perf_counter()
    report["raw"] = docs.count()
    stage_seconds["raw"] = round(_time.perf_counter() - t0, 3)

    # 0. (optional) C4 line-level cleaning — rewrite text to surviving
    # lines BEFORE any doc-level gate judges it; emptied docs die here
    if line_filter:
        cleaned = line_quality_filter(docs, id_col=id_col, text_col=text_col)
        docs = (
            docs.drop(text_col)
            .join(
                cleaned.filter(F.col("n_kept") > 0).select(
                    F.col(id_col), F.col("clean_text").alias(text_col)
                ),
                id_col,
            )
        )
        docs = _materialize(docs, "line_filter")

    # 1. quality funnel — sequential AND of the three gates
    n_tokens = textstats.whitespace_token_count(text_col)
    kept = docs.filter((n_tokens >= min_tokens) & (n_tokens <= max_tokens))
    if lang is not None:
        kept = kept.filter(F.col("lang") == lang)
    kept = kept.filter(textstats.quality_score(text_col) >= min_quality)
    kept = _materialize(kept, "quality_funnel")

    # 2. URL-level dedup (cheapest dedup first)
    if url_col is not None:
        first = (
            kept.select(F.col(id_col), canonical_url(url_col).alias("__curl"))
            .groupBy("__curl")
            .agg(F.min(id_col).alias(id_col))
        )
        # keeper sets are survivor-scale: SHUFFLE_HASH, never broadcast
        # (the post-aggregate size estimate is unreliably small — 100x
        # audit); hashing the keeper side skips both sort passes
        kept = kept.join(first.select(id_col).hint("shuffle_hash"), id_col, "left_semi")
        kept = _materialize(kept, "url_dedup")

    # 2.5 (optional) domain balancing — hard cap per source
    if max_per_source is not None and "source" in kept.columns:
        kept = sampling.cap_per_group(kept, "source", id_col, max_per_source)
        kept = _materialize(kept, "source_cap")

    # 3. exact dedup — digest keep-first
    digest_first = (
        kept.select(F.col(id_col), F.md5(F.col(text_col)).alias("__d"))
        .groupBy("__d")
        .agg(F.min(id_col).alias(id_col))
    )
    kept = kept.join(digest_first.select(id_col).hint("shuffle_hash"), id_col, "left_semi")
    kept = _materialize(kept, "exact_dedup")

    # 4. near-dup dedup — MinHash+LSH -> components -> keep component min
    sigs = dedup.minhash_signatures(
        kept, id_col, text_col, num_perm=minhash_perms, ngram=3, shingle="word"
    )
    # exact dedup (stage 3) already collapsed identical texts, so the
    # naive banded join is the optimal shape here (the r08 digest
    # contraction would be pure overhead on a dup-free corpus); at web
    # scale pass lsh_max_bucket so a viral NEAR-dup band bucket
    # (boilerplate with distinct texts) can't go quadratic — capped
    # clusters are what stage 3 / segment dedup resolve in O(B)
    pairs = dedup.lsh_candidate_pairs(
        sigs, id_col, num_perm=minhash_perms, bands=lsh_bands,
        max_bucket=lsh_max_bucket,
    )
    comp = connected_components(pairs, kept.select(id_col), id_col=id_col)
    keepers = comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    kept = kept.join(keepers.hint("shuffle_hash"), id_col, "left_semi")
    kept = _materialize(kept, "neardup_dedup")

    # 5. decontamination — drop docs overlapping the eval set
    if eval_docs is not None:
        overlap = ngram_overlap(kept, eval_docs, id_col=id_col, text_col=text_col)
        contaminated = overlap.filter(
            F.col("n_overlap") >= decontam_min_overlap
        ).select(id_col).distinct()
        kept = kept.join(contaminated, id_col, "left_anti")
        kept = _materialize(kept, "decontaminated")

    # 6. deterministic split
    corpus = sampling.split(kept, F.col(id_col).cast("string"))

    # 7. (optional) data mixing — fractional per-source epoch weights
    if source_weights is not None:
        weight = None
        for src, wt in source_weights.items():
            cond = F.col("source") == src
            weight = F.when(cond, wt) if weight is None else weight.when(cond, wt)
        weight = weight.otherwise(F.lit(1.0))
        corpus = sampling.upsample(corpus, weight, F.col(id_col).cast("string"))
        corpus = _materialize(corpus, "mixed")

    # 8. (optional) sequence packing — pack_id/offset for training shards
    if pack_budget is not None:
        packs = chunking.sequence_pack(
            corpus.withColumn(
                "__u", F.concat_ws("#", F.col(id_col), *(
                    ["copy_id"] if "copy_id" in corpus.columns else []
                ))
            ),
            "__u",
            textstats.whitespace_token_count(text_col),
            budget=pack_budget,
            order_col="__u",
        ).withColumnRenamed("__u", "pack_key")
        corpus = (
            corpus.withColumn(
                "pack_key", F.concat_ws("#", F.col(id_col), *(
                    ["copy_id"] if "copy_id" in corpus.columns else []
                ))
            )
            .join(packs.select("pack_key", "pack_id", "pack_offset"), "pack_key")
            .drop("pack_key")
        )
        report["n_packs"] = corpus.select("pack_id").distinct().count()

    return CurationResult(corpus, report, stage_seconds)
