"""Deterministic sampling / dataset splitting (north-star): the ops a
training-data pipeline runs constantly — consistent subsampling and
train/val/test assignment — done by content hash, not RNG.

Why hash, not ``rand()``: the assignment must be (a) reproducible across
runs and engines, (b) stable under repartitioning/retries, (c) consistent
for the same key everywhere (a document keeps its split forever, even
when the corpus is re-ingested). ``md5_long`` over the key gives all
three and replays exactly in the DuckDB oracle.

Everything is a narrow select + filter: no shuffle, no state, pushes
down past column pruning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: hash-space modulus: ppm granularity for fractions
_M = 1_000_000


def hash_bucket(col: str | Column, salt: str = "sample") -> Column:
    """Uniform bucket in [0, 1e6) from the key's salted md5."""
    return md5_long(col, salt=salt) % _M


def hash_sample(
    df: DataFrame, col: str | Column, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — the same keys
    survive on every run, engine, and partitioning."""
    return df.filter(hash_bucket(col, salt) < int(fraction * _M))


def split_label(
    col: str | Column,
    weights: Sequence[tuple[str, float]] = (("train", 0.98), ("val", 0.01), ("test", 0.01)),
    salt: str = "split",
) -> Column:
    """Train/val/test label by cumulative hash-bucket boundaries.
    Weights need not sum to 1 — the remainder is labeled NULL (held
    out)."""
    bucket = hash_bucket(col, salt)
    expr = None
    edge = 0
    for name, w in weights:
        edge += int(w * _M)
        cond = bucket < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(F.lit(None))


def split(
    df: DataFrame,
    col: str | Column,
    weights: Sequence[tuple[str, float]] = (("train", 0.98), ("val", 0.01), ("test", 0.01)),
    salt: str = "split",
    label_col: str = "split",
) -> DataFrame:
    return df.withColumn(label_col, split_label(col, weights, salt))


def upsample(
    df: DataFrame,
    weight_col: Column,
    key: Column | str,
    salt: str = "epoch",
) -> DataFrame:
    """Fractional epoch upsampling — the data-mixing step that feeds
    high-quality sources to training more than once per epoch: weight
    2.5 means every row appears twice and, deterministically by content
    hash, half the rows a third time. ``explode(sequence(1, n_copies))``
    is a narrow per-row expansion (no shuffle, no RNG); the emitted
    ``copy_id`` keeps downstream shuffling/packing stable. Weights < 1
    degenerate to plain hash subsampling.

    The fractional ppm threshold is ``round()``ed explicitly before the
    long cast: Spark's double→long cast truncates while DuckDB's rounds,
    so an unrounded 0.7 → 699999.99... would diverge by one hash bucket
    between engines (ADVICE r2) — the oracle SQL rounds identically."""
    whole = F.floor(weight_col).cast("long")
    frac = weight_col - whole
    extra = (hash_bucket(key, salt) < F.round(frac * _M).cast("long")).cast("long")
    n_copies = (whole + extra).alias("__n")
    out = df.withColumn("__n", n_copies).filter(F.col("__n") > 0)
    return out.withColumn(
        "copy_id", F.explode(F.sequence(F.lit(1).cast("long"), F.col("__n")))
    ).drop("__n")


def stratified_sample_exact(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Column | str,
    k: int,
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group, chosen by salted key
    hash — the deterministic version of per-stratum subsampling (eval-set
    carving, per-source caps). A hash-ordered ``row_number`` PARTITIONED
    by the group is one shuffle on the group key and skew-splits under
    AQE; no global window, no RNG. The same keys win on every run and
    engine (the oracle replays the identical hash order)."""
    from pyspark.sql import Window

    kc = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(*group_cols).orderBy(
        md5_long(kc.cast("string"), salt=salt), kc.cast("string")
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def deterministic_shuffle(
    df: DataFrame,
    key: Column | str,
    n_shards: int,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    (shard, position) from its salted content hash — the write-side of
    'shuffle the corpus once per epoch' that distributed trainers need
    (each worker reads its shard sequentially; order is reproducible
    across runs, engines, and repartitioning, unlike ``ORDER BY rand()``).

    shard = hash mod n_shards (uniform); position = hash-ordered
    row_number WITHIN the shard — a window partitioned by shard, so the
    sort is n_shards-way parallel and no single-partition Exchange
    appears (the global-window trap ``prefixsum`` exists to avoid isn't
    needed here: training order only has to be contiguous per shard)."""
    from pyspark.sql import Window

    kc = F.col(key) if isinstance(key, str) else key
    h = md5_long(kc.cast("string"), salt=salt)
    w = Window.partitionBy("shard").orderBy("__h", kc.cast("string"))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("long"))
        .withColumn("position", (F.row_number().over(w) - 1).cast("long"))
        .drop("__h")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    id_col: str,
    target_fraction: float = 0.5,
    salt: str = "tempmix",
) -> DataFrame:
    """Temperature-resampled corpus mix (the mBERT/XLM α-sampling trick
    at α = 0.5): groups are sampled with probability proportional to
    √n_g instead of n_g, boosting small sources and damping huge ones —
    the standard fix for a corpus where one crawl dominates.

        rate_g = min(1, target_fraction·N·√n_g / (n_g · Σ_h √n_h))

    which sums to target_fraction·N expected rows across groups.

    α is FIXED at 0.5 deliberately: pow(x, 0.5) is IEEE-exact sqrt, so
    every rate is a deterministic double of exact integer operands and
    the oracle replays it bit-for-bit; arbitrary α needs exp/ln (libm,
    ulp-divergent across engines). Rates quantize to integer ppm and
    select by salted-hash bucket — the same deterministic device as
    `sample_fraction`, so the pick is stable across runs/partitionings.

    One count aggregate (group-sized), rates broadcast back, narrow
    filter. Output: the sampled rows + their group's rate_ppm."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    # Σ√n as an integer-ppb sum: each √n quantizes to floor(√n·1e9)
    # before summing, so the total is exact int64 arithmetic — a raw
    # double sum would depend on partition/engine combine order at the
    # last ulp, which floor-ppm rate boundaries would amplify
    tot = counts.agg(
        F.sum("__n").alias("__total"),
        F.sum(
            F.floor(F.sqrt(F.col("__n").cast("double")) * F.lit(1e9)).cast("long")
        ).alias("__sumsqrt_ppb"),
    )
    rates = counts.join(F.broadcast(tot)).select(
        group_col,
        F.least(
            F.lit(_M).cast("long"),
            F.floor(
                F.lit(float(target_fraction))
                * F.col("__total").cast("double")
                * F.sqrt(F.col("__n").cast("double"))
                / (F.col("__n").cast("double") * (F.col("__sumsqrt_ppb").cast("double") / F.lit(1e9)))
                * F.lit(float(_M))
            ).cast("long"),
        ).alias("rate_ppm"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_bucket(F.col(id_col).cast("string"), salt) < F.col("rate_ppm"))
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    n: int,
) -> DataFrame:
    """Domain/source balancing by hard cap: keep at most ``n`` rows per
    group, chosen deterministically by ``order_col`` — the "max pages
    per domain" rule every web-corpus pipeline applies so no single
    domain dominates the training mix (C4 and its descendants cap
    per-URL-host contributions).

    Scale shape: ONE group-keyed window (row_number ordered by the tie-
    free ``order_col``); group cardinality is domain-count-sized so the
    partitionBy key is high-cardinality and near-uniform — no global
    window, no broadcast. Skewed mega-domains are exactly the rows the
    cap discards, and AQE's skew split handles the window shuffle for
    them.

    Output: the input rows that survive the cap, all columns unchanged.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def mixture_rates(
    df: DataFrame,
    group_cols: Sequence[str],
    budget: int,
) -> DataFrame:
    """Static mixture-allocation planner: given a row ``budget`` to be
    split UNIFORMLY across the observed (group_cols) cells, report per
    cell the quota, the sampling rate to hit it, and the expected kept
    rows — the planning table a DoReMi-style reweighting or a fixed
    corpus-mix spec compiles down to before `hash_sample` executes it.

    All quantities are exact integer arithmetic (quota = budget div
    n_cells; expected = min(n_rows, quota)) except the rate, one IEEE
    division — any engine replays the table bit-for-bit.

    Scale shape: one map-side-combinable groupBy on the (small) cell key
    space; the cell-count scalar broadcasts. The corpus is scanned once.

    Output: (*group_cols, n_rows, quota, rate, expected).
    """
    cells = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    k = cells.agg(F.count(F.lit(1)).alias("n_cells"))
    return (
        cells.crossJoin(F.broadcast(k))
        .select(
            *group_cols,
            "n_rows",
            F.floor(F.lit(budget) / F.col("n_cells")).cast("long").alias("quota"),
        )
        .select(
            *group_cols,
            "n_rows",
            "quota",
            F.least(
                F.lit(1.0), F.col("quota").cast("double") / F.col("n_rows").cast("double")
            ).alias("rate"),
            F.least(F.col("n_rows"), F.col("quota")).alias("expected"),
        )
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    m: int = 4,
    buckets: int = 1024,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic pseudo-random negative sampling (the contrastive-
    training companion of the hash split): every anchor row draws ``m``
    negatives by hashing (anchor, k) to a corpus bucket and taking that
    bucket's first candidate in salted-hash order — reproducible across
    runs/engines/partitionings, with no RNG state and no driver-side
    index (a dense-id assumption or a zipWithIndex would both break at
    100 TB).

    Scale shape: candidates carry a ``buckets``-sized hash bucket
    (narrow); probes equi-join on the bucket key (hash-partitioned,
    near-uniform); the per-(anchor, k) election is a keyed window over
    ~N/buckets candidates — size ``buckets`` to corpus scale to bound
    it. Self-matches are excluded before the election.

    Output: (anchor_id, k, neg_id); an (anchor, k) whose bucket holds
    no other candidate is absent (draw with a different salt).
    """
    from pyspark.sql import Window

    from ..functions.hashing import md5_long

    ids = F.col(id_col).cast("string")
    cands = df.select(
        F.col(id_col).alias("cand_id"),
        (md5_long(ids, salt) % buckets).alias("b"),
        md5_long(ids, salt + "#ord").alias("ord"),
    )
    probes = df.select(F.col(id_col).alias("anchor_id")).select(
        "anchor_id", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("k")
    ).withColumn(
        "b",
        md5_long(
            F.concat(F.col("anchor_id").cast("string"), F.lit("#"), F.col("k")),
            salt,
        )
        % buckets,
    )
    w = Window.partitionBy("anchor_id", "k").orderBy("ord", "cand_id")
    return (
        probes.join(cands, "b")
        .filter(F.col("cand_id") != F.col("anchor_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("k").cast("long").alias("k"),
            F.col("cand_id").alias("neg_id"),
        )
    )


def apply_mixture(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    budget: int,
    salt: str = "mix",
) -> DataFrame:
    """Execute a ``mixture_rates`` plan: deterministically sample each
    (group_cols) cell at its planned rate by salted content hash — the
    planner's quota table compiled down to one broadcast join + a narrow
    ppm-threshold filter, the same device as ``hash_sample`` so the kept
    set is stable across runs/engines/partitionings.

    The per-cell ppm threshold is ``floor(rate·1e6)`` of the planner's
    exact rate, so expected kept ≈ quota with hash-uniform drift only.

    Output: the sampled rows, all columns unchanged.
    """
    return apply_rates(df, mixture_rates(df, group_cols, budget), group_cols, key_col, salt)


def apply_rates(
    df: DataFrame,
    rates: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Execute ANY planned per-cell rate table (a ``rate`` column in
    [0, 1] keyed by ``group_cols`` — uniform row quotas, token-budget
    plans, DoReMi-style reweightings, hand-written specs): broadcast the
    rates, keep rows whose salted content hash lands under the cell's
    ``floor(rate·1e6)`` ppm threshold. One broadcast join + a narrow
    filter; the kept set is a pure function of (key, salt, rates), so
    re-planning only changes cells whose rates actually moved.
    """
    from ..functions.hashing import md5_long

    r = rates.select(
        *group_cols,
        F.floor(F.col("rate") * F.lit(1e6)).cast("long").alias("__ppm"),
    )
    key = F.col(key_col).cast("string")
    return (
        df.join(F.broadcast(r), list(group_cols))
        .filter((md5_long(key, salt) % 1_000_000) < F.col("__ppm"))
        .drop("__ppm")
    )


def split_leakage_report(
    df: DataFrame,
    key_col: str,
    text_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.98),
        ("val", 0.01),
        ("test", 0.01),
    ),
    salt: str = "split",
) -> DataFrame:
    """Cross-split duplicate-leakage audit — the eval-integrity check a
    training pipeline runs before trusting held-out metrics: exact-dup
    groups (content digest) whose members land in DIFFERENT splits leak
    test data into train. Compares two assignment modes side by side:

    - ``by_doc``   — hash the document id (the naive split): any dup
      group straddling a boundary leaks;
    - ``by_content`` — hash the dup-group key itself (the fix): every
      copy of a text gets the same label, leakage is structurally zero —
      computed here, not assumed, so the audit also catches a broken
      labeler.

    Scale shape: one digest-keyed map-side-combinable groupBy over the
    corpus, then a two-row fold of the (small) group table. The same
    audit generalizes to near-dup groups by swapping the digest for a
    MinHash/SimHash cluster id.

    Output: (mode, n_groups, n_dup_groups, leaked_groups,
    docs_in_leaked) — one row per mode.
    """
    dg = F.md5(F.col(text_col))
    return _leakage_modes(
        df, dg, F.col(key_col).cast("string"), weights, salt, "by_doc", "by_content"
    )


def _leakage_modes(
    df: DataFrame,
    group_expr: Column,
    key_expr: Column,
    weights: Sequence[tuple[str, float]],
    salt: str,
    key_mode: str,
    group_mode: str,
) -> DataFrame:
    """Shared leakage fold: label every row by (hash of key) and (hash of
    its group id), count groups straddling splits under each, emit one
    report row per mode."""
    lab = df.select(
        group_expr.alias("__g"),
        split_label(key_expr, weights, salt).alias("__by_key"),
        split_label(group_expr.cast("string"), weights, salt).alias("__by_group"),
    )
    groups = lab.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__by_key").alias("nd"),
        F.countDistinct("__by_group").alias("nc"),
    )

    def mode_row(mode: str, nsplits: str) -> DataFrame:
        agg = groups.agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_groups"),
            F.sum(F.when(F.col(nsplits) > 1, 1).otherwise(0))
            .cast("long")
            .alias("leaked_groups"),
            F.sum(F.when(F.col(nsplits) > 1, F.col("n_docs")).otherwise(0))
            .cast("long")
            .alias("docs_in_leaked"),
        )
        return agg.select(F.lit(mode).alias("mode"), "*")

    return mode_row(key_mode, "nd").unionByName(mode_row(group_mode, "nc"))


def group_leakage_counts(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.98),
        ("val", 0.01),
        ("test", 0.01),
    ),
    salt: str = "split",
    key_mode: str = "by_doc",
    group_mode: str = "by_cluster",
) -> DataFrame:
    """The leakage audit for an ARBITRARY grouping — the near-dup
    generalization `split_leakage_report` promises: pass (doc_id,
    cluster_id) rows from connected components over MinHash/SimHash
    pairs and the report shows how many NEAR-dup clusters a by-doc hash
    split tears across train/test vs hashing the cluster id (which is
    leak-free by construction, and verified rather than assumed).

    Same scale shape as the exact audit: one group-keyed map-side
    combinable groupBy, a two-row fold.
    """
    return _leakage_modes(
        df,
        F.col(group_col),
        F.col(key_col).cast("string"),
        weights,
        salt,
        key_mode,
        group_mode,
    )


def mixture_rates_by_tokens(
    df: DataFrame,
    group_cols: Sequence[str],
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Token-budget mixture planner — the unit real training mixes are
    specified in: split a TOKEN budget uniformly across the observed
    cells and derive each cell's row-sampling rate from its token mass
    (``mixture_rates`` plans in rows; this plans in tokens, so a cell of
    few huge documents gets a proportionally lower row rate).

        quota_g  = budget div n_cells          (tokens)
        rate_g   = min(1, quota_g / tokens_g)  (the one IEEE division)
        expected = min(tokens_g, quota_g)      (tokens, exact)

    Same exact-integer shape as ``mixture_rates``: one map-side
    combinable groupBy over the cell keys, broadcast scalar, any engine
    replays the table bit-for-bit. Execute with ``apply_mixture``'s
    broadcast + hash-threshold device (rates are rates, whatever the
    unit they were planned in).

    Output: (*group_cols, tokens, quota, rate, expected).
    """
    cells = df.groupBy(*group_cols).agg(F.sum(F.col(weight_col)).alias("tokens"))
    k = cells.agg(F.count(F.lit(1)).alias("n_cells"))
    return (
        cells.crossJoin(F.broadcast(k))
        .select(
            *group_cols,
            "tokens",
            F.floor(F.lit(budget) / F.col("n_cells")).cast("long").alias("quota"),
        )
        .select(
            *group_cols,
            "tokens",
            "quota",
            F.least(
                F.lit(1.0),
                F.col("quota").cast("double") / F.col("tokens").cast("double"),
            ).alias("rate"),
            F.least(F.col("tokens"), F.col("quota")).alias("expected"),
        )
    )
