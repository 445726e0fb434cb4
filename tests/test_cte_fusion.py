"""r11 CTE-fusion equality: the one-parse forms of the LSH band join,
the candidate self-join and the union/verify/double-explode tails must
be plan-identical (and therefore result-identical) to the former eager
DataFrame chains they replaced.

The former chains are reconstructed inline here from the same shared SQL
fragments (`_sig_exprs`, `_band_key_terms`) the fused forms use, so this
test pins BOTH properties the fusion relies on:

- multi-reference deterministic CTEs are INLINED by Catalyst (the fused
  plan duplicates the banded/grams subtree exactly like passing the same
  DataFrame twice did, and ReusedExchange recovers it physically), and
- single-reference CTEs collapse to the same stacked Projects as eager
  selectExpr steps (the toks/hv factoring survives).

If a Spark upgrade changes either behavior (e.g. starts materializing
multi-ref CTEs), the plan-shape assertion fails loudly instead of the
bench silently timing a different plan.
"""

from __future__ import annotations

import re

import pytest

from ubdc_airbnb_spark.functions.psql import psql
from ubdc_airbnb_spark.operators.dedup import (
    _band_key_terms,
    _contracted_band_join,
    _digest_groups,
    _sig_exprs,
    lsh_candidate_pairs,
    lsh_jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
)


@pytest.fixture(scope="module")
def docs(spark):
    # duplicate mass (exact copies), near-dups (small edits) and unique
    # rows — exercises cross-group pairs, within-group self pairs and the
    # verify threshold in one corpus
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "the quick brown fox jumps over the lazy dog near the river bend",
        "a completely different document about spark physical plans",
        "yet another unrelated text mentioning parquet footers and stats",
        "short",
        "",
    ]
    rows = []
    i = 0
    for rep, t in zip((3, 2, 1, 1, 2, 2), base):
        for _ in range(rep):
            rows.append((i, t))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shape(df) -> str:
    """Executed-plan string with expression ids and plan ids normalized
    away, so two structurally identical plans compare equal."""
    s = df._jdf.queryExecution().executedPlan().toString()
    s = re.sub(r"#\d+[L]?", "#x", s)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    return s


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _explode_tail_legacy(val_pairs, *stat_cols):
    """The pre-r11 eager double-explode tail (former _explode_pairs)."""
    return (
        val_pairs.selectExpr(
            "vid_a", "vid_b", "explode(__ma) AS __ida", "__mb", *stat_cols
        )
        .selectExpr("vid_a", "vid_b", "__ida", "explode(__mb) AS __idb", *stat_cols)
        .filter("vid_a != vid_b OR __ida < __idb")
        .selectExpr(
            "least(__ida, __idb) AS id_a",
            "greatest(__ida, __idb) AS id_b",
            *stat_cols,
        )
    )


def _band_join_legacy(g, num_perm, bands, ngram, shingle):
    """The pre-r11 two-psql uncapped band join (banded view + self-join),
    built from the SAME fragments as the fused form."""
    toks_sql, hv_sql, sig_sql = _sig_exprs("`__text`", num_perm, ngram, shingle)
    band_terms = ",".join(_band_key_terms(num_perm, bands))
    banded = psql(
        f"""
        WITH toksed AS (
          SELECT __vid, __mids, __text, {toks_sql} AS __toks FROM {{g}}
        ),
        base AS (
          SELECT __vid, __mids, {hv_sql} AS hv FROM toksed
        ),
        sigd AS (SELECT __vid, __mids, {sig_sql} AS sig FROM base),
        bk AS (SELECT __vid, __mids, array({band_terms}) AS __bkeys FROM sigd)
        SELECT __vid, __mids, __bkeys,
               posexplode(__bkeys) AS (band_id, band_key)
        FROM bk
        """,
        g=g,
    )

    def _band_eq(j: int) -> str:
        return f"(a.__bkeys[{j}] <=> b.__bkeys[{j}])"

    first_match = (
        "CASE a.band_id WHEN 0 THEN true "
        + " ".join(
            f"WHEN {k} THEN NOT ({' OR '.join(_band_eq(j) for j in range(k))})"
            for k in range(1, bands)
        )
        + " END"
    )
    return psql(
        f"""
        SELECT /*+ SHUFFLE_HASH(a, b) */
               a.__vid AS vid_a, b.__vid AS vid_b,
               a.__mids AS __ma, b.__mids AS __mb
        FROM {{banded}} a JOIN {{banded}} b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.__vid < b.__vid
         AND {first_match}
        """,
        banded=banded,
    )


def test_minhash_lsh_pairs_fusion_plan_and_rows(spark, docs):
    fused = minhash_lsh_pairs(docs, "doc_id", "text", 16, 4, 3, "word")

    g = _digest_groups(docs, "doc_id", "text", None)
    pairs = _band_join_legacy(g, 16, 4, 3, "word")
    selfp = g.filter("size(__mids) > 1").selectExpr(
        "__vid AS vid_a", "__vid AS vid_b", "__mids AS __ma", "__mids AS __mb"
    )
    legacy = _explode_tail_legacy(pairs.unionByName(selfp)).select("id_a", "id_b")

    assert _shape(fused) == _shape(legacy)
    assert _rows(fused) == _rows(legacy)
    assert len(_rows(fused)) > 0


def test_lsh_jaccard_pairs_fusion_rows(spark, docs):
    """The verify+tail fusion: rows must match the legacy chain exactly
    (inter/union stats included). Plan equality is pinned structurally on
    the minhash twin above; here the legacy verify psql is shared-shape
    already, so row equality over a corpus with dup mass suffices."""
    fused = lsh_jaccard_pairs(docs, "doc_id", "text", 16, 4, 3, 0.3, "word")

    from ubdc_airbnb_spark.functions.textstats import (
        word_ngrams_arr_expr,
        words_expr,
    )

    g = _digest_groups(docs, "doc_id", "text", None)
    pairs = _band_join_legacy(g, 16, 4, 3, "word")
    selfp = g.filter("size(__mids) > 1").selectExpr(
        "__vid AS vid_a", "__vid AS vid_b", "__mids AS __ma", "__mids AS __mb"
    )
    allp = pairs.unionByName(selfp)
    g_toks = words_expr("`__text`")
    g_arr = word_ngrams_arr_expr("`__toks`", 3)
    verified = psql(
        f"""
        WITH toks AS (
          SELECT __vid, __text, {g_toks} AS __toks FROM {{reps}}
        ),
        grams AS (
          SELECT __vid, array_distinct({g_arr}) AS gr FROM toks
        )
        SELECT /*+ SHUFFLE_HASH(ga), SHUFFLE_HASH(gb) */
               p.vid_a, p.vid_b, p.__ma, p.__mb,
               CAST(size(array_intersect(ga.gr, gb.gr)) AS BIGINT) AS inter,
               CAST(size(ga.gr) + size(gb.gr)
                    - size(array_intersect(ga.gr, gb.gr)) AS BIGINT) AS union_n
        FROM {{allp}} p
        JOIN grams ga ON ga.__vid = p.vid_a
        JOIN grams gb ON gb.__vid = p.vid_b
        WHERE size(array_intersect(ga.gr, gb.gr)) * 10
              >= (size(ga.gr) + size(gb.gr)
                  - size(array_intersect(ga.gr, gb.gr))) * 3
        """,
        reps=g,
        allp=allp,
    )
    legacy = _explode_tail_legacy(verified, "inter", "union_n").select(
        "id_a", "id_b", "inter", "union_n"
    )

    assert _shape(fused) == _shape(legacy)
    assert _rows(fused) == _rows(legacy)
    assert len(_rows(fused)) > 0


def test_lsh_candidate_pairs_fusion_plan_and_rows(spark, docs):
    sigs = minhash_signatures(docs, "doc_id", "text", 16, 3, "word")
    fused = lsh_candidate_pairs(sigs, "doc_id", 16, 4)

    band_sql = ",".join(_band_key_terms(16, 4))
    banded = sigs.selectExpr(
        "doc_id", f"posexplode(array({band_sql})) AS (band_id, band_key)"
    )
    legacy = psql(
        """
        SELECT /*+ SHUFFLE_HASH(a, b) */
               DISTINCT a.`doc_id` AS id_a, b.`doc_id` AS id_b
        FROM {banded} a JOIN {banded} b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.`doc_id` < b.`doc_id`
        """,
        banded=banded,
    )

    assert _shape(fused) == _shape(legacy)
    assert _rows(fused) == _rows(legacy)
    assert len(_rows(fused)) > 0


def test_capped_band_join_still_returns_banded(spark, docs):
    """max_bucket mode keeps the two-call shape and a real banded frame
    (the survival checks read it); uncapped mode returns None there."""
    g = _digest_groups(docs, "doc_id", "text", None)
    pairs, banded = _contracted_band_join(g, 16, 4, 3, "word", max_bucket=10)
    assert banded is not None
    assert {"band_id", "band_key"} <= set(banded.columns)
    pairs2, banded2 = _contracted_band_join(g, 16, 4, 3, "word")
    assert banded2 is None
    # capped-with-huge-cap == uncapped, row-for-row
    assert _rows(pairs.select("vid_a", "vid_b")) == _rows(
        pairs2.select("vid_a", "vid_b")
    )
