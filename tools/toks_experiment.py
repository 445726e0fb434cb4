"""A/B the shingle/signature derivation shapes: word_ngrams_expr inlines
the word-array derivation (`filter(split(text,'\\s+'), ...)` — a regex
split over the whole document) into every slice/size call of the
zip_with gram builder, so the split runs 7x per row for n=3 (5x for
n=2).  Higher-order-function expressions are CodegenFallback, so no
subexpression elimination rescues it.

  A  current shape: hv over text (split inlined 7x)          [control]
  B  factored: __toks projected once, grams over the column  [candidate]

Spark 4's CollapseProject keeps the extra Project because __toks is
non-cheap and referenced 7x (collapseProjectAlwaysInline=false default).
Checks bit-identical signatures (xxhash64 checksum) and counts split()
occurrences in both physical plans.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ubdc_airbnb_spark.operators.dedup import _sig_exprs
from ubdc_airbnb_spark.functions.textstats import (
    word_ngrams_arr_expr,
    words_expr,
)
from ubdc_airbnb_spark.functions.hashing import MERSENNE31
from ubdc_airbnb_spark.session import get_spark
from ubdc_airbnb_spark.sources.tables import load_table, warm_cache


def timed(df, n=6):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "toksab",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    warm_cache(spark, sf_dir, partitions=8)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # ---- A: current shape --------------------------------------------
    hv_a, sig_a = _sig_exprs("`text`", 16, 3, "word")
    a = docs.selectExpr("doc_id", f"{hv_a} AS hv").selectExpr(
        "doc_id", f"{sig_a} AS sig"
    )

    # ---- B: factored __toks ------------------------------------------
    import random as _random

    rnd = _random.Random(42)
    params = [
        (rnd.randrange(1, MERSENNE31), rnd.randrange(0, MERSENNE31))
        for _ in range(16)
    ]
    grams_b = word_ngrams_arr_expr("`__toks`", 3)
    hv_b = (
        f"transform(array_distinct({grams_b}), "
        f"g -> CAST(CONV(SUBSTRING(MD5(g), 1, 15), 16, 10) AS BIGINT) % {MERSENNE31}L)"
    )
    terms = ",".join(
        f"array_min(transform(hv, h -> (h * {av}L + {bv}L) % {MERSENNE31}L))"
        for av, bv in params
    )
    sig_b = f"array({terms})"
    b = (
        docs.selectExpr("doc_id", f"{words_expr('`text`')} AS __toks")
        .selectExpr("doc_id", f"{hv_b} AS hv")
        .selectExpr("doc_id", f"{sig_b} AS sig")
    )

    # equality first
    def cs(df):
        return df.agg(
            F.bit_xor(F.xxhash64(F.struct("doc_id", "sig")))
        ).collect()[0][0]

    ca, cb = cs(a), cs(b)
    print("checksum A:", ca)
    print("checksum B:", cb)
    print("identical :", ca == cb)

    pa = a._jdf.queryExecution().executedPlan().toString()
    pb = b._jdf.queryExecution().executedPlan().toString()
    print("split( occurrences A:", pa.count("split("))
    print("split( occurrences B:", pb.count("split("))

    timed(a, 2); timed(b, 2)  # warm both
    a_best, b_best = float("inf"), float("inf")
    for _ in range(3):
        a_best = min(a_best, timed(a, 3))
        b_best = min(b_best, timed(b, 3))
    print(f"A inline 7x split  : {a_best:.3f} s")
    print(f"B factored __toks  : {b_best:.3f} s")


if __name__ == "__main__":
    main()
