"""Property-based tests (hypothesis) for the pure-Python kernels and
their Spark twins: quadkey codecs, fingerprints, n-gram edges."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from ubdc_airbnb_spark.functions import geometry as geo


@given(
    st.integers(min_value=1, max_value=22).flatmap(
        lambda z: st.tuples(
            st.integers(min_value=0, max_value=2**z - 1),
            st.integers(min_value=0, max_value=2**z - 1),
            st.just(z),
        )
    )
)
@settings(max_examples=200, deadline=None)
def test_quadkey_roundtrip_property(xyz):
    x, y, z = xyz
    qk = geo.tile_to_quadkey(x, y, z)
    assert len(qk) == z
    assert set(qk) <= set("0123")
    assert geo.quadkey_to_tile(qk) == (x, y, z)


@given(
    st.floats(min_value=-179.99, max_value=179.99),
    st.floats(min_value=-84.9, max_value=84.9),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=200, deadline=None)
def test_point_tile_contains_point(lon, lat, z):
    """The tile a point maps to must have a bbox containing the point."""
    x, y = geo._lonlat_tile(lon, lat, z)
    west, south, east, north = geo.tile_bounds(x, y, z)
    assert west - 1e-9 <= lon <= east + 1e-9
    assert south - 1e-6 <= lat <= north + 1e-6


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-170, max_value=170),
            st.floats(min_value=-80, max_value=80),
        ),
        min_size=3,
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_bbox_contains_all_vertices(pts):
    ring = pts + [pts[0]]
    mp = [[ring]]
    xmin, ymin, xmax, ymax = geo.bbox(mp)
    for x, y in pts:
        assert xmin <= x <= xmax and ymin <= y <= ymax
    # every vertex of the polygon is inside (or on) its bbox polygon
    bp = geo.bbox_to_polygon(xmin - 1e-9, ymin - 1e-9, xmax + 1e-9, ymax + 1e-9)
    for x, y in pts:
        assert geo.point_in_multipolygon(x, y, bp)


@given(st.text(alphabet="ab c", min_size=0, max_size=40))
@settings(max_examples=100, deadline=None)
def test_wkt_parse_never_crashes_on_square_with_noise_name(s):
    # parse_wkt on valid WKT with arbitrary surrounding whitespace
    wkt = f"  POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))  "
    mp = geo.parse_wkt(wkt)
    assert geo.area(mp) == 1.0


# --------------------------------------------------------------------------
# Spark operator properties vs naive Python reference implementations
# (few examples each: every example runs real Spark jobs)
# --------------------------------------------------------------------------

from hypothesis import HealthCheck

_row = st.tuples(
    st.integers(min_value=0, max_value=2),   # key
    st.integers(min_value=0, max_value=120), # seconds
)
_SPARK_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    st.lists(_row, min_size=1, max_size=8),
    st.lists(_row, min_size=1, max_size=10),
)
@_SPARK_SETTINGS
def test_asof_join_matches_naive(spark, lrows, rrows):
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.joins import asof_join

    tol = 20
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k long, t long, lid long"
    ).select("k", F.timestamp_seconds("t").alias("t"), "lid")
    right = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rrows)], "k long, rt long, rid long"
    ).select("k", F.timestamp_seconds("rt").alias("rt"), "rid")
    got = {
        r.lid: r.rid
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            tolerance=f"INTERVAL {tol} SECOND", tiebreak="rid",
        ).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [
            (rt, j)
            for j, (rk, rt) in enumerate(rrows)
            if rk == k and rt <= t and rt >= t - tol
        ]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (i, k, t, cands)


@given(
    st.lists(_row, min_size=1, max_size=8),
    st.lists(_row, min_size=1, max_size=10),
)
@_SPARK_SETTINGS
def test_interval_join_matches_naive(spark, lrows, rrows):
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators.joins import interval_join

    up = 30
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k long, t long, lid long"
    ).select("k", F.timestamp_seconds("t").alias("t"), "lid")
    right = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rrows)], "k long, rt long, rid long"
    ).select("k", F.timestamp_seconds("rt").alias("rt"), "rid")
    got = {
        (r.lid, r.rid)
        for r in interval_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            upper=f"INTERVAL {up} SECOND", bucket_seconds=17,  # deliberately≠window
        ).collect()
    }
    expect = {
        (i, j)
        for i, (k, t) in enumerate(lrows)
        for j, (rk, rt) in enumerate(rrows)
        if rk == k and t <= rt <= t + up
    }
    assert got == expect


@given(
    st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=20),
    st.tuples(
        st.integers(min_value=1, max_value=50), st.integers(min_value=1, max_value=50)
    ).filter(lambda t: t[1] <= t[0]),
)
@_SPARK_SETTINGS
def test_sliding_chunks_match_naive(spark, word_counts, size_stride):
    """Chunking vs a naive Python reference on random document lengths /
    window geometries: same starts, same chunk contents, full coverage."""
    from ubdc_airbnb_spark.operators.chunking import sliding_chunks

    size, stride = size_stride
    texts = [" ".join(f"d{i}w{j}" for j in range(n)) for i, n in enumerate(word_counts)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, list] = {}
    for r in sliding_chunks(df, "doc_id", "text", size=size, stride=stride).collect():
        got.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(word_counts):
        words = texts[i].split()
        exp = []
        s = 1
        while s <= max(n, 1):
            if s == 1 or (s - stride) + size - 1 < n:
                exp.append((s, words[s - 1 : s - 1 + size]))
            s += stride
        rows = sorted(got.get(i, []), key=lambda r: r.start_word)
        assert [(r.start_word, r.chunk_text.split() if r.chunk_text else []) for r in rows] == exp, (
            i, n, size, stride,
        )


_word = st.sampled_from(["a", "b", "c", "d", "ee"])


@given(st.lists(st.lists(_word, min_size=0, max_size=30), min_size=1, max_size=8))
@_SPARK_SETTINGS
def test_repetition_signals_match_naive(spark, docs_words):
    """Gopher repetition signals (row-local sorted-run fold) vs a naive
    Counter-based reference on random small-vocab documents."""
    from collections import Counter

    from ubdc_airbnb_spark.operators.curation import repetition_signals

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_signals(df, "doc_id", "text").collect()}
    for i, ws in enumerate(docs_words):
        n = len(ws)
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        r = got[i]
        assert r.n_words == n
        assert r.dup_word_frac == ((n - len(set(ws))) / n if n else 0.0)
        assert r.top_word_frac == (max(Counter(ws).values()) / n if n else 0.0)
        assert r.top_bigram_frac == (
            max(Counter(bgs).values()) / len(bgs) if bgs else 0.0
        )


@given(
    st.lists(st.lists(_word, min_size=0, max_size=25), min_size=1, max_size=6),
    st.integers(min_value=2, max_value=6),
)
@_SPARK_SETTINGS
def test_segment_dedup_matches_naive(spark, docs_words, seg):
    """C4-style segment dedup vs a naive first-occurrence reference."""
    from ubdc_airbnb_spark.operators.curation import segment_dedup

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_kept)
        for r in segment_dedup(df, "doc_id", "text", seg_words=seg).collect()
    }
    seen: set[str] = set()
    expect: dict[int, tuple[str, int]] = {}
    for i, ws in enumerate(docs_words):
        kept = []
        for s in range(0, max(len(ws), 1), seg):
            seg_text = " ".join(ws[s : s + seg])
            if seg_text and seg_text not in seen:
                seen.add(seg_text)
                kept.append(seg_text)
        if kept:
            expect[i] = (" ".join(kept), len(kept))
    assert got == expect


# ------------------------------------------------- round-2 operator properties

_agg_row = st.tuples(
    st.integers(min_value=0, max_value=3),          # key
    st.integers(min_value=-1000, max_value=1000),   # value (int -> exact)
)


@given(st.lists(_agg_row, min_size=1, max_size=40))
@settings(max_examples=8, deadline=None)
def test_salted_agg_matches_naive(spark, rows):
    from collections import defaultdict

    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators import skew

    df = spark.createDataFrame(
        [(i, k, float(v)) for i, (k, v) in enumerate(rows)], "rid long, k long, v double"
    )
    got = {
        r.k: (r.n, float(r.s), r.lo, r.hi)
        for r in skew.salted_agg(
            df, ["k"], F.col("rid").cast("string"),
            [
                skew.count_agg("n"),
                skew.sum_agg(F.col("v").cast("decimal(18,2)"), "s"),
                skew.min_agg("v", "lo"),
                skew.max_agg("v", "hi"),
            ],
            fanout=4,
        ).collect()
    }
    naive = defaultdict(list)
    for k, v in rows:
        naive[k].append(float(v))
    for k, vs in naive.items():
        assert got[k] == (len(vs), sum(vs), min(vs), max(vs)), k


@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60))
@settings(max_examples=8, deadline=None)
def test_histogram_quantiles_bounded_error(spark, vals):
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators import sketches

    width = 100.0
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    est = {r.q: r.est for r in sketches.histogram_quantiles(
        sketches.histogram_sketch(df, "v", width), width, qs=(0.5, 0.9)
    ).collect()}
    sv = sorted(vals)
    for q in (0.5, 0.9):
        import math

        exact = sv[max(0, math.ceil(q * len(sv)) - 1)]  # discrete percentile
        assert abs(est[q] - exact) <= width, (q, est[q], exact, sv)


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=30),
    st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=30),
)
@settings(max_examples=8, deadline=None)
def test_incremental_merge_matches_naive(spark, a_vals, b_vals):
    from pyspark.sql import functions as F

    from ubdc_airbnb_spark.operators import incremental

    if not a_vals and not b_vals:
        return
    mk = lambda vs: spark.createDataFrame(
        [(0, float(v)) for v in vs], "g long, v double"
    )
    states = []
    if a_vals:
        states.append(incremental.partial_state(mk(a_vals), ["g"], "v"))
    if b_vals:
        states.append(incremental.partial_state(mk(b_vals), ["g"], "v"))
    merged = states[0]
    for s2 in states[1:]:
        merged = incremental.merge_states(merged, s2, ["g"])
    row = incremental.finalize(merged, ["g"]).collect()[0]
    allv = [float(v) for v in a_vals + b_vals]
    assert row.cnt == len(allv)
    assert row.sum_value == sum(allv)
    assert row.min_value == min(allv)
    assert row.max_value == max(allv)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.lists(st.integers(min_value=0, max_value=4), min_size=10, max_size=10),
)
@settings(max_examples=150, deadline=None)
def test_png_roundtrip_property(w, h, channels, seed, filters):
    """decode(encode(px)) == px for arbitrary geometry, channel count,
    pixel content, and per-row filter choice (all five unfilter paths)."""
    from ubdc_airbnb_spark.multimodal.png import decode_png, encode_png

    n = w * h * channels
    px = bytes((seed * 2654435761 + i * 40503 + (i * i) % 251) % 256 for i in range(n))
    data = encode_png(px, w, h, channels, lambda y: filters[y % 10])
    assert decode_png(data) == (w, h, channels, px)
