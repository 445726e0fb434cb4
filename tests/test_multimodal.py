"""Multimodal binary-column plumbing: schema, batch shape, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ubdc_airbnb_spark.multimodal import binary_ops
from ubdc_airbnb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_attach_binary_schema_and_meta(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    media = binary_ops.attach_binary(docs, "doc_id", "text", media_type="text/plain")
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "content", "meta"]
    r = media.filter(F.col("media_id") == 0).collect()[0]
    assert r.media_type == "text/plain"
    assert r.meta.n_bytes == len(bytes(r.content))
    assert len(r.meta.content_digest) == 32


def test_decode_fake_deterministic_features(spark):
    docs = load_table(spark, SF, "documents").limit(30)
    media = binary_ops.attach_binary(docs, "doc_id", "text")
    feats1 = {r.media_id: r.feature for r in binary_ops.decode_fake(media).collect()}
    feats2 = {r.media_id: r.feature for r in binary_ops.decode_fake(media).collect()}
    assert feats1 == feats2
    assert all(len(v) == 8 for v in feats1.values())
    # oracle: python replay of the byte fold for one row
    text = docs.filter(F.col("doc_id") == 0).collect()[0].text
    expected, w, h = binary_ops._extract_features(text.encode())
    assert feats1[0] == expected


def test_decode_real_is_stubbed(spark):
    docs = load_table(spark, SF, "documents").limit(1)
    media = binary_ops.attach_binary(docs, "doc_id", "text")
    with pytest.raises(NotImplementedError):
        binary_ops.decode_real(media)


def test_frame_sample_slices_and_digests(spark):
    import hashlib

    docs = load_table(spark, SF, "documents").limit(20)
    media = binary_ops.attach_binary(docs, "doc_id", "text")
    rows = binary_ops.frame_sample(media, frame_bytes=64, every=2).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    seen: dict[int, list] = {}
    for r in rows:
        seen.setdefault(r.media_id, []).append(r)
    for mid, text in texts.items():
        b = text.encode()
        n_frames = -(-len(b) // 64)
        expected_idx = list(range(0, n_frames, 2))
        got = sorted(seen[mid], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == expected_idx
        for r in got:
            fr = b[r.frame_idx * 64 : (r.frame_idx + 1) * 64]
            assert r.n_frame_bytes == len(fr)
            assert r.frame_digest == hashlib.md5(fr).hexdigest()


def test_resize_pool_matches_numpy_oracle(spark):
    """Explicit-bytes oracle: pool a known 9-byte 'image' (w=3,h=3) and a
    padded 5-byte one; non-ASCII bytes exercise the binary path the SQL
    replay (ASCII corpus) can't."""
    import math

    import numpy as np

    from ubdc_airbnb_spark.multimodal.binary_ops import resize_pool

    payloads = {1: bytes(range(9)), 2: bytes([250, 251, 252, 253, 254]), 3: b""}
    media = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()], "media_id long, content binary"
    )
    got = {
        (r.media_id, r.cell_r, r.cell_c): r.mean_px
        for r in resize_pool(media, k=2).collect()
    }

    want = {}
    for mid, b in payloads.items():
        n = len(b)
        if n == 0:
            continue  # empty media contributes nothing
        w = math.isqrt(n - 1) + 1
        h = -(-n // w)
        px = np.zeros(w * h, dtype=np.int64)
        px[:n] = np.frombuffer(b, dtype=np.uint8)
        grid = px.reshape(h, w)
        for cr in range(2):
            rows = [r for r in range(h) if (r * 2) // h == cr]
            for cc in range(2):
                cols = [c for c in range(w) if (c * 2) // w == cc]
                if rows and cols:
                    cell = grid[np.ix_(rows, cols)]
                    want[(mid, cr, cc)] = int(cell.sum()) // cell.size
    assert got == want
    assert all(k[0] != 3 for k in got)  # empty media absent
