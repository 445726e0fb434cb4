"""bench.py --variant=dup20 (r09, VERDICT item 6): the variant corpus
must be same-size, ~20% duplicate mass in ten clusters, with every
non-document table byte-identical (symlinked)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dup20_variant_corpus(tmp_path):
    import duckdb

    from bench import _dup20_dir

    src = "/root/testdata/sf0.001"
    out = _dup20_dir(src)
    con = duckdb.connect()
    base = con.execute(
        f"SELECT count(*), count(DISTINCT text) FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()
    var = con.execute(
        f"SELECT count(*), count(DISTINCT text) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()
    assert var[0] == base[0]  # same size
    # ~20% of rows collapsed onto ten template texts
    dup_rows, n_clusters = con.execute(
        f"""
        SELECT sum(n), count(*) FROM (
          SELECT text, count(*) AS n FROM read_parquet('{out}/documents.parquet')
          GROUP BY text HAVING count(*) > 2
        )
        """
    ).fetchone()
    assert n_clusters == 10
    assert abs(dup_rows / var[0] - 0.2) < 0.02
    # ids and non-text columns preserved
    ids = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{src}/documents.parquet') a
        JOIN read_parquet('{out}/documents.parquet') b USING (doc_id)
        WHERE a.lang = b.lang AND a.source = b.source
        """
    ).fetchone()[0]
    assert ids == base[0]
    # other tables are the same files (symlinks)
    assert os.path.islink(os.path.join(out, "lineitem.parquet"))
