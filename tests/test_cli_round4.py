"""Round-4 CLI commands: train-bpe, screen-drop, dsir-score."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubdc_airbnb_spark import cli
from ubdc_airbnb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_cli_train_bpe(spark, tmp_path, capsys):
    out = str(tmp_path / "merges")
    rc = cli.main(["train-bpe", "--sf-dir", SF, "--merges", "6", "--output", out])
    assert rc == 0
    merges = spark.read.parquet(out)
    assert merges.count() == 6
    assert [f.name for f in merges.schema.fields] == ["step", "left", "right", "cnt"]


def test_cli_screen_drop_build_probe_add(spark, tmp_path, capsys):
    docs = load_table(spark, SF, "documents")
    corpus_p = str(tmp_path / "corpus")
    drop_p = str(tmp_path / "drop")
    docs.filter(F.col("doc_id") < 40).write.parquet(corpus_p)
    # the drop contains an exact copy of a corpus doc -> must collide
    docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang", "source", "n_chars"
    ).write.parquet(drop_p)
    idx = str(tmp_path / "idx")
    pairs_p = str(tmp_path / "pairs")
    rc = cli.main(
        ["screen-drop", "--index", idx, "--build", corpus_p, "--drop", drop_p,
         "--add", "--output", pairs_p]
    )
    assert rc == 0
    pairs = {(r.corpus_id, r.new_id) for r in spark.read.parquet(pairs_p).collect()}
    assert (3, 1003) in pairs
    # after --add, a re-screen of the same drop also collides with itself
    rc = cli.main(["screen-drop", "--index", idx, "--drop", drop_p, "--output", pairs_p])
    assert rc == 0
    pairs = {(r.corpus_id, r.new_id) for r in spark.read.parquet(pairs_p).collect()}
    assert (3, 1003) in pairs and (1003, 1003) not in pairs


def test_cli_dsir_score(spark, tmp_path, capsys):
    out = str(tmp_path / "weights")
    rc = cli.main(
        ["dsir-score", "--sf-dir", SF, "--target-sql", "lang = 'en'", "--output", out]
    )
    assert rc == 0
    w = spark.read.parquet(out)
    assert w.count() > 0
    assert set(w.columns) == {"doc_id", "weight", "n_tokens"}


def test_write_shards_cli(tmp_path, capsys):
    from ubdc_airbnb_spark.cli import main

    out = str(tmp_path / "shards")
    rc = main(
        [
            "write-shards",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--n-shards",
            "2",
            "--output",
            out,
        ]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("shard=")]
    assert len(lines) == 2
