"""Passage-level exact dedup (operators/passages.py): corpus-first
occurrence survives, later repeats of the same k-word span are cut, and
documents reassemble in order — pinned by a hand-computed fixture and an
exact DuckDB window-twin over the real documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.passages import passage_dedup
from rdfproject_msc_spark.sources.tables import load_table
from tests.oracle import assert_matches_oracle, duck_connect

from rdfproject_msc_spark.registry import PASSAGE_DEDUP_SQL


def test_passage_dedup_tiny(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # passages: 'a b c', 'd e f'
            (2, "a b c x y z"),          # 'a b c' repeats → cut
            (3, "x y z a b c"),          # BOTH passages seen → empty
            (4, "d e"),                  # short doc: one 2-word passage
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.text, r.n_passages, r.n_dropped)
        for r in passage_dedup(docs, k=3).collect()
    }
    assert out[1] == ("a b c d e f", 2, 0)
    assert out[2] == ("x y z", 2, 1)
    assert out[3] == ("", 2, 2)
    assert out[4] == ("d e", 1, 0)


def test_passage_dedup_k1_is_word_level(spark):
    docs = spark.createDataFrame(
        [(1, "w w v"), (2, "v u")], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in passage_dedup(docs, k=1).collect()}
    assert out == {1: "w v", 2: "u"}


def test_passage_dedup_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = passage_dedup(docs, k=3)
    assert_matches_oracle(got, PASSAGE_DEDUP_SQL, sf_dir)


def test_passage_dedup_is_load_bearing(spark, sf_dir):
    """The synthetic corpus (small vocabulary) MUST contain repeated
    3-word passages — a run that drops nothing pins nothing."""
    docs = load_table(spark, sf_dir, "documents")
    dropped = (
        passage_dedup(docs, k=3)
        .agg(F.sum("n_dropped").alias("d"))
        .collect()[0]["d"]
    )
    assert dropped > 0


def test_passage_dedup_no_window_no_python(spark, sf_dir):
    """Plan pins: the executed plan contains NO Window operator (the
    corpus-first choice is an aggregate — hot passages combine map-side)
    and no Python evaluation."""
    docs = load_table(spark, sf_dir, "documents")
    df = passage_dedup(docs, k=3)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "Window" not in final
    assert "Python" not in final
