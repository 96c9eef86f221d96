"""Benchmark-decontamination operator: n-gram derivation edge cases,
hand-computable overlap flags, and the broadcast/single-shuffle plan pin."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.decontam import (
    ngram_contamination,
    word_ngrams,
)


def test_word_ngrams_edges(spark):
    df = spark.createDataFrame(
        [
            ("a b c d",),      # 3 bigrams
            ("one",),          # shorter than n → empty
            ("",),             # empty → empty
            ("X, y! x Y",),    # normalization: case + punctuation
            ("a b a b a",),    # repeated grams de-duplicate
        ],
        "text string",
    )
    out = df.select(word_ngrams(F.col("text"), 2).alias("ng")).collect()
    assert out[0].ng == ["a b", "b c", "c d"]
    assert out[1].ng == []
    assert out[2].ng == []
    assert out[3].ng == ["x y", "y x"]
    assert out[4].ng == ["a b", "b a"]


def test_contamination_flags(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # identical to benchmark
            (2, "the quick brown cat sleeps"),  # partial overlap
            (3, "entirely different words here"),
            (4, "xy"),                          # no n-grams at all
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps high",)], "text string"
    )
    got = {
        r.doc_id: (r.n_ngrams, r.n_matched, r.contaminated)
        for r in ngram_contamination(docs, bench, n=3, threshold=0.5).collect()
    }
    # doc1: 3 trigrams, all in benchmark; doc2: 3 trigrams, 1 shared
    # ("the quick brown"); doc3: 2 trigrams, none; doc4: zero trigrams,
    # never contaminated
    assert got == {
        1: (3, 3, True),
        2: (3, 1, False),
        3: (2, 0, False),
        4: (0, 0, False),
    }


def test_plan_broadcasts_benchmark(spark):
    """The benchmark side must broadcast and the corpus must shuffle only
    for the final doc-id aggregation — never by n-gram."""
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") % 10 == 0).select("text")
    plan = (
        ngram_contamination(docs, bench, n=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # one hash exchange keyed by the doc id (plus at most the benchmark
    # distinct's own exchange, which is over the tiny side)
    corpus_exchanges = [
        ln
        for ln in plan.splitlines()
        if re.search(r"Exchange hashpartitioning\(doc_id", ln)
    ]
    assert len(corpus_exchanges) == 1
