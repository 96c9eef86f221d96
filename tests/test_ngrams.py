"""Corpus n-gram statistics (operators/ngrams.py, r6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.ngrams import ngram_counts, top_ngrams


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat"),
        (2, "The cat  sat on the CAT"),  # case-fold + multi-space
        (3, "single"),
        (4, "   "),  # blank → no tokens
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_counts_hand_derived(docs):
    got = {
        (r.ngram, r.c) for r in ngram_counts(docs, n=2).collect()
    }
    # doc1: the-cat, cat-sat; doc2: the-cat, cat-sat, sat-on, on-the,
    # the-cat; doc3/4/5: none
    assert got == {
        ("the cat", 3),
        ("cat sat", 2),
        ("sat on", 1),
        ("on the", 1),
    }


def test_unigrams_and_trigram(docs):
    uni = {
        (r.ngram, r.c) for r in ngram_counts(docs, n=1).collect()
    }
    assert uni == {
        ("the", 3), ("cat", 3), ("sat", 2), ("on", 1), ("single", 1)
    }
    tri = {
        (r.ngram, r.c) for r in ngram_counts(docs, n=3).collect()
    }
    assert ("the cat sat", 2) in tri and ("on the cat", 1) in tri


def test_top_ngrams_order_and_plan(docs):
    top = top_ngrams(docs, n=2, k=2)
    assert [(r.ngram, r.c) for r in top.collect()] == [
        ("the cat", 3),
        ("cat sat", 2),
    ]
    top.collect()
    plan = top._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    # top-K must be a heap merge, never a global Sort
    assert "TakeOrderedAndProject" in final
    with pytest.raises(ValueError, match="n must"):
        ngram_counts(docs, n=0)
