"""Model-based quality classifier (operators/classify.py): pinned
reference-model provenance, bit-exact local/Spark fit and score parity,
separation quality, and the JVM-only scoring plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.classify import (
    REFERENCE_MODEL,
    REFERENCE_NEG,
    REFERENCE_POS,
    fit_quality_classifier,
    fit_quality_classifier_local,
    quality_scores,
    score_py,
)


def test_reference_model_provenance():
    """The pinned literal weights ARE the deterministic fit of the
    built-in sample — re-fit and compare exactly."""
    m = fit_quality_classifier_local(
        REFERENCE_POS + REFERENCE_NEG,
        [1] * len(REFERENCE_POS) + [0] * len(REFERENCE_NEG),
    )
    assert m == REFERENCE_MODEL


def test_reference_model_separates_training_sample():
    for t in REFERENCE_POS:
        assert score_py(REFERENCE_MODEL, t) >= 0.5, t
    for t in REFERENCE_NEG:
        assert score_py(REFERENCE_MODEL, t) < 0.5, t


def test_reference_model_generalizes_to_recombinations():
    """Held-out sentences REUSING the training vocabulary in new
    combinations (the regime a hashed linear probe can claim) classify
    correctly; genuinely unseen tokens land on arbitrary hashed
    dimensions and make no such promise."""
    pos = [
        "the committee traced the trade route through the war years",
        "students measured water quality along the riverbank",
        "the museum published its annual report on the fresco restoration",
    ]
    neg = [
        "win win win click here free money casino bonus",
        "buy cheap best price subscribe now limited offer",
        "asdf qwer zxcv blah blah blah jackpot jackpot",
    ]
    for t in pos:
        assert score_py(REFERENCE_MODEL, t) >= 0.5, t
    for t in neg:
        assert score_py(REFERENCE_MODEL, t) < 0.5, t


def test_spark_fit_equals_local_fit(spark):
    texts = REFERENCE_POS + REFERENCE_NEG
    labels = [1] * len(REFERENCE_POS) + [0] * len(REFERENCE_NEG)
    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(zip(texts, labels))],
        "doc_id long, text string, label int",
    )
    assert fit_quality_classifier(df) == REFERENCE_MODEL


def test_spark_scores_equal_python_twin(spark, sf_dir):
    """The statically-expanded dot product + sigmoid reproduces the
    Python twin bit-for-bit (same fixed summation order, same float32
    element rounding) on real documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_scores(docs, REFERENCE_MODEL).collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        want = score_py(REFERENCE_MODEL, text)
        # JVM Math.exp vs libm exp may differ in the final ulp
        assert math.isclose(got[doc_id], want, rel_tol=0, abs_tol=1e-12)


def test_empty_doc_scores_sigmoid_bias(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    got = quality_scores(df, REFERENCE_MODEL).head()["quality_prob"]
    want = 1.0 / (1.0 + math.exp(-REFERENCE_MODEL.bias))
    assert math.isclose(got, want, rel_tol=0, abs_tol=1e-12)


def test_scoring_plan_is_jvm_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = quality_scores(docs, REFERENCE_MODEL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
