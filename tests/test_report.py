"""Corpus report (operators/report.py): exact DuckDB twin for the scalar
metrics, one-pass plan shape."""

from __future__ import annotations

import duckdb
import pytest

from rdfproject_msc_spark.operators.report import corpus_report


def test_scalar_metrics_match_duckdb(spark, sf_dir):
    rep = {
        r["metric"]: r["value"]
        for r in corpus_report(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(
        r"""
SELECT count(*) AS n_docs,
       sum(CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END)
           AS n_ws_tokens,
       sum(octet_length(encode(text))) AS total_bytes,
       count(DISTINCT source) AS n_sources,
       count(DISTINCT lang) AS n_langs,
       1.0 - count(DISTINCT text) / count(*) AS dup_rate,
       round(avg(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END), 6)
           AS mean_doc_tokens
FROM docs
"""
    ).fetchone()
    assert rep["n_docs"] == want[0]
    assert rep["n_ws_tokens"] == want[1]
    assert rep["total_bytes"] == want[2]
    assert rep["n_sources"] == want[3]
    assert rep["n_langs"] == want[4]
    # hash-keyed distinct == text distinct absent a 2^-64 collision
    assert rep["dup_rate"] == pytest.approx(float(want[5]), abs=1e-12)
    assert rep["mean_doc_tokens"] == pytest.approx(float(want[6]), abs=1e-6)
    # pass rates agree with the operators they summarize
    from pyspark.sql import functions as F

    from rdfproject_msc_spark.operators.c4filter import c4_clean
    from rdfproject_msc_spark.operators.gopher import with_gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    gp = with_gopher_rules(docs).filter(F.col("gopher_pass")).count() / n
    ck = c4_clean(docs).filter(F.col("c4_keep")).count() / n
    assert rep["gopher_pass_rate"] == pytest.approx(gp, abs=1e-6)
    assert rep["c4_keep_rate"] == pytest.approx(ck, abs=1e-6)


def test_one_pass_plan(spark, sf_dir):
    df = corpus_report(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "Python" not in final
    assert final.count("FileScan") == 1  # one pass over the corpus
    assert "Join" not in final and "Window" not in final
