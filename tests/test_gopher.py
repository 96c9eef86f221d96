"""Gopher quality rules (operators/gopher.py) vs an exact DuckDB twin,
plus hand-constructed rule fixtures and the rejection histogram."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.gopher import (
    gopher_rejection_histogram,
    with_gopher_rules,
)

GOPHER_SQL = r"""
WITH base AS (
    SELECT doc_id, coalesce(text, '') AS c FROM docs
),
m AS (
    SELECT doc_id, c,
           len(list_filter(string_split_regex(c, '\s+'), w -> w <> ''))
               AS n_words,
           length(regexp_replace(c, '\s', '', 'g')) AS word_chars,
           (length(c) - length(replace(c, '#', ''))) AS hash_symbols,
           (length(c) - length(replace(c, '...', ''))) / 3.0
               AS ellipsis_symbols,
           list_filter(string_split(c, chr(10)), ln -> trim(ln) <> '')
               AS lines,
           list_filter(string_split_regex(c, '\s+'),
                       w -> w <> '' AND regexp_matches(w, '[a-zA-Z]'))
               AS alpha_words,
           list_transform(list_filter(string_split_regex(c, '\s+'),
                                      w -> w <> ''), w -> lower(w))
               AS lower_words
    FROM base
),
r AS (
    SELECT doc_id, n_words,
           round(word_chars / greatest(n_words, 1), 6) AS mean_word_len,
           round(hash_symbols / greatest(n_words, 1), 6) AS hash_ratio,
           round(ellipsis_symbols / greatest(n_words, 1), 6)
               AS ellipsis_sym_ratio,
           round(len(list_filter(lines,
                     ln -> regexp_matches(ltrim(ln), '^[-*•]')))
                 / CAST(greatest(len(lines), 1) AS DOUBLE), 6)
               AS bullet_frac,
           round(len(list_filter(lines,
                     ln -> regexp_matches(rtrim(ln), '(\.\.\.|…)$')))
                 / CAST(greatest(len(lines), 1) AS DOUBLE), 6)
               AS ellipsis_frac,
           round(len(alpha_words) / CAST(greatest(n_words, 1) AS DOUBLE), 6)
               AS alpha_frac,
           len(list_filter(['the','be','to','of','and','that','have','with'],
                           s -> list_contains(lower_words, s)))
               AS n_req_stopwords
    FROM m
)
SELECT doc_id, n_words, mean_word_len, hash_ratio, ellipsis_sym_ratio,
       bullet_frac,
       ellipsis_frac, alpha_frac, n_req_stopwords,
       (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
           AS rule_mean_word_len,
       (hash_ratio <= 0.1 AND ellipsis_sym_ratio <= 0.1)
           AS rule_symbol_ratio,
       bullet_frac <= 0.9 AS rule_bullet,
       ellipsis_frac <= 0.3 AS rule_ellipsis,
       alpha_frac >= 0.8 AS rule_alpha,
       n_req_stopwords >= 2 AS rule_stopwords
FROM r
ORDER BY doc_id
"""

OUT_COLS = [
    "doc_id",
    "n_words",
    "mean_word_len",
    "hash_ratio",
    "ellipsis_sym_ratio",
    "bullet_frac",
    "ellipsis_frac",
    "alpha_frac",
    "n_req_stopwords",
    "rule_word_count",
    "rule_mean_word_len",
    "rule_symbol_ratio",
    "rule_bullet",
    "rule_ellipsis",
    "rule_alpha",
    "rule_stopwords",
]


def test_matches_duckdb_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        tuple(r)
        for r in with_gopher_rules(docs)
        .select(*OUT_COLS)
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(GOPHER_SQL).fetchall()
    assert got == want


FIXTURES = [
    # (text, failing rule) — each crafted to trip exactly one threshold
    ("word " * 10, "rule_word_count"),  # too short
    ("supercalifragilistic " * 60 + "the of", "rule_mean_word_len"),
    ("the of " + "### # ## " * 30 + "word " * 40, "rule_symbol_ratio"),
    # the ellipsis-count branch alone (no '#' anywhere) must also trip it
    ("the of " + "word... more... " * 30 + "pad " * 40, "rule_symbol_ratio"),
    (
        "\n".join("- bullet line the of item" for _ in range(20))
        + "\nthe of plain words here "
        + "pad " * 50,
        "rule_bullet",
    ),
    (
        "\n".join(f"line {i} trails off the of..." for i in range(10))
        + "\n"
        + "the of plain filler words\n" * 2
        + "pad " * 60,
        "rule_ellipsis",
    ),
    ("the of " + "12345 67890 " * 40, "rule_alpha"),
    ("alpha beta gamma delta " * 20, "rule_stopwords"),
]


@pytest.mark.parametrize("text,rule", FIXTURES)
def test_each_rule_fires(spark, text, rule):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = with_gopher_rules(df).head()
    assert row[rule] is False, f"{rule} should fail: {dict(row.asDict())}"
    assert row["gopher_pass"] is False


def test_clean_doc_passes(spark):
    text = (
        "The quick brown fox jumps over the lazy dog and runs to the "
        "river bank with great speed. " * 5
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = with_gopher_rules(df).head()
    assert row["gopher_pass"] is True


def test_null_text_fails_word_count_only(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = with_gopher_rules(df).head()
    assert row["n_words"] == 0
    assert row["rule_word_count"] is False
    assert row["rule_bullet"] is True and row["rule_ellipsis"] is True
    assert row["gopher_pass"] is False


def test_rejection_histogram(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = with_gopher_rules(docs)
    hist = {
        r["rule"]: r["n_failed"]
        for r in gopher_rejection_histogram(docs).collect()
    }
    n_fail_pass = scored.filter(~F.col("gopher_pass")).count()
    assert hist["gopher_pass"] == n_fail_pass
    for rule in (k for k in hist if k != "gopher_pass"):
        assert hist[rule] == scored.filter(~F.col(rule)).count()


def test_plan_is_codegen_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = with_gopher_rules(docs)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "Python" not in final
    assert "Exchange" not in final  # pure per-row projection, no shuffle
