"""C4 line-level cleaning (operators/c4filter.py) vs an exact DuckDB twin,
plus per-rule fixtures."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.c4filter import c4_clean

C4_SQL = r"""
WITH base AS (
    SELECT doc_id, coalesce(text, '') AS c FROM docs
),
m AS (
    SELECT doc_id, c,
           list_filter(list_transform(string_split(c, chr(10)),
                                      ln -> trim(ln)),
                       ln -> ln <> '') AS all_lines,
           list_filter(list_transform(string_split(c, chr(10)),
                                      ln -> trim(ln)),
                       ln -> regexp_matches(ln, '[.!?"]$')
                         AND len(list_filter(string_split_regex(ln, '\s+'),
                                             w -> w <> '')) >= 5
                         AND NOT regexp_matches(ln,
                             '(?i)(javascript|cookie policy|terms of use|privacy policy)'))
               AS kept
    FROM base
)
SELECT doc_id,
       CAST(len(all_lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_lines_kept,
       list_aggregate(kept, 'string_agg', chr(10)) AS text_c4,
       (len(kept) >= 3
        AND NOT contains(c, '{')
        AND NOT regexp_matches(c, '(?i)lorem ipsum')) AS c4_keep
FROM m
ORDER BY doc_id
"""

OUT = ["doc_id", "n_lines", "n_lines_kept", "text_c4", "c4_keep"]


def test_matches_duckdb_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        tuple(r)
        for r in c4_clean(docs).select(*OUT).orderBy("doc_id").collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = [
        # DuckDB string_agg over an empty list yields NULL; Spark
        # array_join yields '' — normalize the empty-document case
        (r[0], r[1], r[2], r[3] or "", r[4])
        for r in con.execute(C4_SQL).fetchall()
    ]
    assert got == want


def test_line_rules(spark):
    text = "\n".join(
        [
            "This line is long enough and ends with a period.",
            "short line.",  # < 5 words → dropped
            "This line has plenty of words but no terminal punct",  # dropped
            "Please enable javascript to view this page properly.",  # dropped
            'He said the quoted ending counts as terminal too."',
            "Another perfectly fine sentence appears right here!",
        ]
    )
    row = c4_clean(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).head()
    assert row["n_lines"] == 6
    assert row["n_lines_kept"] == 3
    assert row["c4_keep"] is True
    assert "javascript" not in row["text_c4"]
    assert "short line." not in row["text_c4"]


def test_document_rules(spark):
    ok = "A good sentence with five words here.\n" * 3
    rows = c4_clean(
        spark.createDataFrame(
            [
                (1, ok),
                (2, ok + "function f() { return 1; }"),  # curly brace
                (3, ok + "Lorem Ipsum dolor sit amet."),  # blocklist
                (4, "One surviving sentence is not enough here."),  # < 3
                (5, None),
            ],
            "doc_id long, text string",
        )
    ).collect()
    keep = {r["doc_id"]: r["c4_keep"] for r in rows}
    assert keep == {1: True, 2: False, 3: False, 4: False, 5: False}


def test_plan_is_codegen_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = c4_clean(docs)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "Python" not in final
    assert "Exchange" not in final


def test_blocklist_word_boundaries(spark):
    """The bad-words rule rejects whole documents on word-boundary
    matches only — 'assess' must not trip a blocklist entry 'ass'."""
    ok = "A good sentence with five words here.\n" * 3
    rows = c4_clean(
        spark.createDataFrame(
            [
                (1, ok),
                (2, ok + "We assess the quality of results carefully."),
                (3, ok + "This page contains one BadWord right here."),
                (4, ok + "badword appears lowercase at line start too."),
            ],
            "doc_id long, text string",
        ),
        blocklist=("badword", "ass"),
    ).collect()
    keep = {r["doc_id"]: r["c4_keep"] for r in rows}
    assert keep == {1: True, 2: True, 3: False, 4: False}
    # empty blocklist leaves behavior unchanged
    base = c4_clean(
        spark.createDataFrame([(2, ok + "We assess it.")],
                              "doc_id long, text string")
    ).head()
    assert base["c4_keep"] is True
