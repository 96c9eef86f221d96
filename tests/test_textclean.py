"""Text normalization + PII redaction (operators/textclean.py): crafted
cases plus the cross-engine DuckDB oracle over the documents table."""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators import textclean
from rdfproject_msc_spark.sources.tables import load_table


def test_normalize_and_redact_crafted(spark):
    rows = [
        (1, "  Hello\tWORLD\x00!  "),
        (2, "mail me at Bob.smith+x@Example.co.uk today"),
        (3, "call +1 (555) 123-4567 or 192.168.0.1"),
        (4, "version 2 of part 7 stays untouched"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.text_clean, r.n_redactions)
        for r in textclean.with_clean_text(df).collect()
    }
    assert out[1] == ("hello world !", 0)
    assert out[2] == ("mail me at <EMAIL> today", 1)
    assert out[3] == ("call <PHONE> or <IP>", 2)
    assert out[4] == ("version 2 of part 7 stays untouched", 0)
    assert out[5] == ("", 0)


def test_clean_text_matches_duckdb_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r.doc_id: (r.text_clean, r.n_redactions)
        for r in textclean.with_clean_text(docs)
        .select("doc_id", "text_clean", "n_redactions")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    rows = con.execute(
        rf"""
        WITH norm AS (
            SELECT doc_id,
                   lower(trim(regexp_replace(
                       regexp_replace(text, '{textclean.CONTROL_CLASS}', ' ', 'g'),
                       '\s+', ' ', 'g'))) AS t
            FROM documents
        ),
        red AS (
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(t, '{textclean.EMAIL_PATTERN}', '<EMAIL>', 'g'),
                           '{textclean.IPV4_PATTERN}', '<IP>', 'g'),
                       '{textclean.PHONE_PATTERN}', '<PHONE>', 'g') AS tc
            FROM norm
        )
        SELECT doc_id, tc,
               CAST(len(string_split_regex(tc, '<EMAIL>|<PHONE>|<IP>')) - 1
                    AS BIGINT)
        FROM red
        """
    ).fetchall()
    want = {r[0]: (r[1], r[2]) for r in rows}
    assert got == want
