"""Repetition metrics (Gopher-style): hand-computed unit cases, the
zero-shuffle plan pin, and a DuckDB oracle twin over the real documents
table (the registry window is full — §8 registry-sizing note — so the
cross-engine oracle lives here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.textstats import (
    max_run_length,
    with_repetition_stats,
)
from rdfproject_msc_spark.sources.tables import load_table
from tests.oracle import duck_connect


def test_max_run_length(spark):
    df = spark.createDataFrame(
        [(["a", "b", "a", "a"],), (["x"],), ([],)],
        "arr array<string>",
    )
    got = [r[0] for r in df.select(max_run_length(F.col("arr"))).collect()]
    assert got == [3, 1, 0]


def test_repetition_hand_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),   # one bigram repeated
            (2, "a b c d e f g"),              # no repetition
            (3, "go go go stop go go go stop"),
            (4, "x"),                          # too short → 0.0, not flagged
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            round(r.top_bigram_frac, 6),
            round(r.dup_trigram_frac, 6),
            r.repetitive,
        )
        for r in with_repetition_stats(df).collect()
    }
    # doc1: bigrams = 4×"spam spam" → top 1.0; trigrams 3 all equal → dup 2/3
    assert got[1] == (1.0, round(2 / 3, 6), True)
    # doc2: 6 distinct bigrams → 1/6; 5 distinct trigrams → 0.0
    assert got[2] == (round(1 / 6, 6), 0.0, False)
    # doc3: bigrams: go-go ×4 of 7 → 4/7; trigrams: 6 occurrences of 4
    # distinct ("go go go" ×2, "go go stop" ×2, rest unique) → 1 - 4/6
    assert got[3] == (round(4 / 7, 6), round(1 - 4 / 6, 6), True)
    assert got[4] == (0.0, 0.0, False)


def test_repetition_zero_shuffle(spark):
    df = spark.createDataFrame(
        [(i, "w a b c " * 5) for i in range(10)], "doc_id long, text string"
    )
    plan = (
        with_repetition_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_repetition_matches_oracle(spark, sf_dir):
    """Cross-engine oracle: the per-row HOF run-length equals the unnest +
    group-count formulation DuckDB evaluates (same normalization, same
    guards); float division is exact IEEE on both sides."""
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r.doc_id: (r.top_bigram_frac, r.dup_trigram_frac, r.repetitive)
        for r in with_repetition_stats(docs)
        .select("doc_id", "top_bigram_frac", "dup_trigram_frac", "repetitive")
        .collect()
    }
    con = duck_connect(sf_dir)
    rows = con.execute(
        """
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '') AS toks
    FROM documents
),
g AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= 2
                THEN list_transform(range(1, len(toks)),
                                    i -> array_to_string(toks[i:i+1], ' '))
                ELSE [] END AS g2,
           CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> array_to_string(toks[i:i+2], ' '))
                ELSE [] END AS g3
    FROM tok
),
top AS (
    SELECT doc_id, max(c) AS mx, sum(c) AS tot
    FROM (SELECT doc_id, ng, count(*) AS c
          FROM (SELECT doc_id, unnest(g2) AS ng FROM g)
          GROUP BY doc_id, ng)
    GROUP BY doc_id
)
SELECT g.doc_id,
       CASE WHEN len(g2) > 0
            THEN CAST(coalesce(mx, 0) AS DOUBLE)
                   / CAST(greatest(coalesce(tot, 0), 1) AS DOUBLE)
            ELSE 0.0 END AS top2,
       CASE WHEN len(g3) > 0
            THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
                         / CAST(greatest(len(g3), 1) AS DOUBLE)
            ELSE 0.0 END AS dup3
FROM g LEFT JOIN top USING (doc_id)
"""
    ).fetchall()
    assert len(rows) == len(got)
    for doc_id, top2, dup3 in rows:
        st2, sd3, rep = got[doc_id]
        assert abs(st2 - top2) < 1e-12 and abs(sd3 - dup3) < 1e-12, doc_id
        assert rep == (top2 > 0.18 or dup3 > 0.30)
