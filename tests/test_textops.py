

def test_paragraph_dedup_keeps_first_occurrence(spark):
    """Within-doc repeated-paragraph removal (r8): first occurrence of
    each distinct paragraph survives in order; distinct content is
    untouched; NULL behaves as empty."""
    from rdfproject_msc_spark.operators.textclean import (
        with_paragraph_dedup,
    )

    text = "\n".join(["nav menu", "real content one", "nav menu",
                      "real content two", "nav menu", "footer"])
    rows = {
        r["doc_id"]: r
        for r in with_paragraph_dedup(
            spark.createDataFrame(
                [(1, text), (2, "a\nb\nc"), (3, None)],
                "doc_id long, text string",
            )
        ).collect()
    }
    assert rows[1]["text_paradedup"] == "\n".join(
        ["nav menu", "real content one", "real content two", "footer"]
    )
    assert rows[1]["n_paragraphs"] == 6 and rows[1]["n_paragraphs_kept"] == 4
    assert rows[2]["text_paradedup"] == "a\nb\nc"
    assert rows[3]["text_paradedup"] == ""


def test_paragraph_dedup_matches_duckdb(spark, sf_dir):
    """Exact DuckDB twin over the corpus (list_position-based
    first-occurrence filter)."""
    import duckdb

    from rdfproject_msc_spark.operators.textclean import (
        with_paragraph_dedup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r["doc_id"], r["text_paradedup"])
        for r in with_paragraph_dedup(docs)
        .select("doc_id", "text_paradedup")
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(
        """
WITH m AS (
    SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS paras
    FROM docs
),
e AS (
    SELECT doc_id, paras,
           unnest(paras) AS p,
           unnest(range(1, len(paras) + 1)) AS i
    FROM m
),
k AS (SELECT doc_id, p, i FROM e WHERE list_position(paras, p) = i)
SELECT m.doc_id,
       coalesce(string_agg(k.p, chr(10) ORDER BY k.i), '') AS t
FROM m LEFT JOIN k USING (doc_id)
GROUP BY m.doc_id
ORDER BY m.doc_id
"""
    ).fetchall()
    assert got == [tuple(w) for w in want]
