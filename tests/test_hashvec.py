"""Feature-hashing vectorizer: DuckDB oracle (exact — md5 nibble
arithmetic is cross-engine), empty-doc handling, and composition with the
similarity stack (near-dup documents land near cosine 1)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.hashvec import hash_embed
from rdfproject_msc_spark.sources.tables import load_table
from tests.oracle import duck_connect

DIM = 16


def _hex_sql(src: str, start: int, n: int) -> str:
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({src}), {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    )
    return f"({terms})"


def test_matches_duckdb_oracle(spark, sf_dir):
    got = {
        r.doc_id: list(r.embedding)
        for r in hash_embed(
            load_table(spark, sf_dir, "documents"), dim=DIM
        ).collect()
    }
    con = duck_connect(sf_dir)
    rows = con.execute(
        f"""
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split(regexp_replace(lower(text),
                  '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')) AS token
    FROM documents
),
h AS (
    SELECT doc_id,
           CAST({_hex_sql('token', 1, 6)} % {DIM} AS BIGINT) AS idx,
           CASE WHEN {_hex_sql('token', 7, 1)} % 2 = 0 THEN 1.0 ELSE -1.0 END AS sgn
    FROM tok
),
sparse AS (
    SELECT doc_id, idx, sum(sgn) AS w FROM h GROUP BY doc_id, idx
),
maps AS (
    SELECT doc_id, map(list(idx), list(w)) AS m FROM sparse GROUP BY doc_id
)
SELECT d.doc_id,
       list_transform(range(0, {DIM}),
                      i -> coalesce(element_at(m, i)[1], 0.0)) AS v
FROM (SELECT doc_id FROM documents) d
LEFT JOIN maps USING (doc_id)
"""
    ).fetchall()
    assert len(rows) == len(got)
    for doc_id, v in rows:
        v = [float(x) for x in v]  # duckdb sums the decimal literals
        nrm = float(np.sqrt(sum(x * x for x in v)))
        want = [x / nrm if nrm else 0.0 for x in v]
        assert np.allclose(got[doc_id], want, atol=1e-6), doc_id


def test_empty_and_unit_norm(spark):
    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, ""), (3, "...")],
        "doc_id long, text string",
    )
    got = {r.doc_id: np.array(r.embedding) for r in hash_embed(df, dim=8).collect()}
    assert len(got[2]) == 8 and not got[2].any()
    assert not got[3].any()  # punctuation-only → no tokens → zero vector
    assert abs(np.linalg.norm(got[1]) - 1.0) < 1e-6


def test_near_dup_docs_have_high_cosine(spark, sf_dir):
    """Composition: the corpus' known near-duplicate text pairs score near
    cosine 1 on the hashed embeddings while a random pair does not — the
    property that makes hash_embed a usable input for cosine_neardup/ANN."""
    docs = load_table(spark, sf_dir, "documents")
    emb = hash_embed(docs, dim=64)
    v = {r.doc_id: np.array(r.embedding) for r in emb.collect()}

    # find the most-similar text pair via exact token-set Jaccard (driver
    # side at sf0.001 scale) to avoid hardcoding ids
    texts = {r.doc_id: set(r.text.lower().split()) for r in docs.collect()}
    ids = sorted(texts)
    best, best_j = None, -1.0
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = texts[ids[i]], texts[ids[j]]
            jac = len(a & b) / max(len(a | b), 1)
            if jac > best_j:
                best, best_j = (ids[i], ids[j]), jac
    a, b = best
    cos = float(v[a] @ v[b])
    assert best_j > 0.5  # the corpus does contain near-dups
    assert cos > 0.8
    # an arbitrary low-jaccard pair scores clearly lower
    lo = next(
        (x, y)
        for x in ids
        for y in ids
        if x < y
        and len(texts[x] & texts[y]) / max(len(texts[x] | texts[y]), 1) < 0.3
    )
    assert float(v[lo[0]] @ v[lo[1]]) < cos - 0.1
