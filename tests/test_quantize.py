"""Embedding int8 quantization (operators/quantize.py): cross-engine oracle
for the quantization arithmetic, reconstruction-error bound, and recall of
the quantized-scan + exact-rerank top-k against the exact operator."""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators import quantize, similarity
from rdfproject_msc_spark.sources.tables import load_table


def test_quantize_matches_duckdb_oracle(spark, sf_dir):
    """qvec and scale match DuckDB computing the same floor(x+0.5)
    arithmetic — the round rule both engines evaluate identically."""
    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        r.vec_id: (round(r.scale, 9), list(r.qvec))
        for r in quantize.quantize_embeddings(emb).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}')"
    )
    rows = con.execute(
        """
        WITH s AS (
            SELECT vec_id,
                   list_max(list_transform(embeddings.embedding,
                        x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
                   embedding
            FROM embeddings
        )
        SELECT vec_id, scale,
               list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
                   ELSE CAST(greatest(-127, least(127,
                        floor(CAST(x AS DOUBLE) / scale + 0.5))) AS INT)
                   END)
        FROM s
        """
    ).fetchall()
    want = {r[0]: (round(r[1], 9), list(r[2])) for r in rows}
    assert got == want


def test_dequantize_rmse_bounded(spark, sf_dir):
    """Per-vector reconstruction rmse ≤ scale/2 (the worst case of
    half-step rounding error per component)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize.quantize_embeddings(emb)
    err = quantize.dequantize_rmse(q, emb)
    bad = err.join(q.select("vec_id", "scale"), "vec_id").filter(
        F.col("rmse") > F.col("scale") * 0.5 + 1e-12
    )
    assert bad.count() == 0


def test_quantized_topk_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize.quantize_embeddings(emb)
    exact = {
        r.vec_id
        for r in similarity.cosine_topk_to(emb, query_id=0, k=10).collect()
    }
    approx = {
        r.vec_id
        for r in quantize.cosine_topk_quantized(
            q, emb, query_id=0, k=10
        ).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.9, f"recall {recall}"


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize.quantize_embeddings(df).collect()}
    assert out[1].scale == 0.0 and list(out[1].qvec) == [0, 0, 0]
    assert list(out[2].qvec)[1] == -127  # max-magnitude component saturates
