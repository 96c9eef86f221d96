"""Length-bucketed batching (operators/batching.py): deterministic
(length_bucket, batch_id) assignment via the two-phase prefix count —
pinned by a hand fixture, an exact DuckDB window twin, a no-single-
partition-exchange plan pin, and a padding-improves-over-naive check."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.batching import (
    length_bucketed_batches,
    padding_waste,
)
from rdfproject_msc_spark.sources.tables import load_table
from tests.oracle import assert_matches_oracle

# DuckDB twin (window form — fine at oracle scale; the operator itself
# deliberately avoids the per-length-bucket hot window)
BATCHES_SQL = """
WITH toks AS (
    SELECT doc_id, len(string_split(text, ' ')) AS tokens FROM documents
),
lb AS (
    SELECT doc_id, tokens,
           CASE WHEN tokens <= 1 THEN 0
                ELSE CAST(ceil(log2(tokens)) AS BIGINT) END AS length_bucket
    FROM toks
)
SELECT doc_id, tokens, length_bucket,
       CAST(floor((row_number() OVER (
           PARTITION BY length_bucket ORDER BY doc_id
       ) - 1) / 4.0) AS BIGINT) AS batch_id
FROM lb
"""


def test_batches_tiny(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate([3, 4, 4, 3, 9, 100, 3])],
        "doc_id long, tokens long",
    )
    out = {
        r.doc_id: (r.length_bucket, r.batch_id)
        for r in length_bucketed_batches(
            docs, "tokens", batch_size=2, id_col="doc_id"
        ).collect()
    }
    # bucket = ceil(log2): 3,4→2; 9→4; 100→7
    # bucket 2 members in id order: 0,1,2,3,6 → batches 0,0,1,1,2
    assert out[0] == (2, 0) and out[1] == (2, 0)
    assert out[2] == (2, 1) and out[3] == (2, 1)
    assert out[6] == (2, 2)
    assert out[4] == (4, 0)
    assert out[5] == (7, 0)


def test_batches_explicit_bounds(spark):
    docs = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 11), (4, 999)], "doc_id long, tokens long"
    )
    out = {
        r.doc_id: r.length_bucket
        for r in length_bucketed_batches(
            docs, "tokens", 8, bucket_bounds=[10, 100]
        ).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 2}


def test_batches_match_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("tokens")
    )
    got = length_bucketed_batches(docs, "tokens", batch_size=4)
    assert_matches_oracle(got, BATCHES_SQL, sf_dir)


def test_batches_no_single_partition_exchange(spark, sf_dir):
    """The two-phase prefix count must never fall back to the global /
    per-length-bucket hot window: no Exchange SinglePartition in the
    executed plan (most of a corpus lands in 2-3 length buckets — a
    bucket-partitioned window would serialize them)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("tokens")
    )
    df = length_bucketed_batches(docs, "tokens", batch_size=4)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan.split("Initial Plan")[0]


def test_length_bucketing_reduces_padding(spark):
    """On a length-skewed corpus, bucketed batches waste less padding
    than naive id-order batches of the same size."""
    rows = [(i, 10 if i % 2 == 0 else 500) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, tokens long")
    bucketed = padding_waste(
        length_bucketed_batches(docs, "tokens", 8), "tokens"
    ).collect()[0]
    naive = padding_waste(
        docs.withColumn("length_bucket", F.lit(0)).withColumn(
            "batch_id", F.floor(F.col("doc_id") / 8)
        ),
        "tokens",
    ).collect()[0]
    # alternating 10/500: every naive batch pads the short half to 500
    # (~48% waste); bucketed batches are homogeneous (0% waste)
    assert bucketed["padding_fraction"] < 0.01
    assert naive["padding_fraction"] > 0.4
