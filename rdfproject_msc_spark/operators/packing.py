"""Sequence packing: assign documents to fixed token-budget packs.

LLM training consumes fixed-length sequences; short documents are packed
together ("sequence packing") so padding doesn't dominate the batch.  The
operator here is the static form: documents in a deterministic order, a
running token total, and pack k = the documents whose running total lands
in [k*budget, (k+1)*budget).  Every pack's payload is ≤ budget +
max_doc_tokens; a document longer than the budget gets a pack of its own
(chunking oversized docs is an upstream concern).

The running total is a GLOBAL prefix sum — the naive Spark formulation
(``Window.orderBy(id)`` with no partition key) collapses to a single
partition and dies at scale.  This implements the textbook two-phase
distributed prefix sum instead, entirely with DataFrame ops:

  1. bucket rows by id range (deterministic, data-independent);
  2. aggregate per-bucket token totals — a tiny relation (one row per
     bucket), prefix-summed with a window over bucket ids only;
  3. broadcast-join the bucket offsets back and window-cumsum WITHIN each
     bucket (partitioned, parallel);
  4. global running total = bucket offset + within-bucket prefix.

Stage 2's single-partition window touches #buckets rows (bounded by
id_range/bucket_size, never by data volume); every data-sized stage is
hash/range-parallel.  The whole thing is two shuffles (bucket agg +
within-bucket window) and one broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    bucket_size: int = 4096,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Add a ``pack_id`` column: floor(running-token-total-before / budget)
    over rows ordered by ``id_col``.  Deterministic given ids and counts.

    ``bucket_size`` bounds stage 2: with ids 0..N the bucket relation has
    N/bucket_size rows.  At 100 TB with 10^12 docs and bucket_size 10^6,
    that's a 10^6-row single-partition window — trivial — while stages 3-4
    stay fully parallel."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # compound ordering (chunked/upsampled examples: (doc_id, copy,
    # chunk_id)): buckets still derive from the DENSE leading id, the
    # within-bucket window orders by the full key — same two-phase shape
    order_cols = order_cols or [id_col]
    bucket = F.floor(F.col(id_col) / F.lit(bucket_size)).cast("long").alias("bucket")
    with_bucket = df.withColumn("bucket", bucket)

    totals = with_bucket.groupBy("bucket").agg(
        F.sum(F.col(token_col)).alias("bucket_tokens")
    )
    # prefix over the tiny bucket relation: offset = tokens BEFORE bucket
    w_buckets = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_buckets), F.lit(0)).alias(
            "bucket_offset"
        ),
    )

    w_within = (
        Window.partitionBy("bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        with_bucket.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "cum_before",
            F.col("bucket_offset")
            + F.coalesce(F.sum(F.col(token_col)).over(w_within), F.lit(0)),
        )
        .withColumn(
            "pack_id", (F.col("cum_before") / F.lit(budget)).cast("long")
        )
        .drop("bucket", "bucket_offset", "cum_before")
    )


def pack_stats(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-pack rollup of a ``pack_documents`` result: document count and
    token payload per pack — the pack-utilization histogram a training
    pipeline monitors (payload/budget is the padding waste)."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).alias("n_tokens"),
    )
