"""Document chunking: split long documents into (optionally overlapping)
token windows — the step that turns curated documents into training-ready
sequences when a model's context is shorter than a document, and the
retrieval-side twin (passage windows) of the packing operator.

Spark-first shape: tokenize once per row (`F.split`), derive the chunk
count arithmetically, `explode` a bounded index sequence and `slice` the
token array per chunk — all JVM column expressions inside whole-stage
codegen, zero Python, zero shuffle. The chunk multiset is exactly the
per-document loop a single-node pipeline would write; chunk ids are
deterministic (doc id × position), so re-runs and incremental appends
produce identical chunks.

At 100 TB: the explode multiplies rows by ~n_tokens/stride but every
produced row is a bounded slice of an already-loaded array — no state, no
shuffle; downstream ops (dedup on chunks, packing, mixture sampling) see
a plain DataFrame. Skew from pathological single documents is bounded by
max_tokens × the explode fan-out of that one row, which AQE splits like
any other oversized partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    content_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per token window: chunk i covers tokens
    [i·stride, i·stride + max_tokens) with stride = max_tokens − overlap.
    Output columns: ``id_col``, ``chunk_id`` (0-based), ``chunk`` (the
    window's tokens re-joined with single spaces — the canonical
    whitespace form), ``n_tokens`` (window size; only the last chunk of a
    document may be short). Empty/whitespace-only documents produce ZERO
    chunks (nothing to train on), and a document never yields a trailing
    window that adds no new tokens."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got overlap={overlap}, "
            f"max_tokens={max_tokens}"
        )
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(content_col)), r"\s+")
    n = F.when(F.trim(F.col(content_col)) == "", F.lit(0)).otherwise(
        F.size(toks)
    )
    # 1 window when n <= max_tokens, else 1 + ceil((n - max_tokens)/stride)
    # extra windows, each contributing >= 1 new token
    n_chunks = F.when(n == 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.floor(
            (F.greatest(n - F.lit(max_tokens), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        ).cast("int")
    )
    carried = [F.col(c) for c in carry_cols]
    out = (
        df.select(
            F.col(id_col),
            *carried,
            toks.alias("__toks"),
            n_chunks.alias("__nc"),
        )
        .filter(F.col("__nc") > 0)
        .select(
            F.col(id_col),
            *carried,
            F.explode(
                F.sequence(F.lit(0), F.col("__nc") - 1)
            ).alias("chunk_id"),
            F.col("__toks"),
        )
    )
    window = F.slice(
        F.col("__toks"), F.col("chunk_id") * F.lit(stride) + 1, max_tokens
    )
    return out.select(
        F.col(id_col),
        *carried,
        F.col("chunk_id"),
        F.array_join(window, " ").alias("chunk"),
        F.size(window).cast("long").alias("n_tokens"),
    )
