"""Corpus-wide exact PASSAGE deduplication (span-level dedup).

Document-level dedup (operators/dedup.py) removes whole near/exact
duplicate documents; this operator removes REPEATED SPANS across the
corpus — boilerplate headers, license blocks, templated paragraphs —
the complement studied in "Deduplicating Training Data Makes Language
Models Better" (Lee et al., 2022), where exact substring dedup removed
more duplicated text than document-level MinHash alone.

Spark-first design (no suffix arrays — those are single-machine):
documents chunk into consecutive k-word passages (a codegen
split/slice, zero shuffle), every distinct passage keeps only its
corpus-FIRST occurrence (min (doc_id, position) — an associative
aggregate with map-side combine, ONE data shuffle; deliberately NOT a
window: a passage duplicated across millions of documents is exactly
the hot key that serializes a window partition at 100 TB), and
documents reassemble from their surviving passages (one doc_id-keyed
shuffle). Total: the explode is pipeline-local, 3 keyed shuffles, no
all-pairs, no windows, no Python.

Determinism: "first occurrence" is ordered by (doc_id, position) —
stable under re-partitioning and re-runs, unlike keep-any-one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def passage_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Remove every repeated k-word passage, keeping the corpus-first
    occurrence; returns ``(id_col, text, n_passages, n_dropped)`` with
    ``text`` rebuilt from the surviving passages in document order (a
    document whose every passage is elsewhere-first ends up empty — the
    fully-boilerplate case a downstream length filter then drops)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(k)).cast("int")
    # consecutive non-overlapping k-word passages: a codegen slice per
    # index — whole-stage codegen, no UDF
    chunk_texts = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.array_join(
            F.slice(words, i * F.lit(k) + F.lit(1), F.lit(k)), " "
        ),
    )
    chunks = docs.select(
        F.col(id_col).alias("__did"),
        F.posexplode(chunk_texts).alias("__idx", "__passage"),
    )
    # corpus-first occurrence per distinct passage: min over the
    # (doc_id, position) struct — partial aggregation combines map-side,
    # so a passage repeated a million times ships ONE row per task
    first = chunks.groupBy("__passage").agg(
        F.min(F.struct("__did", "__idx")).alias("__first")
    )
    kept = chunks.join(first, "__passage").withColumn(
        "__keep",
        F.struct("__did", "__idx") == F.col("__first"),
    )
    # reassemble: collect_list skips the NULLed dropped passages; the
    # array_sort on (idx, passage) structs restores document order
    surviving = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("__keep"), F.struct("__idx", "__passage"))
            )
        ),
        lambda s: s["__passage"],
    )
    return (
        kept.groupBy("__did")
        .agg(
            F.array_join(surviving, " ").alias(text_col),
            F.count("*").alias("n_passages"),
            F.count(F.when(~F.col("__keep"), 1)).alias("n_dropped"),
        )
        .withColumnRenamed("__did", id_col)
    )
