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
documents reassemble from the SURVIVOR rows of that aggregate alone
(one doc_id-keyed shuffle of the deduplicated passages — the full
chunk relation is never joined back or shuffled a second time; per-doc
totals come from the document row itself, so dropped counts are
totals minus survivors). Total: the explode is pipeline-local, 2 data
shuffles + a per-document-row join, no all-pairs, no windows, no
Python.

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
    # consecutive non-overlapping k-word passages, with the word array
    # LET-BOUND via a single-element transform (r12): the lambda body's
    # ``slice(words, ...)`` captured the split expression, and a
    # higher-order function evaluates its body per element — the text was
    # re-split once per passage. Binding evaluates the split once per row
    # (the _shingled/word_ngrams fix; identical chunk arrays).
    chunk_texts = F.element_at(
        F.transform(
            F.array(words),
            lambda ws: F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(ws) / F.lit(k)).cast("int") - F.lit(1),
                ),
                lambda i: F.array_join(
                    F.slice(ws, i * F.lit(k) + F.lit(1), F.lit(k)), " "
                ),
            ),
        ),
        1,
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
    # the SURVIVORS are exactly the rows of `first` — no join back onto
    # the full chunk relation (which would re-shuffle every chunk of
    # every document a second time just to mark the losers): reassembly
    # aggregates the survivor rows alone, and the per-document totals
    # come straight from the document row (n_chunks is a per-row
    # expression), so dropped counts are totals minus survivors.
    surv = first.select(
        F.col("__first.__did").alias("__did"),
        F.col("__first.__idx").alias("__idx"),
        "__passage",
    )
    # reassemble: array_sort on (idx, passage) structs restores document
    # order over the surviving passages only
    surviving = F.transform(
        F.array_sort(F.collect_list(F.struct("__idx", "__passage"))),
        lambda s: s["__passage"],
    )
    surv_agg = surv.groupBy("__did").agg(
        F.array_join(surviving, " ").alias("__text"),
        F.count("*").alias("__n_kept"),
    )
    # one row per document that produced >= 1 chunk (split() never yields
    # an empty array, so only NULL text is excluded — matching posexplode)
    totals = docs.select(
        F.col(id_col).alias("__did"), n_chunks.cast("long").alias("__n")
    ).filter(F.col("__n") >= 1)
    return totals.join(surv_agg, "__did", "left").select(
        F.col("__did").alias(id_col),
        # a document whose every passage is elsewhere-first has no
        # survivor rows at all — it reassembles to the empty string
        F.coalesce(F.col("__text"), F.lit("")).alias(text_col),
        F.col("__n").alias("n_passages"),
        (F.col("__n") - F.coalesce(F.col("__n_kept"), F.lit(0))).alias(
            "n_dropped"
        ),
    )
