"""Corpus n-gram statistics — JVM-side, zero Python on the data path.

Top-K most frequent word n-grams over a document corpus: the quality-
analysis primitive behind stopword lists, boilerplate detection and
contamination triage (the most frequent n-grams of a crawl ARE its
boilerplate). All column expressions: tokenize with one regex split,
build n-grams with `transform(sequence(...))` inside whole-stage
codegen, explode, and aggregate.

Scale shape: the (ngram → count) aggregation map-side combines before
its single shuffle (one row per distinct gram per partition — Zipf
makes the hot grams combine hardest, exactly where it matters), and the
top-K is `TakeOrderedAndProject` (per-partition heaps + one driver
merge of K-row heads), never a global sort. Hot-key skew is irrelevant:
an aggregation's hot KEY is one combined row per partition, unlike a
window's hot partition.

The reference has no text analytics at all; this extends the engine's
textstats family (SURVEY.md north-star operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col):
    """Lowercased whitespace tokens; [] for blank text. Twin of the
    DuckDB oracle's `string_split_regex(trim(lower(text)), '\\s+')`."""
    t = F.trim(F.lower(text_col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def ngram_counts(
    docs: DataFrame, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """(ngram, c): corpus-wide counts of word `n`-grams (space-joined,
    lowercased). One explode + one combined aggregation."""
    if n < 1:
        raise ValueError("n must be >= 1")
    base = docs.select(_tokens(F.col(text_col)).alias("t"))
    if n == 1:
        grams = F.col("t")
    else:
        # t[i..i+n-1] joined by spaces; guard short docs (sequence() with
        # start > stop counts DOWN in Spark — never call it that way)
        parts = ", ".join(f"t[i + {j}]" for j in range(n))
        grams = F.when(
            F.size(F.col("t")) >= n,
            F.expr(
                f"transform(sequence(0, size(t) - {n}), "
                f"i -> concat_ws(' ', {parts}))"
            ),
        ).otherwise(F.array().cast("array<string>"))
    return (
        base.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def top_ngrams(
    docs: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-`k` n-grams by count, deterministic (count desc, gram asc
    tiebreak) — compiles to TakeOrderedAndProject over the combined
    aggregation."""
    return (
        ngram_counts(docs, n=n, text_col=text_col)
        .orderBy(F.col("c").desc(), F.col("ngram"))
        .limit(k)
    )
