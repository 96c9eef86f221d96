"""Benchmark decontamination: flag training documents whose word n-grams
overlap an evaluation/benchmark set.

The standard large-corpus hygiene step (n-gram-overlap decontamination, as
popularized by the GPT-3/PaLM data cards): any training document sharing too
many distinct word n-grams with a held-out benchmark is flagged so eval
numbers are not inflated by memorized test data.

100 TB design:
- The benchmark side is an EVAL SET — megabytes, bounded by construction —
  so its distinct n-gram set is broadcast; the corpus side is never
  shuffled by n-gram. The whole operator is one broadcast hash join plus
  ONE aggregation shuffle keyed by doc id.
- N-grams are derived per-row with built-in array functions (split /
  transform / slice / array_distinct) — JVM-side, whole-stage-codegen'd,
  no Python anywhere.
- Per-row ``array_distinct`` happens BEFORE the explode, so the exploded
  relation is already unique per (doc, n-gram) and needs no pre-join
  de-duplication shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(col: Column, n: int, *, distinct: bool = True) -> Column:
    """Word n-grams of a text column, as an array<string> (distinct by
    default; ``distinct=False`` keeps every occurrence, which repetition
    metrics need for frequency counting).

    Normalization: lowercase, non-alphanumeric runs collapse to one space.
    Tokens shorter than n yield an empty array (guarded — Spark's
    ``sequence(1, m)`` would count DOWN for m < 1, not return empty).
    """
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "), " "),
        lambda t: t != "",
    )

    # LET-BIND the token array via a single-element transform (r12): the
    # gram lambda's ``slice(toks, i, n)`` captured the whole
    # normalize+split+filter tree, and a higher-order function evaluates
    # its lambda body per element — the text was re-normalized once per
    # gram. Binding evaluates it once per row (measured 10-16× at sf0.1;
    # identical arrays, element for element, pinned for n=1,2,5 ×
    # distinct true/false before landing).
    def _grams(tk: Column) -> Column:
        g = F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        )
        return F.when(F.size(tk) >= n, g).otherwise(
            F.array().cast("array<string>")
        )

    out = F.element_at(F.transform(F.array(toks), _grams), 1)
    return F.array_distinct(out) if distinct else out


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 5,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
    bloom_fpp: float | None = None,
    bloom_filter=None,
) -> DataFrame:
    """Per-document benchmark-overlap report.

    Returns ``(id_col, n_ngrams, n_matched, overlap_frac, contaminated)``:
    distinct n-grams in the document, how many also occur anywhere in the
    benchmark, their ratio, and the ``overlap_frac >= threshold`` flag
    (documents with no n-grams are never contaminated).

    ``bloom_fpp`` switches on the Bloom pre-filter path: a bounded bit
    array is built over the benchmark's n-grams (operators/bloom.py, one
    extra bounded-size job) and the probe runs as a codegen filter in the
    SAME stage as the explode — rows are discarded in the generate
    pipeline before they ever reach an exchange. At 100 TB this shrinks
    the relation feeding the join from |corpus n-grams| to |true matches|
    + the chosen false-positive sliver (~fpp · |corpus n-grams|), and
    results are BIT-IDENTICAL to the join-only plan: the filter has no
    false negatives, and false positives fail the exact join that follows.

    Physical shape (deliberate): ``posexplode`` of the n-gram array with
    one appended NULL sentinel, then ``isnull(ng) OR might_contain(ng)``.
    The sentinel's 0-based position IS the document's total n-gram count,
    so no ``size()`` column rides along — the earlier formulation
    (``size(ngs)`` next to a higher-order ``filter(ngs, bloom)`` in one
    projection) made Catalyst inline the whole n-gram pipeline into both
    expressions and went ~14× slower at 10× scale; probing per exploded
    row keeps each n-gram hashed exactly twice (Kirsch-Mitzenmacher) in
    one whole-stage-codegen pass. The sentinel also restores the
    ``explode_outer`` guarantee that zero-n-gram documents keep a row.
    """
    bench_ng = (
        benchmark.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("ng")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    use_bloom = bloom_fpp is not None or bloom_filter is not None
    if use_bloom:
        if bloom_filter is not None:
            # prebuilt (streaming reuses ONE build across micro-batches)
            bf = bloom_filter
        else:
            from rdfproject_msc_spark.operators import bloom as _bloom

            n_bench = bench_ng.count()
            bits, hashes = _bloom.optimal_geometry(n_bench, bloom_fpp)
            bf = _bloom.bloom_build(
                bench_ng, "ng", num_bits=bits, num_hashes=hashes
            )
        ngs = word_ngrams(F.col(text_col), n)
        sentineled = F.concat(ngs, F.array(F.lit(None).cast("string")))
        exploded = docs.select(
            F.col(id_col),
            F.posexplode(sentineled).alias("__pos", "ng"),
        ).filter(F.col("ng").isNull() | bf.might_contain(F.col("ng")))
    else:
        exploded = docs.select(
            F.col(id_col),
            F.explode_outer(word_ngrams(F.col(text_col), n)).alias("ng"),
        )
    # eval benchmarks are MBs by construction → broadcast; a HOLDOUT
    # SPLIT of the corpus itself (leakage_safe_split) is a constant
    # fraction of the data and must shuffle-hash-join instead
    # (broadcast_benchmark=False) — the bench side is distinct per
    # n-gram, so hot n-grams never multiply rows
    bench_side = F.broadcast(bench_ng) if broadcast_benchmark else bench_ng
    joined = exploded.join(bench_side, "ng", "left")
    if use_bloom:
        # every doc keeps exactly one NULL-sentinel row whose position is
        # its total n-gram count (the sentinel never matches the join)
        counted = joined.groupBy(id_col).agg(
            F.max(
                F.when(F.col("ng").isNull(), F.col("__pos"))
            ).cast("long").alias("n_ngrams"),
            F.count("__hit").alias("n_matched"),
        )
    else:
        counted = joined.groupBy(id_col).agg(
            F.count("ng").alias("n_ngrams"),
            F.count("__hit").alias("n_matched"),
        )
    frac = F.col("n_matched").cast("double") / F.greatest(
        F.col("n_ngrams"), F.lit(1)
    ).cast("double")
    return counted.select(
        F.col(id_col),
        "n_ngrams",
        "n_matched",
        frac.alias("overlap_frac"),
        (
            (F.col("n_ngrams") > 0)
            & (frac >= F.lit(float(threshold)))
        ).alias("contaminated"),
    )
