"""One-call corpus report: the numbers an operator asks of 100 TB before
and after every pipeline stage — volume, token budget, composition,
duplication, and filter pass-rates — as one tall (metric, value) frame.

Shape: every metric is computed in ONE aggregation over one scan (per-row
projections feed map-side-combined aggregates; the distinct counts are the
only expand), producing a single wide row that unpivots via ``stack``. No
joins, no windows; the report over a 100 TB corpus costs one pass. Exact
distinct counts are deliberate at report cadence (daily, per-delivery);
the streaming/incremental tier for continuously-maintained versions of
these numbers is operators/sketches.py (mergeable bitmap/HLL partials).

Duplication rate counts distinct (xxhash64(text), length) pairs — the
16-byte exact-dedup key of operators/dedup.py, so the report's dup_rate
agrees with what ``exact_dedup_keys`` would remove (collision mass ~2⁻⁶⁴,
the documented engine-wide convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.c4filter import c4_clean
from rdfproject_msc_spark.operators.gopher import with_gopher_rules
from rdfproject_msc_spark.operators.textstats import (
    token_count,
    token_count_bpe,
)


def corpus_report(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(metric: string, value: double), ordered by metric name.

    Metrics: n_docs, n_ws_tokens, n_bpe_tokens, total_bytes, n_sources,
    n_langs, dup_rate (1 − distinct texts / docs), gopher_pass_rate,
    c4_keep_rate, mean_doc_tokens."""
    c = F.col(content_col)
    scored = c4_clean(with_gopher_rules(docs, content_col), content_col)
    row = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(c)).alias("n_ws_tokens"),
        F.sum(token_count_bpe(c)).alias("n_bpe_tokens"),
        F.sum(F.octet_length(c)).alias("total_bytes"),
        F.countDistinct(F.col("source")).alias("n_sources"),
        F.countDistinct(F.col("lang")).alias("n_langs"),
        F.countDistinct(F.xxhash64(c), F.length(c)).alias("__n_distinct"),
        F.avg(F.col("gopher_pass").cast("double")).alias("gopher_pass_rate"),
        F.avg(F.col("c4_keep").cast("double")).alias("c4_keep_rate"),
        F.avg(token_count(c).cast("double")).alias("mean_doc_tokens"),
    ).select(
        F.col("n_docs").cast("double"),
        F.col("n_ws_tokens").cast("double"),
        F.col("n_bpe_tokens").cast("double"),
        F.col("total_bytes").cast("double"),
        F.col("n_sources").cast("double"),
        F.col("n_langs").cast("double"),
        (
            F.lit(1.0)
            - F.col("__n_distinct")
            / F.greatest(F.col("n_docs"), F.lit(1)).cast("double")
        ).alias("dup_rate"),
        F.round("gopher_pass_rate", 6).alias("gopher_pass_rate"),
        F.round("c4_keep_rate", 6).alias("c4_keep_rate"),
        F.round("mean_doc_tokens", 6).alias("mean_doc_tokens"),
    )
    metrics = [
        "n_docs",
        "n_ws_tokens",
        "n_bpe_tokens",
        "total_bytes",
        "n_sources",
        "n_langs",
        "dup_rate",
        "gopher_pass_rate",
        "c4_keep_rate",
        "mean_doc_tokens",
    ]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return (
        row.selectExpr(f"stack({len(metrics)}, {stack}) AS (metric, value)")
        .orderBy("metric")
    )
