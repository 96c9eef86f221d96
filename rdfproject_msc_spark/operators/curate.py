"""Corpus curation: the composed training-data pipeline, end to end.

This is the operator a 100 TB pre-training corpus actually runs nightly —
the individual stages (exact dedup, near-dup removal, quality scoring,
token budgeting) composed into ONE lazy DataFrame plan, so Catalyst
optimizes across stage boundaries (e.g. the quality-filter predicate
prunes documents before the near-dup join sees them when legal).

Pipeline (each stage is the already-oracle-checked operator):
1. exact dedup        keep min-id per distinct text (dedup.exact_dedup)
2. near-dup removal   MinHash-LSH pairs at a Jaccard threshold; the HIGHER
                      id of every verified pair is dropped (deterministic
                      canonical choice; transitive chains collapse to the
                      min id because pairs are emitted for every qualifying
                      edge, not just a spanning set)
3. quality filter     textstats quality_score ≥ min_quality
4. budget accounting  corpus stats: surviving docs, BPE-ish token total
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators import dedup, textstats


def curate(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    near_dup_threshold: float = 0.5,
    min_quality: float = 0.3,
    min_partitions: int | None = None,
) -> DataFrame:
    """Surviving documents with quality + token columns attached."""
    uniq = dedup.exact_dedup(df, content_col, id_col)
    pairs = dedup.minhash_lsh_pairs(
        uniq,
        content_col,
        id_col,
        threshold=near_dup_threshold,
        min_partitions=min_partitions,
    )
    # drop the higher id of every near-dup pair (left-anti join on id_b);
    # id_a < id_b always, so the minimum of each near-dup cluster survives
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    kept = uniq.join(drops, id_col, "left_anti")
    scored = textstats.with_text_stats(kept, content_col)
    survivors = scored.filter(F.col("quality_score") >= min_quality)
    return textstats.with_token_counts(survivors, content_col)


def curate_stats(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    near_dup_threshold: float = 0.5,
    min_quality: float = 0.3,
    min_partitions: int | None = None,
) -> DataFrame:
    """One-row corpus budget: surviving docs, chars, BPE-ish tokens."""
    survivors = curate(
        df, content_col, id_col, near_dup_threshold, min_quality, min_partitions
    )
    return survivors.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length(F.col(content_col)).cast("long")).alias("total_chars"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
    )
