"""Deduplication operators over a document corpus.

Scale notes: exact dedup is a single hash aggregation (map-side partial
combine, AQE-coalesced); the content key is hashed (xxhash64 + length) before
grouping so the shuffle carries 16 bytes per row instead of full document
text — at 100 TB that is the difference between a feasible and an infeasible
shuffle. Collision safety: group on (hash, length) then verify within group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per distinct content value.

    Returns all original columns of the surviving rows.
    """
    w = Window.partitionBy(content_col).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup_keys(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Dedup summary: one row per distinct content with the kept id and the
    duplicate count — the scale-path variant (shuffles hashes, not text)."""
    hashed = df.select(
        F.col(id_col),
        F.xxhash64(F.col(content_col)).alias("content_hash"),
        F.length(F.col(content_col)).cast("long").alias("content_len"),
    )
    return hashed.groupBy("content_hash", "content_len").agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("n_dups"),
    )


def ngram_shingles(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Word n-gram shingle set per document (JVM-side: split + transform).

    Foundation for MinHash/Jaccard near-dup. Output: (id, shingle) pairs,
    distinct — i.e. the shingle *set*, exploded for distributed processing.
    """
    toks = F.split(F.trim(F.col(content_col)), r"\s+")
    # windows of n consecutive tokens, joined by single spaces
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity ≥ threshold (exact, via the
    inverted-index join — no O(n²) cartesian: pairs sharing zero shingles
    never meet).

    At 100 TB this is the verification stage run AFTER MinHash-LSH candidate
    generation; standalone it is exact but shuffle-heavy on hot shingles
    (stop-shingle removal / LSH pre-filter is the scale path).
    """
    sh = ngram_shingles(df, content_col, id_col, n).withColumnRenamed(id_col, "id")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")
