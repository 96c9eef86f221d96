"""Feature-hashing vectorizer: text → deterministic hashed-TF embedding.

The hashing trick (signed feature hashing a la Weinberger et al. 2009):
each token maps to a dimension via a hash, with a hash-derived ±1 sign so
collisions cancel in expectation. The result is an ``array<float>``
embedding with NO trained model and NO vocabulary state — exactly the kind
of cheap, reproducible vector a 100 TB curation pipeline can afford for
every document, and the bridge from the text operators to the similarity
stack (cosine near-dup, LSH/IVF ANN, PCA all consume the output as-is).

Hash choice: md5 nibble arithmetic (sampling.hash_bucket), not xxhash64 —
md5 behaves identically in Spark, DuckDB, and Python, so the embedding is
cross-engine reproducible and the oracle twin is exact.

100 TB design: one token-explode keyed aggregation by (doc, dim-index) —
map-side combine collapses repeated tokens per partition first — then one
doc-keyed aggregation assembling the ≤dim-entry sparse map into the dense
array per row (JVM array functions; no Python). Empty documents produce
the zero vector rather than disappearing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.lmscore import _norm_tokens
from rdfproject_msc_spark.operators.sampling import hash_bucket


def hash_embed(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, embedding: array<float>) — L2-normalized signed hashed-TF.

    Token t adds sign(t) to dimension idx(t): idx = md5 hex digits 1-6
    mod dim, sign = parity of hex digit 7 (disjoint digit ranges, so index
    and sign are independent — same pattern as the split/sample buckets).
    """
    tok = docs.select(
        F.col(id_col),
        F.explode(_norm_tokens(F.col(text_col))).alias("token"),
    )
    sgn_nibble = F.conv(
        F.substring(F.md5(F.col("token")), 7, 1), 16, 10
    ).cast("int")
    hashed = tok.select(
        F.col(id_col),
        hash_bucket(F.col("token"), n_buckets=dim, hex_start=1).alias("idx"),
        F.when(sgn_nibble % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0)).alias(
            "sgn"
        ),
    )
    sparse = (
        hashed.groupBy(id_col, "idx")
        .agg(F.sum("sgn").alias("w"))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("idx", "w"))
            ).alias("m")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("m"), i.cast("long")), F.lit(0.0)
        ),
    )
    # BIND the densified array as a projected column (r12): the norm fold
    # and the unit transform both consumed the `dense` expression,
    # re-running the dim map lookups per reference. Values unchanged.
    dcol = F.col("__d")
    nrm = F.sqrt(
        F.aggregate(dcol, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    unit = F.transform(
        dcol,
        lambda x: F.when(F.col("__n") == 0, F.lit(0.0))
        .otherwise(x / F.col("__n"))
        .cast("float"),
    )
    vecs = (
        sparse.withColumn("__d", dense)
        .withColumn("__n", nrm)
        .withColumn("embedding", unit)
        .select(id_col, "embedding")
    )
    # empty documents: zero vector, not a missing row
    zero = F.array_repeat(F.lit(0.0).cast("float"), dim)
    return (
        docs.select(id_col)
        .join(vecs, id_col, "left")
        .select(
            F.col(id_col), F.coalesce(F.col("embedding"), zero).alias("embedding")
        )
    )
