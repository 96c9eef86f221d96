"""Length-bucketed batch assignment (padding-efficient training batches).

Training on variable-length documents pads every sequence in a batch to
the batch's longest member; batching documents of SIMILAR length
together bounds that waste (the standard "length bucketing" /
"bucketed batching" trick). This operator assigns every document a
``(length_bucket, batch_id)`` deterministically:

  - ``length_bucket``: ceil(log2(tokens)) by default (power-of-two
    ranges — padding within a bucket is < 2× by construction), or the
    index into an explicit sorted boundary list;
  - ``batch_id``: within a length bucket, documents order by id and
    batch k is rows [k*B, (k+1)*B) of that order.

The within-bucket rank is a prefix COUNT — the naive formulation is a
``Window.partitionBy(length_bucket).orderBy(id)`` whose hot partition
is a whole length bucket (most corpora concentrate in 2-3 buckets: the
serialized-task problem at 100 TB). Like operators/packing.py, this
uses the two-phase distributed prefix sum instead: per-(length_bucket,
id_range_bucket) counts prefix-summed over the TINY bucket relation,
broadcast back, then a window WITHIN each (length_bucket,
id_range_bucket) cell — every data-sized stage is parallel, and the
executed plan contains no single-partition exchange (plan-pinned).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def length_bucketed_batches(
    df: DataFrame,
    token_col: str,
    batch_size: int,
    id_col: str = "doc_id",
    bucket_bounds: list[int] | None = None,
    id_bucket_size: int = 4096,
) -> DataFrame:
    """Add ``length_bucket`` and ``batch_id`` columns; deterministic
    given ids and token counts. The final batch of each length bucket
    may be short (the consumer drops or pads it)."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    toks = F.col(token_col)
    if bucket_bounds is not None:
        if sorted(bucket_bounds) != list(bucket_bounds):
            raise ValueError("bucket_bounds must be sorted ascending")
        # index of the first boundary >= tokens; beyond-last → len(bounds)
        lb = reduce(
            lambda acc, ib: F.when(toks <= F.lit(ib[1]), F.lit(ib[0])).otherwise(
                acc
            ),
            reversed(list(enumerate(bucket_bounds))),
            F.lit(len(bucket_bounds)),
        )
    else:
        lb = F.when(toks <= 1, F.lit(0)).otherwise(
            F.ceil(F.log2(toks))
        )
    out = df.withColumn("length_bucket", lb.cast("long")).withColumn(
        "__idb", F.floor(F.col(id_col) / F.lit(id_bucket_size)).cast("long")
    )
    # phase 1: per-cell counts — a tiny relation (cells, not rows)
    counts = out.groupBy("length_bucket", "__idb").agg(
        F.count("*").alias("__n")
    )
    # phase 2: prefix over cells, windowed PER length bucket (each
    # partition holds id_range/id_bucket_size rows — bounded by the id
    # space, never by data volume)
    w_cells = (
        Window.partitionBy("length_bucket")
        .orderBy("__idb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "length_bucket",
        "__idb",
        F.coalesce(F.sum("__n").over(w_cells), F.lit(0)).alias("__off"),
    )
    # phase 3: rank within the (length_bucket, id-range) CELL — parallel
    w_within = (
        Window.partitionBy("length_bucket", "__idb")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        out.join(F.broadcast(offsets), ["length_bucket", "__idb"])
        .withColumn(
            "__rank",
            F.col("__off")
            + F.coalesce(
                F.count("*").over(w_within), F.lit(0)
            ),
        )
        .withColumn(
            "batch_id",
            F.floor(F.col("__rank") / F.lit(batch_size)).cast("long"),
        )
        .drop("__idb", "__off", "__rank")
    )


def padding_waste(
    batched: DataFrame, token_col: str
) -> DataFrame:
    """Padding diagnostic: per corpus, the fraction of padded positions
    if every (length_bucket, batch_id) batch pads to its longest member.
    ONE aggregation pass (batch maxima) + one tiny rollup."""
    per_batch = batched.groupBy("length_bucket", "batch_id").agg(
        F.count("*").alias("n"),
        F.sum(token_col).alias("tok"),
        F.max(token_col).alias("mx"),
    )
    return per_batch.agg(
        (
            1
            - F.sum("tok").cast("double")
            / F.sum(F.col("mx") * F.col("n")).cast("double")
        ).alias("padding_fraction"),
        F.count("*").alias("n_batches"),
    )
