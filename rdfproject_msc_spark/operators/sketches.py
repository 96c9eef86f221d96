"""Mergeable cardinality sketches: exact RoaringBitmap distinct counts and
HyperLogLog partials.

The 100 TB statistics problem: "distinct users per segment" over a corpus
that arrives in shards (days, crawls, dumps) should not re-scan history
every time a shard lands. Both operators here produce PARTIAL state that is
(a) tiny relative to the data, (b) keyed by the grouping columns, and
(c) exactly mergeable — so the steady-state cost is one pass over the NEW
shard plus a merge keyed on |groups| rows, never a re-scan.

Two tiers:
- ``bitmap_*``: EXACT distinct counts of an integer key via Spark's
  two-level RoaringBitmap aggregate (``bitmap_bucket_number`` splits the
  key space into 32768-bit buckets, ``bitmap_construct_agg`` builds one
  bitmap per (group, bucket), ``bitmap_or_agg`` merges partials
  losslessly). State size tracks the number of OCCUPIED buckets — dense
  id spaces compress to ~4 KiB per bucket, and the final count is a
  map-side-combinable SUM of per-bucket popcounts. Exact ⇒ DuckDB
  ``count(DISTINCT …)`` is a value-level oracle.
- ``hll_*``: approximate distinct of ANY column type via Datasketches
  HLL (``hll_sketch_agg`` / ``hll_union_agg``), fixed ~(2^lgk) bytes per
  group no matter the cardinality — the tier for string/unbounded keys
  where exact bitmaps cannot bound their state. Union of per-shard
  sketches is the same estimator as a single pass (pinned in tests).

Both partial forms are plain DataFrames (binary state columns) — write
them to Parquet per shard, read + merge later; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__bm_bucket"
_STATE = "__bm_bits"
_HLL = "__hll_sketch"


def bitmap_partials(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """Per-(keys, bucket) RoaringBitmap partial state over an integral
    ``col``. One aggregation shuffle keyed by (keys, bucket); map-side
    combine collapses each task's rows into at most
    |keys × occupied buckets| partial bitmaps before the exchange."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, F.bitmap_bucket_number(F.col(col)).alias(_BUCKET))
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col(col))).alias(
                _STATE
            )
        )
    )


def bitmap_merge(*partials: DataFrame) -> DataFrame:
    """OR-merge partial bitmap states (same schema) into one — the
    incremental path: yesterday's persisted partials ∪ today's shard.
    Keyed on (keys, bucket); lossless."""
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    keys = [c for c in merged.columns if c not in (_BUCKET, _STATE)]
    return merged.groupBy(*keys, _BUCKET).agg(
        F.bitmap_or_agg(F.col(_STATE)).alias(_STATE)
    )


def bitmap_distinct_counts(
    partials: DataFrame, keys: list[str], out_col: str = "n_distinct"
) -> DataFrame:
    """EXACT distinct count per key group from partial state: popcount
    each bucket bitmap, SUM over buckets (distinct values cannot straddle
    buckets, so the sum is exact). |partials| rows in, |groups| out."""
    return partials.groupBy(*keys).agg(
        F.sum(F.bitmap_count(F.col(_STATE))).alias(out_col)
    )


def exact_distinct(
    df: DataFrame, keys: list[str], col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """One-shot exact distinct-count per key group via the bitmap path:
    two keyed aggregations (both map-side combined), state bounded by
    occupied buckets — unlike ``countDistinct`` whose expand-based plan
    carries every (group, value) pair into the exchange."""
    return bitmap_distinct_counts(bitmap_partials(df, keys, col), keys, out_col)


def hll_partials(
    df: DataFrame, keys: list[str], col: str, *, lgk: int = 12
) -> DataFrame:
    """Per-group HLL sketch (~2^lgk bytes each, any column type). One
    keyed aggregation; partial sketches combine map-side."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias(_HLL)
    )


def hll_merge(*partials: DataFrame) -> DataFrame:
    """Union per-shard sketches per key group — same estimator state as a
    single pass over the concatenated shards."""
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    keys = [c for c in merged.columns if c != _HLL]
    return merged.groupBy(*keys).agg(
        F.hll_union_agg(F.col(_HLL)).alias(_HLL)
    )


def hll_estimates(
    partials: DataFrame, out_col: str = "approx_distinct"
) -> DataFrame:
    """Materialize per-group estimates from sketch state."""
    keys = [c for c in partials.columns if c != _HLL]
    return partials.select(
        *keys, F.hll_sketch_estimate(F.col(_HLL)).alias(out_col)
    )
