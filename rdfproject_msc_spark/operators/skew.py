"""Skew-mitigation utilities: salted joins for hot keys.

When one join key holds a disproportionate share of rows (the "hot key"),
a hash join sends that key's entire volume to ONE reduce task — the stage
runs at the speed of its hottest key. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``) handles this automatically for sort-merge
joins; explicit salting is the deterministic fallback for when AQE can't
(e.g. aggregation-free shuffles feeding custom stages, or engines/configs
without AQE).

Salting re-expresses the join:
  big side:   key → (key, salt)   with salt = uniform 0..n-1 per row
  small side: key → (key, salt) × n   (each row replicated n times)
so the hot key spreads across n tasks; the join RESULT is identical.

(For algebraic aggregations — sum/count/min/max — Spark's map-side partial
aggregation already neutralizes skew; salting aggregations only pays off for
holistic aggregates like collect_list/percentile.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side salted
    across ``n_salts`` buckets and the small side replicated ``n_salts``×.

    The salt value is random-uniform per big-side row (seeded; the CHOICE of
    bucket never affects the result, only the distribution), so the output
    equals ``big.join(small, on, how)`` row-for-row — for join types that
    preserve only big-side rows. Outer forms that keep UNMATCHED small-side
    rows (right/full) would emit each such row once per salt replica, so
    they are rejected.  Replication multiplies the small side's shuffle
    volume by n_salts — keep it for genuinely small dimension tables and
    pick n_salts ≈ the observed hot-key multiplier.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} joins only; "
            f"{how!r} would duplicate unmatched small-side rows n_salts times"
        )
    salted_big = big.withColumn(
        "__salt", F.floor(F.rand(seed) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
