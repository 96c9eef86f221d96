"""Skew-robust exact top-N per key.

`Window.partitionBy(key).orderBy(...)` + row_number is the idiomatic
per-key top-N, but a window partition is ONE task: a hot key (an order
priority with 1/5 of a 100 TB table, a stopword, a dominant source)
serializes its entire group through a single executor, and AQE does not
split window skew. This operator computes the SAME exact result with
bounded per-task work:

  stage 1  salt = crc32(tiebreak id) % salts; row_number over
           (key, salt) keeps top-n per salt bucket — a hot key's rows
           spread across `salts` window partitions;
  stage 2  row_number over key on the ≤ n × salts survivors — the
           second window's per-key input is PLAN-BOUNDED (n × salts
           rows), independent of data volume.

Exactness: the global per-key top-n is a subset of the union of per-salt
top-n sets (removing a row not in a salt's top-n cannot remove a row of
the global top-n), so stage 2 sees every answer row. Determinism: the
caller's ordering must be TOTAL (include a unique tiebreaker column);
the salt derives from the tiebreaker, so reruns bucket identically.

The reference has no analytic-window machinery at all; this generalizes
the windowed top-N its SQL surface (Spark 1.5 HiveContext,
PartitionQueryingSubject.java:128) could in principle express, with the
scale behavior it could not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    n: int,
    tiebreak_col: str,
    salts: int = 16,
) -> DataFrame:
    """Exact top-`n` rows per `keys` group under the TOTAL ordering
    `order_by` (must include `tiebreak_col`, a unique column, as the
    final sort key). Output = input columns, top-n rows per key, no rank
    column. `salts` bounds hot-key window width; n × salts rows per key
    reach the final window regardless of group size."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if salts < 1:
        raise ValueError("salts must be >= 1")
    salt = F.crc32(F.col(tiebreak_col).cast("string")) % F.lit(salts)
    w1 = Window.partitionBy(*keys, salt.alias("__salt")).orderBy(*order_by)
    # partitionBy accepts expressions; alias is ignored there but kept
    # for readability. Stage 1: per-salt top-n.
    stage1 = (
        df.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= n)
        .drop("__rn1")
    )
    # Stage 2: exact top-n over the bounded survivors.
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        stage1.withColumn("__rn2", F.row_number().over(w2))
        .filter(F.col("__rn2") <= n)
        .drop("__rn2")
    )


def quota_sample_per_key(
    df: DataFrame,
    keys: list[str],
    n: int,
    id_col: str,
    salts: int = 16,
) -> DataFrame:
    """Deterministic per-key quota sample: keep (up to) `n` rows per
    `keys` group, chosen by md5(id) priority — a reproducible uniform
    draw with NO trained state, the mixture-control primitive for
    capping dominant sources in a training corpus (the complement of
    `sampling.stratified_sample`'s rate-based draw: quotas bound the
    absolute contribution of a hot source no matter how large it
    grows). Same salted two-stage machinery as `top_n_per_key`."""
    prio = F.md5(F.concat(F.lit("quota:"), F.col(id_col).cast("string")))
    return top_n_per_key(
        df.withColumn("__prio", prio),
        keys,
        [F.col("__prio"), F.col(id_col)],
        n,
        id_col,
        salts=salts,
    ).drop("__prio")
