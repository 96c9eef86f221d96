"""SemDeDup: semantic deduplication via embedding clusters.

The cluster-then-prune recipe of Abbas et al. 2023 ("SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"):
k-means the embedding space, then WITHIN each cluster drop every item
that is cosine-similar (≥ threshold) to another kept item. Unlike the
LSH pair-finder (`similarity.cosine_neardup_pairs`, which enumerates
near-dup PAIRS corpus-wide), this is the corpus-PRUNING operator: its
output is the surviving rows, the thing a training pipeline feeds
downstream.

Spark-first shape:

- centroids come from the IVF coarse quantizer
  (`similarity.kmeans_centroids` — deterministic xxhash64 init, driver
  state bounded by k×dim, never by data);
- assignment is a per-row JVM argmax (`similarity._nearest_centroid`,
  whole-stage codegen — no Python);
- the within-cluster comparison is a self-join ON THE CLUSTER ID: both
  sides shuffle once on `cluster`, the join is co-partitioned, and the
  per-task work is Σ cᵢ² over that task's clusters — SemDeDup's inherent
  cost (the paper runs the same per-cluster quadratic on GPUs). At scale
  k grows with the corpus (k ≈ N / target_cluster_size), holding cᵢ and
  the per-task quadratic constant; a pathological mega-cluster is a
  k-too-small configuration error, not a plan defect, and is the
  documented knob.
- the keep rule is deterministic: an item drops iff SOME item with a
  SMALLER id in its cluster is ≥-threshold similar ("corpus-first", the
  same rule as exact/passage dedup — stable under re-partitioning and
  re-runs, unlike the paper's random-within-cluster choice, and exactly
  reproducible by an oracle). Note this is pairwise domination, not
  transitive-chain dedup: a drops c only if cos(a, c) ≥ τ directly.

No all-pairs, no windows, no Python rows: 2 keyed shuffles (one per
self-join side) + the broadcast-able drop-set anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.similarity import (
    _dot,
    _nearest_centroid,
    _norm,
    kmeans_centroids,
)

# Default cluster granularity: k ≈ N / TARGET_CLUSTER_SIZE holds expected
# cluster sizes (and therefore the per-task Σcᵢ² quadratic) CONSTANT as the
# corpus grows — the measured-sublinear configuration (SCALE.md: k∝N probe
# 9.2× per decade vs 12.4× at fixed k). 625 ⇒ ~0.4M pair-dots per cluster.
TARGET_CLUSTER_SIZE = 625


def auto_k(n_rows: int, target_cluster_size: int = TARGET_CLUSTER_SIZE) -> int:
    """The scale-safe cluster count for an ``n_rows`` corpus: ceil(N/625),
    floored at 16 so tiny corpora still get a non-degenerate partition."""
    return max(16, -(-int(n_rows) // int(target_cluster_size)))


def semantic_dedup(
    df: DataFrame,
    dim: int,
    threshold: float,
    k: int | None = None,
    centroids: list[list[float]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Prune semantic duplicates: returns ``df``'s rows minus every row
    dominated by a smaller-id row in the same cluster at cosine ≥
    ``threshold``, plus a ``cluster`` column (the assignment is useful
    downstream — e.g. for stratified sampling over semantic regions).

    ``k`` defaults to ``auto_k(count(df))`` — k grows with the corpus so
    within-cluster work per row stays constant (the configuration the
    scale probe measures sublinear). Pass an explicit k ONLY to replicate
    a fixed-geometry oracle; a fixed k makes the within-cluster quadratic
    grow with N by construction.

    ``centroids``: pass a precomputed k×dim table to skip training (and
    to make the whole operator a pure function of its inputs — the
    DuckDB oracle path); default trains the deterministic IVF quantizer.
    """
    if centroids is None:
        if k is None:
            # one bounded count() — the price of a size-adaptive default
            k = auto_k(df.count())
        centroids = kmeans_centroids(df, dim=dim, k=k, vec_col=vec_col, id_col=id_col)
    assigned = df.withColumn(
        "cluster", _nearest_centroid(F.col(vec_col), centroids)
    )
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = _norm(vd)
    # pre-normalize so the join condition is a single dot product;
    # try_divide keeps a zero vector NULL-normalized (its similarity
    # test is then NULL → false — it neither dominates nor drops) under
    # any ANSI setting
    unit = F.transform(vd, lambda x: F.try_divide(x, nrm))
    # the per-pair dot runs once per candidate pair (Σcᵢ² times): expand
    # it into `dim` static column products so it compiles into
    # whole-stage codegen — Spark's higher-order array functions
    # (zip_with/aggregate) evaluate INTERPRETED per element, ~40× slower
    # in the 10×-scale probe. `dim` columns per side is fine for
    # embedding-sized dims; very high dims would trade codegen size for
    # it, so keep the HOF fallback above 256.
    expand = dim <= 256
    if expand:
        # materialize the unit array ONCE per row (r12): `unit` is a nested
        # transform (cast + try_divide over a norm aggregate) and extracting
        # `unit[i]` for all `dim` columns in one projection re-evaluated the
        # whole interpreted HOF tree per extracted element — dim × (2·dim
        # element ops + the norm fold) per row per side. Aliasing it first
        # keeps it a separate Project (CollapseProject never inlines a
        # non-cheap alias referenced more than once — the bm25 tokenize-once
        # mechanism), so each side pays one transform + dim cheap
        # GetArrayItem extracts instead.
        pre = assigned.select(
            F.col(id_col).alias("__sid"),
            F.col("cluster").alias("__scl"),
            unit.alias("__uv"),
        )
        sides = pre.select(
            "__sid",
            "__scl",
            *[F.col("__uv")[i].alias(f"__u{i}") for i in range(dim)],
        )
        b = sides.select(
            F.col("__sid").alias("__bid"),
            F.col("__scl").alias("__bcl"),
            *[F.col(f"__u{i}").alias(f"__w{i}") for i in range(dim)],
        )
        pair_dot = sum(
            F.col(f"__u{i}") * F.col(f"__w{i}") for i in range(1, dim)
        ) + (F.col("__u0") * F.col("__w0"))
    else:
        sides = assigned.select(
            F.col(id_col).alias("__sid"),
            F.col("cluster").alias("__scl"),
            unit.alias("__sv"),
        )
        b = (
            sides.withColumnRenamed("__sid", "__bid")
            .withColumnRenamed("__scl", "__bcl")
            .withColumnRenamed("__sv", "__bv")
        )
        pair_dot = _dot(F.col("__sv"), F.col("__bv"))
    # co-partitioned self-join on the cluster id; the id inequality and
    # the similarity test stay in the join condition so dominated ids
    # emerge directly — never a materialized all-pairs relation
    dropped = (
        sides.join(
            b,
            (F.col("__scl") == F.col("__bcl"))
            & (F.col("__sid") < F.col("__bid"))
            & (pair_dot >= F.lit(threshold)),
        )
        .select(F.col("__bid").alias("__did"))
        .distinct()
    )
    return assigned.join(
        dropped, assigned[id_col] == dropped["__did"], "left_anti"
    )
