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
- the within-cluster comparison is ONE cluster-keyed shuffle of the
  JVM-prenormalized unit vectors into a per-cluster Arrow batch, where
  the Σ cᵢ² pair dots run as a blocked NumPy/BLAS matmul
  (`applyInPandas`; guide §4.2's "hand whole batches to vectorized
  native libraries" — the paper runs the same per-cluster quadratic on
  GPUs). This replaced the r11 cluster-keyed self-join whose 64-term
  pair dot ran interpreted in the join condition: each row now crosses
  the wire ONCE (the join shipped both sides), and the quadratic runs
  at BLAS rates instead of expression-tree rates (measured 2.3× at
  sf0.1; identical outputs at every SF — see OPTIMIZATION_r12.md). At
  scale k grows with the corpus (k ≈ N / target_cluster_size), holding
  cᵢ and the per-task quadratic constant; a pathological mega-cluster
  is a k-too-small configuration error, not a plan defect, and is the
  documented knob (the matmul is row-blocked, so task memory is
  O(block × cᵢ), never cᵢ²).
- the keep rule is deterministic: an item drops iff SOME item with a
  SMALLER id in its cluster is ≥-threshold similar ("corpus-first", the
  same rule as exact/passage dedup — stable under re-partitioning and
  re-runs, unlike the paper's random-within-cluster choice, and exactly
  reproducible by an oracle). Note this is pairwise domination, not
  transitive-chain dedup: a drops c only if cos(a, c) ≥ τ directly.

No all-pairs, no windows, no per-row Python: 1 keyed shuffle of
(id, cluster, unit) + the broadcast-able drop-set anti join. The only
Python is the per-cluster Arrow batch handed to NumPy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.similarity import (
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

    NaN inputs: a vector containing NaN (like the NULL-normalized zero
    vector) is INERT — its pair dots are NaN and every ``NaN >= τ``
    comparison is False under NumPy semantics, so it neither dominates
    nor drops a peer (pinned in tests/test_semdedup.py). Note this
    differs from what a Spark SQL join condition ``dot >= τ`` would do:
    Spark's total order treats NaN as greater than every double, so a
    NaN dot would have counted as a domination there.
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
    # pre-normalize IN THE JVM so the Python stage sees finished unit
    # vectors (the numeric path up to the dot product is unchanged from
    # the join formulation); try_divide keeps a zero vector
    # NULL-normalized — its elements arrive as NaN, every dot involving
    # it is NaN, and NaN >= τ is False, so it neither dominates nor
    # drops (the same inertness the NULL join condition gave).
    # The cast array and its norm are LET-BOUND via single-element
    # transforms (r12): the divide lambda captured the norm FOLD, and a
    # higher-order function evaluates its body per element — the norm
    # (itself re-evaluating the cast tree) ran once per component,
    # O(dim²) per row. Binding evaluates each once; same subexpressions,
    # same fold order, bit-identical units.
    unit = F.element_at(
        F.transform(
            F.array(vd),
            lambda v: F.element_at(
                F.transform(
                    F.array(_norm(v)),
                    lambda nv: F.transform(
                        v, lambda x: F.try_divide(x, nv)
                    ),
                ),
                1,
            ),
        ),
        1,
    )
    # NULL-cluster rows (zero/NULL vectors) can never pair — the old
    # join condition `__scl == __bcl` was never true for NULL — so drop
    # them before the shuffle rather than shipping them.
    pre = assigned.where(F.col("cluster").isNotNull()).select(
        F.col(id_col).alias("__sid"),
        F.col("cluster").alias("__scl"),
        unit.alias("__uv"),
    )
    thr = float(threshold)

    # One Arrow batch per cluster; the Σcᵢ² pair dots run as a blocked
    # float64 matmul. Nested def on purpose: the closure ships by VALUE
    # to the workers (a module-level helper would pickle a module
    # reference and break on drivers whose sys.path lacks the repo).
    def _dominated(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"__did": np.empty(0, dtype="int64")})
        ids = pdf["__sid"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        # None elements (NULL-normalized zero vectors) become NaN; their
        # dots are NaN and NaN >= thr is False under errstate-silenced
        # invalid compares — exactly the join-condition semantics.
        unit_mat = np.array(
            [np.asarray(v, dtype="float64") for v in pdf["__uv"].iloc[order]]
        )
        dropped = np.zeros(n, dtype=bool)
        block = 2048  # task memory is O(block × cᵢ), never cᵢ²
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            gram = unit_mat[lo:hi] @ unit_mat.T
            with np.errstate(invalid="ignore"):
                hit = gram >= thr
            # dominated j: some i < j (id order) with cos(i, j) >= τ
            hit &= np.arange(lo, hi)[:, None] < np.arange(n)[None, :]
            dropped |= hit.any(axis=0)
        return pd.DataFrame({"__did": ids[dropped]})

    dropped = pre.groupBy("__scl").applyInPandas(_dominated, schema="__did long")
    return assigned.join(
        dropped, assigned[id_col] == dropped["__did"], "left_anti"
    )
