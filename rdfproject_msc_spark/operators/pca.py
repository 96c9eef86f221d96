"""PCA dimensionality reduction for embedding columns.

The standard pre-processing step in front of large-scale similarity search:
project d-dim embeddings onto the top-k principal components so downstream
ANN layouts (IVF / LSH) index k ≪ d floats per vector — smaller scans,
cheaper distance arithmetic, negligible recall loss when the spectrum
decays.

100 TB design (for the small-d regime, d ≤ ~128, which covers typical
retrieval embeddings after feature hashing — larger d belongs to the
treeAggregate/Gramian path of Spark ML):
- Fitting is ONE aggregation pass: d running sums + d(d+1)/2 Gram sums as
  plain ``F.sum`` expressions — Catalyst plans a partial (map-side)
  HashAggregate, so the shuffle carries one (d²+d)/2-value row per
  partition, never the vectors.
- The covariance matrix is d×d — driver-side numpy ``eigh`` on a few KB is
  exact, deterministic, and not a scale concern.
- Projection is fully UNROLLED multiply-add column expressions over the
  broadcast-as-literals component matrix (same codegen pattern as the
  brute-force cosine scorer, similarity.py cosine_to_literal): k·d fused
  multiply-adds inside whole-stage codegen, no Python, no UDF, no shuffle.
- Mean-centering is explicit (components are of the CENTERED covariance;
  projecting raw vectors would shift every coordinate by μ·C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# codegen-safe ceiling for the single-pass d(d+1)/2-expression aggregation
MAX_CODEGEN_DIM = 128


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    dim: int | None = None,
) -> tuple[list[list[float]], list[float], list[float]]:
    """Fit PCA on an ``array<float>`` column.

    Returns ``(components, explained_variance_ratio, mean)``:
    ``components`` is k rows of d floats (orthonormal, descending
    variance; each row's sign is fixed so its largest-magnitude entry is
    positive — eigenvector sign is otherwise arbitrary and would flip
    between runs), ``explained_variance_ratio`` the fraction of total
    variance per component, ``mean`` the d-dim column mean.
    """
    import numpy as np

    if dim is None:
        dim = df.select(F.size(F.col(vec_col))).first()[0]
    if dim > MAX_CODEGEN_DIM:
        # the docstring's small-d regime, now enforced: d(d+1)/2 sum
        # expressions blow up Janino codegen well before they blow up the
        # math. Larger d belongs to an RDD treeAggregate of per-partition
        # numpy Gram matrices (Spark ML RowMatrix.computeGramianMatrix's
        # strategy), which this engine deliberately does not ship.
        raise ValueError(
            f"pca_fit supports dim <= {MAX_CODEGEN_DIM} (got {dim}): the "
            "single-pass SQL aggregation generates d(d+1)/2 sum expressions "
            "and exceeds codegen limits beyond that; use a treeAggregate "
            "of per-partition Gram matrices for larger dimensions"
        )
    v = F.col(vec_col)
    # F.sum skips NULL elements while count(1) counts every row, so a NULL
    # or short vector would silently skew the mean and Gram normalization —
    # count offenders in the SAME pass and raise instead. Element access
    # goes through null-tolerant F.get (plain v[i] THROWS on a short array
    # under ANSI mode, which would mask the diagnostic).
    bad = F.sum(
        (v.isNull() | (F.size(v) != F.lit(dim))).cast("long")
    ).alias("bad")
    aggs = [F.count(F.lit(1)).alias("n"), bad]

    def el(i: int) -> Column:
        return F.get(v, F.lit(i))

    aggs += [
        F.sum(el(i).cast("double")).alias(f"s{i}") for i in range(dim)
    ]
    aggs += [
        F.sum((el(i) * el(j)).cast("double")).alias(f"g{i}_{j}")
        for i in range(dim)
        for j in range(i, dim)
    ]
    row = df.agg(*aggs).first()
    n = row["n"]
    if n < 2:
        raise ValueError(f"PCA needs at least 2 vectors, got {n}")
    if row["bad"]:
        raise ValueError(
            f"pca_fit: {row['bad']} of {n} vectors are NULL or not "
            f"exactly {dim}-dimensional; clean or filter them first"
        )
    mean = np.array([row[f"s{i}"] for i in range(dim)]) / n
    gram = np.empty((dim, dim))
    for i in range(dim):
        for j in range(i, dim):
            gram[i, j] = gram[j, i] = row[f"g{i}_{j}"]
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T  # k × d
    # deterministic sign: largest-|entry| positive per component
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    total = float(np.clip(eigvals.sum(), 1e-300, None))
    ratio = [float(eigvals[o] / total) for o in order]
    return comps.tolist(), ratio, mean.tolist()


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    mean: list[float],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project ``vec_col`` onto the fitted components →
    ``out_col: array<float>`` of k entries, (v - μ)·Cᵀ, as unrolled
    multiply-add expressions (whole-stage codegen; zero Python)."""
    v = F.col(vec_col)
    dim = len(mean)

    def coord(comp: list[float]) -> Column:
        terms = [
            (v[j].cast("double") - F.lit(float(mean[j]))) * F.lit(float(comp[j]))
            for j in range(dim)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out.cast("float")

    return df.withColumn(
        out_col, F.array(*[coord(c) for c in components])
    )
