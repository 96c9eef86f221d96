"""PCA operator: numpy oracle (exact same math on collected data), sign
determinism, plan shape (single aggregation pass; zero-shuffle projection),
and composition with the brute-force cosine ranking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.pca import pca_fit, pca_project
from rdfproject_msc_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return comps, eigvals[order] / eigvals.sum(), mean


def test_fit_matches_numpy(emb):
    comps, ratio, mean = pca_fit(emb, k=8)
    x = np.array([r.embedding for r in emb.select("embedding").collect()])
    nc, nr, nm = _numpy_pca(x.astype(np.float64), 8)
    assert np.allclose(mean, nm, atol=1e-6)
    assert np.allclose(ratio, nr, atol=1e-6)
    # distributed float summation reorders adds vs numpy — tolerance, not
    # equality; sign convention makes rows directly comparable
    assert np.allclose(np.array(comps), nc, atol=1e-5)


def test_components_orthonormal_and_sorted(emb):
    comps, ratio, _ = pca_fit(emb, k=8)
    c = np.array(comps)
    assert np.allclose(c @ c.T, np.eye(8), atol=1e-8)
    assert all(a >= b for a, b in zip(ratio, ratio[1:]))
    assert 0.0 < sum(ratio) <= 1.0 + 1e-9


def test_projection_matches_numpy_and_schema(emb):
    comps, _, mean = pca_fit(emb, k=8)
    out = pca_project(emb, comps, mean, out_col="pca")
    assert dict(out.dtypes)["pca"] == "array<float>"
    rows = out.select("vec_id", "embedding", "pca").limit(50).collect()
    c = np.array(comps)
    m = np.array(mean)
    for r in rows:
        want = c @ (np.array(r.embedding, dtype=np.float64) - m)
        assert np.allclose(np.array(r.pca), want, atol=1e-4), r.vec_id
    # zero-shuffle projection: pure per-row expressions
    plan = (
        pca_project(emb, comps, mean)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_fit_is_one_aggregation_pass(emb):
    # the fit's data pass is a single partial+final aggregate: the shuffle
    # carries one moment row per partition, never vectors
    dim = 8
    v = F.col("embedding")
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(v[i].cast("double")).alias(f"s{i}") for i in range(dim)]
    plan = emb.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_pca_preserves_neighborhood_ranking(spark):
    """Composition sanity on STRUCTURED data: when variance concentrates in
    a low-dim subspace (clustered vectors — the regime where PCA-then-ANN
    is used), the k=8 projection preserves nearest-neighbor sets. (The
    driver's synthetic embeddings are near-isotropic — k=16 of 64 captures
    only ~38% variance there — so this property is pinned on generated
    clusters instead.)"""
    rng = np.random.default_rng(7)
    basis = np.linalg.qr(rng.normal(size=(64, 4)))[0]  # 4-dim signal subspace
    signal = rng.normal(size=(400, 4)) * 10.0  # continuous spread = geometry
    x = signal @ basis.T + rng.normal(size=(400, 64)) * 0.05
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    comps, ratio, mean = pca_fit(df, k=8)
    assert sum(ratio) > 0.95  # the spectrum really is concentrated
    rows = pca_project(df, comps, mean, out_col="p").select("vec_id", "p").collect()
    p = np.array([r.p for r in sorted(rows, key=lambda r: r.vec_id)])

    def topk(mat, qrow, k=10):
        d = ((mat - mat[qrow]) ** 2).sum(axis=1)
        return set(np.argsort(d)[1 : k + 1])

    overlaps = [
        len(topk(x, q) & topk(p, q)) for q in range(0, 400, 40)
    ]
    assert min(overlaps) >= 8  # ≥80% neighbor overlap at 8× compression


def test_fit_rejects_oversized_dim(spark):
    """The docstring's small-d regime is enforced in code: beyond
    MAX_CODEGEN_DIM the d(d+1)/2-expression aggregation would blow up
    Janino codegen, so pca_fit raises and names the alternative."""
    from rdfproject_msc_spark.operators.pca import MAX_CODEGEN_DIM

    df = spark.createDataFrame(
        [(0, [0.0] * (MAX_CODEGEN_DIM + 1))], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="treeAggregate"):
        pca_fit(df, k=2)


def test_fit_rejects_null_and_short_vectors(spark):
    """F.sum skips NULL elements while n counts every row — a NULL or
    short vector would silently skew mean/covariance, so pca_fit counts
    offenders in the same pass and raises."""
    good = [(i, [float(i), float(-i), 1.0]) for i in range(5)]
    df = spark.createDataFrame(
        good + [(90, None), (91, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="NULL or not exactly 3"):
        pca_fit(df, k=2, dim=3)
    # the clean subset still fits
    comps, _, _ = pca_fit(df.filter(F.size("embedding") == 3), k=2, dim=3)
    assert len(comps) == 2
