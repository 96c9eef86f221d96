"""SemDeDup (operators/semdedup.py): exact numpy twin of the full
cluster-assign → within-cluster dominate → prune pipeline, the k=1 ≡
brute-force identity, determinism under re-partitioning, and the plan
shape (cluster-keyed self-join, no cartesian)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.semdedup import semantic_dedup
from rdfproject_msc_spark.operators.similarity import kmeans_centroids


def _mkvecs(n: int, dim: int):
    """Deterministic spread + planted near-duplicate pairs."""
    rows = []
    for i in range(n):
        v = [math.sin(0.7 * i + 0.3 * j) for j in range(dim)]
        rows.append((i, v))
        if i % 5 == 0:
            # a planted near-dup of i with a tiny perturbation
            rows.append(
                (1000 + i, [x + 0.001 * ((j % 3) - 1) for j, x in enumerate(v)])
            )
    return rows


def _np_semdedup(rows, centroids, threshold):
    """Python twin: nearest-centroid argmax (first max wins), then drop
    every id dominated by a smaller same-cluster id at cosine >= t."""

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def cos(a, b):
        na, nb = math.sqrt(dot(a, a)), math.sqrt(dot(b, b))
        return dot(a, b) / (na * nb) if na and nb else 0.0

    assign = {}
    for i, v in rows:
        scores = [cos(v, c) for c in centroids]
        assign[i] = scores.index(max(scores))
    vecs = dict(rows)
    kept = []
    for i, v in sorted(rows):
        cl = assign[i]
        dominated = any(
            j < i and assign[j] == cl and cos(vecs[j], v) >= threshold
            for j, _ in rows
        )
        if not dominated:
            kept.append((i, cl))
    return sorted(kept)


def test_semdedup_matches_python_twin(spark):
    dim, k, t = 8, 4, 0.999
    rows = _mkvecs(30, dim)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(df, dim=dim, k=k)
    out = semantic_dedup(df, dim=dim, threshold=t, centroids=cents)
    got = sorted((r.vec_id, r.cluster) for r in out.collect())
    assert got == _np_semdedup(rows, cents, t)
    # pruning is real work: every planted perturbed twin (1000+i) is
    # dominated by its original at this threshold (sin-generated bases
    # also near-repeat with period 2π/0.7 ≈ 9, so naturals drop too)
    dropped = {i for i, _ in rows} - {i for i, _ in got}
    assert {i for i in dropped if i >= 1000} == {
        1000 + i for i in range(30) if i % 5 == 0
    }


def test_semdedup_k1_equals_brute_force(spark):
    """One cluster ⇒ SemDeDup degenerates to corpus-wide brute-force
    threshold dedup — the recall ceiling the clustering approximates."""
    dim, t = 6, 0.98
    rows = _mkvecs(20, dim)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = [[0.1] * dim]  # any single centroid: everything lands in it
    out = semantic_dedup(df, dim=dim, threshold=t, centroids=one)
    got = sorted(r.vec_id for r in out.collect())
    want = [i for i, _ in _np_semdedup(rows, one, t)]
    assert got == want


def test_semdedup_deterministic_under_repartition(spark):
    dim, t = 8, 0.999
    rows = _mkvecs(25, dim)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(df, dim=dim, k=3)
    a = sorted(
        r.vec_id
        for r in semantic_dedup(df, dim=dim, threshold=t, centroids=cents).collect()
    )
    b = sorted(
        r.vec_id
        for r in semantic_dedup(
            df.repartition(13), dim=dim, threshold=t, centroids=cents
        ).collect()
    )
    assert a == b


def test_semdedup_plan_no_cartesian(spark):
    """The within-cluster comparison must be a cluster-keyed equi-join
    (co-partitioned Σcᵢ² work), never a nested-loop/cartesian corpus
    product."""
    rows = _mkvecs(30, 8)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(df, dim=8, k=4)
    out = semantic_dedup(df, dim=8, threshold=0.999, centroids=cents)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final
    # the dominate step joins on the cluster column
    assert "Join" in final


def test_semdedup_zero_vector_is_inert(spark):
    rows = [(1, [0.0] * 4), (2, [1.0, 0.0, 0.0, 0.0]), (3, [1.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, dim=4, threshold=0.9, centroids=[[0.5] * 4])
    got = {r.vec_id: r.cluster for r in out.collect()}
    # 3 dominated by 2; the zero vector survives with a NULL assignment
    # (no defined direction — inert on both sides of the dominate join)
    assert sorted(got) == [1, 2]
    assert got[1] is None and got[2] == 0


def test_semdedup_nan_vector_is_inert(spark):
    """A NaN-containing INPUT vector neither dominates nor drops a peer:
    its pair dots are NaN and NumPy's ``NaN >= τ`` is False (the
    documented semantics — a Spark SQL join condition would instead
    rank NaN above every double and count it as a domination). Rows 2/3
    are identical unit vectors sharing a cluster with the NaN row, so
    the NaN row sits on both sides of the dominate comparison."""
    nan = float("nan")
    rows = [
        (1, [nan, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, [nan, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, dim=4, threshold=0.9, centroids=[[0.5] * 4])
    got = sorted(r.vec_id for r in out.collect())
    # 3 dominated by 2 (real duplicates); 1 and 4 survive — a NaN dot
    # never satisfies >= τ, and nothing real can reach a NaN vector
    assert got == [1, 2, 4]


def test_auto_k_rule():
    from rdfproject_msc_spark.operators.semdedup import auto_k

    assert auto_k(0) == 16
    assert auto_k(10_000) == 16  # floor dominates small corpora
    assert auto_k(625_000) == 1000  # the SCALE.md k ≈ N/625 rule
    assert auto_k(625_001) == 1001  # ceil, not round
    assert auto_k(10**12) == 1_600_000_000  # k scales with the corpus


def test_semdedup_default_derives_scale_safe_k(spark):
    """The DEFAULT call (no k, no centroids) must auto-derive k from the
    corpus size and agree with the same call made explicit — the
    scale-safe configuration is what a bare semantic_dedup() runs."""
    from rdfproject_msc_spark.operators.semdedup import auto_k

    dim, t = 8, 0.999
    rows = _mkvecs(40, dim)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k = auto_k(len(rows))
    cents = kmeans_centroids(df, dim=dim, k=k)
    want = sorted(
        (r.vec_id, r.cluster)
        for r in semantic_dedup(
            df, dim=dim, threshold=t, centroids=cents
        ).collect()
    )
    got = sorted(
        (r.vec_id, r.cluster)
        for r in semantic_dedup(df, dim=dim, threshold=t).collect()
    )
    assert got == want
