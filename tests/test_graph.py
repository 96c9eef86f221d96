"""Connected components vs a driver-side union-find oracle."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._budget import examples

from rdfproject_msc_spark.operators.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical component = min node id in the component
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.comp for r in connected_components(df).collect()}
    want_raw = _union_find(edges)
    # union-find roots are already minimal (we always parent the max to the
    # min), but path compression can lag: resolve to the true min per root
    comp_min = {}
    for n, r in want_raw.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[r] for n, r in want_raw.items()}
    assert got == want


def test_two_cliques_and_a_chain(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    _check(spark, edges)


def test_transitive_merge_through_bridge(spark):
    edges = [(1, 2), (3, 4), (2, 3)]  # bridge joins both pairs
    _check(spark, edges)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15))
        .map(lambda p: (min(p), max(p)))
        .filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=20,
    )
)
@settings(
    max_examples=examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_components_match_union_find(spark, edges):
    _check(spark, edges)


def test_registry_entry_components_cover_pairs(spark, sf_dir):
    from rdfproject_msc_spark.operators import dedup
    from rdfproject_msc_spark.registry import dedup_components
    from rdfproject_msc_spark.sources.tables import load_table

    comps = dedup_components(spark, sf_dir).collect()
    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    ).collect()
    nodes = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert sum(r.n_members for r in comps) == len(nodes)
    # every component's canonical id is one of its documents
    assert all(r.comp in nodes for r in comps)


def test_transitive_closure_chain_and_diamond(spark):
    from rdfproject_msc_spark.operators.graph import transitive_closure

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    out = sorted(map(tuple, transitive_closure(chain).collect()))
    assert out == [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]

    # diamond: two routes 1→4 yield ONE pair (DISTINCT set semantics)
    diamond = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    out = sorted(map(tuple, transitive_closure(diamond).collect()))
    assert out.count((1, 4)) == 1 and (1, 4) in out


def test_transitive_closure_seeded_forms(spark):
    from rdfproject_msc_spark.operators.graph import transitive_closure

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    # src-seeded on a cycle: converges, reaches everything
    fwd = sorted(
        r.co for r in transitive_closure(edges, src_id=2).collect()
    )
    assert fwd == [1, 2, 3, 4]
    # dst-seeded: everything reaching 4
    bwd = sorted(
        r.cs for r in transitive_closure(edges, dst_id=4).collect()
    )
    assert bwd == [1, 2, 3]
    # both endpoints: membership probe
    both = transitive_closure(edges, src_id=1, dst_id=4).collect()
    assert len(both) == 1
    none = transitive_closure(edges, src_id=4, dst_id=1).collect()
    assert none == []


def test_transitive_closure_max_iter_raises(spark):
    import pytest

    from rdfproject_msc_spark.operators.graph import transitive_closure

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="not converged"):
        transitive_closure(chain, max_iter=2)


def test_pagerank_matches_numpy_power_iteration(spark):
    """PageRank vs a dense numpy power iteration with identical dangling
    and damping treatment — same fixed iteration count, so values agree
    to float tolerance, not just ordering."""
    import numpy as np

    from rdfproject_msc_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 4), (5, 1), (6, 7)]
    # node 7 is dangling (no out-edges); 4 has a self-loop
    df = spark.createDataFrame(edges, "s long, p long") \
        if False else spark.createDataFrame(edges, "s long, o long")
    got = {
        r.node: r.rank
        for r in pagerank(df, iterations=12, damping=0.85).collect()
    }

    ids = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {nid: i for i, nid in enumerate(ids)}
    n = len(ids)
    deg = {u: 0 for u in ids}
    for u, _ in edges:
        deg[u] += 1
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(12):
        nxt = np.zeros(n)
        dangling = sum(r[idx[u]] for u in ids if deg[u] == 0)
        for u, v in edges:
            nxt[idx[v]] += r[idx[u]] / deg[u]
        r = (1 - d) / n + d * dangling / n + d * nxt
    for nid in ids:
        assert abs(got[nid] - r[idx[nid]]) < 1e-9, nid
    # rank mass conservation — the dangling/self-loop tripwire
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_on_derived_graph(spark, sf_dir):
    """PageRank over the real derived triple graph: mass conserved,
    deterministic across runs, and nations (high in-degree) outrank the
    customers pointing at them."""
    from rdfproject_msc_spark.operators.graph import pagerank
    from rdfproject_msc_spark.sources.derived import triples_df

    t = triples_df(spark, sf_dir)
    a = pagerank(t, iterations=5).collect()
    assert abs(sum(r.rank for r in a) - 1.0) < 1e-6
    b = {r.node: r.rank for r in pagerank(t, iterations=5).collect()}
    assert all(abs(b[r.node] - r.rank) < 1e-12 for r in a)
    ranks = {r.node: r.rank for r in a}
    # orders (positive ids tagged 2) have no in-edges — pure sources hold
    # exactly the base rank, strictly below any customer (base + inflow
    # from orders and events)
    orders = [v for k, v in ranks.items() if k > 0 and k % 10 == 2]
    customers = [v for k, v in ranks.items() if k > 0 and k % 10 == 1]
    assert max(orders) < min(customers)
