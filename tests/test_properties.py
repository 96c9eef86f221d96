"""Property-based checks (hypothesis): the invariants SURVEY.md §5 calls
for — layout invariance, encode/decode round-trips, as-of vs brute force,
LSH soundness. Spark jobs per example are expensive: few, small examples."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

triples_strategy = st.lists(
    st.tuples(
        st.integers(-50, 50).filter(lambda x: x != 0),
        st.sampled_from([11, 22, 33]),
        st.integers(-50, 50).filter(lambda x: x != 0),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=triples_strategy)
@settings(**SETTINGS)
def test_layout_invariance_property(spark, rows):
    """Same triples, any layout/cluster key → same query answer (the
    equivalence the reference's four drivers assert informally)."""
    from rdfproject_msc_spark import queries as Q
    from rdfproject_msc_spark.store import TripleStore

    df = spark.createDataFrame(rows, "s long, p long, o long")
    results = []
    for layout, key in (("single", None), ("single", "s"), ("sign_split", "p")):
        store = TripleStore(df, layout=layout, cluster_by=key)
        out = Q.path_2hop(store, None, 11, 22, None)
        results.append(sorted(map(tuple, out.collect())))
    assert results[0] == results[1] == results[2]


@given(
    pairs=st.lists(
        st.tuples(st.integers(1, 1000), st.text(min_size=1, max_size=8)),
        min_size=1,
        max_size=20,
        unique_by=(lambda p: p[0], lambda p: p[1]),
    )
)
@settings(**SETTINGS)
def test_dictionary_roundtrip_property(spark, pairs):
    from rdfproject_msc_spark.dictionary import Dictionary

    d = Dictionary(spark.createDataFrame(pairs, "id long, term string"))
    ids = spark.createDataFrame([(i,) for i, _ in pairs], "x long")
    back = d.encode(d.decode(ids, ["x"]), ["x"])
    assert sorted(r.x for r in back.collect()) == sorted(i for i, _ in pairs)


@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 30)), min_size=1, max_size=15
    ),
    right=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 30), st.integers(0, 99)),
        min_size=0,
        max_size=15,
    ),
)
@settings(**SETTINGS)
def test_asof_matches_bruteforce(spark, left, right):
    from rdfproject_msc_spark.operators.asof import asof_join

    # dedupe right on (k, t): keep max id (the operator's documented contract)
    best = {}
    for k, t, i in right:
        if (k, t) not in best or i > best[(k, t)]:
            best[(k, t)] = i
    right_rows = [(k, t, i) for (k, t), i in best.items()]

    ldf = spark.createDataFrame(
        [(k, t, n) for n, (k, t) in enumerate(left)], "k long, t long, n long"
    )
    rdf = spark.createDataFrame(right_rows or [(99, -1, -1)], "k long, t long, id long")
    out = asof_join(
        ldf, rdf, on="k", left_ts="t", right_ts="t", right_cols=["id"],
        prefix="m_", tiebreak="id",
    )
    got = {r.n: r.m_id for r in out.collect()}

    def brute(k, t):
        cands = [(rt, i) for rk, rt, i in right_rows if rk == k and rt <= t]
        return max(cands)[1] if cands else None

    want = {n: brute(k, t) for n, (k, t) in enumerate(left)}
    assert got == want


@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(-50, 50)), min_size=1, max_size=12
    ),
    right=st.lists(
        st.tuples(st.integers(1, 3), st.integers(-50, 50)), min_size=0, max_size=12
    ),
    delta=st.integers(1, 30),
)
@settings(**SETTINGS)
def test_interval_join_matches_bruteforce(spark, left, right, delta):
    from rdfproject_msc_spark.operators.asof import interval_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, t long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right)] or [(99, 0, -1)],
        "k long, t long, rid long",
    )
    out = interval_join(ldf, rdf, on="k", left_ts="t", right_ts="t", max_delta=delta)
    got = sorted((r.lid, r.near_rid) for r in out.collect())
    want = sorted(
        (li, ri)
        for li, (lk, lt) in enumerate(left)
        for ri, (rk, rt) in enumerate(right)
        if lk == rk and abs(lt - rt) <= delta
    )
    assert got == want


@given(
    rows=triples_strategy,
    p1=st.sampled_from([11, 22, 33]),
    p2=st.sampled_from([11, 22, 33]),
)
@settings(**SETTINGS)
def test_sparql_optional_matches_python_eval(spark, rows, p1, p2):
    """OPTIONAL left-join semantics vs a direct Python evaluation: matched
    rows extend, unmatched rows null-extend, multiplicities preserved."""
    from rdfproject_msc_spark.sparql.planner import sparql_to_df
    from rdfproject_msc_spark.store import TripleStore

    df = spark.createDataFrame(rows, "s long, p long, o long")
    q = f"SELECT ?a ?b ?c WHERE {{ ?a {p1} ?b . OPTIONAL {{ ?b {p2} ?c . }} }}"
    got = sorted(
        ((r.a, r.b, r.c) for r in sparql_to_df(TripleStore(df), q).collect()),
        key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0),
    )
    want = []
    for s, p, o in rows:
        if p != p1:
            continue
        exts = [oo for ss, pp, oo in rows if pp == p2 and ss == o]
        if exts:
            want.extend((s, o, c) for c in exts)
        else:
            want.append((s, o, None))
    want.sort(key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0))
    assert got == want


@given(
    rows=triples_strategy,
    p1=st.sampled_from([11, 22, 33]),
    p2=st.sampled_from([11, 22, 33]),
)
@settings(**SETTINGS)
def test_sparql_union_matches_python_eval(spark, rows, p1, p2):
    """UNION multiset semantics vs direct Python evaluation: arm results
    concatenate (duplicates preserved — p1 == p2 doubles every match)."""
    from rdfproject_msc_spark.sparql.planner import sparql_to_df
    from rdfproject_msc_spark.store import TripleStore

    df = spark.createDataFrame(rows, "s long, p long, o long")
    q = f"SELECT ?x ?y WHERE {{ {{ ?x {p1} ?y }} UNION {{ ?x {p2} ?y }} }}"
    got = sorted(
        (r.x, r.y) for r in sparql_to_df(TripleStore(df), q).collect()
    )
    want = sorted(
        [(s, o) for s, p, o in rows if p == p1]
        + [(s, o) for s, p, o in rows if p == p2]
    )
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_minhash_is_sound_subset_of_exact(spark, texts):
    """Every pair MinHash-LSH emits is verified exact-Jaccard ≥ threshold —
    the output is ALWAYS a subset of the exact all-pairs result (recall is
    probabilistic, precision is not)."""
    from rdfproject_msc_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(df, n=2, threshold=0.4).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_pairs(df, n=2, threshold=0.4).collect()
    }
    assert lsh <= exact
