"""Named graphs — GRAPH blocks over the quad data model (SPARQL 1.1 §13.3).

The reference's Jena front-end accepted GRAPH syntactically
(MyOpVisitorBase.java:49) but its translator and triple data model never
executed it; here the dataset is default graph (triples) + named graphs
(a ``(g, s, p, o)`` quad relation on TripleStore), and GRAPH lowers to:

- constant ``GRAPH <iri>``: a plain plan over that one graph's triples —
  the g-equality pushes into the quad scan (partition pruning on a
  ``write_quads`` layout), so closures/paths/subqueries work unchanged
  inside the block;
- ``GRAPH ?g``: the graph name threads through every pattern scan in the
  block as a fourth variable slot, join-keying the block's patterns to
  the same graph and binding ?g in the solution.

Fixture quads: graph 100 = {1-p10->2, 2-p11->3}; graph 101 = {1-p10->2,
2-p10->9}; graph 102 = {7-p10->8}. Default graph = {1-p10->2, 3-p10->4,
2-p10->5, 2-p11->3}.
"""

from __future__ import annotations

import pytest

from rdfproject_msc_spark.dictionary import Dictionary
from rdfproject_msc_spark.sparql.parser import SparqlSyntaxError, parse_sparql
from rdfproject_msc_spark.sparql.planner import sparql_to_df
from rdfproject_msc_spark.store import TripleStore

TRIPLES = [(1, 10, 2), (3, 10, 4), (2, 10, 5), (2, 11, 3)]
QUADS = [
    (100, 1, 10, 2),
    (100, 2, 11, 3),
    (101, 1, 10, 2),
    (101, 2, 10, 9),
    (102, 7, 10, 8),
]


@pytest.fixture(scope="module")
def gstore(spark):
    return TripleStore(
        spark.createDataFrame(TRIPLES, "s long, p long, o long"),
        quads=spark.createDataFrame(QUADS, "g long, s long, p long, o long"),
    )


@pytest.fixture(scope="module")
def gdict(spark):
    rows = [
        (10, ":p10"),
        (11, ":p11"),
        (100, ":graph_a"),
        (101, ":graph_b"),
        (1, ":n1"),
    ]
    return Dictionary(spark.createDataFrame(rows, "id long, term string"))


def _rows(df):
    key = lambda t: tuple((v is None, v) for v in t)
    return sorted((tuple(r) for r in df.collect()), key=key)


# ---- variable graph -----------------------------------------------------


def test_graph_var_joins_within_one_graph(gstore, gdict):
    """Both patterns must match in the SAME graph: only graph 100 holds
    a p10 edge whose object starts a p11 edge."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s ?o2 WHERE { GRAPH ?g { ?s :p10 ?o . ?o :p11 ?o2 } }",
        gdict,
    )
    assert _rows(df) == [(100, 1, 3)]


def test_graph_var_binds_every_graph(gstore, gdict):
    df = sparql_to_df(
        gstore, "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s :p10 ?o } }", gdict
    )
    assert _rows(df) == [
        (100, 1, 2),
        (101, 1, 2),
        (101, 2, 9),
        (102, 7, 8),
    ]


def test_graph_joins_with_default_graph_pattern(gstore, gdict):
    """GRAPH block composes with a default-graph pattern by join: the
    named-graph object continues along a DEFAULT-graph p10 edge (only
    o=2 has one: 2-p10->5)."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s ?o ?z WHERE { GRAPH ?g { ?s :p10 ?o } ?o :p10 ?z }",
        gdict,
    )
    assert _rows(df) == [(100, 1, 2, 5), (101, 1, 2, 5)]


def test_graph_var_shared_with_pattern_var(gstore, gdict):
    """GRAPH ?x { ?x ... }: the graph name equals the subject — the
    repeated-variable equality filter on the quad scan (no graph id is
    also a subject id here)."""
    df = sparql_to_df(
        gstore, "SELECT ?x ?o WHERE { GRAPH ?x { ?x :p10 ?o } }", gdict
    )
    assert _rows(df) == []


def test_optional_inside_graph_block(gstore, gdict):
    """OPTIONAL inherits the active graph: the inner p11 edge must live
    in the SAME graph (only graph 100 has one)."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s ?o ?o2 WHERE "
        "{ GRAPH ?g { ?s :p10 ?o OPTIONAL { ?o :p11 ?o2 } } }",
        gdict,
    )
    assert _rows(df) == [
        (100, 1, 2, 3),
        (101, 1, 2, None),
        (101, 2, 9, None),
        (102, 7, 8, None),
    ]


def test_filter_on_graph_var(gstore, gdict):
    """The graph variable is in scope for the block's filters (§13.3
    binds it for the whole enclosed pattern)."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s WHERE { GRAPH ?g { ?s :p10 ?o . FILTER(?g >= 101) } }",
        gdict,
    )
    assert _rows(df) == [(101, 1), (101, 2), (102, 7)]


def test_union_inside_graph_block(gstore, gdict):
    """UNION arms inherit the graph context: each arm's pattern scans the
    quad relation and binds the same ?g."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?a WHERE "
        "{ GRAPH ?g { { ?a :p11 ?b } UNION { ?a :p10 9 } } }",
        gdict,
    )
    # p11 in a named graph: only 100 (2-p11->3); object 9: only 101 (2->9)
    assert _rows(df) == [(100, 2), (101, 2)]


def test_minus_inside_graph_block(gstore, gdict):
    """MINUS inherits the graph: remove p10 solutions whose subject also
    has a p11 edge IN THE SAME GRAPH (only graph 100's 2-p11-3 — but
    subject 2 has no p10 edge in 100, so the only removal candidate is
    via shared ?s in graph 100: subject 1 has no p11; nothing removed in
    101/102)."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s ?o WHERE "
        "{ GRAPH ?g { ?s :p10 ?o MINUS { ?s :p11 ?z } } }",
        gdict,
    )
    assert _rows(df) == [(100, 1, 2), (101, 1, 2), (101, 2, 9), (102, 7, 8)]


# ---- constant graph -----------------------------------------------------


def test_constant_graph_by_term(gstore, gdict):
    df = sparql_to_df(
        gstore, "SELECT ?s ?o WHERE { GRAPH :graph_b { ?s :p10 ?o } }", gdict
    )
    assert _rows(df) == [(1, 2), (2, 9)]


def test_constant_graph_by_id(gstore, gdict):
    df = sparql_to_df(
        gstore, "SELECT ?s ?o WHERE { GRAPH 102 { ?s :p10 ?o } }", gdict
    )
    assert _rows(df) == [(7, 8)]


def test_closure_inside_constant_graph(gstore, gdict):
    """Property paths work inside a CONSTANT graph block (the block is a
    plain plan over that graph's triples): p10+ in graph 101 reaches
    1->2, 2->9, 1->9 — NOT the default graph's 2->5."""
    df = sparql_to_df(
        gstore,
        "SELECT ?s ?o WHERE { GRAPH :graph_b { ?s :p10+ ?o } }",
        gdict,
    )
    assert _rows(df) == [(1, 2), (1, 9), (2, 9)]


def test_subquery_inside_constant_graph(gstore, gdict):
    """A subquery inside a constant GRAPH block evaluates against the
    active graph (§13.3 scopes the whole enclosed pattern)."""
    df = sparql_to_df(
        gstore,
        "SELECT ?s ?c WHERE { GRAPH :graph_b "
        "{ { SELECT ?s (COUNT(*) AS ?c) WHERE { ?s :p10 ?o } GROUP BY ?s } } }",
        gdict,
    )
    assert _rows(df) == [(1, 1), (2, 1)]


def test_nested_graph_rescopes(gstore, gdict):
    """GRAPH inside a constant GRAPH block re-scopes to the dataset's
    named graphs (the quad relation is carried into the scoped plan):
    the inner block finds p11 edges in ANY graph while the outer block
    pins ?s to graph_b's subjects."""
    df = sparql_to_df(
        gstore,
        "SELECT ?s ?g2 WHERE { GRAPH :graph_b "
        "{ ?s :p10 ?o . GRAPH ?g2 { ?s :p11 ?z } } }",
        gdict,
    )
    # graph_b subjects with p10: 1, 2; p11 edges anywhere: 2-p11->3 in 100
    assert _rows(df) == [(2, 100)]


# ---- composition with query forms / modifiers ---------------------------
# once bound, ?g is an ordinary solution variable: every downstream
# feature (aggregation, CONSTRUCT templates, modifiers, VALUES) composes
# with no graph-specific code


def test_ask_over_graph(gstore, gdict):
    assert sparql_to_df(
        gstore, "ASK { GRAPH 102 { ?s :p10 ?o } }", gdict
    ).collect()[0].ask is True
    assert sparql_to_df(
        gstore, "ASK { GRAPH 103 { ?s :p10 ?o } }", gdict
    ).collect()[0].ask is False


def test_group_by_graph_var(gstore, gdict):
    df = sparql_to_df(
        gstore,
        "SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } } "
        "GROUP BY ?g",
        gdict,
    )
    assert _rows(df) == [(100, 2), (101, 2), (102, 1)]


def test_construct_with_graph_var_in_template(gstore, gdict):
    df = sparql_to_df(
        gstore,
        "CONSTRUCT { ?s :p11 ?g } WHERE { GRAPH ?g { ?s :p10 ?o } }",
        gdict,
    )
    assert _rows(df) == [
        (1, 11, 100),
        (1, 11, 101),
        (2, 11, 101),
        (7, 11, 102),
    ]


def test_order_limit_on_graph_var(gstore, gdict):
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s WHERE { GRAPH ?g { ?s :p10 ?o } } "
        "ORDER BY DESC(?g) ?s LIMIT 2",
        gdict,
    )
    assert [tuple(r) for r in df.collect()] == [(102, 7), (101, 1)]


def test_values_restricts_graph_var(gstore, gdict):
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s WHERE { GRAPH ?g { ?s :p10 ?o . "
        "VALUES ?g { 100 102 } } }",
        gdict,
    )
    assert _rows(df) == [(100, 1), (102, 7)]


# ---- rejects ------------------------------------------------------------


def test_closure_under_graph_var_executes(gstore, gdict):
    """`p+` under GRAPH ?var executes per-graph (composite-key closure,
    see test_closure_under_graph_var); COMPOSITE path expressions run
    through the same (g, node) struct keys via a virtual quad-struct
    store — the alternation closure chains p10 then p11 edges WITHIN a
    graph (only 100 holds 1-p10->2-p11->3); subqueries still reject."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s :p10+ ?o } }",
        gdict,
    )
    # fixture: 101 chains 1->2->9; 100 has 1->2; 102 has 7->8
    assert _rows(df) == [
        (100, 1, 2), (101, 1, 2), (101, 1, 9), (101, 2, 9), (102, 7, 8)
    ]
    df2 = sparql_to_df(
        gstore,
        "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s (:p10|:p11)+ ?o } }",
        gdict,
    )
    assert _rows(df2) == [
        (100, 1, 2), (100, 1, 3), (100, 2, 3),
        (101, 1, 2), (101, 1, 9), (101, 2, 9), (102, 7, 8),
    ]
    # sequence path: within-graph two-hop across predicates
    df3 = sparql_to_df(
        gstore,
        "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s :p10/:p11 ?o } }",
        gdict,
    )
    assert _rows(df3) == [(100, 1, 3)]


def test_composite_zero_length_constant_under_graph_var(gstore, gdict):
    """§18.4 ZeroLengthPath × §13.3: a COMPOSITE path with a zero-length
    arm ('?'/'*') and a constant endpoint must self-match in EVERY named
    graph — including graphs where the constant term never occurs — same
    as the single-predicate lowering (test_closure_under_graph_var).
    Term :n1 (=1) occurs in graphs 100/101 but NOT 102; the (102, 1)
    self-pair must still appear."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?o WHERE { GRAPH ?g { :n1 (:p10|:p11)? ?o } }",
        gdict,
    )
    assert _rows(df) == [
        (100, 1), (100, 2), (101, 1), (101, 2), (102, 1)
    ]
    # same must hold for the single-predicate '?' form (already-pinned
    # semantics) and agree with the composite one-arm alternation
    df_single = sparql_to_df(
        gstore,
        "SELECT ?g ?o WHERE { GRAPH ?g { :n1 :p10? ?o } }",
        gdict,
    )
    df_comp = sparql_to_df(
        gstore,
        "SELECT ?g ?o WHERE { GRAPH ?g { :n1 (:p10)? ?o } }",
        gdict,
    )
    assert _rows(df_single) == _rows(df_comp)
    # '*' composite with a constant endpoint: closure ∪ per-graph self
    df_star = sparql_to_df(
        gstore,
        "SELECT ?g ?o WHERE { GRAPH ?g { :n1 (:p10|:p11)* ?o } }",
        gdict,
    )
    assert _rows(df_star) == [
        (100, 1), (100, 2), (100, 3),
        (101, 1), (101, 2), (101, 9), (102, 1),
    ]


# ---- dataset clauses (§13.2) --------------------------------------------


def test_from_selects_default_graph(gstore, gdict):
    """FROM <g>: the active default graph is that named graph — the base
    TRIPLES relation is NOT consulted (its 3-p10->4 edge must not
    appear)."""
    df = sparql_to_df(
        gstore,
        "SELECT ?s ?o FROM :graph_a WHERE { ?s :p10 ?o }",
        gdict,
    )
    assert _rows(df) == [(1, 2)]


def test_from_merges_graphs(gstore, gdict):
    """Two FROM graphs merge by SET union: the 1-p10->2 edge present in
    BOTH graphs 100 and 101 appears once."""
    df = sparql_to_df(
        gstore,
        "SELECT ?s ?o FROM :graph_a FROM :graph_b WHERE { ?s :p10 ?o }",
        gdict,
    )
    assert _rows(df) == [(1, 2), (2, 9)]


def test_from_named_restricts_graph_var(gstore, gdict):
    """FROM NAMED: GRAPH ?g ranges over ONLY the named graphs (102 is
    excluded), and with no FROM clause the default graph is EMPTY."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s FROM NAMED :graph_a FROM NAMED :graph_b "
        "WHERE { GRAPH ?g { ?s :p10 ?o } }",
        gdict,
    )
    assert _rows(df) == [(100, 1), (101, 1), (101, 2)]
    empty = sparql_to_df(
        gstore,
        "SELECT ?s FROM NAMED :graph_a WHERE { ?s :p10 ?o }",
        gdict,
    )
    assert empty.collect() == []


def test_from_and_from_named_compose(gstore, gdict):
    # default = graph 100; GRAPH ranges over 101 only; join on ?o/?t via
    # the shared subject-chain — 1-p10->2 in the default, then per-named
    df = sparql_to_df(
        gstore,
        "SELECT ?s ?g ?t FROM :graph_a FROM NAMED :graph_b "
        "WHERE { ?s :p10 ?o . GRAPH ?g { ?o :p10 ?t } }",
        gdict,
    )
    assert _rows(df) == [(1, 101, 9)]
    # constant GRAPH outside the FROM NAMED set yields nothing
    none = sparql_to_df(
        gstore,
        "SELECT ?s FROM NAMED :graph_b "
        "WHERE { GRAPH :graph_a { ?s :p10 ?o } }",
        gdict,
    )
    assert none.collect() == []


def test_from_on_other_query_forms(gstore, gdict):
    """§13.2 dataset clauses compose with ASK / CONSTRUCT / DESCRIBE ?x
    (the clauses sit between the form's head and WHERE)."""
    ask = sparql_to_df(
        gstore, "ASK FROM :graph_b { ?s :p10 9 }", gdict
    ).collect()
    assert ask[0]["ask"] is True
    ask2 = sparql_to_df(
        gstore, "ASK FROM :graph_a { ?s :p10 9 }", gdict
    ).collect()
    assert ask2[0]["ask"] is False
    built = sparql_to_df(
        gstore,
        "CONSTRUCT { ?s :p11 ?o } FROM :graph_b WHERE { ?s :p10 ?o }",
        gdict,
    )
    assert _rows(built) == [(1, 11, 2), (2, 11, 9)]
    desc = sparql_to_df(
        gstore,
        "DESCRIBE ?s FROM :graph_b WHERE { ?s :p10 9 }",
        gdict,
    )
    # resource 2 in the SCOPED store (graph 101 only): as object of
    # 1-p10->2 and subject of 2-p10->9
    assert _rows(desc) == [(1, 10, 2), (2, 10, 9)]


def test_from_rejects(gstore, gdict, spark):
    with pytest.raises(SparqlSyntaxError, match="variable"):
        parse_sparql("SELECT ?s FROM ?g WHERE { ?s :p10 ?o }")
    bare = TripleStore(
        spark.createDataFrame(TRIPLES, "s long, p long, o long")
    )
    with pytest.raises(ValueError, match="named graphs"):
        sparql_to_df(
            bare, "SELECT ?s FROM :graph_a WHERE { ?s :p10 ?o }", gdict
        ).collect()


def test_subquery_under_graph_var_executes(gstore, gdict):
    """r9: the former reject — subqueries under a graph VARIABLE now
    evaluate per graph via the algebraic rewrite (see the dedicated
    suite at the end of this file)."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?c WHERE { GRAPH ?g "
        "{ { SELECT (COUNT(*) AS ?c) WHERE { ?s :p10 ?o } } } }",
        gdict,
    )
    assert _rows(df) == [(100, 1), (101, 2), (102, 1)]


def test_graph_without_quads_raises(spark, gdict):
    bare = TripleStore(spark.createDataFrame(TRIPLES, "s long, p long, o long"))
    with pytest.raises(ValueError, match="no named graphs"):
        sparql_to_df(
            bare, "SELECT ?g ?s WHERE { GRAPH ?g { ?s :p10 ?o } }", gdict
        ).collect()


def test_empty_graph_group_rejects():
    with pytest.raises(SparqlSyntaxError, match="empty GRAPH"):
        parse_sparql("SELECT ?x WHERE { GRAPH ?g { } ?x :p ?y }")


def test_graph_needs_name_rejects():
    with pytest.raises(SparqlSyntaxError, match="graph name"):
        parse_sparql("SELECT ?x WHERE { GRAPH { ?x :p ?y } }")


def test_bind_shadowing_graph_var_rejects(gstore, gdict):
    """BIND target = the GRAPH variable would silently collide with the
    threaded graph column; the freshness check sees ?g in scope."""
    with pytest.raises(SparqlSyntaxError, match="already bound"):
        parse_sparql(
            "SELECT ?g ?s WHERE "
            "{ GRAPH ?g { ?s :p10 ?o . BIND(?s + 1 AS ?g) } }"
        )


# ---- oracle cross-check + persisted pruning -----------------------------


def test_graph_query_matches_duckdb(spark, gstore, gdict):
    """The headline shape (var-graph 2-pattern join + default-graph hop)
    against DuckDB over the same rows."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (s BIGINT, p BIGINT, o BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", TRIPLES)
    con.execute("CREATE TABLE q (g BIGINT, s BIGINT, p BIGINT, o BIGINT)")
    con.executemany("INSERT INTO q VALUES (?,?,?,?)", QUADS)
    expect = con.execute(
        "SELECT q.g, q.s, q.o, t.o FROM q JOIN t ON q.o = t.s "
        "WHERE q.p = 10 AND t.p = 10 ORDER BY 1, 2, 3, 4"
    ).fetchall()
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s ?o ?z WHERE { GRAPH ?g { ?s :p10 ?o } ?o :p10 ?z }",
        gdict,
    )
    assert _rows(df) == [tuple(r) for r in expect]


def test_persisted_quads_prune_constant_graph(spark, gstore, gdict, tmp_path):
    """write_quads partitions BY GRAPH; a constant GRAPH block then reads
    exactly one directory — the g-equality shows up as a Catalyst
    PartitionFilter, not a post-scan Filter."""
    path = str(tmp_path / "quads")
    gstore.write_quads(path)
    disk = TripleStore(
        spark.createDataFrame(TRIPLES, "s long, p long, o long"),
        quads=TripleStore.read_quads(spark, path),
    )
    df = sparql_to_df(
        disk, "SELECT ?s ?o WHERE { GRAPH 101 { ?s :p10 ?o } }", gdict
    )
    assert _rows(df) == [(1, 2), (2, 9)]
    df.collect()  # fingerprint the EXECUTED plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "PartitionFilters" in final
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", final)
    assert pf and "g" in pf.group(1), final


# ---- property fuzz: GRAPH ?g block vs direct Python evaluation ----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

from tests._budget import examples

quads_st = hst.lists(
    hst.tuples(
        hst.integers(min_value=100, max_value=102),
        hst.integers(min_value=1, max_value=4),
        hst.sampled_from([10, 11]),
        hst.integers(min_value=1, max_value=4),
    ),
    min_size=0,
    max_size=12,
)
triples_st = hst.lists(
    hst.tuples(
        hst.integers(min_value=1, max_value=4),
        hst.sampled_from([10, 11]),
        hst.integers(min_value=1, max_value=4),
    ),
    min_size=0,
    max_size=8,
)


@given(quads=quads_st, trips=triples_st, with_default=hst.booleans())
@settings(
    max_examples=examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_graph_var_fuzz(spark, quads, trips, with_default):
    """GRAPH ?g { ?s 10 ?o . ?o 11 ?o2 } [?o2 10 ?z]: both in-block
    patterns must match in the SAME graph; the optional trailing pattern
    reads the default graph. Compared against a direct evaluation."""
    q = "SELECT * WHERE { GRAPH ?g { ?s 10 ?o . ?o 11 ?o2 } "
    q += "?o2 10 ?z }" if with_default else "}"
    st_ = TripleStore(
        spark.createDataFrame(
            trips or [(0, 0, 0)], "s long, p long, o long"
        ).filter("s > 0" if not trips else "1=1"),
        quads=spark.createDataFrame(
            quads or [(0, 0, 0, 0)], "g long, s long, p long, o long"
        ).filter("g > 0" if not quads else "1=1"),
    )
    out = sparql_to_df(st_, q)
    cols = sorted(out.columns)
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())

    want = []
    for g1, s1, p1, o1 in quads:
        if p1 != 10:
            continue
        for g2, s2, p2, o2 in quads:
            if p2 != 11 or g2 != g1 or s2 != o1:
                continue
            if with_default:
                for s3, p3, o3 in trips:
                    if p3 == 10 and s3 == o2:
                        want.append(
                            dict(g=g1, s=s1, o=o1, o2=o2, z=o3)
                        )
            else:
                want.append(dict(g=g1, s=s1, o=o1, o2=o2))
    want_t = sorted(tuple(m[c] for c in cols) for m in want)
    assert got == want_t


def test_closure_under_graph_var(spark, gdict):
    """`?s :p10+ ?o` inside GRAPH ?g: reachability PER GRAPH over
    composite (g, node) closure keys — a path never crosses graphs.
    Graph 200 chains 1->2->3; graph 201 has 1->5: the cross-graph
    pseudo-path 2->3 (200) continued by nothing in 201 must not appear."""
    st_ = TripleStore(
        spark.createDataFrame([(1, 10, 2)], "s long, p long, o long"),
        quads=spark.createDataFrame(
            [(200, 1, 10, 2), (200, 2, 10, 3), (201, 1, 10, 5),
             (202, 9, 11, 1)],
            "g long, s long, p long, o long",
        ),
    )
    df = sparql_to_df(
        st_, "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s :p10+ ?o } }", gdict
    )
    assert _rows(df) == [
        (200, 1, 2), (200, 1, 3), (200, 2, 3), (201, 1, 5)
    ]
    # constant endpoint post-filters the per-graph closure
    df2 = sparql_to_df(
        st_, "SELECT ?g ?o WHERE { GRAPH ?g { 1 :p10+ ?o } }", gdict
    )
    assert _rows(df2) == [(200, 2), (200, 3), (201, 5)]
    # closure endpoint continues along a SAME-graph edge
    df3 = sparql_to_df(
        st_,
        "SELECT ?g ?s ?o ?t WHERE { GRAPH ?g { ?s :p10+ ?o . ?o :p10 ?t } }",
        gdict,
    )
    assert _rows(df3) == [(200, 1, 2, 3)]
    # zero-length forms add the per-graph §18.4 pairs: every (g, term)
    # of graph g to itself, plus the closure — graph 202 (only a p11
    # edge) still contributes its nodes' self-pairs
    df4 = sparql_to_df(
        st_, "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s :p10* ?o } }", gdict
    )
    assert _rows(df4) == [
        (200, 1, 1), (200, 1, 2), (200, 1, 3), (200, 2, 2), (200, 2, 3),
        (200, 3, 3), (201, 1, 1), (201, 1, 5), (201, 5, 5),
        (202, 1, 1), (202, 9, 9),
    ]
    # a constant endpoint zero-length-matches itself in EVERY named graph
    df5 = sparql_to_df(
        st_, "SELECT ?g ?o WHERE { GRAPH ?g { 1 :p10? ?o } }", gdict
    )
    assert _rows(df5) == [
        (200, 1), (200, 2), (201, 1), (201, 5), (202, 1)
    ]


@given(quads=quads_st)
@settings(
    max_examples=examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_graph_closure_fuzz(spark, quads, ):
    """Per-graph p10+ reachability vs a direct per-graph transitive
    closure in Python — paths must never cross graphs."""
    st_ = TripleStore(
        spark.createDataFrame([(1, 10, 2)], "s long, p long, o long"),
        quads=spark.createDataFrame(
            quads or [(0, 0, 0, 0)], "g long, s long, p long, o long"
        ).filter("g > 0" if not quads else "1=1"),
    )
    out = sparql_to_df(
        st_, "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s 10+ ?o } }"
    )
    cols = sorted(out.columns)
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())

    want = set()
    graphs = {g for g, _, p, _ in quads if p == 10}
    for g in graphs:
        edges = {(s, o) for gg, s, p, o in quads if gg == g and p == 10}
        reach = set(edges)
        while True:
            new = {
                (a, d)
                for a, b in reach
                for c, d in edges
                if b == c and (a, d) not in reach
            }
            if not new:
                break
            reach |= new
        want |= {(g, s, o) for s, o in reach}
    want_t = sorted(
        tuple(dict(g=g, s=s, o=o)[c] for c in cols) for g, s, o in want
    )
    assert got == want_t


def test_sparql_from_registry_entry_is_load_bearing(spark, sf_dir):
    """The driver entry must pin REAL rows (round-6 regression: FROM
    NAMED {0,2} could never contain an `:inNation` triple — subjects
    are 10c+1, odd, so |s| % 4 ∈ {1,3} — and the green hash-match
    compared two empty results). With FROM 1 / FROM NAMED 3 both
    clauses restrict their pattern's input AND the result is
    non-empty: only odd-event `?e` (graph 1) and odd-customer `?c`
    (graph 3) bindings survive."""
    from rdfproject_msc_spark.registry import REGISTRY

    rows = REGISTRY["sparql_from"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    assert {r["g"] for r in rows} == {3}
    # `:inNation` subjects 10c+1 with c odd ⇒ id % 20 == 11
    assert all(r["c"] % 20 == 11 for r in rows)
    # `:byUser` subjects -(10e+7) with e odd ⇒ |id| % 20 == 17
    assert all((-r["e"]) % 20 == 17 for r in rows)


def test_disjoint_from_fast_path_skips_distinct(spark, gdict):
    """graphs_disjoint=True (r7): a multi-graph FROM skips the RDF-merge
    .distinct() — identical results on disjoint data, and the executed
    plan loses the duplicate-elimination Exchange entirely."""
    dis_quads = [
        (100, 1, 10, 2),
        (100, 2, 11, 3),
        (101, 2, 10, 9),
        (102, 7, 10, 8),
    ]
    base = spark.createDataFrame([(1, 10, 2)], "s long, p long, o long")
    q = "SELECT ?s ?o FROM :graph_a FROM :graph_b WHERE { ?s :p10 ?o }"

    def run(disjoint):
        st_ = TripleStore(
            base,
            quads=spark.createDataFrame(
                dis_quads, "g long, s long, p long, o long"
            ),
            graphs_disjoint=disjoint,
        )
        df = sparql_to_df(st_, q, gdict)
        rows = _rows(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        return rows, plan.split("Initial Plan")[0]

    slow_rows, slow_plan = run(False)
    fast_rows, fast_plan = run(True)
    assert fast_rows == slow_rows == [(1, 2), (2, 9)]
    assert "Exchange" in slow_plan  # the merge's duplicate elimination
    assert "Exchange" not in fast_plan  # filter + project only


def test_write_quads_proves_disjointness(spark, gdict, tmp_path):
    """r8: write_quads PROVES graph disjointness (one keyed aggregation)
    and persists a _GRAPHS_DISJOINT marker; attach_quads_path applies the
    proof, so the multi-graph-FROM merge-skip fast path turns on without
    a trust-me flag — and does NOT turn on for overlapping graphs."""
    q = "SELECT ?s ?o FROM :graph_a FROM :graph_b WHERE { ?s :p10 ?o }"
    base = spark.createDataFrame([(1, 10, 2)], "s long, p long, o long")
    dis_quads = [(100, 1, 10, 2), (100, 2, 11, 3), (101, 2, 10, 9)]
    # (1,10,2) asserted in BOTH graphs → NOT disjoint
    ovl_quads = [(100, 1, 10, 2), (101, 1, 10, 2), (101, 2, 10, 9)]

    def roundtrip(quad_rows, subdir):
        path = str(tmp_path / subdir)
        w = TripleStore(
            base,
            quads=spark.createDataFrame(
                quad_rows, "g long, s long, p long, o long"
            ),
        )
        w.write_quads(path)
        r = TripleStore(base)
        r.attach_quads_path(spark, path)
        return r, path

    st, path = roundtrip(dis_quads, "dis")
    assert TripleStore.quads_disjoint_proven(spark, path)
    assert st.graphs_disjoint
    df = sparql_to_df(st, q, gdict)
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2), (2, 9)]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("Initial Plan")[0]  # merge skipped

    st, path = roundtrip(ovl_quads, "ovl")
    assert not TripleStore.quads_disjoint_proven(spark, path)
    assert not st.graphs_disjoint  # proof refused — slow correct path
    df = sparql_to_df(st, q, gdict)
    # the RDF merge dedupes the doubly-asserted triple
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2), (2, 9)]

    # opt-out writes no marker even on disjoint data
    path = str(tmp_path / "noverify")
    w = TripleStore(
        base,
        quads=spark.createDataFrame(
            dis_quads, "g long, s long, p long, o long"
        ),
    )
    w.write_quads(path, verify_disjoint=False)
    assert not TripleStore.quads_disjoint_proven(spark, path)

    # an explicit caller declaration is still honored after attach
    r = TripleStore(base, graphs_disjoint=True)
    r.attach_quads_path(spark, path)
    assert r.graphs_disjoint


# ---- subqueries under a graph VARIABLE (r9: per-graph evaluation via the
# algebraic rewrite GRAPH ?g { SELECT P WHERE W } ≡
# { SELECT ?g P WHERE { GRAPH ?g { W } } GROUP BY ?g, keys }) -------------


def test_subquery_grouped_aggregate_per_graph(gstore, gdict):
    """§18.2.4.3 inner SELECT with GROUP BY under GRAPH ?g: the
    aggregate partitions PER GRAPH — subject out-degrees differ across
    graphs holding the same subject."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s ?n WHERE { GRAPH ?g "
        "{ { SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } GROUP BY ?s } } }",
        gdict,
    )
    assert _rows(df) == [
        (100, 1, 1),
        (101, 1, 1),
        (101, 2, 1),
        (102, 7, 1),
    ]


def test_subquery_scalar_aggregate_per_graph(gstore, gdict):
    """An aggregate with NO group key yields one row PER GRAPH (the
    rewrite's appended ?g key IS the per-graph evaluation)."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?t WHERE { GRAPH ?g "
        "{ { SELECT (COUNT(*) AS ?t) WHERE { ?s :p10 ?o } } } }",
        gdict,
    )
    assert _rows(df) == [(100, 1), (101, 2), (102, 1)]


def test_subquery_joins_outer_pattern_same_graph(gstore, gdict):
    """The subquery's projection joins the enclosing block's patterns
    WITHIN one graph: only graph 100 holds both the p10 edge and a p11
    subject matching it."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?a ?s ?n WHERE { GRAPH ?g { ?a :p10 ?s . "
        "{ SELECT ?s (COUNT(*) AS ?n) WHERE { ?s :p11 ?y } GROUP BY ?s } } }",
        gdict,
    )
    assert _rows(df) == [(100, 1, 2, 1)]


def test_subquery_distinct_per_graph(gstore, gdict):
    """DISTINCT inside the subquery de-duplicates per (graph,
    projection), not across graphs — :n1 appears for BOTH graphs."""
    df = sparql_to_df(
        gstore,
        "SELECT ?g ?s WHERE { GRAPH ?g "
        "{ { SELECT DISTINCT ?s WHERE { ?s :p10 ?o } } } }",
        gdict,
    )
    assert _rows(df) == [(100, 1), (101, 1), (101, 2), (102, 7)]


def test_subquery_under_graph_var_rejects_limit(gstore, gdict):
    with pytest.raises(SparqlSyntaxError, match="per graph"):
        sparql_to_df(
            gstore,
            "SELECT ?g WHERE { GRAPH ?g "
            "{ { SELECT ?s WHERE { ?s :p10 ?o } LIMIT 1 } } }",
            gdict,
        )


def test_subquery_under_graph_var_rejects_gvar_reuse(gstore, gdict):
    """An inner variable named like the graph variable is independent
    per §18.2.4.3 — the engine refuses to silently unify them."""
    with pytest.raises(SparqlSyntaxError, match="rename"):
        sparql_to_df(
            gstore,
            "SELECT ?g WHERE { GRAPH ?g "
            "{ { SELECT ?s WHERE { ?s :p10 ?g } } } }",
            gdict,
        )
