"""Nested group graph patterns (SPARQL 1.1 §5.2, recursive §18.2.2.2
algebra): OPTIONAL-inside-OPTIONAL, OPTIONAL-inside-UNION-arms, plain
`{}` subgroups with group-scoped FILTERs, MINUS/closures inside groups,
and UNION blocks nested in UNION arms.

The reference's Jena front-end accepted all of this surface
(MyOpVisitorBase.java:49) even though its translator handled one triple
pattern; the recursive parser/planner pair makes the full group algebra
execute. Expectations are hand-derived from the tiny fixture:
p10 edges 1→1, 1→2, 2→2, -5→1; p20 edge 2→3.
"""

from __future__ import annotations

import pytest

from rdfproject_msc_spark.dictionary import Dictionary
from rdfproject_msc_spark.sparql.parser import SparqlSyntaxError, parse_sparql
from rdfproject_msc_spark.sparql.planner import sparql_to_df
from rdfproject_msc_spark.store import TripleStore


@pytest.fixture(scope="module")
def tiny_store(spark):
    rows = [
        (1, 10, 1),
        (1, 10, 2),
        (2, 10, 2),
        (2, 20, 3),
        (-5, 10, 1),
    ]
    return TripleStore(spark.createDataFrame(rows, "s long, p long, o long"))


@pytest.fixture(scope="module")
def tiny_dict(spark):
    rows = [
        (10, ":p10"),
        (20, ":p20"),
        (1, ":n1"),
        (2, ":n2"),
        (3, ":n3"),
        (-5, ":neg5"),
    ]
    return Dictionary(spark.createDataFrame(rows, "id long, term string"))


def _rows(df, *cols):
    key = lambda t: tuple((v is None, v) for v in t)
    return sorted(
        (tuple(getattr(r, c) for c in cols) for r in df.collect()), key=key
    )


def test_nested_optional_executes(tiny_store, tiny_dict):
    """OPTIONAL inside OPTIONAL: the inner left join binds before the
    outer null-extension (bottom-up group algebra)."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b ?c ?d WHERE { ?a :p10 ?b . "
        "OPTIONAL { ?b :p10 ?c . OPTIONAL { ?c :p20 ?d } } }",
        tiny_dict,
    )
    # optional group standalone: (b,c,d) ∈ {(1,1,∅),(1,2,3),(2,2,3),(-5,1,∅)}
    assert _rows(df, "a", "b", "c", "d") == [
        (-5, 1, 1, None),
        (-5, 1, 2, 3),
        (1, 1, 1, None),
        (1, 1, 2, 3),
        (1, 2, 2, 3),
        (2, 2, 2, 3),
    ]


def test_optional_inside_union_arm(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?x WHERE { "
        "{ ?s :p10 ?o . OPTIONAL { ?o :p20 ?x } } UNION { ?s :p20 ?o } }",
        tiny_dict,
    )
    assert _rows(df, "s", "o", "x") == [
        (-5, 1, None),
        (1, 1, None),
        (1, 2, 3),
        (2, 2, 3),
        (2, 3, None),
    ]


def test_subgroup_with_scoped_filter(tiny_store, tiny_dict):
    """A plain nested group joins in; its FILTER applies to the group's
    own solution before the join."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b ?c WHERE { ?a :p10 ?b . "
        "{ ?b :p20 ?c . FILTER(?c > 2) } }",
        tiny_dict,
    )
    assert _rows(df, "a", "b", "c") == [(1, 2, 3), (2, 2, 3)]


def test_deeply_nested_braces(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { { { ?a :p10 ?b } } }", tiny_dict
    )
    assert _rows(df, "a", "b") == [(-5, 1), (1, 1), (1, 2), (2, 2)]


def test_filter_inside_union_arm(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { "
        "{ ?s :p10 ?o . FILTER(?o > 1) } UNION { ?s :p20 ?o } }",
        tiny_dict,
    )
    assert _rows(df, "s", "o") == [(1, 2), (2, 2), (2, 3)]


def test_minus_inside_optional(tiny_store, tiny_dict):
    """MINUS nested in an OPTIONAL applies within the group before the
    left join. ?c=3 is no p10 subject, so the MINUS removes nothing;
    a MINUS on ?b :p10 ?x removes every (b,c) with b a p10 subject."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b ?c WHERE { ?a :p10 ?b . "
        "OPTIONAL { ?b :p20 ?c . MINUS { ?c :p10 ?x } } }",
        tiny_dict,
    )
    assert _rows(df, "a", "b", "c") == [
        (-5, 1, None),
        (1, 1, None),
        (1, 2, 3),
        (2, 2, 3),
    ]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b ?c WHERE { ?a :p10 ?b . "
        "OPTIONAL { ?b :p20 ?c . MINUS { ?b :p10 ?x } } }",
        tiny_dict,
    )
    # group row (b=2,c=3) removed (2 is a p10 subject) → all null-extended
    assert _rows(df, "a", "b", "c") == [
        (-5, 1, None),
        (1, 1, None),
        (1, 2, None),
        (2, 2, None),
    ]


def test_closure_inside_optional(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b ?c WHERE { ?a :p20 ?b . OPTIONAL { ?a :p10+ ?c } }",
        tiny_dict,
    )
    # p20 gives a=2; reachability over p10 from 2: {2} (self-loop)
    assert _rows(df, "a", "b", "c") == [(2, 3, 2)]


def test_union_nested_in_union_arm(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { "
        "{ { ?s :p10 ?o } UNION { ?s :p20 ?o } } UNION { ?s :p20 ?o } }",
        tiny_dict,
    )
    # multiset union: the p20 edge appears twice
    assert _rows(df, "s", "o") == [
        (-5, 1),
        (1, 1),
        (1, 2),
        (2, 2),
        (2, 3),
        (2, 3),
    ]


def test_minus_keyed_on_nullable_and_bound_vars_compat(tiny_store, tiny_dict):
    """MINUS sharing a nullable var (?x, from the OPTIONAL) AND a bound
    var (?c): the unbound-?x branch removes on the ?c overlap alone,
    the bound branch needs both to match. Hand-derived: Ω1 =
    {(a,b,c=2,d=3,x)} for p10 edges with x = 3 iff b=2 else ⊥; MINUS
    rows (x,c) = p10 edges — c=2 matches (1,2),(2,2) so ⊥-x rows drop;
    (x=3,c=2) matches nothing so the x=3 rows survive."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?x WHERE { ?a :p10 ?b . ?c :p20 ?d . "
        "OPTIONAL { ?b :p20 ?x } MINUS { ?x :p10 ?c } }",
        tiny_dict,
    )
    assert _rows(df, "a", "x") == [(1, 3), (2, 3)]


def test_subgroup_filter_outer_var_is_unbound(tiny_store, tiny_dict):
    """§18.2.2.2 (r6): a nested group's FILTER referencing an OUTER
    variable evaluates it as UNBOUND (groups plan bottom-up) —
    comparison → error → filter-false empties the group; !BOUND is
    true. Root-level unknown filter vars still reject (typo guard)."""
    # ?b is parent-bound only: comparison errors inside the group
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a WHERE { ?a :p10 ?b . { ?c :p20 ?d . FILTER(?b > 0) } }",
        tiny_dict,
    )
    assert df.collect() == []
    # !BOUND(outer) is TRUE inside the group — a no-op filter
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?c WHERE { ?a :p10 ?b . "
        "{ ?c :p20 ?d . FILTER(!BOUND(?b)) } }",
        tiny_dict,
    )
    assert _rows(df, "a", "c") == [(-5, 2), (1, 2), (1, 2), (2, 2)]
    with pytest.raises(SparqlSyntaxError, match="FILTER variable"):
        parse_sparql("SELECT ?a WHERE { ?a :p10 ?b . FILTER(?zz > 1) }")


def test_bind_inside_groups(tiny_store, tiny_dict):
    """BIND inside nested groups computes within the group's own scope
    (the planner's per-group Extend), and the target is visible outside
    once the group joins in."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?c ?d WHERE { ?a :p10 ?b . "
        "{ ?b :p20 ?c . BIND(?c + 1 AS ?d) } }",
        tiny_dict,
    )
    assert _rows(df, "a", "c", "d") == [(1, 3, 4), (2, 3, 4)]
    # BIND inside a UNION arm: the other arm leaves the target unbound
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?t WHERE { "
        "{ ?s :p20 ?o . BIND(?o * 10 AS ?t) } UNION { ?s :p10 ?o } }",
        tiny_dict,
    )
    assert _rows(df, "s", "o", "t") == [
        (-5, 1, None),
        (1, 1, None),
        (1, 2, None),
        (2, 2, None),
        (2, 3, 30),
    ]
    # root-level unknown BIND vars still reject (typo guard)
    with pytest.raises(SparqlSyntaxError, match="not in scope"):
        parse_sparql(
            "SELECT ?a WHERE { ?a :p10 ?b . BIND(?zz + 1 AS ?d) }"
        )


def test_subgroup_bind_outer_var_is_unbound(tiny_store, tiny_dict):
    """§18.2.2.2 (r7): a nested group's BIND referencing an OUTER
    variable evaluates it as UNBOUND (groups plan bottom-up, mirroring
    the r6 FILTER rule) — arithmetic over unbound → error → the target
    is unbound; IF(BOUND(?outer),...) takes the false branch; the
    OUTER binding itself is NOT clobbered by the group's NULL."""
    # ?b is parent-bound only: ?d is unbound in every solution, ?b keeps
    # its outer value (inner group: ?a :p20 ?c matches only a=2,c=3;
    # join on ?a keeps outer row (2,2))
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b ?c ?d WHERE { ?a :p10 ?b . "
        "{ ?a :p20 ?c . BIND(?b + 1 AS ?d) } }",
        tiny_dict,
    )
    assert _rows(df, "a", "b", "c", "d") == [(2, 2, 3, None)]
    # IF(BOUND(outer)...) inside the group: false branch
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?f WHERE { ?a :p10 ?b . "
        "{ ?a :p20 ?c . BIND(IF(BOUND(?b), 1, 0) AS ?f) } }",
        tiny_dict,
    )
    assert _rows(df, "a", "f") == [(2, 0)]
    # string-expression BIND over an outer var: CONCAT errors → unbound
    df = sparql_to_df(
        tiny_store,
        'SELECT ?a ?t WHERE { ?a :p10 ?b . '
        '{ ?a :p20 ?c . BIND(CONCAT(STR(?b), "x") AS ?t) } }',
        tiny_dict,
    )
    assert _rows(df, "a", "t") == [(2, None)]
    # BIND inside a UNION arm referencing the other arm's variable:
    # unbound in THIS arm (each arm plans standalone)
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?t WHERE { "
        "{ ?s :p20 ?o . BIND(?q * 10 AS ?t) } UNION { ?s :p10 ?q } }",
        tiny_dict,
    )
    assert _rows(df, "s", "t") == [
        (-5, None), (1, None), (1, None), (2, None), (2, None),
    ]
    # BIND inside an OPTIONAL referencing a required-side var: the
    # OPTIONAL's pattern evaluates bottom-up too — ?d unbound, but the
    # optional's own ?x binds normally
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?x ?d WHERE { ?a :p10 ?b . "
        "OPTIONAL { ?b :p20 ?x . BIND(?a + 1 AS ?d) } }",
        tiny_dict,
    )
    assert _rows(df, "a", "x", "d") == [
        (-5, None, None), (1, 3, None), (1, None, None), (2, 3, None),
    ]


def test_values_inside_group_executes(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { { ?s :p10 ?o . VALUES ?o { 2 } } }",
        tiny_dict,
    )
    assert _rows(df, "s", "o") == [(1, 2), (2, 2)]


def test_exists_inside_optional(tiny_store, tiny_dict):
    """FILTER EXISTS nested in an OPTIONAL constrains the group before
    null-extension: only ?b values that are ALSO p10 subjects survive
    inside the group."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b ?c WHERE { ?a :p10 ?b . "
        "OPTIONAL { ?b :p10 ?c . FILTER EXISTS { ?c :p20 ?x } } }",
        tiny_dict,
    )
    # group standalone: ?b :p10 ?c with c having a p20 edge → c=2 only
    assert _rows(df, "a", "b", "c") == [
        (-5, 1, 2),
        (1, 1, 2),
        (1, 2, 2),
        (2, 2, 2),
    ]


def _duck(sf_dir):
    import os

    import duckdb

    con = duckdb.connect()
    for t in (
        "orders",
        "customer",
        "nation",
        "region",
        "events",
        "lineitem",
        "supplier",
        "part",
        "documents",
        "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return con


def test_closure_over_alternation_matches_recursive_oracle(spark, sf_dir):
    """`(p1|p2)+` — transitive closure over a COMPOSITE inner relation —
    vs a DuckDB WITH RECURSIVE oracle over the union edge set. Seeded from
    :order_1: order →placedBy→ customer →inNation→ nation (+ the
    customer's linkedEvent chain is not in the predicate set)."""
    from rdfproject_msc_spark.sources.derived import (
        P_IN_NATION,
        P_PLACED_BY,
        TRIPLES_SQL,
        dictionary_df,
        triples_df,
    )

    store = TripleStore(triples_df(spark, sf_dir))
    d = Dictionary(dictionary_df(spark, sf_dir))
    got = sorted(
        r.x
        for r in sparql_to_df(
            store,
            "SELECT ?x WHERE { :order_1 (:placedBy|:inNation)+ ?x }",
            d,
        ).collect()
    )
    preds = f"({P_PLACED_BY}, {P_IN_NATION})"
    want = sorted(
        r[0]
        for r in _duck(sf_dir)
        .execute(
            f"""WITH RECURSIVE triples AS ({TRIPLES_SQL}),
        reach(x) AS (
            SELECT o FROM triples WHERE p IN {preds} AND s = 12
            UNION
            SELECT t.o FROM reach r JOIN triples t
            ON t.p IN {preds} AND t.s = r.x
        )
        SELECT x FROM reach"""
        )
        .fetchall()
    )
    assert got == want and len(got) == 2  # the customer and its nation


def test_sequence_with_inner_closure_matches_oracle(spark, sf_dir):
    """`p1/(p2*)` — a zero-or-more closure nested inside a sequence: the
    inner closure's §18.4 zero-length arm lets the sequence stop at the
    nation OR continue to its region."""
    from rdfproject_msc_spark.sources.derived import (
        P_IN_NATION,
        P_IN_REGION,
        TRIPLES_SQL,
        dictionary_df,
        triples_df,
    )

    store = TripleStore(triples_df(spark, sf_dir))
    d = Dictionary(dictionary_df(spark, sf_dir))
    got = sorted(
        r.x
        for r in sparql_to_df(
            store,
            "SELECT ?x WHERE { :customer_3 :inNation/(:inRegion*) ?x }",
            d,
        ).collect()
    )
    want = sorted(
        r[0]
        for r in _duck(sf_dir)
        .execute(
            f"""WITH triples AS ({TRIPLES_SQL})
        SELECT cn.o AS x FROM triples cn
        WHERE cn.s = 31 AND cn.p = {P_IN_NATION}
        UNION
        SELECT ir.o FROM triples cn JOIN triples ir
        ON ir.s = cn.o AND ir.p = {P_IN_REGION}
        WHERE cn.s = 31 AND cn.p = {P_IN_NATION}"""
        )
        .fetchall()
    )
    assert got == want and len(got) == 2  # the nation and its region


def test_filter_inside_minus_group(tiny_store, tiny_dict):
    """A FILTER inside MINUS constrains the removal set before the
    anti-join (the group plans standalone, filter and all)."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . "
        "MINUS { ?s :p10 ?x . FILTER(?x > 1) } }",
        tiny_dict,
    )
    # removal set: subjects with a p10 object > 1 → {1, 2}; -5 survives
    assert _rows(df, "s", "o") == [(-5, 1)]


def test_values_inside_optional_group(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?c WHERE { ?s :p10 ?o . "
        "OPTIONAL { ?o :p10 ?c . VALUES ?c { 1 } } }",
        tiny_dict,
    )
    assert _rows(df, "s", "o", "c") == [
        (-5, 1, 1),
        (1, 1, 1),
        (1, 2, None),
        (2, 2, None),
    ]


def test_subquery_aggregate_joins_back(tiny_store, tiny_dict):
    """§12 subquery: per-subject p10 out-degree aggregated in the nested
    SELECT, joined back on the projected ?s."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?n WHERE { ?s :p10 ?o . "
        "{ SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } GROUP BY ?s } }",
        tiny_dict,
    )
    assert _rows(df, "s", "o", "n") == [
        (-5, 1, 1),
        (1, 1, 2),
        (1, 2, 2),
        (2, 2, 1),
    ]


def test_scalar_subquery_cross_joins(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?t WHERE { ?s :p20 ?o . "
        "{ SELECT (COUNT(?x) AS ?t) WHERE { ?x :p10 ?y } } }",
        tiny_dict,
    )
    assert _rows(df, "s", "t") == [(2, 4)]


def test_subquery_projection_scoping(tiny_store, tiny_dict):
    """§18.2.4.4: only the subquery's PROJECTED variables are visible —
    an outer reference to a subquery-internal variable is rejected.
    SELECT * subqueries (r6) materialize their visible variables as the
    projection at parse time."""
    with pytest.raises(SparqlSyntaxError, match="projected variables"):
        parse_sparql(
            "SELECT ?s ?y WHERE { ?s :p20 ?o . "
            "{ SELECT ?s WHERE { ?s :p10 ?y } } }"
        )
    bgp = parse_sparql(
        "SELECT ?s WHERE { ?s :p20 ?o . "
        "{ SELECT * WHERE { ?s :p10 ?y } } }"
    )
    assert bgp.where.subgroups[0].subselects[0].projection == ("s", "y")


def test_subquery_matches_oracle(spark, sf_dir):
    """The registry subquery entry (per-customer order count joined to the
    nation pattern) vs its plain-SQL subquery oracle at sf0.001."""
    from rdfproject_msc_spark import registry as R
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(
        R.sparql_subquery(spark, sf_dir), R.SPARQL_SUBQUERY_SQL, sf_dir
    )


def test_ask_and_construct_over_nested_groups(tiny_store, tiny_dict):
    """ASK and CONSTRUCT ride the same recursive group machinery."""
    ask = sparql_to_df(
        tiny_store,
        "ASK { ?s :p10 ?o . { ?o :p20 ?x . FILTER(?x > 2) } }",
        tiny_dict,
    )
    assert [r.ask for r in ask.collect()] == [True]
    ask = sparql_to_df(
        tiny_store,
        "ASK { ?s :p10 ?o . { ?o :p20 ?x . FILTER(?x > 99) } }",
        tiny_dict,
    )
    assert [r.ask for r in ask.collect()] == [False]
    g = sparql_to_df(
        tiny_store,
        "CONSTRUCT { ?s :p20 ?x } WHERE { ?s :p10 ?o . { ?o :p20 ?x } }",
        tiny_dict,
    )
    # ?o=2 has the p20 edge 2→3; subjects reaching o=2: 1 (via 1→2), 2
    assert sorted((r.s, r.p, r.o) for r in g.collect()) == [
        (1, 20, 3),
        (2, 20, 3),
    ]


def test_nested_group_term_constants_encode(tiny_store, tiny_dict):
    """Term constants inside nested groups resolve through the one
    bounded dictionary lookup."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?c WHERE { ?a :p10 :n2 . { :n2 :p20 ?c } }",
        tiny_dict,
    )
    assert _rows(df, "a", "c") == [(1, 3), (2, 3)]


def test_negated_set_in_composite_paths(tiny_store, tiny_dict):
    """§9.1 PathNegatedPropertySet composed with sequence/closure
    operators: compiles to a NOT-IN edge scan inside the path relation."""
    df = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { ?a !(:p20)/:p20 ?b }", tiny_dict
    )
    assert _rows(df, "a", "b") == [(1, 3), (2, 3)]
    df = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { ?a (!(:p10))+ ?b }", tiny_dict
    )
    assert _rows(df, "a", "b") == [(2, 3)]
    # standalone negated sets stay on the pattern-level NOT-IN scan
    bgp = parse_sparql("SELECT ?a ?b WHERE { ?a !(:p10|:p20) ?b }")
    assert bgp.patterns[0].p[0] == "notin"
    # inverse members (§9.1: !(P|^Q) ≡ !(P) | ^!(Q)): !(^:p10) matches
    # (a,b) iff some triple (b,p,a) has p ≠ 10 — only (2,20,3) qualifies
    df = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { ?a !(^:p10) ?b }", tiny_dict
    )
    assert _rows(df, "a", "b") == [(3, 2)]
    # mixed members: forward complement ∪ swapped inverse complement
    df = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { ?a !(:p10|^:p20) ?b }", tiny_dict
    )
    assert _rows(df, "a", "b") == [(1, -5), (1, 1), (2, 1), (2, 2), (2, 3)]


def test_subquery_as_union_arm_and_optional_body(tiny_store, tiny_dict):
    """§12 subqueries compose in every group position: UNION arm,
    OPTIONAL body, and as the whole WHERE clause."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?n WHERE { "
        "{ SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } GROUP BY ?s } "
        "UNION { ?s :p20 ?n } }",
        tiny_dict,
    )
    assert _rows(df, "s", "n") == [(-5, 1), (1, 2), (2, 1), (2, 3)]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?n WHERE { "
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } GROUP BY ?s }",
        tiny_dict,
    )
    assert _rows(df, "s", "n") == [(-5, 1), (1, 2), (2, 1)]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?n WHERE { ?s :p20 ?o . OPTIONAL { "
        "SELECT ?s (COUNT(?x) AS ?n) WHERE { ?s :p10 ?x } GROUP BY ?s } }",
        tiny_dict,
    )
    assert _rows(df, "s", "o", "n") == [(2, 3, 1)]


def test_subquery_inside_subquery(tiny_store, tiny_dict):
    """Two levels of §12 nesting: the inner subquery aggregates, the
    outer subquery filters over it, the main query joins the result."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?n WHERE { ?s :p10 ?o . "
        "{ SELECT ?s ?n WHERE { "
        "  { SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } GROUP BY ?s } "
        "  FILTER(?n >= 2) } } }",
        tiny_dict,
    )
    # only s=1 has out-degree 2; its two p10 rows each join the (1,2) row
    assert _rows(df, "s", "n") == [(1, 2), (1, 2)]


def test_multivar_values_inside_nested_group(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { { ?s :p10 ?o . "
        "VALUES (?s ?o) { (1 2) (2 2) } } }",
        tiny_dict,
    )
    assert _rows(df, "s", "o") == [(1, 2), (2, 2)]


def test_aggregating_subqueries_match_oracle(spark, sf_dir):
    """§18.2.4.3 aggregating subqueries, oracle-pinned beyond the driver
    row's GROUP BY+COUNT shape: HAVING inside the subquery, aggregate
    without GROUP BY, ORDER/LIMIT on the aggregated inner SELECT, and an
    aggregating subquery as a UNION arm."""
    from rdfproject_msc_spark import registry as R
    from rdfproject_msc_spark.sources.derived import (
        P_BY_USER,
        P_PLACED_BY,
    )
    from tests.oracle import assert_matches_oracle

    store = R._store(spark, sf_dir, layout="sign_split")
    d = R._dict(spark, sf_dir)
    cases = [
        (
            """SELECT ?c ?cnt WHERE {
  { SELECT ?c (COUNT(?o) AS ?cnt) WHERE { ?o :placedBy ?c }
    GROUP BY ?c HAVING (COUNT(?o) > 12) } }""",
            f"""{R.TRIPLES_CTE}
SELECT o AS c, count(s) AS cnt FROM triples WHERE p = {P_PLACED_BY}
GROUP BY o HAVING count(s) > 12""",
        ),
        (
            """SELECT ?total WHERE {
  { SELECT (COUNT(?o) AS ?total) WHERE { ?o :placedBy ?c } } }""",
            f"""{R.TRIPLES_CTE}
SELECT count(s) AS total FROM triples WHERE p = {P_PLACED_BY}""",
        ),
        (
            """SELECT ?c ?cnt WHERE {
  {{ SELECT ?c (COUNT(?o) AS ?cnt) WHERE {{ ?o :placedBy ?c }} GROUP BY ?c }}
  UNION
  {{ SELECT ?c (COUNT(?e) AS ?cnt) WHERE {{ ?e :byUser ?c }} GROUP BY ?c }}
}""".replace("{{", "{").replace("}}", "}"),
            f"""{R.TRIPLES_CTE}
SELECT o AS c, count(s) AS cnt FROM triples WHERE p = {P_PLACED_BY} GROUP BY o
UNION ALL
SELECT o AS c, count(s) AS cnt FROM triples WHERE p = {P_BY_USER} GROUP BY o""",
        ),
    ]
    for q, sql in cases:
        assert_matches_oracle(sparql_to_df(store, q, d), sql, sf_dir)


def test_aggregating_subquery_order_limit(spark, sf_dir):
    """ORDER BY an aggregate alias + LIMIT inside the subquery: the top-5
    customers by order count, deterministic via the ?c tiebreak."""
    from rdfproject_msc_spark import registry as R
    from rdfproject_msc_spark.sources.derived import P_PLACED_BY
    from tests.oracle import assert_matches_oracle

    store = R._store(spark, sf_dir, layout="sign_split")
    q = """SELECT ?c ?cnt WHERE {
  { SELECT ?c (COUNT(?o) AS ?cnt) WHERE { ?o :placedBy ?c }
    GROUP BY ?c ORDER BY DESC(?cnt) ?c LIMIT 5 } }"""
    sql = f"""{R.TRIPLES_CTE}
SELECT o AS c, count(s) AS cnt FROM triples WHERE p = {P_PLACED_BY}
GROUP BY o ORDER BY cnt DESC, c LIMIT 5"""
    assert_matches_oracle(
        sparql_to_df(store, q, R._dict(spark, sf_dir)), sql, sf_dir
    )
