"""SPARQL parser/planner unit tests, including the round-2 ADVICE bugs:
dotted IRIs surviving tokenization and repeated variables within a pattern."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.dictionary import Dictionary
from rdfproject_msc_spark.sparql.parser import (
    SparqlSyntaxError,
    parse_sparql,
)
from rdfproject_msc_spark.sparql.planner import sparql_to_df
from rdfproject_msc_spark.store import TripleStore


def test_parse_iri_with_dots():
    q = "SELECT ?x WHERE { <http://example.org/ont/node_1> <http://example.org/p> ?x . }"
    bgp = parse_sparql(q)
    assert len(bgp.patterns) == 1
    assert bgp.patterns[0].s == ("term", ":node_1")
    assert bgp.patterns[0].p == ("term", ":p")


def test_parse_term_with_interior_dots():
    # the reference's AIS vocabulary: :node_<mmsi>_<epoch>_<lon>_<lat>
    q = "SELECT ?p WHERE { :node_376609000_1451606409000_-9.15947_38.70289 ?p ?o . }"
    bgp = parse_sparql(q)
    assert bgp.patterns[0].s == (
        "term",
        ":node_376609000_1451606409000_-9.15947_38.70289",
    )


def test_parse_glued_terminator_and_multi_patterns():
    q = "SELECT ?a ?c WHERE { ?a :p1 ?b. ?b :p2 ?c }"
    bgp = parse_sparql(q)
    assert len(bgp.patterns) == 2
    assert bgp.patterns[0].o == ("var", "b")
    assert bgp.patterns[1].s == ("var", "b")


def test_parse_quoted_literal_with_dot():
    q = 'SELECT ?x WHERE { ?x :label "v. 2.0" . }'
    bgp = parse_sparql(q)
    assert bgp.patterns[0].o == ("term", "v. 2.0")


def test_parse_rejects_unsupported():
    # GRAPH parses since the named-graph quad model landed (§13.3, see
    # test_sparql_graph.py); SERVICE still rejects — no federation
    bgp = parse_sparql("SELECT ?x ?y WHERE { GRAPH <g> { ?x :p ?y } }")
    gslot, sub = bgp.where.graphs[0]
    assert gslot == ("term", ":g")
    assert sub.patterns[0].p == ("term", ":p")
    with pytest.raises(SparqlSyntaxError):
        parse_sparql("SELECT ?x WHERE { SERVICE <s> { ?x :p ?y } }")


def test_parse_prefix_expansion():
    q = (
        "PREFIX ex: <http://example.org/vocab/> "
        "SELECT ?x WHERE { ex:order_1 ex:placedBy ?x . }"
    )
    bgp = parse_sparql(q)
    assert bgp.patterns[0].s == ("term", ":order_1")
    assert bgp.patterns[0].p == ("term", ":placedBy")


def test_parse_undeclared_prefix_stays_verbatim():
    bgp = parse_sparql("SELECT ?x WHERE { :order_1 :placedBy ?x . }")
    assert bgp.patterns[0].s == ("term", ":order_1")


def test_parse_optional_group():
    bgp = parse_sparql(
        "SELECT ?x ?z WHERE { ?x :p ?y . OPTIONAL { ?y :q ?z . } }"
    )
    assert len(bgp.patterns) == 1
    assert len(bgp.optionals) == 1
    assert bgp.optionals[0][0].s == ("var", "y")


def test_parse_nested_optional():
    # OPTIONAL inside OPTIONAL parses as a recursive group tree
    bgp = parse_sparql(
        "SELECT ?x WHERE { ?x :p ?y . OPTIONAL { ?y :q ?z . OPTIONAL { ?z :r ?w } } }"
    )
    outer = bgp.optionals[0]
    assert outer[0].p == ("term", ":q")
    inner = outer.optionals[0]
    assert inner[0].p == ("term", ":r")
    assert inner[0].o == ("var", "w")


def test_parse_rejects_disconnected_optional():
    with pytest.raises(SparqlSyntaxError, match="shares no variable"):
        parse_sparql("SELECT ?x WHERE { ?x :p ?y . OPTIONAL { ?a :q ?b } }")


def test_optional_executes(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1; p20 edges 2→3 only ⇒ ?o=2 extends, rest null
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?z WHERE { ?s :p10 ?o . OPTIONAL { ?o :p20 ?z . } }",
        tiny_dict,
    )
    rows = sorted((r.s, r.o, r.z) for r in df.collect())
    assert rows == [(-5, 1, None), (1, 1, None), (1, 2, 3), (2, 2, 3)]


def test_order_by_non_projected_var(tiny_store, tiny_dict):
    """ORDER BY on a variable outside the projection is legal SPARQL (ADVICE:
    previously failed with AnalysisException post-projection)."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s WHERE { ?s :p10 ?o . } ORDER BY DESC(?o) ?s LIMIT 2",
        tiny_dict,
    )
    assert [r.s for r in df.collect()] == [1, 2]


def test_order_by_non_projected_with_distinct_rejected(tiny_store, tiny_dict):
    with pytest.raises(SparqlSyntaxError, match="DISTINCT"):
        sparql_to_df(
            tiny_store,
            "SELECT DISTINCT ?s WHERE { ?s :p10 ?o . } ORDER BY ?o",
            tiny_dict,
        )


def test_parse_union_arms():
    bgp = parse_sparql(
        "SELECT ?s ?o WHERE { { ?s :p10 ?o } UNION { ?s :p20 ?o } UNION { ?s :p30 ?o } }"
    )
    assert len(bgp.unions) == 1 and len(bgp.unions[0]) == 3
    assert not bgp.patterns


def test_parse_two_union_blocks():
    bgp = parse_sparql(
        "SELECT ?a WHERE { { ?a :p ?b } UNION { ?a :q ?b } . "
        "{ ?a :r ?c } UNION { ?a :s ?c } }"
    )
    assert len(bgp.unions) == 2
    assert [len(blk) for blk in bgp.unions] == [2, 2]


def test_two_union_blocks_execute(tiny_store, tiny_dict):
    """Blocks compose by join (SPARQL algebra: Join(Union(..), Union(..))):
    the second block joins per-arm on ?a bound by the first."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b ?c WHERE { { ?a :p10 ?b } UNION { ?a :p20 ?b } . "
        "{ ?a :p10 ?c } UNION { ?a :p20 ?c } }",
        tiny_dict,
    )
    rows = sorted((r.a, r.b, r.c) for r in df.collect())
    # block1 rows: p10 (1,1),(1,2),(2,2),(-5,1) ∪ p20 (2,3); block2 joins
    # each by ?a through p10 edges then p20 edges
    assert rows == [
        (-5, 1, 1),
        (1, 1, 1), (1, 1, 2), (1, 2, 1), (1, 2, 2),
        (2, 2, 2), (2, 2, 3), (2, 3, 2), (2, 3, 3),
    ]


def test_union_block_keyed_on_partially_bound_var_compat_joins(
    tiny_store, tiny_dict
):
    """A later block sharing a variable some earlier arm left unbound
    joins by §18.2.1 compatibility: the unbound-?x solutions match EVERY
    arm row (binding ?x from it), the bound ones only equal ?x.
    Hand-derived: Ω1 = {(s=1,x⊥),(s=2,x⊥),(s=2,x=3)}; block-2 arm rows
    (x,y) = p10{(1,1),(1,2),(2,2),(-5,1)} ∪ p20{(2,3)}; x=3 matches none."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?x ?y WHERE { { ?s :p10 2 } UNION { ?s :p20 ?x } . "
        "{ ?x :p10 ?y } UNION { ?x :p20 ?y } }",
        tiny_dict,
    )
    got = sorted((r["s"], r["x"], r["y"]) for r in df.collect())
    want = sorted(
        [(s, x, y) for s in (1, 2) for x, y in
         [(1, 1), (1, 2), (2, 2), (-5, 1), (2, 3)]]
    )
    assert got == want


def test_parse_plain_subgroup():
    # a bare nested group joins in (§18.2.2.2 Join)
    bgp = parse_sparql("SELECT ?a WHERE { { ?a :p ?b } }")
    assert not bgp.patterns
    sub = bgp.where.subgroups[0]
    assert sub[0].s == ("var", "a") and sub[0].p == ("term", ":p")


def test_union_executes(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1; p20 edges 2→3: UNION ALL keeps all 5
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { { ?s :p10 ?o } UNION { ?s :p20 ?o } }",
        tiny_dict,
    )
    rows = sorted((r.s, r.o) for r in df.collect())
    assert rows == [(-5, 1), (1, 1), (1, 2), (2, 2), (2, 3)]


def test_union_null_extends_unshared_vars(tiny_store, tiny_dict):
    # ?x only bound by the second arm → null in rows from the first
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?x WHERE { { ?s :p10 2 } UNION { ?s :p20 ?x } }",
        tiny_dict,
    )
    rows = sorted(
        ((r.s, r.x) for r in df.collect()),
        key=lambda t: (t[0], t[1] is None, t[1] or 0),
    )
    assert rows == [(1, None), (2, 3), (2, None)]


def test_union_joins_with_required_pattern(tiny_store, tiny_dict):
    # required ?a :p10 ?b joined with union over ?b: arm1 ?b :p20 ?c (b=2
    # → c=3), arm2 ?b :p10 ?c (b∈{1,2} → c from self-loops/edges)
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b ?c WHERE { ?a :p10 ?b . { ?b :p20 ?c } UNION { ?b :p10 ?c } }",
        tiny_dict,
    )
    rows = sorted((r.a, r.b, r.c) for r in df.collect())
    # p10 edges from 1: (1,1),(1,2); from 2: (2,2); from -5: (-5,1)
    # b=1 → arm2 gives c∈{1,2}; b=2 → arm1 c=3, arm2 c=2
    assert rows == [
        (-5, 1, 1), (-5, 1, 2),
        (1, 1, 1), (1, 1, 2),
        (1, 2, 2), (1, 2, 3),
        (2, 2, 2), (2, 2, 3),
    ]


def test_parse_filter_forms():
    bgp = parse_sparql(
        "SELECT ?x WHERE { ?x :p ?y . FILTER(?y > 3) FILTER(?x != ?y) }"
    )
    assert bgp.filters == (("y", ">", ("num", 3)), ("x", "!=", ("var", "y")))


def test_parse_rich_filter_accessors():
    """Term-kind accessors (r6): LANG/DATATYPE comparisons and the
    type-checking predicates parse to dedicated leaves; casts stay out."""
    bgp = parse_sparql(
        'SELECT ?x WHERE { ?x :p ?y . FILTER(LANG(?y) = "EN") }'
    )
    assert bgp.filters == (("termfn", "lang", "y", "en", False),)
    bgp = parse_sparql(
        "SELECT ?x WHERE { ?x :p ?y . FILTER(DATATYPE(?y) != xsd:long) }"
    )
    # xsd integer datatypes collapse to :integer (the typed-int model)
    assert bgp.filters == (("termfn", "datatype", "y", ":integer", True),)
    bgp = parse_sparql(
        "SELECT ?x WHERE { ?x :p ?y . FILTER(isIRI(?y) || isBlank(?y)) }"
    )
    assert bgp.filters == (
        ("or", ("termis", "iri", "y"), ("termis", "blank", "y")),
    )
    bgp = parse_sparql(
        'SELECT ?x WHERE { ?x :p ?y . FILTER(LANGMATCHES(LANG(?y), "*")) }'
    )
    assert bgp.filters == (("langmatches", "y", "*"),)
    # explicit casts parse to the castcmp leaf since r7
    bgp = parse_sparql(
        "SELECT ?x WHERE { ?x :p ?y . FILTER(xsd:integer(?y) > 2) }"
    )
    assert bgp.filters == (("castcmp", "integer", "y", ">", "num", 2.0),)
    # family mismatches still reject
    with pytest.raises(SparqlSyntaxError, match="non-date"):
        parse_sparql(
            "SELECT ?x WHERE { ?x :p ?y . FILTER(xsd:date(?y) > 2) }"
        )


def test_parse_filter_arithmetic_comparisons():
    bgp = parse_sparql(
        "SELECT ?x WHERE { ?x :p ?y . FILTER(?y + 1 > 2 * ?x) }"
    )
    assert bgp.filters == (
        (
            "cmp",
            ("+", ("var", "y"), ("num", 1)),
            ">",
            ("*", ("num", 2), ("var", "x")),
        ),
    )
    # simple comparisons keep the legacy leaf shape
    bgp = parse_sparql("SELECT ?x WHERE { ?x :p ?y . FILTER(?y > 2) }")
    assert bgp.filters == (("y", ">", ("num", 2)),)


def test_filter_arithmetic_executes(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1: keep rows where ?o - ?s > 0
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?o - ?s > 0) }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(-5, 1), (1, 2)]
    # composes with connectives and the BIND grammar's precedence
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . "
        "FILTER(?s * ?o >= 1 && !(?o + ?s > 3)) }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 1), (1, 2)]


def test_parse_string_filter_functions():
    bgp = parse_sparql(
        'SELECT ?x WHERE { ?x :p ?y . '
        'FILTER(REGEX(STR(?y), "^:n", "i") && !CONTAINS(?y, "2")) }'
    )
    assert bgp.filters == (
        (
            "and",
            ("strfn", "regex", "y", "^:n", "i"),
            ("not", ("strfn", "contains", "y", "2", "")),
        ),
    )


def test_parse_rejects_bad_string_filters():
    # non-literal pattern
    with pytest.raises(SparqlSyntaxError, match="pattern"):
        parse_sparql("SELECT ?x WHERE { ?x :p ?y . FILTER(REGEX(?y, ?x)) }")
    # flags on a non-REGEX function
    with pytest.raises(SparqlSyntaxError, match="flags"):
        parse_sparql(
            'SELECT ?x WHERE { ?x :p ?y . FILTER(CONTAINS(?y, "a", "i")) }'
        )
    # string functions in HAVING apply to GROUP KEYS (r6); an aggregate
    # alias has no dictionary term and still rejects
    parse_sparql(
        "SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x :p ?y . } "
        'GROUP BY ?x HAVING(REGEX(STR(?x), "a"))'
    )
    with pytest.raises(SparqlSyntaxError, match="GROUP BY keys"):
        parse_sparql(
            "SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x :p ?y . } "
            'GROUP BY ?x HAVING(REGEX(STR(?n), "a"))'
        )
    # unknown variable inside a string function
    with pytest.raises(SparqlSyntaxError, match="FILTER variable"):
        parse_sparql('SELECT ?x WHERE { ?x :p ?y . FILTER(REGEX(?zz, "a")) }')


def test_string_filter_executes(tiny_store, tiny_dict):
    # terms: 1=:n1 2=:n2 3=:n3 -5=:neg5; p10 objects are 1,2,2,1
    df = sparql_to_df(
        tiny_store,
        'SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(STRENDS(STR(?o), "2")) }',
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2), (2, 2)]
    # composable with comparisons and negation under 3VL
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . "
        'FILTER(!CONTAINS(STR(?s), "neg") && (?o >= 2 || REGEX(?s, "N1$", "i"))) }',
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 1), (1, 2), (2, 2)]
    # term column is attached for filtering but never projected
    assert df.columns == ["s", "o"]


def test_string_filter_on_subject_variable(tiny_store, tiny_dict):
    # STRSTARTS over the subject side; -5 decodes to :neg5
    df = sparql_to_df(
        tiny_store,
        'SELECT ?s WHERE { ?s :p10 ?o . FILTER(STRSTARTS(STR(?s), ":neg")) }',
        tiny_dict,
    )
    assert [r.s for r in df.collect()] == [-5]


def test_parse_rejects_filter_unknown_var():
    with pytest.raises(SparqlSyntaxError, match="FILTER variable"):
        parse_sparql("SELECT ?x WHERE { ?x :p ?y . FILTER(?zz > 1) }")


def test_filter_executes(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1; keep o ≥ 2 then s != o
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?o >= 2) FILTER(?s != ?o) }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2)]


def test_parse_rejects_bad_arity():
    with pytest.raises(SparqlSyntaxError):
        parse_sparql("SELECT ?x WHERE { ?x :p . }")


@pytest.fixture(scope="module")
def tiny_store(spark):
    rows = [
        (1, 10, 1),  # self-loop: s == o
        (1, 10, 2),
        (2, 10, 2),  # self-loop
        (2, 20, 3),
        (-5, 10, 1),
    ]
    df = spark.createDataFrame(rows, "s long, p long, o long")
    return TripleStore(df)


@pytest.fixture(scope="module")
def tiny_dict(spark):
    rows = [(10, ":p10"), (20, ":p20"), (1, ":n1"), (2, ":n2"), (3, ":n3"), (-5, ":neg5")]
    return Dictionary(spark.createDataFrame(rows, "id long, term string"))


def test_repeated_variable_in_one_pattern(tiny_store, tiny_dict):
    """?x :p10 ?x must keep only rows with s == o (ADVICE: this raised
    AnalysisException before round 2 — the filter referenced the v_x alias
    before it existed)."""
    df = sparql_to_df(tiny_store, "SELECT ?x WHERE { ?x :p10 ?x . }", tiny_dict)
    assert sorted(r.x for r in df.collect()) == [1, 2]


def test_multi_pattern_join(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1; p20 edges 2→3 ⇒ join on ?b=2
    df = sparql_to_df(
        tiny_store, "SELECT ?a ?c WHERE { ?a :p10 ?b . ?b :p20 ?c . }", tiny_dict
    )
    assert sorted((r.a, r.c) for r in df.collect()) == [(1, 3), (2, 3)]


def test_parse_solution_modifiers():
    bgp = parse_sparql(
        "SELECT DISTINCT ?a ?b WHERE { ?a :p ?b . } ORDER BY DESC(?b) ?a LIMIT 7"
    )
    assert bgp.distinct is True
    assert bgp.order_by == (("b", True), ("a", False))
    assert bgp.limit == 7


def test_parse_rejects_unknown_modifier():
    with pytest.raises(SparqlSyntaxError, match="unsupported solution"):
        parse_sparql("SELECT ?a WHERE { ?a :p ?b . } BINDINGS ?a 1")


def test_parse_offset():
    bgp = parse_sparql(
        "SELECT ?a WHERE { ?a :p ?b . } ORDER BY ?a LIMIT 3 OFFSET 2"
    )
    assert bgp.offset == 2 and bgp.limit == 3


def test_offset_executes(tiny_store, tiny_dict):
    # p10 subjects sorted: -5, 1, 1, 2 → OFFSET 1 LIMIT 2 = [1, 1]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s WHERE { ?s :p10 ?o . } ORDER BY ?s LIMIT 2 OFFSET 1",
        tiny_dict,
    )
    assert [r.s for r in df.collect()] == [1, 1]


def test_parse_minus_group():
    bgp = parse_sparql("SELECT ?x WHERE { ?x :p ?y . MINUS { ?x :q ?y } }")
    assert len(bgp.minuses) == 1
    assert bgp.minuses[0][0].p == ("term", ":q")


def test_parse_rejects_disjoint_minus():
    with pytest.raises(SparqlSyntaxError, match="MINUS group shares no"):
        parse_sparql("SELECT ?x WHERE { ?x :p ?y . MINUS { ?a :q ?b } }")


def test_minus_executes(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1; MINUS subjects with a p20 edge (only 2)
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . MINUS { ?s :p20 ?z } }",
        tiny_dict,
    )
    rows = sorted((r.s, r.o) for r in df.collect())
    assert rows == [(-5, 1), (1, 1), (1, 2)]


def test_minus_on_two_shared_vars(tiny_store, tiny_dict):
    # remove exact (s,o) pairs that are ALSO p20 edges: p20 has 2→3 only;
    # no p10 edge equals (2,3), so nothing is removed
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . MINUS { ?s :p20 ?o } }",
        tiny_dict,
    )
    assert df.count() == 4


def test_parse_rejects_order_by_unknown_var():
    with pytest.raises(SparqlSyntaxError, match="ORDER BY"):
        parse_sparql("SELECT ?a WHERE { ?a :p ?b . } ORDER BY ?zzz")


def test_modifiers_execute(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT DISTINCT ?o WHERE { ?x :p10 ?o . } ORDER BY DESC(?o) LIMIT 2",
        tiny_dict,
    )
    assert [r.o for r in df.collect()] == [2, 1]


def test_decode_roundtrip(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store, "SELECT ?x WHERE { ?x :p20 ?y . }", tiny_dict, decode=True
    )
    assert [r.x for r in df.collect()] == [":n2"]


def test_parse_filter_exists():
    bgp = parse_sparql(
        "SELECT ?x WHERE { ?x :p ?y . FILTER EXISTS { ?y :q ?z } "
        "FILTER NOT EXISTS { ?x :r ?w } }"
    )
    assert len(bgp.exists) == 2
    assert bgp.exists[0][0] is False and bgp.exists[1][0] is True
    assert not bgp.filters  # the paren-FILTER extractor must not fire


def test_parse_rejects_disjoint_exists():
    with pytest.raises(SparqlSyntaxError, match="EXISTS group shares no"):
        parse_sparql("SELECT ?x WHERE { ?x :p ?y . FILTER EXISTS { ?a :q ?b } }")


def test_filter_exists_executes(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1; keep subjects whose object has a p20 edge
    # (p20: 2→3) → rows with o=2
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER EXISTS { ?o :p20 ?z } }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2), (2, 2)]


def test_filter_not_exists_executes(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER NOT EXISTS { ?o :p20 ?z } }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(-5, 1), (1, 1)]


def test_exists_never_duplicates_rows(tiny_store, tiny_dict):
    """Semi-join semantics: a multi-match EXISTS group must not multiply
    left rows (the difference between semi join and inner join)."""
    # ?o :p10 ?z matches twice for o=1 (1→1, 1→2); rows with o=1 must
    # still appear exactly once each
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER EXISTS { ?o :p10 ?z } }",
        tiny_dict,
    )
    rows = sorted((r.s, r.o) for r in df.collect())
    assert rows == [(-5, 1), (1, 1), (1, 2), (2, 2)]


def test_parse_values_block():
    bgp = parse_sparql(
        "SELECT ?s WHERE { ?s :p10 ?o . VALUES ?o { 1 2 :n3 } }"
    )
    assert bgp.values == (("o", (("id", 1), ("id", 2), ("term", ":n3"))),)


def test_parse_rejects_values_unknown_var():
    with pytest.raises(SparqlSyntaxError, match="VALUES variable"):
        parse_sparql("SELECT ?s WHERE { ?s :p10 ?o . VALUES ?zz { 1 } }")


def test_parse_multi_var_values():
    bgp = parse_sparql(
        "SELECT ?s WHERE { ?s :p10 ?o . VALUES (?s ?o) { (1 2) } }"
    )
    assert bgp.values_multi == ((("s", "o"), ((("id", 1), ("id", 2)),)),)


def test_values_executes(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1; VALUES ?o { 2 } keeps o=2 rows
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . VALUES ?o { 2 } }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2), (2, 2)]


def test_values_with_terms_executes(tiny_store, tiny_dict):
    # terms resolve through the dictionary: :n1=1, :n3=3 → o ∈ {1, 3}
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . VALUES ?o { :n1 :n3 } }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(-5, 1), (1, 1)]


def test_union_arm_not_binding_shared_var_keeps_rows(tiny_store, tiny_dict):
    """SPARQL compatible-binding join: an arm that does not bind a variable
    shared between the union block and the required patterns is compatible
    with EVERY required solution (unbound matches anything). The planner
    joins each arm separately on the variables that arm binds, so arm-2
    rows (which bind ?d/?c but not ?b) survive — a pre-unioned null-extended
    stack would drop them all via NULL==?b."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b ?c ?d WHERE "
        "{ ?a :p10 ?b . { ?b :p20 ?c } UNION { ?d :p20 ?c } }",
        tiny_dict,
    )
    rows = sorted(
        ((r.a, r.b, r.c, r.d) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    # required p10 edges: (1,1),(1,2),(2,2),(-5,1); p20 edge: 2→3
    # arm1 binds b=2,c=3 → joins the two b=2 rows; arm2 binds d=2,c=3 and
    # shares nothing → compatible with all 4 required rows
    assert rows == [
        (-5, 1, 3, 2),
        (1, 1, 3, 2),
        (1, 2, 3, 2),
        (1, 2, 3, None),
        (2, 2, 3, 2),
        (2, 2, 3, None),
    ]


def _null_sorted(df, *cols):
    key = lambda t: tuple((v is None, v or 0) for v in t)
    return sorted(
        (tuple(getattr(r, c) for c in cols) for r in df.collect()), key=key
    )


def test_optional_keyed_on_prior_optional_var_compat(tiny_store, tiny_dict):
    """A second OPTIONAL keyed on a var the first left nullable takes the
    §18.2.1 compatible LeftJoin: unbound ?x matches any group row (and
    binds from it); bound ?x must agree or the row null-extends.
    Hand-derived: Ω1 = {(1,1,⊥),(1,2,3),(2,2,3),(-5,1,⊥)}; group rows
    (s,x) = p10 edges; x=3 matches nothing → those rows pass unchanged."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?x WHERE { ?s :p10 ?o . "
        "OPTIONAL { ?o :p20 ?x } OPTIONAL { ?s :p10 ?x } }",
        tiny_dict,
    )
    assert _null_sorted(df, "s", "o", "x") == sorted(
        [(-5, 1, 1), (1, 1, 1), (1, 1, 2), (1, 2, 3), (2, 2, 3)]
    )


def test_minus_keyed_on_optional_var_compat(tiny_store, tiny_dict):
    """MINUS over a nullable key (§18.5): unbound ?x is compatible with
    anything (row removed via the ?s overlap); bound ?x must ALSO match
    for removal. (1,2,3)/(2,2,3) survive — no p10 edge has x=3."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?x WHERE { ?s :p10 ?o . "
        "OPTIONAL { ?o :p20 ?x } MINUS { ?s :p10 ?x } }",
        tiny_dict,
    )
    assert _null_sorted(df, "s", "o", "x") == [(1, 2, 3), (2, 2, 3)]


def test_exists_keyed_on_optional_var_compat(tiny_store, tiny_dict):
    """EXISTS over a nullable key: rows with unbound ?x pass iff ANY
    compatible group row exists; bound ?x needs an exact match (none has
    x=3) — exactly the complement of the MINUS test's survivors."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?x WHERE { ?s :p10 ?o . "
        "OPTIONAL { ?o :p20 ?x } FILTER EXISTS { ?s :p10 ?x } }",
        tiny_dict,
    )
    assert _null_sorted(df, "s", "o", "x") == [(-5, 1, None), (1, 1, None)]


def test_values_on_partially_bound_union_var_compat(tiny_store, tiny_dict):
    """VALUES over a nullable var joins by §18.2.1 compatibility: bound
    rows filter, unbound rows replicate once per value and BIND it —
    (2,⊥) and the already-bound (2,3) both yield (2,3), a genuine
    multiset duplicate."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?x WHERE "
        "{ { ?s :p10 2 } UNION { ?s :p20 ?x } VALUES ?x { 3 } }",
        tiny_dict,
    )
    assert _null_sorted(df, "s", "x") == [(1, 3), (2, 3), (2, 3)]


def test_union_var_shared_with_required_not_nullable(tiny_store, tiny_dict):
    """?b is bound by the required pattern, so even though only one arm
    binds it, it stays a valid (never-null) join key for later clauses."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b WHERE { ?a :p10 ?b . { ?b :p20 ?c } UNION { ?d :p20 ?c } "
        "FILTER EXISTS { ?b :p20 ?c2 } }",
        tiny_dict,
    )
    rows = sorted((r.a, r.b) for r in df.collect())
    # EXISTS keeps rows whose ?b has an outgoing :p20 edge (b=2 only)
    assert rows == [(1, 2), (1, 2), (2, 2), (2, 2)]


def test_parse_filter_connectives():
    bgp = parse_sparql(
        "SELECT ?x WHERE { ?x :p ?y . FILTER(?y > 3 && (?x != ?y || !(?x < 0))) }"
    )
    assert bgp.filters == (
        (
            "and",
            ("y", ">", ("num", 3)),
            ("or", ("x", "!=", ("var", "y")), ("not", ("x", "<", ("num", 0)))),
        ),
    )


def test_parse_rejects_malformed_connective():
    with pytest.raises(SparqlSyntaxError, match="FILTER"):
        parse_sparql("SELECT ?x WHERE { ?x :p ?y . FILTER(?y > 3 &&) }")
    with pytest.raises(SparqlSyntaxError, match="FILTER"):
        parse_sparql("SELECT ?x WHERE { ?x :p ?y . FILTER((?y > 3) }")


def test_filter_connectives_execute(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?s = ?o || ?s < 0) }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(-5, 1), (1, 1), (2, 2)]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(!(?s = ?o) && ?s > 0) }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2)]


def test_parse_optional_scoped_filter():
    bgp = parse_sparql(
        "SELECT ?s WHERE { ?s :p ?o . OPTIONAL { ?o :q ?x . FILTER(?x > 1) } }"
    )
    assert bgp.optional_filters == ((("x", ">", ("num", 1)),),)


def test_optional_scoped_filter_null_extends(tiny_store, tiny_dict):
    """SPARQL LeftJoin(P1, P2, F): a group match failing the group FILTER
    keeps the left row null-extended — it must NOT drop the row (that
    would be post-join filtering, the classic OPTIONAL-FILTER mistake)."""
    # p10 edges 1→1, 1→2, 2→2, -5→1; p20 edge 2→3
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?x WHERE { ?s :p10 ?o . "
        "OPTIONAL { ?o :p20 ?x . FILTER(?x > 3) } }",
        tiny_dict,
    )
    rows = sorted(((r.s, r.o, r.x) for r in df.collect()))
    # o=2 has a p20 match (x=3) but 3 > 3 fails → null-extended, kept
    assert rows == [(-5, 1, None), (1, 1, None), (1, 2, None), (2, 2, None)]
    # with a passing threshold the binding comes through
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?x WHERE { ?s :p10 ?o . "
        "OPTIONAL { ?o :p20 ?x . FILTER(?x >= 3) } }",
        tiny_dict,
    )
    rows = sorted(((r.s, r.o, r.x) for r in df.collect()))
    assert rows == [(-5, 1, None), (1, 1, None), (1, 2, 3), (2, 2, 3)]


def test_optional_filter_referencing_outer_var(tiny_store, tiny_dict):
    """The LeftJoin condition may compare group vars with OUTER (required)
    vars — SPARQL evaluates F over the merged solution."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?x WHERE { ?s :p10 ?o . "
        "OPTIONAL { ?o :p20 ?x . FILTER(?x != ?s) } }",
        tiny_dict,
    )
    rows = sorted(((r.s, r.o, r.x) for r in df.collect()))
    assert rows == [(-5, 1, None), (1, 1, None), (1, 2, 3), (2, 2, 3)]


def test_optional_filter_rejects_foreign_group_var():
    with pytest.raises(SparqlSyntaxError, match="OPTIONAL FILTER variable"):
        parse_sparql(
            "SELECT ?s WHERE { ?s :p ?o . OPTIONAL { ?o :q ?x } "
            "OPTIONAL { ?o :r ?y . FILTER(?y > ?x) } }"
        )


def test_parse_aggregates():
    bgp = parse_sparql(
        "SELECT ?c (COUNT(?e) AS ?n) (SUM(DISTINCT ?e) AS ?t) "
        "WHERE { ?e :typ ?c } GROUP BY ?c ORDER BY DESC(?n) LIMIT 3"
    )
    assert bgp.projection == ("c", "n", "t")
    assert bgp.group_by == ("c",)
    assert bgp.aggregates == (
        ("count", "e", False, "n", None),
        ("sum", "e", True, "t", None),
    )
    assert bgp.order_by == (("n", True),)


def test_parse_sample_and_group_concat():
    bgp = parse_sparql(
        "SELECT ?c (SAMPLE(?e) AS ?any) "
        '(GROUP_CONCAT(DISTINCT ?e; SEPARATOR="|") AS ?all) '
        "WHERE { ?e :typ ?c } GROUP BY ?c"
    )
    assert bgp.aggregates == (
        ("sample", "e", False, "any", None),
        ("group_concat", "e", True, "all", "|"),
    )
    # default separator is a single space (§11)
    bgp = parse_sparql(
        "SELECT ?c (GROUP_CONCAT(?e) AS ?all) WHERE { ?e :typ ?c } GROUP BY ?c"
    )
    assert bgp.aggregates == (("group_concat", "e", False, "all", " "),)
    with pytest.raises(SparqlSyntaxError, match="SEPARATOR"):
        parse_sparql(
            'SELECT ?c (SUM(?e; SEPARATOR=",") AS ?t) '
            "WHERE { ?e :typ ?c } GROUP BY ?c"
        )


def test_sample_and_group_concat_execute(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1 grouped by object:
    #   o=1 ← {1, -5},  o=2 ← {1, 2}
    df = sparql_to_df(
        tiny_store,
        "SELECT ?o (SAMPLE(?s) AS ?any) "
        '(GROUP_CONCAT(?s; SEPARATOR=",") AS ?subs) '
        "WHERE { ?s :p10 ?o } GROUP BY ?o",
        tiny_dict,
    )
    got = {r.o: (r.any, r.subs) for r in df.collect()}
    assert got == {1: (-5, "-5,1"), 2: (1, "1,2")}


def test_parse_aggregate_rejections():
    with pytest.raises(SparqlSyntaxError, match="GROUP BY keys or aggregates"):
        parse_sparql("SELECT ?e (COUNT(?e) AS ?n) WHERE { ?e :p ?c } GROUP BY ?c")
    with pytest.raises(SparqlSyntaxError, match="SELECT \\*"):
        parse_sparql("SELECT * WHERE { ?e :p ?c } GROUP BY ?c")
    with pytest.raises(SparqlSyntaxError, match="not supported"):
        parse_sparql("SELECT (SUM(*) AS ?n) WHERE { ?e :p ?c }")
    with pytest.raises(SparqlSyntaxError, match="duplicate projection"):
        parse_sparql("SELECT ?c (COUNT(?e) AS ?c) WHERE { ?e :p ?c } GROUP BY ?c")
    with pytest.raises(SparqlSyntaxError, match="alias shadows"):
        parse_sparql("SELECT (COUNT(?e) AS ?c) WHERE { ?e :p ?c } GROUP BY ?c")
    with pytest.raises(SparqlSyntaxError, match="not in the grouped projection"):
        parse_sparql(
            "SELECT ?c (COUNT(?e) AS ?n) WHERE { ?e :p ?c } GROUP BY ?c ORDER BY ?e"
        )


def test_groupby_count_executes(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1 → per-subject counts: 1:2, 2:1, -5:1
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } "
        "GROUP BY ?s ORDER BY DESC(?n) ?s",
        tiny_dict,
    )
    assert df.columns == ["s", "n"]
    assert [(r.s, r.n) for r in df.collect()] == [(1, 2), (-5, 1), (2, 1)]


def test_groupby_aggregate_forms(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s (SUM(?o) AS ?t) (MIN(?o) AS ?lo) (MAX(?o) AS ?hi) "
        "(AVG(?o) AS ?m) WHERE { ?s :p10 ?o } GROUP BY ?s ORDER BY ?s",
        tiny_dict,
    )
    rows = [(r.s, r.t, r.lo, r.hi, r.m) for r in df.collect()]
    assert rows == [(-5, 1, 1, 1, 1.0), (1, 3, 1, 2, 1.5), (2, 2, 2, 2, 2.0)]


def test_implicit_group_count_star(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT (COUNT(*) AS ?n) WHERE { ?s :p10 ?o }",
        tiny_dict,
    )
    assert [r.n for r in df.collect()] == [4]


def test_count_skips_unbound_optional(tiny_store, tiny_dict):
    """COUNT(?z) ignores unbound (null-extended) solutions; COUNT(*) keeps
    them — the SPARQL §11 card[] distinction."""
    q = (
        "SELECT ?s {agg} WHERE {{ ?s :p10 ?o . OPTIONAL {{ ?o :p20 ?z }} }} "
        "GROUP BY ?s ORDER BY ?s"
    )
    counted = sparql_to_df(
        tiny_store, q.format(agg="(COUNT(?z) AS ?n)"), tiny_dict
    )
    assert [(r.s, r.n) for r in counted.collect()] == [(-5, 0), (1, 1), (2, 1)]
    starred = sparql_to_df(
        tiny_store, q.format(agg="(COUNT(*) AS ?n)"), tiny_dict
    )
    assert [(r.s, r.n) for r in starred.collect()] == [(-5, 1), (1, 2), (2, 1)]


def test_groupby_without_aggregates(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s WHERE { ?s :p10 ?o } GROUP BY ?s ORDER BY ?s",
        tiny_dict,
    )
    assert [r.s for r in df.collect()] == [-5, 1, 2]


def test_parse_sequence_path_expands_to_join_chain():
    bgp = parse_sparql("SELECT ?a ?c WHERE { ?a :p1/:p2 ?c }")
    assert len(bgp.patterns) == 2
    assert bgp.patterns[0].s == ("var", "a")
    assert bgp.patterns[0].p == ("term", ":p1")
    mid = bgp.patterns[0].o
    assert mid[0] == "var" and mid[1].startswith("__pp")
    assert bgp.patterns[1].s == mid
    assert bgp.patterns[1].p == ("term", ":p2")
    assert bgp.patterns[1].o == ("var", "c")


def test_parse_composite_paths_and_malformed():
    # closure/zero-length operators nested INSIDE sequences or alternations
    # parse into path ASTs the planner compiles to pair relations
    for ok, ast in (
        (":p1/:p2*", ("seq", [("pred", ("term", ":p1")), ("clos", ("pred", ("term", ":p2")), "*")])),
        ("(:p1|:p2)+", ("clos", ("alt", [("pred", ("term", ":p1")), ("pred", ("term", ":p2"))]), "+")),
        (":p1*/:p2", ("seq", [("clos", ("pred", ("term", ":p1")), "*"), ("pred", ("term", ":p2"))])),
        ("((:p1))", ("pred", ("term", ":p1"))),
    ):
        bgp = parse_sparql(f"SELECT ?a WHERE {{ ?a {ok} ?c }}")
        assert bgp.where.paths[0][1] == ast, ok
    # malformed arms/segments
    for bad in (":p1|", "|:p1", ":p1/^/:p2", "^"):
        with pytest.raises(SparqlSyntaxError):
            parse_sparql(f"SELECT ?a WHERE {{ ?a {bad} ?c }}")


def test_inverse_path_swaps_sides(tiny_store, tiny_dict):
    inv = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { ?b ^:p10 ?a }", tiny_dict
    )
    fwd = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { ?a :p10 ?b }", tiny_dict
    )
    assert sorted(map(tuple, inv.select("a", "b").collect())) == sorted(
        map(tuple, fwd.collect())
    )


def test_inverse_inside_sequence_path(tiny_store, tiny_dict):
    # ^:p10/:p20 — mid -p10-> x and mid -p20-> y; only mid=2 has a p20
    # edge (2→3), and 2's p10 edge is the self-loop 2→2 ⇒ (x=2, y=3)
    df = sparql_to_df(
        tiny_store, "SELECT ?x ?y WHERE { ?x ^:p10/:p20 ?y }", tiny_dict
    )
    assert sorted(map(tuple, df.collect())) == [(2, 3)]


def test_alternation_path_is_multiset_union(tiny_store, tiny_dict):
    # arm 1: p10/p20 chains → (1,3), (2,3); arm 2: the p20 edge (2,3).
    # SPARQL UNION is a multiset: (2,3) must appear TWICE.
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?b WHERE { ?a (:p10/:p20|:p20) ?b }",
        tiny_dict,
    )
    assert sorted(map(tuple, df.collect())) == [(1, 3), (2, 3), (2, 3)]
    # parenthesized and bare alternation parse identically
    bare = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { ?a :p10/:p20|:p20 ?b }", tiny_dict
    )
    assert sorted(map(tuple, bare.collect())) == [(1, 3), (2, 3), (2, 3)]


def test_alternation_path_joins_required_patterns(tiny_store, tiny_dict):
    # required: ?a :p20 ?c binds a=2, c=3; alternation arms join on ?a:
    # p10 from 2 → b=2, p20 from 2 → b=3
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?c ?b WHERE { ?a :p20 ?c . ?a (:p10|:p20) ?b }",
        tiny_dict,
    )
    assert sorted(map(tuple, df.collect())) == [(2, 3, 2), (2, 3, 3)]


def test_alternation_path_select_star_hides_internal_vars(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store, "SELECT * WHERE { ?a (:p10/:p20|:p20) ?b }", tiny_dict
    )
    assert df.columns == ["a", "b"]


def test_alternation_inside_groups_parses():
    # alternation paths lower to a UNION block INSIDE the hosting group —
    # any group can host a union now that groups recurse
    bgp = parse_sparql(
        "SELECT ?s WHERE { ?s :a ?x . OPTIONAL { ?s (:p|:q) ?y } }"
    )
    blk = bgp.optionals[0].unions[0]
    assert len(blk) == 2
    assert {arm[0].p for arm in blk} == {("term", ":p"), ("term", ":q")}
    bgp = parse_sparql("SELECT ?s WHERE { ?s :a ?x . MINUS { ?s :p|:q ?y } }")
    assert len(bgp.minuses[0].unions[0]) == 2


def test_sequence_path_matches_hand_built_two_hop(tiny_store, tiny_dict):
    """:p10/:p20 must produce exactly the rows of the explicit join chain —
    the same plan shape the engine's two_hop query builds by hand."""
    path = sparql_to_df(
        tiny_store, "SELECT ?a ?c WHERE { ?a :p10/:p20 ?c }", tiny_dict
    )
    explicit = sparql_to_df(
        tiny_store, "SELECT ?a ?c WHERE { ?a :p10 ?b . ?b :p20 ?c }", tiny_dict
    )
    assert sorted(map(tuple, path.collect())) == sorted(map(tuple, explicit.collect()))
    # p10 edges 1→1, 1→2, 2→2, -5→1; p20 edge 2→3
    assert sorted(map(tuple, path.collect())) == [(1, 3), (2, 3)]


def test_sequence_path_three_hops_and_select_star(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store, "SELECT * WHERE { ?a :p10/:p10/:p20 ?c }", tiny_dict
    )
    # SELECT * must not leak the internal path variables
    assert df.columns == ["a", "c"]
    # chains: 1→1→2→3, 1→2→2→3, 2→2→2→3, -5→1→2→3
    assert sorted(map(tuple, df.collect())) == [(-5, 3), (1, 3), (1, 3), (2, 3)]


def test_having_executes(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1 → per-subject counts: 1:2, 2:1, -5:1
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } "
        "GROUP BY ?s HAVING(?n > 1)",
        tiny_dict,
    )
    assert [(r.s, r.n) for r in df.collect()] == [(1, 2)]
    # HAVING on a non-projected group key
    df = sparql_to_df(
        tiny_store,
        "SELECT (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } "
        "GROUP BY ?s HAVING(?s < 0)",
        tiny_dict,
    )
    assert [r.n for r in df.collect()] == [1]


def test_having_rejections():
    with pytest.raises(SparqlSyntaxError, match="HAVING requires"):
        parse_sparql("SELECT ?s WHERE { ?s :p ?o } HAVING(?s > 1)")
    with pytest.raises(SparqlSyntaxError, match="HAVING variable"):
        parse_sparql(
            "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p ?o } "
            "GROUP BY ?s HAVING(?o > 1)"
        )


def test_ask_executes(tiny_store, tiny_dict):
    yes = sparql_to_df(tiny_store, "ASK { ?s :p10 2 }", tiny_dict)
    assert yes.columns == ["ask"]
    assert [r.ask for r in yes.collect()] == [True]
    no = sparql_to_df(
        tiny_store, "ASK WHERE { ?s :p20 ?o . FILTER(?o > 99) }", tiny_dict
    )
    assert [r.ask for r in no.collect()] == [False]


def test_multi_var_values_executes(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1; keep only rows matching the table
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . VALUES (?s ?o) { (1 2) (2 2) (9 9) } }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2), (2, 2)]


def test_multi_var_values_rejections():
    with pytest.raises(SparqlSyntaxError, match="row width"):
        parse_sparql("SELECT ?s WHERE { ?s :p ?o . VALUES (?s ?o) { (1) } }")
    with pytest.raises(SparqlSyntaxError, match="not in BGP"):
        parse_sparql("SELECT ?s WHERE { ?s :p ?o . VALUES (?s ?z) { (1 2) } }")


def test_multi_var_values_non_disjoint_rows_duplicate(tiny_store, tiny_dict):
    """Non-disjoint VALUES rows (r7 — historically a parse reject): a
    solution matching k rows appears k times (§18.2.2.6 multiset join),
    via the broadcast-relation JOIN lowering."""
    # p10 edges 1→1, 1→2, 2→2, -5→1; duplicate row (1 2) ×2
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . "
        "VALUES (?s ?o) { (1 2) (1 2) } }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2), (1, 2)]
    # a wildcard row SUBSUMING a specific row: (1, 2) matches both rows
    # (duplicated), the other s=1 solutions match only the wildcard
    df2 = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . "
        "VALUES (?s ?o) { (1 UNDEF) (1 2) } }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df2.collect()) == [
        (1, 1), (1, 2), (1, 2),
    ]
    # two all-UNDEF rows double EVERY solution
    df3 = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . "
        "VALUES (?s ?o) { (UNDEF UNDEF) (UNDEF UNDEF) } }",
        tiny_dict,
    )
    got = sorted((r.s, r.o) for r in df3.collect())
    assert got == sorted(
        2 * [(-5, 1), (1, 1), (1, 2), (2, 2)]
    )


def test_multi_var_values_undef_wildcard(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1: row (1 UNDEF) keeps all s=1 rows,
    # disjoint row (2 2) adds the self-loop
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . VALUES (?s ?o) { (1 UNDEF) (2 2) } }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 1), (1, 2), (2, 2)]


def test_closure_path_full_and_seeded(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1 ⇒ closure adds (-5,2); pairs are a SET
    # (§18.4 ALP: arbitrary-length paths are duplicate-free)
    full = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { ?a :p10+ ?b }", tiny_dict
    )
    assert sorted(map(tuple, full.collect())) == [
        (-5, 1), (-5, 2), (1, 1), (1, 2), (2, 2),
    ]
    seeded = sparql_to_df(
        tiny_store, "SELECT ?b WHERE { :n1 :p10+ ?b }", tiny_dict
    )
    assert sorted(r.b for r in seeded.collect()) == [1, 2]


def test_closure_path_cycle_join_and_ask(tiny_store, tiny_dict):
    cyc = sparql_to_df(tiny_store, "SELECT ?x WHERE { ?x :p10+ ?x }", tiny_dict)
    assert sorted(r.x for r in cyc.collect()) == [1, 2]
    joined = sparql_to_df(
        tiny_store,
        "SELECT ?a ?c WHERE { ?a :p10+ ?b . ?b :p20 ?c }",
        tiny_dict,
    )
    assert sorted(map(tuple, joined.collect())) == [(-5, 3), (1, 3), (2, 3)]
    yes = sparql_to_df(tiny_store, "ASK { :neg5 :p10+ :n2 }", tiny_dict)
    assert [r.ask for r in yes.collect()] == [True]
    no = sparql_to_df(tiny_store, "ASK { :n3 :p10+ ?x }", tiny_dict)
    assert [r.ask for r in no.collect()] == [False]


def test_closure_path_nested_forms_parse():
    # closures inside sequences/alternations parse as path ASTs
    for ok in (":p1/:p2+", ":p1+|:p2"):
        assert parse_sparql(f"SELECT ?a WHERE {{ ?a {ok} ?b }}").where.paths
    # closures inside groups are supported now that groups recurse
    bgp = parse_sparql("SELECT ?a WHERE { ?a :q ?b . OPTIONAL { ?a :p+ ?c } }")
    assert bgp.optionals[0].closures[0][3] == "+"
    with pytest.raises(SparqlSyntaxError, match="malformed variable"):
        parse_sparql("SELECT ?a WHERE { ?a ?p+ ?b }")


def test_closure_matches_recursive_oracle(spark, sf_dir):
    """Seeded closure over the real graph vs a DuckDB WITH RECURSIVE
    oracle — the same cross-engine strategy that pins dedup_components."""
    import duckdb

    from rdfproject_msc_spark.sources.derived import (
        P_LINKED_EVENT,
        TRIPLES_SQL,
        dictionary_df,
        triples_df,
    )
    from rdfproject_msc_spark.store import TripleStore

    store = TripleStore(triples_df(spark, sf_dir))
    d = Dictionary(dictionary_df(spark, sf_dir))
    # linkedEvent edges run customer → event (single-hop in this graph:
    # the closure machinery's multi-hop behavior is pinned on the tiny
    # store above; this pins the seeded BFS against the real pipeline)
    got = sorted(
        r.x
        for r in sparql_to_df(
            store, "SELECT ?x WHERE { :customer_3 :linkedEvent+ ?x }", d
        ).collect()
    )

    con = duckdb.connect()
    import os

    for t in ("orders", "customer", "nation", "region", "events", "lineitem",
              "supplier", "part", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    want = sorted(
        r[0]
        for r in con.execute(
            f"""WITH RECURSIVE triples AS ({TRIPLES_SQL}),
            reach(x) AS (
                SELECT o FROM triples WHERE p = {P_LINKED_EVENT} AND s = 31
                UNION
                SELECT t.o FROM reach r JOIN triples t
                ON t.p = {P_LINKED_EVENT} AND t.s = r.x
            )
            SELECT x FROM reach"""
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_expression_residue_matches_duckdb(spark):
    """r6 expression-grammar residue vs DuckDB oracles: AVG(DISTINCT),
    SELECT * subqueries (§12 visible-variable projection), and string
    functions in HAVING over a group key's dictionary term."""
    import duckdb

    from rdfproject_msc_spark.store import TripleStore

    edges = [(1, 10, 2), (1, 10, 4), (1, 10, 6), (2, 10, 4), (2, 10, 2),
             (7, 11, 1), (7, 11, 2)]
    store = TripleStore(
        spark.createDataFrame(edges, "s long, p long, o long")
    )
    d = Dictionary(
        spark.createDataFrame(
            [(1, ":alpha"), (2, ":beta"), (7, ":gamma"),
             (10, ":p10"), (11, ":p11")],
            "id long, term string",
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s BIGINT, p BIGINT, o BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", edges)
    con.execute(
        "CREATE TABLE dict (id BIGINT, term VARCHAR)"
    )
    con.executemany(
        "INSERT INTO dict VALUES (?, ?)",
        [(1, ":alpha"), (2, ":beta"), (7, ":gamma"),
         (10, ":p10"), (11, ":p11")],
    )

    got = sorted(
        (r.s, r.a)
        for r in sparql_to_df(
            store,
            "SELECT ?s (AVG(DISTINCT ?o) AS ?a) WHERE { ?s :p10 ?o } "
            "GROUP BY ?s",
            d,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT s, AVG(DISTINCT o) FROM t WHERE p = 10 GROUP BY s"
        ).fetchall()
    )
    assert got == want and len(got) == 2

    got = sorted(
        map(
            tuple,
            sparql_to_df(
                store,
                "SELECT ?s ?o WHERE { { SELECT * WHERE { ?s :p10 ?o } } "
                "?x :p11 ?s }",
                d,
            ).collect(),
        )
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT a.s, a.o FROM (SELECT * FROM t WHERE p = 10) a "
            "JOIN t b ON b.p = 11 AND b.o = a.s"
        ).fetchall()
    )
    assert got == want and len(got) > 0

    got = sorted(
        (r.s, r.n)
        for r in sparql_to_df(
            store,
            "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } GROUP BY ?s "
            'HAVING(STRSTARTS(STR(?s), ":al"))',
            d,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT t.s, COUNT(o) FROM t JOIN dict ON dict.id = t.s "
            "WHERE p = 10 GROUP BY t.s, dict.term "
            "HAVING starts_with(dict.term, ':al')"
        ).fetchall()
    )
    assert got == want == [(1, 3)]

    # aggregates over EXPRESSIONS (§11.1): arithmetic computes per row
    # before the (map-side combined) aggregation
    got = sorted(
        (r.s, r.sq, r.d)
        for r in sparql_to_df(
            store,
            "SELECT ?s (SUM(?o * ?o) AS ?sq) (AVG(?o - ?s) AS ?d) "
            "WHERE { ?s :p10 ?o } GROUP BY ?s",
            d,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT s, SUM(o * o), AVG(o - s) FROM t WHERE p = 10 GROUP BY s"
        ).fetchall()
    )
    assert got == want and len(got) == 2

    # aggregate aliases have no term: string functions over them reject
    with pytest.raises(SparqlSyntaxError, match="GROUP BY keys"):
        parse_sparql(
            "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } GROUP BY ?s "
            'HAVING(CONTAINS(STR(?n), "1"))'
        )


def test_seeded_composite_path_explores_neighborhood(spark):
    """r6 composite-path seeding, the two judge-requested pins:

    (1) `const (:p/:q*) ?x` matches a DuckDB WITH RECURSIVE oracle;
    (2) the '*' member's closure is SET-SEEDED from the join frontier
        (operators.graph.transitive_closure seed_set): the fixture holds
        a DISCONNECTED q-chain of diameter 60 — LONGER than the closure
        iteration cap (max_iter=50) — so compiling the member's FULL
        closure would raise 'not converged'; success with correct rows
        proves the probe explored only the seed's neighborhood. The
        leading-closure mirror (`(:q*/:p)`) walks the member backward
        from the p-frontier and is pinned the same way."""
    import duckdb

    from rdfproject_msc_spark.store import TripleStore

    edges = [(1, 10, 2), (5, 10, 6),          # p10
             (2, 11, 3), (3, 11, 4), (7, 11, 1)]  # p11 near the seeds
    edges += [(100 + i, 11, 101 + i) for i in range(60)]  # far q-chain
    store = TripleStore(
        spark.createDataFrame(edges, "s long, p long, o long")
    )
    d = Dictionary(
        spark.createDataFrame(
            [(10, ":p10"), (11, ":p11")], "id long, term string"
        )
    )

    got = sorted(
        r.x
        for r in sparql_to_df(
            store, "SELECT ?x WHERE { 1 (:p10/:p11*) ?x }", d
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (s BIGINT, p BIGINT, o BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", edges)
    want = sorted(
        r[0]
        for r in con.execute(
            """WITH RECURSIVE reach(x) AS (
                 SELECT o FROM t WHERE p = 10 AND s = 1
                 UNION
                 SELECT t.o FROM reach r JOIN t ON t.p = 11 AND t.s = r.x)
               SELECT x FROM reach"""
        ).fetchall()
    )
    assert got == want == [2, 3, 4]

    # leading-closure mirror: identity pairs (1,2),(5,6) plus the
    # backward-reached (7,2) — the far chain is not backward-reachable
    # from the p10 frontier either
    df = sparql_to_df(store, "SELECT ?s ?o WHERE { ?s (:p11*/:p10) ?o }", d)
    assert sorted(map(tuple, df.collect())) == [(1, 2), (5, 6), (7, 2)]


def test_construct_builds_deduped_graph(tiny_store, tiny_dict):
    # solutions (a,c): (1,3),(2,3); template emits forward + reverse edges
    df = sparql_to_df(
        tiny_store,
        "CONSTRUCT { ?a :p20 ?c . ?c :p20 ?a } WHERE { ?a :p10/:p20 ?c }",
        tiny_dict,
    )
    assert df.columns == ["s", "p", "o"]
    assert sorted(map(tuple, df.collect())) == [
        (1, 20, 3), (2, 20, 3), (3, 20, 1), (3, 20, 2),
    ]
    # set semantics: a template instantiating identical triples from
    # multiple solutions yields each triple once
    const = sparql_to_df(
        tiny_store,
        "CONSTRUCT { :n1 :p20 :n2 } WHERE { ?a :p10 ?b }",
        tiny_dict,
    )
    assert sorted(map(tuple, const.collect())) == [(1, 20, 2)]


def test_construct_feeds_a_triple_store(tiny_store, tiny_dict):
    """The constructed graph is in the engine's (s,p,o) id model — it can
    be loaded straight back into a TripleStore and queried."""
    derived = sparql_to_df(
        tiny_store,
        "CONSTRUCT { ?a :p20 ?c } WHERE { ?a :p10/:p20 ?c }",
        tiny_dict,
    )
    store2 = TripleStore(derived)
    back = sparql_to_df(store2, "SELECT ?x WHERE { ?x :p20 :n3 }", tiny_dict)
    assert sorted(r.x for r in back.collect()) == [1, 2]


def test_construct_rejections():
    with pytest.raises(SparqlSyntaxError, match="must be bound"):
        parse_sparql("CONSTRUCT { ?z :p ?a } WHERE { ?a :p10 ?b }")
    with pytest.raises(SparqlSyntaxError, match="paths are not allowed"):
        parse_sparql("CONSTRUCT { ?a :p1/:p2 ?b } WHERE { ?a :p10 ?b }")
    with pytest.raises(SparqlSyntaxError, match="modifiers"):
        parse_sparql("CONSTRUCT { ?a :p ?b } WHERE { ?a :p10 ?b } LIMIT 2")
    with pytest.raises(SparqlSyntaxError, match="empty CONSTRUCT"):
        parse_sparql("CONSTRUCT { } WHERE { ?a :p10 ?b }")
    # template var appearing in NO pattern at all is a typo → rejected
    with pytest.raises(SparqlSyntaxError, match="must be bound"):
        parse_sparql("CONSTRUCT { ?a :p ?q } WHERE { ?a :p10 ?b }")


def test_construct_skips_templates_with_unbound_vars(tiny_store, tiny_dict):
    """§16.2: a solution leaving a template variable unbound produces no
    triple for that template (skipped, not an error). Only b=2 binds ?c
    (p20 edge 2→3), so the graph is {(1,20,3),(2,20,3)}."""
    df = sparql_to_df(
        tiny_store,
        "CONSTRUCT { ?a :p20 ?c } WHERE { ?a :p10 ?b . "
        "OPTIONAL { ?b :p20 ?c } }",
        tiny_dict,
    )
    assert sorted((r.s, r.p, r.o) for r in df.collect()) == [
        (1, 20, 3),
        (2, 20, 3),
    ]


def test_construct_matches_sql_oracle(spark, sf_dir):
    """customer→region shortcut graph vs the equivalent DISTINCT join SQL."""
    import duckdb
    import os

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
        map(
            tuple,
            sparql_to_df(
                store,
                "CONSTRUCT { ?c :inRegion ?r } "
                "WHERE { ?c :inNation ?n . ?n :inRegion ?r }",
                d,
            ).collect(),
        )
    )
    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "region", "events", "lineitem",
              "supplier", "part", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""WITH triples AS ({TRIPLES_SQL})
                SELECT DISTINCT t1.s AS s,
                       CAST({P_IN_REGION} AS BIGINT) AS p, t2.o AS o
                FROM triples t1 JOIN triples t2 ON t1.o = t2.s
                WHERE t1.p = {P_IN_NATION} AND t2.p = {P_IN_REGION}"""
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0


def test_describe_terms_and_var(tiny_store, tiny_dict):
    # description of :n2 (id 2): every triple with 2 as subject or object
    want = [(1, 10, 2), (2, 10, 2), (2, 20, 3)]
    by_term = sparql_to_df(tiny_store, "DESCRIBE :n2", tiny_dict)
    assert by_term.columns == ["s", "p", "o"]
    assert sorted(map(tuple, by_term.collect())) == want
    # same resource reached through a WHERE group
    by_var = sparql_to_df(
        tiny_store, "DESCRIBE ?x WHERE { ?x :p20 :n3 }", tiny_dict
    )
    assert sorted(map(tuple, by_var.collect())) == want
    # multiple constant resources: union of descriptions, deduped
    multi = sparql_to_df(tiny_store, "DESCRIBE :n3 :neg5", tiny_dict)
    assert sorted(map(tuple, multi.collect())) == [(-5, 10, 1), (2, 20, 3)]


def test_describe_rejections():
    with pytest.raises(SparqlSyntaxError, match="needs a WHERE"):
        parse_sparql("DESCRIBE ?x")
    with pytest.raises(SparqlSyntaxError, match="must be bound"):
        parse_sparql("DESCRIBE ?z WHERE { ?x :p10 ?y }")
    with pytest.raises(SparqlSyntaxError, match="expected"):
        parse_sparql("DESCRIBE ")


def test_negated_property_set(tiny_store, tiny_dict):
    # !:p10 keeps only the p20 edge; !(:p10|:p20) excludes everything
    df = sparql_to_df(
        tiny_store, "SELECT ?s ?o WHERE { ?s !:p10 ?o }", tiny_dict
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(2, 3)]
    none = sparql_to_df(
        tiny_store, "SELECT ?s WHERE { ?s !(:p10|:p20) ?o }", tiny_dict
    )
    assert none.count() == 0
    # composes with joins like any pattern
    joined = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s !:p20 ?o . ?o :p20 ?c }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in joined.collect()) == [(1, 2), (2, 2)]


def test_negated_property_set_rejections():
    for bad in ("!(:p1/:p2)", "!?p", "!()", "!"):
        with pytest.raises(SparqlSyntaxError):
            parse_sparql(f"SELECT ?s WHERE {{ ?s {bad} ?o }}")
    # inverse members are legal (§9.1): !(^:p1) ≡ ^!(:p1) as a path AST
    bgp = parse_sparql("SELECT ?s WHERE { ?s !(^:p1) ?o }")
    assert bgp.where.paths[0][1] == ("inv", ("npred", (("term", ":p1"),)))
    bgp = parse_sparql("SELECT ?s WHERE { ?s !(:p1|^:p2) ?o }")
    assert bgp.where.paths[0][1] == (
        "alt",
        [
            ("npred", (("term", ":p1"),)),
            ("inv", ("npred", (("term", ":p2"),))),
        ],
    )
    # a closure OVER a negated set is legal (§9.1) and parses as a path AST
    bgp = parse_sparql("SELECT ?s WHERE { ?s !(:p1|:p2)+ ?o }")
    assert bgp.where.paths[0][1] == (
        "clos",
        ("npred", (("term", ":p1"), ("term", ":p2"))),
        "+",
    )


def test_bind_parse_precedence():
    bgp = parse_sparql(
        "SELECT ?a ?d WHERE { ?a :p ?b . BIND(?a * 2 - (?b + 1) AS ?d) }"
    )
    assert bgp.binds == (
        ("d", ("-", ("*", ("var", "a"), ("num", 2)), ("+", ("var", "b"), ("num", 1)))),
    )
    # glued negative literal re-splits into subtraction
    bgp = parse_sparql("SELECT ?a ?d WHERE { ?a :p ?b . BIND(?a -3 AS ?d) }")
    assert bgp.binds == (("d", ("-", ("var", "a"), ("num", 3))),)


def test_bind_rejections():
    # target already bound (SPARQL §10.1 makes this a syntax error)
    with pytest.raises(SparqlSyntaxError, match="already bound"):
        parse_sparql("SELECT ?a WHERE { ?a :p ?b . BIND(?a + 1 AS ?b) }")
    # expression variable out of scope
    with pytest.raises(SparqlSyntaxError, match="not in scope"):
        parse_sparql("SELECT ?a WHERE { ?a :p ?b . BIND(?zz + 1 AS ?c) }")
    # BIND inside a group parses onto that group (per-group Extend)
    bgp = parse_sparql(
        "SELECT ?a ?c WHERE { ?a :p ?b . "
        "OPTIONAL { ?b :q ?c . BIND(?c + 1 AS ?d) } }"
    )
    assert bgp.optionals[0].binds == (("d", ("+", ("var", "c"), ("num", 1))),)
    # missing AS
    with pytest.raises(SparqlSyntaxError, match="BIND needs"):
        parse_sparql("SELECT ?a WHERE { ?a :p ?b . BIND(?a + 1) }")
    # target named like a MINUS/EXISTS group-local variable PARSES since
    # the textual-order dispatch: each spelling plans to its written
    # meaning (semantics pinned in
    # test_sparql_compat.py::test_bind_vs_minus_textual_order)
    bgp = parse_sparql(
        "SELECT ?a WHERE { ?a :p ?b . MINUS { ?a :q ?c } "
        "BIND(?b + 1 AS ?c) }"
    )
    assert bgp.where.seq[-1] == ("bind", 0)
    parse_sparql(
        "SELECT ?a WHERE { ?a :p ?b . FILTER EXISTS { ?a :q ?z } "
        "BIND(?b + 1 AS ?z) }"
    )


def test_bind_executes_and_filters(tiny_store, tiny_dict):
    # p10 edges 1→1, 1→2, 2→2, -5→1; ?d = ?o - ?s
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?d WHERE { ?s :p10 ?o . BIND(?o - ?s AS ?d) "
        "FILTER(?d >= 0) }",
        tiny_dict,
    )
    assert sorted((r.s, r.o, r.d) for r in df.collect()) == [
        (-5, 1, 6),
        (1, 1, 0),
        (1, 2, 1),
        (2, 2, 0),
    ]


def test_bind_chained_and_select_star(tiny_store, tiny_dict):
    # later BIND uses an earlier one; SELECT * includes bind targets
    df = sparql_to_df(
        tiny_store,
        "SELECT * WHERE { ?s :p10 ?o . BIND(?s + ?o AS ?t) "
        "BIND(?t * 2 AS ?u) }",
        tiny_dict,
    )
    assert df.columns == ["s", "o", "t", "u"]
    assert sorted((r.s, r.o, r.t, r.u) for r in df.collect()) == [
        (-5, 1, -4, -8),
        (1, 1, 2, 4),
        (1, 2, 3, 6),
        (2, 2, 4, 8),
    ]


def test_bind_null_propagates_from_optional(tiny_store, tiny_dict):
    # ?c binds only for ?o=2 (p20 edge 2→3); elsewhere ?d stays unbound
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?d WHERE { ?s :p10 ?o . OPTIONAL { ?o :p20 ?c } "
        "BIND(?c * 10 AS ?d) }",
        tiny_dict,
    )
    got = sorted(
        ((r.s, r.d) for r in df.collect()),
        key=lambda t: (t[0], t[1] is None, t[1] or 0),
    )
    assert got == [(-5, None), (1, 30), (1, None), (2, 30)]


def test_bind_groupby_key(tiny_store, tiny_dict):
    # GROUP BY a computed key: ?g = ?o - ?s
    df = sparql_to_df(
        tiny_store,
        "SELECT ?g (COUNT(?s) AS ?n) WHERE { ?s :p10 ?o . "
        "BIND(?o - ?s AS ?g) } GROUP BY ?g",
        tiny_dict,
    )
    assert sorted((r.g, r.n) for r in df.collect()) == [(0, 2), (1, 1), (6, 1)]


def test_bind_group_concat_match_oracle(spark, sf_dir):
    """BIND + GROUP_CONCAT + COUNT over the derived graph vs DuckDB: the
    deterministic sort-before-join makes GROUP_CONCAT engine-portable
    (string_agg ... ORDER BY is the exact twin)."""
    from rdfproject_msc_spark import registry as R
    from rdfproject_msc_spark.sources.derived import TRIPLES_SQL
    from tests.oracle import assert_matches_oracle

    df = sparql_to_df(
        R._store(spark, sf_dir),
        "SELECT ?c (COUNT(?e) AS ?n) "
        '(GROUP_CONCAT(?e; SEPARATOR=",") AS ?events) '
        "WHERE { ?e :byUser ?c . BIND(?c * 10 AS ?k) FILTER(?k < 800) } "
        "GROUP BY ?c",
        R._dict(spark, sf_dir),
    )
    sql = f"""WITH triples AS ({TRIPLES_SQL})
    SELECT o AS c, count(s) AS n,
           string_agg(CAST(s AS VARCHAR), ',' ORDER BY s) AS events
    FROM triples WHERE p = 48 AND o * 10 < 800
    GROUP BY o
    """
    assert_matches_oracle(df, sql, sf_dir)


def test_zero_or_more_path(tiny_store, tiny_dict):
    """p* = §18.4 zero-length pairs (every graph term to itself) ∪ the p+
    reachability. Graph nodes here: {1, 2, 3, -5} (subjects ∪ objects)."""
    df = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { ?a :p10* ?b }", tiny_dict
    )
    got = sorted((r.a, r.b) for r in df.collect())
    # p10 edges: 1→1, 1→2, 2→2, -5→1 ⇒ p+ pairs {(1,1),(1,2),(2,2),(-5,1),
    # (-5,2)}; identity adds (3,3) and (-5,-5)
    assert got == [
        (-5, -5), (-5, 1), (-5, 2),
        (1, 1), (1, 2), (2, 2), (3, 3),
    ]


def test_zero_or_more_seeded_includes_seed(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store, "SELECT ?b WHERE { -5 :p10* ?b }", tiny_dict
    )
    assert sorted(r.b for r in df.collect()) == [-5, 1, 2]
    # a constant outside the graph still matches itself (§18.4: the
    # zero-length case has no membership requirement for constants)
    ask = sparql_to_df(
        tiny_store, "ASK { 99 :p10* 99 }", tiny_dict
    ).collect()
    assert ask[0].ask is True
    ask2 = sparql_to_df(
        tiny_store, "ASK { 99 :p10* 1 }", tiny_dict
    ).collect()
    assert ask2[0].ask is False


def test_zero_or_one_path(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store, "SELECT ?a ?b WHERE { ?a :p20? ?b }", tiny_dict
    )
    got = sorted((r.a, r.b) for r in df.collect())
    # p20 edge: 2→3; identity over nodes {1, 2, 3, -5}
    assert got == [(-5, -5), (1, 1), (2, 2), (2, 3), (3, 3)]


def test_zero_or_more_joins_with_pattern(tiny_store, tiny_dict):
    # ?a reaches ?b in ≥0 p10-steps and ?b has a p20 edge: ?b=2 →
    # reachable-from {1 (via edge), 2 (zero-length), -5 (2 hops)}
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?c WHERE { ?a :p10* ?b . ?b :p20 ?c }",
        tiny_dict,
    )
    assert sorted((r.a, r.c) for r in df.collect()) == [(-5, 3), (1, 3), (2, 3)]


def test_string_filter_in_optional_group(tiny_store, tiny_dict):
    """§18.2.2.2: a string-function FILTER inside OPTIONAL rides in the
    LeftJoin condition — failing matches null-extend, never drop."""
    def rows(q):
        return sorted(
            ((r.s, r.o, r.z) for r in sparql_to_df(tiny_store, q, tiny_dict).collect()),
            key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0),
        )

    # group-bound variable: p20 edge 2→3 (:n3); a never-matching suffix
    # keeps every row null-extended
    assert rows(
        "SELECT ?s ?o ?z WHERE { ?s :p10 ?o . "
        'OPTIONAL { ?o :p20 ?z . FILTER(STRENDS(STR(?z), "9")) } }'
    ) == [(-5, 1, None), (1, 1, None), (1, 2, None), (2, 2, None)]
    # ... and the matching suffix extends exactly the ?o=2 rows
    assert rows(
        "SELECT ?s ?o ?z WHERE { ?s :p10 ?o . "
        'OPTIONAL { ?o :p20 ?z . FILTER(STRENDS(STR(?z), "3")) } }'
    ) == [(-5, 1, None), (1, 1, None), (1, 2, 3), (2, 2, 3)]
    # outer-bound variable in the group filter: ?s=2 (term :n2) has a p20
    # match but fails CONTAINS → stays null-extended, not dropped
    assert rows(
        "SELECT ?s ?o ?z WHERE { ?s :p10 ?o . "
        'OPTIONAL { ?o :p20 ?z . FILTER(CONTAINS(STR(?s), "n1")) } }'
    ) == [(-5, 1, None), (1, 1, None), (1, 2, 3), (2, 2, None)]


def test_having_arithmetic(tiny_store, tiny_dict):
    # HAVING shares the FILTER grammar: arithmetic over aggregate aliases
    df = sparql_to_df(
        tiny_store,
        "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s :p10 ?o } "
        "GROUP BY ?o HAVING(?n * 2 > 3)",
        tiny_dict,
    )
    # groups: o=1 ← {1,-5} (n=2 → 4>3 keep), o=2 ← {1,2} (n=2 keep)
    assert sorted((r.o, r.n) for r in df.collect()) == [(1, 2), (2, 2)]


def test_select_expression_items(tiny_store, tiny_dict):
    """(arith AS ?alias) projection items desugar onto BIND (§18.2.4.4)."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s (?o - ?s AS ?d) (?s * 2 AS ?t) WHERE { ?s :p10 ?o }",
        tiny_dict,
    )
    assert df.columns == ["s", "d", "t"]
    assert sorted((r.s, r.d, r.t) for r in df.collect()) == [
        (-5, 6, -10), (1, 0, 2), (1, 1, 2), (2, 0, 4),
    ]
    # grouped: the expression var can BE the grouping key
    df = sparql_to_df(
        tiny_store,
        "SELECT ?g (COUNT(?s) AS ?n) WHERE { ?s :p10 ?o . "
        "BIND(?o - ?s AS ?g) } GROUP BY ?g",
        tiny_dict,
    )
    assert sorted((r.g, r.n) for r in df.collect()) == [(0, 2), (1, 1), (6, 1)]
    # alias colliding with a pattern variable is rejected (BIND freshness)
    with pytest.raises(SparqlSyntaxError, match="already bound"):
        parse_sparql("SELECT (?a + 1 AS ?b) WHERE { ?a :p ?b }")


def test_filter_in_and_not_in(tiny_store, tiny_dict):
    bgp = parse_sparql(
        "SELECT ?x WHERE { ?x :p ?y . FILTER(?y IN (1, -5, 3)) }"
    )
    assert bgp.filters == (("in", "y", (1, -5, 3), False),)
    # p10 edges 1→1, 1→2, 2→2, -5→1
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?s IN (1, 2)) }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 1), (1, 2), (2, 2)]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . "
        "FILTER(?s NOT IN (1) && ?o IN (1, 2)) }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(-5, 1), (2, 2)]
    with pytest.raises(SparqlSyntaxError, match="integer, string, or IRI constants"):
        parse_sparql("SELECT ?x WHERE { ?x :p ?y . FILTER(?y IN (?x)) }")


def test_filter_bound(tiny_store, tiny_dict):
    """BOUND + !BOUND (negation-as-failure): customers of p10 whose object
    has no p20 edge survive the !BOUND filter."""
    bgp = parse_sparql(
        "SELECT ?x WHERE { ?x :p ?y . OPTIONAL { ?y :q ?z } "
        "FILTER(!BOUND(?z)) }"
    )
    assert bgp.filters == (("not", ("bound", "z")),)
    # p10 edges 1→1, 1→2, 2→2, -5→1; p20 edge 2→3 ⇒ only ?o=2 rows bind ?z
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o . OPTIONAL { ?o :p20 ?z } "
        "FILTER(!BOUND(?z)) }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(-5, 1), (1, 1)]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o ?z WHERE { ?s :p10 ?o . OPTIONAL { ?o :p20 ?z } "
        "FILTER(BOUND(?z)) }",
        tiny_dict,
    )
    assert sorted((r.s, r.o, r.z) for r in df.collect()) == [(1, 2, 3), (2, 2, 3)]
    with pytest.raises(SparqlSyntaxError, match="BOUND takes a variable"):
        parse_sparql("SELECT ?x WHERE { ?x :p ?y . FILTER(BOUND(3)) }")


# ---------------------------------------------------------------------------
# term-valued FILTER equality (§17.4.1.7 on the term model): ?x = "term",
# STR(?x) = "term", reversed literal-first form, !=, missing-literal folding


def test_streq_parse_forms():
    for q in (
        'SELECT ?s WHERE { ?s :p ?o . FILTER(?o = ":n2") }',
        'SELECT ?s WHERE { ?s :p ?o . FILTER(STR(?o) = ":n2") }',
        'SELECT ?s WHERE { ?s :p ?o . FILTER(":n2" = ?o) }',
    ):
        bgp = parse_sparql(q)
        assert bgp.filters == (("streq", "o", ":n2", False),)
    bgp = parse_sparql('SELECT ?s WHERE { ?s :p ?o . FILTER(?o != ":n2") }')
    assert bgp.filters == (("streq", "o", ":n2", True),)
    # composes with connectives
    bgp = parse_sparql(
        'SELECT ?s WHERE { ?s :p ?o . FILTER(?o = ":n2" || ?s > 0) }'
    )
    assert bgp.filters[0][0] == "or"


def test_streq_rejections():
    # ordering operators on string literals stay rejected
    with pytest.raises(SparqlSyntaxError):
        parse_sparql('SELECT ?s WHERE { ?s :p ?o . FILTER(?o < ":n2") }')
    with pytest.raises(SparqlSyntaxError):
        parse_sparql('SELECT ?s WHERE { ?s :p ?o . FILTER(STR(?o) < ":n2") }')
    # STR takes a variable
    with pytest.raises(SparqlSyntaxError):
        parse_sparql('SELECT ?s WHERE { ?s :p ?o . FILTER(STR(3) = ":n2") }')
    # streq in HAVING (r6): term equality on a group key resolves to a
    # pushdown-able id equality, same as pattern-level filters
    bgp = parse_sparql(
        "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s :p ?o . } "
        'GROUP BY ?o HAVING(?o = ":n2")'
    )
    assert bgp.having == (("streq", "o", ":n2", False),)


def test_streq_executes_id_fast_path(tiny_store, tiny_dict):
    """Literal found in the dictionary → id equality (p10 edges: 1→1, 1→2,
    2→2, -5→1; :n2 is id 2)."""
    df = sparql_to_df(
        tiny_store,
        'SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?o = ":n2") }',
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2), (2, 2)]
    # the equality is pushed into the scan, not evaluated post-join
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "o#" in plan  # sanity: plan mentions the column


def test_streq_negated(tiny_store, tiny_dict):
    df = sparql_to_df(
        tiny_store,
        'SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(STR(?o) != ":n2") }',
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(-5, 1), (1, 1)]


def test_streq_missing_literal_folds(tiny_store, tiny_dict):
    """A literal absent from the dictionary appears in no triple: = yields
    the empty set (not an error), != keeps every bound row."""
    df = sparql_to_df(
        tiny_store,
        'SELECT ?s WHERE { ?s :p10 ?o . FILTER(?o = ":nope") }',
        tiny_dict,
    )
    assert df.count() == 0
    df = sparql_to_df(
        tiny_store,
        'SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?o != ":nope") }',
        tiny_dict,
    )
    assert df.count() == 4


def test_streq_in_optional_filter(tiny_store, tiny_dict):
    """Term equality inside an OPTIONAL-scoped FILTER rides in the LeftJoin
    condition: a failing match stays null-extended (§18.2.2.2)."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?c WHERE { ?a :p10 ?b . "
        'OPTIONAL { ?b :p20 ?c . FILTER(?c = ":n3") } }',
        tiny_dict,
    )
    rows = sorted(
        ((r.a, r.c) for r in df.collect()),
        key=lambda t: (t[0], t[1] if t[1] is not None else -99),
    )
    # p10: 1→1, 1→2, 2→2, -5→1; p20: 2→3 and :n3 = 3 passes the filter
    assert rows == [(-5, None), (1, None), (1, 3), (2, 3)]


def test_streq_unbound_var_drops(tiny_store, tiny_dict):
    """= over a var bound only in OPTIONAL: unbound → SPARQL error → row
    dropped at the top-level filter (Spark NULL does the same)."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?a ?c WHERE { ?a :p10 ?b . OPTIONAL { ?b :p20 ?c } "
        'FILTER(?c = ":n3") }',
        tiny_dict,
    )
    assert sorted((r.a, r.c) for r in df.collect()) == [(1, 3), (2, 3)]


def test_having_with_aggregate_calls(tiny_store, tiny_dict):
    """§11.5: aggregate CALLS inside HAVING lift to hidden aggregates —
    constraints over aggregates that are NOT projected."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } "
        "GROUP BY ?s HAVING(SUM(?o) > 1)",
        tiny_dict,
    )
    # p10 object sums: 1→3, 2→2, -5→1 → -5 drops; hidden column projected away
    assert df.columns == ["s", "n"]
    assert sorted((r.s, r.n) for r in df.collect()) == [(1, 2), (2, 1)]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s WHERE { ?s :p10 ?o } "
        "GROUP BY ?s HAVING(COUNT(?o) >= 2 && MAX(?o) > 1)",
        tiny_dict,
    )
    assert sorted(r.s for r in df.collect()) == [1]
    with pytest.raises(SparqlSyntaxError, match="aggregate variable"):
        parse_sparql(
            "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } "
            "GROUP BY ?s HAVING(SUM(?zz) > 1)"
        )


def test_trailing_values_clause(tiny_store, tiny_dict):
    """§7.2.2 query-level VALUES after the WHERE group: the final algebra
    joins it with the pattern (§18.2.2.8) — same compilation as the
    in-group block, composing with other modifiers."""
    df = sparql_to_df(
        tiny_store, "SELECT ?s ?o WHERE { ?s :p10 ?o } VALUES ?o { 2 }",
        tiny_dict,
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 2), (2, 2)]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o } ORDER BY DESC(?s) "
        "VALUES (?s ?o) { (1 2) (2 2) }",
        tiny_dict,
    )
    assert [(r.s, r.o) for r in df.collect()] == [(2, 2), (1, 2)]
    with pytest.raises(SparqlSyntaxError, match="VALUES variable"):
        parse_sparql("SELECT ?s WHERE { ?s :p10 ?o } VALUES ?zz { 1 }")


def test_in_list_with_string_terms(tiny_store, tiny_dict):
    """[NOT] IN lists accept string terms (§17.4.1.9-10), resolved to ids
    by the same bounded lookup as term equality; mixed lists compose by
    De Morgan; absent terms constant-fold."""
    def rows(q):
        return sorted(
            (r.s, r.o) for r in sparql_to_df(tiny_store, q, tiny_dict).collect()
        )

    assert rows(
        'SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?o IN (":n1", ":n3")) }'
    ) == [(-5, 1), (1, 1)]
    assert rows(
        'SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?o IN (2, ":n1")) }'
    ) == [(-5, 1), (1, 1), (1, 2), (2, 2)]
    assert rows(
        'SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?o NOT IN (":n1")) }'
    ) == [(1, 2), (2, 2)]
    assert rows(
        'SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?o IN (":nope")) }'
    ) == []
    assert rows(
        'SELECT ?s ?o WHERE { ?s :p10 ?o . FILTER(?o NOT IN (2, ":nope")) }'
    ) == [(-5, 1), (1, 1)]


def test_select_reduced_is_noop(tiny_store, tiny_dict):
    """REDUCED (§9.9.2) permits but does not require duplicate
    elimination; the multiset passes through unchanged (conformant)."""
    df = sparql_to_df(
        tiny_store, "SELECT REDUCED ?s WHERE { ?s :p10 ?o }", tiny_dict
    )
    assert sorted(r.s for r in df.collect()) == [-5, 1, 1, 2]


def test_order_by_expressions(tiny_store, tiny_dict):
    """§15.1 OrderCondition with bracketted expressions: arithmetic sort
    keys compile over the bound variables pre-projection."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?o WHERE { ?s :p10 ?o } ORDER BY DESC(?o - ?s) ?s",
        tiny_dict,
    )
    # o-s: (1,1)→0, (1,2)→1, (2,2)→0, (-5,1)→6; ties break by ?s asc
    assert [(r.s, r.o) for r in df.collect()] == [
        (-5, 1),
        (1, 2),
        (1, 1),
        (2, 2),
    ]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s WHERE { ?s :p10 ?o } ORDER BY (?o * -1) ?s LIMIT 2",
        tiny_dict,
    )
    assert [r.s for r in df.collect()] == [1, 2]
    # r8: an ORDER BY expression over a grouped-output column is LEGAL
    # (it rode the reject this test used to pin; see
    # test_order_by_aggregate_expression for the full surface)
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s :p10 ?o } "
        "GROUP BY ?s ORDER BY (?n + 1) ?s",
        tiny_dict,
    )
    assert [(r.s, r.n) for r in df.collect()] == [(-5, 1), (2, 1), (1, 2)]
    with pytest.raises(SparqlSyntaxError, match="not in BGP"):
        parse_sparql("SELECT ?s WHERE { ?s :p10 ?o } ORDER BY (?zz + 1)")


def test_string_literal_escapes(spark):
    r"""ECHAR escapes (§19.8) in string literals: \" \\ \n \t decode in
    pattern terms and every FILTER string position; unknown escapes are
    syntax errors."""
    from rdfproject_msc_spark.dictionary import Dictionary
    from rdfproject_msc_spark.store import TripleStore

    store = TripleStore(
        spark.createDataFrame([(1, 10, 7), (2, 10, 8)], "s long, p long, o long")
    )
    d = Dictionary(
        spark.createDataFrame(
            [(10, ":p10"), (1, ":n1"), (2, ":n2"), (7, 'say "hi"'), (8, "a\\b\nc")],
            "id long, term string",
        )
    )
    bgp = parse_sparql(r'SELECT ?s WHERE { ?s :p10 "say \"hi\"" }')
    assert bgp.patterns[0].o == ("term", 'say "hi"')
    df = sparql_to_df(store, r'SELECT ?s WHERE { ?s :p10 "say \"hi\"" }', d)
    assert [r.s for r in df.collect()] == [1]
    df = sparql_to_df(
        store,
        r'SELECT ?s WHERE { ?s :p10 ?o . FILTER(?o = "a\\b\nc") }',
        d,
    )
    assert [r.s for r in df.collect()] == [2]
    df = sparql_to_df(
        store,
        r'SELECT ?s WHERE { ?s :p10 ?o . FILTER(CONTAINS(?o, "\"hi")) }',
        d,
    )
    assert [r.s for r in df.collect()] == [1]
    with pytest.raises(SparqlSyntaxError, match="escape"):
        parse_sparql(r'SELECT ?s WHERE { ?s :p10 "bad \q" }')


def test_typed_and_tagged_literals():
    """xsd integer typed literals collapse onto the id data model; other
    datatypes and language tags reject with clear messages."""
    bgp = parse_sparql(
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema/> "
        'SELECT ?s WHERE { ?s :p10 "12"^^xsd:integer }'
    )
    assert bgp.patterns[0].o == ("id", 12)
    bgp = parse_sparql(
        'SELECT ?s WHERE { ?s :p10 '
        '"12"^^<http://www.w3.org/2001/XMLSchema#integer> }'
    )
    assert bgp.patterns[0].o == ("id", 12)
    # language-tagged literals normalize to canonical quoted text with a
    # LOWERCASE tag (BCP47 case-insensitivity); non-integer typed
    # literals keep the quoted form with the localized datatype (r6
    # term-kind model)
    bgp = parse_sparql('SELECT ?s WHERE { ?s :p10 "x"@EN }')
    assert bgp.patterns[0].o == ("term", '"x"@en')
    bgp = parse_sparql('SELECT ?s WHERE { ?s :p10 "x"^^xsd:string }')
    assert bgp.patterns[0].o == ("term", '"x"^^:string')


def test_select_expressions_over_aggregates(tiny_store, tiny_dict):
    """§11.1: projections may combine aggregates arithmetically —
    aggregate calls lift to hidden aliases, the expression computes on
    the grouped output (and HAVING can reference the alias). Division
    yields SPARQL decimal (double)."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s (SUM(?o) / COUNT(?o) AS ?avg2) "
        "WHERE { ?s :p10 ?o } GROUP BY ?s",
        tiny_dict,
    )
    assert df.columns == ["s", "avg2"]
    assert sorted((r.s, r.avg2) for r in df.collect()) == [
        (-5, 1.0),
        (1, 1.5),
        (2, 2.0),
    ]
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s (SUM(?o) + ?s AS ?t) WHERE { ?s :p10 ?o } "
        "GROUP BY ?s HAVING(?t > 0)",
        tiny_dict,
    )
    assert sorted((r.s, r.t) for r in df.collect()) == [(1, 4), (2, 4)]
    with pytest.raises(SparqlSyntaxError, match="GROUP BY keys or aggregates"):
        parse_sparql(
            "SELECT ?s (SUM(?o) + ?x AS ?t) "
            "WHERE { ?s :p10 ?o . ?s :p10 ?x } GROUP BY ?s"
        )


def test_bind_division(tiny_store, tiny_dict):
    """§17.3 numeric division in BIND/FILTER arithmetic: decimal result,
    division by zero → NULL → SPARQL expression error (unbound/drop)."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s ?h WHERE { ?s :p10 ?o . BIND(?o / 2 AS ?h) "
        "FILTER(?h >= 1) }",
        tiny_dict,
    )
    assert sorted((r.s, r.h) for r in df.collect()) == [
        (1, 1.0),
        (2, 1.0),
    ]
    # x / 0 is an expression error: the row drops at the filter
    df = sparql_to_df(
        tiny_store,
        "SELECT ?s WHERE { ?s :p10 ?o . FILTER(?o / 0 > 0) }",
        tiny_dict,
    )
    assert df.collect() == []


def test_order_by_requires_keys():
    with pytest.raises(SparqlSyntaxError, match="at least one sort key"):
        parse_sparql("SELECT ?s WHERE { ?s :p ?o } ORDER BY LIMIT 2")


def test_order_by_aggregate_expression(tiny_store, tiny_dict):
    """ORDER BY DESC(COUNT(?x)) under GROUP BY (r8): the expression's
    aggregate lifts to a hidden aggregate (the HAVING desugaring) and the
    sort runs over the grouped output before the projection drops it."""
    # grouping ?o over { ?s ?p ?o }: o=1 ← {1,-5} (n=2), o=2 ← {1,2}
    # (n=2), o=3 ← {2} (n=1); ?o breaks the n=2 tie deterministically
    df = sparql_to_df(
        tiny_store,
        "SELECT ?o WHERE { ?s ?p ?o } GROUP BY ?o "
        "ORDER BY DESC(COUNT(?s)) ?o LIMIT 2",
        tiny_dict,
    )
    assert [r.o for r in df.collect()] == [1, 2]
    # the hidden count must NOT leak into the schema
    assert df.columns == ["o"]

    # mixed keys + arithmetic over two aggregates, ascending tiebreak:
    # o=1 sum(1-5)=-4 n=2 → -6; o=2 sum(1+2)=3 n=2 → 1; o=3 sum=2 n=1 → 1
    df = sparql_to_df(
        tiny_store,
        "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?o "
        "ORDER BY (SUM(?s) - COUNT(?s)) ?o",
        tiny_dict,
    )
    assert [(r.o, r.n) for r in df.collect()] == [(1, 2), (2, 2), (3, 1)]

    # expression over a projected aggregate ALIAS also works (?n is a
    # grouped-output column)
    df = sparql_to_df(
        tiny_store,
        "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?o "
        "ORDER BY (0 - ?n) ?o",
        tiny_dict,
    )
    assert [(r.o, r.n) for r in df.collect()] == [(1, 2), (2, 2), (3, 1)]


def test_order_by_aggregate_expression_oracle(tiny_store, tiny_dict, spark):
    """DuckDB oracle for ORDER BY DESC(COUNT(...)) — full ordered rows."""
    import duckdb

    pdf = tiny_store.df.select("s", "p", "o").toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        "SELECT o, COUNT(s) AS n FROM t GROUP BY o "
        "ORDER BY COUNT(s) DESC, o LIMIT 3"
    ).fetchall()
    df = sparql_to_df(
        tiny_store,
        "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?o "
        "ORDER BY DESC(COUNT(?s)) ?o LIMIT 3",
        tiny_dict,
    )
    assert [(r.o, r.n) for r in df.collect()] == want


def test_order_by_aggregate_expression_rejections(tiny_store, tiny_dict):
    # a non-grouped variable inside the ORDER BY expression is an error
    with pytest.raises(SparqlSyntaxError, match="GROUP BY keys or aggregates"):
        parse_sparql(
            "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s :p10 ?o } "
            "GROUP BY ?o ORDER BY (?s + 1)"
        )
    # aggregate over a variable not in the BGP
    with pytest.raises(SparqlSyntaxError, match="not in BGP"):
        parse_sparql(
            "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s :p10 ?o } "
            "GROUP BY ?o ORDER BY DESC(COUNT(?z))"
        )
    # DISTINCT + aggregate-expression sort key is contradictory
    with pytest.raises(SparqlSyntaxError, match="DISTINCT"):
        sparql_to_df(
            tiny_store,
            "SELECT DISTINCT ?o WHERE { ?s :p10 ?o } GROUP BY ?o "
            "ORDER BY DESC(COUNT(?s))",
            tiny_dict,
        )


def test_group_concat_over_expressions(tiny_store, tiny_dict, spark):
    """GROUP_CONCAT over computed expressions (r8, §11.4.7): a string
    manipulation rides the synthetic-BIND lowering (term attach before
    the partial aggregation); arithmetic stringifies the numeric value."""
    import duckdb

    # string expression: UCASE of the decoded subject term
    df = sparql_to_df(
        tiny_store,
        'SELECT ?o (GROUP_CONCAT(UCASE(STR(?s)); SEPARATOR=",") AS ?c) '
        "WHERE { ?s :p10 ?o } GROUP BY ?o",
        tiny_dict,
    )
    got = {r.o: r.c for r in df.collect()}
    assert got == {1: ":N1,:NEG5", 2: ":N1,:N2"}

    # arithmetic expression: numeric value stringified, value-sorted
    df = sparql_to_df(
        tiny_store,
        'SELECT ?o (GROUP_CONCAT(?s + ?s; SEPARATOR="|") AS ?c) '
        "WHERE { ?s :p10 ?o } GROUP BY ?o",
        tiny_dict,
    )
    got = {r.o: r.c for r in df.collect()}
    assert got == {1: "-10|2", 2: "2|4"}

    # DuckDB string_agg oracle for the string-expression form
    pdf = tiny_store.df.filter("p = 10").select("s", "o").toPandas()
    dpdf = tiny_dict.df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    con.register("d", dpdf)
    want = {
        o: c
        for o, c in con.execute(
            "SELECT t.o, string_agg(UPPER(d.term), ',' ORDER BY "
            "UPPER(d.term)) FROM t JOIN d ON t.s = d.id GROUP BY t.o"
        ).fetchall()
    }
    df = sparql_to_df(
        tiny_store,
        'SELECT ?o (GROUP_CONCAT(UCASE(STR(?s)); SEPARATOR=",") AS ?c) '
        "WHERE { ?s :p10 ?o } GROUP BY ?o",
        tiny_dict,
    )
    assert {r.o: r.c for r in df.collect()} == want

    # SUM over a string expression is a type error
    with pytest.raises(SparqlSyntaxError, match="not numeric"):
        parse_sparql(
            "SELECT ?o (SUM(CONCAT(STR(?s), \"x\")) AS ?t) "
            "WHERE { ?s :p10 ?o } GROUP BY ?o"
        )


def test_fuzz_regressions_deep_nesting_and_absent_id_strcase(
    tiny_store, tiny_dict
):
    """Deterministic pins for two r8 DuckDB-fuzz finds: (1) a legal
    7-paren-deep string chain was rejected by the projection regex
    (depth cap 6 → 10); (2) UCASE/LCASE(STR(?x)) != "lit" dropped
    dictionary-absent ids instead of comparing their decimal STR."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?o (SUBSTR(SUBSTR(UCASE(SUBSTR(UCASE(STR(?o)), 1)), 1), 1)"
        " AS ?t) WHERE { ?s :p10 ?o }",
        tiny_dict,
    )
    got = {r.o: r.t for r in df.collect()}
    assert got == {1: ":N1", 2: ":N2"}

    # tiny_store has s=-5,1,2 on :p10; all their STR values are dict
    # terms — add an absent o: use ?s which includes -5 (":neg5") and
    # check != keeps EVERY row including ids with no dictionary term.
    # o values 1,2 are in the dict; predicate 10 is; so exercise via a
    # store row with an absent object:
    from rdfproject_msc_spark.store import TripleStore

    spark = tiny_store.df.sparkSession
    st_ = TripleStore(
        spark.createDataFrame(
            [(1, 10, 2), (1, 10, 999)], "s long, p long, o long"
        )
    )
    df = sparql_to_df(
        st_,
        'SELECT ?o WHERE { ?s :p10 ?o . FILTER(UCASE(STR(?o)) != "ZZ") }',
        tiny_dict,
    )
    assert sorted(r.o for r in df.collect()) == [2, 999]
    # and equality against the decimal form MATCHES the absent id
    df = sparql_to_df(
        st_,
        'SELECT ?o WHERE { ?s :p10 ?o . FILTER(LCASE(STR(?o)) = "999") }',
        tiny_dict,
    )
    assert [r.o for r in df.collect()] == [999]
    # STRLEN(STR(?x)) measures the decimal form of an absent id too,
    # while bare STRLEN(?x) stays a type error → drop (§17.4.3 applies
    # to string literals; STR() gives every term a lexical form)
    df = sparql_to_df(
        st_,
        "SELECT ?o WHERE { ?s :p10 ?o . FILTER(STRLEN(STR(?o)) = 3) }",
        tiny_dict,
    )
    assert sorted(r.o for r in df.collect()) == [2, 999]  # ':n2' and '999'
    df = sparql_to_df(
        st_,
        "SELECT ?o WHERE { ?s :p10 ?o . FILTER(STRLEN(?o) = 3) }",
        tiny_dict,
    )
    assert [r.o for r in df.collect()] == [2]  # absent 999 type-errors


def test_negated_property_set_composed_with_path_operators(spark, tiny_dict):
    """§9.1 negated sets composed with closures/sequences/inverses —
    VERDICT r7 listed these as rejects, but they fall through the flat
    expansion to the full path-AST parser; pin the execution semantics.
    Edges: 1-:p10->2, 2-:p20->3, 3-:p30->4, 1-:p30->5."""
    from rdfproject_msc_spark.dictionary import Dictionary
    from rdfproject_msc_spark.store import TripleStore

    st_ = TripleStore(
        spark.createDataFrame(
            [(1, 10, 2), (2, 20, 3), (3, 30, 4), (1, 30, 5)],
            "s long, p long, o long",
        )
    )
    d = Dictionary(
        spark.createDataFrame(
            [(10, ":p10"), (20, ":p20"), (30, ":p30")]
            + [(i, f":n{i}") for i in (1, 2, 3, 4, 5)],
            "id long, term string",
        )
    )

    # closure OF a negated set: p∉{p10,p20} edges are the :p30 ones
    df = sparql_to_df(
        st_, "SELECT ?s ?o WHERE { ?s !(:p10|:p20)+ ?o }", d
    )
    assert sorted((r.s, r.o) for r in df.collect()) == [(1, 5), (3, 4)]

    # negated set as a sequence member: (!:p10)/:p30 = {2->3}/:p30 ∪ ...
    df = sparql_to_df(st_, "SELECT ?s ?o WHERE { ?s (!:p10)/:p30 ?o }", d)
    assert sorted((r.s, r.o) for r in df.collect()) == [(2, 4)]

    # inverse member inside the set (§9.1 identity:
    # !(^A|B) ≡ !(B) ∪ ^!(A)): forward p∉{p20} plus reversed p∉{p10}
    df = sparql_to_df(st_, "SELECT ?s ?o WHERE { ?s !(^:p10|:p20) ?o }", d)
    assert sorted((r.s, r.o) for r in df.collect()) == [
        (1, 2), (1, 5), (3, 2), (3, 4), (4, 3), (5, 1),
    ]


def test_nondeterministic_builtins_named_reject():
    """NOW/RAND/UUID/STRUUID: the documented r8 stance (SPARQL.md) — a
    named reject explaining WHY, not a generic parse error."""
    for fn in ("NOW", "RAND", "UUID", "STRUUID"):
        with pytest.raises(SparqlSyntaxError, match="deliberately"):
            parse_sparql(
                f"SELECT ?s WHERE {{ ?s :p ?o . BIND({fn}() AS ?x) }}"
            )


def test_aggregate_expression_args_in_having_order_select(
    tiny_store, tiny_dict
):
    """r8: aggregate calls over paren-free arithmetic lift everywhere the
    HAVING desugaring applies — HAVING bodies, ORDER BY expressions, and
    SELECT expressions over aggregates. p10 groups: o=1 ← {1,-5},
    o=2 ← {1,2}."""
    df = sparql_to_df(
        tiny_store,
        "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s :p10 ?o } GROUP BY ?o "
        "HAVING(SUM(?s * ?s) > 5)",
        tiny_dict,
    )
    assert [(r.o, r.n) for r in df.collect()] == [(1, 2)]  # 26 > 5; 5 is not

    df = sparql_to_df(
        tiny_store,
        "SELECT ?o WHERE { ?s :p10 ?o } GROUP BY ?o "
        "ORDER BY DESC(SUM(?s + 1))",
        tiny_dict,
    )
    assert [r.o for r in df.collect()] == [2, 1]  # 5 desc over -2

    df = sparql_to_df(
        tiny_store,
        "SELECT ?o ((SUM(?s * ?s) + 1) AS ?t) WHERE { ?s :p10 ?o } "
        "GROUP BY ?o",
        tiny_dict,
    )
    assert sorted((r.o, r.t) for r in df.collect()) == [(1, 27), (2, 6)]

    # DuckDB oracle for the HAVING form
    import duckdb

    pdf = tiny_store.df.filter("p = 10").select("s", "o").toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        "SELECT o, COUNT(s) AS n FROM t GROUP BY o HAVING SUM(s*s) > 5 "
        "ORDER BY o"
    ).fetchall()
    df = sparql_to_df(
        tiny_store,
        "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s :p10 ?o } GROUP BY ?o "
        "HAVING(SUM(?s * ?s) > 5) ORDER BY ?o",
        tiny_dict,
    )
    assert [(r.o, r.n) for r in df.collect()] == want
