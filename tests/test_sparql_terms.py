"""RDF term-kind model (r6): language-tagged literals and the
LANG/DATATYPE/isIRI/isLiteral/isBlank/isNumeric/LANGMATCHES accessors
(SPARQL 1.1 §17.4.2), evaluated over the dictionary term-text grammar
(planner._term_lang):

    ':name'        IRI (localized)          '_:label'  blank node
    '"lex"@tag'    language-tagged literal  '"lex"^^:dt' typed literal
    bare text      plain literal (:string)  absent id  integer literal

The reference's Jena front-end parsed these accessors
(MyOpVisitorBase.java:49); its translator had no literal model. Here they
compile to column expressions over ONE dictionary left join per variable
— evaluated against |dict| distinct terms, never per solution row — and
at positive polarity an implied null-intolerant term predicate lets
Catalyst rewrite the join to inner and push the match into the
dictionary scan (same strategy as the REGEX family)."""

from __future__ import annotations

import pytest

from rdfproject_msc_spark.dictionary import Dictionary
from rdfproject_msc_spark.sparql.parser import SparqlSyntaxError, parse_sparql
from rdfproject_msc_spark.sparql.planner import sparql_to_df
from rdfproject_msc_spark.store import TripleStore

# ids: 1=:alice (IRI), 2='"chat"@en', 3='"cat"@fr', 4=plain 'hello',
# 5='"2024-01-01"^^:date', 6='"hi"@en-us', 10=:label (pred);
# 42 has NO dictionary entry → integer literal
TRIPLES = [(1, 10, 2), (1, 10, 3), (1, 10, 4), (1, 10, 5), (1, 10, 42),
           (1, 10, 1), (1, 10, 6)]
# :price (11) objects for typed-VALUE comparisons (r7): 7/8 decimal and
# double literals, 9 a dateTime literal, 43 dictionary-absent (integer
# literal 43 — numeric value 43.0)
TRIPLES += [(1, 11, 7), (1, 11, 8), (1, 11, 9), (1, 11, 43)]
# :when (13) objects for the §17.4.5 date/time accessors (r7): valid
# date 5 and dateTime 9 (shared ids), a second date 14, a SHAPE-valid but
# calendar-INVALID date 12 (accessor → error), and integer literal 43
# (not temporal → error). :delta (16) objects for FLOOR/CEIL/ROUND tie
# and fraction cases.
TRIPLES += [(2, 13, 5), (2, 13, 12), (2, 13, 14), (2, 13, 9), (2, 13, 43)]
TRIPLES += [(2, 16, 15), (2, 16, 17), (2, 16, 18)]
DICT = [
    (1, ":alice"),
    (2, '"chat"@en'),
    (3, '"cat"@fr'),
    (4, "hello"),
    (5, '"2024-01-01"^^:date'),
    (6, '"hi"@en-us'),
    (10, ":label"),
    (7, '"19.5"^^:decimal'),
    (8, '"120.25"^^:double'),
    (9, '"2024-01-01T10:30:00"^^:dateTime'),
    (11, ":price"),
    (12, '"2024-13-99"^^:date'),
    (13, ":when"),
    (14, '"2023-06-15"^^:date'),
    (15, '"-2.5"^^:decimal'),
    (16, ":delta"),
    (17, '"2.5"^^:decimal'),
    (18, '"2024-01-01T23:59:59.75"^^:dateTime'),
]


@pytest.fixture(scope="module")
def tstore(spark):
    return TripleStore(
        spark.createDataFrame(TRIPLES, "s long, p long, o long")
    )


@pytest.fixture(scope="module")
def tdict(spark):
    return Dictionary(spark.createDataFrame(DICT, "id long, term string"))


def _objs(tstore, tdict, flt):
    df = sparql_to_df(
        tstore, f"SELECT ?o WHERE {{ ?s :label ?o . FILTER({flt}) }}", tdict
    )
    return sorted(r.o for r in df.collect())


def test_lang_equality(tstore, tdict):
    # tag comparison is case-insensitive on BOTH sides (BCP47)
    assert _objs(tstore, tdict, 'LANG(?o) = "en"') == [2]
    assert _objs(tstore, tdict, 'LANG(?o) = "EN"') == [2]
    assert _objs(tstore, tdict, 'LANG(?o) = "en-US"') == [6]
    # LANG of plain/typed/integer literals is "" (§17.4.2.6)
    assert _objs(tstore, tdict, 'LANG(?o) = ""') == [4, 5, 42]
    # != : IRIs ERROR (NULL) and drop — not "everything but fr"
    assert _objs(tstore, tdict, 'LANG(?o) != "fr"') == [2, 4, 5, 6, 42]


def test_langmatches(tstore, tdict):
    # "*" = any tagged literal; a range matches itself and its subtags
    assert _objs(tstore, tdict, 'LANGMATCHES(LANG(?o), "*")') == [2, 3, 6]
    assert _objs(tstore, tdict, 'LANGMATCHES(LANG(?o), "en")') == [2, 6]


def test_datatype(tstore, tdict):
    assert _objs(tstore, tdict, "DATATYPE(?o) = xsd:date") == [5]
    assert _objs(tstore, tdict, "DATATYPE(?o) = xsd:string") == [4]
    # every xsd integer datatype collapses to the typed-int model
    assert _objs(tstore, tdict, "DATATYPE(?o) = xsd:integer") == [42]
    assert _objs(tstore, tdict, "DATATYPE(?o) = xsd:long") == [42]
    assert _objs(
        tstore, tdict,
        "DATATYPE(?o) = <http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>",
    ) == [2, 3, 6]
    # != drops IRIs (error), keeps the rest
    assert _objs(tstore, tdict, "DATATYPE(?o) != xsd:date") == [2, 3, 4, 6, 42]


def test_type_predicates(tstore, tdict):
    assert _objs(tstore, tdict, "isIRI(?o)") == [1]
    assert _objs(tstore, tdict, "isLiteral(?o)") == [2, 3, 4, 5, 6, 42]
    assert _objs(tstore, tdict, "isNumeric(?o)") == [42]
    assert _objs(tstore, tdict, "isBlank(?o)") == []
    # negation over the precise 3VL form: !isIRI keeps literals only
    # (unbound would error; everything here is bound)
    assert _objs(tstore, tdict, "!isIRI(?o)") == [2, 3, 4, 5, 6, 42]
    # composition with the boolean connectives
    assert _objs(
        tstore, tdict, 'isLiteral(?o) && LANG(?o) = ""'
    ) == [4, 5, 42]


def test_bind_accessors(tstore, tdict):
    df = sparql_to_df(
        tstore,
        "SELECT ?o ?dt ?lg WHERE { ?s :label ?o . "
        "BIND(DATATYPE(?o) AS ?dt) BIND(LANG(?o) AS ?lg) }",
        tdict,
    )
    got = sorted(
        (r.o, r.dt, r.lg) for r in df.collect()
    )
    assert got == [
        (1, None, None),  # IRI: both accessors ERROR → unbound
        (2, ":langString", "en"),
        (3, ":langString", "fr"),
        (4, ":string", ""),
        (5, ":date", ""),
        (6, ":langString", "en-us"),
        (42, ":integer", ""),
    ]


def test_constant_tagged_literal_in_pattern(tstore, tdict):
    # '"chat"@EN' normalizes to the canonical lowercase-tag term
    df = sparql_to_df(tstore, 'SELECT ?s WHERE { ?s :label "chat"@EN }', tdict)
    assert [r.s for r in df.collect()] == [1]


def test_accessor_on_unbound_var_drops(tstore, tdict):
    # OPTIONAL-bound ?o unbound → LANG errors → row drops (§17.2)
    df = sparql_to_df(
        tstore,
        "SELECT ?s ?o WHERE { ?s :label 2 . "
        'OPTIONAL { ?s :missing ?o } FILTER(LANG(?o) = "") }',
        Dictionary(
            tdict.df.sparkSession.createDataFrame(
                DICT + [(99, ":missing")], "id long, term string"
            )
        ),
    )
    assert df.collect() == []


def test_positive_lang_filter_inner_izes_dict_join(tstore, tdict):
    """The implied null-intolerant predicate conjoined at positive
    polarity lets Catalyst rewrite the dictionary LEFT join to INNER —
    the term match then evaluates dictionary-side, the 100 TB strategy
    (|dict| ≪ |triples|)."""
    df = sparql_to_df(
        tstore,
        'SELECT ?o WHERE { ?s :label ?o . FILTER(LANG(?o) = "en") }',
        tdict,
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "LeftOuter" not in final


def test_strlen_and_case_filters(tstore, tdict):
    """STRLEN / UCASE / LCASE (r6): term-text functions evaluated
    dictionary-side like the REGEX family. Integer literals (no term
    text) and unbound vars error → drop, same as the other strfns."""
    # term lengths: ':alice'=6, '"chat"@en'=9, '"cat"@fr'=8, 'hello'=5,
    # '"2024-01-01"^^:date'=19, '"hi"@en-us'=10; 42 has no term
    assert _objs(tstore, tdict, "STRLEN(STR(?o)) > 9") == [5, 6]
    assert _objs(tstore, tdict, "STRLEN(?o) = 5") == [4]
    assert _objs(tstore, tdict, 'UCASE(STR(?o)) = "HELLO"') == [4]
    assert _objs(tstore, tdict, 'LCASE(?o) = ":alice"') == [1]
    # != under 3VL: the dictionary-absent id (42) drops (term is NULL)
    assert _objs(tstore, tdict, 'UCASE(?o) != "HELLO"') == [1, 2, 3, 5, 6]
    # composition with connectives
    assert _objs(
        tstore, tdict, 'STRLEN(?o) < 9 && !isIRI(?o)'
    ) == [3, 4]  # '"cat"@fr' (8) and 'hello' (5)
    with pytest.raises(SparqlSyntaxError, match="integer"):
        _objs(tstore, tdict, 'STRLEN(?o) > "x"')


def test_bind_str_decodes_term(tstore, tdict):
    """BIND(STR(?x) AS ?t) (r6): the term's lexical text as a string
    column — integer literals render as their decimal form, IRIs keep
    their localized text, unbound stays unbound."""
    df = sparql_to_df(
        tstore,
        "SELECT ?o ?t WHERE { ?s :label ?o . BIND(STR(?o) AS ?t) }",
        tdict,
    )
    got = sorted((r.o, r.t) for r in df.collect())
    assert got == [
        (1, ":alice"),
        (2, '"chat"@en'),
        (3, '"cat"@fr'),
        (4, "hello"),
        (5, '"2024-01-01"^^:date'),
        (6, '"hi"@en-us'),
        (42, "42"),
    ]


def test_order_by_str_sorts_by_term(tstore, tdict):
    """ORDER BY STR(?x) (r6): sort by the DECODED dictionary term
    (binary UTF-8 — DuckDB's default VARCHAR collation), ids only in
    the output. Dictionary-absent ids sort as NULL (Spark nulls-first
    asc). Composable with DESC() and plain keys."""
    df = sparql_to_df(
        tstore,
        "SELECT ?o WHERE { ?s :label ?o . FILTER(isLiteral(?o) && "
        'LANG(?o) != "") } ORDER BY STR(?o)',
        tdict,
    )
    # terms: '"cat"@fr' < '"chat"@en' < '"hi"@en-us' (binary)
    assert [r.o for r in df.collect()] == [3, 2, 6]
    df = sparql_to_df(
        tstore,
        "SELECT ?o WHERE { ?s :label ?o . FILTER(isLiteral(?o) && "
        'LANG(?o) != "") } ORDER BY DESC(STR(?o)) LIMIT 2',
        tdict,
    )
    assert [r.o for r in df.collect()] == [6, 2]
    with pytest.raises(SparqlSyntaxError, match="not in BGP"):
        sparql_to_df(
            tstore,
            "SELECT ?o WHERE { ?s :label ?o } ORDER BY STR(?zz)",
            tdict,
        )


def test_accessor_rejects_without_dictionary(tstore, spark):
    with pytest.raises(SparqlSyntaxError):
        sparql_to_df(
            tstore,
            'SELECT ?o WHERE { ?s 10 ?o . FILTER(LANG(?o) = "en") }',
            None,
        )


# ---- typed-VALUE comparisons (r7) ----------------------------------------


def _prices(tstore, tdict, flt):
    df = sparql_to_df(
        tstore, f"SELECT ?o WHERE {{ ?s :price ?o . FILTER({flt}) }}", tdict
    )
    return sorted(r.o for r in df.collect())


class TestValueComparisons:
    """FILTER comparisons by typed-literal VALUE (§17.3 operand mapping):
    decimal/double/float and date/dateTime literals compare by their
    parsed lexical value, integer literals (dictionary-absent ids) by the
    id itself; every other term kind is a type ERROR → NULL → drop (and
    under ! the error stays an error, so negation does NOT readmit)."""

    def test_bare_decimal_constant(self, tstore, tdict):
        # 19.5(dec):7  120.25(dbl):8  43(int-literal)  dateTime:9(error)
        assert _prices(tstore, tdict, "?o > 19.5") == [8, 43]
        assert _prices(tstore, tdict, "?o > 100.0") == [8]
        assert _prices(tstore, tdict, "?o <= 19.5") == [7]

    def test_typed_numeric_constant(self, tstore, tdict):
        assert _prices(tstore, tdict, '?o >= "19.5"^^xsd:decimal') == [7, 8, 43]
        assert _prices(tstore, tdict, '?o = "120.25"^^xsd:double') == [8]
        # value equality crosses datatypes: 19.50 double == 19.5 decimal
        assert _prices(tstore, tdict, '?o = "19.50"^^xsd:double') == [7]

    def test_integer_typed_constant_is_id_comparison(self, tstore, tdict):
        # "40"^^xsd:integer collapses to the id data model: compares
        # encoded IDS (9 and 43 > 40), not numeric VALUES
        assert _prices(tstore, tdict, '?o > "40"^^xsd:integer') == [43]

    def test_reversed_literal_side(self, tstore, tdict):
        assert _prices(tstore, tdict, '"19.5"^^xsd:decimal < ?o') == [8, 43]
        assert _prices(tstore, tdict, "120.25 <= ?o") == [8]

    def test_date_value(self, tstore, tdict):
        labs = sparql_to_df(
            tstore,
            'SELECT ?o WHERE { ?s :label ?o . '
            'FILTER(?o >= "2024-01-01"^^xsd:date) }',
            tdict,
        )
        assert sorted(r.o for r in labs.collect()) == [5]
        none = sparql_to_df(
            tstore,
            'SELECT ?o WHERE { ?s :label ?o . '
            'FILTER(?o > "2024-01-01"^^xsd:date) }',
            tdict,
        )
        assert none.collect() == []

    def test_datetime_value(self, tstore, tdict):
        assert _prices(
            tstore, tdict, '?o >= "2024-01-01T00:00:00"^^xsd:dateTime'
        ) == [9]
        assert _prices(
            tstore, tdict, '?o > "2024-01-01T10:30:00"^^xsd:dateTime'
        ) == []

    def test_error_semantics_not_readmitted_by_negation(self, tstore, tdict):
        # :label objects: IRI/tagged/plain/date are type ERRORS for a
        # numeric comparison — dropped at BOTH polarities; only the
        # integer literal 42 has a numeric value
        base = 'SELECT ?o WHERE { ?s :label ?o . FILTER(%s) }'
        pos = sparql_to_df(tstore, base % "?o > 0.0", tdict)
        assert sorted(r.o for r in pos.collect()) == [42]
        neg = sparql_to_df(tstore, base % "!(?o > 0.0)", tdict)
        assert neg.collect() == []

    def test_composes_with_connectives(self, tstore, tdict):
        assert _prices(tstore, tdict, "?o > 19.5 && ?o < 120.0") == [43]
        assert _prices(
            tstore, tdict, '?o < 20.0 || ?o = "120.25"^^xsd:double'
        ) == [7, 8]

    def test_unknown_datatype_is_term_identity_only(self, tstore, tdict):
        with pytest.raises(SparqlSyntaxError, match="ordering comparisons"):
            sparql_to_df(
                tstore,
                'SELECT ?o WHERE { ?s :price ?o . '
                'FILTER(?o > "x"^^:custom) }',
                tdict,
            )
        with pytest.raises(SparqlSyntaxError, match="ordering comparisons"):
            sparql_to_df(
                tstore,
                'SELECT ?o WHERE { ?s :price ?o . FILTER(?o >= "abc") }',
                tdict,
            )

    def test_malformed_lexicals_reject(self, tstore, tdict):
        for flt in (
            '?o > "abc"^^xsd:decimal',
            '?o > "2020-13"^^xsd:date',
            '?o > "2020-01-01T00:00:00+02:00"^^xsd:dateTime',
        ):
            with pytest.raises(SparqlSyntaxError):
                sparql_to_df(
                    tstore,
                    f"SELECT ?o WHERE {{ ?s :price ?o . FILTER({flt}) }}",
                    tdict,
                )

    def test_typed_literal_in_list_is_term_identity(self, tstore, tdict):
        # IN resolves typed literals through the BGP normalization:
        # canonical text → id ("19.50" is a DIFFERENT term from "19.5")
        assert _prices(
            tstore, tdict, '?o IN ("19.5"^^xsd:decimal, "zzz")'
        ) == [7]
        assert _prices(
            tstore, tdict, '?o IN ("19.50"^^xsd:decimal)'
        ) == []
        # integer-typed literals land in the id list
        assert _prices(tstore, tdict, '?o IN ("43"^^xsd:integer)') == [43]

    def test_optional_scoped_value_filter(self, tstore, tdict):
        # valcmp rides the LeftJoin-condition machinery like the strfns:
        # only the passing price joins; with NO passing price the left
        # row survives null-extended
        df = sparql_to_df(
            tstore,
            "SELECT ?s ?o WHERE { ?s :label 42 . "
            "OPTIONAL { ?s :price ?o . FILTER(?o > 100.0) } }",
            tdict,
        )
        rows = sorted((r.s, r.o) for r in df.collect())
        assert rows == [(1, 8)]
        df2 = sparql_to_df(
            tstore,
            "SELECT ?s ?o WHERE { ?s :label 42 . "
            "OPTIONAL { ?s :price ?o . FILTER(?o > 1000.0) } }",
            tdict,
        )
        assert [(r.s, r.o) for r in df2.collect()] == [(1, None)]


class TestCasts:
    """xsd:T() constructor casts (§17.5, r7) in BIND and ORDER BY —
    closing the parser's historical 'casts rejected' note. The cast
    evaluates over the dictionary term text: numeric literals by value
    (decimal→integer truncates toward zero), PLAIN literals by lexical
    form (string→integer requires an integer lexical), everything else
    is a cast error → NULL → unbound target / NULL sort key."""

    def test_bind_integer_cast(self, tstore, tdict):
        df = sparql_to_df(
            tstore,
            "SELECT ?o ?n WHERE { ?s :price ?o . "
            "BIND(xsd:integer(STR(?o)) AS ?n) }",
            tdict,
        )
        got = sorted((r.o, r.n) for r in df.collect())
        # 7: 19.5→19 (truncate)  8: 120.25→120  9: dateTime→error
        # 43: integer literal → itself
        assert got == [(7, 19), (8, 120), (9, None), (43, 43)]

    def test_bind_double_cast_and_plain_lexical(self, tstore, tdict):
        # :label objects: plain 'hello' has no numeric lexical → NULL;
        # IRIs/tagged/date all error; integer literal 42 → 42.0
        df = sparql_to_df(
            tstore,
            "SELECT ?o ?v WHERE { ?s :label ?o . "
            "BIND(xsd:double(?o) AS ?v) }",
            tdict,
        )
        got = sorted((r.o, r.v) for r in df.collect())
        assert got == [
            (1, None), (2, None), (3, None), (4, None), (5, None),
            (6, None), (42, 42.0),
        ]

    def test_bind_date_cast(self, tstore, tdict):
        import datetime

        df = sparql_to_df(
            tstore,
            "SELECT ?o ?d WHERE { ?s :label ?o . "
            "BIND(xsd:date(?o) AS ?d) }",
            tdict,
        )
        by_o = {r.o: r.d for r in df.collect()}
        assert by_o[5] == datetime.date(2024, 1, 1)
        assert all(v is None for k, v in by_o.items() if k != 5)

    def test_bind_xsd_string_is_str(self, tstore, tdict):
        df = sparql_to_df(
            tstore,
            "SELECT ?o ?t WHERE { ?s :price ?o . "
            "BIND(xsd:string(?o) AS ?t) }",
            tdict,
        )
        by_o = {r.o: r.t for r in df.collect()}
        assert by_o[43] == "43"  # integer literal STR = decimal form
        assert by_o[7] == '"19.5"^^:decimal'

    def test_order_by_cast_value(self, tstore, tdict):
        df = sparql_to_df(
            tstore,
            "SELECT ?o WHERE { ?s :price ?o } "
            "ORDER BY DESC(xsd:double(?o)) LIMIT 3",
            tdict,
        )
        # by VALUE: 120.25 > 43 > 19.5 (the dateTime is NULL, sorts last
        # under DESC) — id order would give 43 > 9 > 8
        assert [r.o for r in df.collect()] == [8, 43, 7]
        df2 = sparql_to_df(
            tstore,
            "SELECT ?o WHERE { ?s :price ?o } "
            "ORDER BY DESC(xsd:dateTime(?o)) LIMIT 1",
            tdict,
        )
        assert [r.o for r in df2.collect()] == [9]

    def test_cast_bind_usable_downstream(self, tstore, tdict):
        # the cast target feeds FILTER arithmetic like any BIND target
        df = sparql_to_df(
            tstore,
            "SELECT ?o WHERE { ?s :price ?o . "
            "BIND(xsd:integer(?o) AS ?n) FILTER(?n > 20 && ?n < 100) }",
            tdict,
        )
        assert sorted(r.o for r in df.collect()) == [43]

    def test_order_by_cast_var_not_in_bgp_rejects(self, tstore, tdict):
        with pytest.raises(SparqlSyntaxError, match="not in BGP"):
            sparql_to_df(
                tstore,
                "SELECT ?o WHERE { ?s :price ?o } ORDER BY xsd:double(?zz)",
                tdict,
            )


class TestStringExpressions:
    """String-manipulation BIND expressions (§17.4.3, r7): SUBSTR /
    STRBEFORE / STRAFTER / REPLACE / CONCAT / UCASE / LCASE over term
    text, arbitrarily nested, compiled to JVM column expressions with
    one dictionary join per distinct source variable. NULL (unbound /
    error) propagates through every function — SPARQL's
    expression-error-leaves-unbound."""

    def _t(self, tstore, tdict, expr):
        df = sparql_to_df(
            tstore,
            "SELECT ?o ?t WHERE { ?s :label ?o . "
            f"BIND({expr} AS ?t) }}",
            tdict,
        )
        return {r.o: r.t for r in df.collect()}

    def test_substr(self, tstore, tdict):
        got = self._t(tstore, tdict, "SUBSTR(STR(?o), 2, 4)")
        assert got[2] == "chat"  # '"chat"@en'[2:6]
        assert got[4] == "ello"
        assert got[42] == "2"  # integer literal STR = '42'
        # without length: to the end
        got2 = self._t(tstore, tdict, "SUBSTR(STR(?o), 7)")
        assert got2[2] == "@en"  # 1-based: pos 7 of '"chat"@en'

    def test_strbefore_strafter(self, tstore, tdict):
        got = self._t(tstore, tdict, 'STRBEFORE(STR(?o), "\\"@")')
        assert got[2] == '"chat'
        assert got[4] == ""  # no match → "" (§17.4.3.12)
        got2 = self._t(tstore, tdict, 'STRAFTER(STR(?o), "\\"@")')
        assert got2[2] == "en"
        assert got2[4] == ""
        # empty separator: "" before, the full string after
        assert self._t(tstore, tdict, 'STRBEFORE(STR(?o), "")')[4] == ""
        assert self._t(tstore, tdict, 'STRAFTER(STR(?o), "")')[4] == "hello"

    def test_replace_and_case(self, tstore, tdict):
        got = self._t(tstore, tdict, 'REPLACE(STR(?o), "[aeiou]", "_")')
        assert got[4] == "h_ll_"
        goti = self._t(tstore, tdict, 'REPLACE(STR(?o), "HELLO", "x", "i")')
        assert goti[4] == "x"
        assert self._t(tstore, tdict, "UCASE(STR(?o))")[4] == "HELLO"
        assert self._t(tstore, tdict, "LCASE(STR(?o))")[1] == ":alice"

    def test_concat_and_nesting(self, tstore, tdict):
        got = self._t(
            tstore, tdict, 'CONCAT("[", UCASE(SUBSTR(STR(?o), 1, 2)), "]")'
        )
        assert got[4] == "[HE]"
        assert got[42] == "[42]"

    def test_chain_through_string_targets(self, tstore, tdict):
        # a string expression can consume an earlier string BIND target
        # directly (no second dictionary join for ?u)
        df = sparql_to_df(
            tstore,
            "SELECT ?o ?t WHERE { ?s :label ?o . BIND(STR(?o) AS ?u) "
            'BIND(CONCAT(?u, "!") AS ?t) }',
            tdict,
        )
        got = {r.o: r.t for r in df.collect()}
        assert got[4] == "hello!"
        assert got[42] == "42!"

    def test_null_propagates_through_unbound(self, tstore, tdict):
        # OPTIONAL-unbound ?m: every string function errors → ?t unbound
        df = sparql_to_df(
            tstore,
            "SELECT ?s ?t WHERE { ?s :label 2 . "
            "OPTIONAL { ?s :price ?m . FILTER(?m > 1000.0) } "
            'BIND(CONCAT("x", STR(?m)) AS ?t) }',
            tdict,
        )
        assert [(r.s, r.t) for r in df.collect()] == [(1, None)]

    def test_rejects(self, tstore, tdict):
        with pytest.raises(SparqlSyntaxError, match="non-negative integer"):
            sparql_to_df(
                tstore,
                "SELECT ?t WHERE { ?s :label ?o . "
                'BIND(SUBSTR(STR(?o), "x") AS ?t) }',
                tdict,
            )
        with pytest.raises(SparqlSyntaxError, match="string literal"):
            sparql_to_df(
                tstore,
                "SELECT ?t WHERE { ?s :label ?o . "
                "BIND(STRBEFORE(STR(?o), ?o) AS ?t) }",
                tdict,
            )
        with pytest.raises(SparqlSyntaxError, match="not in scope"):
            sparql_to_df(
                tstore,
                "SELECT ?t WHERE { ?s :label ?o . "
                "BIND(UCASE(STR(?zz)) AS ?t) }",
                tdict,
            )


def test_string_expr_bind_matches_duckdb(spark, sf_dir):
    """String-expression BIND over the REAL derived graph vs a DuckDB
    twin: extract the bare nation name out of the '"NAME (fr)"@fr'
    tagged-literal labels."""
    from rdfproject_msc_spark.registry import _dict, _store
    from rdfproject_msc_spark.sources.derived import (
        DICTIONARY_SQL,
        P_HAS_LABEL,
        TRIPLES_SQL,
    )
    from tests.oracle import assert_matches_oracle

    q = (
        "SELECT ?x ?t WHERE { ?x :hasLabel ?l . "
        'FILTER(LANGMATCHES(LANG(?l), "fr")) '
        'BIND(STRBEFORE(STRAFTER(STR(?l), "\\""), " (fr)") AS ?t) }'
    )
    df = sparql_to_df(_store(spark, sf_dir), q, _dict(spark, sf_dir))
    sql = f"""WITH triples AS ({TRIPLES_SQL}), dict AS ({DICTIONARY_SQL})
SELECT t.s AS x,
       substring(substr(d.term, 2), 1,
                 strpos(substr(d.term, 2), ' (fr)') - 1) AS t
FROM triples t JOIN dict d ON t.o = d.id
WHERE t.p = {P_HAS_LABEL} AND regexp_matches(d.term, '"@fr$')
"""
    assert_matches_oracle(df, sql, sf_dir)


def test_select_expression_accessors_and_casts(tstore, tdict):
    """SELECT expression items share the BIND classification (r7):
    accessors, casts and string manipulations compose in the projection
    exactly like in a written BIND — including nesting past the old
    one-paren-level projection grammar."""
    df = sparql_to_df(
        tstore,
        'SELECT ?o (CONCAT("[", UCASE(SUBSTR(STR(?o), 2, 4)), "]") AS ?t) '
        "(xsd:double(?o) AS ?v) WHERE { ?s :price ?o }",
        tdict,
    )
    got = {r.o: (r.t, r.v) for r in df.collect()}
    assert got[7] == ("[19.5]", 19.5)
    assert got[43] == ("[3]", 43.0)
    assert got[9] == ("[2024]", None)  # dateTime: double cast errors
    df2 = sparql_to_df(
        tstore,
        "SELECT (STR(?o) AS ?t) WHERE { ?s :label ?o . "
        'FILTER(LANG(?o) = "en") }',
        tdict,
    )
    assert [r.t for r in df2.collect()] == ['"chat"@en']


def test_bind_strlen(tstore, tdict):
    """BIND(STRLEN(STR(?x)) AS ?n) (r7): numeric term-text length,
    usable downstream like any integer BIND target."""
    df = sparql_to_df(
        tstore,
        "SELECT ?o ?n WHERE { ?s :label ?o . "
        "BIND(STRLEN(STR(?o)) AS ?n) FILTER(?n > 8) }",
        tdict,
    )
    got = sorted((r.o, r.n) for r in df.collect())
    # '"chat"@en'=9, '"2024-01-01"^^:date'=19, '"hi"@en-us'=10
    assert got == [(2, 9), (5, 19), (6, 10)]
    # integer literal: STR is the decimal form, STRLEN counts digits
    df2 = sparql_to_df(
        tstore,
        "SELECT (STRLEN(?o) AS ?n) WHERE { ?s :price ?o . "
        "FILTER(?o = 43) }",
        tdict,
    )
    assert [r.n for r in df2.collect()] == [2]


def test_filter_string_expression_comparisons(tstore, tdict):
    """String-expression comparisons in FILTER (r7): the §17.4.3 chains
    compare against a literal — codepoint semantics, dictionary-side."""
    assert _objs(
        tstore, tdict, 'STRAFTER(STR(?o), "\\"@") = "en"'
    ) == [2]
    assert _objs(
        tstore, tdict, 'CONCAT("<", STR(?o), ">") = "<hello>"'
    ) == [4]
    assert _objs(
        tstore, tdict, 'UCASE(SUBSTR(STR(?o), 1, 1)) = "H"'
    ) == [4]
    # ordering comparison: codepoint (binary) order — only 'hello'
    # starts ≥ 'a' (quoted/IRI/integer STR forms start '"', ':', digits)
    assert _objs(
        tstore, tdict, 'SUBSTR(STR(?o), 1, 1) >= "a"'
    ) == [4]


def test_aggregates_over_str(tstore, tdict):
    """Aggregates over the DECODED term (r7): GROUP_CONCAT/MIN/MAX/
    SAMPLE get string semantics, COUNT counts bound solutions."""
    df = sparql_to_df(
        tstore,
        "SELECT ?s (GROUP_CONCAT(STR(?o)) AS ?all) "
        "(MIN(STR(?o)) AS ?lo) (MAX(STR(?o)) AS ?hi) "
        "(COUNT(STR(?o)) AS ?n) WHERE { ?s :price ?o } GROUP BY ?s",
        tdict,
    )
    r = df.collect()[0]
    # STR values: '"19.5"^^:decimal', '"120.25"^^:double',
    # '"2024-01-01T10:30:00"^^:dateTime', '43' — sorted codepoint order
    assert r["lo"] == '"120.25"^^:double'
    assert r["hi"] == "43"
    assert r["n"] == 4
    assert r["all"].split(" ")[0] == '"120.25"^^:double'
    # numeric aggregates over STR reject
    with pytest.raises(SparqlSyntaxError, match="not numeric"):
        sparql_to_df(
            tstore,
            "SELECT (SUM(STR(?o)) AS ?x) WHERE { ?s :price ?o }",
            tdict,
        )


def test_group_concat_str_matches_duckdb(spark, sf_dir):
    """GROUP_CONCAT(STR(?lbl)) per nation vs DuckDB string_agg over the
    decoded dictionary terms."""
    from rdfproject_msc_spark.registry import _dict, _store
    from rdfproject_msc_spark.sources.derived import (
        DICTIONARY_SQL,
        P_HAS_LABEL,
        TRIPLES_SQL,
    )
    from tests.oracle import assert_matches_oracle

    q = (
        "SELECT ?x (GROUP_CONCAT(STR(?l)) AS ?labels) "
        "WHERE { ?x :hasLabel ?l } GROUP BY ?x"
    )
    df = sparql_to_df(_store(spark, sf_dir), q, _dict(spark, sf_dir))
    sql = f"""WITH triples AS ({TRIPLES_SQL}), dict AS ({DICTIONARY_SQL})
SELECT t.s AS x, string_agg(d.term, ' ' ORDER BY d.term) AS labels
FROM triples t JOIN dict d ON t.o = d.id
WHERE t.p = {P_HAS_LABEL}
GROUP BY t.s
"""
    assert_matches_oracle(df, sql, sf_dir)


def test_hash_functions(tstore, tdict):
    """MD5/SHA1/SHA256/... (§17.4.4, r7) in BIND and FILTER — lowercase
    hex over the STR value, cross-checked against hashlib."""
    import hashlib

    df = sparql_to_df(
        tstore,
        "SELECT ?o (MD5(STR(?o)) AS ?h) (SHA256(STR(?o)) AS ?h2) "
        "WHERE { ?s :label ?o . FILTER(isLiteral(?o) && LANG(?o) = \"\") }",
        tdict,
    )
    got = {r.o: (r.h, r.h2) for r in df.collect()}
    for oid, text in ((4, "hello"), (42, "42")):
        assert got[oid] == (
            hashlib.md5(text.encode()).hexdigest(),
            hashlib.sha256(text.encode()).hexdigest(),
        )
    # usable as a FILTER comparison leaf
    h = hashlib.md5(b"hello").hexdigest()
    assert _objs(tstore, tdict, f'MD5(STR(?o)) = "{h}"') == [4]


def test_hash_matches_duckdb(spark, sf_dir):
    from rdfproject_msc_spark.registry import _dict, _store
    from rdfproject_msc_spark.sources.derived import (
        DICTIONARY_SQL,
        P_HAS_LABEL,
        TRIPLES_SQL,
    )
    from tests.oracle import assert_matches_oracle

    q = (
        "SELECT ?x (MD5(STR(?l)) AS ?h) WHERE { ?x :hasLabel ?l . "
        'FILTER(LANGMATCHES(LANG(?l), "en")) }'
    )
    df = sparql_to_df(_store(spark, sf_dir), q, _dict(spark, sf_dir))
    sql = f"""WITH triples AS ({TRIPLES_SQL}), dict AS ({DICTIONARY_SQL})
SELECT t.s AS x, md5(d.term) AS h
FROM triples t JOIN dict d ON t.o = d.id
WHERE t.p = {P_HAS_LABEL} AND regexp_matches(d.term, '"@en(-[a-z0-9]+)*$')
"""
    assert_matches_oracle(df, sql, sf_dir)


def test_explicit_cast_filter_comparisons(tstore, tdict):
    """xsd:T(?x) as a FILTER comparison operand (r7): the cast VALUE
    compares against a matching-family constant — so plain-lexical and
    integer-literal values participate (unlike the direct-var valcmp,
    where non-typed kinds are errors)."""
    # :price objects: 19.5(dec), 120.25(dbl), dateTime, 43(int literal)
    assert _prices(tstore, tdict, "xsd:double(?o) > 20.0") == [8, 43]
    # decimal→integer truncates toward zero: 19.5 → 19
    assert _prices(tstore, tdict, "xsd:integer(?o) = 19") == [7]
    assert _prices(tstore, tdict, "xsd:integer(STR(?o)) >= 43") == [8, 43]
    assert _prices(
        tstore, tdict,
        'xsd:dateTime(?o) >= "2024-01-01T00:00:00"^^xsd:dateTime',
    ) == [9]
    # :label: the PLAIN literal 'hello' has no numeric lexical (NULL),
    # the integer literal 42 casts to itself
    assert _objs(tstore, tdict, "xsd:double(?o) > 0.0") == [42]
    with pytest.raises(SparqlSyntaxError, match="non-date"):
        _prices(tstore, tdict, 'xsd:date(?o) > 5.0')


def test_pathological_lexicals_are_errors_not_crashes(spark):
    """Shape-valid but semantically-invalid lexicals ("2020-13-45" date,
    long-overflow integers, overflow doubles) must be SPARQL type
    errors (NULL → drop / unbound), never ANSI runtime exceptions."""
    st_ = TripleStore(
        spark.createDataFrame(
            [(1, 10, 21), (1, 10, 22), (1, 10, 23)],
            "s long, p long, o long",
        )
    )
    d = Dictionary(
        spark.createDataFrame(
            [
                (10, ":p"),
                (21, '"2020-13-45"^^:date'),
                (22, "9" * 30),          # plain literal, overflows long
                (23, '"1.5"^^:decimal'),
            ],
            "id long, term string",
        )
    )
    out = sparql_to_df(
        st_,
        'SELECT ?o WHERE { ?s :p ?o . '
        'FILTER(?o >= "2020-01-01"^^xsd:date) }',
        d,
    )
    assert out.collect() == []  # invalid date = error, no crash
    binds = sparql_to_df(
        st_,
        "SELECT ?o ?n ?dt WHERE { ?s :p ?o . "
        "BIND(xsd:integer(?o) AS ?n) BIND(xsd:date(?o) AS ?dt) }",
        d,
    )
    got = {r.o: (r.n, r.dt) for r in binds.collect()}
    assert got[21] == (None, None)
    assert got[22] == (None, None)  # overflow → cast error → unbound
    assert got[23] == (1, None)


def test_value_cmp_full_iri_datatype(tstore, tdict):
    """Typed constants with full-IRI datatypes localize like every IRI:
    "…"^^<http://www.w3.org/2001/XMLSchema#date> ≡ xsd:date."""
    labs = sparql_to_df(
        tstore,
        'SELECT ?o WHERE { ?s :label ?o . FILTER(?o >= '
        '"2024-01-01"^^<http://www.w3.org/2001/XMLSchema#date>) }',
        tdict,
    )
    assert sorted(r.o for r in labs.collect()) == [5]


def test_string_coalesce_bind(tstore, tdict):
    """COALESCE over string expressions (§17.4.1.3, r7): the
    post-OPTIONAL fallback idiom — first non-error value wins; the
    numeric COALESCE grammar is untouched."""
    df = sparql_to_df(
        tstore,
        "SELECT ?s ?t WHERE { ?s :label 42 . "
        "OPTIONAL { ?s :missing ?m } "
        'BIND(COALESCE(STR(?m), "none") AS ?t) }',
        Dictionary(
            tdict.df.sparkSession.createDataFrame(
                DICT + [(99, ":missing")], "id long, term string"
            )
        ),
    )
    assert [(r.s, r.t) for r in df.collect()] == [(1, "none")]
    # numeric COALESCE still parses as arithmetic
    df2 = sparql_to_df(
        tstore,
        "SELECT ?o ?n WHERE { ?s :price ?o . "
        "BIND(COALESCE(?o, 0) AS ?n) }",
        tdict,
    )
    assert all(r.o == r.n for r in df2.collect())


def test_string_if_bind(tstore, tdict):
    """String IF (§17.4.1.2, r7): numeric/BOUND condition, string
    branches; an ERROR condition errors the IF (unbound target)."""
    df = sparql_to_df(
        tstore,
        "SELECT ?o ?t WHERE { ?s :price ?o . "
        'BIND(IF(?o > 20, "big", CONCAT("small:", STR(?o))) AS ?t) }',
        tdict,
    )
    got = {r.o: r.t for r in df.collect()}
    assert got[43] == "big"
    assert got[7] == 'small:"19.5"^^:decimal'
    # unbound condition var → error → unbound target
    df2 = sparql_to_df(
        tstore,
        "SELECT ?s ?t WHERE { ?s :label 42 . "
        "OPTIONAL { ?s :price ?m . FILTER(?m > 10000.0) } "
        'BIND(IF(?m > 0, "y", "n") AS ?t) }',
        tdict,
    )
    assert [(r.s, r.t) for r in df2.collect()] == [(1, None)]
    # numeric IF still parses as arithmetic
    df3 = sparql_to_df(
        tstore,
        "SELECT ?o ?n WHERE { ?s :price ?o . "
        "BIND(IF(?o > 20, 1, 0) AS ?n) }",
        tdict,
    )
    got3 = {r.o: r.n for r in df3.collect()}
    assert got3[43] == 1 and got3[7] == 0


def test_datetime_accessor_filters(tstore, tdict):
    """§17.4.5 YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS comparisons (r7):
    valid on date AND dateTime typed literals; calendar-invalid lexicals
    and non-temporal kinds ERROR → drop at both polarities."""
    def when_objs(flt):
        df = sparql_to_df(
            tstore,
            f"SELECT ?d WHERE {{ ?s :when ?d . FILTER({flt}) }}",
            tdict,
        )
        return sorted(r.d for r in df.collect())

    # 5="2024-01-01"^^:date, 9="2024-01-01T10:30:00"^^:dateTime,
    # 14="2023-06-15"^^:date; 12 is "2024-13-99"^^:date (invalid), 43 an
    # integer literal — both ERROR out under every polarity
    assert when_objs("YEAR(?d) = 2024") == [5, 9]
    assert when_objs("YEAR(?d) != 2024") == [14]
    assert when_objs("YEAR(?d) >= 2024") == [5, 9]
    assert when_objs("MONTH(?d) = 6") == [14]
    assert when_objs("DAY(?d) <= 1") == [5, 9]
    # HOURS/MINUTES/SECONDS are dateTime-only — dates ERROR too
    assert when_objs("HOURS(?d) = 10") == [9]
    assert when_objs("MINUTES(?d) = 30") == [9]
    assert when_objs("SECONDS(?d) = 0") == [9]


def test_datetime_accessor_binds(tstore, tdict):
    """BIND(YEAR(?d) AS ?y): numeric VALUE column; error → unbound."""
    df = sparql_to_df(
        tstore,
        "SELECT ?d ?y ?m WHERE { ?s :when ?d . "
        "BIND(YEAR(?d) AS ?y) BIND(MONTH(?d) AS ?m) }",
        tdict,
    )
    got = {r.d: (r.y, r.m) for r in df.collect()}
    assert got[5] == (2024, 1)
    assert got[9] == (2024, 1)
    assert got[14] == (2023, 6)
    assert got[12] == (None, None)  # calendar-invalid lexical
    assert got[43] == (None, None)  # integer literal: not temporal


def test_seconds_fraction(tstore, tdict):
    """SECONDS returns xsd:decimal INCLUDING the fraction (§17.4.5.6)."""
    df = sparql_to_df(
        tstore,
        "SELECT ?d ?sec WHERE { ?s :delta ?d . BIND(SECONDS(?d) AS ?sec) }",
        tdict,
    )
    got = {r.d: r.sec for r in df.collect()}
    assert got[18] == 59.75
    assert got[15] is None and got[17] is None  # decimals: not temporal


def test_floor_ceil_round(tstore, tdict):
    """§17.4.4.1-3 over the numeric VALUE; ROUND ties toward +INF
    (round(-2.5) = -2, round(2.5) = 3 — NOT half-away-from-zero)."""
    df = sparql_to_df(
        tstore,
        "SELECT ?p ?f ?c ?r WHERE { ?s :price ?p . "
        "BIND(FLOOR(?p) AS ?f) BIND(CEIL(?p) AS ?c) "
        "BIND(ROUND(?p) AS ?r) }",
        tdict,
    )
    got = {r.p: (r.f, r.c, r.r) for r in df.collect()}
    assert got[7] == (19.0, 20.0, 20.0)     # "19.5"^^:decimal
    assert got[8] == (120.0, 121.0, 120.0)  # "120.25"^^:double
    assert got[43] == (43.0, 43.0, 43.0)    # integer literal
    assert got[9] == (None, None, None)     # dateTime: not numeric
    # spec tie-break: toward positive infinity
    df2 = sparql_to_df(
        tstore,
        "SELECT ?p ?r WHERE { ?s :delta ?p . BIND(ROUND(?p) AS ?r) }",
        tdict,
    )
    got2 = {r.p: r.r for r in df2.collect()}
    assert got2[15] == -2.0 and got2[17] == 3.0
    # FILTER form rides castcmp
    df3 = sparql_to_df(
        tstore,
        "SELECT ?p WHERE { ?s :price ?p . FILTER(FLOOR(?p) = 19) }",
        tdict,
    )
    assert [r.p for r in df3.collect()] == [7]


def test_accessor_order_by(tstore, tdict):
    """ORDER BY YEAR(?d) / DESC(DAY(?d)): accessor-VALUE sort keys;
    errors sort as NULL (first ASC, per Spark nulls-first default)."""
    df = sparql_to_df(
        tstore,
        "SELECT ?d WHERE { ?s :when ?d } ORDER BY YEAR(?d) ?d",
        tdict,
    )
    order = [r.d for r in df.collect()]
    # NULL-key rows (12, 43) first, then 2023's 14, then 2024's 5, 9
    assert order == [12, 43, 14, 5, 9]


def test_term_constructors(tstore, tdict):
    """IRI/STRLANG/STRDT construct canonical dictionary TERM text and
    ENCODE_FOR_URI percent-encodes per RFC 3986 (§17.4.2.6-9,
    §17.4.3.11). IRI localizes like every constant IRI in a query
    (last '/'-segment, leading ':'), so constructed terms match stored
    dictionary entries."""
    df = sparql_to_df(
        tstore,
        'SELECT DISTINCT ?e ?l ?d ?i ?f WHERE { ?s :label ?o . '
        'BIND(ENCODE_FOR_URI("a b~c*/d é") AS ?e) '
        'BIND(STRLANG("chat", "EN") AS ?l) '
        'BIND(STRDT("19.5", xsd:decimal) AS ?d) '
        'BIND(IRI(CONCAT("http://example.org/xyz/", "alice")) AS ?i) '
        'BIND(URI(":already") AS ?f) }',
        tdict,
    )
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.e == "a%20b~c%2A%2Fd%20%C3%A9"
    assert r.l == '"chat"@en'       # tag lowercased, canonical form
    assert r.d == '"19.5"^^:decimal'
    assert r.i == ":alice"          # localized: matches the dict entry
    assert r.f == ":already"        # already-local form passes through


def test_term_constructor_composition(tstore, tdict):
    """Constructors compose with the rest of the string grammar and
    NULL-propagate: IRI(STR(?s)) reproduces the subject's own term."""
    df = sparql_to_df(
        tstore,
        "SELECT ?s ?j WHERE { ?s :label ?o . BIND(IRI(STR(?s)) AS ?j) }",
        tdict,
    )
    for r in df.collect():
        assert r.j == ":alice"  # every :label subject is 1 = :alice
    # a nested group's outer-var reference: STRLANG over unbound → NULL
    df2 = sparql_to_df(
        tstore,
        "SELECT ?s ?t WHERE { ?s :label ?o . "
        '{ ?s :price ?p . BIND(STRLANG(STR(?zz), "en") AS ?t) } }',
        tdict,
    )
    got = df2.collect()
    assert got and all(r.t is None for r in got)


def test_sameterm_filter(tstore, tdict):
    """sameTerm(?a, ?b) (§17.4.1.8) is id equality in the encoded model;
    !sameTerm negates; constant operands reject with guidance."""
    df = sparql_to_df(
        tstore,
        "SELECT ?a ?b WHERE { ?x :price ?a . ?y :price ?b . "
        "FILTER(sameTerm(?a, ?b)) }",
        tdict,
    )
    got = sorted((r.a, r.b) for r in df.collect())
    assert got == [(7, 7), (8, 8), (9, 9), (43, 43)]
    df2 = sparql_to_df(
        tstore,
        "SELECT ?a ?b WHERE { ?x :price ?a . ?y :price ?b . "
        "FILTER(!sameTerm(?a, ?b)) }",
        tdict,
    )
    assert df2.count() == 12  # 4x4 minus the diagonal
    with pytest.raises(SparqlSyntaxError, match="sameTerm"):
        parse_sparql(
            'SELECT ?a WHERE { ?x :price ?a . FILTER(sameTerm(?a, "x")) }'
        )


def test_group_by_expression_keys(tstore, tdict):
    """GROUP BY (expr AS ?v) (§11.2 GroupCondition, r7) desugars onto
    the BIND machinery: the expression computes per solution row, the
    key is the alias variable, and error rows (calendar-invalid date,
    non-temporal term) land in the NULL group together."""
    df = sparql_to_df(
        tstore,
        "SELECT ?y (COUNT(*) AS ?n) WHERE { ?s :when ?d } "
        "GROUP BY (YEAR(?d) AS ?y)",
        tdict,
    )
    got = sorted((tuple(r) for r in df.collect()), key=str)
    # 2024: date 5 + dateTime 9; 2023: date 14; NULL: invalid 12 + int 43
    assert got == [(2023, 1), (2024, 2), (None, 2)]
    # mixed plain + expression keys, and HAVING over the computed VALUE
    df = sparql_to_df(
        tstore,
        "SELECT ?y (COUNT(*) AS ?n) WHERE { ?s :when ?d } "
        "GROUP BY (YEAR(?d) AS ?y) HAVING(?y >= 2024)",
        tdict,
    )
    assert [tuple(r) for r in df.collect()] == [(2024, 2)]
    # string-expression keys work too (term-text SUBSTR months)
    df = sparql_to_df(
        tstore,
        "SELECT ?m (COUNT(*) AS ?n) WHERE { ?s :when ?d } "
        "GROUP BY (MONTH(?d) AS ?m)",
        tdict,
    )
    got = sorted((tuple(r) for r in df.collect()), key=str)
    assert got == [(1, 2), (6, 1), (None, 2)]
    # a bare parenthesized expression has no projectable name
    with pytest.raises(SparqlSyntaxError, match="need a name"):
        parse_sparql(
            "SELECT ?y (COUNT(*) AS ?n) WHERE { ?s :when ?d } "
            "GROUP BY (YEAR(?d))"
        )
    # the alias must be fresh (shadowing a pattern var would clobber it)
    with pytest.raises(SparqlSyntaxError, match="already bound"):
        parse_sparql(
            "SELECT ?d (COUNT(*) AS ?n) WHERE { ?s :when ?d } "
            "GROUP BY (YEAR(?d) AS ?d)"
        )
    # expression variables must be in scope (typo guard holds)
    with pytest.raises(SparqlSyntaxError, match="not in scope"):
        parse_sparql(
            "SELECT ?y (COUNT(*) AS ?n) WHERE { ?s :when ?d } "
            "GROUP BY (YEAR(?zz) AS ?y)"
        )


def test_aggregates_over_casts(tstore, tdict):
    """Cast / accessor aggregate args (r7): `SUM(xsd:decimal(?p))`,
    `MIN(xsd:date(?d))`, `AVG(DISTINCT YEAR(?d))` — the typed VALUE
    computes per solution row (synthetic BIND), errors → NULL → skipped
    by the null-skipping aggregates (§11's error-removing card[...])."""
    df = sparql_to_df(
        tstore,
        "SELECT ?s (SUM(xsd:decimal(?p)) AS ?t) "
        "(COUNT(xsd:decimal(?p)) AS ?n) WHERE { ?s :price ?p } GROUP BY ?s",
        tdict,
    )
    # 19.5 + 120.25 + integer-literal 43; the dateTime object errors out
    assert [tuple(r) for r in df.collect()] == [(1, 182.75, 3)]
    df = sparql_to_df(
        tstore,
        "SELECT (MIN(xsd:date(?d)) AS ?lo) (MAX(xsd:date(?d)) AS ?hi) "
        "WHERE { ?s :when ?d }",
        tdict,
    )
    import datetime
    assert [tuple(r) for r in df.collect()] == [
        (datetime.date(2023, 6, 15), datetime.date(2024, 1, 1))
    ]
    # DISTINCT composes with the desugared arg
    df = sparql_to_df(
        tstore,
        "SELECT (AVG(DISTINCT YEAR(?d)) AS ?a) WHERE { ?s :when ?d }",
        tdict,
    )
    assert [tuple(r) for r in df.collect()] == [(2023.5,)]
    # GROUP_CONCAT(xsd:string(?d)) concatenates term TEXT (the engine's
    # STR convention), sorted for determinism
    df = sparql_to_df(
        tstore,
        'SELECT (GROUP_CONCAT(xsd:string(?d)) AS ?g) '
        'WHERE { ?s :when ?d . FILTER(MONTH(?d) = 1) }',
        tdict,
    )
    assert [tuple(r) for r in df.collect()] == [
        ('"2024-01-01"^^:date "2024-01-01T10:30:00"^^:dateTime',)
    ]
    # temporal / string args are not summable
    with pytest.raises(SparqlSyntaxError, match="not numeric"):
        parse_sparql(
            "SELECT (SUM(xsd:date(?d)) AS ?t) WHERE { ?s :when ?d }"
        )
    with pytest.raises(SparqlSyntaxError, match="not numeric"):
        parse_sparql(
            "SELECT (AVG(xsd:string(?d)) AS ?t) WHERE { ?s :when ?d }"
        )


def test_computed_keys_reject_term_semantics(tstore, tdict):
    """A computed variable (BIND target / expression key) is a VALUE,
    not a dictionary id — term-semantics positions over it reject
    rather than join the dictionary against unrelated ids (r7)."""
    with pytest.raises(SparqlSyntaxError, match="pattern-bound key"):
        parse_sparql(
            "SELECT ?y (COUNT(*) AS ?n) WHERE { ?s :when ?d } "
            'GROUP BY (YEAR(?d) AS ?y) HAVING(STR(?y) = "2024")'
        )
    with pytest.raises(SparqlSyntaxError, match="pattern-bound key"):
        parse_sparql(
            "SELECT ?y (COUNT(*) AS ?n) WHERE { ?s :when ?d } "
            "GROUP BY (YEAR(?d) AS ?y) HAVING(STRLEN(?y) > 2)"
        )
    with pytest.raises(SparqlSyntaxError, match="pattern-bound"):
        parse_sparql(
            "SELECT (GROUP_CONCAT(STR(?y)) AS ?g) "
            "WHERE { ?s :when ?d . BIND(YEAR(?d) AS ?y) }"
        )
    with pytest.raises(SparqlSyntaxError, match="pattern-bound"):
        parse_sparql(
            "SELECT ?y WHERE { ?s :when ?d . BIND(YEAR(?d) AS ?y) } "
            "ORDER BY STR(?y)"
        )
    with pytest.raises(SparqlSyntaxError, match="pattern-bound"):
        parse_sparql(
            "SELECT ?y WHERE { ?s :when ?d . BIND(YEAR(?d) AS ?y) } "
            "ORDER BY xsd:integer(?y)"
        )
