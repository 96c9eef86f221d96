"""W3C rdf-tests manifest harness (r12).

Runs every ``manifest.ttl`` under ``tests/w3c/`` exactly the way the
official rdf-tests harnesses do: the manifest is RDF (parsed with the
engine's OWN Turtle reader — the mf:entries list exercises the r11
collections support), each entry names a test type, an action (query
file + data file) and an expected result (``.srx`` results-XML for
SELECT/ASK, ``.ttl`` graph for CONSTRUCT), and the runner compares
decoded engine output against the expected document under solution-
multiset semantics (ordered only when the query orders) with
blank-node-isomorphism canonicalization and numeric-literal VALUE
normalization (engines legitimately differ on canonical lexical forms
— ``1.0`` vs ``1.0E0`` — so numeric-typed literals compare by value,
everything else by term).

The vendored files under ``tests/w3c/`` are a TRANSCRIBED subset of
the public W3C rdf-tests suites (data-r2 + data-sparql11), kept in
the official on-disk format — manifest vocabulary
(``mf:``/``qt:``/``dawgt:``), per-suite directories, ``.rq`` query
files, ``.srx``/``.ttl`` results — so the full official suites can be
dropped in unchanged when a network is available (this container has
none). Transcription notes live in ``tests/w3c/README.md``.

Engine deviations documented in SPARQL.md are encoded as NAMED
rejects (``REJECTS`` below): those entries must raise with the
documented message — a silent wrong answer fails the harness, a
documented reject does not. The tally test pins the split; SPARQL.md
mirrors it.
"""

from __future__ import annotations

import glob
import os
import re
import xml.etree.ElementTree as ET

import pytest

from rdfproject_msc_spark.engine import Engine
from rdfproject_msc_spark.sparql.parser import parse_sparql

W3C_DIR = os.path.join(os.path.dirname(__file__), "w3c")

MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
UT = "http://www.w3.org/2009/sparql/tests/test-update#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SRX = "http://www.w3.org/2005/sparql-results#"
XMLNS = "http://www.w3.org/XML/1998/namespace"

# entry local-name → reject-message pattern: the engine's DOCUMENTED
# deviations (SPARQL.md "Known deviations"). Every other entry must
# produce the expected answer exactly.
REJECTS: dict[str, str] = {}

# numeric datatypes whose literals compare by VALUE (canonical lexical
# forms legitimately differ across engines)
_NUMERIC = {
    f"{XSD}integer", f"{XSD}decimal", f"{XSD}double", f"{XSD}float",
    f"{XSD}int", f"{XSD}long", f"{XSD}nonNegativeInteger",
}


# ---------------------------------------------------------------------------
# manifest discovery (module import time — file parsing only, no Spark)
# ---------------------------------------------------------------------------


def _nt_escape(value: str) -> str:
    out = (
        value.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )
    return out


def _parse_manifest_text(text: str, base_dir: str) -> list[dict]:
    """A tiny driver-side Turtle reader for the MANIFEST subset
    (prefixed names, IRIs, literals, bnode property lists, one
    collection after mf:entries). Manifests are index files — a few
    hundred triples — so this is deliberately driver-side; the DATA
    files go through the engine's distributed readers."""
    prefixes: dict[str, str] = {}
    triples: list[tuple[str, str, str]] = []
    anon = [0]

    pos = [0]
    n = len(text)

    def skip_ws():
        while pos[0] < n:
            c = text[pos[0]]
            if c == "#":
                while pos[0] < n and text[pos[0]] != "\n":
                    pos[0] += 1
            elif c.isspace():
                pos[0] += 1
            else:
                return

    def token() -> str:
        skip_ws()
        i = pos[0]
        if i >= n:
            raise ValueError("unexpected EOF in manifest")
        c = text[i]
        if c in "()[];,.":
            pos[0] += 1
            return c
        if c == "<":
            j = text.index(">", i)
            pos[0] = j + 1
            return text[i : j + 1]
        if c == '"':
            j = i + 1
            while text[j] != '"':
                j += 2 if text[j] == "\\" else 1
            pos[0] = j + 1
            return text[i : j + 1]
        m = re.match(r"[^\s()\[\];,.]+", text[i:])
        pos[0] = i + m.end()
        return m.group(0)

    def peek() -> str:
        saved = pos[0]
        t = token()
        pos[0] = saved
        return t

    def expand(tok: str) -> str:
        if tok.startswith("<"):
            return f"<{tok[1:-1]}>"
        if tok.startswith('"'):
            return tok
        if tok == "a":
            return f"<{RDF}type>"
        pfx, _, local = tok.partition(":")
        if pfx in prefixes:
            return f"<{prefixes[pfx]}{local}>"
        return tok

    def fresh() -> str:
        anon[0] += 1
        return f"_:m{anon[0]}"

    def read_object() -> str:
        t = peek()
        if t == "[":
            token()
            node = fresh()
            if peek() != "]":
                read_po_list(node)
            assert token() == "]"
            return node
        if t == "(":
            token()
            cells = []
            while peek() != ")":
                cells.append(read_object())
            token()
            head = f"<{RDF}nil>"
            for value in reversed(cells):
                cell = fresh()
                triples.append((cell, f"<{RDF}first>", value))
                triples.append((cell, f"<{RDF}rest>", head))
                head = cell
            return head
        return expand(token())

    def read_po_list(subject: str) -> None:
        while True:
            p = expand(token())
            while True:
                o = read_object()
                triples.append((subject, p, o))
                if peek() == ",":
                    token()
                    continue
                break
            t = peek()
            if t == ";":
                token()
                if peek() in ("]", "."):
                    return
                continue
            return

    while True:
        skip_ws()
        if pos[0] >= n:
            break
        t = token()
        if t in ("@prefix", "PREFIX"):
            name = token().rstrip(":")
            iri = token()
            prefixes[name] = iri[1:-1]
            if peek() == ".":
                token()
            continue
        if t == "@base":
            raise ValueError("@base is not used in vendored manifests")
        subject = expand(t) if t != "[" else fresh()
        read_po_list(subject)
        assert token() == "."

    # index triples and walk the manifest graph
    spo: dict[tuple[str, str], list[str]] = {}
    for s, p, o in triples:
        spo.setdefault((s, p), []).append(o)

    def one(s: str, p: str) -> str | None:
        v = spo.get((s, f"<{p}>"))
        return v[0] if v else None

    def walk_list(head: str) -> list[str]:
        out = []
        while head and head != f"<{RDF}nil>":
            out.append(one(head, f"{RDF}first"))
            head = one(head, f"{RDF}rest")
        return out

    manifest = next(
        s
        for (s, p), os_ in spo.items()
        if p == f"<{RDF}type>" and f"<{MF}Manifest>" in os_
    )
    entries = []
    for node in walk_list(one(manifest, f"{MF}entries")):
        etype = one(node, f"{RDF}type") or ""
        name_lit = one(node, f"{MF}name") or '""'
        action = one(node, f"{MF}action")
        query = data = None
        graph_data: list[str] = []
        if action and action.startswith("_:"):
            query = one(action, f"{QT}query") or one(action, f"{UT}request")
            data = one(action, f"{QT}data") or one(action, f"{UT}data")
            # (file-term, graph-name-term) pairs: query-vocabulary
            # graphs are named by their source IRI as written;
            # update-vocabulary ut:graphData is a bnode carrying
            # ut:graph <file> + rdfs:label "name"
            graph_data = [
                (g, g) for g in spo.get((action, f"<{QT}graphData>"), [])
            ]
            for gd in spo.get((action, f"<{UT}graphData>"), []):
                graph_data.append(
                    (
                        one(gd, f"{UT}graph"),
                        "<" + (one(gd, f"{RDFS}label") or '""').strip('"')
                        + ">",
                    )
                )
        else:
            query = action  # syntax tests: the action IS the query file
        result = one(node, f"{MF}result")
        result_data = None
        result_graphs: list[tuple] = []
        if result is not None and result.startswith("_:"):
            # UpdateEvaluationTest: the result is the POST state — a
            # default graph and/or named graphs
            result_data = one(result, f"{UT}data")
            for gd in spo.get((result, f"<{UT}graphData>"), []):
                result_graphs.append(
                    (
                        one(gd, f"{UT}graph"),
                        "<" + (one(gd, f"{RDFS}label") or '""').strip('"')
                        + ">",
                    )
                )
            result = None

        def rel(term):
            if term is None or not term.startswith("<"):
                return None
            iri = term[1:-1]
            if "://" in iri:
                return iri
            return os.path.join(base_dir, iri)

        local = node[1:-1].rsplit("#", 1)[-1] if node.startswith("<") else node
        entries.append(
            dict(
                id=local,
                type=etype,
                name=name_lit.strip('"'),
                query=rel(query),
                data=rel(data),
                # (path, graph-name-as-written) pairs — the spelling
                # the queries/requests use
                graph_data=[(rel(g), name) for g, name in graph_data],
                result=rel(result),
                result_data=rel(result_data),
                result_graphs=[
                    (rel(g), name) for g, name in result_graphs
                ],
                suite=os.path.basename(base_dir),
            )
        )
    return entries


def _discover() -> list[dict]:
    out = []
    for mpath in sorted(
        glob.glob(os.path.join(W3C_DIR, "**", "manifest.ttl"), recursive=True)
    ):
        with open(mpath, encoding="utf-8") as f:
            out.extend(_parse_manifest_text(f.read(), os.path.dirname(mpath)))
    return out


ENTRIES = _discover()
_IDS = [f"{e['suite']}:{e['id']}" for e in ENTRIES]


# ---------------------------------------------------------------------------
# expected-result readers
# ---------------------------------------------------------------------------


def _srx_term(binding_el) -> str:
    el = binding_el[0]
    tag = el.tag.rsplit("}", 1)[-1]
    if tag == "uri":
        return f"<{el.text or ''}>"
    if tag == "bnode":
        return f"_:{el.text}"
    body = _nt_escape(el.text or "")
    lang = el.get(f"{{{XMLNS}}}lang")
    dt = el.get("datatype")
    if dt:
        return f'"{body}"^^<{dt}>'
    if lang:
        return f'"{body}"@{lang}'
    return f'"{body}"'


def _read_srx(path: str):
    """→ (variables, solutions|None, boolean|None); a solution is a
    dict var→term (absent = unbound)."""
    root = ET.parse(path).getroot()
    head = root.find(f"{{{SRX}}}head")
    variables = [
        v.get("name") for v in head.findall(f"{{{SRX}}}variable")
    ] if head is not None else []
    b = root.find(f"{{{SRX}}}boolean")
    if b is not None:
        return variables, None, b.text.strip() == "true"
    sols = []
    for res in root.find(f"{{{SRX}}}results").findall(f"{{{SRX}}}result"):
        sol = {}
        for binding in res.findall(f"{{{SRX}}}binding"):
            sol[binding.get("name")] = _srx_term(binding)
        sols.append(sol)
    return variables, sols, None


# ---------------------------------------------------------------------------
# comparison: value-normalize numerics, canonicalize bnode labels
# ---------------------------------------------------------------------------

_LIT = re.compile(r'^"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>|@(\S+))?$')


def _norm(term):
    """Engine/expected term → comparable value. Numeric-typed literals
    (and bare Python numbers from VALUE columns — aggregates, BIND
    arithmetic) normalize to rounded floats; booleans to bools;
    everything else stays exact term text."""
    if term is None:
        return None
    if isinstance(term, bool):
        return term
    if isinstance(term, (int, float)):
        return round(float(term), 6)
    m = _LIT.match(term)
    if m:
        body, dt, lang = m.group(1), m.group(2), m.group(3)
        if dt in _NUMERIC:
            return round(float(body), 6)
        if dt == f"{XSD}boolean":
            return body in ("true", "1")
        if dt is None and lang is None:
            # PLAIN literal → its unescaped body: computed string
            # expressions (BIND/SELECT string functions) come back as
            # raw VALUE columns without term quoting, and both sides
            # must land on the same representation
            return (
                body.replace("\\\\", "\x00")
                .replace('\\"', '"')
                .replace("\\n", "\n")
                .replace("\\r", "\r")
                .replace("\\t", "\t")
                .replace("\x00", "\\")
            )
    return term


def _canon(solutions):
    """First-appearance bnode relabeling (solution-set isomorphism up
    to renaming — exact for the shapes vendored here)."""
    mapping: dict[str, str] = {}
    out = []
    for sol in solutions:
        new = {}
        for v, t in sol.items():
            if isinstance(t, str) and t.startswith("_:"):
                t = mapping.setdefault(t, f"_:c{len(mapping)}")
            new[v] = t
        out.append(new)
    return out


def _solset(solutions, ordered: bool):
    canon = _canon(solutions)
    key = lambda sol: repr(sorted(sol.items()))  # noqa: E731
    return canon if ordered else sorted(canon, key=key)


# ---------------------------------------------------------------------------
# the runner
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def w3c_engines(spark):
    """One lexical-store Engine per distinct dataset (ingested once
    through the raw-Turtle first mile). ``qt:graphData`` entries build
    a QUAD store through the shared encode back half
    (ntriples.encode_quad_relation — one dictionary over every term
    including graph labels), each graph named by its manifest-relative
    IRI exactly as the queries spell it."""
    cache: dict = {}

    def get(
        data_path: str | None, graph_data: tuple = (), fresh: bool = False
    ) -> Engine:
        """``fresh=True`` bypasses the cache — update tests MUTATE
        their engine (copy-on-write store swap), so each gets its
        own."""
        key = (data_path, tuple(graph_data))
        if not fresh and key in cache:
            return cache[key]
        if not graph_data:
            eng = Engine(spark).load_triples(
                data_path, fmt="ttl", on_error="fail"
            )
            if not fresh:
                cache[key] = eng
            return eng
        from pyspark.sql import functions as F

        from rdfproject_msc_spark.dictionary import Dictionary
        from rdfproject_msc_spark.sources import ntriples as NT
        from rdfproject_msc_spark.sources.turtle import parse_turtle
        from rdfproject_msc_spark.store import TripleStore

        parts = []
        if data_path:
            parts.append(
                parse_turtle(spark, data_path, on_error="fail").select(
                    F.lit(None).cast("string").alias("g_term"),
                    "s_term", "p_term", "o_term",
                )
            )
        for gpath, gname in graph_data:
            parts.append(
                parse_turtle(spark, gpath, on_error="fail").select(
                    F.lit(gname).alias("g_term"),
                    "s_term", "p_term", "o_term",
                )
            )
        parsed = parts[0]
        for p in parts[1:]:
            parsed = parsed.unionAll(p)
        triples, quads, d = NT.encode_quad_relation(parsed)
        eng = Engine(spark)
        eng.store = TripleStore(triples, layout="single")
        eng.store.attach_quads(quads)
        eng.store.register(spark, "w3c_graph_table")
        eng.dictionary = Dictionary(d, broadcast_hint=False)
        eng.term_style = "lexical"
        if not fresh:
            cache[key] = eng
        return eng

    return get


def _read(path: str) -> str:
    with open(path, encoding="utf-8") as f:
        return f.read()


@pytest.mark.parametrize("entry", ENTRIES, ids=_IDS)
def test_w3c(entry, spark, w3c_engines):
    etype = entry["type"]
    if etype.endswith(("PositiveSyntaxTest>", "PositiveSyntaxTest11>")):
        parse_sparql(_read(entry["query"]), term_style="lexical")
        return
    if etype.endswith(("NegativeSyntaxTest>", "NegativeSyntaxTest11>")):
        with pytest.raises(Exception):
            parse_sparql(_read(entry["query"]), term_style="lexical")
        return
    if etype.endswith("UpdateEvaluationTest>"):
        # the POST state is the assertion: apply the request to a
        # FRESH engine, then compare each specified graph (default +
        # named) against its expected document
        from rdfproject_msc_spark.sources.turtle import parse_turtle

        eng = w3c_engines(
            entry["data"], tuple(entry.get("graph_data") or ()), fresh=True
        )
        eng.update(_read(entry["query"]))

        def graph_rows(df, cols=("s", "p", "o")):
            return [
                {k: _norm(r[c]) for k, c in zip("spo", cols)}
                for r in df.collect()
            ]

        def expected_rows(path):
            return graph_rows(
                parse_turtle(spark, path, on_error="fail"),
                cols=("s_term", "p_term", "o_term"),
            )

        assert entry["result_data"], "update entries specify ut:data"
        got = graph_rows(
            eng.sparql("SELECT ?s ?p ?o WHERE { ?s ?p ?o }", decode=True)
        )
        assert _solset(got, False) == _solset(
            expected_rows(entry["result_data"]), False
        )
        for gpath, gname in entry.get("result_graphs") or ():
            got = graph_rows(
                eng.sparql(
                    f"SELECT ?s ?p ?o WHERE {{ GRAPH {gname} "
                    "{ ?s ?p ?o } }",
                    decode=True,
                )
            )
            assert _solset(got, False) == _solset(
                expected_rows(gpath), False
            ), f"graph {gname} mismatch"
        return
    assert etype.endswith("QueryEvaluationTest>"), f"unknown type {etype}"

    query = _read(entry["query"])
    eng = w3c_engines(entry["data"], tuple(entry.get("graph_data") or ()))
    if entry["id"] in REJECTS:
        with pytest.raises(Exception, match=REJECTS[entry["id"]]):
            eng.sparql(query, decode=True, strict_terms=False).collect()
        return
    df = eng.sparql(query, decode=True, strict_terms=False)

    if entry["result"].endswith(".ttl"):
        # CONSTRUCT: graph comparison via the engine's Turtle reader
        from rdfproject_msc_spark.sources.turtle import parse_turtle

        got = [
            {"s": r["s"], "p": r["p"], "o": r["o"]} for r in df.collect()
        ]
        want = [
            {"s": r["s_term"], "p": r["p_term"], "o": r["o_term"]}
            for r in parse_turtle(
                spark, entry["result"], on_error="fail"
            ).collect()
        ]
        got = [{k: _norm(v) for k, v in sol.items()} for sol in got]
        want = [{k: _norm(v) for k, v in sol.items()} for sol in want]
        assert _solset(got, False) == _solset(want, False)
        return

    variables, solutions, boolean = _read_srx(entry["result"])
    if boolean is not None:
        rows = df.collect()
        assert df.columns == ["ask"] and [r["ask"] for r in rows] == [
            boolean
        ]
        return
    ordered = bool(parse_sparql(query, term_style="lexical").order_by)
    got = [
        {
            v: _norm(r[v])
            for v in variables
            if v in df.columns and r[v] is not None
        }
        for r in df.collect()
    ]
    want = [
        {v: _norm(t) for v, t in sol.items()} for sol in solutions
    ]
    assert _solset(got, ordered) == _solset(want, ordered)


def test_w3c_tally():
    """The official-format score SPARQL.md's conformance table
    mirrors: every vendored entry runs; rejects are the NAMED
    documented deviations only."""
    assert len(ENTRIES) >= 40
    by_type = {"eval": 0, "syntax": 0}
    for e in ENTRIES:
        t = e["type"]
        by_type["eval" if "Evaluation" in t else "syntax"] += 1
    assert by_type["eval"] >= 30
    assert set(REJECTS) <= {e["id"] for e in ENTRIES}
