"""Minimal SPARQL SELECT/BGP parser (pure Python, no external deps).

Scope matches the reference's query surface (SURVEY.md §2.8): SELECT over a
basic graph pattern of triple patterns. The reference used Jena
(MyOpVisitorBase.java:49-50) but its visitor kept only the LAST pattern of a
multi-triple BGP (static-field overwrite bug, MyOpVisitorBase.java:34-46) —
we keep ALL patterns and join them (the intended semantics, per the example
query at MyOpVisitorBase.java:132-133).

Beyond the reference: solution modifiers (DISTINCT/ORDER BY/LIMIT/OFFSET),
numeric FILTER comparisons over encoded ids, OPTIONAL groups (left joins),
MINUS groups (left-anti joins), FILTER [NOT] EXISTS (semi/anti joins),
single-variable VALUES blocks (isin), one UNION block of group
alternatives (the
generalization of the reference translator's hand-emitted Positive UNION
ALL Negative, MyOpVisitorBase.java:106-123), and PREFIX expansion (the
reference's Jena front-end resolved prefixes before normalization,
MyOpVisitorBase.java:49,74-78). Out of scope, rejected explicitly:
property paths, nested groups, multiple UNION blocks, FILTERs inside
groups, non-comparison FILTER forms (SURVEY.md §7 risk list).

Term forms (normalization mirrors MyOpVisitorBase.java:74-78):
  ?x / $x          variable
  pfx:name         declared prefix → expanded to <iri+name>, then localized
  :name            undeclared prefix kept verbatim (the dictionary stores them so)
  <http://.../x>   IRI: angle brackets stripped, prefix up to last '/' dropped,
                   leading ':' ensured → matches dictionary terms like ':node_...'
  "literal"        quotes stripped
  123 / -123       already-encoded integer id (passes through, no lookup)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_UNSUPPORTED = re.compile(r"\b(GRAPH|SERVICE)\b", re.I)
# OPTIONAL groups: non-nested `OPTIONAL { ... }` → left join in the planner
_OPTIONAL = re.compile(r"\bOPTIONAL\s*\{([^{}]*)\}\s*\.?", re.I)
# MINUS groups: non-nested `MINUS { ... }` → left-anti join on shared vars
_MINUS = re.compile(r"\bMINUS\s*\{([^{}]*)\}\s*\.?", re.I)
# FILTER [NOT] EXISTS { ... } → left-semi / left-anti join on shared vars
_FILTER_EXISTS = re.compile(
    r"\bFILTER\s+(?P<neg>NOT\s+)?EXISTS\s*\{([^{}]*)\}\s*\.?", re.I
)
# single-variable VALUES block: inline bindings → an isin() filter the
# optimizer pushes into the scans (multi-variable VALUES is out of scope)
_VALUES = re.compile(r"\bVALUES\s+[?$](?P<var>\w+)\s*\{(?P<vals>[^{}]*)\}\s*\.?", re.I)
# one UNION chain of 2+ group alternatives: `{...} UNION {...} [UNION {...}]`
# → unionByName(allowMissingColumns) in the planner (the generalization of
# the reference translator's hand-emitted Positive UNION ALL Negative,
# MyOpVisitorBase.java:106-123)
_UNION_CHAIN = re.compile(r"\{[^{}]*\}(?:\s*UNION\s*\{[^{}]*\})+\s*\.?", re.I)
_BRACE_GROUP = re.compile(r"\{([^{}]*)\}")
# FILTER: numeric comparisons over variables — ?x OP (number | ?y).
# Comparisons act on the dictionary-encoded ids, which IS this engine's
# data model (the reference's own SQL compares encoded ids directly,
# PartitionQueryingSubject.java:130). Richer FILTER forms (regex, functions,
# boolean connectives) are rejected explicitly.
_FILTER = re.compile(r"\bFILTER\s*\(([^)]*)\)\s*\.?", re.I)
_FILTER_EXPR = re.compile(
    r"^\s*[?$](?P<var>\w+)\s*(?P<op><=|>=|!=|=|<|>)\s*"
    r"(?:(?P<num>-?\d+)|[?$](?P<var2>\w+))\s*$"
)
# tokens inside the BGP: quoted literal | <iri> | anything non-space
_TOKEN = re.compile(r'"[^"]*"|<[^>]*>|\S+')
_QUERY = re.compile(
    r"^\s*(?P<prefixes>(?:PREFIX\s+\S+\s*<[^>]*>\s*)*)"
    r"SELECT\s+(?P<distinct>DISTINCT\s+)?(?P<proj>\*|(?:[?$]\w+\s*)+)\s*"
    r"WHERE\s*\{(?P<bgp>.*)\}\s*(?P<mods>.*?)\s*$",
    re.I | re.S,
)
_PREFIX_DECL = re.compile(r"PREFIX\s+([\w.\-]*):\s*<([^>]*)>", re.I)
_ORDER = re.compile(
    r"ORDER\s+BY\s+(?P<keys>(?:(?:ASC|DESC)\s*\(\s*[?$]\w+\s*\)|[?$]\w+)(?:\s+(?:(?:ASC|DESC)\s*\(\s*[?$]\w+\s*\)|[?$]\w+))*)",
    re.I,
)
_ORDER_KEY = re.compile(r"(?:(?P<dir>ASC|DESC)\s*\(\s*)?[?$](?P<var>\w+)\s*\)?", re.I)
_LIMIT = re.compile(r"LIMIT\s+(?P<n>\d+)", re.I)
_OFFSET = re.compile(r"OFFSET\s+(?P<n>\d+)", re.I)


class SparqlSyntaxError(ValueError):
    pass


@dataclass(frozen=True)
class TriplePattern:
    """One pattern; each slot is ('var', name) | ('term', text) | ('id', int)."""

    s: tuple[str, object]
    p: tuple[str, object]
    o: tuple[str, object]

    @property
    def slots(self):
        return {"s": self.s, "p": self.p, "o": self.o}

    def bound_count(self) -> int:
        return sum(1 for kind, _ in (self.s, self.p, self.o) if kind != "var")

    def variables(self) -> set[str]:
        return {v for kind, v in (self.s, self.p, self.o) if kind == "var"}


@dataclass(frozen=True)
class BGPQuery:
    projection: tuple[str, ...] | None  # None = SELECT *
    patterns: tuple[TriplePattern, ...]
    # solution modifiers (SPARQL 1.1 §15): DISTINCT / ORDER BY / LIMIT
    distinct: bool = False
    order_by: tuple[tuple[str, bool], ...] = ()  # (var, descending)
    limit: int | None = None
    # FILTER constraints: (var, op, ('num', int) | ('var', name))
    filters: tuple[tuple[str, str, tuple[str, object]], ...] = ()
    # OPTIONAL groups, each a tuple of patterns → left join onto the BGP
    optionals: tuple[tuple[TriplePattern, ...], ...] = ()
    # arms of ONE `{...} UNION {...}` block → unionByName of arm plans
    unions: tuple[tuple[TriplePattern, ...], ...] = ()
    # MINUS groups → left-anti join on the shared variables
    minuses: tuple[tuple[TriplePattern, ...], ...] = ()
    # FILTER [NOT] EXISTS groups: (negated, patterns) → semi/anti join
    exists: tuple[tuple[bool, tuple[TriplePattern, ...]], ...] = ()
    # VALUES blocks: (var, allowed slots) → isin filter
    values: tuple[tuple[str, tuple[tuple[str, object], ...]], ...] = ()
    # OFFSET (applies after ORDER BY, before LIMIT)
    offset: int | None = None


def _localize_iri(inner: str) -> str:
    """Strip the IRI namespace up to the last '/' and ensure a leading ':'
    (MyOpVisitorBase.java:74-78) — matches dictionary terms like ':node_...'."""
    local = inner.rsplit("/", 1)[-1]
    return local if local.startswith(":") else ":" + local


def _normalize_term(
    tok: str, prefixes: dict[str, str] | None = None
) -> tuple[str, object]:
    """Classify one token (normalization per MyOpVisitorBase.java:74-78)."""
    if tok[0] in "?$":
        return ("var", tok[1:])
    if tok.startswith('"') and tok.endswith('"'):
        return ("term", tok[1:-1])
    if tok.startswith("<") and tok.endswith(">"):
        return ("term", _localize_iri(tok[1:-1]))
    if re.fullmatch(r"-?\d+", tok):
        return ("id", int(tok))
    # prefixed name: expand via the declared PREFIX mapping (as Jena's
    # front-end did before normalization), then localize exactly like a
    # full IRI. Undeclared prefixes (incl. bare ':name') stay verbatim —
    # the dictionary stores terms in that form.
    if prefixes and ":" in tok:
        pfx, local = tok.split(":", 1)
        if pfx in prefixes:
            return ("term", _localize_iri(prefixes[pfx] + local))
    return ("term", tok)


def _parse_patterns(src: str, prefixes: dict[str, str]) -> list[TriplePattern]:
    """Tokenize the WHOLE pattern source first, then split the token stream
    on statement terminators. Splitting the raw string on "." would chop
    dots inside IRIs (<http://example.org/x> — hostnames always contain
    dots) and inside terms like :node_..._-9.15947_38.70289 (the
    reference's AIS vocabulary, MyOpVisitorBase.java:132)."""
    patterns: list[TriplePattern] = []
    cur: list[str] = []

    def _flush() -> None:
        if not cur:
            return
        if len(cur) != 3:
            raise SparqlSyntaxError(f"triple pattern needs 3 terms, got {cur!r}")
        patterns.append(TriplePattern(*(_normalize_term(t, prefixes) for t in cur)))
        cur.clear()

    for tok in _TOKEN.findall(src):
        if tok == ".":
            _flush()
            continue
        terminate = False
        if not tok.startswith('"') and not tok.startswith("<") and tok.endswith("."):
            # statement terminator glued to the last term ("?y." form);
            # dots INSIDE the token (":n_-9.15") are preserved.
            tok = tok[:-1]
            terminate = True
        if tok:
            cur.append(tok)
        if terminate:
            _flush()
    _flush()
    return patterns


def parse_sparql(query: str) -> BGPQuery:
    m = _QUERY.match(query)
    if not m:
        raise SparqlSyntaxError("expected: [PREFIX...] SELECT ?v...|* WHERE { patterns }")
    prefixes = {pm.group(1): pm.group(2) for pm in _PREFIX_DECL.finditer(m.group("prefixes"))}
    bgp_src = m.group("bgp")
    if _UNSUPPORTED.search(bgp_src):
        raise SparqlSyntaxError(
            "only basic graph patterns are supported (no UNION/GRAPH/...)"
        )

    # extract OPTIONAL groups (non-nested) before the required patterns
    optional_srcs = [om.group(1) for om in _OPTIONAL.finditer(bgp_src)]
    bgp_src = _OPTIONAL.sub(" ", bgp_src)
    if re.search(r"\bOPTIONAL\b", bgp_src, re.I):
        raise SparqlSyntaxError("nested OPTIONAL groups are not supported")

    # extract FILTER [NOT] EXISTS groups (before MINUS: both are
    # keyword-prefixed braces, and EXISTS carries the FILTER keyword)
    exists_srcs: list[tuple[bool, str]] = []  # (negated, patterns source)
    for em in _FILTER_EXISTS.finditer(bgp_src):
        exists_srcs.append((bool(em.group("neg")), em.group(2)))
    bgp_src = _FILTER_EXISTS.sub(" ", bgp_src)

    # extract VALUES blocks (single variable; braces are keyword-prefixed)
    values: list[tuple[str, tuple[tuple[str, object], ...]]] = []
    for vm in _VALUES.finditer(bgp_src):
        entries = tuple(
            _normalize_term(tok, prefixes) for tok in _TOKEN.findall(vm.group("vals"))
        )
        if not entries:
            raise SparqlSyntaxError("empty VALUES block")
        if any(kind == "var" for kind, _ in entries):
            raise SparqlSyntaxError("VALUES entries must be constants")
        values.append((vm.group("var"), entries))
    bgp_src = _VALUES.sub(" ", bgp_src)
    if re.search(r"\bVALUES\b", bgp_src, re.I):
        raise SparqlSyntaxError(
            "only single-variable VALUES blocks are supported"
        )

    # extract MINUS groups (non-nested, keyword-prefixed like OPTIONAL)
    minus_srcs = [mm.group(1) for mm in _MINUS.finditer(bgp_src)]
    bgp_src = _MINUS.sub(" ", bgp_src)
    if re.search(r"\bMINUS\b", bgp_src, re.I):
        raise SparqlSyntaxError("nested MINUS groups are not supported")

    # extract ONE union chain of group alternatives (after OPTIONAL/MINUS,
    # whose braces are already gone; any brace left after this is unsupported)
    union_srcs: list[str] = []
    union_chains = _UNION_CHAIN.findall(bgp_src)
    if len(union_chains) > 1:
        raise SparqlSyntaxError("at most one UNION block is supported")
    if union_chains:
        union_srcs = _BRACE_GROUP.findall(union_chains[0])
        bgp_src = _UNION_CHAIN.sub(" ", bgp_src)
    if re.search(r"\bUNION\b", bgp_src, re.I) or "{" in bgp_src or "}" in bgp_src:
        raise SparqlSyntaxError(
            "unsupported group pattern (UNION arms must be brace groups; "
            "no other nested groups)"
        )

    # extract FILTER constraints before pattern tokenization
    filters: list[tuple[str, str, tuple[str, object]]] = []
    for fm in _FILTER.finditer(bgp_src):
        em = _FILTER_EXPR.match(fm.group(1))
        if not em:
            raise SparqlSyntaxError(
                f"unsupported FILTER expression: {fm.group(1)!r} "
                "(supported: ?var OP number|?var with OP in = != < <= > >=)"
            )
        rhs = (
            ("num", int(em.group("num")))
            if em.group("num") is not None
            else ("var", em.group("var2"))
        )
        filters.append((em.group("var"), em.group("op"), rhs))
    bgp_src = _FILTER.sub(" ", bgp_src)

    proj_src = m.group("proj").strip()
    projection = (
        None
        if proj_src == "*"
        else tuple(v.lstrip("?$") for v in proj_src.split())
    )

    patterns = _parse_patterns(bgp_src, prefixes)
    unions: list[tuple[TriplePattern, ...]] = []
    for usrc in union_srcs:
        arm = tuple(_parse_patterns(usrc, prefixes))
        if not arm:
            raise SparqlSyntaxError("empty UNION arm")
        unions.append(arm)
    if not patterns and not unions:
        raise SparqlSyntaxError("empty basic graph pattern")
    optionals: list[tuple[TriplePattern, ...]] = []
    for osrc in optional_srcs:
        group = tuple(_parse_patterns(osrc, prefixes))
        if not group:
            raise SparqlSyntaxError("empty OPTIONAL group")
        optionals.append(group)
    minuses: list[tuple[TriplePattern, ...]] = []
    for msrc in minus_srcs:
        group = tuple(_parse_patterns(msrc, prefixes))
        if not group:
            raise SparqlSyntaxError("empty MINUS group")
        minuses.append(group)
    exists: list[tuple[bool, tuple[TriplePattern, ...]]] = []
    for neg, esrc in exists_srcs:
        group = tuple(_parse_patterns(esrc, prefixes))
        if not group:
            raise SparqlSyntaxError("empty EXISTS group")
        exists.append((neg, group))

    required_vars = set().union(
        set(), *(tp.variables() for tp in patterns)
    ) | {v for arm in unions for tp in arm for v in tp.variables()}
    pattern_vars = required_vars | {
        v for grp in optionals for tp in grp for v in tp.variables()
    }
    for grp in optionals:
        grp_vars = set().union(*(tp.variables() for tp in grp))
        if not grp_vars & required_vars:
            raise SparqlSyntaxError(
                "OPTIONAL group shares no variable with the required patterns"
            )
    for grp in minuses:
        grp_vars = set().union(*(tp.variables() for tp in grp))
        if not grp_vars & required_vars:
            # SPARQL says disjoint-domain MINUS removes nothing; silently
            # keeping everything hides a typo'd variable — reject instead.
            raise SparqlSyntaxError(
                "MINUS group shares no variable with the required patterns"
            )
    for _, grp in exists:
        grp_vars = set().union(*(tp.variables() for tp in grp))
        if not grp_vars & required_vars:
            raise SparqlSyntaxError(
                "EXISTS group shares no variable with the required patterns"
            )
    for var, _ in values:
        if var not in required_vars:
            raise SparqlSyntaxError(f"VALUES variable not in BGP: ?{var}")
    if projection is not None:
        unknown = set(projection) - pattern_vars
        if unknown:
            raise SparqlSyntaxError(f"projected variables not in BGP: {sorted(unknown)}")
    for var, _, rhs in filters:
        for v in [var] + ([rhs[1]] if rhs[0] == "var" else []):
            if v not in pattern_vars:
                raise SparqlSyntaxError(f"FILTER variable not in BGP: ?{v}")

    # solution modifiers after the group pattern
    mods = m.group("mods") or ""
    order_by: list[tuple[str, bool]] = []
    om = _ORDER.search(mods)
    if om:
        for km in _ORDER_KEY.finditer(om.group("keys")):
            var = km.group("var")
            if var not in pattern_vars:
                raise SparqlSyntaxError(f"ORDER BY variable not in BGP: ?{var}")
            order_by.append((var, (km.group("dir") or "ASC").upper() == "DESC"))
    lm = _LIMIT.search(mods)
    om2 = _OFFSET.search(mods)
    leftover = _OFFSET.sub("", _LIMIT.sub("", _ORDER.sub("", mods))).strip()
    if leftover:
        raise SparqlSyntaxError(f"unsupported solution modifiers: {leftover!r}")
    return BGPQuery(
        projection=projection,
        patterns=tuple(patterns),
        distinct=bool(m.group("distinct")),
        order_by=tuple(order_by),
        limit=int(lm.group("n")) if lm else None,
        filters=tuple(filters),
        optionals=tuple(optionals),
        unions=tuple(unions),
        minuses=tuple(minuses),
        exists=tuple(exists),
        values=tuple(values),
        offset=int(om2.group("n")) if om2 else None,
    )
