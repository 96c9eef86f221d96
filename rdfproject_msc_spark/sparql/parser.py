"""Minimal SPARQL SELECT/BGP parser (pure Python, no external deps).

Scope matches the reference's query surface (SURVEY.md §2.8): SELECT over a
basic graph pattern of triple patterns. The reference used Jena
(MyOpVisitorBase.java:49-50) but its visitor kept only the LAST pattern of a
multi-triple BGP (static-field overwrite bug, MyOpVisitorBase.java:34-46) —
we keep ALL patterns and join them (the intended semantics, per the example
query at MyOpVisitorBase.java:132-133).

Beyond the reference: solution modifiers (DISTINCT/ORDER BY/LIMIT/OFFSET),
FILTER expressions (numeric comparisons over encoded ids combined with
&& / || / ! and parentheses, SPARQL 1.1 §17.2), FILTERs inside OPTIONAL
groups (folded into the LeftJoin condition, §18.2.2.2), OPTIONAL groups
(left joins), MINUS groups (left-anti joins), FILTER [NOT] EXISTS
(semi/anti joins), single- and multi-variable VALUES blocks (isin /
OR-of-ANDs filters), UNION blocks of group alternatives (arms joined
per-arm for compatible-binding semantics; blocks compose by join — the
generalization of the reference translator's hand-emitted Positive UNION
ALL Negative, MyOpVisitorBase.java:106-123), GROUP BY/HAVING with
COUNT/SUM/AVG/MIN/MAX/SAMPLE/GROUP_CONCAT aggregates (§11; SAMPLE picks
the deterministic minimum, GROUP_CONCAT sorts values before joining —
both choices the spec leaves open, pinned for reproducibility),
sequence / alternation / inverse
/ closure-family property paths (§9.1 — sequences chain joins
through hidden fresh variables, alternation lowers to a UNION block,
inverse swaps the subject/object sides, `p+` lowers to DISTINCT
reachability pairs via operators.graph.transitive_closure, `p*` adds
the §18.4 zero-length pairs — every graph term relates to itself —
and `p?` is the zero-length pairs plus a single hop), all four
query forms — SELECT, ASK (§16.3), CONSTRUCT (§16.2), DESCRIBE (§16.4)
— and PREFIX expansion (the reference's Jena front-end resolved prefixes
before normalization, MyOpVisitorBase.java:49,74-78). Negated property sets `!(:p1|:p2)` compile to a NOT-IN scan predicate.
BIND(expr AS ?var) (§10.1) assigns integer arithmetic (+ - * with
parentheses) over previously-bound variables to a fresh variable,
usable by FILTER / projection / GROUP BY / ORDER BY; NULL (unbound)
inputs propagate, matching SPARQL's expression-error-leaves-unbound.
SELECT expression items `(arith AS ?alias)` (§18.2.4.4 Extend)
desugar onto the same machinery as synthetic BINDs.
FILTER also accepts the string functions REGEX (with the optional "i"
flag) / CONTAINS / STRSTARTS / STRENDS over `?var` or `STR(?var)`
(§17.4.3), fully composable with the boolean connectives: the planner
attaches the variable's dictionary term via a join and compiles the
match as a column predicate — Catalyst pushes the string match to the
(far smaller) dictionary side, the textbook evaluation strategy for
string predicates over dictionary-encoded data.
Round 5 made the group grammar RECURSIVE: `_parse_group` scans any
group graph pattern into a GroupPattern tree — nested `{}` subgroups,
OPTIONAL/MINUS/EXISTS bodies and UNION arms are full groups at
arbitrary depth, `{ SELECT ... }` subqueries (§12) parse standalone
with outer prefixes in scope, and composite property paths with
closures inside sequences/alternations (`p1/p2*`, `(p1|p2)+`) parse
into path ASTs via `_parse_path_expr`.
Out of scope, rejected explicitly: inverse/sequence members inside
negated sets and string functions inside HAVING (grouped output is
numeric). Nested-group FILTERs and BINDs referencing outer variables
ARE accepted and evaluate the unbound reference per §18.2.2.2 —
FILTER: error → filter-false; BIND: error → target unbound (r7). Multi-variable VALUES rows support
UNDEF wildcards and (since r7) NON-disjoint rows: pairwise-disjoint
blocks compile to the cheap OR-of-ANDs row filter, unifiable rows take
the broadcast-relation JOIN lowering that produces the spec's multiset
duplication.
Term-kind accessors (LANG, DATATYPE,
isIRI/isLiteral/isBlank/isNumeric, LANGMATCHES) ARE supported — they
compile to dictionary-side column predicates over the term-text
grammar (planner `_term_lang`/`_term_datatype`). FILTER
comparison sides accept full integer arithmetic (the BIND grammar:
`FILTER(?a - ?b > 5 * ?c)`), and string functions ARE allowed in
OPTIONAL-scoped FILTERs: the term column attaches to whichever join
side binds the variable and the predicate rides in the LeftJoin
condition.
Typed-literal VALUE comparisons (r7, §17.3 operand mapping):
`FILTER(?d >= "2020-02-15"^^xsd:date)`, `FILTER(?p > 19.5)` and the
decimal/double/float/dateTime forms compile to comparisons over a
value column derived from the dictionary term text (('valcmp', var,
op, kind, value) leaves — planner `_term_numeric`/`_term_temporal`);
integer-typed literals keep collapsing to the id model, and plain /
unknown-datatype literals stay term-identity-only (=, !=).
Constructor casts (§17.5): `BIND(xsd:integer(STR(?x)) AS ?n)` and the
decimal/double/float/date/dateTime/string targets lower to
('cast_expr', kind, var) — typed VALUE columns over the term text
(planner `_term_cast`; xsd:string ≡ STR); ORDER BY accepts
`[ASC|DESC](xsd:T(?x))` cast keys for VALUE ordering (plain `ORDER BY
?v` deliberately keeps the engine's encoded-id order, which the
modifier tests pin — use a cast key or STR(?v) for value/term order).
String-manipulation BINDs (r7, §17.4.3): SUBSTR / STRBEFORE /
STRAFTER / REPLACE / CONCAT / UCASE / LCASE over STR(?x), literals,
earlier string BIND targets and each other (nested), lowered to
('strexpr', tree) — `_parse_str_expr` — and compiled to JVM column
expressions with one dictionary join per distinct source variable.

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

import contextvars
import itertools
import re
from dataclasses import dataclass, replace as _dc_replace

# VALUES rows inside a multi-variable block: `(a b)` / `(c UNDEF)`
_VALUES_ROW = re.compile(r"\(([^()]*)\)")
# group-level keyword detection for the recursive group scanner: a word is
# a keyword only when it stands alone (preceded by a delimiter and followed
# by a non-word char) — terms like :node_OPTIONAL2 never match
_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_GROUP_KEYWORDS = frozenset(
    {"OPTIONAL", "MINUS", "FILTER", "BIND", "VALUES", "UNION", "GRAPH", "SERVICE"}
)
# FILTER: boolean expressions over comparisons combined with `&&` / `||`
# / `!` and parentheses (SPARQL 1.1 §17.2). Numeric comparisons act on
# the dictionary-encoded ids, which IS this engine's data model (the
# reference's own SQL compares encoded ids directly,
# PartitionQueryingSubject.java:130); string-valued leaves (term
# equality, [NOT] IN with terms, REGEX/CONTAINS/STRSTARTS/STRENDS,
# BOUND) each have dedicated leaf forms below, as do the term-kind
# accessors (LANG/DATATYPE/isIRI/isLiteral/isBlank/isNumeric/
# LANGMATCHES — evaluated over the dictionary term text). Casts are
# rejected explicitly.
#
# Expression AST (BGPQuery.filters elements):
#   (var, op, ('num', int) | ('var', name))   comparison leaf
#   ('not', expr) / ('and', a, b) / ('or', a, b)
# A node is a leaf iff node[1] is an operator symbol.
# note: `-?\d+` precedes the bare `-` so negative literals keep lexing as
# one token; the arithmetic parser re-splits a negative number where a
# binary operator was expected (`?a -3` ≡ `?a - 3`)
_FILTER_TOKEN = re.compile(
    r'\s*(\(|\)|&&|\|\||<[^>\s]*>|!=|<=|>=|=|<|>|!|[?$]\w+'
    r"|-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+|-?\d+"
    r'|"(?:[^"\\]|\\.)*"(?:\^\^(?:<[^>\s]*>|\w*:\w+))?'
    r'|\w+:\w+|:\w+|,|\+|-|\*|/|\w+)'
)
_CMP_OPS = ("=", "!=", "<", "<=", ">", ">=")
# string-valued FILTER functions (SPARQL 1.1 §17.4.3): evaluated against the
# DICTIONARY terms, not the encoded ids — the planner attaches the term via a
# dictionary join and Catalyst pushes the match to the dictionary side (the
# textbook dictionary-encoding evaluation strategy). The STR() wrapper is
# accepted and means the same thing (ids ARE term references here).
# AST leaf: ('strfn', name, var, pattern, flags) — 5-tuple, distinguishable
# from the 3-tuple comparison leaf.
_STR_FNS = ("regex", "contains", "strstarts", "strends")
# BIND assignment (§10.1): `BIND(expr AS ?var)` — integer arithmetic over
# previously-bound variables (+ - * with parentheses; the engine's values
# ARE integers). AST nodes: ('num', n) | ('var', v) | (op, a, b).
_BIND_AS = re.compile(r"\sAS\s+[?$](?P<var>\w+)\s*$", re.I)
# tokens inside the BGP: quoted literal (ECHAR escapes, §19.8) with an
# optional ^^datatype or @lang suffix | <iri> | anything non-space
_TOKEN = re.compile(
    r'"(?:[^"\\]|\\.)*"(?:\^\^\S+|@[A-Za-z][A-Za-z0-9-]*)?|<[^>]*>|\S+'
)

# xsd integer datatypes whose typed literals ARE ids in this engine's
# integer-encoded data model ("123"^^xsd:integer ≡ 123)
_INT_DATATYPES = frozenset(
    {":integer", ":int", ":long", ":short", ":byte",
     ":nonNegativeInteger", ":positiveInteger"}
)

# ECHAR escape decoding (§19.8): the five SPARQL string escapes plus the
# escaped quote/backslash; an unknown escape is a syntax error
_ECHARS = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


def _unescape(text: str) -> str:
    """Decode ECHAR escapes inside a (quote-stripped) string literal."""
    if "\\" not in text:
        return text
    out = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "\\":
            if i + 1 >= n or text[i + 1] not in _ECHARS:
                raise SparqlSyntaxError(
                    f"bad string escape in literal: {text!r}"
                )
            out.append(_ECHARS[text[i + 1]])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _skip_string(src: str, i: int) -> int:
    """src[i] == '\"': return the index just past the closing quote,
    honoring backslash escapes."""
    i += 1
    n = len(src)
    while i < n:
        c = src[i]
        if c == "\\":
            i += 2
            continue
        if c == '"':
            return i + 1
        i += 1
    raise SparqlSyntaxError("unterminated string literal")
# SELECT header up to (and excluding) the WHERE group's opening brace;
# the group itself is brace-SCANNED (a regex-anchored trailing `}` would
# mis-split queries whose modifiers contain braces — trailing VALUES)
# REDUCED (§9.9.2) *permits* duplicate elimination without requiring it;
# returning the multiset unchanged is conformant, so it parses as a no-op
# one parenthesized projection item, nested to depth 6 — enough for
# `(CONCAT("<", UCASE(SUBSTR(STR(?o), 1, 2)), ">") AS ?t)`-class
# expressions (regexes cannot match arbitrary nesting; deeper forms can
# always be written as a BIND, whose body is brace-scanned)
_PAREN4 = r"[^()]*"
# depth 10 (r8: was 6 — the DuckDB string-expression fuzz found a legal
# 7-deep SUBSTR/UCASE chain the projection regex rejected)
for _ in range(10):
    _PAREN4 = r"\((?:[^()]|" + _PAREN4 + r")*\)"
_QUERY = re.compile(
    r"^\s*(?P<prefixes>(?:(?:PREFIX\s+\S+\s*|BASE\s*)<[^>]*>\s*)*)"
    r"SELECT\s+(?:(?P<distinct>DISTINCT)\s+|REDUCED\s+)?"
    r"(?P<proj>\*|(?:(?:[?$]\w+|" + _PAREN4 + r")\s*)+)\s*"
    r"(?P<dataset>(?:FROM\s+(?:NAMED\s+)?\S+\s*)*)"
    r"WHERE\s*(?=\{)",
    re.I | re.S,
)
# one dataset clause (§13.2) inside the _QUERY 'dataset' group
_FROM_CLAUSE = re.compile(r"FROM\s+(?P<named>NAMED\s+)?(?P<src>\S+)", re.I)
# projection items: a plain variable, or a parenthesized aggregate
# `(AGG([DISTINCT] ?v|*) AS ?alias)` (SPARQL 1.1 §11; one paren level)
_PROJ_ITEM = re.compile(r"[?$]\w+|" + _PAREN4)
_AGG_ITEM = re.compile(
    r"^\(\s*(?P<func>COUNT|SUM|AVG|MIN|MAX|SAMPLE|GROUP_CONCAT)\s*\(\s*"
    r"(?P<distinct>DISTINCT\s+)?"
    r"(?P<arg>\*|STR\s*\(\s*[?$]\w+\s*\)"
    # cast / accessor call args (r7): `SUM(xsd:decimal(?p))`,
    # `MIN(YEAR(?d))`, `COUNT(STRLEN(?x))` — desugared below onto a
    # synthetic BIND, so the aggregate itself sees a plain variable
    r"|(?:xsd:\w+|YEAR|MONTH|DAY|HOURS|MINUTES|SECONDS|FLOOR|CEIL|ROUND"
    r"|STRLEN)\s*\(\s*(?:STR\s*\(\s*[?$]\w+\s*\)|[?$]\w+)\s*\)"
    # one function call with args nested up to two levels (r8):
    # `GROUP_CONCAT(UCASE(STR(?s)))`, `MIN(SUBSTR(STR(?x), 1, 3))` —
    # anchored on a leading callable name so `COUNT(?a) + COUNT(?b)`
    # still falls through to the SELECT-expression agg-lifting path
    r"|(?:xsd:)?[A-Za-z_]\w*\s*\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*\)"
    r"|[^();]+?)\s*"
    r'(?:;\s*SEPARATOR\s*=\s*"(?P<sep>[^"]*)"\s*)?\)\s+'
    r"AS\s+[?$](?P<alias>\w+)\s*\)$",
    re.I,
)
# a cast/accessor aggregate arg (the r7 desugar branch above)
_AGG_CALL_ARG = re.compile(
    r"(?:xsd:\w+|YEAR|MONTH|DAY|HOURS|MINUTES|SECONDS|FLOOR|CEIL|ROUND"
    r"|STRLEN|SUBSTR|STRBEFORE|STRAFTER|REPLACE|CONCAT|UCASE|LCASE"
    r"|MD5|SHA1|SHA256|SHA384|SHA512|ENCODE_FOR_URI)\s*\(.*\)",
    re.I | re.S,
)
# non-aggregate SELECT expression `(arith AS ?alias)` (§18.2.4.4 Extend):
# desugars onto the BIND machinery — the alias becomes a synthetic BIND
# appended after the written ones, so scoping/freshness validation and the
# planner lowering are shared
_EXPR_ITEM = re.compile(r"^\(\s*(?P<expr>.+?)\s+AS\s+[?$](?P<alias>\w+)\s*\)$", re.S)
_GROUP = re.compile(r"GROUP\s+BY\s+(?P<keys>(?:[?$]\w+\s*)+)", re.I)
_HAVING = re.compile(r"HAVING\s*\(", re.I)
# aggregate calls INSIDE a HAVING body (§11.5): lifted to hidden aliases
_HAVING_AGG = re.compile(
    # arg: a variable, *, or a paren-free arithmetic expression over
    # variables/integers (r8 — `HAVING(SUM(?a * ?b) > 5)`,
    # `ORDER BY DESC(SUM(?a + 1))`); parenthesized sub-expressions inside
    # an aggregate arg stay unsupported (regex cannot nest) and keep the
    # named reject
    r"\b(COUNT|SUM|AVG|MIN|MAX|SAMPLE)\s*\(\s*(DISTINCT\s+)?"
    r"([?$]\w+(?:\s*[-+*/]\s*(?:[?$]\w+|-?\d+))+|[?$]\w+|\*)\s*\)",
    re.I,
)
# ASK query form (§16.3): boolean existence of any solution
_ASK = re.compile(
    r"^\s*(?P<prefixes>(?:(?:PREFIX\s+\S+\s*|BASE\s*)<[^>]*>\s*)*)"
    r"ASK\s*(?P<dataset>(?:FROM\s+(?:NAMED\s+)?\S+\s*)*)"
    r"(?:WHERE\s*)?\{(?P<bgp>.*)\}\s*$",
    re.I | re.S,
)
# CONSTRUCT query form (§16.2): template graph instantiated per solution.
# The template is plain triples (no groups/paths — per the grammar), so its
# braces are flat; the WHERE group may nest
_CONSTRUCT = re.compile(
    r"^\s*(?P<prefixes>(?:(?:PREFIX\s+\S+\s*|BASE\s*)<[^>]*>\s*)*)"
    r"CONSTRUCT\s*\{(?P<tpl>[^{}]*)\}\s*"
    r"(?P<dataset>(?:FROM\s+(?:NAMED\s+)?\S+\s*)*)"
    r"WHERE\s*\{(?P<bgp>.*)\}"
    r"\s*(?P<mods>[^{}]*?)\s*$",
    re.I | re.S,
)
# the §16.2.4 short form `CONSTRUCT WHERE { triples }`: template ≡
# pattern — the grammar restricts the WHERE to a plain TriplesTemplate
# (no FILTER/OPTIONAL/paths), which the template parser enforces
_CONSTRUCT_WHERE = re.compile(
    r"^\s*(?P<prefixes>(?:(?:PREFIX\s+\S+\s*|BASE\s*)<[^>]*>\s*)*)"
    r"CONSTRUCT\s*"
    r"(?P<dataset>(?:FROM\s+(?:NAMED\s+)?\S+\s*)*)"
    r"WHERE\s*\{(?P<bgp>[^{}]*)\}"
    r"\s*(?P<mods>[^{}]*?)\s*$",
    re.I | re.S,
)
# DESCRIBE query form (§16.4): either constant resources (no WHERE), or
# ONE variable scoped by a WHERE group
_DESCRIBE_TERMS = re.compile(
    r"^\s*(?P<prefixes>(?:(?:PREFIX\s+\S+\s*|BASE\s*)<[^>]*>\s*)*)"
    r"DESCRIBE\s+(?P<what>[^{}]+?)\s*$",
    re.I | re.S,
)
_DESCRIBE_VAR = re.compile(
    r"^\s*(?P<prefixes>(?:(?:PREFIX\s+\S+\s*|BASE\s*)<[^>]*>\s*)*)"
    r"DESCRIBE\s+(?P<var>[?$]\w+)\s*"
    r"(?P<dataset>(?:FROM\s+(?:NAMED\s+)?\S+\s*)*)"
    r"WHERE\s*\{(?P<bgp>.*)\}\s*$",
    re.I | re.S,
)
_PREFIX_DECL = re.compile(r"PREFIX\s+([\w.\-]*):\s*<([^>]*)>", re.I)
_BASE_DECL = re.compile(r"BASE\s*<([^>]*)>", re.I)
# IRIs with a scheme are absolute — everything else resolves against
# the prolog's BASE (when declared)
_IRI_SCHEME = re.compile(r"[A-Za-z][A-Za-z0-9+.\-]*:")


def _resolve_against_base(base: str, ref: str) -> str:
    """RFC 3986 resolution that PRESERVES a trailing empty fragment —
    ``urljoin`` drops the '#' from ``rel#``, but a namespace IRI's
    trailing '#' is load-bearing (every localname concatenates after
    it)."""
    from urllib.parse import urljoin

    out = urljoin(base, ref)
    if ref.endswith("#") and not out.endswith("#"):
        out += "#"
    return out


def _build_prolog_map(
    prolog_src: str, outer: dict[str, str] | None
) -> dict[str, str]:
    """PREFIX declarations + the prolog's BASE (§4.1.1-2) as one map.
    The base rides under the reserved key ``"@base"`` (never a legal
    prefix name — prefix lookups split on ':' and cannot produce it);
    the LAST BASE wins, and declared prefix IRIs that are themselves
    relative resolve against it (the spec resolves each against the
    base in force at its declaration — this subset applies the final
    base, exact whenever a query declares at most one BASE, which the
    grammar group here guarantees by accepting one prolog run)."""
    out = dict(outer or {})
    for bm in _BASE_DECL.finditer(prolog_src):
        out["@base"] = bm.group(1)
    base = out.get("@base")
    for pm in _PREFIX_DECL.finditer(prolog_src):
        iri = pm.group(2)
        if base and not _IRI_SCHEME.match(iri):
            iri = _resolve_against_base(base, iri)
        out[pm.group(1)] = iri
    return out
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
        # 'notin' (negated property set) binds nothing selective — it
        # excludes a handful of predicates — so it ranks like a variable
        # for the most-bound-first join ordering
        return sum(
            1
            for kind, _ in (self.s, self.p, self.o)
            if kind not in ("var", "notin")
        )

    def variables(self) -> set[str]:
        return {v for kind, v in (self.s, self.p, self.o) if kind == "var"}


@dataclass(frozen=True)
class GroupPattern:
    """One group graph pattern (SPARQL 1.1 §5.2) — the RECURSIVE unit.

    A group holds its own triple patterns, closure paths, FILTERs, BINDs
    and VALUES, plus CHILD groups: plain nested `{ ... }` subgroups (joined
    in, §18.2.2.2 Join), OPTIONAL groups (LeftJoin), UNION blocks of arm
    groups (multiset union), MINUS groups (anti-join) and FILTER [NOT]
    EXISTS groups (semi/anti-join). Children are full GroupPatterns, so
    OPTIONAL-inside-OPTIONAL, OPTIONAL-inside-UNION-arms and arbitrary
    brace nesting all compose — the surface Jena accepted for the
    reference (MyOpVisitorBase.java:49) but its translator never handled.

    The sequence protocol (len / index / iterate) delegates to `patterns`:
    a flat group IS its pattern list to existing consumers, so code (and
    pinned tests) written against the pre-recursive tuple-of-patterns
    representation keeps reading naturally."""

    patterns: tuple[TriplePattern, ...] = ()
    # FILTER expression ASTs scoped to this group. For an OPTIONAL child
    # these fold into the LeftJoin condition (§18.2.2.2); for any other
    # group they apply to the group's own solution before it composes.
    filters: tuple = ()
    # BIND assignments (§10.1): per-group Extend — expressions see only
    # THIS group's variables and earlier targets (validated recursively)
    binds: tuple[tuple[str, object], ...] = ()
    # OPTIONAL child groups → left join onto this group's solution
    optionals: tuple["GroupPattern", ...] = ()
    # UNION blocks (§5.4), each a tuple of arm groups; blocks compose by
    # join, arms by multiset union (null-extending unshared variables)
    unions: tuple[tuple["GroupPattern", ...], ...] = ()
    # MINUS child groups → left-anti join on the shared variables
    minuses: tuple["GroupPattern", ...] = ()
    # FILTER [NOT] EXISTS child groups: (negated, group) → semi/anti join
    exists: tuple[tuple[bool, "GroupPattern"], ...] = ()
    # plain nested `{ ... }` subgroups → inner join (§18.2.2.2 Join)
    subgroups: tuple["GroupPattern", ...] = ()
    # VALUES blocks: (var, allowed slots) → isin filter
    values: tuple[tuple[str, tuple[tuple[str, object], ...]], ...] = ()
    # multi-variable VALUES blocks: (vars, rows of slots) → OR-of-ANDs filter
    values_multi: tuple[
        tuple[tuple[str, ...], tuple[tuple[tuple[str, object], ...], ...]], ...
    ] = ()
    # closure-family paths `?s :p+ / :p* / :p? ?o` (§9.1): slots
    # (s, pred, o, mode) with mode in '+', '*', '?'
    closures: tuple[tuple[tuple, tuple, tuple, str], ...] = ()
    # composite path expressions `?s (:p1|:p2)+ ?o` (§9.1, nested forms):
    # (s_slot, path AST from _parse_path_expr, o_slot) — compiled by the
    # planner into a pair relation joined like a required pattern
    paths: tuple[tuple[tuple, object, tuple], ...] = ()
    # subqueries `{ SELECT ... }` (§12): full BGPQuery objects planned
    # standalone; only their PROJECTED variables are visible to this group
    # (§18.2.4.4 projection scoping) and join on the shared ones
    subselects: tuple = ()
    # GRAPH blocks (§13.3): (graph_slot, group) — the child group's scans
    # read the store's named-graph quad relation. A constant graph slot
    # (('term', t) | ('id', i)) restricts scans to ONE graph (pushdown /
    # partition pruning); a ('var', g) slot binds the graph name as a
    # solution variable shared by every pattern in the block. The block
    # joins into the group like a subgroup (§18.2.2.2 Join).
    graphs: tuple[tuple[tuple[str, object], "GroupPattern"], ...] = ()
    # the group's clauses in WRITTEN order — (kind, index-into-that-kind's
    # tuple) entries, kinds: pattern/closure/path/subgroup/graph/subselect/
    # union/optional/bind/minus/exists/values/values_multi. §18.2.2.6
    # translates a group's elements in textual order, and the order is
    # OBSERVABLE whenever a Join-family clause follows an OPTIONAL/MINUS
    # that left a shared variable nullable (LeftJoin does not commute with
    # Join) — the planner dispatches on this sequence. Empty (a
    # programmatically built group) = the fixed canonical order.
    seq: tuple[tuple[str, int], ...] = ()

    def __len__(self):
        return len(self.patterns)

    def __getitem__(self, i):
        return self.patterns[i]

    def __iter__(self):
        return iter(self.patterns)

    def required_vars(self) -> set[str]:
        """Variables bound by this group's REQUIRED parts (patterns,
        closures, subgroups, any UNION arm) — recursively. Union-arm
        variables are included (in scope per §18.2.1) even though some
        may be unbound in specific solutions; the planner tracks that
        separately as nullability."""
        out = {v for tp in self.patterns for v in tp.variables()}
        out |= {
            val
            for s, _, o, _ in self.closures
            for kind, val in (s, o)
            if kind == "var"
        }
        out |= {
            val
            for s, _, o in self.paths
            for kind, val in (s, o)
            if kind == "var"
        }
        for sub in self.subselects:
            # §12: only the subquery's projection is visible outside it
            out |= set(sub.projection)
        for sub in self.subgroups:
            out |= sub.required_vars()
        for gslot, sub in self.graphs:
            out |= sub.required_vars()
            if gslot[0] == "var":
                out.add(gslot[1])
        for blk in self.unions:
            for arm in blk:
                out |= arm.required_vars()
        return out

    def all_vars(self) -> set[str]:
        """Every variable this group can bind, including OPTIONAL-bound
        ones — recursively (the §18.2.1 in-scope set, minus BINDs)."""
        out = self.required_vars()
        for child in self.optionals + self.subgroups:
            out |= child.all_vars()
        for _, child in self.graphs:
            out |= child.all_vars()
        for blk in self.unions:
            for arm in blk:
                out |= arm.all_vars()
        return out

    def has_required_content(self) -> bool:
        return bool(
            self.patterns
            or self.closures
            or self.paths
            or self.subgroups
            or self.unions
            or self.subselects
            or self.graphs
        )


def _visible_binds(g: GroupPattern) -> set[str]:
    """BIND targets visible OUTSIDE the group (§18.2.4.4 in-scope set):
    this group's own targets plus those of its visible children —
    optionals, subgroups, GRAPH blocks and union arms (MINUS/EXISTS
    children's bindings never escape)."""
    out = {b for b, _ in g.binds}
    for child in list(g.optionals) + list(g.subgroups):
        out |= _visible_binds(child)
    for _, child in g.graphs:
        out |= _visible_binds(child)
    for blk in g.unions:
        for arm in blk:
            out |= _visible_binds(arm)
    return out


def _walk_groups(g: GroupPattern):
    """Yield every group in the tree (pre-order), self included."""
    yield g
    for child in (
        list(g.subgroups)
        + list(g.optionals)
        + list(g.minuses)
        + [e for _, e in g.exists]
        + [sub for _, sub in g.graphs]
        + [arm for blk in g.unions for arm in blk]
    ):
        yield from _walk_groups(child)


@dataclass(frozen=True)
class BGPQuery:
    projection: tuple[str, ...] | None  # None = SELECT *
    # the WHERE clause as a recursive group graph pattern tree
    where: GroupPattern = GroupPattern()
    # solution modifiers (SPARQL 1.1 §15): DISTINCT / ORDER BY / LIMIT
    distinct: bool = False
    # (key, descending) — key is a variable name, or ('expr', arith AST)
    # for a parenthesized ORDER BY expression (sorted pre-projection)
    order_by: tuple[tuple, ...] = ()
    limit: int | None = None
    # aggregation (SPARQL 1.1 §11): GROUP BY keys and projected aggregates
    # (func, var|None for COUNT(*), distinct, alias, separator) — separator
    # is GROUP_CONCAT's, None elsewhere; when either field is set the
    # planner lowers to groupBy/agg and `projection` holds the OUTPUT column
    # order (group vars and aggregate aliases interleaved as written)
    group_by: tuple[str, ...] = ()
    aggregates: tuple[tuple[str, str | None, bool, str, str | None], ...] = ()
    # HAVING constraints (§11.5): FILTER expression ASTs evaluated over the
    # grouped OUTPUT columns (group keys and aggregate aliases)
    having: tuple = ()
    # post-aggregation expression aliases (§11.1): (alias, arith AST over
    # group keys and [hidden] aggregate aliases), computed after groupBy
    agg_exprs: tuple[tuple[str, object], ...] = ()
    # CONSTRUCT template (§16.2): plain triples instantiated per solution;
    # the plan unions the instantiations and de-duplicates (the result is
    # a GRAPH — a set of (s, p, o) id triples)
    construct: tuple[TriplePattern, ...] = ()
    # DESCRIBE (§16.4): the description of a resource is every triple it
    # appears in as subject or object (the spec leaves 'description'
    # implementation-defined; this symmetric form is documented).
    # Either constant resource slots (no WHERE) ...
    describe_terms: tuple[tuple[str, object], ...] = ()
    # ... or ONE variable whose bindings in the WHERE group are described
    describe_var: str | None = None
    # ASK query form (§16.3): plan returns one row (ask: boolean)
    ask: bool = False
    # OFFSET (applies after ORDER BY, before LIMIT)
    offset: int | None = None
    # dataset clauses (§13.2): FROM graphs merge (set-union) into the
    # active default graph; FROM NAMED graphs are the ONLY graphs GRAPH
    # blocks range over. When EITHER is present the query's dataset is
    # exactly what the clauses describe (absent FROM → empty default
    # graph; absent FROM NAMED → no named graphs). Slots are
    # ('term', text) | ('id', int), resolved like pattern constants.
    dataset_default: tuple[tuple[str, object], ...] = ()
    dataset_named: tuple[tuple[str, object], ...] = ()
    # the constant-normalization style this query was parsed under
    # (see _TERM_STYLE) — recorded so the PLANNER can pick the matching
    # value semantics (lexical stores derive STR values from term text)
    term_style: str = "localized"
    # the prolog's PREFIX declarations, recorded verbatim (sorted
    # (name, iri) pairs) so consumers that SERIALIZE answers — the HTTP
    # endpoint's Turtle content negotiation — can reuse the query's own
    # namespace map without re-scanning the query text
    prefixes: tuple[tuple[str, str], ...] = ()

    # ---- flat-view accessors: the ROOT group's content, kept so code and
    # tests written against the pre-recursive flat representation keep
    # reading naturally (nested structure lives on `where`) ----
    @property
    def patterns(self) -> tuple[TriplePattern, ...]:
        return self.where.patterns

    @property
    def filters(self) -> tuple:
        return self.where.filters

    @property
    def binds(self) -> tuple[tuple[str, object], ...]:
        return self.where.binds

    @property
    def optionals(self) -> tuple[GroupPattern, ...]:
        return self.where.optionals

    @property
    def optional_filters(self) -> tuple[tuple, ...]:
        # index-aligned with `optionals` (the pre-recursive representation)
        return tuple(g.filters for g in self.where.optionals)

    @property
    def unions(self) -> tuple[tuple[GroupPattern, ...], ...]:
        return self.where.unions

    @property
    def minuses(self) -> tuple[GroupPattern, ...]:
        return self.where.minuses

    @property
    def exists(self) -> tuple[tuple[bool, GroupPattern], ...]:
        return self.where.exists

    @property
    def values(self) -> tuple:
        return self.where.values

    @property
    def values_multi(self) -> tuple:
        return self.where.values_multi

    @property
    def closures(self) -> tuple:
        return self.where.closures


def _localize_iri(inner: str) -> str:
    """Strip the IRI namespace up to the last '/' and ensure a leading ':'
    (MyOpVisitorBase.java:74-78) — matches dictionary terms like ':node_...'."""
    local = inner.rsplit("/", 1)[-1]
    return local if local.startswith(":") else ":" + local


# Term-style context for constant normalization (set by parse_sparql,
# inherited by recursive subquery parses):
# - "localized": the reference's convention (MyOpVisitorBase.java:74-78) —
#   IRIs collapse to their ':local' name, lang tags lowercase, datatypes
#   localize, xsd-integer literals collapse to raw ids. Matches
#   dictionaries in the reference's TSV format (':node_...').
# - "lexical": full N-Triples lexical forms — '<iri>' verbatim, prefixed
#   names EXPAND to '<full_iri>', lang tags as written, typed literals
#   keep '^^<full_datatype>' and never collapse to ids. Matches
#   dictionaries BUILT from raw RDF (sources/ntriples.py), whose terms are
#   exact lexical forms so decode/export round-trips.
_TERM_STYLE = contextvars.ContextVar("sparql_term_style", default="localized")
# strict (default): the TYPO GUARDS are on — dictionary-absent
# constants raise at encode, and fully variable-disjoint MINUS/EXISTS
# groups reject at validation. Non-strict (r11, `strict_terms=False`):
# spec behavior for unusual-but-legal queries — absent constants match
# nothing (0-sentinel), disjoint MINUS removes nothing (§18.5),
# disjoint EXISTS gates on group nonemptiness (both lowerings already
# exist in the planner; only the guards lift).
_STRICT_MODE = contextvars.ContextVar("sparql_strict_mode", default=True)
# the query's FIXED CLOCK (r12): None (default) keeps the principled
# NOW() reject — a per-evaluation clock breaks the engine's
# re-runnable hash-verified contract AND Spark's retried-task
# semantics (a retried task would observe a different value than the
# lost attempt). An EXPLICIT xsd:dateTime lexical set via
# `Engine.sparql(..., clock=…)` / CLI `--clock` folds every NOW() to
# that constant at PARSE time: determinism is preserved (the constant
# is part of the plan), and the caller owns the timestamp.
_CLOCK = contextvars.ContextVar("sparql_clock", default=None)


# fresh ids for anonymous blank nodes `[]` — process-global so every
# occurrence anywhere is distinct; labels never leak (hidden internal vars)
_BNODE_IDS = itertools.count()


def _normalize_term(
    tok: str, prefixes: dict[str, str] | None = None
) -> tuple[str, object]:
    """Classify one token (normalization per MyOpVisitorBase.java:74-78)."""
    if tok[0] in "?$":
        if not re.fullmatch(r"\w+", tok[1:]):
            # catches path operators glued to a variable predicate (?p+)
            # and plain malformed names — reject, don't bind silently
            raise SparqlSyntaxError(f"malformed variable name: {tok!r}")
        return ("var", tok[1:])
    if tok.startswith('"') and tok.endswith('"'):
        if _TERM_STYLE.get() == "lexical":
            # plain literal: the dictionary term IS the quoted source
            # bytes (SPARQL and N-Triples share the backslash escapes,
            # so keeping them means byte equality — no unescape pass)
            return ("term", tok)
        return ("term", _unescape(tok[1:-1]))
    if tok.startswith('"') and "^^" in tok:
        body, dt = tok.rsplit("^^", 1)
        if not (body.startswith('"') and body.endswith('"')):
            raise SparqlSyntaxError(f"malformed typed literal: {tok!r}")
        if _TERM_STYLE.get() == "lexical":
            # keep the full '^^<datatype>' lexical form (expanding a
            # prefixed datatype name) with the body's SOURCE bytes (the
            # escapes are shared with N-Triples — see the plain-literal
            # branch); NEVER collapse integers to ids — in a built
            # dictionary ids are ranks, unrelated to values
            dt_slot = _normalize_term(dt, prefixes)
            if dt_slot[0] != "term":
                raise SparqlSyntaxError(f"malformed typed literal: {tok!r}")
            return ("term", f"{body}^^{dt_slot[1]}")
        # xsd integer types collapse to the id data model; any other
        # datatype has no representation here — reject
        dt_slot = _normalize_term(dt, prefixes)
        # local datatype name: strip prefix/IRI path and any #fragment —
        # the final colon segment, so declared (':integer'), undeclared
        # ('xsd:integer') and full-IRI forms all localize identically
        dt_local = (
            str(dt_slot[1])
            .rsplit("#", 1)[-1]
            .rsplit("/", 1)[-1]
            .rsplit(":", 1)[-1]
        )
        if (
            dt_slot[0] == "term"
            and ":" + dt_local in _INT_DATATYPES
            and re.fullmatch(r"-?\d+", body[1:-1])
        ):
            return ("id", int(body[1:-1]))
        # any OTHER datatype: a typed literal term — canonical dictionary
        # text '"lex"^^:localdt' (datatype localized like every IRI), so
        # DATATYPE(?x) and constant matches work over the term text
        if dt_slot[0] == "term" and re.fullmatch(r"\w+", dt_local):
            return ("term", f'"{_unescape(body[1:-1])}"^^:{dt_local}')
        raise SparqlSyntaxError(
            f"unsupported typed literal {tok!r} (xsd integer datatypes "
            "collapse to ids; other datatypes need a simple local name)"
        )
    if tok.startswith('"') and "@" in tok:
        # language-tagged literal (RDF 1.1 §3.3): canonical dictionary
        # text keeps the quotes and a LOWERCASE tag — '"chat"@EN' and
        # '"chat"@en' are the same term (BCP47 tags are case-insensitive)
        body, tag = tok.rsplit("@", 1)
        if (
            body.startswith('"')
            and body.endswith('"')
            and len(body) >= 2
            and re.fullmatch(r"[A-Za-z][A-Za-z0-9-]*", tag)
        ):
            if _TERM_STYLE.get() == "lexical":
                # body and tag as WRITTEN: lexical-form dictionaries
                # store the source bytes — escapes included (shared with
                # N-Triples), and BCP47 case-folding is the caller's
                # normalization decision at ingest time, not the query's
                return ("term", f"{body}@{tag}")
            return ("term", f'"{_unescape(body[1:-1])}"@{tag.lower()}')
        raise SparqlSyntaxError(
            f"malformed language-tagged literal: {tok!r}"
        )
    if tok.startswith("<") and tok.endswith(">"):
        inner = tok[1:-1]
        base = (prefixes or {}).get("@base")
        if base and not _IRI_SCHEME.match(inner):
            # RFC 3986 resolution against the prolog's BASE (§4.1.1);
            # schemed IRIs are absolute and pass through untouched
            inner = _resolve_against_base(base, inner)
        if _TERM_STYLE.get() == "lexical":
            return ("term", f"<{inner}>")  # the '<iri>' IS the dictionary term
        return ("term", _localize_iri(inner))
    if tok.startswith("_:") or tok == "[]":
        # blank nodes in a query are existential variables (§19.8 /
        # §18.1.1 RDF instance mapping): lower to hidden internal vars —
        # `_:label` keeps its label (co-referring within the query),
        # `[]` is fresh per occurrence. Hidden from SELECT * like path
        # intermediates. Treating them as dictionary TERMS would silently
        # match nothing; this is the semantics Jena gave the reference.
        if tok == "[]":
            return ("var", f"__bn_anon{next(_BNODE_IDS)}")
        if not re.fullmatch(r"\w+", tok[2:]):
            raise SparqlSyntaxError(f"malformed blank node label: {tok!r}")
        return ("var", f"__bn_{tok[2:]}")
    if re.fullmatch(r"-?\d+", tok):
        if _TERM_STYLE.get() == "lexical":
            # SPARQL's bare-integer shorthand means "42"^^xsd:integer
            # (§19.2 numeric literals); in a BUILT dictionary ids are
            # lexicographic ranks, so treating the number as a raw id
            # (the reference convention below) would silently match
            # whatever term happens to hold that rank
            return (
                "term",
                f'"{tok}"^^<http://www.w3.org/2001/XMLSchema#integer>',
            )
        return ("id", int(tok))
    if _TERM_STYLE.get() == "lexical":
        # the remaining §19.2 bare shorthands, normalized to the SAME
        # canonical typed-literal text the Turtle ingest writes
        # (sources/turtle.py read_term) so pattern constants match
        # ingested terms byte-for-byte
        xsd = "http://www.w3.org/2001/XMLSchema#"
        if re.fullmatch(r"[+-]?\d*\.\d+", tok):
            return ("term", f'"{tok}"^^<{xsd}decimal>')
        if re.fullmatch(r"[+-]?(?:\d+\.\d*|\.?\d+)[eE][+-]?\d+", tok):
            return ("term", f'"{tok}"^^<{xsd}double>')
        if tok in ("true", "false"):
            return ("term", f'"{tok}"^^<{xsd}boolean>')
    # prefixed name: expand via the declared PREFIX mapping (as Jena's
    # front-end did before normalization), then localize exactly like a
    # full IRI. Undeclared prefixes (incl. bare ':name') stay verbatim —
    # the dictionary stores terms in that form.
    if prefixes and ":" in tok:
        pfx, local = tok.split(":", 1)
        if pfx in prefixes:
            if _TERM_STYLE.get() == "lexical":
                return ("term", f"<{prefixes[pfx] + local}>")
            return ("term", _localize_iri(prefixes[pfx] + local))
    return ("term", tok)


def _tokenize_filter(src: str) -> list[str]:
    toks: list[str] = []
    pos = 0
    while pos < len(src):
        m = _FILTER_TOKEN.match(src, pos)
        if not m:
            if src[pos:].strip():
                raise SparqlSyntaxError(
                    f"unsupported FILTER expression at {src[pos:].strip()!r} "
                    "(supported: ?var OP number|?var with OP in = != < <= > >=, "
                    "combined with && || ! and parentheses)"
                )
            break
        toks.append(m.group(1))
        pos = m.end()
    return toks


def _localize_datatype(tok: str) -> str:
    """Normalize a datatype IRI / prefixed name from a FILTER to the
    engine's localized ':name' form (same convention as _localize_iri);
    xsd integer datatypes collapse to ':integer' — the DATATYPE() value
    of a dictionary-absent id in the typed-int data model."""
    if tok.startswith("<") and tok.endswith(">"):
        local = tok[1:-1].rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    elif ":" in tok:
        local = tok.rsplit(":", 1)[-1]
    else:
        raise SparqlSyntaxError(
            f"DATATYPE comparisons take a datatype IRI or prefixed "
            f"name, got {tok!r}"
        )
    if not re.fullmatch(r"\w+", local):
        raise SparqlSyntaxError(f"malformed datatype IRI: {tok!r}")
    return ":integer" if ":" + local in _INT_DATATYPES else ":" + local


# decimal / double lexical forms in FILTER comparisons (never valid ids —
# ids are integers — so a decimal constant always means a VALUE comparison)
_DEC_RE = re.compile(r"-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+")
# datatypes whose typed literals compare by NUMERIC VALUE (§17.3 operand
# mapping); integer datatypes are absent because they collapse to ids
_NUM_VAL_DATATYPES = frozenset({":decimal", ":double", ":float"})
_DATE_LEX = re.compile(r"\d{4}-\d{2}-\d{2}")
_DT_LEX = re.compile(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?")


def _classify_filter_literal(tok: str, src: str):
    """Classify a quoted FILTER-comparison constant (optional ^^datatype):

    → ('int', n)       integer-datatype lexical — ids ARE the values
    → ('vnum', float)  decimal / double / float — compared by VALUE
    → ('vdate', lex)   xsd:date — compared by VALUE
    → ('vdt', lex)     xsd:dateTime (no timezone) — compared by VALUE
    → ('text', canon)  no / other datatype — term IDENTITY only (=, !=),
                       canon being the canonical dictionary text
    """
    if "^^" not in tok:
        if _TERM_STYLE.get() == "lexical":
            # lexical-form dictionaries store plain literals QUOTED with
            # their source bytes — term identity compares that exact text
            return ("text", tok)
        return ("text", _unescape(tok[1:-1]))
    body, dt = tok.rsplit("^^", 1)
    lex = _unescape(body[1:-1])
    local = _localize_datatype(dt)
    if local == ":integer":
        if not re.fullmatch(r"-?\d+", lex):
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: integer-typed literal "
                f"with non-integer lexical form {lex!r}"
            )
        if _TERM_STYLE.get() == "lexical":
            # ids are lexicographic ranks in a built dictionary, so an
            # integer-typed literal compares by numeric VALUE (§17.3),
            # never as a raw id
            return ("vnum", float(lex))
        return ("int", int(lex))
    if local in _NUM_VAL_DATATYPES:
        try:
            return ("vnum", float(lex))
        except ValueError:
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: numeric-typed literal "
                f"with non-numeric lexical form {lex!r}"
            ) from None
    if local == ":date":
        if not _DATE_LEX.fullmatch(lex):
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: xsd:date literal must "
                f"be YYYY-MM-DD, got {lex!r}"
            )
        return ("vdate", lex)
    if local == ":dateTime":
        if not _DT_LEX.fullmatch(lex):
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: xsd:dateTime literal "
                "must be YYYY-MM-DDTHH:MM:SS[.fff] (no timezone), got "
                f"{lex!r}"
            )
        return ("vdt", lex)
    if _TERM_STYLE.get() == "lexical":
        if dt.startswith("<") and dt.endswith(">"):
            # full-IRI datatype: the canonical lexical term keeps the
            # body's source bytes and the '^^<iri>' verbatim
            return ("text", f"{body}^^{dt}")
        raise SparqlSyntaxError(
            f"bad FILTER expression {src!r}: on a lexical store a "
            "typed-literal term equality needs the datatype as a full "
            f"<iri> (prefixed name {dt!r} cannot be expanded here)"
        )
    return ("text", f'"{lex}"^^{local}')


_MIRROR_OP = {"=": "=", "!=": "!=", "<": ">", "<=": ">=", ">": "<", ">=": "<="}

_STR_EXPR_FNS = (
    "substr", "strbefore", "strafter", "replace", "concat", "ucase", "lcase",
    "md5", "sha1", "sha256", "sha384", "sha512",
)
# §17.4.4.10-14 hash functions: unary, lowercase-hex, deterministic —
# cross-engine exact (DuckDB md5()/sha256() match)
_HASH_FNS = ("md5", "sha1", "sha256", "sha384", "sha512")


def _parse_bind_body(body_expr: str):
    """Classify + parse one BIND / SELECT-expression body (the two share
    this lowering per §18.2.4.4): a term-kind accessor (LANG / DATATYPE /
    STR → termfn_expr), a §17.5 constructor cast (xsd:T → cast_expr;
    xsd:string ≡ STR), a §17.4.3 string manipulation (→ strexpr), or
    integer arithmetic (the default)."""
    tm = re.fullmatch(
        r"\s*(LANG|DATATYPE|STR)\s*\(\s*([?$]\w+)\s*\)\s*",
        body_expr,
        re.I,
    )
    if tm:
        return ("termfn_expr", tm.group(1).lower(), tm.group(2)[1:])
    cm = re.fullmatch(
        r"\s*xsd:(integer|decimal|double|float|date"
        r"|dateTime|string)\s*\(\s*"
        r"(?:STR\s*\(\s*([?$]\w+)\s*\)|([?$]\w+))\s*\)\s*",
        body_expr,
        re.I,
    )
    if cm:
        kind = _XSD_CAST_KINDS[cm.group(1).lower()]
        src_v = (cm.group(2) or cm.group(3))[1:]
        return (
            ("termfn_expr", "str", src_v)
            if kind == "string"
            else ("cast_expr", kind, src_v)
        )
    am = re.fullmatch(
        r"\s*(YEAR|MONTH|DAY|HOURS|MINUTES|SECONDS|FLOOR|CEIL|ROUND)"
        r"\s*\(\s*([?$]\w+)\s*\)\s*",
        body_expr,
        re.I,
    )
    if am:
        # §17.4.5 date/time component accessors and §17.4.4 numeric
        # rounders (r7): typed-VALUE computations over the term text —
        # they ride the cast lowering (planner `_term_cast`)
        return ("cast_expr", am.group(1).lower(), am.group(2)[1:])
    sl = re.fullmatch(r'\s*"(?:[^"\\]|\\.)*"\s*', body_expr)
    if sl:
        # BIND("literal" AS ?v): a constant string column (r7)
        return ("strexpr", ("slit", _unescape(body_expr.strip()[1:-1])))
    lm = re.fullmatch(
        r"\s*STRLEN\s*\(\s*(?:STR\s*\(\s*([?$]\w+)\s*\)|([?$]\w+))\s*\)\s*",
        body_expr,
        re.I,
    )
    if lm:
        # BIND(STRLEN([STR(]?x[)]) AS ?n) (§17.4.3.2, r7): term-text
        # length as a numeric target — rides the cast lowering
        return ("cast_expr", "strlen", (lm.group(1) or lm.group(2))[1:])
    nd = re.match(r"\s*(NOW|RAND|UUID|STRUUID)\s*\(", body_expr, re.I)
    if nd:
        if (
            nd.group(1).upper() == "NOW"
            and _CLOCK.get() is not None
            and re.fullmatch(r"\s*NOW\s*\(\s*\)\s*", body_expr, re.I)
        ):
            # fixed-clock fold (r12): NOW() under an explicit
            # `clock=` becomes a CONSTANT xsd:dateTime literal term —
            # the exact lowering STRDT("…", xsd:dateTime) produces,
            # so value comparisons/accessors see a normal typed
            # literal. Determinism holds: the constant is part of the
            # parsed query, identical across reruns and task retries.
            dt = (
                "<http://www.w3.org/2001/XMLSchema#dateTime>"
                if _TERM_STYLE.get() == "lexical"
                else _localize_datatype("xsd:dateTime")
            )
            return ("strexpr", ("strdt", ("slit", _CLOCK.get()), dt))
        # deliberate stance (r8, SPARQL.md "Known deviations"): a
        # per-evaluation clock/RNG breaks the engine's re-runnable
        # hash-verified contract, and a Spark task RETRY would observe a
        # different value than the lost attempt — pass timestamps via
        # VALUES, use the deterministic md5-bucket sampling operators
        raise SparqlSyntaxError(
            f"{nd.group(1).upper()}() is deliberately unsupported: "
            "nondeterministic built-ins break re-executable task "
            "semantics (a retried Spark task would see a different "
            "value); bind timestamps via VALUES, pass an explicit "
            "clock (Engine.sparql(..., clock=…) / --clock folds a "
            "bare NOW() to that constant), or use the engine's "
            "deterministic sampling operators"
        )
    if re.match(
        r"\s*(?:SUBSTR|STRBEFORE|STRAFTER|REPLACE|CONCAT|UCASE|LCASE"
        r"|MD5|SHA1|SHA256|SHA384|SHA512"
        r"|ENCODE_FOR_URI|STRLANG|STRDT|IRI|URI)\s*\(",
        body_expr,
        re.I,
    ):
        return ("strexpr", _parse_str_expr(body_expr))
    if re.match(r"\s*(?:COALESCE|IF)\s*\(", body_expr, re.I):
        # COALESCE and IF are shared between the numeric grammar
        # (COALESCE(?a, 0), IF(?a > 1, 2, 3)) and the string grammar
        # (COALESCE(STR(?x), "none"), IF(?a > 1, "hi", "lo")) —
        # numeric first, string fallback
        try:
            return _parse_arith_expr(body_expr)
        except SparqlSyntaxError:
            return ("strexpr", _parse_str_expr(body_expr))
    return _parse_arith_expr(body_expr)


def _parse_str_expr(src: str):
    """String-manipulation BIND expression (§17.4.3, r7): SUBSTR /
    STRBEFORE / STRAFTER / REPLACE / CONCAT / UCASE / LCASE over STR(?x),
    bare variables, string literals, and each other (arbitrarily nested).

    AST nodes:
      ('slit', text)                string literal
      ('sof', var)                  STR(?x) — the term's lexical text
      ('svar', var)                 bare ?x in string position (planner:
                                    a string-valued BIND target is used
                                    as-is, an id variable means STR(?x))
      ('substr', sub, start, len|None)     1-based (XPath fn:substring)
      ('strbefore'|'strafter', sub, sep)   sep a string LITERAL
      ('replace', sub, pat, rep, flags)    regex replace, flags '' | 'i'
      ('concat', (args...))
      ('ucase'|'lcase', sub)
    """
    toks = _tokenize_filter(src)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        if pos >= len(toks) or (
            expected is not None and toks[pos] != expected
        ):
            raise SparqlSyntaxError(
                f"bad string expression {src!r}: expected "
                f"{expected or 'a term'}, got {peek()!r}"
            )
        pos += 1
        return toks[pos - 1]

    def str_lit(what: str) -> str:
        t = take()
        if not (t.startswith('"') and t.endswith('"')):
            raise SparqlSyntaxError(
                f"bad string expression {src!r}: {what} must be a string "
                f"literal, got {t!r}"
            )
        return _unescape(t[1:-1])

    def int_lit(what: str) -> int:
        t = take()
        if not re.fullmatch(r"\d+", t):
            raise SparqlSyntaxError(
                f"bad string expression {src!r}: {what} must be a "
                f"non-negative integer, got {t!r}"
            )
        return int(t)

    def sexpr():
        t = take()
        up = t.lower()
        if t.startswith('"'):
            if "^^" in t:
                raise SparqlSyntaxError(
                    f"bad string expression {src!r}: typed literals have "
                    "no string value here; use a plain literal"
                )
            return ("slit", _unescape(t[1:-1]))
        if t.startswith(("?", "$")):
            return ("svar", t[1:])
        if up == "str" and peek() == "(":
            take("(")
            v = take()
            if not v.startswith(("?", "$")):
                raise SparqlSyntaxError(
                    f"bad string expression {src!r}: STR takes a "
                    f"variable, got {v!r}"
                )
            take(")")
            return ("sof", v[1:])
        if up in ("ucase", "lcase") and peek() == "(":
            take("(")
            a = sexpr()
            take(")")
            return (up, a)
        if up in _HASH_FNS and peek() == "(":
            take("(")
            a = sexpr()
            take(")")
            return ("hash", up, a)
        if up == "encode_for_uri" and peek() == "(":
            # §17.4.3.11: percent-encode everything outside the RFC 3986
            # unreserved set, uppercase hex
            take("(")
            a = sexpr()
            take(")")
            return ("encuri", a)
        if up == "strlang" and peek() == "(":
            # §17.4.2.8: construct a language-tagged literal TERM — the
            # result is the engine's canonical term text '"lex"@tag'
            # (lowercase tag, the dictionary convention), so it compares
            # and joins against stored terms
            take("(")
            a = sexpr()
            take(",")
            tag = str_lit("STRLANG language tag")
            take(")")
            if not re.fullmatch(r"[A-Za-z]+(?:-[A-Za-z0-9]+)*", tag):
                raise SparqlSyntaxError(
                    f"bad string expression {src!r}: STRLANG tag must be "
                    f"a BCP-47 shape, got {tag!r}"
                )
            return ("strlang", a, tag.lower())
        if up == "strdt" and peek() == "(":
            # §17.4.2.9: construct a typed literal TERM — canonical text
            # '"lex"^^:localdt' with the datatype localized exactly like
            # every constant IRI (shared _localize_datatype)
            take("(")
            a = sexpr()
            take(",")
            dt = take()
            take(")")
            # lexical style keeps a full '<iri>' datatype verbatim (the
            # built-dictionary convention); prefixed datatype names still
            # localize — the string-expr grammar carries no PREFIX map,
            # so full-IRI datatypes are the lexical-mode spelling
            if _TERM_STYLE.get() == "lexical" and dt.startswith("<"):
                return ("strdt", a, dt)
            return ("strdt", a, _localize_datatype(dt))
        if up in ("iri", "uri") and peek() == "(":
            # §17.4.2.6: construct an IRI TERM from the string value in
            # the AMBIENT term style (captured here, applied by the
            # planner): localized (last '/'-segment, leading ':' — the
            # reference normalization MyOpVisitorBase.java:74-78) or the
            # lexical '<iri>' form, so the result matches the
            # dictionary's convention either way
            take("(")
            a = sexpr()
            take(")")
            return ("iri", a, _TERM_STYLE.get())
        if up == "substr" and peek() == "(":
            take("(")
            a = sexpr()
            take(",")
            start = int_lit("SUBSTR start")
            ln = None
            if peek() == ",":
                take()
                ln = int_lit("SUBSTR length")
            take(")")
            return ("substr", a, start, ln)
        if up in ("strbefore", "strafter") and peek() == "(":
            take("(")
            a = sexpr()
            take(",")
            sep = str_lit(f"{up.upper()} separator")
            take(")")
            return (up, a, sep)
        if up == "replace" and peek() == "(":
            take("(")
            a = sexpr()
            take(",")
            pat = str_lit("REPLACE pattern")
            take(",")
            rep = str_lit("REPLACE replacement")
            flags = ""
            if peek() == ",":
                take()
                fl = take()
                if fl != '"i"':
                    raise SparqlSyntaxError(
                        f"bad string expression {src!r}: REPLACE supports "
                        f'only the "i" flag, got {fl!r}'
                    )
                flags = "i"
            take(")")
            return ("replace", a, pat, rep, flags)
        if up == "if" and peek() == "(":
            # string IF (§17.4.1.2 over string branches): the condition
            # is the FILTER grammar's numeric/BOUND subset (string
            # leaves inside the condition reject at compile — they would
            # need their own term attachment)
            nonlocal pos
            take("(")
            depth = 0
            cond_toks = []
            while pos < len(toks):
                t2 = toks[pos]
                if t2 == "(":
                    depth += 1
                elif t2 == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif t2 == "," and depth == 0:
                    break
                cond_toks.append(t2)
                pos += 1
            if not cond_toks:
                raise SparqlSyntaxError(
                    f"bad string expression {src!r}: empty IF condition"
                )
            cond = _parse_filter_expr(" ".join(cond_toks))
            take(",")
            a = sexpr()
            take(",")
            b = sexpr()
            take(")")
            return ("sif", cond, a, b)
        if up in ("concat", "coalesce") and peek() == "(":
            take("(")
            args = [sexpr()]
            while peek() == ",":
                take()
                args.append(sexpr())
            take(")")
            # string COALESCE (§17.4.1.3 over string expressions): the
            # post-OPTIONAL fallback idiom COALESCE(STR(?x), "none")
            return ("concat" if up == "concat" else "scoalesce", tuple(args))
        raise SparqlSyntaxError(
            f"bad string expression {src!r}: expected a string function, "
            f"STR(?x), a variable, or a string literal, got {t!r}"
        )

    node = sexpr()
    if pos != len(toks):
        raise SparqlSyntaxError(
            f"bad string expression {src!r}: trailing tokens {toks[pos:]!r}"
        )
    return node


def strexpr_vars(node) -> set[str]:
    """All variables referenced by a string-expression AST."""
    k = node[0]
    if k == "slit":
        return set()
    if k in ("sof", "svar"):
        return {node[1]}
    if k in ("concat", "scoalesce"):
        return set().union(*(strexpr_vars(a) for a in node[1]))
    if k == "sif":
        return (
            filter_expr_vars(node[1])
            | strexpr_vars(node[2])
            | strexpr_vars(node[3])
        )
    if k == "hash":
        return strexpr_vars(node[2])
    return strexpr_vars(node[1])  # unary wrappers / first operand


# §17.5 constructor casts: canonical spelling of the supported targets
_XSD_CAST_KINDS = {
    "integer": "integer",
    "decimal": "decimal",
    "double": "double",
    "float": "float",
    "date": "date",
    "datetime": "dateTime",
    "string": "string",
}


def _literal_cmp_leaf(var: str, op: str, lit_tok: str, src: str):
    """Build the comparison leaf for `?var <op> <quoted literal>` from the
    literal's classification: integer-typed → the legacy numeric-id leaf;
    decimal/double/float/date/dateTime → a VALUE comparison
    ('valcmp', var, op, kind, value) evaluated over the dictionary term
    text (kind ∈ 'num' | 'date' | 'dt'); anything else → term identity
    ('streq'), =/!= only."""
    kind, v = _classify_filter_literal(lit_tok, src)
    if kind == "int":
        return (var, op, ("num", v))
    if kind == "vnum":
        return ("valcmp", var, op, "num", v)
    if kind == "vdate":
        return ("valcmp", var, op, "date", v)
    if kind == "vdt":
        return ("valcmp", var, op, "dt", v)
    if op not in ("=", "!="):
        raise SparqlSyntaxError(
            f"bad FILTER expression {src!r}: ordering comparisons need a "
            "numeric- or date-typed literal; plain / unknown-datatype "
            "literals support = and != (term identity) only"
        )
    return ("streq", var, v, op == "!=")


def _parse_filter_expr(src: str, prefixes: dict[str, str] | None = None):
    """Recursive-descent parse of a FILTER expression into the AST above.
    Precedence (SPARQL 1.1 §17, same as C): ! > && > ||. ``prefixes``
    (the query's PREFIX map) resolves prefixed-name IRI constants in
    term-equality comparisons (`?x != :b`); callers without a prefix
    map in scope (string-expression IF conditions) pass None and full
    ``<iri>`` spellings still work."""
    toks = _tokenize_filter(src)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        if pos >= len(toks) or (expected is not None and toks[pos] != expected):
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: expected "
                f"{expected or 'a term'}, got {peek()!r}"
            )
        pos += 1
        return toks[pos - 1]

    def or_expr():
        node = and_expr()
        while peek() == "||":
            take()
            node = ("or", node, and_expr())
        return node

    def and_expr():
        node = unary()
        while peek() == "&&":
            take()
            node = ("and", node, unary())
        return node

    def unary():
        if peek() == "!":
            take()
            return ("not", unary())
        if peek() == "(":
            take()
            node = or_expr()
            take(")")
            return node
        return comparison()

    def strfn_call(name: str):
        """`NAME([STR(]?var[)], "pattern"[, "i"])` → strfn leaf."""
        take("(")
        arg = take()
        if arg.lower() == "str":  # optional STR(?x) wrapper (§17.4.2.5)
            take("(")
            arg = take()
            take(")")
        if not arg.startswith(("?", "$")):
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: {name.upper()} takes a "
                f"variable (optionally STR(?var)), got {arg!r}"
            )
        take(",")
        pat = take()
        if not (pat.startswith('"') and pat.endswith('"')):
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: {name.upper()} pattern "
                f"must be a string literal, got {pat!r}"
            )
        flags = ""
        if peek() == ",":
            take()
            fl = take()
            if name != "regex" or fl != '"i"':
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: only REGEX supports a "
                    f'flags argument, and only "i", got {fl!r}'
                )
            flags = "i"
        take(")")
        return ("strfn", name, arg[1:], _unescape(pat[1:-1]), flags)

    def arith_operand():
        """One comparison side: an integer-arithmetic expression over
        variables and literals (the BIND grammar, §17.3 operator
        mappings), parsed in-place from this token stream."""
        nonlocal pos

        def peek_a():
            return toks[pos] if pos < len(toks) else None

        def take_a(expected=None):
            nonlocal pos
            if pos >= len(toks) or (
                expected is not None and toks[pos] != expected
            ):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: expected "
                    f"{expected or 'an operand'}, got {peek_a()!r}"
                )
            pos += 1
            return toks[pos - 1]

        def split_negative():
            t = peek_a()
            if t is not None and re.fullmatch(r"-\d+", t):
                toks[pos] = t[1:]
                toks.insert(pos, "-")

        def add_expr():
            node = mul_expr()
            split_negative()
            while peek_a() in ("+", "-"):
                o = take_a()
                node = (o, node, mul_expr())
                split_negative()
            return node

        def mul_expr():
            node = atom()
            while peek_a() in ("*", "/"):
                o = take_a()
                node = (o, node, atom())
            return node

        def if_cond_a():
            neg = False
            while peek_a() == "!":
                take_a()
                neg = not neg
            if peek_a() is not None and peek_a().upper() == "BOUND":
                take_a()
                take_a("(")
                v = take_a()
                if not v.startswith(("?", "$")):
                    raise SparqlSyntaxError(
                        f"bad FILTER expression {src!r}: BOUND takes a "
                        "variable"
                    )
                take_a(")")
                node = ("bound", v[1:])
            else:
                left = add_expr()
                o = take_a()
                if o not in _CMP_OPS:
                    raise SparqlSyntaxError(
                        f"bad FILTER expression {src!r}: IF condition must "
                        f"be [!]BOUND(?v) or a comparison, got {o!r}"
                    )
                node = ("icmp", o, left, add_expr())
            return ("not", node) if neg else node

        def atom():
            if peek_a() == "(":
                take_a()
                node = add_expr()
                take_a(")")
                return node
            t = take_a()
            up = t.upper()
            # same §17.4 functional forms as the BIND grammar — the AST
            # nodes are shared, so one compiler serves both
            if up in ("ABS", "COALESCE", "IF") and peek_a() == "(":
                take_a("(")
                if up == "ABS":
                    node = ("abs", add_expr())
                    take_a(")")
                    return node
                if up == "COALESCE":
                    args = [add_expr()]
                    while peek_a() == ",":
                        take_a()
                        args.append(add_expr())
                    take_a(")")
                    return ("coalesce", args)
                cond = if_cond_a()
                take_a(",")
                then = add_expr()
                take_a(",")
                els = add_expr()
                take_a(")")
                return ("if", cond, then, els)
            if t.startswith(("?", "$")):
                return ("var", t[1:])
            if re.fullmatch(r"-?\d+", t):
                return ("num", int(t))
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: expected a variable, "
                f"integer, or parenthesized arithmetic, got {t!r}"
            )

        return add_expr()

    def in_list(var: str, negated: bool):
        """`?v [NOT] IN (x1, x2, ...)` (§17.4.1.9-10): integer ids and/or
        string terms. Integers → ('in', var, ids, negated); strings →
        ('strin', var, texts, negated) — resolved to ids at plan time via
        the same bounded lookup as term equality. A mixed list is the
        disjunction of the two leaves (conjunction when negated — De
        Morgan over the not-equals)."""
        take("(")
        ints: list[int] = []
        texts: list[str] = []
        while True:
            t = take()
            if re.fullmatch(r"-?\d+", t):
                ints.append(int(t))
            elif t.startswith('"'):
                # plain or typed literal: IN is a term-identity test on
                # this engine (one id per distinct term), so a typed
                # literal resolves through the SAME normalization as a
                # BGP constant — integer datatypes to ids, anything else
                # to its canonical dictionary text
                slot = _normalize_term(t)
                (ints if slot[0] == "id" else texts).append(slot[1])
            elif t.startswith("<") or re.fullmatch(r"\w*:\w+", t):
                # IRI constants (r12): `?x IN (:a, <http://…/b>)` is the
                # same term-identity test — the canonical term text
                # resolves to its id through the bounded dictionary
                # lookup the strin leaf already performs
                slot = _normalize_term(t, prefixes)
                if slot[0] == "id":
                    ints.append(slot[1])
                elif slot[0] == "term":
                    texts.append(slot[1])
                else:
                    raise SparqlSyntaxError(
                        f"bad FILTER expression {src!r}: IN lists take "
                        f"constants, got {t!r}"
                    )
            else:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: IN lists take "
                    f"integer, string, or IRI constants, got {t!r}"
                )
            t = take()
            if t == ")":
                break
            if t != ",":
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: expected ',' or ')' "
                    f"in IN list, got {t!r}"
                )
        leaves = []
        if ints:
            leaves.append(("in", var, tuple(ints), negated))
        if texts:
            leaves.append(("strin", var, tuple(texts), negated))
        if not leaves:
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: empty IN list"
            )
        if len(leaves) == 1:
            return leaves[0]
        return ("and" if negated else "or", leaves[0], leaves[1])

    def streq_rhs(var_tok: str):
        """Finish a term-equality comparison `<var-side> =|!= "literal"`
        (§17.4.1.7 on this engine's term model: every distinct term has one
        id, so string equality IS id identity). AST: ('streq', var, text,
        negated) — a 4-tuple distinguished by its 'streq' tag."""
        op = take()
        lit = take()
        if not (lit.startswith('"') and lit.endswith('"')):
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: term equality takes a "
                f"string literal, got {lit!r}"
            )
        if _TERM_STYLE.get() == "lexical":
            # the stored term is the QUOTED source-bytes form
            return ("streq", var_tok[1:], lit, op == "!=")
        return ("streq", var_tok[1:], _unescape(lit[1:-1]), op == "!=")

    def comparison():
        nonlocal pos
        lhs = take()
        if lhs.lower() == "bound" and peek() == "(":
            # BOUND(?v) (§17.4.1.1): true iff the variable is bound — the
            # one filter form that maps unbound to plain FALSE (not error);
            # with ! it is SPARQL 1.0's negation-as-failure idiom
            take("(")
            v = take()
            if not v.startswith(("?", "$")):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: BOUND takes a "
                    f"variable, got {v!r}"
                )
            take(")")
            return ("bound", v[1:])
        if lhs.lower() == "sameterm" and peek() == "(":
            # sameTerm(?a, ?b) (§17.4.1.8): term identity IS id equality
            # in the dictionary-encoded model (one id per distinct
            # term), so it lowers to the plain equality leaf — unbound →
            # error → filter-false, same as `=`; !sameTerm via the
            # `not` unary. Constant operands: use a pattern constant
            # instead (the planner's constant-encoding path) — rejected
            # here to keep FILTER compilation dictionary-free.
            take("(")
            a = take()
            take(",")
            b = take()
            take(")")
            if not (
                a.startswith(("?", "$")) and b.startswith(("?", "$"))
            ):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: sameTerm takes two "
                    f"variables (for a constant, put the term in the "
                    f"pattern), got {a!r}, {b!r}"
                )
            return (a[1:], "=", ("var", b[1:]))

        def _take_var_arg(fname: str) -> str:
            take("(")
            v = take()
            if not v.startswith(("?", "$")):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: {fname} takes a "
                    f"variable, got {v!r}"
                )
            take(")")
            return v[1:]

        if lhs.lower() in ("lang", "datatype") and peek() == "(":
            # LANG(?x) = "en" / DATATYPE(?x) = xsd:date (§17.4.2.6-7):
            # term-kind accessors over the dictionary text — the planner
            # attaches the term column (same join as REGEX) and compiles
            # the kind/lang/datatype derivation as column expressions.
            # AST: ('termfn', fn, var, normalized-value, negated).
            fn = lhs.lower()
            v = _take_var_arg(fn.upper())
            op = take()
            if op not in ("=", "!="):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: {fn.upper()}() "
                    f"comparisons support = and != only, got {op!r}"
                )
            rhs = take()
            if fn == "lang":
                if not (rhs.startswith('"') and rhs.endswith('"')):
                    raise SparqlSyntaxError(
                        f"bad FILTER expression {src!r}: LANG() compares "
                        f"against a string literal, got {rhs!r}"
                    )
                value = _unescape(rhs[1:-1]).lower()
            else:
                value = _localize_datatype(rhs)
            return ("termfn", fn, v, value, op == "!=")
        if lhs.lower() == "langmatches" and peek() == "(":
            # LANGMATCHES(LANG(?x), "range") (§17.4.3.20, basic
            # filtering): range "*" matches any tagged literal; otherwise
            # the tag equals the range or extends it with a subtag.
            take("(")
            t2 = take()
            if t2.lower() != "lang":
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: LANGMATCHES takes "
                    f"LANG(?var) as its first argument, got {t2!r}"
                )
            v = _take_var_arg("LANG")
            take(",")
            rng = take()
            if not (rng.startswith('"') and rng.endswith('"')):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: LANGMATCHES range "
                    f"must be a string literal, got {rng!r}"
                )
            take(")")
            return ("langmatches", v, _unescape(rng[1:-1]).lower())
        if (
            lhs.lower() in ("isiri", "isuri", "isliteral", "isblank", "isnumeric")
            and peek() == "("
        ):
            # type-checking predicates (§17.4.2.1-4): booleans over the
            # term kind. isNumeric is true exactly for integer literals
            # (dictionary-absent ids) — the engine's only numeric kind.
            kind = {
                "isiri": "iri",
                "isuri": "iri",
                "isliteral": "literal",
                "isblank": "blank",
                "isnumeric": "numeric",
            }[lhs.lower()]
            v = _take_var_arg(lhs)
            return ("termis", kind, v)
        def _take_str_var(fname: str) -> tuple[str, bool]:
            """Argument of a string accessor: `?v` or `STR(?v)`. The
            second slot records whether STR() was WRITTEN — §17.4.3
            functions over a bare term error on non-strings (the
            dictionary-absent integer literal drops), while an explicit
            STR() gives every term a lexical form, integer literals
            their decimal one (r8 — the DuckDB fuzz caught the two
            forms being conflated)."""
            take("(")
            t2 = take()
            if t2.lower() == "str":
                v = _take_var_arg("STR")
                take(")")
                return v, True
            if t2.startswith(("?", "$")):
                v = t2[1:]
            else:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: {fname} takes a "
                    f"variable or STR(?var), got {t2!r}"
                )
            take(")")
            return v, False

        if lhs.lower() == "strlen" and peek() == "(":
            # STRLEN(STR(?x)) <op> n (§17.4.3.2): term LENGTH compared to
            # an integer — evaluated over the dictionary term text (same
            # join as REGEX); null-intolerant, so the dict join
            # inner-izes and the length predicate pushes to the dict scan
            v, has_str = _take_str_var("STRLEN")
            op = take()
            if op not in _CMP_OPS:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: STRLEN comparison "
                    f"needs an operator, got {op!r}"
                )
            num = take()
            if not re.fullmatch(r"-?\d+", num):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: STRLEN compares "
                    f"against an integer, got {num!r}"
                )
            return ("strlen", v, op, int(num), has_str)
        if (
            lhs.lower()
            in (
                "year", "month", "day", "hours", "minutes", "seconds",
                "floor", "ceil", "round",
            )
            and peek() == "("
        ):
            # date/time accessor / numeric-rounder comparison (r7):
            # YEAR(?d) >= 2020, FLOOR(?p) = 19 — a typed-VALUE
            # computation vs a numeric constant, riding the castcmp
            # lowering (the kind names a `_term_cast` derivation)
            kind = lhs.lower()
            take("(")
            v = take()
            if not v.startswith(("?", "$")):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: {lhs.upper()}() "
                    f"takes a variable, got {v!r}"
                )
            take(")")
            op = take()
            if op not in _CMP_OPS:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: {lhs.upper()} "
                    f"comparison needs an operator, got {op!r}"
                )
            lit = take()
            if _DEC_RE.fullmatch(lit) or re.fullmatch(r"-?\d+", lit):
                rv = float(lit)
            elif lit.startswith('"'):
                k2, v2 = _classify_filter_literal(lit, src)
                if k2 == "int":
                    rv = float(v2)
                elif k2 == "vnum":
                    rv = v2
                else:
                    raise SparqlSyntaxError(
                        f"bad FILTER expression {src!r}: {lhs.upper()} "
                        f"compares against a numeric constant"
                    )
            else:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: {lhs.upper()} "
                    f"compares against a numeric constant, got {lit!r}"
                )
            return ("castcmp", kind, v[1:], op, "num", rv)
        if (
            re.fullmatch(
                r"xsd:(integer|decimal|double|float|date|dateTime)",
                lhs,
                re.I,
            )
            and peek() == "("
        ):
            # explicit-cast comparison (§17.5 operand, r7):
            # xsd:T([STR(]?x[)]) <op> constant — the cast VALUE compared
            # against a matching-family constant
            kind = _XSD_CAST_KINDS[lhs.split(":", 1)[1].lower()]
            take("(")
            v = take()
            if v.lower() == "str" and peek() == "(":
                take("(")
                v = take()
                take(")")
            if not v.startswith(("?", "$")):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: {lhs}() takes a "
                    f"variable (optionally STR(?var)), got {v!r}"
                )
            take(")")
            op = take()
            if op not in _CMP_OPS:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: cast comparison "
                    f"needs an operator, got {op!r}"
                )
            lit = take()
            if _DEC_RE.fullmatch(lit):
                rk, rv = "num", float(lit)
            elif re.fullmatch(r"-?\d+", lit):
                rk, rv = "num", float(lit)
            elif lit.startswith('"'):
                k2, v2 = _classify_filter_literal(lit, src)
                if k2 == "int":
                    rk, rv = "num", float(v2)
                elif k2 == "vnum":
                    rk, rv = "num", v2
                elif k2 in ("vdate", "vdt"):
                    rk, rv = k2[1:], v2
                else:
                    raise SparqlSyntaxError(
                        f"bad FILTER expression {src!r}: cast comparison "
                        f"constant must be numeric or date-typed"
                    )
            else:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: cast comparison "
                    f"constant must be a number or typed literal, got "
                    f"{lit!r}"
                )
            want_rk = {"date": "date", "dateTime": "dt"}.get(kind, "num")
            if rk != want_rk:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: xsd:{kind} cast "
                    f"compared against a non-{kind} constant"
                )
            return ("castcmp", kind, v[1:], op, rk, rv)
        if (
            lhs.lower() in _STR_EXPR_FNS
            and peek() == "("
            and not (
                # simple UCASE/LCASE(?v|STR(?v)) keeps the dedicated
                # dictionary-side 'strcase' leaf below (type-strict:
                # integer literals have no term text and DROP); every
                # other string-expression form — SUBSTR/STRBEFORE/
                # STRAFTER/REPLACE/CONCAT and nested UCASE/LCASE — takes
                # the general strexpr comparison (r7)
                lhs.lower() in ("ucase", "lcase")
                and pos + 1 < len(toks)
                and (
                    toks[pos + 1].startswith(("?", "$"))
                    or toks[pos + 1].lower() == "str"
                )
            )
        ):
            # FN(...) <op> "literal": re-render the call's token span and
            # parse it with the string-expression grammar
            start = pos - 1
            depth = 0
            j = pos
            while j < len(toks):
                if toks[j] == "(":
                    depth += 1
                elif toks[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: unbalanced parens in "
                    f"{lhs.upper()}(...)"
                )
            expr_src = " ".join(toks[start : j + 1])
            pos = j + 1
            tree = _parse_str_expr(expr_src)
            op = take()
            if op not in _CMP_OPS:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: string-expression "
                    f"comparison needs an operator, got {op!r}"
                )
            lit = take()
            if not (lit.startswith('"') and lit.endswith('"')):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: string-expression "
                    f"comparison takes a string literal, got {lit!r}"
                )
            return ("strexprcmp", tree, op, _unescape(lit[1:-1]))
        if lhs.lower() in ("ucase", "lcase") and peek() == "(":
            # UCASE/LCASE(STR(?x)) =|!= "literal" (§17.4.3.4-5):
            # case-folded term equality, dictionary-side
            fn = lhs.lower()
            v, has_str = _take_str_var(fn.upper())
            op = take()
            if op not in ("=", "!="):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: {fn.upper()}() "
                    f"comparisons support = and != only, got {op!r}"
                )
            lit = take()
            if not (lit.startswith('"') and lit.endswith('"')):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: {fn.upper()}() "
                    f"compares against a string literal, got {lit!r}"
                )
            return (
                "strcase", fn, v, _unescape(lit[1:-1]), op == "!=", has_str
            )
        if lhs.lower() == "str" and peek() == "(":
            # STR(?x) = "literal": localized = term equality (§17.4.2.5
            # wrapper over the term model, id pushdown); lexical = a
            # string comparison over the DERIVED STR value (so "Bob"
            # matches '"Bob"', '"Bob"@en' and '<Bob>' alike — the spec's
            # simple-literal comparison, not raw term text)
            take("(")
            v = take()
            if not v.startswith(("?", "$")):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: STR takes a "
                    f"variable, got {v!r}"
                )
            take(")")
            if peek() not in ("=", "!="):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: STR() comparisons "
                    f"support = and != only, got {peek()!r}"
                )
            if _TERM_STYLE.get() == "lexical":
                op = take()
                lit = take()
                if not (lit.startswith('"') and lit.endswith('"')):
                    raise SparqlSyntaxError(
                        f"bad FILTER expression {src!r}: STR() compares "
                        f"against a string literal, got {lit!r}"
                    )
                return (
                    "strexprcmp", ("sof", v[1:]), op, _unescape(lit[1:-1])
                )
            return streq_rhs(v)
        if _DEC_RE.fullmatch(lhs):
            # reversed bare-decimal form `19.5 < ?x`
            op = take()
            if op not in _CMP_OPS:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: a decimal constant "
                    f"can only appear in a comparison, got {op!r}"
                )
            v = take()
            if not v.startswith(("?", "$")):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: a decimal comparison "
                    f"takes a variable on the other side, got {v!r}"
                )
            return ("valcmp", v[1:], _MIRROR_OP[op], "num", float(lhs))
        if lhs.startswith('"'):
            # reversed form `"literal" <op> ?x` (plain or typed literal):
            # mirror the operator and reuse the var-on-the-left leaves
            op = take()
            if op not in _CMP_OPS:
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: a literal can only "
                    f"be compared with {_CMP_OPS}, got {op!r}"
                )
            v = take()
            if not v.startswith(("?", "$")):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: a literal comparison "
                    f"takes a variable on the other side, got {v!r}"
                )
            return _literal_cmp_leaf(v[1:], _MIRROR_OP[op], lhs, src)
        if lhs.lower() in _STR_FNS and peek() == "(":
            return strfn_call(lhs.lower())
        if lhs.startswith(("?", "$")):
            nxt = peek()
            if (
                nxt in _CMP_OPS
                and pos + 1 < len(toks)
                and (
                    toks[pos + 1].startswith('"')
                    or _DEC_RE.fullmatch(toks[pos + 1])
                )
            ):
                # ?x <op> literal: plain `?x = "lit"` term equality (the
                # most common real-world FILTER form), typed-literal VALUE
                # comparisons (`?d >= "2020-02-15"^^xsd:date`,
                # `?p > "19.5"^^xsd:decimal`), and bare decimal constants
                # (`?p > 19.5` — never a valid id, so always by value)
                op = take()
                lit = take()
                if _DEC_RE.fullmatch(lit):
                    return ("valcmp", lhs[1:], op, "num", float(lit))
                return _literal_cmp_leaf(lhs[1:], op, lit, src)
            if (
                nxt in ("=", "!=")
                and pos + 1 < len(toks)
                and (
                    toks[pos + 1].startswith("<")
                    or re.fullmatch(r"\w*:\w+", toks[pos + 1])
                )
            ):
                # `?x =|!= <iri>` / `pfx:name` — TERM equality against
                # an IRI constant (§17.4.1.7 on the id model: term
                # identity IS id identity). Lowers to the same 'streq'
                # leaf as literal term equality — the planner resolves
                # the canonical term text to its id with the bounded
                # dictionary lookup, so the comparison runs as a plain
                # id equi-filter, never a string scan.
                op = take()
                slot = _normalize_term(take(), prefixes)
                if slot[0] != "term":
                    raise SparqlSyntaxError(
                        f"bad FILTER expression {src!r}: expected an "
                        "IRI constant after the comparison"
                    )
                return ("streq", lhs[1:], slot[1], op == "!=")
            if nxt is not None and nxt.lower() == "in":
                take()
                return in_list(lhs[1:], negated=False)
            if (
                nxt is not None
                and nxt.lower() == "not"
                and pos + 1 < len(toks)
                and toks[pos + 1].lower() == "in"
            ):
                take()
                take()
                return in_list(lhs[1:], negated=True)
        pos -= 1  # un-take: the operand parser re-reads lhs
        l_expr = arith_operand()
        op = take()
        if op not in _CMP_OPS:
            raise SparqlSyntaxError(
                f"bad FILTER expression {src!r}: expected comparison "
                f"operator, got {op!r}"
            )
        r_expr = arith_operand()
        # legacy leaf shape when both sides are simple (the form every
        # existing consumer and test pins): (var, op, ('num'|'var', x))
        if l_expr[0] == "var" and r_expr[0] in ("num", "var"):
            if (
                _TERM_STYLE.get() == "lexical"
                and r_expr[0] == "var"
                and op not in ("=", "!=")
            ):
                raise SparqlSyntaxError(
                    f"bad FILTER expression {src!r}: on a lexical store "
                    "an ordered variable-variable comparison would "
                    "compare rank-assigned dictionary ids (meaningless "
                    "order); compare each variable against typed "
                    "constants, or use xsd:T(?x) cast comparisons"
                )
            return (l_expr[1], op, r_expr)
        return ("cmp", l_expr, op, r_expr)

    node = or_expr()
    if pos != len(toks):
        raise SparqlSyntaxError(
            f"bad FILTER expression {src!r}: trailing tokens {toks[pos:]!r}"
        )
    return node


def filter_expr_vars(node) -> set[str]:
    """All variables referenced by a FILTER expression AST."""
    if isinstance(node[1], str) and node[1] in _CMP_OPS:  # comparison leaf
        var, _, rhs = node
        return {var} | ({rhs[1]} if rhs[0] == "var" else set())
    if len(node) == 4 and node[0] == "cmp":  # arithmetic comparison leaf
        return arith_expr_vars(node[1]) | arith_expr_vars(node[3])
    if len(node) == 4 and node[0] in ("in", "streq", "strin"):
        return {node[1]}  # [NOT] IN (ids/terms) / term-equality
    if len(node) == 2 and node[0] == "bound":  # BOUND leaf
        return {node[1]}
    if len(node) == 5 and node[0] == "strfn":  # string-function leaf
        return {node[2]}
    if len(node) == 5 and node[0] == "valcmp":  # typed-value comparison
        return {node[1]}
    if len(node) == 4 and node[0] == "strexprcmp":  # string-expression cmp
        return strexpr_vars(node[1])
    if len(node) == 6 and node[0] == "castcmp":  # explicit-cast comparison
        return {node[2]}
    if len(node) == 5 and node[0] == "termfn":  # LANG/DATATYPE leaf
        return {node[2]}
    if len(node) == 3 and node[0] == "termis":  # isIRI/isLiteral/... leaf
        return {node[2]}
    if len(node) == 3 and node[0] == "langmatches":
        return {node[1]}
    if len(node) == 5 and node[0] == "strlen":  # STRLEN comparison leaf
        return {node[1]}
    if len(node) == 6 and node[0] == "strcase":  # UCASE/LCASE equality
        return {node[2]}
    if node[0] == "not":
        return filter_expr_vars(node[1])
    return filter_expr_vars(node[1]) | filter_expr_vars(node[2])


def filter_expr_strfn_vars(node) -> set[str]:
    """Variables appearing inside string-function leaves — the planner
    attaches a dictionary term column for each before compiling. (streq
    leaves are NOT included: term equality resolves its literal to an id
    and needs no term column.)"""
    if isinstance(node[1], str) and node[1] in _CMP_OPS:
        return set()
    if len(node) == 4 and node[0] in ("cmp", "in", "streq", "strin"):
        return set()
    if len(node) == 2 and node[0] == "bound":
        return set()
    if len(node) == 5 and node[0] == "strfn":
        return {node[2]}
    if len(node) == 5 and node[0] == "valcmp":
        return {node[1]}  # value derivation reads the term text
    if len(node) == 4 and node[0] == "strexprcmp":
        return strexpr_vars(node[1])  # every referenced var needs a term
    if len(node) == 6 and node[0] == "castcmp":
        return {node[2]}  # the cast reads the term text
    if len(node) == 5 and node[0] == "termfn":
        return {node[2]}  # accessors read the term text too
    if len(node) == 3 and node[0] == "termis":
        return {node[2]}
    if len(node) == 3 and node[0] == "langmatches":
        return {node[1]}
    if len(node) == 5 and node[0] == "strlen":
        return {node[1]}
    if len(node) == 6 and node[0] == "strcase":
        return {node[2]}
    if node[0] == "not":
        return filter_expr_strfn_vars(node[1])
    return filter_expr_strfn_vars(node[1]) | filter_expr_strfn_vars(node[2])


def filter_expr_barecmp_vars(node) -> set[str]:
    """Variables compared against a BARE numeric constant
    (`?x > 40` — the legacy id-comparison leaf). Under
    ``term_style="lexical"`` the planner evaluates these by typed
    numeric VALUE (ids are lexicographic ranks there), which needs the
    term attach this collector drives; localized plans never call it."""
    if isinstance(node[1], str) and node[1] in _CMP_OPS:
        var, _, rhs = node
        return {var} if rhs[0] == "num" else set()
    if len(node) == 4 and node[0] == "cmp":
        # arithmetic comparison leaf (FILTER(?x > 5+0)): every variable
        # operand needs the same typed-value routing as the bare form —
        # raw ids are lexicographic ranks on lexical stores (r10 ADVICE)
        return arith_expr_vars(node[1]) | arith_expr_vars(node[3])
    if node[0] == "not":
        return filter_expr_barecmp_vars(node[1])
    if len(node) == 3 and node[0] in ("and", "or"):
        return filter_expr_barecmp_vars(node[1]) | filter_expr_barecmp_vars(
            node[2]
        )
    return set()


def filter_expr_term_vars(node) -> set[str]:
    """Variables whose TERM (dictionary entry) the expression reads —
    the string-function leaves plus term-equality / term-IN leaves
    (which resolve their literal to an id and compare identities).
    Used to reject HAVING over COMPUTED group keys (r7): a BIND-target
    key is a value, not a dictionary id, so any term-semantics leaf
    over it would silently misinterpret."""
    if len(node) == 4 and node[0] in ("streq", "strin"):
        return {node[1]}
    if isinstance(node[1], str) and node[1] in _CMP_OPS:
        return filter_expr_strfn_vars(node)
    if node[0] == "not":
        return filter_expr_term_vars(node[1])
    if len(node) == 3 and node[0] in ("and", "or"):
        return filter_expr_term_vars(node[1]) | filter_expr_term_vars(
            node[2]
        )
    return filter_expr_strfn_vars(node)


def filter_expr_streq_literals(node) -> set[str]:
    """String literals in term-equality leaves — the planner resolves each
    via ONE bounded dictionary lookup (never a term join) and compiles an
    id equality; a literal absent from the dictionary appears in no triple
    and constant-folds."""
    if isinstance(node[1], str) and node[1] in _CMP_OPS:
        return set()
    if len(node) == 4 and node[0] == "streq":
        return {node[2]}
    if len(node) == 4 and node[0] == "strin":  # term IN-list literals
        return set(node[2])
    if len(node) == 4 and node[0] in ("cmp", "in"):
        return set()
    if len(node) == 2 and node[0] == "bound":
        return set()
    if len(node) == 5 and node[0] == "strfn":
        return set()
    if len(node) == 5 and node[0] == "valcmp":
        return set()  # the constant is a value, never a dictionary id
    if len(node) == 4 and node[0] == "strexprcmp":
        return set()  # compared against the computed string, not an id
    if len(node) == 6 and node[0] == "castcmp":
        return set()  # the constant is a value, never a dictionary id
    if len(node) == 5 and node[0] == "termfn":
        return set()  # LANG/DATATYPE values compare as strings, not ids
    if len(node) == 3 and node[0] in ("termis", "langmatches"):
        return set()
    if len(node) == 5 and node[0] == "strlen":
        return set()
    if len(node) == 6 and node[0] == "strcase":
        return set()  # case-folded match cannot resolve to one id
    if node[0] == "not":
        return filter_expr_streq_literals(node[1])
    return filter_expr_streq_literals(node[1]) | filter_expr_streq_literals(
        node[2]
    )


def _parse_arith_expr(src: str):
    """Recursive-descent parse of a BIND arithmetic expression:
    `*` binds tighter than `+`/`-`; leaves are variables, integers, and
    the §17.4 functional forms ABS(e), COALESCE(e, ...), and
    IF(cond, then, else) with cond = [!]BOUND(?v) or an arithmetic
    comparison — the unbound-handling toolkit that pairs with the
    engine's compatible-bindings joins."""
    toks = _tokenize_filter(src)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        if pos >= len(toks) or (expected is not None and toks[pos] != expected):
            raise SparqlSyntaxError(
                f"bad BIND expression {src!r}: expected "
                f"{expected or 'a term'}, got {peek()!r}"
            )
        pos += 1
        return toks[pos - 1]

    def split_negative():
        # `?a -3` lexed the operand as one negative number; re-split it
        # into a subtraction when a binary operator is expected here
        nonlocal pos
        t = peek()
        if t is not None and re.fullmatch(r"-\d+", t):
            toks[pos] = t[1:]
            toks.insert(pos, "-")

    def add_expr():
        node = mul_expr()
        split_negative()
        while peek() in ("+", "-"):
            op = take()
            node = (op, node, mul_expr())
            split_negative()
        return node

    def mul_expr():
        node = atom()
        while peek() in ("*", "/"):
            op = take()
            node = (op, node, atom())
        return node

    def if_cond():
        neg = False
        while peek() == "!":
            take()
            neg = not neg
        if peek() is not None and peek().upper() == "BOUND":
            take()
            take("(")
            v = take()
            if not v.startswith(("?", "$")):
                raise SparqlSyntaxError(
                    f"bad BIND expression {src!r}: BOUND takes a variable"
                )
            take(")")
            node = ("bound", v[1:])
        else:
            left = add_expr()
            op = take()
            if op not in _CMP_OPS:
                raise SparqlSyntaxError(
                    f"bad BIND expression {src!r}: IF condition must be "
                    f"[!]BOUND(?v) or an arithmetic comparison, got {op!r}"
                )
            node = ("icmp", op, left, add_expr())
        return ("not", node) if neg else node

    def atom():
        if peek() == "(":
            take()
            node = add_expr()
            take(")")
            return node
        t = take()
        up = t.upper()
        if up in ("ABS", "COALESCE", "IF") and peek() == "(":
            take("(")
            if up == "ABS":
                node = ("abs", add_expr())
                take(")")
                return node
            if up == "COALESCE":
                args = [add_expr()]
                while peek() == ",":
                    take()
                    args.append(add_expr())
                take(")")
                return ("coalesce", args)
            cond = if_cond()
            take(",")
            then = add_expr()
            take(",")
            els = add_expr()
            take(")")
            return ("if", cond, then, els)
        if t.startswith(("?", "$")):
            return ("var", t[1:])
        if re.fullmatch(r"-?\d+", t):
            return ("num", int(t))
        raise SparqlSyntaxError(
            f"bad BIND expression {src!r}: expected a variable, integer, "
            f"or parenthesized expression, got {t!r}"
        )

    node = add_expr()
    if pos != len(toks):
        raise SparqlSyntaxError(
            f"bad BIND expression {src!r}: trailing tokens {toks[pos:]!r}"
        )
    return node


def arith_expr_vars(node) -> set[str]:
    """All variables referenced by a BIND arithmetic expression AST."""
    k = node[0]
    if k == "var":
        return {node[1]}
    if k == "num":
        return set()
    if k == "termfn_expr":  # BIND(LANG/DATATYPE(?x) AS ?y)
        return {node[2]}
    if k == "cast_expr":  # BIND(xsd:T(?x) AS ?y) (§17.5)
        return {node[2]}
    if k == "strexpr":  # BIND(SUBSTR/CONCAT/... AS ?y) (§17.4.3)
        return strexpr_vars(node[1])
    if k == "abs":
        return arith_expr_vars(node[1])
    if k == "coalesce":
        return set().union(*(arith_expr_vars(a) for a in node[1]))
    if k == "if":
        return (
            _cond_vars(node[1])
            | arith_expr_vars(node[2])
            | arith_expr_vars(node[3])
        )
    return arith_expr_vars(node[1]) | arith_expr_vars(node[2])


def _cond_vars(node) -> set[str]:
    if node[0] == "bound":
        return {node[1]}
    if node[0] == "not":
        return _cond_vars(node[1])
    return arith_expr_vars(node[2]) | arith_expr_vars(node[3])


_PATH_OPERATOR = re.compile(r"[*+!?]")
# internal variables introduced by sequence-path expansion; hidden from
# SELECT * projections
_PATH_VAR_PREFIX = "__pp"


def _expand_path(
    s_tok: str,
    p_tok: str,
    o_tok: str,
    prefixes: dict[str, str],
    path_counter,
) -> list[list[TriplePattern]]:
    """Expand a property path in the predicate slot (SPARQL 1.1 §9.1,
    grammar precedence `|` < `/` < `^`): returns one pattern list per
    `|`-alternative. A sequence `p1/p2/.../pn` becomes the join chain
    through fresh internal variables — exactly the 2-hop shape the engine
    already builds by hand (queries.py two_hop /
    MyOpVisitorBase.java:132-133's intent); an inverse step `^p` swaps the
    subject and object sides of its single pattern; alternation callers
    lower the arms to a synthesized UNION block. Non-path predicates pass
    through as one single-pattern alternative. Tokens this flat expansion
    cannot express — closure operators, grouping parens, composed negated
    sets — raise, and the caller falls back to the full §9.1 path-AST
    parser (`_parse_path_expr`) whose relations the planner compiles."""
    plain = not p_tok.startswith(('"', "<", "?", "$"))
    if plain and p_tok.startswith("(") and p_tok.endswith(")"):
        inner = p_tok[1:-1]
        if "(" in inner or ")" in inner or not inner:
            raise SparqlSyntaxError(f"unsupported property path {p_tok!r}")
        p_tok = inner
    if plain and (_PATH_OPERATOR.search(p_tok) or "(" in p_tok or ")" in p_tok):
        # closure operators or grouping parens inside the expression: not
        # expressible as a flat join chain — the caller falls back to the
        # full §9.1 path-AST parser (`_parse_path_expr`)
        raise SparqlSyntaxError(
            f"unsupported property path {p_tok!r} "
            "(supported: sequence p1/p2, alternation p1|p2, inverse ^p, "
            "closure p+)"
        )
    if not (plain and any(op in p_tok for op in "/|^")):
        return [
            [TriplePattern(*(_normalize_term(t, prefixes) for t in (s_tok, p_tok, o_tok)))]
        ]
    alternatives: list[list[TriplePattern]] = []
    for alt in p_tok.split("|"):
        segs = alt.split("/")
        if any(not seg or seg == "^" for seg in segs):
            raise SparqlSyntaxError(f"malformed property path: {p_tok!r}")
        out: list[TriplePattern] = []
        subj = _normalize_term(s_tok, prefixes)
        for i, seg in enumerate(segs):
            inverse = seg.startswith("^")
            pred = _normalize_term(seg[1:] if inverse else seg, prefixes)
            if "^" in (seg[1:] if inverse else seg):
                raise SparqlSyntaxError(f"malformed property path: {p_tok!r}")
            if i == len(segs) - 1:
                obj = _normalize_term(o_tok, prefixes)
            else:
                obj = ("var", f"{_PATH_VAR_PREFIX}{next(path_counter)}")
            out.append(
                TriplePattern(obj, pred, subj)
                if inverse
                else TriplePattern(subj, pred, obj)
            )
            subj = obj
        alternatives.append(out)
    return alternatives


# closure-family path `p+` / `p*` / `p?` (optionally parenthesized): a
# single plain constant predicate with one trailing operator. The mode
# char is kept: + = one-or-more (reachability), * = zero-or-more
# (reachability ∪ zero-length), ? = zero-or-one (single hop ∪ zero-length).
# Zero-length semantics follow §18.4's ZeroLengthPath: with both endpoints
# variable it binds every term OF THE GRAPH (distinct subjects ∪ objects)
# to itself; a constant endpoint matches itself regardless of membership.
# This fast path keeps the single-predicate closure on the seeded-BFS
# machinery; COMPOSITE paths containing closures — `(p1|p2)+`, `p1/(p2*)`,
# `^(p1/p2)+` — parse below into a full path AST (`_parse_path_expr`) the
# planner compiles to a pair relation.
_CLOSURE = re.compile(r"^\(?([^/|^*+!?()\s]+)([*+?])\)?$")

# characters that delimit a predicate name inside a path expression
_PATH_DELIMS = frozenset("/|^*+?()")


def _parse_path_expr(src: str, prefixes: dict[str, str]):
    """Full property-path expression parser (SPARQL 1.1 §9.1 grammar):
    precedence `|` < `/` < unary `^` / postfix `* + ?`, parentheses for
    grouping. Returns an AST over nodes
        ('pred', slot) | ('inv', a) | ('seq', [a, ...]) |
        ('alt', [a, ...]) | ('clos', a, '*'|'+'|'?')
    Per the grammar, `^p*` parses as `(^p)*` (the inverse binds to the
    path primary, the modifier to the whole element). Predicates must be
    constants — a variable or negated set inside a composite path is
    malformed."""
    pos, n = 0, len(src)

    def error():
        raise SparqlSyntaxError(f"malformed property path: {src!r}")

    def peek():
        return src[pos] if pos < n else None

    def alt():
        parts = [seq()]
        while peek() == "|":
            advance()
            parts.append(seq())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    def seq():
        parts = [elt()]
        while peek() == "/":
            advance()
            parts.append(elt())
        return parts[0] if len(parts) == 1 else ("seq", parts)

    def advance():
        nonlocal pos
        pos += 1

    def elt():
        inv = False
        if peek() == "^":
            advance()
            inv = True
        node = atom()
        if inv:
            node = ("inv", node)
        while peek() in ("*", "+", "?"):
            node = ("clos", node, src[pos])
            advance()
        return node

    def pred_name():
        nonlocal pos
        start = pos
        while pos < n and src[pos] not in _PATH_DELIMS and src[pos] != "!":
            pos += 1
        name = src[start:pos]
        if not name or name[0] in "?$\"":
            error()
        slot = _normalize_term(name, prefixes)
        if slot[0] == "var":
            error()
        return slot

    def atom():
        nonlocal pos
        if peek() == "!":
            # negated property set (§9.1 PathNegatedPropertySet): !p,
            # !(p1|p2|...), with inverse members per the spec identity
            #   !(P1|..|Pn|^Q1|..|^Qm) ≡ !(P1|..|Pn) | ^!(Q1|..|Qm)
            # — a NOT-IN scan over the forward members unioned with the
            # column-swap of a NOT-IN scan over the inverse members
            advance()
            fwd: list = []
            inv: list = []

            def member():
                if peek() == "^":
                    advance()
                    inv.append(pred_name())
                else:
                    fwd.append(pred_name())

            if peek() == "(":
                advance()
                member()
                while peek() == "|":
                    advance()
                    member()
                if peek() != ")":
                    error()
                advance()
            else:
                member()
            parts = []
            if fwd:
                parts.append(("npred", tuple(fwd)))
            if inv:
                parts.append(("inv", ("npred", tuple(inv))))
            return parts[0] if len(parts) == 1 else ("alt", parts)
        if peek() == "(":
            advance()
            node = alt()
            if peek() != ")":
                error()
            advance()
            return node
        return ("pred", pred_name())

    node = alt()
    if pos != n:
        error()
    return node


def path_expr_has_closure(node) -> bool:
    k = node[0]
    if k in ("pred", "npred"):
        return False
    if k == "clos":
        return True
    if k == "inv":
        return path_expr_has_closure(node[1])
    return any(path_expr_has_closure(c) for c in node[1])


def path_expr_terms(node) -> set[str]:
    """Term constants inside a path AST (for the one bounded dictionary
    lookup in the planner's constant encoding)."""
    k = node[0]
    if k == "pred":
        kind, val = node[1]
        return {val} if kind == "term" else set()
    if k == "npred":
        return {val for kind, val in node[1] if kind == "term"}
    if k in ("inv", "clos"):
        return path_expr_terms(node[1])
    return set().union(*(path_expr_terms(c) for c in node[1]))


def _parse_patterns(
    src: str,
    prefixes: dict[str, str],
    path_counter=None,
    alt_blocks: list | None = None,
    closures: list | None = None,
    paths: list | None = None,
) -> list[TriplePattern]:
    """Tokenize the WHOLE pattern source first, then split the token stream
    on statement terminators. Splitting the raw string on "." would chop
    dots inside IRIs (<http://example.org/x> — hostnames always contain
    dots) and inside terms like :node_..._-9.15947_38.70289 (the
    reference's AIS vocabulary, MyOpVisitorBase.java:132).

    Alternation paths (`p1|p2`) lower to a synthesized UNION block appended
    to `alt_blocks` (one arm per alternative); composite paths that need
    relation compilation land in `paths`. The only caller passing None for
    those lists is the CONSTRUCT template parse (templates are plain
    triples — §16.2), which therefore rejects paths explicitly."""
    if path_counter is None:
        path_counter = itertools.count()
    patterns: list[TriplePattern] = []
    cur: list[str] = []

    def _flush() -> None:
        """Statement flush. Predicate-object lists (`;`) and object
        lists (`,`) — the grammar's PropertyListNotEmpty / ObjectList
        abbreviations — expand here into plain triples sharing the
        subject (and predicate); each expanded triple then runs the
        single-triple logic (paths, alternations, closures all work
        in any list position, exactly as if written unabbreviated)."""
        if not cur:
            return
        if ";" in cur or "," in cur:
            groups: list[list[str]] = [[]]
            for t in cur:
                if t == ";":
                    groups.append([])
                else:
                    groups[-1].append(t)
            if len(groups[0]) < 3:
                raise SparqlSyntaxError(
                    f"triple pattern needs 3 terms, got {cur!r}"
                )
            subj = groups[0][0]
            trips: list[list[str]] = []
            for gi, g in enumerate(groups):
                if not g:
                    continue  # a dangling ';' before '.' is legal
                toks = g[1:] if gi == 0 else g
                objs: list[list[str]] = [[]]
                for t in toks[1:]:
                    if t == ",":
                        objs.append([])
                    else:
                        objs[-1].append(t)
                if len(toks) < 2 or any(len(ob) != 1 for ob in objs):
                    raise SparqlSyntaxError(
                        f"malformed predicate-object list at {cur!r}"
                    )
                for ob in objs:
                    trips.append([subj, toks[0], ob[0]])
        else:
            trips = [list(cur)]
        for trip in trips:
            _flush_one(trip)
        cur.clear()

    def _flush_one(trip: list[str]) -> None:
        if len(trip) != 3:
            raise SparqlSyntaxError(
                f"triple pattern needs 3 terms, got {trip!r}"
            )
        if trip[1].startswith("!"):
            # negated property set `!p` / `!(p1|p2|...)` (§9.1): one scan
            # with a NOT-IN predicate filter — no inverse/sequence/closure
            # members, constants only. A negated set COMPOSED with other
            # path operators (`!(:p)/:q`) falls through to the full path
            # AST parser below.
            inner = trip[1][1:]
            if inner.startswith("(") and inner.endswith(")"):
                inner = inner[1:-1]
            alts = inner.split("|")
            if not inner or any(
                not a
                or "/" in a
                or a[0] in "?$^(!"
                or _PATH_OPERATOR.search(a)
                for a in alts
            ):
                if paths is not None:
                    ast = _parse_path_expr(trip[1], prefixes)
                    paths.append(
                        (
                            _normalize_term(trip[0], prefixes),
                            ast,
                            _normalize_term(trip[2], prefixes),
                        )
                    )
                    return
                raise SparqlSyntaxError(
                    f"unsupported negated property set: {trip[1]!r} "
                    "(constant predicates only, e.g. !(:p1|:p2))"
                )
            slots = tuple(_normalize_term(a, prefixes) for a in alts)
            patterns.append(
                TriplePattern(
                    _normalize_term(trip[0], prefixes),
                    ("notin", slots),
                    _normalize_term(trip[2], prefixes),
                )
            )
            return
        cm = (
            _CLOSURE.match(trip[1])
            if not trip[1].startswith(('"', "<", "?", "$"))
            else None
        )
        if cm:
            if closures is None:
                raise SparqlSyntaxError(
                    "closure paths (p+ / p* / p?) are not allowed here "
                    "(CONSTRUCT templates take plain triples)"
                )
            pred = _normalize_term(cm.group(1), prefixes)
            if pred[0] == "var":
                raise SparqlSyntaxError("closure path predicate must be constant")
            closures.append(
                (
                    _normalize_term(trip[0], prefixes),
                    pred,
                    _normalize_term(trip[2], prefixes),
                    cm.group(2),
                )
            )
            return
        try:
            alternatives = _expand_path(*trip, prefixes, path_counter)
        except SparqlSyntaxError:
            # composite path the simple expansion cannot express — nested
            # parens, or a closure operator inside a sequence/alternation
            # (`(p1|p2)+`, `p1/(p2*)`): parse the full §9.1 AST; the
            # planner compiles it to a pair relation. Raise the parse
            # error of the AST parser if the token is malformed outright.
            if paths is None or not (
                trip[1]
                and trip[1][0] not in "\"<?$"
                and any(ch in _PATH_DELIMS for ch in trip[1])
            ):
                raise
            ast = _parse_path_expr(trip[1], prefixes)
            paths.append(
                (
                    _normalize_term(trip[0], prefixes),
                    ast,
                    _normalize_term(trip[2], prefixes),
                )
            )
            return
        if len(alternatives) == 1:
            patterns.extend(alternatives[0])
        elif alt_blocks is None:
            raise SparqlSyntaxError(
                "alternation paths are not allowed here "
                "(CONSTRUCT templates take plain triples)"
            )
        else:
            alt_blocks.append(tuple(tuple(arm) for arm in alternatives))

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
        if tok and not tok.startswith(('"', "<")) and (
            ";" in tok or "," in tok
        ):
            # separators glued to bare terms ("?title;" / ":a,:b") —
            # quoted literals and <iri>s may legally CONTAIN these
            # characters and are excluded above
            for piece in re.split(r"([;,])", tok):
                if piece:
                    cur.append(piece)
        elif tok:
            cur.append(tok)
        if terminate:
            _flush()
    _flush()
    return patterns


def _skip_ws(src: str, i: int) -> int:
    while i < len(src) and src[i].isspace():
        i += 1
    return i


def _scan_delim(src: str, i: int, open_c: str, close_c: str, what: str):
    """src[i] must be `open_c`; return (inner, j) with j past the matching
    `close_c`. Double-quoted literals are skipped (a brace or paren inside
    a string never counts); IRIs cannot legally contain braces or quotes,
    and `<` appears as a comparison operator inside FILTER bodies, so no
    IRI special-casing is needed here."""
    if i >= len(src) or src[i] != open_c:
        raise SparqlSyntaxError(f"expected {open_c!r} to open {what}")
    depth = 0
    n = len(src)
    start = i + 1
    while i < n:
        c = src[i]
        if c == '"':
            i = _skip_string(src, i)
            continue
        if c == open_c:
            depth += 1
        elif c == close_c:
            depth -= 1
            if depth == 0:
                return src[start:i], i + 1
        i += 1
    raise SparqlSyntaxError(f"unbalanced {open_c}{close_c} in {what}")


def _parse_values_rows(vars_: tuple[str, ...], rows_src: str, prefixes):
    """Rows of a multi-variable VALUES block: width check, constants
    only, UNDEF wildcards. Non-disjoint rows parse fine — the planner
    picks the OR-of-ANDs filter or the multiset JOIN lowering by
    checking row unifiability itself."""
    if len(set(vars_)) != len(vars_):
        raise SparqlSyntaxError(f"duplicate VALUES variables: {vars_}")
    rows: list[tuple[tuple[str, object], ...]] = []
    for rm in _VALUES_ROW.finditer(rows_src):
        entries = tuple(
            ("undef", None)
            if t.upper() == "UNDEF"
            else _normalize_term(t, prefixes)
            for t in _TOKEN.findall(rm.group(1))
        )
        if len(entries) != len(vars_):
            raise SparqlSyntaxError(
                f"VALUES row width {len(entries)} != {len(vars_)} variables"
            )
        if any(kind == "var" for kind, _ in entries):
            raise SparqlSyntaxError("VALUES entries must be constants")
        rows.append(entries)
    if _VALUES_ROW.sub(" ", rows_src).strip():
        raise SparqlSyntaxError(f"malformed VALUES rows: {rows_src.strip()!r}")
    if not rows:
        raise SparqlSyntaxError("empty VALUES block")
    # non-disjoint rows (two rows some solution could match) are FINE
    # since r7: the planner routes them through the broadcast-relation
    # JOIN lowering, which produces the spec's multiset duplication the
    # OR-filter form cannot (historically a parse-time reject)
    return (vars_, tuple(rows))


def _parse_group(
    src: str, prefixes: dict[str, str], path_counter, depth: int = 0
) -> GroupPattern:
    """Recursive group-graph-pattern scanner (SPARQL 1.1 §5.2): one linear
    pass over the group source, accumulating triple-pattern text between
    group-level constructs and recursing into every `{ ... }` it meets —
    OPTIONAL/MINUS/FILTER [NOT] EXISTS bodies, UNION arm chains, and plain
    nested subgroups all become child GroupPatterns at arbitrary depth
    (the surface the reference's Jena front-end accepted,
    MyOpVisitorBase.java:49, which the flat regex extraction could not).

    Keyword detection is token-exact: a word counts only at a delimiter
    boundary, so terms like :node_OPTIONAL2 or variables like ?filter
    never trigger. Quoted literals and <IRIs> pass through verbatim.

    A group whose ENTIRE body is a SELECT — a UNION arm `{ SELECT ... }`,
    an OPTIONAL body, or a whole WHERE clause — parses as a subquery
    group (§12), same as the brace-scanned direct form."""
    if re.match(r"\s*SELECT\b", src, re.I):
        sub = parse_sparql(src, outer_prefixes=prefixes)
        if sub.projection is None:
            # SELECT * subquery (§12 + §18.2.4.4): project every visible
            # in-scope variable — pattern-bound vars plus BIND targets
            # down the visible children, minus path/bnode internals —
            # materialized HERE (sorted, deterministic) so the outer
            # group knows the subquery's join surface
            vis = sorted(
                v
                for v in (sub.where.all_vars() | _visible_binds(sub.where))
                if not v.startswith("__pp") and not v.startswith("__bn")
            )
            if not vis:
                raise SparqlSyntaxError(
                    "SELECT * subquery binds no visible variables"
                )
            sub = _dc_replace(sub, projection=tuple(vis))
        return GroupPattern(subselects=(sub,), seq=(("subselect", 0),))
    i, n = 0, len(src)
    buf: list[str] = []
    patterns: list[TriplePattern] = []
    filters: list = []
    binds: list[tuple[str, object]] = []
    optionals: list[GroupPattern] = []
    unions: list[tuple[GroupPattern, ...]] = []
    minuses: list[GroupPattern] = []
    exists: list[tuple[bool, GroupPattern]] = []
    subgroups: list[GroupPattern] = []
    values: list = []
    values_multi: list = []
    alt_blocks: list = []
    closures: list = []
    paths: list = []
    subselects: list = []
    graphs: list = []
    # clauses in WRITTEN order; ("altblock", i) entries are rewritten to
    # union indexes after the scan (alternation-path blocks append to
    # `unions` behind the written UNION blocks)
    seq: list[tuple[str, int]] = []

    def flush():
        text = "".join(buf)
        buf.clear()
        if text.strip():
            np, nc, npp, na = (
                len(patterns), len(closures), len(paths), len(alt_blocks)
            )
            patterns.extend(
                _parse_patterns(
                    text, prefixes, path_counter, alt_blocks, closures, paths
                )
            )
            seq.extend(("pattern", k) for k in range(np, len(patterns)))
            seq.extend(("closure", k) for k in range(nc, len(closures)))
            seq.extend(("path", k) for k in range(npp, len(paths)))
            seq.extend(("altblock", k) for k in range(na, len(alt_blocks)))

    def expect_brace(j: int, what: str):
        j = _skip_ws(src, j)
        return _scan_delim(src, j, "{", "}", what)

    def child(inner: str, empty_msg: str) -> GroupPattern:
        g = _parse_group(inner, prefixes, path_counter, depth + 1)
        if not g.has_required_content():
            raise SparqlSyntaxError(empty_msg)
        return g

    while i < n:
        c = src[i]
        if c == '"':
            j = _skip_string(src, i)
            buf.append(src[i:j])
            i = j
            continue
        if c == "<":
            j = src.find(">", i + 1)
            if j < 0:
                raise SparqlSyntaxError("unterminated IRI")
            buf.append(src[i : j + 1])
            i = j + 1
            continue
        if c == "}":
            raise SparqlSyntaxError("unbalanced '}' in group pattern")
        if c == "{":
            flush()
            inner, i = _scan_delim(src, i, "{", "}", "group pattern")
            arms = [inner]
            while True:  # `{...} UNION {...} [UNION {...}]` chain
                j = _skip_ws(src, i)
                m = _WORD.match(src, j)
                if not (m and m.group(0).upper() == "UNION"):
                    break
                inner2, i = expect_brace(m.end(), "UNION arm")
                arms.append(inner2)
            if len(arms) == 1:
                subgroups.append(child(inner, "empty group pattern"))
                seq.append(("subgroup", len(subgroups) - 1))
            else:
                unions.append(
                    tuple(child(a, "empty UNION arm") for a in arms)
                )
                seq.append(("union", len(unions) - 1))
            continue
        m = _WORD.match(src, i)
        boundary = i == 0 or src[i - 1].isspace() or src[i - 1] in ".{}()"
        if m and boundary and m.group(0).upper() in _GROUP_KEYWORDS:
            kw = m.group(0).upper()
            if kw == "SERVICE":
                raise SparqlSyntaxError(
                    "SERVICE is not supported (no federation)"
                )
            if kw == "GRAPH":
                flush()
                j = _skip_ws(src, m.end())
                gm = re.compile(r"[^\s{]+").match(src, j)
                if not gm:
                    raise SparqlSyntaxError(
                        "GRAPH needs a graph name (?var, <iri> or "
                        "prefixed name) before its group"
                    )
                gslot = _normalize_term(gm.group(0), prefixes)
                if gslot[0] == "notin":
                    raise SparqlSyntaxError(
                        "a negated property set is not a graph name"
                    )
                inner, i = expect_brace(gm.end(), "GRAPH")
                graphs.append((gslot, child(inner, "empty GRAPH group")))
                seq.append(("graph", len(graphs) - 1))
                continue
            if kw == "UNION":
                raise SparqlSyntaxError(
                    "UNION must follow a '{...}' group alternative"
                )
            flush()
            if kw == "OPTIONAL":
                inner, i = expect_brace(m.end(), "OPTIONAL")
                optionals.append(child(inner, "empty OPTIONAL group"))
                seq.append(("optional", len(optionals) - 1))
                continue
            if kw == "MINUS":
                inner, i = expect_brace(m.end(), "MINUS")
                minuses.append(child(inner, "empty MINUS group"))
                seq.append(("minus", len(minuses) - 1))
                continue
            if kw == "FILTER":
                j = _skip_ws(src, m.end())
                m2 = _WORD.match(src, j)
                if m2 and m2.group(0).upper() == "NOT":
                    j2 = _skip_ws(src, m2.end())
                    m3 = _WORD.match(src, j2)
                    if not (m3 and m3.group(0).upper() == "EXISTS"):
                        raise SparqlSyntaxError(
                            "expected EXISTS after FILTER NOT"
                        )
                    inner, i = expect_brace(m3.end(), "FILTER NOT EXISTS")
                    exists.append((True, child(inner, "empty EXISTS group")))
                    seq.append(("exists", len(exists) - 1))
                    continue
                if m2 and m2.group(0).upper() == "EXISTS":
                    inner, i = expect_brace(m2.end(), "FILTER EXISTS")
                    exists.append((False, child(inner, "empty EXISTS group")))
                    seq.append(("exists", len(exists) - 1))
                    continue
                if m2 and j < len(src) and src[j] != "(":
                    # paren-free builtin-call constraint (r11 — the
                    # grammar's `FILTER BuiltInCall` production:
                    # `FILTER regex(?t, "x")`, `FILTER isIRI(?x)`):
                    # re-assemble name(args) — the same text the
                    # bracketted form passes as its body
                    j3 = _skip_ws(src, m2.end())
                    if j3 < len(src) and src[j3] == "(":
                        args, i = _scan_delim(src, j3, "(", ")", "FILTER")
                        filters.append(
                            _parse_filter_expr(
                                f"{m2.group(0)}({args})", prefixes
                            )
                        )
                        continue
                inner, i = _scan_delim(src, j, "(", ")", "FILTER")
                filters.append(_parse_filter_expr(inner, prefixes))
                continue
            if kw == "BIND":
                j = _skip_ws(src, m.end())
                body, i = _scan_delim(src, j, "(", ")", "BIND")
                am = _BIND_AS.search(body)
                if not am:
                    raise SparqlSyntaxError(
                        f"BIND needs the form BIND(expr AS ?var): "
                        f"{body.strip()!r}"
                    )
                body_expr = body[: am.start()]
                # accessor (termfn_expr) / cast (cast_expr) / string
                # manipulation (strexpr) / integer arithmetic — one
                # classification shared with SELECT expression items
                binds.append(
                    (am.group("var"), _parse_bind_body(body_expr))
                )
                seq.append(("bind", len(binds) - 1))
                continue
            # VALUES
            j = _skip_ws(src, m.end())
            if j < n and src[j] in "?$":
                vm = re.compile(r"[?$](\w+)").match(src, j)
                if not vm:
                    raise SparqlSyntaxError("malformed VALUES variable")
                vals_src, i = expect_brace(vm.end(), "VALUES")
                entries = tuple(
                    _normalize_term(tok, prefixes)
                    for tok in _TOKEN.findall(vals_src)
                )
                if not entries:
                    raise SparqlSyntaxError("empty VALUES block")
                if any(kind == "var" for kind, _ in entries):
                    raise SparqlSyntaxError("VALUES entries must be constants")
                values.append((vm.group(1), entries))
                seq.append(("values", len(values) - 1))
                continue
            if j < n and src[j] == "(":
                vars_src, j2 = _scan_delim(src, j, "(", ")", "VALUES")
                toks = vars_src.split()
                if not toks or any(not t.startswith(("?", "$")) for t in toks):
                    raise SparqlSyntaxError(
                        f"unsupported VALUES form: {vars_src.strip()!r}"
                    )
                vars_ = tuple(t.lstrip("?$") for t in toks)
                rows_src, i = expect_brace(j2, "VALUES")
                values_multi.append(
                    _parse_values_rows(vars_, rows_src, prefixes)
                )
                seq.append(("values_multi", len(values_multi) - 1))
                continue
            raise SparqlSyntaxError("unsupported VALUES form")
        buf.append(c)
        i += 1
    flush()
    # alternation paths (§9.1) lower to UNION blocks of single-pattern-list
    # arms: arms join per-arm with the rest of the group exactly like
    # written UNION groups (every arm binds the same endpoint variables)
    n_written_unions = len(unions)
    for blk in alt_blocks:
        unions.append(tuple(GroupPattern(patterns=tuple(arm)) for arm in blk))
    seq = [
        ("union", n_written_unions + k) if kind == "altblock" else (kind, k)
        for kind, k in seq
    ]
    return GroupPattern(
        patterns=tuple(patterns),
        filters=tuple(filters),
        binds=tuple(binds),
        optionals=tuple(optionals),
        unions=tuple(unions),
        minuses=tuple(minuses),
        exists=tuple(exists),
        subgroups=tuple(subgroups),
        values=tuple(values),
        values_multi=tuple(values_multi),
        closures=tuple(closures),
        paths=tuple(paths),
        subselects=tuple(subselects),
        graphs=tuple(graphs),
        seq=tuple(seq),
    )


def _validate_group_tree(
    g: GroupPattern, own_filter_scope: set[str] | None,
    inherited: frozenset[str] = frozenset(),
    nested: bool = False,
) -> None:
    """Structural validation, applied at every level of the group tree.

    `own_filter_scope` is the variable scope this group's DIRECT filters
    may reference, or None when the caller already validated them (an
    OPTIONAL child's direct filters fold into the LeftJoin condition, so
    the PARENT validates them against group-vars ∪ parent-required-vars).
    Every group plans standalone (SPARQL's bottom-up algebra). The ROOT
    group's filters reject unknown variables (a var in no pattern is a
    typo); a NESTED group's filters MAY reference variables the group
    cannot bind — §18.2.2.2 evaluates the group bottom-up, so the
    reference is unbound when the filter runs: comparison → error →
    filter-false, BOUND → false (r6, spec-conformant; the planner
    compiles the unbound reference as a NULL column, fuzz-pinned in
    tests/test_properties.py)."""
    req = g.required_vars() | set(inherited)
    if own_filter_scope is not None:
        own_filter_scope = set(own_filter_scope) | set(inherited)
    if own_filter_scope is not None and not nested:
        for expr in g.filters:
            for v in sorted(filter_expr_vars(expr)):
                if v not in own_filter_scope:
                    raise SparqlSyntaxError(
                        f"FILTER variable not in BGP: ?{v}"
                    )
    # BIND validation (§10.1), per group: the target must be FRESH in its
    # group (the spec makes an in-scope target a syntax error) and the
    # expression may only use THIS group's variables and earlier BIND
    # targets (groups plan standalone — an outer variable would silently
    # be unbound). Variables local to the group's MINUS/EXISTS children
    # are NOT in scope for freshness — but the planner computes BINDs
    # in WRITTEN order (§18.2.2.6): a BIND target named like a
    # MINUS/EXISTS group-local variable is fine — written BEFORE the
    # group, the shared name compares per §8.3 (both domains bind it);
    # written AFTER, the group never saw it and the target is fresh.
    # The planner dispatches clauses textually, so both spellings plan
    # to their written meaning (pinned in test_sparql_compat.py).
    bind_scope = g.all_vars() | set(inherited)
    for bvar, bexpr in g.binds:
        unknown = arith_expr_vars(bexpr) - bind_scope
        if unknown and not nested:
            # ROOT group: a variable in no pattern is a typo. A NESTED
            # group's BIND MAY reference variables the group cannot bind
            # — §18.2.2.2 evaluates the group bottom-up, so the
            # reference is unbound when the BIND runs: expression →
            # error → target unbound (r7, mirroring the nested-group
            # FILTER rule; the planner compiles the reference as a NULL
            # column)
            raise SparqlSyntaxError(
                f"BIND expression variables not in scope: "
                f"{['?' + v for v in sorted(unknown)]}"
            )
        if bvar in bind_scope:
            raise SparqlSyntaxError(f"BIND target is already bound: ?{bvar}")
        bind_scope.add(bvar)
    # VALUES vars may be OPTIONAL-bound (the planner compat-joins the
    # possibly-unbound rows); only a var bound NOWHERE in the group is a
    # typo and rejects
    # BIND targets count for the MINUS/EXISTS share checks and VALUES
    # scoping: a group sharing ONLY a BIND-bound variable is meaningful
    # (§8.3 compares any variable both domains bind). Whether it shares
    # AT THE CLAUSE'S WRITTEN POSITION is the planner's textual dispatch:
    # a MINUS written before the BIND that names its variable is
    # positionally domain-disjoint and removes nothing (spec-correct).
    group_scope = (
        g.all_vars() | set(inherited) | {bvar for bvar, _ in g.binds}
    )
    for var, _ in g.values:
        if var not in group_scope:
            raise SparqlSyntaxError(f"VALUES variable not in BGP: ?{var}")
    for vars_, _ in g.values_multi:
        for var in vars_:
            if var not in group_scope:
                raise SparqlSyntaxError(f"VALUES variable not in BGP: ?{var}")
    for sub in g.subgroups:
        _validate_group_tree(sub, sub.all_vars(), inherited, nested=True)
    # a GRAPH block's graph VARIABLE is in scope throughout the block
    # (§13.3 binds it for the whole enclosed pattern): filters and BIND
    # expressions at any depth inside may reference it, and the BIND
    # freshness check rejects a target that would shadow it
    for gslot, sub in g.graphs:
        child_inh = (
            inherited | {gslot[1]} if gslot[0] == "var" else inherited
        )
        _validate_group_tree(
            sub, sub.all_vars(), frozenset(child_inh), nested=True
        )
    for blk in g.unions:
        for arm in blk:
            _validate_group_tree(arm, arm.all_vars(), inherited, nested=True)
    # an OPTIONAL may key on a variable an EARLIER optional bound (the
    # planner compat-joins the possibly-unbound rows), so the join scope
    # accumulates in textual order; a fully disjoint OPTIONAL still
    # rejects (it would silently cartesian)
    opt_scope = set(req)
    for opt in g.optionals:
        # inside a GRAPH ?g block every child's scans bind ?g (inherited
        # is nonempty only there), so the graph var counts as shared
        if not ((opt.all_vars() | set(inherited)) & opt_scope):
            raise SparqlSyntaxError(
                "OPTIONAL group shares no variable with the required patterns"
            )
        # a group-scoped FILTER may reference the group's own variables and
        # the enclosing group's required ones — SPARQL's LeftJoin(P1, P2, F)
        # scope; variables of SIBLING optional groups are rejected (their
        # binding order would silently change the result)
        scope = opt.all_vars() | req
        for expr in opt.filters:
            for v in sorted(filter_expr_vars(expr)):
                if v not in scope:
                    raise SparqlSyntaxError(
                        f"OPTIONAL FILTER variable not in the group or the "
                        f"required patterns: ?{v}"
                    )
        _validate_group_tree(opt, None, inherited, nested=True)
        opt_scope |= opt.all_vars()
    # MINUS/EXISTS plan after every OPTIONAL, so optional-bound vars are
    # legitimate (compat-joined) keys; a group sharing NOTHING with the
    # enclosing scope still rejects (disjoint-domain MINUS removes
    # nothing per SPARQL — silently keeping everything hides a typo'd
    # variable)
    for grp in g.minuses:
        if (
            _STRICT_MODE.get()
            and not ((grp.all_vars() | set(inherited)) & group_scope)
        ):
            raise SparqlSyntaxError(
                "MINUS group shares no variable with the required patterns"
            )
        _validate_group_tree(grp, grp.all_vars(), inherited, nested=True)
    for _, grp in g.exists:
        if (
            _STRICT_MODE.get()
            and not ((grp.all_vars() | set(inherited)) & group_scope)
        ):
            raise SparqlSyntaxError(
                "EXISTS group shares no variable with the required patterns"
            )
        _validate_group_tree(grp, grp.all_vars(), inherited, nested=True)


def parse_sparql(
    query: str,
    outer_prefixes: dict[str, str] | None = None,
    term_style: str | None = None,
) -> BGPQuery:
    """Parse one query. `outer_prefixes` carries an ENCLOSING query's
    PREFIX declarations into a subquery (§12: subqueries do not redeclare
    prefixes; inner declarations would shadow outer ones).

    ``term_style``: "localized" (default — the reference's dictionary
    convention) or "lexical" (full N-Triples lexical forms, for
    dictionaries built from raw RDF); see ``_TERM_STYLE``. None inherits
    the ambient style, which is how recursive subquery parses stay
    consistent with their outer query."""
    if term_style is not None:
        if term_style not in ("localized", "lexical"):
            raise SparqlSyntaxError(
                f"term_style must be 'localized' or 'lexical', got {term_style!r}"
            )
        token = _TERM_STYLE.set(term_style)
        try:
            return parse_sparql(query, outer_prefixes)
        finally:
            _TERM_STYLE.reset(token)
    ask, tpl_src, describe_var = False, None, None
    dataset_src = ""
    dv = _DESCRIBE_VAR.match(query)
    dt = _DESCRIBE_TERMS.match(query) if not dv else None
    if dt:
        # DESCRIBE with constant resources, no WHERE: short-circuit — the
        # plan is a single filtered scan, no pattern machinery involved
        prefixes = _build_prolog_map(dt.group("prefixes"), None)
        slots = tuple(
            _normalize_term(t, prefixes)
            for t in _TOKEN.findall(dt.group("what"))
        )
        if not slots:
            raise SparqlSyntaxError("DESCRIBE needs at least one resource")
        if any(kind == "var" for kind, _ in slots):
            raise SparqlSyntaxError(
                "DESCRIBE with variables needs a WHERE group "
                "(DESCRIBE ?x WHERE { ... }), one variable only"
            )
        return BGPQuery(
            projection=None,
            describe_terms=slots,
            term_style=_TERM_STYLE.get(),
            prefixes=tuple(
            sorted((k, v) for k, v in prefixes.items() if k != "@base")
        ),
        )
    am = _ASK.match(query)
    cm = _CONSTRUCT.match(query) if not am else None
    cw = _CONSTRUCT_WHERE.match(query) if not (am or cm) else None
    if dv:
        describe_var = dv.group("var")[1:]
        prefixes_src, bgp_src = dv.group("prefixes"), dv.group("bgp")
        proj_src, distinct_src, mods_src = "*", None, ""
        dataset_src = dv.group("dataset") or ""
    elif am:
        # ASK (§16.3): does the pattern have ≥1 solution? Normalized to the
        # SELECT * machinery with the ask flag; no projection or modifiers.
        ask = True
        prefixes_src, bgp_src = am.group("prefixes"), am.group("bgp")
        proj_src, distinct_src, mods_src = "*", None, ""
        dataset_src = am.group("dataset") or ""
    elif cm or cw:
        # CONSTRUCT (§16.2): the template parses after PREFIX resolution;
        # solution modifiers are rejected (the output graph is a set —
        # ordering/slicing solutions would be invisible in it). The
        # §16.2.4 short form CONSTRUCT WHERE { triples } reuses the
        # WHERE text as the template verbatim.
        m_c = cm or cw
        if m_c.group("mods").strip():
            raise SparqlSyntaxError(
                "CONSTRUCT does not take solution modifiers: "
                f"{m_c.group('mods').strip()!r}"
            )
        if cw:
            # §16.2.4 restricts the short form's WHERE to a plain
            # TriplesTemplate — group keywords reject loudly (TOKEN
            # scan, not a text sniff: keywords inside <iri>s or
            # literals never trigger)
            bad = [
                t
                for t in _TOKEN.findall(cw.group("bgp"))
                if not t.startswith(('"', "<"))
                and t.split("(")[0].upper()
                in ("FILTER", "OPTIONAL", "MINUS", "UNION", "GRAPH",
                    "BIND", "VALUES", "SELECT", "SERVICE")
            ]
            if bad:
                raise SparqlSyntaxError(
                    f"CONSTRUCT WHERE takes a plain triples template "
                    f"(§16.2.4), got {bad[0]!r} — use the full "
                    "CONSTRUCT { template } WHERE { patterns } form"
                )
        tpl_src = cm.group("tpl") if cm else cw.group("bgp")
        prefixes_src, bgp_src = m_c.group("prefixes"), m_c.group("bgp")
        proj_src, distinct_src, mods_src = "*", None, ""
        dataset_src = m_c.group("dataset") or ""
    else:
        m = _QUERY.match(query)
        if not m:
            raise SparqlSyntaxError(
                "expected: [PREFIX...] SELECT ?v...|* WHERE { patterns }, "
                "ASK [WHERE] { patterns }, CONSTRUCT { template } WHERE "
                "{ patterns }, DESCRIBE term..., or DESCRIBE ?x (one "
                "variable) WHERE { patterns }"
            )
        prefixes_src = m.group("prefixes")
        proj_src = m.group("proj").strip()
        distinct_src = m.group("distinct")
        dataset_src = m.group("dataset") or ""
        bgp_src, end = _scan_delim(query, m.end(), "{", "}", "WHERE group")
        mods_src = query[end:]
    prefixes = _build_prolog_map(prefixes_src, outer_prefixes)
    # dataset clauses (§13.2): FROM / FROM NAMED graph IRIs normalize
    # exactly like pattern constants (localized ':name' terms or ids)
    dataset_default: list[tuple[str, object]] = []
    dataset_named: list[tuple[str, object]] = []
    for fm in _FROM_CLAUSE.finditer(dataset_src):
        slot = _normalize_term(fm.group("src"), prefixes)
        if slot[0] == "var":
            raise SparqlSyntaxError(
                f"FROM takes a graph IRI, not a variable: ?{slot[1]}"
            )
        (dataset_named if fm.group("named") else dataset_default).append(slot)
    # the WHERE clause parses as a RECURSIVE group graph pattern (§5.2):
    # nested {} subgroups, OPTIONAL/MINUS/EXISTS bodies and UNION arms are
    # full groups at arbitrary depth
    path_counter = itertools.count()  # fresh-var source shared query-wide
    root = _parse_group(bgp_src, prefixes, path_counter)

    # synthetic BINDs appended by SELECT-expression desugaring below; they
    # merge after the written ones (same scoping/freshness validation)
    binds: list[tuple[str, object]] = []
    aggregates: list[tuple[str, str | None, bool, str, str | None]] = []
    # post-aggregation expression aliases `(SUM(?x)/COUNT(?x) AS ?r)`:
    # aggregate calls lift to hidden aliases, the remaining arithmetic
    # computes OVER the grouped output (alias, arith AST)
    agg_exprs: list[tuple[str, object]] = []
    hidden_agg_counter = itertools.count()

    # GROUP BY expression keys `GROUP BY (expr AS ?v)` (§11.2
    # GroupCondition, r7): each parenthesized item desugars onto the BIND
    # machinery — the expression becomes a synthetic BIND (same
    # lowering, scoping and freshness validation as a SELECT expression)
    # and the key the rest of the pipeline sees is the plain alias
    # variable. Mixed plain/expression key lists work; a bare
    # parenthesized expression without AS rejects (the key needs a name
    # to be projectable, and silent auto-naming would hide typos).
    gbm = re.search(r"GROUP\s+BY\s+", mods_src or "", re.I)
    if gbm and "(" in mods_src[gbm.end() :]:
        pos = gbm.end()
        gb_items: list[str] = []
        changed = False
        while pos < len(mods_src):
            pos = _skip_ws(mods_src, pos)
            if pos >= len(mods_src):
                break
            if mods_src[pos] in "?$":
                vm0 = re.compile(r"[?$](\w+)").match(mods_src, pos)
                if not vm0:
                    raise SparqlSyntaxError("malformed GROUP BY variable")
                gb_items.append("?" + vm0.group(1))
                pos = vm0.end()
                continue
            if mods_src[pos] == "(":
                content, pos = _scan_delim(
                    mods_src, pos, "(", ")", "GROUP BY"
                )
                em0 = re.fullmatch(
                    r"(?P<expr>.+)\s+AS\s+[?$](?P<alias>\w+)\s*",
                    content,
                    re.S | re.I,
                )
                if not em0:
                    raise SparqlSyntaxError(
                        f"GROUP BY expression keys need a name: "
                        f"({content.strip()!r}) — write (expr AS ?v)"
                    )
                binds.append(
                    (em0.group("alias"), _parse_bind_body(em0.group("expr")))
                )
                gb_items.append("?" + em0.group("alias"))
                changed = True
                continue
            break  # the next modifier (HAVING/ORDER/LIMIT/...) starts here
        if changed:
            mods_src = (
                mods_src[: gbm.start()]
                + "GROUP BY "
                + " ".join(gb_items)
                + " "
                + mods_src[pos:]
            )

    def _lift_aggs(body: str) -> str:
        """Replace every aggregate call in `body` with a hidden-alias
        variable, registering the aggregate — shared by HAVING bodies and
        SELECT expressions over aggregates."""

        def repl(m: re.Match) -> str:
            func = m.group(1).lower()
            distinct = bool(m.group(2))
            arg = m.group(3)
            if arg == "*" and (func != "count" or distinct):
                raise SparqlSyntaxError(f"{func.upper()}(*) is not supported")

            alias = f"__hagg{next(hidden_agg_counter)}"
            if arg == "*":
                avar = None
            elif re.fullmatch(r"[?$]\w+", arg):
                avar = arg[1:]
            else:
                # aggregate over an expression (§11.1) inside HAVING /
                # SELECT expressions / ORDER BY (r8): same per-row
                # arithmetic-before-aggregation slot as projected ones
                avar = ("expr", _parse_arith_expr(arg))
            aggregates.append((func, avar, distinct, alias, None))
            return "?" + alias

        return _HAVING_AGG.sub(repl, body)

    if proj_src == "*":
        projection = None
    else:
        items: list[str] = []
        for itm in _PROJ_ITEM.findall(proj_src):
            if itm.startswith(("?", "$")):
                items.append(itm[1:])
                continue
            am = _AGG_ITEM.match(itm)
            if not am:
                em = _EXPR_ITEM.match(itm)
                if em and _HAVING_AGG.search(em.group("expr")):
                    # expression OVER aggregates (§11.1: projections may
                    # combine aggregates arithmetically): lift the calls,
                    # compute the arithmetic on the grouped output
                    lifted = _lift_aggs(em.group("expr"))
                    agg_exprs.append(
                        (em.group("alias"), _parse_arith_expr(lifted))
                    )
                    items.append(em.group("alias"))
                    continue
                if em:
                    # SELECT expression → synthetic BIND (same lowering,
                    # same scope/freshness validation further down);
                    # accessors / casts / string manipulations compose
                    # here exactly like in a written BIND (r7)
                    binds.append(
                        (
                            em.group("alias"),
                            _parse_bind_body(em.group("expr")),
                        )
                    )
                    items.append(em.group("alias"))
                    continue
                raise SparqlSyntaxError(
                    f"unsupported projection item: {itm!r} "
                    "(supported: ?var, (AGG([DISTINCT] ?v|*) AS ?alias), "
                    "or (expression AS ?alias))"
                )
            func = am.group("func").lower()
            arg = am.group("arg").strip()
            distinct_arg = bool(am.group("distinct"))
            sep = am.group("sep")
            if arg == "*" and (func != "count" or distinct_arg):
                raise SparqlSyntaxError(f"{func.upper()}(*) is not supported")

            if sep is not None and func != "group_concat":
                raise SparqlSyntaxError(
                    "SEPARATOR is only valid on GROUP_CONCAT"
                )
            if func == "group_concat" and sep is None:
                sep = " "  # the §11 default separator
            if arg == "*":
                avar = None
            elif re.fullmatch(r"[?$]\w+", arg):
                avar = arg[1:]
            elif re.fullmatch(r"STR\s*\(\s*[?$]\w+\s*\)", arg, re.I):
                # aggregate over the DECODED term text (r7):
                # MIN/MAX/SAMPLE/GROUP_CONCAT get STRING semantics
                # (codepoint order / lexical concatenation), COUNT
                # counts solutions with a bound argument; arg slot =
                # ('str', var) — the planner attaches the dictionary
                # term before the partial aggregation
                if func in ("sum", "avg"):
                    raise SparqlSyntaxError(
                        f"{func.upper()}(STR(...)) is not numeric"
                    )
                avar = (
                    "str",
                    re.search(r"[?$](\w+)", arg).group(1),
                )
            elif _AGG_CALL_ARG.fullmatch(arg):
                # cast / accessor aggregate args (r7):
                # `SUM(xsd:decimal(?p))`, `AVG(YEAR(?d))`,
                # `MIN(xsd:date(?d))`, `COUNT(STRLEN(?x))` — the typed
                # VALUE computes once per solution row as a synthetic
                # BIND (the §17.5 / §17.4.5 lowering, errors → NULL →
                # skipped by the null-skipping aggregates, matching
                # §11's error-removing card[...]), and the aggregate
                # itself runs over a plain bound column
                node = _parse_bind_body(arg)
                if func in ("sum", "avg") and (
                    node[0] == "termfn_expr"  # xsd:string ≡ STR
                    or node[0] == "strexpr"  # computed string (r8)
                    or (
                        node[0] == "cast_expr"
                        and node[1] in ("date", "dateTime")
                    )
                ):
                    raise SparqlSyntaxError(
                        f"{func.upper()}({arg}) is not numeric"
                    )
                synth = f"__aggb{len(binds)}"
                binds.append((synth, node))
                avar = synth
            else:
                # aggregate over an EXPRESSION (§11.1 — `SUM(?a * ?b)`,
                # `GROUP_CONCAT(?a + ?b)`): the arithmetic computes per
                # solution row BEFORE the aggregation; arg slot =
                # ('expr', arith AST). GROUP_CONCAT stringifies the
                # numeric value (r8) — the concat path casts to string.
                avar = ("expr", _parse_arith_expr(arg))
            aggregates.append(
                (func, avar, distinct_arg, am.group("alias"), sep)
            )
            items.append(am.group("alias"))
        if len(set(items)) != len(items):
            raise SparqlSyntaxError(f"duplicate projection names: {items}")
        projection = tuple(items)

    if binds:
        nb = len(root.binds)
        root = _dc_replace(
            root,
            binds=root.binds + tuple(binds),
            seq=root.seq
            + tuple(("bind", nb + k) for k in range(len(binds))),
        )
    if not root.has_required_content():
        raise SparqlSyntaxError("empty basic graph pattern")

    required_vars = root.required_vars()
    # in-scope variables for projection / FILTER / ORDER BY validation:
    # every pattern-bound variable plus every BIND target anywhere in the
    # tree (a nested group's BIND target is visible once the group joins
    # in). Per-group BIND scoping/freshness validates in
    # _validate_group_tree below.
    binds = root.binds
    bind_targets = {
        bvar for g in _walk_groups(root) for bvar, _ in g.binds
    }
    pattern_vars = root.all_vars() | bind_targets

    # OPTIONAL-bound DESCRIBE vars are fine: an unbound binding names no
    # resource and the planner filters it (§16.4); only a var bound
    # NOWHERE is a typo
    if describe_var is not None and describe_var not in pattern_vars:
        raise SparqlSyntaxError(
            f"DESCRIBE variable must be bound by the required patterns: "
            f"?{describe_var}"
        )

    construct: list[TriplePattern] = []
    if tpl_src is not None:
        construct = _parse_patterns(tpl_src, prefixes)
        if not construct:
            raise SparqlSyntaxError("empty CONSTRUCT template")
        for tp in construct:
            for v in tp.variables():
                if v.startswith(_PATH_VAR_PREFIX):
                    raise SparqlSyntaxError(
                        "property paths are not allowed in a CONSTRUCT "
                        "template (§16.2: templates are plain triples)"
                    )
                if v not in pattern_vars:
                    if v.startswith("__bn"):
                        # a template blank node with NO co-referring
                        # WHERE label is §16.2's fresh-per-solution
                        # instantiation — the planner mints one node
                        # per solution (deterministic keyed labels)
                        continue
                    # a var in NO pattern is a typo; vars bound only in
                    # OPTIONAL are fine — §16.2 drops a template's triple
                    # for solutions where its variable is unbound (the
                    # planner filters those rows per template)
                    raise SparqlSyntaxError(
                        f"CONSTRUCT template variable must be bound by the "
                        f"required patterns: ?{v}"
                    )
    # structural validation of the whole group tree: share-variable checks
    # for OPTIONAL/MINUS/EXISTS at every level, VALUES variable scoping,
    # and nested-group FILTER scoping (root filters validate against
    # pattern_vars, which includes BIND targets)
    _validate_group_tree(root, own_filter_scope=pattern_vars)
    aliases = {alias for _, _, _, alias, _ in aggregates} | {
        a for a, _ in agg_exprs
    }
    if projection is not None:
        unknown = set(projection) - pattern_vars - aliases
        if unknown:
            raise SparqlSyntaxError(f"projected variables not in BGP: {sorted(unknown)}")
        if aliases & pattern_vars:
            raise SparqlSyntaxError(
                f"aggregate alias shadows a pattern variable: "
                f"{sorted(aliases & pattern_vars)}"
            )
    for _, avar, _, _, _ in aggregates:
        if isinstance(avar, tuple) and avar[0] == "str":
            if avar[1] not in pattern_vars:
                raise SparqlSyntaxError(
                    f"aggregate variable not in BGP: ?{avar[1]}"
                )
        elif isinstance(avar, tuple):
            bad = arith_expr_vars(avar[1]) - pattern_vars
            if bad:
                raise SparqlSyntaxError(
                    f"aggregate-expression variables not in BGP: "
                    f"{['?' + v for v in sorted(bad)]}"
                )
        elif avar is not None and avar not in pattern_vars:
            raise SparqlSyntaxError(f"aggregate variable not in BGP: ?{avar}")
    # solution modifiers after the group pattern
    mods = mods_src or ""

    # trailing VALUES clause (§7.2.2): the spec's final algebra joins it
    # with the WHERE pattern (§18.2.2.8 `pattern := Join(pattern, M)`),
    # which is exactly the in-group VALUES compilation — so it merges
    # into the root group (validated here; the tree was validated above)
    trailing_v = list(root.values)
    trailing_vm = list(root.values_multi)
    while True:
        vm = re.search(r"\bVALUES\b", mods, re.I)
        if not vm:
            break
        j = _skip_ws(mods, vm.end())
        if j < len(mods) and mods[j] in "?$":
            nm = re.compile(r"[?$](\w+)").match(mods, j)
            if not nm:
                raise SparqlSyntaxError("malformed VALUES variable")
            vals_src, end = _scan_delim(
                mods, _skip_ws(mods, nm.end()), "{", "}", "VALUES"
            )
            entries = tuple(
                _normalize_term(tok, prefixes)
                for tok in _TOKEN.findall(vals_src)
            )
            if not entries:
                raise SparqlSyntaxError("empty VALUES block")
            if any(kind == "var" for kind, _ in entries):
                raise SparqlSyntaxError("VALUES entries must be constants")
            if nm.group(1) not in required_vars:
                raise SparqlSyntaxError(
                    f"VALUES variable not in BGP: ?{nm.group(1)}"
                )
            trailing_v.append((nm.group(1), entries))
        elif j < len(mods) and mods[j] == "(":
            vars_src, j2 = _scan_delim(mods, j, "(", ")", "VALUES")
            toks = vars_src.split()
            if not toks or any(not t.startswith(("?", "$")) for t in toks):
                raise SparqlSyntaxError(
                    f"unsupported VALUES form: {vars_src.strip()!r}"
                )
            vars_ = tuple(t.lstrip("?$") for t in toks)
            for var in vars_:
                if var not in required_vars:
                    raise SparqlSyntaxError(
                        f"VALUES variable not in BGP: ?{var}"
                    )
            rows_src, end = _scan_delim(
                mods, _skip_ws(mods, j2), "{", "}", "VALUES"
            )
            trailing_vm.append(_parse_values_rows(vars_, rows_src, prefixes))
        else:
            raise SparqlSyntaxError("unsupported VALUES form")
        mods = mods[: vm.start()] + " " + mods[end:]
    if len(trailing_v) != len(root.values) or len(trailing_vm) != len(
        root.values_multi
    ):
        root = _dc_replace(
            root,
            values=tuple(trailing_v),
            values_multi=tuple(trailing_vm),
            seq=root.seq
            + tuple(
                ("values", k)
                for k in range(len(root.values), len(trailing_v))
            )
            + tuple(
                ("values_multi", k)
                for k in range(len(root.values_multi), len(trailing_vm))
            ),
        )

    # HAVING(expr) — extract with balanced parens, reusing the FILTER
    # expression grammar; evaluated over the grouped OUTPUT columns.
    # Aggregate CALLS inside HAVING (§11.5 allows constraints over
    # aggregates that are not projected — `HAVING(SUM(?x) > 5)`) lift to
    # HIDDEN aggregates: each call becomes a synthetic `?__haggN`
    # variable, the aggregate computes alongside the projected ones, the
    # filter applies over the grouped output, and the final projection
    # drops the hidden column.
    having: list = []
    while True:
        hm = _HAVING.search(mods)
        if not hm:
            break
        depth, i = 1, hm.end()
        while i < len(mods) and depth:
            if mods[i] == "(":
                depth += 1
            elif mods[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise SparqlSyntaxError("unbalanced parentheses in HAVING")
        having.append(
            _parse_filter_expr(_lift_aggs(mods[hm.end() : i - 1]), prefixes)
        )
        mods = mods[: hm.start()] + " " + mods[i:]
    aliases = {alias for _, _, _, alias, _ in aggregates} | {
        a for a, _ in agg_exprs
    }
    for _, avar, _, _, _ in aggregates:  # re-check: lifting added entries
        if isinstance(avar, tuple) and avar[0] == "str":
            if avar[1] not in pattern_vars:
                raise SparqlSyntaxError(
                    f"aggregate variable not in BGP: ?{avar[1]}"
                )
            if avar[1] in bind_targets:
                # a computed variable is a VALUE, not a dictionary id —
                # STR() would join it against unrelated terms (r7)
                raise SparqlSyntaxError(
                    f"STR() aggregates need a pattern-bound variable "
                    f"(a computed variable has no dictionary term): "
                    f"?{avar[1]}"
                )
        elif isinstance(avar, tuple):
            bad = arith_expr_vars(avar[1]) - pattern_vars
            if bad:
                raise SparqlSyntaxError(
                    f"aggregate-expression variables not in BGP: "
                    f"{['?' + v for v in sorted(bad)]}"
                )
        elif avar is not None and avar not in pattern_vars:
            raise SparqlSyntaxError(f"aggregate variable not in BGP: ?{avar}")
    gm = _GROUP.search(mods)
    group_by = (
        tuple(v.lstrip("?$") for v in gm.group("keys").split()) if gm else ()
    )
    grouped = bool(group_by) or bool(aggregates)
    if having and not grouped:
        raise SparqlSyntaxError("HAVING requires GROUP BY or aggregates")
    # post-aggregation expressions may reference group keys and (hidden)
    # aggregate aliases — nothing else exists in the grouped output
    agg_alias_set = {alias for _, _, _, alias, _ in aggregates}
    for a, ast in agg_exprs:
        bad = arith_expr_vars(ast) - agg_alias_set - set(group_by)
        if bad:
            raise SparqlSyntaxError(
                f"aggregate-expression variables must be GROUP BY keys or "
                f"aggregates: {['?' + v for v in sorted(bad)]}"
            )
    for expr in having:
        # string functions over a GROUP KEY's term are allowed (r6): the
        # planner attaches the key's dictionary term post-aggregation —
        # but an aggregate ALIAS has no term (it is a computed number)
        for v in sorted(filter_expr_strfn_vars(expr)):
            if v not in set(group_by):
                raise SparqlSyntaxError(
                    f"HAVING string functions apply to GROUP BY keys "
                    f"(dictionary terms), not aggregates: ?{v}"
                )
        for v in sorted(filter_expr_term_vars(expr)):
            if v in bind_targets:
                # a COMPUTED key (BIND target / expression key) is a
                # value, not a dictionary id — joining or resolving it
                # against the dictionary would match unrelated terms.
                # Reject rather than misinterpret (r7).
                raise SparqlSyntaxError(
                    f"HAVING term-semantics functions need a "
                    f"pattern-bound key (a computed key has no "
                    f"dictionary term): ?{v}"
                )
        for v in sorted(filter_expr_vars(expr)):
            if v not in set(group_by) | aliases:
                raise SparqlSyntaxError(
                    f"HAVING variable must be a GROUP BY key or an "
                    f"aggregate alias: ?{v}"
                )
    if grouped:
        if projection is None:
            raise SparqlSyntaxError("SELECT * cannot combine with GROUP BY/aggregates")
        for v in group_by:
            if v not in pattern_vars:
                raise SparqlSyntaxError(f"GROUP BY variable not in BGP: ?{v}")
        # every plain projected variable must be a grouping key (SPARQL 1.1
        # §11.4's projection restriction — same rule as SQL GROUP BY)
        bad = [v for v in projection if v not in aliases and v not in group_by]
        if bad:
            raise SparqlSyntaxError(
                f"projected variables must be GROUP BY keys or aggregates: "
                f"{['?' + v for v in bad]}"
            )
    # ORDER BY keys: plain variables, or parenthesized integer-arithmetic
    # EXPRESSIONS (`ORDER BY (?a - ?b) DESC(?x + 1)`, §15.1 OrderCondition
    # with BrackettedExpression) — an expression key becomes
    # (('expr', arith AST), desc), compiled by the planner as a sort
    # column over the bound variables BEFORE projection
    order_by: list[tuple] = []
    om = re.search(r"ORDER\s+BY\s+", mods, re.I)
    if om:
        pos = om.end()
        consumed_end = pos
        dir_open = re.compile(r"(ASC|DESC)\s*\(", re.I)
        str_open = re.compile(r"STR\s*\(", re.I)
        cast_open = re.compile(
            r"(?:xsd:(integer|decimal|double|float|date|dateTime)"
            r"|(YEAR|MONTH|DAY|HOURS|MINUTES|SECONDS|FLOOR|CEIL|ROUND))"
            r"\s*\(\s*[?$](\w+)\s*\)",
            re.I,
        )
        var_key = re.compile(r"[?$](\w+)")
        _STR_KEY = re.compile(r"STR\s*\(\s*[?$](\w+)\s*\)", re.I)
        while True:
            pos = _skip_ws(mods, pos)
            if pos >= len(mods):
                consumed_end = pos
                break
            mdir = dir_open.match(mods, pos)
            mstr = str_open.match(mods, pos) if not mdir else None
            mcast = (
                cast_open.match(mods, pos) if not (mdir or mstr) else None
            )
            if mcast:
                # bare xsd:T(?x) / YEAR(?x)-family key (r7): sort by the
                # CAST/accessor VALUE of the term — numeric/date ordering
                # over typed literals
                kind = (
                    _XSD_CAST_KINDS[mcast.group(1).lower()]
                    if mcast.group(1)
                    else mcast.group(2).lower()
                )
                order_by.append(
                    (("cast", kind, mcast.group(3)), False)
                )
                pos = mcast.end()
                consumed_end = pos
                continue
            if mdir:
                desc = mdir.group(1).upper() == "DESC"
                inner, pos = _scan_delim(
                    mods, mdir.end() - 1, "(", ")", "ORDER BY"
                )
            elif mstr:
                # bare STR(?x) key: sort by the DECODED term (r6)
                v = var_key.match(mods, _skip_ws(mods, mstr.end()))
                if not v:
                    raise SparqlSyntaxError(
                        "ORDER BY STR(...) takes a variable"
                    )
                pos = _skip_ws(mods, v.end())
                if pos >= len(mods) or mods[pos] != ")":
                    raise SparqlSyntaxError(
                        "malformed ORDER BY STR(?var) key"
                    )
                pos += 1
                order_by.append((("str", v.group(1)), False))
                consumed_end = pos
                continue
            elif mods[pos] == "(":
                desc = False
                inner, pos = _scan_delim(mods, pos, "(", ")", "ORDER BY")
            else:
                mv = var_key.match(mods, pos)
                if not mv:  # LIMIT / OFFSET / end of modifiers
                    break
                order_by.append((mv.group(1), False))
                pos = mv.end()
                consumed_end = pos
                continue
            txt = inner.strip()
            sm = _STR_KEY.fullmatch(txt)
            cm = cast_open.fullmatch(txt)
            if sm:
                # [ASC|DESC](STR(?x)): term-ordered sort key (r6)
                order_by.append((("str", sm.group(1)), desc))
            elif cm:
                # [ASC|DESC](xsd:T(?x) / YEAR(?x)-family): cast/accessor
                # VALUE sort key (r7)
                kind = (
                    _XSD_CAST_KINDS[cm.group(1).lower()]
                    if cm.group(1)
                    else cm.group(2).lower()
                )
                order_by.append((("cast", kind, cm.group(3)), desc))
            elif re.fullmatch(r"[?$]\w+", txt):
                order_by.append((txt[1:], desc))
            elif grouped:
                # ORDER BY expression under GROUP BY (r8, §15.1 with
                # §11): aggregate calls lift to hidden `?__haggN`
                # aggregates — the SAME desugaring HAVING and SELECT
                # expressions over aggregates use — and the arithmetic
                # compiles over the grouped output, where group keys and
                # aggregate aliases are 1:1 columns. So
                # `ORDER BY DESC(COUNT(?x))` sorts by a hidden count
                # computed alongside the projected aggregates.
                n_before = len(aggregates)
                ast = _parse_arith_expr(_lift_aggs(inner))
                for _, avar, _, _, _ in aggregates[n_before:]:
                    # the earlier re-check loop already ran; validate
                    # aggregate args lifted HERE against the BGP now
                    bad = (
                        arith_expr_vars(avar[1]) - pattern_vars
                        if isinstance(avar, tuple)
                        else (
                            {avar} - pattern_vars
                            if avar is not None
                            else set()
                        )
                    )
                    if bad:
                        raise SparqlSyntaxError(
                            "aggregate variables not in BGP: "
                            f"{['?' + v for v in sorted(bad)]}"
                        )
                order_by.append((("gexpr", ast), desc))
            else:
                order_by.append((("expr", _parse_arith_expr(inner)), desc))
            consumed_end = pos
        mods = mods[: om.start()] + " " + mods[consumed_end:]
        if not order_by:
            raise SparqlSyntaxError("ORDER BY needs at least one sort key")
    agg_alias_set = {alias for _, _, _, alias, _ in aggregates} | {
        a for a, _ in agg_exprs
    }
    for key, _ in order_by:
        if isinstance(key, tuple):  # expression / STR key
            if key[0] == "gexpr":
                # grouped-output expression key: every variable must be
                # a column of the grouped output — a GROUP BY key or an
                # aggregate alias (projected, post-agg, or hidden)
                bad = arith_expr_vars(key[1]) - set(group_by) - agg_alias_set
                if bad:
                    raise SparqlSyntaxError(
                        f"ORDER BY expression variables must be GROUP BY "
                        f"keys or aggregates: "
                        f"{['?' + v for v in sorted(bad)]}"
                    )
                continue
            if grouped:
                raise SparqlSyntaxError(
                    "ORDER BY expressions are not supported with "
                    "GROUP BY/aggregates (order by an aliased aggregate "
                    "or group key instead)"
                )
            if key[0] == "str":
                if key[1] not in pattern_vars:
                    raise SparqlSyntaxError(
                        f"ORDER BY STR variable not in BGP: ?{key[1]}"
                    )
                if key[1] in bind_targets:
                    # a computed variable is a VALUE, not a dictionary
                    # id — the term join would be nonsense; sort by the
                    # plain variable instead (value order) (r7)
                    raise SparqlSyntaxError(
                        f"ORDER BY STR needs a pattern-bound variable "
                        f"(a computed variable has no dictionary "
                        f"term — sort by ?{key[1]} directly)"
                    )
                continue
            if key[0] == "cast":
                if key[2] not in pattern_vars:
                    raise SparqlSyntaxError(
                        f"ORDER BY cast variable not in BGP: ?{key[2]}"
                    )
                if key[2] in bind_targets:
                    raise SparqlSyntaxError(
                        f"ORDER BY casts need a pattern-bound variable "
                        f"(a computed variable has no dictionary "
                        f"term — sort by ?{key[2]} directly)"
                    )
                continue
            unknown = arith_expr_vars(key[1]) - pattern_vars
            if unknown:
                raise SparqlSyntaxError(
                    f"ORDER BY expression variables not in BGP: "
                    f"{['?' + v for v in sorted(unknown)]}"
                )
        elif grouped:
            # after aggregation only the output columns exist
            if key not in projection:
                raise SparqlSyntaxError(
                    f"ORDER BY variable not in the grouped projection: ?{key}"
                )
        elif key not in pattern_vars:
            raise SparqlSyntaxError(f"ORDER BY variable not in BGP: ?{key}")
    lm = _LIMIT.search(mods)
    om2 = _OFFSET.search(mods)
    leftover = _OFFSET.sub("", _LIMIT.sub("", _GROUP.sub("", mods))).strip()
    if leftover:
        raise SparqlSyntaxError(f"unsupported solution modifiers: {leftover!r}")
    return BGPQuery(
        projection=projection,
        where=root,
        distinct=bool(distinct_src),
        ask=ask,
        order_by=tuple(order_by),
        limit=int(lm.group("n")) if lm else None,
        construct=tuple(construct),
        describe_var=describe_var,
        offset=int(om2.group("n")) if om2 else None,
        group_by=group_by,
        aggregates=tuple(aggregates),
        having=tuple(having),
        agg_exprs=tuple(agg_exprs),
        dataset_default=tuple(dataset_default),
        dataset_named=tuple(dataset_named),
        term_style=_TERM_STYLE.get(),
        prefixes=tuple(
            sorted((k, v) for k, v in prefixes.items() if k != "@base")
        ),
    )
