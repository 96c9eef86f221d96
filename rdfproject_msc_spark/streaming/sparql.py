"""Continuous SPARQL: delta answering of a graph pattern over a live
triple stream.

A standing query "which new solutions appeared?" decomposes by the delta
rule Δ(P₁ ⋈ P₂ ⋈ … ⋈ Pₙ) = ΔP₁ ⋈ (P₂ ⋈ … ⋈ Pₙ) when new edges feed
exactly ONE designated pattern (the common case: one append-only edge
relation — events, clicks, messages — against a slowly-changing
background graph). Structured Streaming evaluates it as a STREAM-STATIC
inner join:

- the static remainder plans through the full SPARQL planner
  (`sparql_to_df`) — any construct the front-end supports, including
  OPTIONAL/UNION/paths/subqueries, with all its pushdown and pruning;
- the stream side is a stateless filter + rename of the incoming edges
  (constants resolve through the same bounded dictionary lookup the
  batch planner uses);
- each micro-batch emits exactly the matches involving its new edges.

No state store, no watermark — the join is stateless per micro-batch, so
state never grows with stream lifetime; exactly-once comes from the sink
checkpoint. At 100 TB the static side is the persisted sign-partitioned
store: its partition pruning and pushed filters apply per micro-batch
unchanged (the plan is re-executed against the static relation each
trigger, which is also why the static side should be a PERSISTED layout,
not a derived view that recomputes).

Duplicate edges in the stream produce duplicate solutions (multiset
semantics, same as batch); compose with
`streaming.events.dedup_events_stream`-style watermarked dedup upstream
if the transport redelivers.

Limitation (documented, rejected at call time where detectable): the
stream-static join compares with Spark equality, so shared variables
must be REQUIRED-bound in the static query — the §18.2.1
compatible-bindings lowering does not extend across the stream boundary
(branching a stream by bound-masks would need one streaming query per
branch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.dictionary import Dictionary
from rdfproject_msc_spark.sparql.parser import (
    SparqlSyntaxError,
    filter_expr_streq_literals,
    filter_expr_strfn_vars,
    filter_expr_vars,
    parse_sparql,
)
from rdfproject_msc_spark.sparql.planner import _compile_filter, sparql_to_df
from rdfproject_msc_spark.store import TripleStore


def _pattern_stream(
    stream_triples: DataFrame,
    pattern_src: str,
    dictionary: Dictionary | None,
) -> tuple[DataFrame, list[str]]:
    """Compile ONE triple pattern into a filtered/renamed stream: constant
    slots become pushdown-able equality filters (ids resolved through the
    bounded dictionary lookup), variable slots rename to their variable
    names, a repeated variable filters for slot equality."""
    bgp = parse_sparql(f"SELECT * WHERE {{ {pattern_src} }}")
    grp = bgp.where
    # Besides the one triple pattern, the only clause kind the stream
    # side supports is FILTER over the pattern's OWN variables (compiled
    # below as stateless per-batch predicates over the encoded ids).
    # Everything else — OPTIONAL / BIND / VALUES / UNION / GRAPH / paths
    # — is rejected, never silently dropped.
    extras = (
        grp.binds
        or grp.optionals
        or grp.unions
        or grp.minuses
        or grp.exists
        or grp.subgroups
        or grp.values
        or grp.values_multi
        or grp.closures
        or grp.paths
        or grp.subselects
        or grp.graphs
    )
    if len(grp.patterns) != 1 or extras:
        raise SparqlSyntaxError(
            f"stream pattern must be exactly one plain triple pattern "
            f"(plus optional FILTERs over its own variables — no "
            f"OPTIONAL/BIND/VALUES/UNION/MINUS/GRAPH/paths), "
            f"got {pattern_src!r}"
        )
    pat_vars = grp.patterns[0].variables()
    for expr in grp.filters:
        fvars = filter_expr_vars(expr)
        if not fvars <= pat_vars:
            raise SparqlSyntaxError(
                f"stream-pattern FILTER may reference only the pattern's "
                f"own variables {sorted(pat_vars)}, got {sorted(fvars)}"
            )
        if filter_expr_strfn_vars(expr) and dictionary is None:
            raise SparqlSyntaxError(
                "stream-pattern string/value FILTERs need a dictionary "
                "to resolve terms"
            )
    tp = bgp.where.patterns[0]
    terms = sorted(
        {val for _, (kind, val) in tp.slots.items() if kind == "term"}
    )
    ids = {}
    if terms:
        if dictionary is None:
            raise SparqlSyntaxError(
                "stream pattern constants need a dictionary to resolve"
            )
        ids = dictionary.encode_terms(terms)
    df = stream_triples
    first_pos: dict[str, str] = {}
    out = []
    var_order: list[str] = []
    for pos in ("s", "p", "o"):
        kind, val = tp.slots[pos]
        if kind == "var":
            if val in first_pos:
                df = df.filter(F.col(pos) == F.col(first_pos[val]))
            else:
                first_pos[val] = pos
                out.append(F.col(pos).alias(val))
                var_order.append(val)
        else:
            const = int(val) if kind == "id" else ids[val]
            df = df.filter(F.col(pos) == F.lit(const))
    if not var_order:
        raise SparqlSyntaxError(
            "stream pattern binds no variables — nothing to join"
        )
    sdf = df.select(*out)
    if grp.filters:
        # stream-side FILTERs (r6): stateless column predicates per
        # micro-batch over the renamed variable columns; term-equality
        # literals resolve through the SAME bounded dictionary lookup as
        # pattern constants (plan-time, never per batch)
        litids: dict[str, int] = {}
        streq = sorted(
            {
                t
                for expr in grp.filters
                for t in filter_expr_streq_literals(expr)
            }
        )
        if streq:
            if dictionary is None:
                raise SparqlSyntaxError(
                    "stream-pattern term-equality FILTERs need a "
                    "dictionary to resolve literals"
                )
            litids = dictionary.lookup_terms(streq)
        colmap = {v: v for v in var_order}
        # string/value FILTER leaves (r7): attach the variable's
        # dictionary term via a stream-STATIC broadcast left join —
        # stateless per micro-batch (the static dictionary broadcast is
        # reused across triggers), exactly the batch planner's strfn
        # strategy applied to the delta
        strset = {
            v for expr in grp.filters for v in filter_expr_strfn_vars(expr)
        }
        if bgp.term_style == "lexical":
            # bare numeric comparisons derive typed VALUES on lexical
            # stores (planner r10) — their variables need terms too
            from rdfproject_msc_spark.sparql.parser import (
                filter_expr_barecmp_vars,
            )

            strset |= {
                v
                for expr in grp.filters
                for v in filter_expr_barecmp_vars(expr)
            }
        strvars = sorted(strset)
        # attach + compile under the style the pattern was parsed with
        # (lexical stores derive STR/numeric values from term text,
        # dictionary-side — planner r10)
        from rdfproject_msc_spark.sparql.planner import (
            _SV,
            _ACTIVE_STYLE,
            _dict_relation,
        )

        token = _ACTIVE_STYLE.set(bgp.term_style)
        try:
            termmap: dict[str, str] | None = None
            if strvars:
                termmap = {}
                for i, v in enumerate(strvars):
                    d = _dict_relation(dictionary, f"__fsid{i}", f"__fterm{i}")
                    sdf = sdf.join(
                        F.broadcast(d),
                        F.col(v) == F.col(f"__fsid{i}"),
                        "left",
                    ).drop(f"__fsid{i}")
                    termmap[v] = f"__fterm{i}"
            for expr in grp.filters:
                sdf = sdf.filter(
                    _compile_filter(expr, colmap, termmap, litids)
                )
        finally:
            _ACTIVE_STYLE.reset(token)
        if termmap:
            sdf = sdf.drop(*termmap.values())
            sdf = sdf.drop(*[c + _SV for c in termmap.values()])
    return sdf, var_order


def _surely_bound_vars(grp) -> set[str]:
    """Variables bound (never null) in EVERY solution of the group:
    pattern/closure/path endpoints, GRAPH slots, subgroup recursion, and
    — for UNION — only variables surely bound in every arm. OPTIONAL and
    BIND targets are excluded (nullable). This is strictly narrower than
    GroupPattern.required_vars(), which includes union-arm variables that
    some solutions leave unbound."""
    out = {v for tp in grp.patterns for v in tp.variables()}
    for s, _, o, _ in grp.closures:
        for kind, val in (s, o):
            if kind == "var":
                out.add(val)
    for s, _, o in grp.paths:
        for kind, val in (s, o):
            if kind == "var":
                out.add(val)
    for sub in grp.subgroups:
        out |= _surely_bound_vars(sub)
    for gslot, sub in grp.graphs:
        out |= _surely_bound_vars(sub)
        if gslot[0] == "var":
            out.add(gslot[1])
    for blk in grp.unions:
        arms = [_surely_bound_vars(a) for a in blk]
        if arms:
            out |= set.intersection(*arms)
    for sub in grp.subselects:
        out |= set(sub.projection or ()) & _surely_bound_vars(sub.where)
    return out


def sparql_stream_delta(
    stream_triples: DataFrame,
    store: TripleStore,
    static_query: str,
    stream_pattern: str,
    dictionary: Dictionary | None = None,
) -> DataFrame:
    """Streaming DataFrame of the new solutions: each arriving edge that
    matches `stream_pattern` joins the static solutions of
    `static_query` on their shared variables (≥1 required). Output
    columns = stream pattern vars ∪ static projection, one row per new
    match."""
    sdf, svars = _pattern_stream(stream_triples, stream_pattern, dictionary)
    static = sparql_to_df(store, static_query, dictionary)
    shared = [v for v in svars if v in static.columns]
    if not shared:
        raise SparqlSyntaxError(
            f"stream pattern shares no variable with the static query "
            f"(stream binds {svars}, static projects {static.columns})"
        )
    # The stream-static equi-join compares with Spark equality, where
    # NULL never matches — so a shared variable that the static query
    # binds only optionally (OPTIONAL / partial UNION / BIND) would
    # silently drop solutions. Reject rather than guess.
    sure = _surely_bound_vars(parse_sparql(static_query).where)
    nullable = [v for v in shared if v not in sure]
    if nullable:
        raise SparqlSyntaxError(
            f"shared variable(s) {nullable} are not required-bound in the "
            f"static query (OPTIONAL/UNION/BIND-bound values can be NULL, "
            f"which never matches the stream-static equi-join); rewrite "
            f"the static query so every shared variable is bound in all "
            f"solutions"
        )
    return sdf.join(static, on=shared, how="inner")
