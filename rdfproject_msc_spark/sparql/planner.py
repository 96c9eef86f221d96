"""BGP → DataFrame plan: the classic SPARQL-on-Spark reduction.

Each triple pattern becomes a filtered scan of the triple relation (bound
terms → pushdown-able equality filters); shared variables become equi-join
keys; repeated variables within one pattern become intra-pattern equality
filters. This is the multi-pattern join the reference *intended* but broke
(MyOpVisitorBase.java:34-46 keeps only the last pattern — SURVEY.md Q3/Q6).

Engine-level optimizer logic (everything below Catalyst is delegated):
- constant encoding does ONE bounded dictionary lookup for all terms in the
  query (never a driver-side full reverse map, cf. MyOpVisitorBase.java:56-66);
- sign routing: a bound subject selects the Positive/Negative side statically
  (MyOpVisitorBase.java:82-86) via TripleStore.table_for_subject — on a
  sign-partitioned Parquet store this is Catalyst partition pruning;
- join-order heuristic: start from the most-bound (most selective) pattern,
  then greedily extend with patterns sharing a variable (avoids cartesian
  products); Catalyst/AQE then pick physical join strategies.

At scale: every per-pattern scan carries its equality filters into the
Parquet scan (PushedFilters), so a bound-predicate pattern reads only the
row groups whose min/max admit that predicate id when the store is
predicate-clustered.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.dictionary import Dictionary
from rdfproject_msc_spark.sparql.parser import BGPQuery, SparqlSyntaxError, parse_sparql
from rdfproject_msc_spark.store import TripleStore


def _encode_constants(bgp: BGPQuery, dictionary: Dictionary | None) -> dict[str, int]:
    all_patterns = (
        list(bgp.patterns)
        + [tp for grp in bgp.optionals for tp in grp]
        + [tp for arm in bgp.unions for tp in arm]
        + [tp for grp in bgp.minuses for tp in grp]
        + [tp for _, grp in bgp.exists for tp in grp]
    )
    terms = sorted(
        {
            val
            for tp in all_patterns
            for kind, val in (tp.s, tp.p, tp.o)
            if kind == "term"
        }
        | {
            val
            for _, entries in bgp.values
            for kind, val in entries
            if kind == "term"
        }
    )
    if terms and dictionary is None:
        raise SparqlSyntaxError("query has term constants but no dictionary was given")
    return dictionary.encode_terms(terms) if terms else {}


def _pattern_scan(
    store: TripleStore, tp, term_ids: dict[str, int], idx: int
) -> tuple[DataFrame, dict[str, str]]:
    """One filtered scan; returns (df, var→column mapping)."""

    def resolve(slot) -> int | None:
        kind, val = slot
        if kind == "id":
            return int(val)
        if kind == "term":
            return term_ids[val]
        return None

    bound = {pos: resolve(slot) for pos, slot in tp.slots.items()}
    df = store.table_for_subject(bound["s"])

    conds = [F.col(pos) == F.lit(v) for pos, v in bound.items() if v is not None]
    if conds:
        df = df.filter(reduce(lambda a, b: a & b, conds))

    var_cols: dict[str, str] = {}
    first_pos: dict[str, str] = {}
    keep = []
    for pos, (kind, val) in tp.slots.items():
        if kind != "var":
            continue
        if val in first_pos:  # repeated var inside one pattern: ?x :p ?x
            # filter on the SOURCE positions (s/p/o still present here —
            # the v_* alias only exists after the select below)
            df = df.filter(F.col(pos) == F.col(first_pos[val]))
        else:
            first_pos[val] = pos
            col = f"v_{val}"
            keep.append(F.col(pos).alias(col))
            var_cols[val] = col
    out = df.select(*keep) if keep else df.select(F.lit(1).alias(f"_m{idx}"))
    return out, var_cols


def _order_patterns(bgp: BGPQuery) -> list:
    """Most-bound first, then greedily connect via shared variables."""
    remaining = list(bgp.patterns)
    remaining.sort(key=lambda tp: -tp.bound_count())
    ordered = [remaining.pop(0)]
    seen_vars = set(ordered[0].variables())
    while remaining:
        nxt = next(
            (tp for tp in remaining if tp.variables() & seen_vars), remaining[0]
        )
        remaining.remove(nxt)
        ordered.append(nxt)
        seen_vars |= nxt.variables()
    return ordered


def _join_group(
    store: TripleStore,
    patterns,
    term_ids: dict[str, int],
    idx_offset: int,
) -> tuple[DataFrame, dict[str, str], list[str]]:
    """Compose a list of patterns into one DataFrame via inner joins on
    shared variables. Returns (df, var→column map, first-appearance order)."""
    joined: DataFrame | None = None
    bound_cols: dict[str, str] = {}
    order: list[str] = []

    for i, tp in enumerate(patterns):
        idx = idx_offset + i
        scan, var_cols = _pattern_scan(store, tp, term_ids, idx)
        if joined is None:
            joined, bound_cols = scan, dict(var_cols)
            order = [v for v in var_cols]
            continue
        shared = [v for v in var_cols if v in bound_cols]
        # rename this pattern's columns to avoid collisions before the join
        renames = {c: f"{c}_{idx}" for c in scan.columns}
        for old, new in renames.items():
            scan = scan.withColumnRenamed(old, new)
        if shared:
            cond = reduce(
                lambda a, b: a & b,
                [
                    F.col(bound_cols[v]) == F.col(renames[var_cols[v]])
                    for v in shared
                ],
            )
            joined = joined.join(scan, cond, "inner")
        else:
            joined = joined.crossJoin(scan)
        for v, c in var_cols.items():
            if v not in bound_cols:
                bound_cols[v] = renames[c]
                order.append(v)
        joined = joined.drop(*[renames[var_cols[v]] for v in shared])
    return joined, bound_cols, order


def plan_bgp(
    store: TripleStore, bgp: BGPQuery, dictionary: Dictionary | None = None
) -> DataFrame:
    """Compose the BGP into a single DataFrame of variable bindings (ids)."""
    term_ids = _encode_constants(bgp, dictionary)
    if bgp.patterns:
        joined, bound_cols, order = _join_group(
            store, _order_patterns(bgp), term_ids, 0
        )
    else:  # pure-UNION query: WHERE { {A} UNION {B} }
        joined, bound_cols, order = None, {}, []
    idx_offset = len(bgp.patterns)

    # UNION block → unionByName of the arm plans with null extension for
    # variables an arm does not bind (SPARQL 1.1 §5.4 alternatives; the
    # reference's translator emitted exactly this shape by hand for the
    # unbound-subject sign split, MyOpVisitorBase.java:106-123). Duplicates
    # preserved: UNION ALL semantics, matching SPARQL's multiset algebra.
    if bgp.unions:
        arm_order: list[str] = []  # union vars in first-appearance order
        arms = []
        for arm in bgp.unions:
            adf, acols, aorder = _join_group(store, list(arm), term_ids, idx_offset)
            idx_offset += len(arm)
            arms.append((adf, acols))
            for v in aorder:
                if v not in arm_order:
                    arm_order.append(v)
        normalized = [
            adf.select(
                *[
                    F.col(acols[v]).alias(f"u_{v}")
                    for v in arm_order
                    if v in acols
                ]
            )
            for adf, acols in arms
        ]
        union_df = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), normalized
        )
        ucols = {v: f"u_{v}" for v in arm_order}
        if joined is None:
            joined, bound_cols, order = union_df, ucols, list(arm_order)
        else:
            shared = [v for v in ucols if v in bound_cols]
            if shared:
                cond = reduce(
                    lambda a, b: a & b,
                    [F.col(bound_cols[v]) == F.col(ucols[v]) for v in shared],
                )
                joined = joined.join(union_df, cond, "inner")
                joined = joined.drop(*[ucols[v] for v in shared])
            else:
                joined = joined.crossJoin(union_df)
            for v in arm_order:
                if v not in bound_cols:
                    bound_cols[v] = ucols[v]
                    order.append(v)

    # OPTIONAL groups → LEFT OUTER JOIN on the shared variables (SPARQL
    # 1.1 §5.3 compatible-bindings semantics for the non-nested case): the
    # group is composed inner-first, then left-joined, so group-local
    # constraints bind before null-extension — the same machinery as the
    # reference's J3 left-outer shape (PartitionQueryingBRDSubject.java:156).
    for gi, grp in enumerate(bgp.optionals):
        gdf, gcols, gorder = _join_group(store, list(grp), term_ids, idx_offset)
        idx_offset += len(grp)
        # suffix ALL group columns so they never collide with bound ones
        renames = {c: f"{c}_g{gi}" for c in gdf.columns}
        for old, new in renames.items():
            gdf = gdf.withColumnRenamed(old, new)
        shared = [v for v in gcols if v in bound_cols]
        cond = reduce(
            lambda a, b: a & b,
            [F.col(bound_cols[v]) == F.col(renames[gcols[v]]) for v in shared],
        )
        joined = joined.join(gdf, cond, "left")
        joined = joined.drop(*[renames[gcols[v]] for v in shared])
        for v in gorder:
            if v not in bound_cols:
                bound_cols[v] = renames[gcols[v]]
                order.append(v)

    # MINUS groups → LEFT ANTI JOIN on the shared variables (SPARQL 1.1
    # §8.3): a binding is removed when the group produces a compatible
    # binding. The parser guarantees ≥1 shared variable (disjoint-domain
    # MINUS is rejected), so the anti-join condition is never empty.
    for mi, grp in enumerate(bgp.minuses):
        gdf, gcols, _ = _join_group(store, list(grp), term_ids, idx_offset)
        idx_offset += len(grp)
        renames = {c: f"{c}_m{mi}" for c in gdf.columns}
        for old, new in renames.items():
            gdf = gdf.withColumnRenamed(old, new)
        shared = [v for v in gcols if v in bound_cols]
        cond = reduce(
            lambda a, b: a & b,
            [F.col(bound_cols[v]) == F.col(renames[gcols[v]]) for v in shared],
        )
        joined = joined.join(gdf, cond, "left_anti")

    # FILTER [NOT] EXISTS groups → LEFT SEMI / LEFT ANTI join on the shared
    # variables (SPARQL 1.1 §8.1.1): existence tests never add bindings,
    # they only keep/remove rows — exactly Spark's semi/anti join semantics.
    for ei, (neg, grp) in enumerate(bgp.exists):
        gdf, gcols, _ = _join_group(store, list(grp), term_ids, idx_offset)
        idx_offset += len(grp)
        renames = {c: f"{c}_e{ei}" for c in gdf.columns}
        for old, new in renames.items():
            gdf = gdf.withColumnRenamed(old, new)
        shared = [v for v in gcols if v in bound_cols]
        cond = reduce(
            lambda a, b: a & b,
            [F.col(bound_cols[v]) == F.col(renames[gcols[v]]) for v in shared],
        )
        joined = joined.join(gdf, cond, "left_anti" if neg else "left_semi")

    # VALUES blocks → isin() over the resolved ids: an In predicate Catalyst
    # pushes into the Parquet scan (bounded by query size, like all constant
    # encoding — never a data-sized driver structure).
    for var, entries in bgp.values:
        ids = [
            int(val) if kind == "id" else term_ids[val] for kind, val in entries
        ]
        joined = joined.filter(F.col(bound_cols[var]).isin(ids))

    # FILTER constraints: plain Column predicates over the bound variables —
    # applied BEFORE projection so non-projected variables can be filtered;
    # Catalyst pushes var-vs-constant comparisons down into the scans.
    _OPS = {
        "=": lambda a, b: a == b,
        "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
    }
    for var, op, rhs in bgp.filters:
        lhs = F.col(bound_cols[var])
        rhs_col = (
            F.lit(rhs[1]) if rhs[0] == "num" else F.col(bound_cols[rhs[1]])
        )
        joined = joined.filter(_OPS[op](lhs, rhs_col))

    proj = list(bgp.projection) if bgp.projection is not None else order
    order_vars = [v for v, _ in bgp.order_by]
    sort_pre_projection = bool(order_vars) and not set(order_vars) <= set(proj)

    if sort_pre_projection:
        # ORDER BY on a non-projected variable (legal SPARQL): sort + limit
        # on the bound columns BEFORE the projection renames/drops them.
        # DISTINCT + such an ORDER BY is contradictory (the sort key is gone
        # after duplicate elimination) — reject rather than guess.
        if bgp.distinct:
            raise SparqlSyntaxError(
                "ORDER BY on a non-projected variable cannot combine with DISTINCT"
            )
        joined = joined.orderBy(
            *[
                F.col(bound_cols[v]).desc() if desc else F.col(bound_cols[v]).asc()
                for v, desc in bgp.order_by
            ]
        )
        if bgp.offset is not None:
            joined = joined.offset(bgp.offset)
        if bgp.limit is not None:
            joined = joined.limit(bgp.limit)

    out = joined.select(*[F.col(bound_cols[v]).alias(v) for v in proj])

    # solution modifiers — plain DataFrame ops; ORDER BY + LIMIT compiles to
    # TakeOrderedAndProject (no global sort materialization); OFFSET applies
    # between them (SPARQL 1.1 §15: slice = Slice(OrderBy(...), offset, limit))
    if bgp.distinct:
        out = out.distinct()
    if not sort_pre_projection:
        if bgp.order_by:
            out = out.orderBy(
                *[F.col(v).desc() if desc else F.col(v).asc() for v, desc in bgp.order_by]
            )
        if bgp.offset is not None:
            out = out.offset(bgp.offset)
        if bgp.limit is not None:
            out = out.limit(bgp.limit)
    return out


def sparql_to_df(
    store: TripleStore,
    query: str,
    dictionary: Dictionary | None = None,
    decode: bool = False,
) -> DataFrame:
    """Parse + plan; optionally decode result ids back to terms (J5)."""
    bgp = parse_sparql(query)
    df = plan_bgp(store, bgp, dictionary)
    if decode:
        if dictionary is None:
            raise SparqlSyntaxError("decode=True requires a dictionary")
        df = dictionary.decode(df)
    return df
