"""RDFS forward-chaining materialization (ρdf subset) over the encoded
triple store.

The standard distributed-RDFS insight (Urbani et al., "OWL reasoning
with WebPIE", ESWC 2010; the same structure SPARK-era reasoners reuse):
the SCHEMA (subClassOf / subPropertyOf / domain / range statements) is
ONTOLOGY-sized — thousands of terms — while the INSTANCE data is
corpus-sized. So materialization needs no data-sized fixpoint at all:

1. close the schema relations transitively (rdfs5 subPropertyOf-trans,
   rdfs11 subClassOf-trans) with the engine's existing semi-naive
   ``transitive_closure`` — iteration cost bounded by the ONTOLOGY
   diameter, never the corpus;
2. apply the instance rules as BROADCAST joins against those closed,
   bounded schema relations — one pass over the instance data:
     rdfs7  (s p o), (p ⊑p q)   → (s q o)     property inheritance
     rdfs2  (p dom c), (s p o)  → (s type c)  domain typing
     rdfs3  (p rng c), (s p o)  → (o type c)  range typing
     rdfs9  (c ⊑c d), (s type c)→ (s type d)  class inheritance
   (rdfs2/3/9 read the rdfs7-EXTENDED edge set, so the classic
   rule-chaining — a sub-property of a domain-carrying property types
   its subjects — lands in the same single pass);
3. one ``distinct`` over base ∪ derived (the only corpus-sized shuffle).

Derived-only schema triples (the closures themselves, as statements)
are included: querying ``?c rdfs:subClassOf ?d`` post-materialization
sees the transitive pairs, matching the RDFS entailment a user expects.

OWL-lite property semantics (r9) ride the same structure through ONE
generalization: the instance-side derivation mapping is the closure of
the PROPERTY GRAPH whose nodes are (property, orientation) —
``subPropertyOf`` edges preserve orientation, ``owl:inverseOf`` (and a
``owl:SymmetricProperty``'s implicit self-inverse) flip it — so any
interleaving (p ⊑ q, q inverseOf r, r ⊑ t, …) collapses into one
closed (p → q, flipped?) table and the corpus still pays a single
broadcast-join pass (straight + swapped halves). ``owl:sameAs``
canonicalization is separate (``same_as_canonicalize``): identity
clusters via connected components, statements rewritten to min-id
representatives.

The vocabulary ids are dictionary lookups (query-sized, the SPARQL
constant mechanism) — ``Engine.materialize_rdfs`` resolves the
convention automatically: full IRIs on a lexical (raw-ingested) store,
``:local`` names on a reference-convention one. A vocabulary term
absent from the dictionary simply contributes no rules (an ontology
without ranges derives no range typings) rather than erroring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.graph import transitive_closure

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"

OWL_NS = "http://www.w3.org/2002/07/owl#"

LEXICAL_VOCAB = {
    "type": f"<{RDF_NS}type>",
    "subclassof": f"<{RDFS_NS}subClassOf>",
    "subpropertyof": f"<{RDFS_NS}subPropertyOf>",
    "domain": f"<{RDFS_NS}domain>",
    "range": f"<{RDFS_NS}range>",
    "inverseof": f"<{OWL_NS}inverseOf>",
    "symmetricproperty": f"<{OWL_NS}SymmetricProperty>",
    "transitiveproperty": f"<{OWL_NS}TransitiveProperty>",
    "functionalproperty": f"<{OWL_NS}FunctionalProperty>",
    "inversefunctionalproperty": f"<{OWL_NS}InverseFunctionalProperty>",
    "sameas": f"<{OWL_NS}sameAs>",
}
LOCALIZED_VOCAB = {
    "type": ":type",
    "subclassof": ":subClassOf",
    "subpropertyof": ":subPropertyOf",
    "domain": ":domain",
    "range": ":range",
    "inverseof": ":inverseOf",
    "symmetricproperty": ":SymmetricProperty",
    "transitiveproperty": ":TransitiveProperty",
    "functionalproperty": ":FunctionalProperty",
    "inversefunctionalproperty": ":InverseFunctionalProperty",
    "sameas": ":sameAs",
}


def _closed_pairs(schema: DataFrame) -> DataFrame:
    """(a, b) schema pairs → transitive closure as (a, b) — semi-naive
    over the ontology-sized relation (diameter-bounded rounds)."""
    return transitive_closure(schema, src="a", dst="b").select(
        F.col("cs").alias("a"), F.col("co").alias("b")
    )


def _oriented_mapping(
    triples: DataFrame, spo, inv, sym_props: DataFrame | None
) -> DataFrame | None:
    """The OWL-lite property-derivation mapping ``(p, q, flipped)``:
    every predicate q that an edge of p also holds under, with
    orientation — reachability over the ontology-sized PROPERTY GRAPH
    whose nodes are (property, orientation): ``subPropertyOf``
    preserves orientation, ``inverseOf`` (and a SymmetricProperty's
    implicit self-inverse) flips it. Arbitrary ⊑/inverse interleavings
    (p ⊑ q, q inverseOf r, r ⊑ t, …) collapse into ONE closed mapping,
    so the instance side stays a single broadcast-join pass."""
    parts = []
    if spo is not None:
        sub = triples.filter(F.col("p") == F.lit(int(spo))).select(
            F.col("s").alias("x"), F.col("o").alias("y")
        )
        for flip in (False, True):
            parts.append(
                sub.select(
                    F.struct(
                        F.col("x").alias("prop"), F.lit(flip).alias("flip")
                    ).alias("a"),
                    F.struct(
                        F.col("y").alias("prop"), F.lit(flip).alias("flip")
                    ).alias("b"),
                )
            )
    inv_pairs = None
    if inv is not None:
        one_way = triples.filter(F.col("p") == F.lit(int(inv))).select(
            F.col("s").alias("x"), F.col("o").alias("y")
        )
        inv_pairs = one_way.unionAll(
            one_way.select(F.col("y").alias("x"), F.col("x").alias("y"))
        )
    if sym_props is not None:
        self_inv = sym_props.select(
            F.col("prop").alias("x"), F.col("prop").alias("y")
        )
        inv_pairs = (
            self_inv if inv_pairs is None else inv_pairs.unionAll(self_inv)
        )
    if inv_pairs is not None:
        for flip in (False, True):
            parts.append(
                inv_pairs.select(
                    F.struct(
                        F.col("x").alias("prop"), F.lit(flip).alias("flip")
                    ).alias("a"),
                    F.struct(
                        F.col("y").alias("prop"),
                        F.lit(not flip).alias("flip"),
                    ).alias("b"),
                )
            )
    if not parts:
        return None
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionAll(p)
    closed = transitive_closure(edges, src="a", dst="b")
    return closed.filter(~F.col("cs.flip")).select(
        F.col("cs.prop").alias("p"),
        F.col("co.prop").alias("q"),
        F.col("co.flip").alias("flipped"),
    )


def rdfs_closure(triples: DataFrame, vocab: dict[str, int]) -> DataFrame:
    """Materialize the ρdf + OWL-lite entailments of ``triples``
    (encoded ``(s, p, o)``): returns base ∪ derived, distinct.
    ``vocab`` maps the vocabulary keys (type / subclassof /
    subpropertyof / domain / range / inverseof / symmetricproperty /
    transitiveproperty) to their dictionary ids; absent keys disable
    their rules."""
    typ = vocab.get("type")
    sco = vocab.get("subclassof")
    spo = vocab.get("subpropertyof")
    dom = vocab.get("domain")
    rng = vocab.get("range")
    inv = vocab.get("inverseof")
    symc = vocab.get("symmetricproperty")

    parts: list[DataFrame] = [triples]

    def pairs(pid) -> DataFrame | None:
        if pid is None:
            return None
        p = triples.filter(F.col("p") == F.lit(int(pid))).select(
            F.col("s").alias("a"), F.col("o").alias("b")
        )
        return _closed_pairs(p)

    spo_star = pairs(spo)
    if spo_star is not None:
        # rdfs5: the closed subPropertyOf pairs as statements
        parts.append(
            spo_star.select(
                F.col("a").alias("s"),
                F.lit(int(spo)).cast("long").alias("p"),
                F.col("b").alias("o"),
            )
        )
    if inv is not None:
        # owl:inverseOf is symmetric: (p inv q) ⊢ (q inv p) as a statement
        parts.append(
            triples.filter(F.col("p") == F.lit(int(inv))).select(
                F.col("o").alias("s"), "p", F.col("s").alias("o")
            )
        )
    sym_props = None
    if symc is not None and typ is not None:
        sym_props = triples.filter(
            (F.col("p") == F.lit(int(typ))) & (F.col("o") == F.lit(int(symc)))
        ).select(F.col("s").alias("prop"))
    # rdfs7 + prp-inv/prp-symp (r9): ONE closed oriented mapping covers
    # every ⊑/inverse interleaving; instance edges derive in one
    # broadcast-join pass (straight and orientation-flipped halves)
    mapping = _oriented_mapping(triples, spo, inv, sym_props)
    edges = triples
    if mapping is not None:
        straight = triples.join(
            F.broadcast(
                mapping.filter(~F.col("flipped")).select("p", "q")
            ),
            "p",
        ).select("s", F.col("q").alias("p"), "o")
        flipped = triples.join(
            F.broadcast(
                mapping.filter(F.col("flipped")).select("p", "q")
            ),
            "p",
        ).select(
            F.col("o").alias("s"), F.col("q").alias("p"), F.col("s").alias("o")
        )
        derived = straight.unionAll(flipped)
        parts.append(derived)
        edges = triples.unionAll(derived)

    # owl:TransitiveProperty (prp-trp): per DECLARED transitive property
    # (an ontology-bounded set), the semi-naive transitive closure runs
    # over that property's FULLY-DERIVED edge set (everything ⊑/inverse
    # feeds into it is already present), and the closed edges re-expand
    # once through the oriented mapping. Exact in one round BECAUSE two
    # distinct transitive properties related through the mapping REJECT
    # (their closures would feed each other — a data-sized fixpoint this
    # engine will not run silently; real ontologies do not stack
    # transitive properties).
    transc = vocab.get("transitiveproperty")
    if transc is not None and typ is not None:
        # ontology-bounded driver list (the IVF-centroid precedent)
        tp_ids = sorted(
            r["s"]
            for r in triples.filter(
                (F.col("p") == F.lit(int(typ)))
                & (F.col("o") == F.lit(int(transc)))
            ).select("s").distinct().collect()
        )
        if tp_ids and mapping is not None:
            linked = (
                mapping.filter(
                    F.col("p").isin(tp_ids)
                    & F.col("q").isin(tp_ids)
                    & (F.col("p") != F.col("q"))
                )
                .limit(1)
                .count()
            )
            if linked:
                raise ValueError(
                    "transitive properties related through subPropertyOf/"
                    "inverseOf are not supported (their closures feed "
                    "each other — a data-sized fixpoint); break the "
                    "property hierarchy between them"
                )
        for pid in tp_ids:
            pedges = edges.filter(F.col("p") == F.lit(int(pid))).select(
                F.col("s").alias("a"), F.col("o").alias("b")
            )
            closed = transitive_closure(pedges, src="a", dst="b").select(
                F.col("cs").alias("s"),
                F.lit(int(pid)).cast("long").alias("p"),
                F.col("co").alias("o"),
            )
            new_parts = [closed]
            if mapping is not None:
                img = mapping.filter(
                    (F.col("p") == F.lit(int(pid)))
                    & (F.col("q") != F.lit(int(pid)))
                )
                new_parts.append(
                    closed.join(
                        F.broadcast(
                            img.filter(~F.col("flipped")).select("p", "q")
                        ),
                        "p",
                    ).select("s", F.col("q").alias("p"), "o")
                )
                new_parts.append(
                    closed.join(
                        F.broadcast(
                            img.filter(F.col("flipped")).select("p", "q")
                        ),
                        "p",
                    ).select(
                        F.col("o").alias("s"),
                        F.col("q").alias("p"),
                        F.col("s").alias("o"),
                    )
                )
            for np_ in new_parts:
                parts.append(np_)
                edges = edges.unionAll(np_)

    if typ is not None:
        typed_parts: list[DataFrame] = [
            edges.filter(F.col("p") == F.lit(int(typ))).select(
                "s", F.col("o").alias("c")
            )
        ]
        if dom is not None:
            dom_pairs = triples.filter(
                F.col("p") == F.lit(int(dom))
            ).select(F.col("s").alias("p"), F.col("o").alias("c"))
            typed_parts.append(
                edges.join(F.broadcast(dom_pairs), "p").select("s", "c")
            )
        if rng is not None:
            rng_pairs = triples.filter(
                F.col("p") == F.lit(int(rng))
            ).select(F.col("s").alias("p"), F.col("o").alias("c"))
            typed_parts.append(
                edges.join(F.broadcast(rng_pairs), "p").select(
                    F.col("o").alias("s"), "c"
                )
            )
        types = typed_parts[0]
        for t in typed_parts[1:]:
            types = types.unionAll(t)
        sco_star = pairs(sco)
        if sco_star is not None:
            # rdfs11: closed subClassOf pairs as statements
            parts.append(
                sco_star.select(
                    F.col("a").alias("s"),
                    F.lit(int(sco)).cast("long").alias("p"),
                    F.col("b").alias("o"),
                )
            )
            # rdfs9: inherited types
            types = types.unionAll(
                types.join(
                    F.broadcast(sco_star.withColumnRenamed("a", "c")), "c"
                ).select("s", F.col("b").alias("c"))
            )
        parts.append(
            types.select(
                "s", F.lit(int(typ)).cast("long").alias("p"),
                F.col("c").alias("o"),
            )
        )

    out = parts[0]
    for part in parts[1:]:
        out = out.unionAll(part.select("s", "p", "o"))
    return out.distinct()


def functional_same_as(
    triples: DataFrame, vocab: dict[str, int]
) -> DataFrame | None:
    """prp-fp / prp-ifp (r10): identity pairs entailed by declared
    owl:FunctionalProperty / owl:InverseFunctionalProperty statements —

        p a FunctionalProperty,        (x p y1), (x p y2) ⊢ y1 = y2
        p a InverseFunctionalProperty, (x1 p y), (x2 p y) ⊢ x1 = x2

    Returns a ``(s, o)`` PAIR relation (or None when nothing is
    declared) feeding ``same_as_canonicalize``'s component build —
    pairs, not statements, so an ontology whose dictionary lacks an
    owl:sameAs term still smushes.

    Scale shape: the declared-property edge set groups by (p, key) and
    links every member to the group MIN — k−1 pairs per violating
    group instead of the naive self-join's k(k−1)/2, with identical
    connected components downstream (a spanning set per group). One
    keyed aggregation + one join per rule; the declaration list rides a
    broadcast (ontology-bounded, like TransitiveProperty)."""
    typ = vocab.get("type")
    if typ is None:
        return None

    def declared(cls_key: str) -> DataFrame | None:
        cid = vocab.get(cls_key)
        if cid is None:
            return None
        return triples.filter(
            (F.col("p") == F.lit(int(typ))) & (F.col("o") == F.lit(int(cid)))
        ).select(F.col("s").alias("prop"))

    parts: list[DataFrame] = []
    for cls_key, key_col, val_col in (
        ("functionalproperty", "s", "o"),
        ("inversefunctionalproperty", "o", "s"),
    ):
        props = declared(cls_key)
        if props is None:
            continue
        e = triples.join(
            F.broadcast(props), triples["p"] == props["prop"]
        ).select("p", key_col, val_col)
        rep = e.groupBy("p", key_col).agg(F.min(val_col).alias("__rep"))
        parts.append(
            e.join(rep, ["p", key_col])
            .filter(F.col(val_col) != F.col("__rep"))
            .select(F.col("__rep").alias("s"), F.col(val_col).alias("o"))
        )
    if not parts:
        return None
    out = parts[0]
    for part in parts[1:]:
        out = out.unionAll(part)
    return out


def same_as_fixpoint(
    triples: DataFrame, vocab: dict[str, int], max_rounds: int = 50
) -> DataFrame | None:
    """Identity fixpoint: explicit owl:sameAs statements + prp-fp/
    prp-ifp derived pairs, smushed to min-id representatives, ITERATED
    — a merge can make two edges share a functional key they did not
    share before, cascading new identities. Each round performs at
    least one merge, so the round count is bounded by the cascade
    depth (real ontologies converge in one or two); per-round lineage
    is truncated with localCheckpoint. Returns the canonical triple
    relation, or None when the vocabulary declares no identity
    machinery at all (caller no-op)."""
    derived = functional_same_as(triples, vocab)
    sameas = vocab.get("sameas")
    if sameas is None and derived is None:
        return None
    out, _ = same_as_canonicalize(triples, sameas, extra_pairs=derived)
    if derived is None:
        # explicit sameAs only: no functional declarations means no
        # merge can cascade — return the LAZY one-round plan (no eager
        # corpus materialization for the common case)
        return out
    for _round in range(max_rounds):
        out = out.localCheckpoint(eager=True)
        derived = functional_same_as(out, vocab)
        if derived.limit(1).count() == 0:
            return out
        out, _ = same_as_canonicalize(out, None, extra_pairs=derived)
    raise ValueError(
        "sameAs derivation did not converge in "
        f"{max_rounds} rounds — the functional-property merge cascade "
        "is data-shaped; smush in stages or review the declarations"
    )


def same_as_canonicalize(
    triples: DataFrame,
    sameas_id: int | None,
    extra_pairs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """owl:sameAs smushing: identity clusters = connected components of
    the sameAs graph (min-id representative — the existing min-label
    propagation, O(cluster diameter) rounds); every OTHER statement
    rewrites s/p/o through the bounded-per-cluster mapping and the
    sameAs statements themselves collapse away. ``extra_pairs`` adds
    derived ``(s, o)`` identity pairs (prp-fp/prp-ifp — they join the
    component build but are never statements); ``sameas_id`` may be
    None when only derived pairs exist. Returns ``(canonical triples,
    mapping)`` where mapping is ``(node, rep)`` for every
    non-representative member (persist it to answer queries about
    original ids). Exact and idempotent: re-smushing the output with
    the (now empty) sameAs graph is the identity."""
    from rdfproject_msc_spark.operators.graph import connected_components

    if sameas_id is not None:
        sa = triples.filter(F.col("p") == F.lit(int(sameas_id))).select(
            "s", "o"
        )
        rest = triples.filter(F.col("p") != F.lit(int(sameas_id)))
    else:
        sa = triples.select("s", "o").limit(0)
        rest = triples
    if extra_pairs is not None:
        sa = sa.unionAll(extra_pairs.select("s", "o"))
    comps = connected_components(sa, src="s", dst="o")
    mapping = comps.filter(F.col("node") != F.col("comp")).select(
        F.col("node"), F.col("comp").alias("rep")
    )
    out = rest
    for c in ("s", "p", "o"):
        m = mapping.select(
            F.col("node").alias(f"__n_{c}"), F.col("rep").alias(f"__r_{c}")
        )
        out = (
            out.join(m, out[c] == m[f"__n_{c}"], "left")
            .withColumn(c, F.coalesce(F.col(f"__r_{c}"), F.col(c)))
            .drop(f"__n_{c}", f"__r_{c}")
        )
    return out.distinct(), mapping


def resolve_vocab(dictionary, term_style: str) -> dict[str, int]:
    """Vocabulary term → id via the bounded constant-lookup mechanism;
    terms the dictionary does not hold are omitted (their rules
    disable), never errors — an ontology without rdfs:range simply
    derives no range typings."""
    terms = LEXICAL_VOCAB if term_style == "lexical" else LOCALIZED_VOCAB
    found = dictionary.lookup_terms(sorted(terms.values()))
    return {k: found[t] for k, t in terms.items() if t in found}
