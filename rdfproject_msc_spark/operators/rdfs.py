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

LEXICAL_VOCAB = {
    "type": f"<{RDF_NS}type>",
    "subclassof": f"<{RDFS_NS}subClassOf>",
    "subpropertyof": f"<{RDFS_NS}subPropertyOf>",
    "domain": f"<{RDFS_NS}domain>",
    "range": f"<{RDFS_NS}range>",
}
LOCALIZED_VOCAB = {
    "type": ":type",
    "subclassof": ":subClassOf",
    "subpropertyof": ":subPropertyOf",
    "domain": ":domain",
    "range": ":range",
}


def _closed_pairs(schema: DataFrame) -> DataFrame:
    """(a, b) schema pairs → transitive closure as (a, b) — semi-naive
    over the ontology-sized relation (diameter-bounded rounds)."""
    return transitive_closure(schema, src="a", dst="b").select(
        F.col("cs").alias("a"), F.col("co").alias("b")
    )


def rdfs_closure(triples: DataFrame, vocab: dict[str, int]) -> DataFrame:
    """Materialize the ρdf entailments of ``triples`` (encoded ``(s, p,
    o)``): returns base ∪ derived, distinct. ``vocab`` maps the five
    vocabulary keys (type / subclassof / subpropertyof / domain /
    range) to their dictionary ids; absent keys disable their rules."""
    typ = vocab.get("type")
    sco = vocab.get("subclassof")
    spo = vocab.get("subpropertyof")
    dom = vocab.get("domain")
    rng = vocab.get("range")

    parts: list[DataFrame] = [triples]

    def pairs(pid) -> DataFrame | None:
        if pid is None:
            return None
        p = triples.filter(F.col("p") == F.lit(int(pid))).select(
            F.col("s").alias("a"), F.col("o").alias("b")
        )
        return _closed_pairs(p)

    spo_star = pairs(spo)
    edges = triples
    if spo_star is not None:
        # rdfs5: the closed subPropertyOf pairs as statements
        parts.append(
            spo_star.select(
                F.col("a").alias("s"),
                F.lit(int(spo)).cast("long").alias("p"),
                F.col("b").alias("o"),
            )
        )
        # rdfs7: inherited property edges — broadcast the ontology-sized
        # closure, never shuffle the instance side
        inherited = triples.join(
            F.broadcast(spo_star.withColumnRenamed("a", "p")), "p"
        ).select("s", F.col("b").alias("p"), "o")
        parts.append(inherited)
        edges = triples.unionAll(inherited)

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


def resolve_vocab(dictionary, term_style: str) -> dict[str, int]:
    """Vocabulary term → id via the bounded constant-lookup mechanism;
    terms the dictionary does not hold are omitted (their rules
    disable), never errors — an ontology without rdfs:range simply
    derives no range typings."""
    terms = LEXICAL_VOCAB if term_style == "lexical" else LOCALIZED_VOCAB
    found = dictionary.lookup_terms(sorted(terms.values()))
    return {k: found[t] for k, t in terms.items() if t in found}
