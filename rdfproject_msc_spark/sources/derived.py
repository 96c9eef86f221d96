"""Deterministic RDF triple + dictionary view over the synthetic testdata.

The reference's data model is a dictionary-encoded triple table
``(Subject, Predicate, Object)`` of signed integers where the *sign of the
Subject* carries meaning (Positive/Negative table routing —
PartitionQueryingBRDSubject.java:100-124) and id 0 is reserved as the
SPARQL translator's variable sentinel (MyOpVisitorBase.java:74-78).

The driver's testdata has no triples file, so we derive a deterministic RDF
graph from the TPC-H-ish tables. The SAME derivation is defined twice — as
DataFrame code for Spark and as an ANSI-SQL CTE body for the DuckDB oracle —
and a test pins their equivalence, so every RDF query below is oracle-checkable.

Entity-ID encoding (never 0; sign of subject meaningful):

    customer  c_custkey  * 10 + 1      (positive)
    order     o_orderkey * 10 + 2      (positive)
    nation    n_nationkey* 10 + 3      (positive)
    region    r_regionkey* 10 + 4      (positive)
    event   -(event_id   * 10 + 7)     (NEGATIVE — populates the Negative table)
    etype     code       * 10 + 9      (positive; code = alphabetic rank of event_type)
    predicates: tag-8 ids 18/28/38/48/58/68 (cannot collide with entities)

Graph shape (mirrors the reference's AIS 2-hop chains, SURVEY.md §1.2):

    order --:placedBy(18)--> customer --:inNation(28)--> nation --:inRegion(38)--> region
    event --:byUser(48)-->  customer
    customer --:linkedEvent(58)--> event          (positive subject, NEGATIVE object:
                                                   exercises J2/J3's Neg⋈Pos joins)
    event --:hasType(68)--> etype
    nation --:hasLabel(78)--> '"NAME"@en' (n*100+6) and '"NAME (fr)"@fr' (n*100+16)
    region --:hasLabel(78)--> plain NAME (r*100+26) and '"…"^^:date' (r*100+36)

Label objects are LITERAL terms (ids end in 6, a reserved residue) whose
dictionary text follows the term-kind grammar (planner._term_lang): the
LANG()/DATATYPE()/isIRI() accessor surface evaluates over them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfproject_msc_spark.sources.tables import load_table

# event_type → small code, alphabetical; stable across scale factors.
ETYPE_CODES = {"click": 1, "error": 2, "purchase": 3, "signup": 4, "view": 5}

# predicate ids (tag 8)
P_PLACED_BY = 18
P_IN_NATION = 28
P_IN_REGION = 38
P_BY_USER = 48
P_LINKED_EVENT = 58
P_HAS_TYPE = 68
P_HAS_LABEL = 78

PREDICATE_TERMS = {
    P_PLACED_BY: ":placedBy",
    P_IN_NATION: ":inNation",
    P_IN_REGION: ":inRegion",
    P_BY_USER: ":byUser",
    P_LINKED_EVENT: ":linkedEvent",
    P_HAS_TYPE: ":hasType",
    P_HAS_LABEL: ":hasLabel",
}

_ETYPE_CASE_SQL = (
    "(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 "
    "WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 WHEN 'view' THEN 5 END)"
)

# DuckDB/ANSI CTE body producing the triple relation (columns s, p, o — all BIGINT).
# Table names are the oracle's pre-registered views.
TRIPLES_SQL = f"""
    SELECT CAST(o_orderkey * 10 + 2 AS BIGINT) AS s,
           CAST(18 AS BIGINT) AS p,
           CAST(o_custkey * 10 + 1 AS BIGINT) AS o
    FROM orders
    UNION ALL
    SELECT CAST(c_custkey * 10 + 1 AS BIGINT),
           CAST(28 AS BIGINT),
           CAST(c_nationkey * 10 + 3 AS BIGINT)
    FROM customer
    UNION ALL
    SELECT CAST(n_nationkey * 10 + 3 AS BIGINT),
           CAST(38 AS BIGINT),
           CAST(n_regionkey * 10 + 4 AS BIGINT)
    FROM nation
    UNION ALL
    SELECT CAST(-(event_id * 10 + 7) AS BIGINT),
           CAST(48 AS BIGINT),
           CAST(user_id * 10 + 1 AS BIGINT)
    FROM events
    UNION ALL
    SELECT CAST(c_custkey * 10 + 1 AS BIGINT),
           CAST(58 AS BIGINT),
           CAST(-((c_custkey % 500) * 10 + 7) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT CAST(-(event_id * 10 + 7) AS BIGINT),
           CAST(68 AS BIGINT),
           CAST({_ETYPE_CASE_SQL} * 10 + 9 AS BIGINT)
    FROM events
    UNION ALL
    SELECT CAST(n_nationkey * 10 + 3 AS BIGINT),
           CAST(78 AS BIGINT),
           CAST(n_nationkey * 100 + 6 AS BIGINT)
    FROM nation
    UNION ALL
    SELECT CAST(n_nationkey * 10 + 3 AS BIGINT),
           CAST(78 AS BIGINT),
           CAST(n_nationkey * 100 + 16 AS BIGINT)
    FROM nation
    UNION ALL
    SELECT CAST(r_regionkey * 10 + 4 AS BIGINT),
           CAST(78 AS BIGINT),
           CAST(r_regionkey * 100 + 26 AS BIGINT)
    FROM region
    UNION ALL
    SELECT CAST(r_regionkey * 10 + 4 AS BIGINT),
           CAST(78 AS BIGINT),
           CAST(r_regionkey * 100 + 36 AS BIGINT)
    FROM region
"""

# DuckDB/ANSI CTE body producing the dictionary relation (id BIGINT, term VARCHAR).
DICTIONARY_SQL = f"""
    SELECT CAST(c_custkey * 10 + 1 AS BIGINT) AS id,
           ':customer_' || CAST(c_custkey AS VARCHAR) AS term
    FROM customer
    UNION ALL
    SELECT CAST(o_orderkey * 10 + 2 AS BIGINT),
           ':order_' || CAST(o_orderkey AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT CAST(n_nationkey * 10 + 3 AS BIGINT),
           ':nation_' || CAST(n_nationkey AS VARCHAR)
    FROM nation
    UNION ALL
    SELECT CAST(r_regionkey * 10 + 4 AS BIGINT),
           ':region_' || CAST(r_regionkey AS VARCHAR)
    FROM region
    UNION ALL
    SELECT CAST(-(event_id * 10 + 7) AS BIGINT),
           ':event_' || CAST(event_id AS VARCHAR)
    FROM events
    UNION ALL
    SELECT CAST(code * 10 + 9 AS BIGINT), ':etype_' || name
    FROM (VALUES ('click', 1), ('error', 2), ('purchase', 3),
                 ('signup', 4), ('view', 5)) AS t(name, code)
    UNION ALL
    SELECT CAST(id AS BIGINT), term
    FROM (VALUES (18, ':placedBy'), (28, ':inNation'), (38, ':inRegion'),
                 (48, ':byUser'), (58, ':linkedEvent'), (68, ':hasType'),
                 (78, ':hasLabel')) AS t(id, term)
    UNION ALL
    SELECT CAST(n_nationkey * 100 + 6 AS BIGINT),
           '"' || n_name || '"@en'
    FROM nation
    UNION ALL
    SELECT CAST(n_nationkey * 100 + 16 AS BIGINT),
           '"' || n_name || ' (fr)"@fr'
    FROM nation
    UNION ALL
    SELECT CAST(r_regionkey * 100 + 26 AS BIGINT), r_name
    FROM region
    UNION ALL
    SELECT CAST(r_regionkey * 100 + 36 AS BIGINT),
           '"2020-0' || CAST(r_regionkey + 1 AS VARCHAR) || '-15"^^:date'
    FROM region
"""


def _t(col_s, p: int, col_o) -> list:
    return [
        col_s.cast("long").alias("s"),
        F.lit(p).cast("long").alias("p"),
        col_o.cast("long").alias("o"),
    ]


def triples_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side twin of TRIPLES_SQL (pinned equal by tests/test_derived.py)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    events = load_table(spark, sf_dir, "events")

    c = F.col
    etype_code = F.element_at(
        F.create_map(*[F.lit(x) for kv in ETYPE_CODES.items() for x in kv]),
        c("event_type"),
    )
    parts = [
        orders.select(*_t(c("o_orderkey") * 10 + 2, P_PLACED_BY, c("o_custkey") * 10 + 1)),
        customer.select(*_t(c("c_custkey") * 10 + 1, P_IN_NATION, c("c_nationkey") * 10 + 3)),
        nation.select(*_t(c("n_nationkey") * 10 + 3, P_IN_REGION, c("n_regionkey") * 10 + 4)),
        events.select(*_t(-(c("event_id") * 10 + 7), P_BY_USER, c("user_id") * 10 + 1)),
        customer.select(
            *_t(c("c_custkey") * 10 + 1, P_LINKED_EVENT, -((c("c_custkey") % 500) * 10 + 7))
        ),
        events.select(*_t(-(c("event_id") * 10 + 7), P_HAS_TYPE, etype_code * 10 + 9)),
        nation.select(
            *_t(c("n_nationkey") * 10 + 3, P_HAS_LABEL, c("n_nationkey") * 100 + 6)
        ),
        nation.select(
            *_t(c("n_nationkey") * 10 + 3, P_HAS_LABEL, c("n_nationkey") * 100 + 16)
        ),
        region.select(
            *_t(c("r_regionkey") * 10 + 4, P_HAS_LABEL, c("r_regionkey") * 100 + 26)
        ),
        region.select(
            *_t(c("r_regionkey") * 10 + 4, P_HAS_LABEL, c("r_regionkey") * 100 + 36)
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def dictionary_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side twin of DICTIONARY_SQL."""
    c = F.col

    def entry(df, id_col, prefix, key_col):
        return df.select(
            id_col.cast("long").alias("id"),
            F.concat(F.lit(prefix), key_col.cast("string")).alias("term"),
        )

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    events = load_table(spark, sf_dir, "events")

    statics = [(code * 10 + 9, f":etype_{name}") for name, code in ETYPE_CODES.items()]
    statics += [(pid, term) for pid, term in PREDICATE_TERMS.items()]
    static_df = spark.createDataFrame(statics, "id LONG, term STRING")

    parts = [
        entry(customer, c("c_custkey") * 10 + 1, ":customer_", c("c_custkey")),
        entry(orders, c("o_orderkey") * 10 + 2, ":order_", c("o_orderkey")),
        entry(nation, c("n_nationkey") * 10 + 3, ":nation_", c("n_nationkey")),
        entry(region, c("r_regionkey") * 10 + 4, ":region_", c("r_regionkey")),
        entry(events, -(c("event_id") * 10 + 7), ":event_", c("event_id")),
        # literal label terms (term-text grammar, planner._term_lang):
        # language-tagged '"NAME"@en' / '"NAME (fr)"@fr' for nations,
        # a bare plain literal and a '"..."^^:date' typed literal for
        # regions — the LANG()/DATATYPE() accessor surface
        nation.select(
            (c("n_nationkey") * 100 + 6).cast("long").alias("id"),
            F.concat(F.lit('"'), c("n_name"), F.lit('"@en')).alias("term"),
        ),
        nation.select(
            (c("n_nationkey") * 100 + 16).cast("long").alias("id"),
            F.concat(F.lit('"'), c("n_name"), F.lit(' (fr)"@fr')).alias(
                "term"
            ),
        ),
        region.select(
            (c("r_regionkey") * 100 + 26).cast("long").alias("id"),
            c("r_name").alias("term"),
        ),
        region.select(
            (c("r_regionkey") * 100 + 36).cast("long").alias("id"),
            F.concat(
                F.lit('"2020-0'),
                (c("r_regionkey") + 1).cast("string"),
                F.lit('-15"^^:date'),
            ).alias("term"),
        ),
        static_df,
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
