"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over rdfproject_msc_spark.registry — the single source of truth
mapping every implemented operator (SURVEY.md §2 + north-star extensions) to
a Spark query and its DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rdfproject_msc_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: SPARQL multi-pattern BGP → DataFrame join plan → decoded
    terms. Exercises the whole stack: derived triple view, dictionary,
    SPARQL parser/planner, dictionary-join decode (J5)."""
    from rdfproject_msc_spark.dictionary import Dictionary
    from rdfproject_msc_spark.sources.derived import dictionary_df, triples_df
    from rdfproject_msc_spark.sparql.planner import sparql_to_df
    from rdfproject_msc_spark.store import TripleStore

    sf_dir = "/root/testdata/sf0.001"
    store = TripleStore(triples_df(spark, sf_dir), layout="sign_split")
    d = Dictionary(dictionary_df(spark, sf_dir))
    q = "SELECT ?o ?c ?n WHERE { ?o :placedBy ?c . ?c :inNation ?n . }"
    return sparql_to_df(store, q, d, decode=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
