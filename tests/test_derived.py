"""Pins the Spark-side derived RDF view equal to its DuckDB CTE twin —
the foundation every oracle-checked RDF query stands on."""

from rdfproject_msc_spark.sources.derived import (
    DICTIONARY_SQL,
    TRIPLES_SQL,
    dictionary_df,
    triples_df,
)
from tests.oracle import assert_matches_oracle


def test_triples_match_sql_twin(spark, sf_dir):
    assert_matches_oracle(triples_df(spark, sf_dir), TRIPLES_SQL, sf_dir)


def test_dictionary_matches_sql_twin(spark, sf_dir):
    assert_matches_oracle(dictionary_df(spark, sf_dir), DICTIONARY_SQL, sf_dir)


def test_dictionary_is_valid(spark, sf_dir):
    from rdfproject_msc_spark.dictionary import Dictionary

    Dictionary(dictionary_df(spark, sf_dir)).validate()


def test_no_zero_ids_in_triples(spark, sf_dir):
    # id 0 is the SPARQL variable sentinel; derivation must never emit it
    from pyspark.sql import functions as F

    t = triples_df(spark, sf_dir)
    assert (
        t.filter((F.col("s") == 0) | (F.col("p") == 0) | (F.col("o") == 0)).count() == 0
    )
