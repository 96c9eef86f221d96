"""Engine facade test: the full text→layout→SQL/SPARQL→decode lifecycle
through the public API."""

from __future__ import annotations

import pytest

from rdfproject_msc_spark import Engine
from rdfproject_msc_spark.sources.derived import dictionary_df, triples_df


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("engine")
    triples_df(spark, sf_dir).write.mode("overwrite").csv(
        str(base / "triples"), sep=" "
    )
    dictionary_df(spark, sf_dir).write.mode("overwrite").csv(
        str(base / "dict"), sep="\t"
    )
    return Engine(spark).load_triples(
        str(base / "triples"),
        str(base / "dict"),
        layout="sign_split",
        cluster_by="s",
    )


def test_sql_path(engine):
    df = engine.sql("SELECT count(*) AS n FROM Positive")
    assert df.collect()[0].n > 0


def test_sparql_path_with_decode(engine):
    df = engine.sparql(
        "SELECT ?c ?n WHERE { :order_1 :placedBy ?c . ?c :inNation ?n . }",
        decode=True,
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].c.startswith(":customer_")
    assert rows[0].n.startswith(":nation_")


def test_save_open_roundtrip(engine, spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("persist") / "store")
    engine.save(path)
    e2 = Engine(spark, dictionary=engine.dictionary).open(
        path, layout="sign_split", cluster_by="s"
    )
    a = engine.sparql("SELECT ?e WHERE { ?e :byUser :customer_7 . }")
    b = e2.sparql("SELECT ?e WHERE { ?e :byUser :customer_7 . }")
    assert sorted(r.e for r in a.collect()) == sorted(r.e for r in b.collect())


def test_errors_without_store(spark):
    e = Engine(spark)
    with pytest.raises(ValueError, match="no triples loaded"):
        e.sparql("SELECT ?x WHERE { ?x :p ?y . }")
