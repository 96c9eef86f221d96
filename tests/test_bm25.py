"""BM25 lexical retrieval: cross-engine oracle, edge cases, and the
zero-shuffle plan pin (the knn_cosine pattern applied to text — per-term
tf and dl are row-local array expressions, idf folds in as literals)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.bm25 import (
    bm25_oracle_sql,
    bm25_topk,
)
from rdfproject_msc_spark.sources.tables import load_table
from tests.oracle import assert_matches_oracle

QUERY = "spark hash join performance"


def test_bm25_matches_duckdb_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk(docs, QUERY, k=20)
    assert_matches_oracle(out, bm25_oracle_sql(QUERY, 20), sf_dir)


def test_bm25_single_term_and_dedup(spark, sf_dir):
    """Repeated / mixed-case / punctuated query terms normalize to one."""
    docs = load_table(spark, sf_dir, "documents")
    a = bm25_topk(docs, "Spark! SPARK spark", k=5).collect()
    b = bm25_topk(docs, "spark", k=5).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]
    assert len(a) == 5 and all(r.score > 0 for r in a)


def test_bm25_rejects_empty_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="no tokens"):
        bm25_topk(docs, "!!! ???")


def test_bm25_plan_is_zero_shuffle(spark, sf_dir):
    """Scoring pass: no Exchange, no join — a pruned (doc_id, text) scan
    into TakeOrderedAndProject (per-partition top-k heaps)."""
    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk(docs, QUERY, k=10)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in final
    assert "Exchange" not in final
    assert "Join" not in final
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in final


def test_bm25_persisted_equals_in_memory(spark, sf_dir, tmp_path):
    """Index probe ≡ the zero-shuffle path bit-for-bit: same Python idf
    literals, same fixed term order in the score sum (the pivoted
    conditional agg reproduces the in-memory addition order), and the
    scan prunes to the query terms' bucket directories."""
    from rdfproject_msc_spark.operators.bm25 import (
        _py_bucket,
        _query_terms,
        bm25_topk_persisted,
        bm25_write,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "bm25")
    bm25_write(docs, path, n_buckets=16)

    # r6: df comes from a token-keyed AGGREGATE + join, never a
    # Window.partitionBy(token) — a stopword must not pin all its
    # postings to one window partition at build time
    import inspect

    from rdfproject_msc_spark.operators import bm25 as _bm25_mod

    assert ".over(" not in inspect.getsource(_bm25_mod.bm25_write)

    out = bm25_topk_persisted(spark, path, QUERY, k=20)
    got = [(r.doc_id, r.score) for r in out.collect()]
    want = [(r.doc_id, r.score) for r in bm25_topk(docs, QUERY, k=20).collect()]
    assert got == want and len(got) == 20

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    # a query whose terms are absent from the corpus returns empty
    assert bm25_topk_persisted(spark, path, "zzzqx9 qqqq7").count() == 0

    # bucket twin must match the JVM hash for every query term
    from rdfproject_msc_spark.operators.sampling import hash_bucket

    terms = _query_terms(QUERY)
    jvm = (
        spark.createDataFrame([(t,) for t in terms], "token string")
        .select("token", hash_bucket(F.col("token"), 16).alias("b"))
        .collect()
    )
    assert {r.token: r.b for r in jvm} == {
        t: _py_bucket(t, 16) for t in terms
    }


def test_cli_search_docs_and_index(spark, sf_dir, tmp_path, capsys):
    """CLI search subcommand end-to-end: direct-docs scoring, index
    build, and index probe all through main()."""
    from rdfproject_msc_spark.cli import main

    docs = f"{sf_dir}/documents.parquet"
    idx = str(tmp_path / "idx")
    assert main(["search", "--docs", docs, "--query", QUERY, "--k", "3"]) == 0
    out1 = capsys.readouterr().out
    assert "score" in out1
    assert main(["search", "--docs", docs, "--index", idx, "--build-index"]) == 0
    capsys.readouterr()
    assert main(["search", "--index", idx, "--query", QUERY, "--k", "3"]) == 0
    out2 = capsys.readouterr().out
    assert out1.splitlines()[-4:] == out2.splitlines()[-4:]
    assert main(["search", "--query", QUERY]) == 2
