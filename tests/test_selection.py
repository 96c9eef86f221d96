"""Budgeted data selection (operators/selection.py): exact DuckDB
single-window oracle, boundary semantics, skew robustness, the
no-single-partition-exchange plan pin, and the classifier composition."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.selection import (
    select_quality_budget,
    select_to_budget,
)


def _oracle(rows, budget):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, score DOUBLE, n_tokens BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    return {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            SELECT doc_id,
                   sum(n_tokens) OVER (ORDER BY score DESC, doc_id) AS cum,
                   sum(n_tokens) OVER (ORDER BY score DESC, doc_id)
                     <= {budget} AS sel
            FROM t
            """
        ).fetchall()
    }


def _check(spark, rows, budget, npart=None):
    df = spark.createDataFrame(
        rows, "doc_id long, score double, n_tokens long"
    )
    got = {
        r["doc_id"]: (r["cum_tokens"], r["selected"])
        for r in select_to_budget(
            df,
            budget,
            score_col="score",
            token_col="n_tokens",
            num_partitions=npart,
        ).collect()
    }
    assert got == _oracle(rows, budget)


def test_matches_duckdb_window(spark):
    rows = [(i, float((i * 37) % 100) / 100.0, 10 + (i * 13) % 90)
            for i in range(500)]
    _check(spark, rows, budget=5_000)


def test_ties_break_on_id(spark):
    rows = [(i, 0.5, 100) for i in range(20)]
    _check(spark, rows, budget=550)  # 5 docs fit, 6th straddles → out


def test_skewed_scores_stay_exact(spark):
    # 90% of the corpus at one score — the hot-range case the sampled
    # boundaries must spread rather than serialize
    rows = [(i, 0.99 if i % 10 else float(i % 7) / 10.0, 50)
            for i in range(1000)]
    _check(spark, rows, budget=20_000, npart=16)


def test_budget_smaller_than_any_doc(spark):
    rows = [(1, 0.9, 100), (2, 0.8, 100)]
    _check(spark, rows, budget=50)  # nothing fits


def test_rejects_nonpositive_budget(spark):
    df = spark.createDataFrame([(1, 0.5, 10)], "doc_id long, score double, n_tokens long")
    with pytest.raises(ValueError, match="budget must be positive"):
        select_to_budget(df, 0, score_col="score", token_col="n_tokens")


def test_no_single_partition_window(spark):
    rows = [(i, float(i % 100) / 100.0, 10) for i in range(2000)]
    df = spark.createDataFrame(
        rows, "doc_id long, score double, n_tokens long"
    )
    out = select_to_budget(
        df, 1_000, score_col="score", token_col="n_tokens", num_partitions=8
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    # the data-sized window is partitioned by __pid; only the
    # #partitions-sized offsets relation may pass through a single
    # partition — pin no SinglePartition exchange carrying the data window
    import re

    singles = re.findall(r"Exchange SinglePartition[^\n]*", final)
    for s in singles:
        assert "ENSURE_REQUIREMENTS" in s or "offsets" not in s


def test_quality_budget_composition(spark, sf_dir):
    from rdfproject_msc_spark.operators.classify import REFERENCE_MODEL

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    out = select_quality_budget(docs, REFERENCE_MODEL, budget=3_000)
    rows = out.collect()
    assert len(rows) == 200
    sel = [r for r in rows if r["selected"]]
    unsel = [r for r in rows if not r["selected"]]
    assert sel and unsel
    # greedy prefix: every selected doc scores >= every unselected one,
    # modulo the boundary straddle
    assert sum(r["n_tokens"] for r in sel) <= 3_000
    worst_sel = min(r["quality_prob"] for r in sel)
    best_unsel = max(r["quality_prob"] for r in unsel)
    straddle = [
        r for r in unsel if r["quality_prob"] > worst_sel
    ]
    # only docs blocked by the budget boundary may outscore a selected doc
    for r in straddle:
        assert r["cum_tokens"] > 3_000
    assert best_unsel <= 1.0


def test_cli_select_output_is_pipeline_ready(spark, sf_dir, tmp_path):
    """The select subcommand's output must carry the document columns
    (text included) so it feeds tokenize/export directly — not just the
    id-level verdict."""
    import os

    from rdfproject_msc_spark.cli import main

    out = str(tmp_path / "selected")
    rc = main(
        [
            "select",
            "--docs", os.path.join(sf_dir, "documents.parquet"),
            "--budget", "5000",
            "--keep-only",
            "--out", out,
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    for c in ("doc_id", "text", "quality_prob", "cum_tokens", "selected"):
        assert c in got.columns
    rows = got.collect()
    assert rows and all(r.selected for r in rows)
    assert max(r.cum_tokens for r in rows) <= 5000
