"""Unigram LM quality scoring: hand-computed cases, vocabulary-cut
determinism, the broadcast/one-shuffle plan pin, and the DuckDB oracle twin
over the real documents table (registry window full — the cross-engine
oracle lives here, like test_repetition)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.lmscore import (
    doc_lm_score,
    unigram_vocab,
)
from rdfproject_msc_spark.sources.tables import load_table
from tests.oracle import duck_connect


def test_vocab_counts_and_surprisal(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c")], "doc_id long, text string"
    )
    rows = {r.token: (r.n, r.surprisal) for r in unigram_vocab(docs).collect()}
    # counts: a=4, b=2, c=1 of 7 total
    assert {t: n for t, (n, _) in rows.items()} == {"a": 4, "b": 2, "c": 1}
    assert abs(rows["a"][1] - (-math.log2(4 / 7))) < 1e-12
    assert abs(rows["c"][1] - (-math.log2(1 / 7))) < 1e-12


def test_vocab_cut_is_deterministic(spark):
    # ties broken by token asc: with size=2 of {b:1, a:1, c:2} keep c, a
    docs = spark.createDataFrame([(1, "c c b a")], "doc_id long, text string")
    got = sorted(
        r.token for r in unigram_vocab(docs, vocab_size=2).collect()
    )
    assert got == ["a", "c"]


def test_doc_scores_and_oov(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c")], "doc_id long, text string"
    )
    vocab = unigram_vocab(docs, vocab_size=2)  # keeps a, b; c is OOV
    got = {
        r.doc_id: (r.n_tokens, r.bits_per_token)
        for r in doc_lm_score(docs, vocab, oov_surprisal=24.0).collect()
    }
    sa, sb = -math.log2(4 / 7), -math.log2(2 / 7)
    assert got[1][0] == 4
    assert abs(got[1][1] - (3 * sa + sb) / 4) < 1e-12
    assert got[2][0] == 3
    assert abs(got[2][1] - (sa + sb + 24.0) / 3) < 1e-12
    # empty document → flat OOV penalty, not NULL
    empty = spark.createDataFrame([(9, "")], "doc_id long, text string")
    r = doc_lm_score(empty, vocab, oov_surprisal=24.0).collect()[0]
    assert (r.n_tokens, r.bits_per_token) == (0, 24.0)


def test_scoring_plan_broadcasts_vocab(spark):
    docs = spark.createDataFrame(
        [(i, "w a b c") for i in range(20)], "doc_id long, text string"
    )
    vocab = unigram_vocab(docs, vocab_size=3)
    plan = (
        doc_lm_score(docs, vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the corpus shuffles once, keyed by doc id
    assert (
        sum(
            "Exchange hashpartitioning(doc_id" in ln
            for ln in plan.splitlines()
        )
        == 1
    )


def test_lm_score_matches_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    vocab = unigram_vocab(docs, vocab_size=500)
    got = {
        r.doc_id: (r.n_tokens, r.bits_per_token)
        for r in doc_lm_score(docs, vocab).collect()
    }
    con = duck_connect(sf_dir)
    rows = con.execute(
        """
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split(regexp_replace(lower(text),
                  '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')) AS token
    FROM documents
),
counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
total AS (SELECT sum(n) AS t FROM counts),
vocab AS (SELECT token, -log2(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)) AS s
          FROM counts, total ORDER BY n DESC, token LIMIT 500),
scored AS (SELECT k.doc_id, coalesce(v.s, 24.0) AS s
           FROM tok k LEFT JOIN vocab v USING (token)),
agg AS (SELECT doc_id, count(*) AS cnt, sum(s) AS bits
        FROM scored GROUP BY doc_id)
SELECT d.doc_id, coalesce(cnt, 0) AS n_tokens,
       CASE WHEN coalesce(cnt, 0) > 0 THEN bits / cnt ELSE 24.0 END AS bpt
FROM (SELECT doc_id FROM documents) d
LEFT JOIN agg USING (doc_id)
"""
    ).fetchall()
    assert len(rows) == len(got)
    for doc_id, n_tokens, bpt in rows:
        sn, sb = got[doc_id]
        assert sn == n_tokens, doc_id
        assert abs(sb - bpt) < 1e-9, doc_id


def test_perplexity_partition_matches_duckdb(spark, sf_dir):
    """CCNet head/middle/tail bucketing (r8): thresholds from the exact
    percentile aggregate, bucket assignment vs a DuckDB CASE twin, and
    the terciles actually split the corpus ~evenly."""
    import duckdb

    from rdfproject_msc_spark.operators.lmscore import (
        lm_score_thresholds,
        perplexity_partition,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = unigram_vocab(docs, vocab_size=5000)
    scored = doc_lm_score(docs, vocab)
    t1, t2 = lm_score_thresholds(scored)
    assert t1 < t2
    out = perplexity_partition(scored, [t1, t2])
    got = sorted(
        (r["doc_id"], r["ppl_bucket"])
        for r in out.select("doc_id", "ppl_bucket").collect()
    )
    pdf = scored.toPandas()
    con = duckdb.connect()
    con.register("scored", pdf)
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
SELECT doc_id,
       CASE WHEN bits_per_token <= {t1!r} THEN 'head'
            WHEN bits_per_token <= {t2!r} THEN 'middle'
            ELSE 'tail' END AS b
FROM scored
"""
            ).fetchall(),
        )
    )
    assert got == want
    counts = {r["ppl_bucket"]: r["count"] for r in out.groupBy("ppl_bucket").count().collect()}
    n = sum(counts.values())
    assert set(counts) == {"head", "middle", "tail"}
    for b in counts:
        assert counts[b] >= n // 5  # exact terciles: no bucket starves

    # validation
    import pytest

    with pytest.raises(ValueError, match="thresholds"):
        perplexity_partition(scored, [t2, t1])
    with pytest.raises(ValueError, match="labels"):
        perplexity_partition(scored, [t1])


def test_approx_thresholds_within_rank_error(spark):
    """mode='approx' (percentile_approx, explicit accuracy) must land each
    boundary within the configured rank error (1/accuracy) of its target
    fraction on a heavily SKEWED score distribution; mode='exact' stays
    the default and both modes agree exactly when accuracy is huge."""
    from rdfproject_msc_spark.operators.lmscore import lm_score_thresholds

    # skew: 90% of mass piled at 1.0, a long sparse tail above
    vals = [1.0] * 9000 + [1.0 + (i + 1) / 100.0 for i in range(1000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "doc_id long, bits_per_token double",
    )
    fr = (0.25, 0.5, 0.9, 0.99)
    accuracy = 100  # rank error <= 1%
    approx = lm_score_thresholds(df, fr, mode="approx", accuracy=accuracy)
    n = len(vals)
    svals = sorted(vals)
    for f, b in zip(fr, approx):
        # achieved rank of the returned boundary, as a fraction
        lo = sum(1 for v in svals if v < b) / n
        hi = sum(1 for v in svals if v <= b) / n
        err = 1.0 / accuracy + 1e-9
        assert lo - err <= f <= hi + err, (f, b, lo, hi)
    exact = lm_score_thresholds(df, fr)
    tight = lm_score_thresholds(df, fr, mode="approx", accuracy=1_000_000)
    # at near-exact accuracy the approx boundaries are real data values
    # within the same 1/accuracy rank band as the exact interpolation
    for e, t in zip(exact, tight):
        assert abs(e - t) < 0.02
    with pytest.raises(ValueError, match="mode"):
        lm_score_thresholds(df, fr, mode="fast")


def test_order_boundaries_approx_mode(spark):
    from rdfproject_msc_spark.sources.export import order_boundaries

    df = spark.createDataFrame(
        [(i, float(i % 97)) for i in range(5000)], "doc_id long, s double"
    )
    ex = order_boundaries(df, "s", 4)
    ap = order_boundaries(df, "s", 4, mode="approx", accuracy=10_000)
    # a 97-value distribution at accuracy 10k: approx == exact-rank value
    for e, a in zip(ex, ap):
        assert abs(e - a) <= 1.0
