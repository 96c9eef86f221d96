"""Leakage-safe splitting (operators/leakage.py): train documents
contaminating the held-out splits are quarantined — pinned by a
constructed-leak fixture, an exact DuckDB twin over the real documents
table, and a no-broadcast plan pin for the corpus-sized holdout join."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.leakage import leakage_safe_split
from rdfproject_msc_spark.registry import _hex6_sql
from rdfproject_msc_spark.sources.tables import load_table
from tests.oracle import assert_matches_oracle

# DuckDB twin: the md5-bucket split (sampling.with_split: digits 1-6,
# alphabetical ranges test<100, train<900, val rest), then 5-gram
# overlap of train docs against the holdout's distinct n-grams
LEAKAGE_SQL = f"""
WITH s AS (
    SELECT doc_id, text,
           CASE WHEN CAST({_hex6_sql(1)} % 1000 AS BIGINT) < 100
                THEN 'test'
                WHEN CAST({_hex6_sql(1)} % 1000 AS BIGINT) < 900
                THEN 'train'
                ELSE 'val' END AS split
    FROM documents
),
tok AS (
    SELECT doc_id, split,
           list_filter(string_split(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '') AS toks
    FROM s
),
ng AS (
    SELECT doc_id, split,
           CASE WHEN len(toks) >= 5
                THEN list_distinct(list_transform(range(1, len(toks) - 3),
                                   i -> array_to_string(toks[i:i+4], ' ')))
                ELSE [] END AS ngs
    FROM tok
),
bench AS (SELECT DISTINCT unnest(ngs) AS ng FROM ng WHERE split <> 'train'),
corpus AS (SELECT doc_id, unnest(ngs) AS ng FROM ng WHERE split = 'train'),
counted AS (
    SELECT c.doc_id, count(c.ng) AS n_ngrams, count(b.ng) AS n_matched
    FROM corpus c LEFT JOIN bench b ON c.ng = b.ng
    GROUP BY c.doc_id
),
leaked AS (
    SELECT doc_id FROM counted
    WHERE n_ngrams > 0
      AND CAST(n_matched AS DOUBLE) / n_ngrams >= 0.5
)
SELECT s.doc_id,
       CASE WHEN l.doc_id IS NOT NULL THEN 'train_leaked'
            ELSE s.split END AS split
FROM s LEFT JOIN leaked l ON s.doc_id = l.doc_id
"""


def test_constructed_leak_is_quarantined(spark):
    """Doc 17 is a near-copy of an eval doc → train_leaked; an unrelated
    train doc stays train; eval rows are never relabelled."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # fully-distinct filler docs: no cross-doc n-gram overlap at all
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(100)
    ]
    # find ids landing in each split first
    probe = leakage_safe_split(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    by_split = {
        s: [r.doc_id for r in probe.filter(F.col("split") == s).collect()]
        for s in ("train", "val", "test")
    }
    eval_id = (by_split["val"] + by_split["test"])[0]
    train_ids = by_split["train"]
    # plant the leak: one train doc copies the eval doc's text
    leak_id, clean_id = train_ids[0], train_ids[1]
    rows2 = [
        (i, base if i in (eval_id, leak_id) else t) for i, t in rows
    ]
    out = {
        r.doc_id: r.split
        for r in leakage_safe_split(
            spark.createDataFrame(rows2, "doc_id long, text string")
        ).collect()
    }
    assert out[leak_id] == "train_leaked"
    assert out[clean_id] == "train"
    assert out[eval_id] in ("val", "test")


def test_leakage_split_matches_duckdb(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = leakage_safe_split(docs).select("doc_id", "split")
    assert_matches_oracle(got, LEAKAGE_SQL, sf_dir)


def test_holdout_join_is_not_broadcast(spark, sf_dir):
    """The holdout n-gram set is a constant fraction of the corpus, not
    an MB-sized benchmark: the contamination join must be a shuffle
    hash join, never a broadcast of the holdout."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    df = leakage_safe_split(docs)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    # AQE may still pick broadcast at this tiny sf; the PIN is that no
    # broadcast HINT forced it — read the analyzed plan instead
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


def test_leakage_bloom_path_bit_identical(spark, sf_dir):
    """bloom_fpp pre-filters the train n-gram arrays scan-side before the
    holdout shuffle join; no false negatives + exact survivor join ⇒ the
    split labels are bit-identical to the unfiltered path."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plain = leakage_safe_split(docs, n=3)
    bloomed = leakage_safe_split(docs, n=3, bloom_fpp=0.01)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bloomed.collect())
    )


def test_leakage_bloom_cap_rederives_hash_count(spark):
    """When the holdout population forces the bits cap, k must be
    re-derived for the real density — a saturated filter with the
    uncapped k would over-hash. Results stay identical either way."""
    rows = [(i, f"alpha beta gamma delta token{i} omega end{i}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plain = leakage_safe_split(docs, n=3)
    capped = leakage_safe_split(docs, n=3, bloom_fpp=0.01, bloom_max_bits=256)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, capped.collect())
    )
