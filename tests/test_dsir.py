"""DSIR importance-weight selection (operators/dsir.py) vs an exact DuckDB
twin, plus the determinism / selection-semantics / plan-shape contracts."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators import dsir

N_BUCKETS = 256


def _hex_sql(src: str, start: int, n: int) -> str:
    """DuckDB twin of Spark conv(substring(md5(src), start, n), 16, 10)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({src}, {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    )


def _weights_sql(smoothing: float = 1.0) -> str:
    """log_weight per raw doc, replicating dsir_weights end to end:
    unigram+bigram features, md5-hex6 buckets, Laplace-smoothed bucket
    LMs over raw/target, per-doc sum of log ratios."""
    bucket = f"({_hex_sql('md5(feat)', 1, 6)}) % {N_BUCKETS}"
    return f"""
WITH tok AS (
    SELECT doc_id, (doc_id % 13 = 0) AS is_target,
           list_filter(string_split(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '') AS toks
    FROM docs
),
feats AS (
    SELECT doc_id, is_target, unnest(toks) AS feat FROM tok
    UNION ALL
    SELECT doc_id, is_target,
           unnest(list_transform(range(1, len(toks)),
                  i -> toks[i] || ' ' || toks[i + 1])) AS feat
    FROM tok
),
bucketed AS (SELECT doc_id, is_target, {bucket} AS bucket FROM feats),
p AS (SELECT bucket, count(*) AS c FROM bucketed WHERE is_target GROUP BY 1),
q AS (SELECT bucket, count(*) AS c FROM bucketed WHERE NOT is_target GROUP BY 1),
pt AS (SELECT coalesce(sum(c), 0) + {smoothing} * {N_BUCKETS} AS d FROM p),
qt AS (SELECT coalesce(sum(c), 0) + {smoothing} * {N_BUCKETS} AS d FROM q),
ratios AS (
    SELECT b.range AS bucket,
           ln((coalesce(p.c, 0) + {smoothing}) / (SELECT d FROM pt))
         - ln((coalesce(q.c, 0) + {smoothing}) / (SELECT d FROM qt)) AS lr
    FROM range({N_BUCKETS}) b
    LEFT JOIN p ON p.bucket = b.range
    LEFT JOIN q ON q.bucket = b.range
),
doc_w AS (
    SELECT f.doc_id, count(*) AS n_feats, sum(r.lr) AS log_weight
    FROM bucketed f JOIN ratios r USING (bucket)
    WHERE NOT f.is_target
    GROUP BY 1
)
SELECT d.doc_id,
       coalesce(w.n_feats, 0) AS n_feats,
       coalesce(w.log_weight, 0.0) AS log_weight
FROM (SELECT doc_id FROM docs WHERE doc_id % 13 <> 0) d
LEFT JOIN doc_w w USING (doc_id)
ORDER BY doc_id
"""


@pytest.fixture(scope="module")
def split(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.filter(F.col("doc_id") % 13 == 0)
    raw = docs.filter(F.col("doc_id") % 13 != 0)
    return docs, raw, target


def test_weights_match_duckdb(split, sf_dir):
    docs, raw, target = split
    got = (
        dsir.dsir_weights(raw, target, n_buckets=N_BUCKETS)
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(_weights_sql()).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["doc_id"], g["n_feats"]) == (w[0], w[1])
        assert g["log_weight"] == pytest.approx(w[2], abs=1e-9)


def test_target_like_docs_score_higher(spark):
    # target speaks a distinctive vocabulary; raw doc 1 shares it, raw
    # doc 2 does not — the importance weight must rank doc 1 first
    target = spark.createDataFrame(
        [(100 + i, "quantum flux capacitor resonance cascade") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "quantum flux capacitor resonance cascade"),
            (2, "the cat sat on the mat and slept all day"),
        ],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir.dsir_weights(raw, target, n_buckets=N_BUCKETS).collect()
    }
    assert w[1] > w[2]


def test_empty_doc_keeps_neutral_row(spark):
    target = spark.createDataFrame(
        [(10, "alpha beta gamma")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dsir.dsir_weights(raw, target, n_buckets=N_BUCKETS).collect()
    }
    assert set(rows) == {1, 2, 3}
    for d in (2, 3):
        assert rows[d]["n_feats"] == 0
        assert rows[d]["log_weight"] == 0.0


def test_gumbel_key_deterministic_and_finite(spark):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("log_weight")
    )
    a = df.select(
        dsir.gumbel_key(F.col("log_weight"), F.col("doc_id")).alias("k")
    ).collect()
    b = df.select(
        dsir.gumbel_key(F.col("log_weight"), F.col("doc_id")).alias("k")
    ).collect()
    assert [r["k"] for r in a] == [r["k"] for r in b]
    ks = [r["k"] for r in a]
    assert all(math.isfinite(k) for k in ks)
    # Gumbel(0,1) median is -ln(ln 2) ≈ 0.3665; a sane draw straddles it
    assert min(ks) < 0.3665 < max(ks)


def test_select_argmax_vs_sampled(split):
    _, raw, target = split
    det = dsir.dsir_select(
        raw, target, 10, n_buckets=N_BUCKETS, temperature=None
    ).collect()
    assert len(det) == 10
    # argmax selection: keys are the weights themselves, descending
    keys = [r["select_key"] for r in det]
    assert keys == sorted(keys, reverse=True)
    assert all(r["select_key"] == r["log_weight"] for r in det)
    sam = dsir.dsir_select(
        raw, target, 10, n_buckets=N_BUCKETS, temperature=1.0
    ).collect()
    assert len(sam) == 10
    # the perturbed sample re-runs identically (no RNG state)
    sam2 = dsir.dsir_select(
        raw, target, 10, n_buckets=N_BUCKETS, temperature=1.0
    ).collect()
    assert [r["doc_id"] for r in sam] == [r["doc_id"] for r in sam2]


def test_plan_shape(split):
    _, raw, target = split
    df = dsir.dsir_weights(raw, target, n_buckets=N_BUCKETS)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "Python" not in final
    # the bounded model table broadcasts; the corpus is never shuffled
    # by feature — its only exchange is the doc-keyed aggregation
    assert "BroadcastHashJoin" in final
    k_df = dsir.dsir_select(raw, target, 5, n_buckets=N_BUCKETS)
    k_df.collect()
    k_plan = k_df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in k_plan  # never a global sort for top-k


def test_gumbel_key_matches_duckdb(spark):
    """The md5-derived Gumbel perturbation is cross-engine exact: the
    same 13-hex-digit uniform and -ln(-ln u) in DuckDB reproduces the
    Spark keys (so a selection audit can re-derive the sample in SQL)."""
    import duckdb

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") * 0.01).alias("lw")
    )
    got = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", dsir.gumbel_key(F.col("lw"), F.col("doc_id")).alias("k")
        ).collect()
    }
    hex13 = " + ".join(
        f"(strpos('0123456789abcdef', "
        f"substr(md5(CAST(doc_id AS VARCHAR)), {1 + i}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    want = {
        r[0]: r[1]
        for r in duckdb.connect()
        .execute(
            f"""
SELECT doc_id,
       doc_id * 0.01 - ln(-ln((({hex13}) + 1.0) / {float(16**13 + 2)}))
           AS k
FROM range(500) t(doc_id)
"""
        )
        .fetchall()
    }
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)
