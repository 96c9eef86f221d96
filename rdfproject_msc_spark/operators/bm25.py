"""BM25 lexical retrieval over the documents table.

Lexical top-k is the other half of a production retrieval pipeline next
to the embedding stack (knn_cosine / LSH / IVF consume `embeddings`;
this consumes `documents` directly). Tokenization is `_norm_tokens`,
shared with decontamination / LM scoring / feature hashing, so corpus
statistics agree across operators.

Scoring is the Lucene/Robertson BM25 form (always-positive idf):

    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d)  = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

100 TB design — ZERO shuffles, the knn_cosine pattern applied to text:
a query's terms are a handful of plan literals, so per-document tf is a
row-local `size(filter(tokens, = term))` array expression and dl is
`size(tokens)` — no explode, no (doc, term) posting shuffle, no join.
The plan is two pruned scans of (id, text):
  1. stats pass — one partial-aggregated reduction producing N, Σdl and
     per-query-term document frequencies (a single driver row, bounded
     by |query|, never by data);
  2. scoring pass — idf values folded in as literals, top-k via
     TakeOrderedAndProject (per-partition heaps of k rows, no sort).
An inverted index buys nothing here until queries arrive by the
thousands; at that point the same tf/dl expressions feed a
(term-bucket)-partitioned postings write, the layout-on-Parquet pattern
the LSH/IVF operators already establish.

No reference counterpart (the reference has no text analytics); the
operator extends the engine's curation surface the way SURVEY.md §2's
"beyond the reference" section prescribes.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.lmscore import _norm_tokens


def _query_terms(query: str) -> list[str]:
    """Python twin of `_norm_tokens`, deduplicated, order-stable."""
    toks = re.sub(r"[^a-z0-9]+", " ", query.lower()).split()
    return sorted(set(toks))


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score for `query`.

    Returns (id_col, score) with score rounded to 6 decimals for
    cross-engine reproducibility; ties break on ascending id so the
    LIMIT is deterministic.
    """
    terms = _query_terms(query)
    if not terms:
        raise ValueError("BM25 query has no tokens after normalization")
    # materialize the token array ONCE per row behind a projection
    # boundary: `toks` is referenced 1 + |terms| times below, and
    # CollapseProject keeps a multiply-referenced non-cheap alias as its
    # own projection — inlining _norm_tokens into every tf column would
    # re-run the regexp+split+filter per query term per row.
    tokd = docs.select(
        F.col(id_col), _norm_tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")

    def _tf(qt: str):
        # counted as size(toks) - size(array_remove(toks, qt)): both
        # sides are plain collection expressions that run in whole-stage
        # codegen, where the earlier F.filter(toks, ==) higher-order form
        # was interpreted per element per query term (guide §4.1 —
        # built-ins over HOFs). Identical counts: array_remove drops
        # exactly the elements equal to qt.
        return F.size(toks) - F.size(F.array_remove(toks, qt))

    tf_cols = [_tf(qt).alias(f"tf_{i}") for i, qt in enumerate(terms)]
    per_doc = tokd.select(F.col(id_col), F.size(toks).alias("dl"), *tf_cols)

    # stats pass: one partial-aggregated reduction → a single driver row
    # (bounded by |query| columns, never by data size)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("toks"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n = stats["n"]
    avgdl = (stats["toks"] or 0) / n if n else 0.0
    if not n or not avgdl:
        raise ValueError("BM25 corpus is empty")
    idf = [
        math.log(1.0 + (n - stats[f"df_{i}"] + 0.5) / (stats[f"df_{i}"] + 0.5))
        for i in range(len(terms))
    ]

    # scoring pass: idf folded in as plan literals; the norm denominator
    # shares one common subexpression per row
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = [
        F.lit(idf[i])
        * F.col(f"tf_{i}")
        * F.lit(k1 + 1.0)
        / (F.col(f"tf_{i}") + norm)
        for i in range(len(terms))
    ]
    score = F.round(sum(contrib[1:], contrib[0]), 6).alias("score")
    return (
        per_doc.select(F.col(id_col), score)
        # retrieval semantics: only documents containing ≥1 query term
        # (also what makes the pruned persisted-index probe equivalent)
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _py_bucket(token: str, n_buckets: int) -> int:
    """Driver-side twin of `sampling.hash_bucket(col, n_buckets,
    hex_start=1)` — md5 hex digits 1-6 (1-based), i.e. [0:6)."""
    import hashlib

    return int(hashlib.md5(token.encode()).hexdigest()[0:6], 16) % n_buckets


def bm25_write(
    docs: DataFrame,
    path: str,
    *,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist a BM25 postings index as term-bucket-partitioned Parquet —
    the amortization path when queries arrive by the thousands (the
    zero-shuffle `bm25_topk` re-reads the corpus per query; the index
    reads only the query's bucket directories).

    Layout (same self-contained pattern as `lsh_write` / IVF):
      path/bucket=B/...   postings (token, doc_id, tf, dl, df) — dl and
                          df denormalized so a probe needs NO join
      path/_stats         one row: n docs, avgdl, n_buckets

    Build cost: one explode + one (doc, token)-keyed aggregation, one
    token-keyed AGGREGATE + broadcast-able join for df, one partitioned
    write. df deliberately avoids `Window.partitionBy(token)`: a hot
    token (stopword) would put ALL its postings in one window partition,
    and AQE does not split window skew — the groupBy form map-side
    combines to one row per token per partition before the exchange, so
    a stopword costs the same as any other token. Directory count is
    n_buckets — a parameter, never data volume.

    The layout is WRITE-ONCE by design: denormalizing df/dl/avgdl is what
    makes probes join-free, but it means appending documents would
    silently stale every existing row's df (and the _stats sidecar) —
    rebuild to refresh, unlike the append-able LSH/IVF layouts whose
    per-row fields are append-invariant."""
    from rdfproject_msc_spark.operators.sampling import hash_bucket

    toks = _norm_tokens(F.col(text_col))
    per = docs.select(
        F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("token")
    )
    tf = per.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    postings = tf.join(dfreq, "token").withColumn(
        "bucket", hash_bucket(F.col("token"), n_buckets)
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(path)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.size(toks)) / F.count(F.lit(1))).alias("avgdl"),
        F.lit(n_buckets).alias("n_buckets"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/_stats")


def bm25_topk_persisted(
    spark,
    path: str,
    query: str,
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Probe a `bm25_write` layout: the query terms' buckets are computed
    driver-side (bounded md5 arithmetic, no data touched) and the scan
    prunes to those directories (PartitionFilters); per-term document
    frequencies come back as a ≤|query|-row collect, so idf folds in as
    the SAME Python-computed literals as `bm25_topk`. Scoring pivots the
    matched postings into fixed-order per-term tf columns (one bounded
    conditional aggregation — floating-point addition order identical to
    the in-memory path, so results are equal bit-for-bit, pinned in
    tests). One shuffle, over query-matched postings only."""
    stats = spark.read.parquet(f"{path}/_stats").first()
    n, avgdl, n_buckets = stats["n"], stats["avgdl"], stats["n_buckets"]
    if not n or not avgdl:
        raise ValueError("BM25 index is empty")
    terms = _query_terms(query)
    if not terms:
        raise ValueError("BM25 query has no tokens after normalization")
    buckets = sorted({_py_bucket(t, n_buckets) for t in terms})
    hits = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("token").isin(terms))
    )
    dfs = {
        r["token"]: r["df"]
        for r in hits.select("token", "df").distinct().collect()
    }
    present = [t for t in terms if dfs.get(t)]
    if not present:
        return (
            hits.groupBy(id_col)
            .agg(F.lit(0.0).alias("score"))
            .limit(0)
        )
    idf = {
        t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        for t in present
    }
    pivoted = hits.groupBy(id_col).agg(
        F.max("dl").alias("dl"),
        *[
            F.sum(
                F.when(F.col("token") == F.lit(t), F.col("tf")).otherwise(
                    F.lit(0)
                )
            )
            .cast("int")
            .alias(f"tf_{i}")
            for i, t in enumerate(present)
        ],
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = [
        F.lit(idf[t])
        * F.col(f"tf_{i}")
        * F.lit(k1 + 1.0)
        / (F.col(f"tf_{i}") + norm)
        for i, t in enumerate(present)
    ]
    score = F.round(sum(contrib[1:], contrib[0]), 6).alias("score")
    return (
        pivoted.select(F.col(id_col), score)
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_oracle_sql(query: str, k: int, *, k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin of `bm25_topk` — the exact same tokenization, stats and
    scoring formula in SQL, rounded to the same 6 decimals. One source of
    truth for the pytest oracle AND the driver registry oracle."""
    terms = _query_terms(query)
    tf = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_ = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    contrib = " + ".join(
        f"ln(1 + (s.n - s.df_{i} + 0.5) / (s.df_{i} + 0.5))"
        f" * p.tf_{i} * {k1 + 1.0}"
        f" / (p.tf_{i} + {k1} * (1 - {b} + {b} * p.dl / s.avgdl))"
        for i in range(len(terms))
    )
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text),
             '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '') AS toks
  FROM documents
), per_doc AS (
  SELECT doc_id, len(toks) AS dl, {tf} FROM tok
), stats AS (
  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, {df_}
  FROM per_doc
), scored AS (
  SELECT p.doc_id, ROUND({contrib}, 6) AS score
  FROM per_doc p, stats s
)
SELECT doc_id, score FROM scored WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT {k}
"""
