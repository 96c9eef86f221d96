"""DSIR — Data Selection with Importance Resampling (Xie et al., NeurIPS
2023): score every raw-corpus document by how much it looks like a small
TARGET corpus, using hashed n-gram bag-of-words language models, then keep
the top of the importance-weight distribution.

The method: features are word unigrams + bigrams hashed into ``n_buckets``
buckets; two bag-of-buckets unigram LMs are fit — p (target) and q (raw) —
with add-``smoothing`` Laplace smoothing; a document's log importance
weight is ``sum over feature occurrences of log p[b] - log q[b]``. DSIR
then resamples without replacement with Gumbel-top-k noise so selection is
a sample from the importance distribution rather than a deterministic
argmax (which would pick near-identical documents).

Everything here is deterministic and cross-engine reproducible:
- hashing is md5 nibble arithmetic (operators/sampling.hash_bucket), which
  evaluates identically in Spark and DuckDB — the oracle twin is exact;
- the Gumbel draw uses md5 digits of the document id as the uniform, not
  an RNG, so re-runs (and the DuckDB oracle) reproduce the sample exactly
  while documents with equal weights still interleave fairly.

100 TB design:
- Fitting the two LMs is two explode + bucket-keyed aggregations onto at
  most ``n_buckets`` keys — map-side combine collapses almost everything,
  and the result is a BOUNDED table (n_buckets rows) independent of corpus
  size, exactly like the Bloom build (operators/bloom.py).
- Scoring broadcasts that bounded log-ratio table and joins it to the
  exploded raw-corpus features — one broadcast hash join, then ONE
  doc-keyed aggregation shuffle. The corpus is never shuffled by feature.
- Selection is the skew-robust exact top-k of operators/topn.py territory:
  a global (key DESC) bound via TakeOrderedAndProject when k is small, no
  single-partition window.

Reference scope note: the reference engine (nkoutroumanis/RdfProject-Msc)
has no data-selection surface; this operator belongs to the
training-data-pipeline extension alongside quality scoring
(operators/classify.py) and budgeted selection (operators/selection.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.decontam import word_ngrams
from rdfproject_msc_spark.operators.sampling import hash_bucket


def _features(col: Column) -> Column:
    """Word unigrams + bigrams as one occurrence array (counts matter —
    DSIR's LMs are bags, so no array_distinct)."""
    return F.concat(
        word_ngrams(col, 1, distinct=False),
        word_ngrams(col, 2, distinct=False),
    )


def _grams_of(tk: Column, n: int) -> Column:
    """word_ngrams' gram construction (distinct=False) over an ALREADY
    tokenized array — expression-identical to word_ngrams(col, n) after
    its normalization step."""
    g = F.transform(
        F.sequence(F.lit(1), F.size(tk) - (n - 1)),
        lambda i: F.array_join(F.slice(tk, i, n), " "),
    )
    return F.when(F.size(tk) >= n, g).otherwise(
        F.array().cast("array<string>")
    )


def _feats_exploded(
    df: DataFrame, text_col: str, id_cols: list[str], outer: bool
) -> DataFrame:
    """(*id_cols, feat): the unigram+bigram occurrence explode with the
    normalization/tokenization evaluated ONCE per row (r12): building
    ``_features`` inline ran word_ngrams' regexp+split+filter twice per
    document (once per n); aliasing the token array in its own projection
    (CollapseProject keeps a non-cheap, multiply-referenced alias — the
    bm25/textstats mechanism) measured 2.5× on the explode stage at
    sf0.1. Same rows, same multiplicities (pinned by a groupBy-count
    equality check and the oracle twins)."""
    c = F.col(text_col)
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "), " "),
        lambda t: t != "",
    )
    tmp = df.select(*id_cols, toks.alias("__dsir_tk"))
    tk = F.col("__dsir_tk")
    feats = F.concat(_grams_of(tk, 1), _grams_of(tk, 2))
    exploder = F.explode_outer if outer else F.explode
    return tmp.select(*id_cols, exploder(feats).alias("feat"))


def _bucket_counts(
    docs: DataFrame, text_col: str, n_buckets: int
) -> DataFrame:
    """(bucket, cnt) occurrence counts of hashed features — at most
    ``n_buckets`` output rows regardless of corpus size."""
    feats = _feats_exploded(docs, text_col, [], outer=False)
    return (
        feats.select(hash_bucket(F.col("feat"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = 10_000,
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """The bounded model table: (bucket, log_ratio) for every one of the
    ``n_buckets`` buckets, where log_ratio = log p_target[b] - log q_raw[b]
    under add-``smoothing`` Laplace estimates. Buckets unseen in both
    corpora get ratio 0 by construction (same smoothed mass on both
    sides cancels only if totals match — they usually don't, so every
    bucket is materialized explicitly and the constant normalizers are
    part of the value)."""
    p = _bucket_counts(target, text_col, n_buckets).withColumnRenamed(
        "cnt", "p_cnt"
    )
    q = _bucket_counts(raw, text_col, n_buckets).withColumnRenamed(
        "cnt", "q_cnt"
    )
    all_buckets = raw.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    s = float(smoothing)
    joined = (
        all_buckets.join(p, "bucket", "left")
        .join(q, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("p_cnt"), F.lit(0)).alias("p_cnt"),
            F.coalesce(F.col("q_cnt"), F.lit(0)).alias("q_cnt"),
        )
    )
    # normalizers are scalars; computing them via a window would collapse
    # to one partition — but the table is bounded (n_buckets rows), so a
    # driver-side agg over the BOUNDED table is the honest cheap path
    totals = joined.agg(
        F.sum("p_cnt").alias("pt"), F.sum("q_cnt").alias("qt")
    ).first()
    p_denom = float(totals["pt"] or 0) + s * n_buckets
    q_denom = float(totals["qt"] or 0) + s * n_buckets
    return joined.select(
        "bucket",
        (
            F.log((F.col("p_cnt") + F.lit(s)) / F.lit(p_denom))
            - F.log((F.col("q_cnt") + F.lit(s)) / F.lit(q_denom))
        ).alias("log_ratio"),
    )


def dsir_fit(
    raw: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = 10_000,
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Fit the model ONCE and return the bounded (bucket, log_ratio)
    table as a LOCAL relation (``n_buckets`` rows collected to the
    driver, exactly like the Bloom filter's bit array, the k-means
    centroid table and the classifier's weight vector — bounded by a
    parameter, never by data).

    ``dsir_log_ratios`` alone stays lazy, so every action over a plan
    built on it re-runs BOTH corpus-wide bucket-count fits; scoring many
    batches (or benchmarking the scorer) against the same model should
    fit once and reuse. The collected doubles round-trip exactly, so
    scores are bit-identical to the lazy-fit plan."""
    lr = dsir_log_ratios(
        raw, target, n_buckets=n_buckets, text_col=text_col,
        smoothing=smoothing,
    )
    return raw.sparkSession.createDataFrame(lr.collect(), lr.schema)


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
    log_ratios: DataFrame | None = None,
) -> DataFrame:
    """(id_col, n_feats, log_weight): hashed n-gram importance weight of
    every raw document. Documents with no features score 0 (the neutral
    weight) and keep their row. Pass a precomputed ``log_ratios`` table to
    reuse one fit across many scoring runs (the streaming/incremental
    path — the model is bounded state, like a Bloom filter)."""
    if log_ratios is None:
        log_ratios = dsir_log_ratios(
            raw,
            target,
            n_buckets=n_buckets,
            text_col=text_col,
            smoothing=smoothing,
        )
    feats = _feats_exploded(raw, text_col, [id_col], outer=True).select(
        id_col,
        F.when(
            F.col("feat").isNotNull(),
            hash_bucket(F.col("feat"), n_buckets),
        ).alias("bucket"),
    )
    scored = feats.join(F.broadcast(log_ratios), "bucket", "left")
    return scored.groupBy(id_col).agg(
        F.count("bucket").alias("n_feats"),
        F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias("log_weight"),
    )


def gumbel_key(log_weight: Column, id_col: Column) -> Column:
    """Deterministic Gumbel-top-k perturbation: g = -ln(-ln(u)) with u
    derived from md5 digits 1-13 of the id (52 bits → exact double in
    (0,1); +1 in the numerator keeps u > 0 so the log is finite). Sampling
    k docs by max(log_weight + g) IS sampling without replacement from
    softmax(log_weight) — the Gumbel-max trick — but reproducibly."""
    h = F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 13), 16, 10
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(16**13 + 2))
    return log_weight - F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    *,
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
    temperature: float | None = 1.0,
) -> DataFrame:
    """The top-``k`` raw documents by Gumbel-perturbed importance weight
    (``temperature=None`` disables the noise → deterministic argmax; the
    paper's default is the perturbed sample, which avoids selecting k
    near-copies of the single most target-like document). Output is
    (id_col, n_feats, log_weight, select_key) sorted by key descending —
    a TakeOrderedAndProject plan for small k, never a global sort."""
    w = dsir_weights(
        raw,
        target,
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
        smoothing=smoothing,
    )
    if temperature is None:
        key = F.col("log_weight") + F.lit(0.0)
    else:
        key = gumbel_key(
            F.col("log_weight") / F.lit(float(temperature)), F.col(id_col)
        )
    return (
        w.withColumn("select_key", key)
        .orderBy(F.col("select_key").desc(), F.col(id_col))
        .limit(k)
    )
