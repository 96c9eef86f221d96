"""Unigram language-model quality scoring (the CCNet-style LM-filter proxy).

Production corpus pipelines score documents with a small LM and drop the
high-perplexity tail; the distributable proxy is a corpus UNIGRAM model —
token frequencies → per-document mean surprisal (bits/token). Documents
far from the corpus distribution (boilerplate, non-language noise,
wrong-language text) score high and are filtered or down-weighted.

100 TB design:
- Building the vocabulary is ONE token-keyed aggregation (map-side partial
  combine collapses each partition to its distinct tokens first) followed
  by a bounded top-V (TakeOrdered — never a global sort materialization).
- Scoring broadcasts the vocabulary (V is a model parameter, bounded by
  construction) and shuffles the corpus ONCE, keyed by doc id, for the
  per-document average. Tokenization and the log-prob lookup are
  whole-stage-codegen'd column expressions; no Python anywhere.
- OOV tokens get a fixed penalty surprisal rather than a smoothing
  distribution — deterministic, engine-portable, and the standard cheap
  choice for a filtering (not generative) model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_tokens(col: Column) -> Column:
    """Lowercased alphanumeric word tokens (same normalization as the
    decontamination operator, so corpus statistics agree across ops)."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "), " "),
        lambda t: t != "",
    )


def unigram_vocab(
    docs: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 50_000,
) -> DataFrame:
    """Corpus unigram model: the top ``vocab_size`` tokens by frequency,
    with ``surprisal`` = -log2(count / total) bits. The (count DESC, token
    ASC) order makes the vocabulary cut deterministic; ``total`` counts ALL
    token occurrences (not just in-vocab ones), so probabilities are true
    corpus frequencies and the OOV mass is simply unmodeled."""
    tok = docs.select(
        F.explode(_norm_tokens(F.col(text_col))).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(vocab_size)
    return top.crossJoin(F.broadcast(total)).select(
        "token",
        "n",
        (-F.log2(F.col("n").cast("double") / F.col("t").cast("double"))).alias(
            "surprisal"
        ),
    )


def doc_lm_score(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_surprisal: float = 24.0,
) -> DataFrame:
    """Per-document mean unigram surprisal: ``(id_col, n_tokens,
    bits_per_token)``. OOV tokens cost a flat ``oov_surprisal`` bits;
    empty documents score the OOV penalty (nothing in-distribution about
    an empty document)."""
    exploded = docs.select(
        F.col(id_col),
        F.explode_outer(_norm_tokens(F.col(text_col))).alias("token"),
    )
    scored = exploded.join(
        F.broadcast(vocab.select("token", "surprisal")), "token", "left"
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("token").alias("n_tokens"),
        F.sum(
            F.when(
                F.col("token").isNotNull(),
                F.coalesce(
                    F.col("surprisal"), F.lit(float(oov_surprisal))
                ),
            )
        ).alias("__bits"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.col("__bits") / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(float(oov_surprisal)))
        .alias("bits_per_token"),
    )


def lm_score_thresholds(
    scored: DataFrame,
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    score_col: str = "bits_per_token",
    *,
    mode: str = "exact",
    accuracy: int = 10_000,
) -> list[float]:
    """Score quantiles at the given fractions — the bucket boundaries for
    ``perplexity_partition``; a driver-side scalar list, model-sized like
    the Bloom/DSIR fits.

    ``mode="exact"`` (default): Spark's exact ``percentile`` aggregate —
    one pass, but its state holds the distinct values, which at EXTREME
    scale (billions of distinct doubles) is the memory hazard.
    ``mode="approx"``: ``percentile_approx`` with an explicit
    ``accuracy`` — bounded state (O(accuracy)), guaranteed rank error
    ≤ 1/accuracy of the population (pinned by test); the estimator choice
    stays recorded in the corpus snapshot alongside the thresholds."""
    return _quantiles(scored, score_col, list(fractions), mode, accuracy)


def _quantiles(
    df: DataFrame,
    col: str,
    fractions: list[float],
    mode: str,
    accuracy: int,
) -> list[float]:
    """Shared exact/approx quantile dispatch (also used by
    sources/export.py curriculum boundaries)."""
    if mode == "exact":
        agg = [
            F.percentile(F.col(col), F.lit(f)).alias(f"q{i}")
            for i, f in enumerate(fractions)
        ]
    elif mode == "approx":
        agg = [
            F.percentile_approx(
                F.col(col), F.lit(f), F.lit(int(accuracy))
            ).alias(f"q{i}")
            for i, f in enumerate(fractions)
        ]
    else:
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    row = df.agg(*agg).head()
    return [float(row[f"q{i}"]) for i in range(len(fractions))]


def perplexity_partition(
    scored: DataFrame,
    thresholds: list[float],
    score_col: str = "bits_per_token",
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split the
    corpus into head / middle / tail by LM score — head (lowest
    perplexity, most in-distribution) trains as-is, middle is kept,
    tail is dropped or heavily downsampled in the CCNet recipe.

    Takes EXPLICIT thresholds (len(labels) - 1, ascending) so the bucket
    assignment is a pure per-row codegen expression — deterministic,
    oracle-exact, and free of the cross-engine quantile-interpolation
    ambiguity (compute thresholds once via ``lm_score_thresholds``,
    record them with the corpus snapshot, reuse them for every shard:
    CCNet's buckets are defined per LANGUAGE MODEL, not per shard).
    Boundary convention: score <= thresholds[i] → labels[i]."""
    if len(thresholds) != len(labels) - 1:
        raise ValueError(
            f"need {len(labels) - 1} thresholds for {len(labels)} labels, "
            f"got {len(thresholds)}"
        )
    if sorted(thresholds) != list(thresholds):
        raise ValueError(f"thresholds must ascend, got {thresholds}")
    expr = None
    for t, lab in zip(thresholds, labels):
        cond = F.col(score_col) <= F.lit(float(t))
        expr = (
            F.when(cond, F.lit(lab))
            if expr is None
            else expr.when(cond, F.lit(lab))
        )
    expr = expr.otherwise(F.lit(labels[-1]))
    return scored.withColumn("ppl_bucket", expr)
