"""Gopher quality rules (Rae et al. 2021, §A1.1 Table A1): the published
hand-tuned document filter nearly every subsequent LLM data pipeline
(MassiveText, RefinedWeb, Dolma, FineWeb) starts from.

Each rule is an independent per-row predicate; a document passes only if it
passes all of them. The operator emits every rule's boolean (so a pipeline
can audit WHICH rule rejected how much data — the rejection histogram is a
groupBy away) plus the diagnostic ratios the thresholds apply to.

Rules (document-level, defaults = the paper's):
- word count in [min_words, max_words]              (50 .. 100,000)
- mean word length in [min_mean_len, max_mean_len]  (3 .. 10 chars)
- symbol-to-word ratio <= max_symbol_ratio (0.1) — applied to the '#'
  count and the '...' count SEPARATELY, per the paper's "either the hash
  symbol or the ellipsis"; a doc fails when EITHER ratio exceeds the cap
- lines starting with a bullet <= max_bullet_frac   (0.90)
- lines ending with an ellipsis <= max_ellipsis_frac (0.30)
- words containing an alphabetic char >= min_alpha_frac (0.80)
- distinct required stop words present >= min_stopwords (2 of
  the/be/to/of/and/that/have/with)

Repetition rules (the rest of §A1.1) live in
``textstats.with_repetition_stats``; compose both for the full Gopher set.

Everything is built-in column arithmetic — whole-stage-codegen'd, zero
shuffle, no Python — and every expression is chosen for an EXACT DuckDB
twin (counting '#' via length-difference, ellipsis via non-overlapping
replace, mean word length via whitespace-stripped length), so the oracle
in tests/test_gopher.py reproduces each ratio bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
BULLET_RE = "^[-*•]"  # after ltrim: dash, asterisk, or bullet glyph
ELLIPSIS_RE = "(\\.\\.\\.|…)$"  # after rtrim: '...' or the … glyph


def _words(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def _count_char(col: Column, ch: str) -> Column:
    return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))


def _count_substr(col: Column, s: str) -> Column:
    """Non-overlapping occurrence count (replace semantics match DuckDB)."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(s), F.lit("")))
    ) / F.lit(len(s))


def with_gopher_rules(
    df: DataFrame,
    content_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.90,
    max_ellipsis_frac: float = 0.30,
    min_alpha_frac: float = 0.80,
    min_stopwords: int = 2,
) -> DataFrame:
    """Adds diagnostics (n_words, mean_word_len, hash_ratio, ellipsis_sym_ratio,
    bullet_frac, ellipsis_frac, alpha_frac, n_req_stopwords), one boolean per
    rule (rule_*), and ``gopher_pass``. NULL text behaves as empty (fails the
    word-count rule, passes the vacuous line/word-fraction rules)."""
    c = F.coalesce(F.col(content_col), F.lit(""))
    # BIND the word and line arrays (and the lowercased words) as
    # projected columns (r12): `words`/`lines` each fed 3 higher-order
    # functions (3 evaluations of the split per row), and `lower_words`
    # was captured INSIDE the stopword lambda — a HOF evaluates its body
    # per element, so the transform+split re-ran once per required
    # stopword. Attribute captures are cheap; CollapseProject keeps the
    # non-cheap multiply-referenced aliases as their own Projects. Same
    # expressions element for element — values unchanged.
    tmp = df.select(
        "*",
        _words(c).alias("__g_w"),
        F.filter(F.split(c, "\n"), lambda ln: F.trim(ln) != "").alias(
            "__g_l"
        ),
    ).select("*", F.transform(F.col("__g_w"), F.lower).alias("__g_lw"))
    words, lines, lower_words = (
        F.col("__g_w"),
        F.col("__g_l"),
        F.col("__g_lw"),
    )
    n_words = F.size(words).cast("long")
    nw1 = F.greatest(n_words, F.lit(1))
    # total word chars == length with ALL whitespace removed
    word_chars = F.length(F.regexp_replace(c, r"\s", ""))
    mean_len = word_chars.cast("double") / nw1.cast("double")
    hash_ratio = _count_char(c, "#").cast("double") / nw1.cast("double")
    ellipsis_sym_ratio = _count_substr(c, "...").cast("double") / nw1.cast(
        "double"
    )
    n_lines = F.size(lines)
    nl1 = F.greatest(n_lines, F.lit(1))
    bullet = F.size(
        F.filter(lines, lambda ln: F.ltrim(ln).rlike(BULLET_RE))
    )
    ellips = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(ELLIPSIS_RE))
    )
    bullet_frac = bullet.cast("double") / nl1.cast("double")
    ellipsis_frac = ellips.cast("double") / nl1.cast("double")
    alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = alpha.cast("double") / nw1.cast("double")
    n_req = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in REQUIRED_STOPWORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    ).cast("long")

    out = (
        tmp.withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_len, 6))
        .withColumn("hash_ratio", F.round(hash_ratio, 6))
        .withColumn("ellipsis_sym_ratio", F.round(ellipsis_sym_ratio, 6))
        .withColumn("bullet_frac", F.round(bullet_frac, 6))
        .withColumn("ellipsis_frac", F.round(ellipsis_frac, 6))
        .withColumn("alpha_frac", F.round(alpha_frac, 6))
        .withColumn("n_req_stopwords", n_req)
    )
    rules = {
        "rule_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "rule_mean_word_len": (F.col("mean_word_len") >= min_mean_len)
        & (F.col("mean_word_len") <= max_mean_len),
        "rule_symbol_ratio": (F.col("hash_ratio") <= max_symbol_ratio)
        & (F.col("ellipsis_sym_ratio") <= max_symbol_ratio),
        "rule_bullet": F.col("bullet_frac") <= max_bullet_frac,
        "rule_ellipsis": F.col("ellipsis_frac") <= max_ellipsis_frac,
        "rule_alpha": F.col("alpha_frac") >= min_alpha_frac,
        "rule_stopwords": F.col("n_req_stopwords") >= min_stopwords,
    }
    passed = F.lit(True)
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
        passed = passed & F.col(name)
    return out.withColumn("gopher_pass", passed).drop(
        "__g_w", "__g_l", "__g_lw"
    )


def gopher_rejection_histogram(
    df: DataFrame, content_col: str = "text", **thresholds
) -> DataFrame:
    """(rule, n_failed) — how much data each rule alone rejects; the audit
    view a curation run reports. One aggregation, map-side combined."""
    scored = with_gopher_rules(df, content_col, **thresholds)
    rule_cols = [c for c in scored.columns if c.startswith("rule_")]
    aggs = [
        F.sum((~F.col(c)).cast("long")).alias(c) for c in rule_cols
    ] + [F.sum((~F.col("gopher_pass")).cast("long")).alias("gopher_pass")]
    wide = scored.agg(*aggs)
    stack = ", ".join(f"'{c}', {c}" for c in rule_cols + ["gopher_pass"])
    return wide.selectExpr(
        f"stack({len(rule_cols) + 1}, {stack}) AS (rule, n_failed)"
    )
