"""Text analysis: token counting, quality scoring, language ID, fingerprints.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Each metric has an exact ANSI-SQL
twin for the DuckDB oracle (see registry.py), so definitions below must stay
deterministic and engine-agnostic (explicit char classes, no locale deps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny embedded stopword lists per language — a deterministic n-gram-free
# heuristic for language ID; the real pipeline would plug fastText here.
STOPWORDS = {
    "en": ("the", "a", "of", "to", "and", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "es"),
    "fr": ("le", "la", "de", "et", "un", "en", "est"),
    "de": ("der", "die", "das", "und", "in", "ist", "zu"),
    "zh": ("的", "是", "了", "在", "和", "有", "我"),
}

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"


def _tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count ('' → 0). Long-typed to match the oracle's
    BIGINT ``len()``."""
    return (
        F.when(F.trim(col) == "", F.lit(0))
        .otherwise(F.size(_tokens(col)))
        .cast("long")
    )


# BPE-ish pre-tokenizer regex (GPT-2-style, restricted to an engine-portable
# subset: contraction suffixes, space-prefixed letter runs / digit runs /
# punctuation runs). Token COUNT under this split approximates subword token
# counts well enough for corpus budgeting, entirely JVM-side.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count_bpe(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (see BPE_ISH_PATTERN); the oracle twin is
    DuckDB ``len(regexp_extract_all(...))`` with the same pattern."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)).cast(
        "long"
    )


def with_token_counts(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Token-budget columns: whitespace tokens, BPE-ish tokens, bytes per
    BPE-ish token (the corpus-sizing metric training pipelines budget by).

    The BPE count is aliased in its OWN projection (r12): two derived
    columns reference it, and expressions built per-column duplicate the
    regexp_extract_all per reference — CollapseProject keeps a non-cheap
    alias referenced more than once as a separate Project, so the regexp
    runs once per row (the bm25 tokenize-once mechanism)."""
    c = F.col(content_col)
    tmp = df.select("*", token_count_bpe(c).alias("__tc_nb"))
    nb = F.col("__tc_nb")
    return tmp.select(
        *df.columns,
        token_count(c).alias("n_ws_tokens"),
        nb.alias("n_bpe_tokens"),
        F.round(
            F.octet_length(c) / F.greatest(nb, F.lit(1)).cast("double"), 6
        ).alias("bytes_per_token"),
    )


def stopword_hits(col: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(_tokens(col), lambda t: t.isin(*words))).cast("long")


def with_text_stats(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Quality-scoring columns: lengths, token stats, punctuation & stopword
    ratios, and a composite quality score in [0, 1].

    The four base measures (char count, token count, punct count, stopword
    hits) are aliased in their OWN projection (r12): the derived ratios and
    the quality score reference each of them 2-4 times, and building the
    expression tree per derived column duplicated the split/regexp work per
    reference — measured 1.33× on the full-stats projection at sf0.1.
    CollapseProject keeps a non-cheap alias referenced more than once as a
    separate Project, so each base measure is evaluated once per row; the
    values (and so every oracle twin) are unchanged."""
    c = F.col(content_col)
    n_chars = F.length(c).cast("long")
    tmp = df.select(
        "*",
        n_chars.alias("__ts_nc"),
        token_count(c).alias("__ts_nt"),
        (n_chars - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))).alias(
            "__ts_pu"
        ),
        stopword_hits(c, "en").alias("__ts_sw"),
    )
    nc, nt = F.col("__ts_nc"), F.col("__ts_nt")
    punct, sw = F.col("__ts_pu"), F.col("__ts_sw")
    return tmp.select(
        *df.columns,
        nc.alias("n_chars_m"),
        nt.alias("n_tokens"),
        F.round((nc - (nt - 1)) / F.greatest(nt, F.lit(1)), 6).alias(
            "avg_token_len"
        ),
        F.round(punct / F.greatest(nc, F.lit(1)), 6).alias("punct_ratio"),
        F.round(sw / F.greatest(nt, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            F.least(nt / F.lit(50.0), F.lit(1.0)) * 0.5
            + F.least(sw / F.greatest(nt, F.lit(1)) * 5.0, F.lit(1.0)) * 0.3
            + (1 - F.least(punct / F.greatest(nc, F.lit(1)) * 10.0, F.lit(1.0)))
            * 0.2,
            6,
        ).alias("quality_score"),
    )


def language_id(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Predict language = argmax of per-language stopword hits; ties go to
    the alphabetically-first language code; zero hits → 'und'.

    Tie-break is encoded in the sort key (hits asc, -index asc → take last),
    so the DuckDB twin (max-hits + min(lang)) matches exactly.
    """
    c = F.col(content_col)
    langs = sorted(STOPWORDS)
    entries = [
        F.struct(
            stopword_hits(c, lang).alias("hits"), F.lit(-i).alias("nidx")
        )
        for i, lang in enumerate(langs)
    ]
    arr = F.array_sort(F.array(*entries))
    best = F.element_at(arr, F.size(arr))  # max hits; tie → smallest index
    lang = F.element_at(F.array(*[F.lit(x) for x in langs]), -best["nidx"] + 1)
    return df.withColumn(
        "lang_pred", F.when(best["hits"] > 0, lang).otherwise(F.lit("und"))
    )


# character n-gram profiles per language (boundary spaces included — the
# padded text ' '||lower(text)||' ' makes word-initial/final grams match).
# The classic Cavnar–Trenkle-style profile, shrunk to a deterministic
# embedded set; the real pipeline would learn profiles from a corpus.
CHAR_NGRAMS = {
    "en": (" th", "the", " an", "nd ", " of", "is ", "ing", " to"),
    "es": (" el", "que", " de", "os ", " la", "ión", " es", "ent"),
    "fr": (" le", "les", " et", "est", " un", "eur", "ait", " la"),
    "de": ("der", "ein", "und", "sch", "ich", "cht", " ge", "die"),
    "zh": ("的", "是", "了", "在", "和", "有", "我"),
}


def ngram_hits(col: Column, lang: str) -> Column:
    """Total occurrences of the language's profile n-grams in the padded,
    lowercased text — the replace-trick count
    (len(s) - len(replace(s, g))) / len(g) per gram, summed; every term is
    a built-in string function, so the whole score stays inside
    whole-stage codegen. Occurrences may overlap grams but each count is
    exact per gram (non-overlapping occurrences of that gram), matching
    the DuckDB twin's replace() semantics exactly."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    counts = [
        ((F.length(padded) - F.length(F.replace(padded, F.lit(g)))) / F.lit(len(g)))
        for g in CHAR_NGRAMS[lang]
    ]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return total.cast("long")


def language_id_ngram(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Char-n-gram language ID (the n-gram heuristic the north-star brief
    names): predict language = argmax of profile-gram occurrence counts;
    ties go to the alphabetically-first language code; zero hits → 'und'.
    Same argmax/tie-break encoding as ``language_id`` (sort key: hits asc,
    -index asc → take last), so the DuckDB twin (max-hits + min(lang))
    matches exactly."""
    c = F.col(content_col)
    langs = sorted(CHAR_NGRAMS)
    entries = [
        F.struct(ngram_hits(c, lang).alias("hits"), F.lit(-i).alias("nidx"))
        for i, lang in enumerate(langs)
    ]
    arr = F.array_sort(F.array(*entries))
    best = F.element_at(arr, F.size(arr))
    lang = F.element_at(F.array(*[F.lit(x) for x in langs]), -best["nidx"] + 1)
    return df.withColumn(
        "lang_pred_ngram", F.when(best["hits"] > 0, lang).otherwise(F.lit("und"))
    )


def fingerprint(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Deterministic 64-bit content fingerprint (xxhash64) plus a rolling
    polynomial hash over whitespace tokens (order-sensitive, mod 2^31-1) —
    the classic Rabin-style document fingerprint, all JVM-side.

    The rolling hash folds (ascii(first char) + token length) per token — a
    deliberately engine-portable value so the DuckDB oracle can replicate it
    exactly (fp_xxhash is Spark-specific and excluded from oracle queries).
    """
    c = F.col(content_col)
    rolling = F.aggregate(
        _tokens(c),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.ascii(t) + F.length(t)) % F.lit(2147483647),
    )
    return df.withColumn("fp_xxhash", F.xxhash64(c)).withColumn(
        "fp_rolling", rolling
    )


def max_run_length(arr: Column) -> Column:
    """Length of the longest run of equal values after sorting = the count
    of the most frequent element — computed per row with the aggregate
    higher-order function (JVM-side, zero shuffle; the distributed-plan
    alternative, explode + two keyed aggregations, shuffles the whole
    n-gram relation twice for a per-document statistic)."""
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc.getField("best"),
                F.when(x == acc.getField("prev"), acc.getField("run") + 1)
                .otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.getField("best"),
    )


def with_repetition_stats(
    df: DataFrame,
    content_col: str = "text",
    *,
    top_bigram_threshold: float = 0.18,
    dup_trigram_threshold: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, adapted to
    token counts): ``top_bigram_frac`` — the share of all word 2-grams taken
    by the single most frequent one — and ``dup_trigram_frac`` — the share
    of word 3-gram occurrences that are repeats — plus the ``repetitive``
    flag at the (tunable) Gopher-like thresholds. Degenerate documents
    (under 2/3 tokens) score 0.0 — too short to be repetitive.

    Everything is per-row array arithmetic over built-in functions: no
    Python, no shuffle, scales embarrassingly."""
    from rdfproject_msc_spark.operators.decontam import word_ngrams

    c = F.col(content_col)
    # BIND the two gram arrays as projected columns (r12): each was
    # referenced ~4× in its ratio expression, re-running the whole
    # word_ngrams construction per reference (the textstats/gopher
    # mechanism — CollapseProject keeps a non-cheap alias referenced
    # more than once). Values unchanged.
    tmp = df.select(
        "*",
        word_ngrams(c, 2, distinct=False).alias("__r_g2"),
        word_ngrams(c, 3, distinct=False).alias("__r_g3"),
    )
    g2, g3 = F.col("__r_g2"), F.col("__r_g3")
    top2 = max_run_length(g2).cast("double") / F.greatest(
        F.size(g2), F.lit(1)
    ).cast("double")
    top2 = F.when(F.size(g2) > 0, top2).otherwise(F.lit(0.0))
    dup3 = F.lit(1.0) - F.size(F.array_distinct(g3)).cast(
        "double"
    ) / F.greatest(F.size(g3), F.lit(1)).cast("double")
    dup3 = F.when(F.size(g3) > 0, dup3).otherwise(F.lit(0.0))
    return (
        tmp.withColumn("top_bigram_frac", top2)
        .withColumn("dup_trigram_frac", dup3)
        .withColumn(
            "repetitive",
            (F.col("top_bigram_frac") > F.lit(float(top_bigram_threshold)))
            | (F.col("dup_trigram_frac") > F.lit(float(dup_trigram_threshold))),
        )
        .drop("__r_g2", "__r_g3")
    )
