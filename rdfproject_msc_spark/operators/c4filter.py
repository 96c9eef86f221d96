"""C4-style line-level cleaning (Raffel et al. 2020, §2.2 — the filters
that produced the Colossal Clean Crawled Corpus): unlike the Gopher rules
(operators/gopher.py), which judge whole documents, C4 edits documents —
boilerplate LINES are dropped and the survivors are rejoined — then rejects
documents that end up too small or contain blocklisted content.

Line rules (a line survives if ALL hold, thresholds = the paper's):
- ends in terminal punctuation (. ! ? ")            [keep]
- has at least ``min_line_words`` words (5)          [keep]
- does not contain a cookies/javascript notice       [drop]
Document rules after line cleaning:
- at least ``min_sentences`` surviving lines (3)
- no curly brace '{' (code), no "lorem ipsum"

The operator returns the cleaned text plus audit columns (lines kept /
dropped, which document rule fired), because at 100 TB "the filter ate 40%
of my corpus" must be answerable from the output, not by re-running.

Everything is per-row array arithmetic over built-in functions — split by
newline, filter with codegen'd lambdas, array_join — zero shuffle, no
Python, exact DuckDB twin in tests/test_c4filter.py. De-duplication of
three-sentence spans (the paper's other step) is operators/passages.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_PUNCT_RE = r'[.!?"]$'
# the paper drops lines with the word "javascript" and pages with the
# cookie/policy boilerplate phrases
LINE_BLOCK_RE = "(?i)(javascript|cookie policy|terms of use|privacy policy)"
DOC_BLOCK_RE = "(?i)lorem ipsum"


def _clean_lines(col: Column, min_line_words: int) -> Column:
    lines = F.split(col, "\n")
    trimmed = F.transform(lines, F.trim)
    return F.filter(
        trimmed,
        lambda ln: ln.rlike(TERMINAL_PUNCT_RE)
        & (
            F.size(F.filter(F.split(ln, r"\s+"), lambda w: w != ""))
            >= F.lit(min_line_words)
        )
        & ~ln.rlike(LINE_BLOCK_RE),
    )


def c4_clean(
    df: DataFrame,
    content_col: str = "text",
    *,
    min_line_words: int = 5,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """Adds ``text_c4`` (surviving lines rejoined with newlines),
    ``n_lines`` / ``n_lines_kept``, and ``c4_keep`` — False when too few
    lines survive or a document-level blocklist rule fires. NULL text
    behaves as empty (0 lines, rejected).

    ``blocklist``: the paper's remaining document rule — pages containing
    any phrase from a bad-words list are rejected whole. Matching is
    case-insensitive on WORD BOUNDARIES (the published list's convention;
    plain substring would reject e.g. 'assess'). The list is query-sized
    configuration compiled into one regex alternation — plan-literal,
    zero shuffle, like the Bloom probe's constants."""
    c = F.coalesce(F.col(content_col), F.lit(""))
    # BIND the kept-lines array as a projected column (r12): it was
    # referenced 3× (the keep rule, the count, the rebuilt text),
    # re-running the per-line regex pipeline per reference
    # (CollapseProject keeps a non-cheap multiply-referenced alias).
    # Values unchanged.
    tmp = df.select(
        "*", _clean_lines(c, min_line_words).alias("__c4_kept")
    )
    kept = F.col("__c4_kept")
    all_lines = F.filter(
        F.transform(F.split(c, "\n"), F.trim), lambda ln: ln != ""
    )
    doc_ok = (
        (F.size(kept) >= F.lit(min_sentences))
        & ~c.contains("{")
        & ~c.rlike(DOC_BLOCK_RE)
    )
    if blocklist:
        import re as _re

        alternation = "|".join(_re.escape(w) for w in sorted(blocklist))
        doc_ok = doc_ok & ~c.rlike(rf"(?i)\b({alternation})\b")
    return (
        tmp.withColumn("n_lines", F.size(all_lines).cast("long"))
        .withColumn("n_lines_kept", F.size(kept).cast("long"))
        .withColumn("text_c4", F.array_join(kept, "\n"))
        .withColumn("c4_keep", doc_ok)
        .drop("__c4_kept")
    )
