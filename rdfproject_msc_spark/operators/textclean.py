"""Text cleanup for training corpora: normalization and PII redaction.

Both are pure per-row ``regexp_replace`` chains — JVM-side, whole-stage
codegen, zero shuffle — so they compose into any scan for free and cost
one pass at 100 TB. Patterns are restricted to syntax RE2 (DuckDB) and
Java regex (Spark) evaluate identically, so each column has an exact SQL
oracle twin (pytest-pinned; the 50-slot driver window is full, SURVEY §8).

Redaction here is the deterministic regex tier (emails, phone-ish runs,
IPv4) that every corpus pipeline runs before the ML-based PII pass; the
ML pass is a model dependency, out of scope for this engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# normalization: control chars out, whitespace runs collapsed, trimmed
CONTROL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# phone-ish: optional +, ≥9 total digits allowing separators (up to 24
# chars of digit/separator run) — anchored on digits at both ends so prose
# numbers like "version 2" never match
PHONE_PATTERN = r"\+?[0-9][0-9 ().-]{7,24}[0-9]"
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def normalize_text(col: Column, lowercase: bool = True) -> Column:
    """Strip control characters, collapse whitespace runs to one space,
    trim; optionally lowercase. Deterministic and locale-free."""
    out = F.regexp_replace(col, CONTROL_CLASS, " ")
    out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return F.lower(out) if lowercase else out


def redact_pii(col: Column) -> Column:
    """Replace emails, phone-like digit runs, and IPv4 addresses with typed
    placeholder tokens. Email first: an address must not be half-eaten by
    the phone pattern."""
    out = F.regexp_replace(col, EMAIL_PATTERN, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_PATTERN, "<IP>")
    return F.regexp_replace(out, PHONE_PATTERN, "<PHONE>")


def with_clean_text(
    df: DataFrame, content_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Add ``text_clean`` (normalized + redacted) and ``n_redactions``
    (how many placeholder tokens the redaction inserted — the corpus-level
    PII-rate metric a pipeline monitors)."""
    cleaned = redact_pii(normalize_text(F.col(content_col), lowercase))
    # n_redactions reads the PROJECTED text_clean column (r12): building
    # it from the `cleaned` expression re-ran the 5-regexp chain per row
    # a second time (CollapseProject keeps the non-cheap alias once it is
    # referenced twice). Values unchanged.
    out = df.withColumn("text_clean", cleaned)
    n_red = (
        F.size(F.split(F.col("text_clean"), r"<EMAIL>|<PHONE>|<IP>", -1)) - 1
    ).cast("long")
    return out.withColumn("n_redactions", n_red)


def dedup_paragraphs(col: Column, sep: str = "\n") -> Column:
    """Drop REPEATED paragraphs within one document, keeping each distinct
    paragraph's FIRST occurrence in order — the within-page boilerplate
    cleanup (navigation blocks, repeated footers) corpus pipelines run
    before corpus-level dedup ever sees the text.

    Pure per-row array algebra: for each position i, keep paragraph i iff
    its first index in the array is i (array_position is 1-based). O(k²)
    comparisons per row on the document's OWN paragraph list (k = its
    paragraph count) — row-local, zero shuffle, no Python."""
    # LET-BIND the paragraph array via a single-element transform (r12):
    # the keep lambda's ``array_position(paras, p)`` captured the split
    # expression, and a higher-order function evaluates its body per
    # element — the text was re-split once per paragraph. Binding keeps
    # the documented O(k²) position scans but splits once per row.
    paras = F.split(col, sep)

    def _keep(ps: Column) -> Column:
        kept = F.filter(
            ps, lambda p, i: F.array_position(ps, p) == i + F.lit(1)
        )
        return F.array_join(kept, sep)

    return F.element_at(F.transform(F.array(paras), _keep), 1)


def with_paragraph_dedup(
    df: DataFrame, content_col: str = "text", sep: str = "\n"
) -> DataFrame:
    """Add ``text_paradedup`` plus ``n_paragraphs`` / ``n_paragraphs_kept``
    audit counts (NULL text behaves as empty)."""
    c = F.coalesce(F.col(content_col), F.lit(""))
    paras = F.split(c, sep)
    deduped = dedup_paragraphs(c, sep)
    return (
        df.withColumn("n_paragraphs", F.size(paras).cast("long"))
        .withColumn(
            "n_paragraphs_kept",
            F.size(F.split(deduped, sep)).cast("long"),
        )
        .withColumn("text_paradedup", deduped)
    )
