"""Streaming document curation: the stateless text-pipeline stages running
incrementally over a document stream.

The batch curation pipeline's per-row stages — normalization, PII
redaction, quality scoring, token counting — are pure projections, so
Structured Streaming runs the SAME column expressions per micro-batch with
append-mode output and zero state. That is the operational claim a
training-data pipeline needs: the cleanup that runs nightly in batch also
runs continuously over arriving shards, byte-identical (pinned by the
stream-equals-batch test). Stateful stages (near-dup against history) need
watermarked state and live in streaming/events.py (dedup) — corpus-wide
MinHash against all history is a batch join against the persisted index by
design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdfproject_msc_spark.operators.textclean import with_clean_text
from rdfproject_msc_spark.operators.textstats import (
    with_text_stats,
    with_token_counts,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stage_documents_dir(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Stage the batch documents table as a parquet directory — the shape a
    streaming file source consumes (cf. events.stage_events_dir)."""
    from rdfproject_msc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return out_dir


def read_documents_stream(
    spark: SparkSession,
    docs_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(docs_dir)


def curate_documents(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """Stateless curation: clean + redact, score, count tokens, keep docs at
    or above the quality bar. Works identically on a batch DataFrame and a
    streaming one (pure projections + filter — append mode, no state)."""
    out = with_token_counts(with_text_stats(with_clean_text(docs)))
    return out.filter(F.col("quality_score") >= min_quality).select(
        "doc_id",
        "lang",
        "text_clean",
        "n_redactions",
        "quality_score",
        "n_bpe_tokens",
    )
