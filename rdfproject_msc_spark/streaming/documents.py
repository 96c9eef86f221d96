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

import os

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


def write_batch_idempotent(df: DataFrame, out_dir: str, batch_id: int) -> None:
    """Exactly-once micro-batch sink for ``foreachBatch``: each batch lands
    in its own ``batch_id=<n>`` partition directory with OVERWRITE mode, so
    a micro-batch that replays after a crash (foreachBatch is at-least-once
    — the write can land before the checkpoint commits) overwrites its own
    partition instead of appending a duplicate copy. Readers see a plain
    parquet dataset with a ``batch_id`` partition column (drop it if the
    provenance is unwanted)."""
    df.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch_id={int(batch_id)}")
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


def decontaminate_stream(
    docs: DataFrame,
    bench: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    n: int = 5,
    threshold: float = 0.5,
    bloom_fpp: float | None = 0.01,
):
    """Streaming benchmark decontamination: flag arriving documents whose
    word n-grams overlap a STATIC benchmark set (operators/decontam.py),
    exactly and incrementally.

    Why ``foreachBatch`` and not a streaming aggregation: contamination is
    a PER-DOCUMENT property against a static reference — each document
    arrives in exactly one micro-batch and its verdict never depends on
    other batches, so running the batch operator on each micro-batch is
    exact with ZERO cross-batch state (no watermark, no state store).
    A streaming groupBy(doc_id) would hold unbounded per-doc state for
    semantics that need none.

    The Bloom pre-filter (operators/bloom.py) builds ONCE from the
    benchmark up front — a bounded job — and its literal-array probe is
    embedded in every micro-batch plan, so steady-state per-batch cost is
    one scan of the NEW documents, a filtered explode over bloom
    survivors, and one broadcast join against the benchmark n-grams.
    Exactly-once: each micro-batch overwrites its own ``batch_id=<n>``
    partition (``write_batch_idempotent``), so checkpoint-replayed batches
    are idempotent rather than appended twice. ``availableNow`` drains the
    staged input (production: a processing-time trigger). Returns the
    finished StreamingQuery (recentProgress carries per-batch row
    counts for observability)."""
    from rdfproject_msc_spark.operators import bloom as bloom_mod
    from rdfproject_msc_spark.operators import decontam

    bf = None
    if bloom_fpp is not None:
        bench_ng = bench.select(
            F.explode(decontam.word_ngrams(F.col("text"), n)).alias("ng")
        ).distinct()
        bits, hashes = bloom_mod.optimal_geometry(
            bench_ng.count(), bloom_fpp
        )
        bf = bloom_mod.bloom_build(
            bench_ng, "ng", num_bits=bits, num_hashes=hashes
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        report = decontam.ngram_contamination(
            batch_df,
            bench,
            n=n,
            threshold=threshold,
            bloom_filter=bf,
        )
        write_batch_idempotent(report, out_dir, batch_id)

    q = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


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


def dsir_score_stream(
    docs: DataFrame,
    raw_sample: DataFrame,
    target: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    n_buckets: int = 10_000,
    smoothing: float = 1.0,
):
    """Streaming DSIR scoring: importance-weight arriving documents
    against a model fit ONCE from a static (raw_sample, target) pair
    (operators/dsir.py).

    The importance weight is a per-document property of a FIXED model, so
    — like decontamination above — ``foreachBatch`` runs the batch scorer
    per micro-batch with zero cross-batch state. The fitted model is
    bounded by construction (n_buckets rows), so it is materialized to a
    LOCAL relation up front: every micro-batch plan embeds the same
    (bucket, log_ratio) table without re-running the fit aggregations,
    the same once-built-many-probed economics as the Bloom filter.
    Exactly-once via per-batch partition overwrite
    (``write_batch_idempotent``)."""
    from rdfproject_msc_spark.operators import dsir

    spark = raw_sample.sparkSession
    fitted = dsir.dsir_log_ratios(
        raw_sample,
        target,
        n_buckets=n_buckets,
        smoothing=smoothing,
    )
    # bounded (n_buckets rows): pin as a local relation so micro-batch
    # plans reuse the model instead of re-running the fit
    model = spark.createDataFrame(fitted.collect(), schema=fitted.schema)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        scored = dsir.dsir_weights(
            batch_df,
            target,
            n_buckets=n_buckets,
            smoothing=smoothing,
            log_ratios=model,
        )
        write_batch_idempotent(scored, out_dir, batch_id)

    q = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
