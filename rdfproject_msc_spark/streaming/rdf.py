"""Streaming raw-RDF ingestion: the first mile, incrementally.

The batch first mile (sources/ntriples.py) splits into a stateless half
and a stateful half, and only the stateless half belongs in a stream:

- PARSING is a pure projection (one regex per line), so the stream runs
  the EXACT batch expressions (``parse_ntriples_lines`` — shared code,
  not a reimplementation) per micro-batch, append-mode, zero state.
- ENCODING against a dictionary is a STREAM-STATIC join: the dictionary
  is the static side (three term-keyed joins, identical to the batch
  ``encode_triples``). Spark re-plans the static side per micro-batch,
  so a dictionary parquet that grows BETWEEN batches is picked up.
- DICTIONARY CONSTRUCTION is deliberately NOT streamed: dense rank
  assignment is a global property of the term set (a streaming version
  would need unbounded state and would re-rank history). The incremental
  path is the batch ``extend_dictionary`` run BETWEEN deliveries —
  exactly the persisted-MinHash-index economics (index appends are batch
  jobs; probes are cheap) — after which arriving statements that carry
  the new terms encode successfully.

Unseen-term policy (``encode_ntriples_stream``): inner joins DROP
statements mentioning terms the dictionary does not hold (they are
unrepresentable as ids). Streams that must not lose data stage raw
parsed terms alongside (cheap: one more append sink) and re-encode the
residue after the next dictionary extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rdfproject_msc_spark.sources.ntriples import (
    encode_triples,
    parse_ntriples_lines,
)


def read_ntriples_stream(
    spark: SparkSession,
    nt_dir: str,
    max_files_per_trigger: int | None = None,
    on_error: str = "skip",
) -> DataFrame:
    """Streaming N-Triples source: a directory where NT text files land.
    ``on_error="fail"`` makes a malformed line kill the micro-batch (a
    producer bug surfaces instead of silently thinning the store)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_ntriples_lines(reader.text(nt_dir), on_error=on_error)


def encode_ntriples_stream(
    parsed: DataFrame, dictionary: DataFrame
) -> DataFrame:
    """Stream-static encode: the batch ``encode_triples`` applied to a
    streaming parsed relation (the three joins are stream-static inner
    joins — stateless, append-safe). Statements with terms absent from
    the dictionary are DROPPED (see module docstring)."""
    return encode_triples(parsed, dictionary)


def ingest_ntriples_stream(
    spark: SparkSession,
    nt_dir: str,
    dictionary: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    on_error: str = "skip",
):
    """Drain arriving NT files into an encoded-triples parquet directory —
    the layout ``TripleStore``/``Engine.open`` reads. Returns the finished
    StreamingQuery."""
    enc = encode_ntriples_stream(
        read_ntriples_stream(spark, nt_dir, max_files_per_trigger, on_error),
        dictionary,
    )
    q = (
        enc.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
