"""Structured Streaming surface (north-star extension; SURVEY.md §2.10 —
the reference has no streaming, this is the Spark-native event path)."""

from rdfproject_msc_spark.streaming.events import (  # noqa: F401
    EVENT_SCHEMA,
    dedup_events_stream,
    hourly_rollup,
    near_pairs_stream,
    near_pairs_stream_outer,
    read_events_stream,
    run_to_memory_table,
    sessionize,
    stage_events_dir,
    stage_events_dir_by_time,
    stream_triples_to_store,
    triples_from_event_stream,
    user_running_totals,
)
from rdfproject_msc_spark.streaming.documents import (  # noqa: F401
    DOC_SCHEMA,
    curate_documents,
    decontaminate_stream,
    dsir_score_stream,
    read_documents_stream,
    stage_documents_dir,
    write_batch_idempotent,
)
from rdfproject_msc_spark.streaming.rdf import (  # noqa: F401
    encode_ntriples_stream,
    ingest_ntriples_stream,
    read_ntriples_stream,
)
from rdfproject_msc_spark.streaming.sparql import (  # noqa: F401
    sparql_stream_delta,
)
