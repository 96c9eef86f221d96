"""Stream-batch equivalence tests: the streaming rollup must produce exactly
the batch answer, and the custom stateful operator's final state must equal
the batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark import streaming as S
from rdfproject_msc_spark.operators.decontam import ngram_contamination
from rdfproject_msc_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream") / "events")
    return S.stage_events_dir(spark, sf_dir, out, n_files=4)


def test_hourly_rollup_stream_equals_batch(spark, sf_dir, events_dir, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    result = S.run_to_memory_table(
        S.hourly_rollup(stream), spark, "hourly_stream_t", ckpt
    )

    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
    got = sorted(map(tuple, result.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_user_running_totals_final_state_equals_batch(
    spark, sf_dir, events_dir, tmp_path_factory
):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    out = S.run_to_memory_table(
        S.user_running_totals(stream),
        spark,
        "user_totals_t",
        ckpt,
        output_mode="update",
    )
    # update mode appends one row per user per micro-batch that touched the
    # user; the row with the max n_events per user is the final state.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )

    ev = load_table(spark, sf_dir, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in final.collect()}
    want = {r.user_id: (r.n_events, r.total_value) for r in batch.collect()}
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0], uid
        assert abs(got[uid][1] - want[uid][1]) < 0.05, uid


def test_streaming_triple_ingestion_matches_batch(
    spark, sf_dir, events_dir, tmp_path_factory
):
    """The stream-derived triples equal the batch derivation's event-sourced
    subset — streaming ingestion lands the SAME rows a batch rebuild would."""
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    got = S.run_to_memory_table(
        S.triples_from_event_stream(stream),
        spark,
        "triples_stream_t",
        ckpt,
        output_mode="append",
    )
    from rdfproject_msc_spark.sources.derived import triples_df

    want = triples_df(spark, sf_dir).filter(F.col("p").isin(48, 68))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sessionize_stream_matches_batch_twin(
    spark, sf_dir, events_dir, tmp_path_factory
):
    """Closed sessions from the stateful operator equal the batch gap
    sessionization (single availableNow trigger: cross-batch event-time
    disorder is a watermark problem, out of scope for this operator's test).
    """
    from pyspark.sql import Window

    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    stream = S.read_events_stream(spark, events_dir)  # one trigger, all files
    out = S.run_to_memory_table(
        S.sessionize(stream, gap_minutes=30),
        spark,
        "sessions_t",
        ckpt,
        output_mode="append",
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out.collect()
    }

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns DIV 1000").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t")
    gap = 30 * 60 * 1_000_000
    sess = (
        ev.withColumn("prev", F.lag("t").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull() | ((F.col("t") - F.col("prev")) > gap)).cast(
                "long"
            ),
        )
        .withColumn("sid", F.sum("new_sess").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("t").alias("session_start"),
            F.max("t").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    # the stream emits CLOSED sessions only: drop each user's last session
    w2 = Window.partitionBy("user_id")
    closed = sess.withColumn("max_sid", F.max("sid").over(w2)).filter(
        F.col("sid") < F.col("max_sid")
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in closed.collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_ingest_into_queryable_store(
    spark, sf_dir, events_dir, tmp_path_factory
):
    """Close the loop: writeStream appends stream-derived triples as parquet;
    a TripleStore opens that directory and answers a batch SPARQL-shaped
    query — streaming ingestion feeding the exact layout batch queries read.
    """
    from rdfproject_msc_spark import queries as Q
    from rdfproject_msc_spark.store import TripleStore

    out = str(tmp_path_factory.mktemp("ingest") / "triples")
    ckpt = str(tmp_path_factory.mktemp("ingest") / "ckpt")
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    q = (
        S.triples_from_event_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    store = TripleStore(spark.read.parquet(out), layout="sign_split")
    got = Q.sign_union(store, p=48)  # all :byUser triples
    n_events = load_table(spark, sf_dir, "events").count()
    assert got.count() == n_events
    # negative side == all event subjects; positive side empty for p=48
    assert store.negative.filter(F.col("p") == 48).count() == n_events


def test_watermark_bounds_state(spark, events_dir, tmp_path_factory):
    """The rollup plan must carry the watermark node (state-bounding at
    scale); presence is checked in the analyzed plan."""
    stream = S.read_events_stream(spark, events_dir)
    plan = S.hourly_rollup(stream)._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_dedup_stream_drops_redelivered_events(
    spark, sf_dir, events_dir, tmp_path_factory
):
    """At-least-once delivery: stage the SAME event files twice; the
    streaming dedup must emit each event_id exactly once — the stream count
    equals the batch distinct count, not the doubled delivery count."""
    import os
    import shutil

    dup_dir = str(tmp_path_factory.mktemp("dup") / "events")
    os.makedirs(dup_dir)
    for f in os.listdir(events_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(events_dir, f), os.path.join(dup_dir, f))
            shutil.copy(
                os.path.join(events_dir, f), os.path.join(dup_dir, "redelivered_" + f)
            )
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    stream = S.read_events_stream(spark, dup_dir, max_files_per_trigger=2)
    # the staged files are random partitions of the FULL time range, so each
    # micro-batch spans it all and advances the watermark to (max ts - w);
    # the horizon must cover the span or old-but-new events count as late.
    # In production the horizon is sized to the source's redelivery window.
    out = S.run_to_memory_table(
        S.dedup_events_stream(stream, watermark="3650 days").select("event_id"),
        spark,
        "dedup_stream_t",
        ckpt,
        output_mode="append",
    )
    n_batch = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert out.count() == n_batch
    assert out.distinct().count() == n_batch


def test_stream_triples_into_persisted_store(
    spark, sf_dir, events_dir, tmp_path_factory
):
    """End-to-end: events stream → sign-partitioned parquet store →
    TripleStore.read → SPARQL/store queries see the streamed triples.
    Proves 'streaming ingestion into the same layout batch queries read':
    the store answers identically to one built from the batch derivation,
    and the sign split still prunes at directory level."""
    from rdfproject_msc_spark.store import TripleStore

    path = str(tmp_path_factory.mktemp("store") / "triples")
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    S.stream_triples_to_store(stream, path, ckpt)

    store = TripleStore.read(spark, path, layout="sign_split")
    # the streamed store must agree with the batch derivation end-to-end
    from rdfproject_msc_spark.sources.derived import triples_df

    want = triples_df(spark, sf_dir).filter(F.col("p").isin(48, 68))
    assert sorted(map(tuple, store.df.select("s", "p", "o").collect())) == sorted(
        map(tuple, want.collect())
    )
    # event subjects are negative → table_for_subject routes to the sign=0
    # directory only (partition pruning on the streamed layout)
    routed = store.table_for_subject(-17)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "sign" in plan
    # a second availableNow run over the SAME checkpoint must not duplicate
    # (file-sink exactly-once per micro-batch)
    stream2 = S.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    S.stream_triples_to_store(stream2, path, ckpt)
    assert store.df.count() == want.count()


def test_document_curation_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """The stateless curation stages (normalize → redact → score → count →
    filter) run append-mode over a document stream and produce exactly the
    batch result — the 'nightly batch pipeline runs continuously' claim."""
    docs_dir = S.stage_documents_dir(
        spark, sf_dir, str(tmp_path_factory.mktemp("stream") / "docs"), n_files=4
    )
    stream = S.read_documents_stream(spark, docs_dir, max_files_per_trigger=1)
    got = S.run_to_memory_table(
        S.curate_documents(stream),
        spark,
        "curated_docs_stream",
        str(tmp_path_factory.mktemp("ckpt")),
        output_mode="append",
    )
    batch = S.curate_documents(load_table(spark, sf_dir, "documents"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )
    assert got.count() > 0


def test_stream_embeddings_into_ivf_layout(spark, sf_dir, tmp_path_factory):
    """Embeddings twin of the triples streaming-store test: vectors stream
    into the centroid-partitioned IVF layout and the batch probes (with
    their directory pruning) answer identically to a batch-written layout
    over the same corpus; a checkpoint replay does not duplicate."""
    from rdfproject_msc_spark.operators import similarity as sim
    from rdfproject_msc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = sim.kmeans_centroids(emb, k=4, dim=64, seed=7)

    staged = str(tmp_path_factory.mktemp("emb_src"))
    emb.repartition(3).write.mode("overwrite").parquet(staged)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    path = str(tmp_path_factory.mktemp("ivf") / "layout")
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    sim.ivf_stream_append(stream, path, ckpt, centroids)

    batch_path = str(tmp_path_factory.mktemp("ivf_b") / "layout")
    sim.ivf_write(emb, centroids, batch_path)

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = sim.ivf_topk_persisted(
        spark, path, qv, k=10, nprobe=2, exclude_id=0
    ).collect()
    want = sim.ivf_topk_persisted(
        spark, batch_path, qv, k=10, nprobe=2, exclude_id=0
    ).collect()
    assert [(r.vec_id, r.score) for r in got] == [
        (r.vec_id, r.score) for r in want
    ]
    # quantized probe (directory + column pruning) works on the streamed
    # layout too — the qvec column arrived via the stream
    gq = sim.ivf_topk_persisted_quantized(
        spark, path, qv, k=10, nprobe=2, exclude_id=0
    ).collect()
    assert len(gq) == 10
    # directory pruning on the streamed layout
    probes = sim.ivf_topk_persisted(spark, path, qv, k=10, nprobe=2)
    plan = probes._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # replaying the drained source over the same checkpoint adds nothing
    stream2 = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    sim.ivf_stream_append(stream2, path, ckpt, centroids)
    assert spark.read.parquet(path).count() == emb.count()


def test_ivf_multi_layout_probe(spark, sf_dir, tmp_path_factory):
    """Bootstrap-batch + streamed-increment deployment: half the corpus is
    batch-written, the other half streams into a second layout under the
    same quantizer; the multi-layout probe equals a single-layout probe
    over the full batch-written corpus, and mismatched quantizers are
    refused."""
    import pytest

    from rdfproject_msc_spark.operators import similarity as sim
    from rdfproject_msc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = sim.kmeans_centroids(emb, k=4, dim=64, seed=7)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)

    base = tmp_path_factory.mktemp("multi")
    path_a = str(base / "batch")
    sim.ivf_write(half_a, centroids, path_a)
    staged = str(base / "src")
    half_b.repartition(2).write.mode("overwrite").parquet(staged)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    path_b = str(base / "streamed")
    sim.ivf_stream_append(stream, path_b, str(base / "ckpt"), centroids)

    full_path = str(base / "full")
    sim.ivf_write(emb, centroids, full_path)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = sim.ivf_topk_multi(
        spark, [path_a, path_b], qv, k=10, nprobe=2, exclude_id=0
    ).collect()
    want = sim.ivf_topk_persisted(
        spark, full_path, qv, k=10, nprobe=2, exclude_id=0
    ).collect()
    assert [(r.vec_id, r.score) for r in got] == [
        (r.vec_id, r.score) for r in want
    ]
    # a layout written under a different quantizer is refused
    other = sim.kmeans_centroids(emb, k=4, dim=64, seed=99)
    path_c = str(base / "other")
    sim.ivf_write(half_a, other, path_c)
    with pytest.raises(ValueError, match="different centroids"):
        sim.ivf_topk_multi(spark, [path_a, path_c], qv, k=10)


def test_stream_embeddings_into_lsh_layout(spark, sf_dir, tmp_path_factory):
    """LSH twin of the IVF streaming test: vectors stream into the
    (band, band_val)-partitioned signature layout; persisted probes —
    including multiprobe — answer identically to a batch-written layout
    over the same corpus, and a checkpoint replay does not duplicate."""
    from rdfproject_msc_spark.operators import similarity as sim
    from rdfproject_msc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    staged = str(tmp_path_factory.mktemp("emb_lsh_src"))
    emb.repartition(3).write.mode("overwrite").parquet(staged)

    def _stream():
        return (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )

    path = str(tmp_path_factory.mktemp("lsh_s") / "layout")
    ckpt = str(tmp_path_factory.mktemp("lsh_ckpt"))
    sim.lsh_stream_append(_stream(), path, ckpt, dim=64, n_planes=16, bands=8)

    batch_path = str(tmp_path_factory.mktemp("lsh_b") / "layout")
    sim.lsh_write(emb, batch_path, dim=64, n_planes=16, bands=8)

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    for probes in (1, 2):
        got = sim.lsh_topk_persisted(
            spark, path, qv, k=10, exclude_id=0, probes=probes
        ).collect()
        want = sim.lsh_topk_persisted(
            spark, batch_path, qv, k=10, exclude_id=0, probes=probes
        ).collect()
        assert [(r.vec_id, r.score) for r in got] == [
            (r.vec_id, r.score) for r in want
        ], probes
    # directory pruning holds on the streamed layout
    probe = sim.lsh_topk_persisted(spark, path, qv, k=10)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # replaying the drained source over the same checkpoint adds nothing
    n_before = spark.read.parquet(path).count()
    sim.lsh_stream_append(_stream(), path, ckpt, dim=64, n_planes=16, bands=8)
    assert spark.read.parquet(path).count() == n_before


def test_chunking_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """curate → chunk is stateless end to end (projections + bounded
    explode), so the training-example feed runs append-mode over a
    document stream and equals the batch result — incremental last-mile
    chunking without a rewrite."""
    from rdfproject_msc_spark.operators.chunking import chunk_documents

    docs_dir = S.stage_documents_dir(
        spark, sf_dir, str(tmp_path_factory.mktemp("cstream") / "docs"), n_files=4
    )
    stream = S.read_documents_stream(spark, docs_dir, max_files_per_trigger=1)
    got = S.run_to_memory_table(
        chunk_documents(
            S.curate_documents(stream),
            max_tokens=32,
            overlap=8,
            content_col="text_clean",
        ),
        spark,
        "chunked_stream",
        str(tmp_path_factory.mktemp("cckpt")),
        output_mode="append",
    )
    batch = chunk_documents(
        S.curate_documents(load_table(spark, sf_dir, "documents")),
        max_tokens=32,
        overlap=8,
        content_col="text_clean",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )
    assert got.count() > 0


def test_lsh_multi_layout_probe(spark, sf_dir, tmp_path_factory):
    """Bootstrap-batch + streamed-increment LSH deployment: half the
    corpus batch-written, half streamed into a second layout; the merged
    probe equals a single layout over the full corpus, and mismatched
    parameters are rejected."""
    import pytest as _pytest

    from rdfproject_msc_spark.operators import similarity as sim
    from rdfproject_msc_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)

    base = tmp_path_factory.mktemp("lshmulti")
    path_a = str(base / "batch")
    sim.lsh_write(half_a, path_a, dim=64, n_planes=16, bands=8)
    staged = str(base / "staged")
    half_b.repartition(2).write.mode("overwrite").parquet(staged)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    path_b = str(base / "streamed")
    sim.lsh_stream_append(
        stream, path_b, str(base / "ckpt"), dim=64, n_planes=16, bands=8
    )

    full_path = str(base / "full")
    sim.lsh_write(emb, full_path, dim=64, n_planes=16, bands=8)

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = sim.lsh_topk_multi(
        spark, [path_a, path_b], qv, k=10, exclude_id=0, probes=2
    ).collect()
    want = sim.lsh_topk_persisted(
        spark, full_path, qv, k=10, exclude_id=0, probes=2
    ).collect()
    assert [(r.vec_id, r.score) for r in got] == [
        (r.vec_id, r.score) for r in want
    ]
    # parameter mismatch rejected
    path_c = str(base / "other")
    sim.lsh_write(half_a, path_c, dim=64, n_planes=16, bands=4)
    with _pytest.raises(ValueError, match="disagree"):
        sim.lsh_topk_multi(spark, [path_a, path_c], qv, k=10)


def test_sparql_stream_delta_equals_batch(spark, sf_dir, tmp_path):
    """Continuous SPARQL (streaming/sparql.py): streaming the :byUser
    edges through the delta query must produce EXACTLY the batch join of
    the same pattern against the same static solutions — stream ≡ batch,
    the subsystem's standing gate. Also pins constant resolution (the
    :hasType :etype_click stream pattern) and the no-shared-var reject."""
    from rdfproject_msc_spark.dictionary import Dictionary
    from rdfproject_msc_spark.sources.derived import (
        P_BY_USER,
        dictionary_df,
        triples_df,
    )
    from rdfproject_msc_spark.sparql.parser import SparqlSyntaxError
    from rdfproject_msc_spark.sparql.planner import sparql_to_df
    from rdfproject_msc_spark.store import TripleStore
    from rdfproject_msc_spark.streaming.sparql import sparql_stream_delta

    triples = triples_df(spark, sf_dir)
    d = Dictionary(dictionary_df(spark, sf_dir))
    store = TripleStore(triples)

    # stage the stream side: only the :byUser edges arrive as new data
    edges_dir = str(tmp_path / "edges")
    triples.filter(F.col("p") == P_BY_USER).repartition(3).write.parquet(
        edges_dir
    )
    stream = spark.readStream.schema("s long, p long, o long").parquet(
        edges_dir
    )

    static_q = "SELECT ?c ?n WHERE { ?c :inNation ?n }"
    out = sparql_stream_delta(
        stream, store, static_q, "?e :byUser ?c", dictionary=d
    )
    got = S.run_to_memory_table(
        out, spark, "sparql_delta", str(tmp_path / "ck"), output_mode="append"
    )

    want = sparql_to_df(
        store,
        "SELECT ?e ?c ?n WHERE { ?e :byUser ?c . ?c :inNation ?n }",
        d,
    )
    assert sorted(map(tuple, got.select("e", "c", "n").collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() > 0

    # constant slots resolve through the dictionary
    out2 = sparql_stream_delta(
        spark.readStream.schema("s long, p long, o long").parquet(edges_dir),
        store,
        static_q,
        "?e :byUser ?c",
        dictionary=d,
    )
    assert out2.isStreaming

    with pytest.raises(SparqlSyntaxError, match="shares no variable"):
        sparql_stream_delta(
            stream, store, static_q, "?x :hasType ?t", dictionary=d
        )

    # a stream pattern carrying any NON-FILTER clause is rejected, not
    # silently stripped — OPTIONAL/BIND/VALUES/UNION/GRAPH would
    # otherwise be discarded by the single-pattern compiler
    for bad in (
        "?e :byUser ?c . OPTIONAL { ?e :hasType ?t }",
        "?e :byUser ?c . BIND(?c + 1 AS ?d)",
        "?e :byUser ?c . VALUES ?c { 1 2 }",
        "{ ?e :byUser ?c } UNION { ?e :hasType ?c }",
    ):
        with pytest.raises(SparqlSyntaxError, match="exactly one plain"):
            sparql_stream_delta(stream, store, static_q, bad, dictionary=d)

    # stream-side FILTERs over the pattern's own vars (r6): stateless
    # per-batch predicates — the filtered delta equals the filtered batch
    outf = sparql_stream_delta(
        spark.readStream.schema("s long, p long, o long").parquet(edges_dir),
        store,
        static_q,
        "?e :byUser ?c . FILTER(?c > 50 && ?e <= -7)",
        dictionary=d,
    )
    gotf = S.run_to_memory_table(
        outf, spark, "sparql_delta_f", str(tmp_path / "ckf"),
        output_mode="append",
    )
    wantf = sparql_to_df(
        store,
        "SELECT ?e ?c ?n WHERE { ?e :byUser ?c . ?c :inNation ?n . "
        "FILTER(?c > 50 && ?e <= -7) }",
        d,
    )
    assert sorted(map(tuple, gotf.select("e", "c", "n").collect())) == sorted(
        map(tuple, wantf.collect())
    )
    # ...but only over the pattern's OWN variables (the root typo guard
    # fires first for vars bound nowhere in the pattern)
    with pytest.raises(SparqlSyntaxError, match="not in BGP"):
        sparql_stream_delta(
            stream, store, static_q,
            "?e :byUser ?c . FILTER(?n > 0)", dictionary=d,
        )

    # stream-side STRING-function FILTERs (r7): the variable's term
    # attaches via a stream-static broadcast dictionary join, stateless
    # per micro-batch — the filtered delta equals the filtered batch
    outs = sparql_stream_delta(
        spark.readStream.schema("s long, p long, o long").parquet(edges_dir),
        store,
        static_q,
        '?e :byUser ?c . FILTER(REGEX(STR(?c), "customer_1[0-9]$"))',
        dictionary=d,
    )
    gots = S.run_to_memory_table(
        outs, spark, "sparql_delta_s", str(tmp_path / "cks"),
        output_mode="append",
    )
    wants = sparql_to_df(
        store,
        "SELECT ?e ?c ?n WHERE { ?e :byUser ?c . ?c :inNation ?n . "
        'FILTER(REGEX(STR(?c), "customer_1[0-9]$")) }',
        d,
    )
    assert sorted(map(tuple, gots.select("e", "c", "n").collect())) == sorted(
        map(tuple, wants.collect())
    )
    assert gots.count() > 0
    # without a dictionary the string filter rejects, never silently
    # passes everything
    with pytest.raises(SparqlSyntaxError, match="need a dictionary"):
        sparql_stream_delta(
            stream, store, static_q,
            '?e :byUser ?c . FILTER(REGEX(STR(?c), "x"))', dictionary=None,
        )

    # a shared variable the static query binds only OPTIONALLY (nullable)
    # is rejected: NULL never matches the stream-static equi-join
    with pytest.raises(SparqlSyntaxError, match="required-bound"):
        sparql_stream_delta(
            stream,
            store,
            "SELECT ?c ?n WHERE { ?x :inNation ?n . "
            "OPTIONAL { ?x :byUser ?c } }",
            "?e :byUser ?c",
            dictionary=d,
        )
    # ...but a var bound in EVERY union arm is surely bound and accepted
    ok = sparql_stream_delta(
        stream,
        store,
        "SELECT ?c ?n WHERE { { ?c :inNation ?n } UNION "
        "{ ?c :inNation ?n . ?c :inNation ?n } }",
        "?e :byUser ?c",
        dictionary=d,
    )
    assert ok.isStreaming


def test_decontaminate_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Streaming benchmark decontamination (r8): documents arriving over
    multiple micro-batches get EXACTLY the batch verdicts — contamination
    is per-document vs a static benchmark, so foreachBatch runs the exact
    operator with zero cross-batch state, and the Bloom pre-filter builds
    once up front and is reused by every micro-batch plan."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 41 == 3)
    corpus = docs.filter(F.col("doc_id") % 41 != 3)

    base = tmp_path_factory.mktemp("decontam_stream")
    corpus_dir = str(base / "corpus")
    corpus.repartition(4).write.parquet(corpus_dir)
    out_dir = str(base / "report")
    stream = S.read_documents_stream(spark, corpus_dir, max_files_per_trigger=1)
    q = S.decontaminate_stream(
        stream, bench, out_dir, str(base / "ckpt"), n=3, threshold=0.5
    )
    # genuinely incremental: the drain ran more than one micro-batch
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) > 1

    got = spark.read.parquet(out_dir).drop("batch_id")
    want = ngram_contamination(corpus, bench, n=3, threshold=0.5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # sf0.001 is below the threshold-firing scale (the flag is
    # load-bearing at sf0.01 — registry note); pin on real overlap instead
    assert got.filter(F.col("n_matched") > 0).count() > 0


def test_dsir_score_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Streaming DSIR scoring (r8): documents arriving over multiple
    micro-batches get EXACTLY the batch importance weights — the bounded
    (bucket, log_ratio) model fits once up front as a local relation and
    every micro-batch plan reuses it."""
    from pyspark.sql import functions as F

    from rdfproject_msc_spark.operators import dsir

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 13 == 0)
    raw = docs.filter(F.col("doc_id") % 13 != 0)

    base = tmp_path_factory.mktemp("dsir_stream")
    raw_dir = str(base / "raw")
    raw.repartition(4).write.parquet(raw_dir)
    out_dir = str(base / "scored")
    stream = S.read_documents_stream(spark, raw_dir, max_files_per_trigger=1)
    q = S.dsir_score_stream(
        stream, raw, target, out_dir, str(base / "ckpt"), n_buckets=512
    )
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) > 1

    got = spark.read.parquet(out_dir).drop("batch_id")
    want = dsir.dsir_weights(raw, target, n_buckets=512)
    g = {r["doc_id"]: r for r in got.collect()}
    w = {r["doc_id"]: r for r in want.collect()}
    assert set(g) == set(w)
    for d in w:
        assert g[d]["n_feats"] == w[d]["n_feats"]
        # the per-doc float sum is order-sensitive at the last ulp; the
        # stream partitions differ from the batch plan's
        assert g[d]["log_weight"] == pytest.approx(
            w[d]["log_weight"], abs=1e-9
        )


def test_r8_row_filters_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Gopher rules, C4 cleaning, and tokenization (r8) are pure per-row
    projections — they run append-mode over a document stream and produce
    exactly the batch result, like curate_documents."""
    from rdfproject_msc_spark.operators.c4filter import c4_clean
    from rdfproject_msc_spark.operators.gopher import with_gopher_rules
    from rdfproject_msc_spark.operators.tokenize import token_ids

    docs_dir = S.stage_documents_dir(
        spark, sf_dir, str(tmp_path_factory.mktemp("r8s") / "docs"), n_files=4
    )
    batch_docs = load_table(spark, sf_dir, "documents")

    def compose(df):
        # flags ride along as columns (the sf0.001 synthetic text passes
        # neither filter, so filtering here would vacuously compare zero
        # rows); tokenize the C4-cleaned text — ONE projection chain, no
        # stream-side self-join
        scored = c4_clean(with_gopher_rules(df))
        return scored.select(
            "doc_id",
            "gopher_pass",
            "c4_keep",
            "n_words",
            token_ids(F.col("text_c4"), 4096).alias("input_ids"),
        )

    stream = S.read_documents_stream(spark, docs_dir, max_files_per_trigger=1)
    got = S.run_to_memory_table(
        compose(stream),
        spark,
        "r8_filters_stream",
        str(tmp_path_factory.mktemp("ckpt")),
        output_mode="append",
    )
    want = compose(batch_docs)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() > 0


def test_write_batch_idempotent_replay(spark, tmp_path):
    """foreachBatch is at-least-once: a batch whose write landed but whose
    checkpoint commit didn't will REPLAY on restart. The batch-keyed
    partition overwrite must absorb the replay — two writes of the same
    (df, batch_id) leave exactly one copy; a different batch_id appends."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out = str(tmp_path / "sink")
    S.write_batch_idempotent(df, out, 0)
    S.write_batch_idempotent(df, out, 0)  # crash-replay of batch 0
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert sorted((r.id, r.v, r.batch_id) for r in got.collect()) == [
        (1, "a", 0),
        (2, "b", 0),
    ]
    S.write_batch_idempotent(df, out, 1)  # a NEW batch still appends
    assert spark.read.parquet(out).count() == 4


def test_near_pairs_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Watermarked stream-stream interval self-join (r9): pairs of events
    by the same user within the window come out EXACTLY as the batch
    self-join computes them — including pairs whose two events arrive in
    DIFFERENT micro-batches (maxFilesPerTrigger=1 over 4 time-ordered
    slices forces cross-batch pairing through the join state store), with
    BOTH watermarks bounding state (evictions observed, no unbounded
    buffering)."""
    import os

    base = tmp_path_factory.mktemp("nearpairs")
    ed = S.stage_events_dir_by_time(
        spark, sf_dir, str(base / "events"), n_files=4
    )
    stream = S.read_events_stream(spark, ed, max_files_per_trigger=1)
    joined = S.near_pairs_stream(stream, max_delta_s=1800)
    # both inputs carry the state-bounding watermark
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
    q = (
        joined.writeStream.format("memory")
        .queryName("near_pairs_t")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(base), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.k, r.id1, r.id2) for r in spark.table("near_pairs_t").collect()
    }
    # multi-batch drain, and the solver DID bound state: rows were evicted
    # as the watermarks advanced (a failed state constraint evicts nothing)
    progresses = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progresses) > 1
    removed = sum(
        p["stateOperators"][0]["numRowsRemoved"] for p in q.recentProgress
    )
    assert removed > 0

    batch = spark.read.parquet(ed)
    l = batch.select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("id1"),
        F.col("ts").alias("t1"),
    )
    r = batch.select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("id2"),
        F.col("ts").alias("t2"),
    )
    want_df = l.join(r, "k").filter(
        "t2 > t1 AND t2 <= t1 + make_interval(0,0,0,0,0,0,1800)"
    )
    want = {(r.k, r.id1, r.id2) for r in want_df.collect()}
    assert got == want
    assert len(got) > 0


def test_near_pairs_stream_outer_left_join_with_holdback(
    spark, sf_dir, tmp_path_factory
):
    """LEFT-OUTER stream-stream interval join (r10): matched pairs come
    out like the inner form, and events with NO later same-user event in
    the window null-extend — but only after the RIGHT watermark passes
    their ts + max_delta horizon. Two drains over one checkpoint pin the
    timing: drain 1 (4 time-ordered slices) holds back the tail events'
    null-extensions; drain 2 adds a far-future sentinel that advances
    the watermark past every horizon, after which the accumulated file
    sink equals the BATCH left join exactly."""
    import datetime
    import os

    base = tmp_path_factory.mktemp("nearouter")
    ed = S.stage_events_dir_by_time(
        spark, sf_dir, str(base / "events"), n_files=4
    )
    sink, ckpt = str(base / "out"), str(base / "ckpt")

    def drain():
        stream = S.read_events_stream(spark, ed, max_files_per_trigger=1)
        joined = S.near_pairs_stream_outer(stream, max_delta_s=1800)
        q = (
            joined.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    q1 = drain()
    progresses = [p for p in q1.recentProgress if p["numInputRows"] > 0]
    assert len(progresses) > 1  # genuinely multi-batch
    got1 = spark.read.parquet(sink)
    nulls1 = {r.id1 for r in got1.filter("id2 IS NULL").collect()}

    batch = spark.read.parquet(ed)
    l = batch.select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("id1"),
        F.col("ts").alias("t1"),
    )
    r = batch.select(
        F.col("user_id").alias("k2"),
        F.col("event_id").alias("id2"),
        F.col("ts").alias("t2"),
    )
    want_df = l.join(
        r,
        F.expr(
            "k = k2 AND t2 > t1 AND "
            "t2 <= t1 + make_interval(0,0,0,0,0,0,1800)"
        ),
        "left_outer",
    )
    want_nulls = {r.id1 for r in want_df.filter("id2 IS NULL").collect()}
    # drain 1: HOLDBACK observed — the events whose ts + max_delta
    # horizon lies beyond the final watermark cannot null-extend yet
    assert nulls1 < want_nulls

    # sentinel: one far-future event (its own null-extension is held
    # back in turn, so it never reaches the sink) advances the
    # watermark past every real event's horizon
    max_ts = batch.agg(F.max("ts")).first()[0]
    far = max_ts + datetime.timedelta(hours=3)
    spark.createDataFrame(
        [(10**9, far, -1, "sentinel", 0.0, "{}", 0)],
        S.EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(ed)
    os.utime(ed, None)
    drain()

    got = spark.read.parquet(sink).filter("id1 != 1000000000")
    got_set = {
        (r.k, r.id1, r.id2) for r in got.collect()
    }
    want_set = {(r.k, r.id1, r.id2) for r in want_df.collect()}
    assert got_set == want_set
    assert any(i2 is None for _, _, i2 in got_set)  # null-extensions real
    # matched subset ≡ the inner join (outer adds rows, never changes them)
    inner = {t for t in want_set if t[2] is not None}
    assert {t for t in got_set if t[2] is not None} == inner
