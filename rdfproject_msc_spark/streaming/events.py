"""Streaming ingestion + windowed aggregation over the events table.

Design (Structured Streaming, the Spark-native stream model):

- file source with an explicit schema (streams NEVER infer schemas —
  inference reads the future);
- event-time watermarking bounds state for late data: an event more than
  ``watermark`` behind the max seen ts is dropped from open windows, so a
  1000-executor job's aggregation state stays finite no matter how long the
  stream runs;
- windowed aggregation compiles to the same partial/final hash aggregation
  as batch — stream-batch equivalence is a TESTED property here (the same
  rollup over the same rows gives identical results in both modes);
- custom stateful logic (per-user running totals) uses
  ``applyInPandasWithState`` — Arrow-batched per-group state, the modern
  replacement for updateStateByKey-style hand-rolled state.

Local tests run with ``trigger(availableNow=True)`` micro-batches over a
staged directory of parquet files; on a cluster the same code points at a
Kafka/file landing zone and runs continuously.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string, ts_ns long"
)


def stage_events_dir(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Stage the (batch) events table as a directory of parquet files — the
    shape a streaming file source consumes. ``n_files`` > 1 so
    maxFilesPerTrigger can exercise multi-micro-batch behavior."""
    from rdfproject_msc_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    events.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return out_dir


def stage_events_dir_by_time(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Stage events as TIME-ORDERED parquet slices: file k holds the k-th
    ascending ts range (repartitionByRange) and the files carry strictly
    increasing modification times, so the file stream source replays them
    in event-time order. This is the arrival shape stream-STREAM joins
    assume — a random split over a long history makes most rows late
    beyond any reasonable watermark, which append-mode joins drop (the
    aggregation tests tolerate that only because complete-mode state
    ignores the watermark)."""
    import os
    import time

    from rdfproject_msc_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    (
        events.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    parts = sorted(
        f for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    base = time.time() - len(parts) * 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(out_dir, f), (base + i * 10, base + i * 10))
    return out_dir


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_dir)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Event-time hourly rollup (stream twin of registry.events_hourly):
    tumbling 1-hour windows + watermark. Money math mirrors the batch oracle
    exactly: exact decimal sum → round → double."""
    money = (
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_value")
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), money)
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_to_memory_table(
    df: DataFrame,
    spark: SparkSession,
    name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain the stream with availableNow micro-batches into an in-memory
    sink and return the result as a BATCH DataFrame. availableNow processes
    everything currently in the source, then stops — the deterministic
    'catch up and finish' trigger, which is what makes stream output
    comparable against a batch oracle."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming triple ingestion: events stream → dictionary-encoded triples

def triples_from_event_stream(events: DataFrame) -> DataFrame:
    """Derive the event-sourced RDF triples INCREMENTALLY from the event
    stream — the streaming twin of sources/derived.py's batch derivation
    (same id encoding: event → -(event_id*10+7), :byUser=48, :hasType=68).

    Stateless row-wise transform: it runs identically under readStream and
    read, so a parquet-appending writeStream keeps a triple store current as
    events land — streaming ingestion into the same layout batch queries
    read (append mode, no aggregation state)."""
    etype_code = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for kv in (
                    ("click", 1),
                    ("error", 2),
                    ("purchase", 3),
                    ("signup", 4),
                    ("view", 5),
                )
                for x in kv
            ]
        ),
        F.col("event_type"),
    )
    ev_subj = -(F.col("event_id") * 10 + 7)
    by_user = events.select(
        ev_subj.cast("long").alias("s"),
        F.lit(48).cast("long").alias("p"),
        (F.col("user_id") * 10 + 1).cast("long").alias("o"),
    )
    has_type = events.select(
        ev_subj.cast("long").alias("s"),
        F.lit(68).cast("long").alias("p"),
        (etype_code * 10 + 9).cast("long").alias("o"),
    )
    return by_user.unionByName(has_type)


def stream_triples_to_store(
    events: DataFrame, path: str, checkpoint_dir: str
) -> None:
    """Streaming ingestion into the persisted triple store layout: append
    the derived triples as sign-partitioned Parquet — the SAME on-disk
    shape TripleStore.write produces and TripleStore.read opens, so batch
    queries (and their partition pruning) run unchanged over data that
    arrived via the stream.

    Append-only file sink + checkpoint = exactly-once per micro-batch; the
    ``sign`` partition column keeps directory pruning working as files
    accumulate. ``availableNow`` drains the staged input and stops —
    production would run the same query with a processing-time trigger."""
    triples = triples_from_event_stream(events).withColumn(
        "sign", (F.col("s") >= 0).cast("int")
    )
    q = (
        triples.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .partitionBy("sign")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def near_pairs_stream(
    events: DataFrame,
    *,
    key: str = "user_id",
    max_delta_s: int = 300,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval self-join: pair every event with
    the STRICTLY LATER events of the same ``key`` within ``max_delta_s``
    seconds — the streaming twin of ``operators/asof.interval_join`` (the
    ``events_near_pairs`` shape), pairing events that arrive in DIFFERENT
    micro-batches through the join state store. Each |Δts| ≤ max_delta
    pair with distinct timestamps emits exactly once (earlier event on
    the left); simultaneous events do not pair — the tie-break would need
    an id inequality in the join condition, and any NON-TIME cross-side
    conjunct makes Spark's StreamingJoinHelper fail to solve the state
    constraint (it then buffers both sides FOREVER — measured, not
    guessed; filter ids downstream if you need simultaneous pairs).

    State boundedness (the reason stream-stream joins need BOTH pieces):
    each side carries an event-time watermark, and the join condition is
    a pure TIME-RANGE between the two event-time columns (CalendarInterval
    via make_interval — the ANSI DayTimeInterval the bare INTERVAL literal
    produces is likewise unsolvable), so Spark evicts a buffered row once
    the opposite watermark passes ts + max_delta: state is
    O(rate × (watermark + max_delta)), never unbounded. Inner joins emit
    each match as soon as both rows exist (no watermark holdback — that
    is outer-join semantics only).

    Arrival contract: a file-replay source must deliver slices in event-
    time order (``stage_events_dir_by_time``) — rows later than the
    watermark horizon behind max-seen ts are dropped as late, exactly as
    they would be in production."""
    left, right = _near_pair_sides(events, key, watermark)
    d = int(max_delta_s)
    cond = F.expr(
        f"k = k2 AND ts2 > ts1 AND ts2 <= ts1 + make_interval(0,0,0,0,0,0,{d})"
    )
    return left.join(right, cond).drop("k2")


def _near_pair_sides(
    events: DataFrame, key: str, watermark: str
) -> tuple[DataFrame, DataFrame]:
    """The watermarked left/right projections shared by the inner and
    left-outer interval self-joins — one construction path, so a schema
    tweak (say, a second key column) lands once. The JOIN CONDITIONS
    stay explicit at each call site: the interval-literal forms differ
    for a measured StreamingJoinHelper solver reason (see each
    docstring), which is exactly the kind of difference a shared helper
    must not hide."""
    left = events.withWatermark("ts", watermark).select(
        F.col(key).alias("k"),
        F.col("event_id").alias("id1"),
        F.col("ts").alias("ts1"),
    )
    right = events.withWatermark("ts", watermark).select(
        F.col(key).alias("k2"),
        F.col("event_id").alias("id2"),
        F.col("ts").alias("ts2"),
    )
    return left, right


def near_pairs_stream_outer(
    events: DataFrame,
    *,
    key: str = "user_id",
    max_delta_s: int = 300,
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT-OUTER watermarked stream-stream interval self-join (r10):
    ``near_pairs_stream`` plus one row per event with NO strictly-later
    same-key event inside ``max_delta_s`` — null-extended ``(id2, ts2)``
    — the streaming complement an as-of pipeline needs to see "events
    with no successor" (session closers, last-touch attribution).

    Same state-boundedness contract as the inner form (both-side
    watermarks + a pure time-range condition), with the EXTRA semantics
    outer joins add: a left row cannot be declared match-less until the
    RIGHT watermark has passed ``ts1 + max_delta`` (a matching row
    could still arrive), so null-extended rows are HELD BACK until the
    watermark crosses that horizon and then emitted exactly once.
    Matched pairs still emit as soon as both rows exist. Consequence: a
    drain whose final watermark stops short of the last events' horizon
    leaves their null-extensions unemitted — exactly Spark's outer-join
    timing contract, pinned in the tests rather than papered over.

    Interval-form trap (the outer twin of the inner form's measured
    unsolvable-constraint trap): the OUTER support check requires
    StreamingJoinHelper to solve a state watermark for the NULLABLE
    side, and it solves the ``interval N seconds`` DayTimeInterval
    arithmetic but NOT the ``make_interval(...)`` CalendarInterval form
    the inner join uses (measured — AnalysisException at start). Hence
    the literal form here."""
    left, right = _near_pair_sides(events, key, watermark)
    d = int(max_delta_s)
    cond = F.expr(
        f"k = k2 AND ts2 > ts1 AND ts2 <= ts1 + interval {d} seconds"
    )
    return left.join(right, cond, "left_outer").drop("k2")


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once dedup: at-least-once sources (Kafka retries,
    file-source re-lists, replayed batches) redeliver events; keeping one
    copy per event_id is the first stage of any streaming training-data
    pipeline. ``dropDuplicatesWithinWatermark`` bounds the dedup state to
    the watermark horizon — a plain ``dropDuplicates`` would hold every key
    seen since the stream started, which is unbounded state on an infinite
    stream (the streaming twin of dedup.exact_dedup_keys' bounded-key
    principle: state keyed by id, never by payload)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


# ---------------------------------------------------------------------------
# custom stateful operator: per-user running totals (applyInPandasWithState)

USER_STATE_SCHEMA = "n_events long, total_value double"
USER_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


def _update_user_totals(key, pdfs, state):
    """Group-state update: fold this micro-batch's rows for one user into
    (n_events, total_value) and emit the running totals."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 2)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


SESSION_STATE_SCHEMA = (
    "session_start long, last_ts long, n_events long, next_session_id long"
)
SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_id long, session_start long, session_end long, "
    "n_events long"
)


def _update_sessions(key, pdfs, state, gap_us: int):
    """Gap-based sessionization for one user: events more than ``gap_us``
    apart start a new session. Emits every CLOSED session; the open session
    stays in state across micro-batches."""
    import pandas as pd  # executor-side import

    if state.exists:
        start, last, n, next_id = state.get
    else:
        start, last, n, next_id = None, None, 0, 0

    out_rows = []
    ts_all = []
    for pdf in pdfs:
        ts_all.extend(int(t) for t in pdf["ts_us"])
    for t in sorted(ts_all):
        if last is None:
            start, last, n = t, t, 1
        elif t - last > gap_us:
            out_rows.append((key[0], next_id, start, last, n))
            next_id += 1
            start, last, n = t, t, 1
        else:
            last = t
            n += 1
    state.update((start, last, n, next_id))
    cols = ["user_id", "session_id", "session_start", "session_end", "n_events"]
    yield pd.DataFrame(out_rows, columns=cols)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user gap sessionization as explicit streaming state
    (applyInPandasWithState): the canonical custom stateful operator. Emits
    closed sessions; the in-flight session survives micro-batch boundaries
    in the state store. (Batch twin for tests: window lag + cumulative sum.)
    """
    from functools import partial

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    # prefer the exact integer ts_ns (present on every load_table /
    # EVENT_SCHEMA events relation, either timestamp vintage); unix_micros
    # only types against TIMESTAMP_LTZ
    micros = (
        F.expr("ts_ns DIV 1000")
        if "ts_ns" in events.columns
        else F.unix_micros(F.col("ts"))
    )
    src = events.select("user_id", micros.alias("ts_us"))
    return src.groupBy("user_id").applyInPandasWithState(
        partial(_update_sessions, gap_us=gap_us),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) maintained as explicit
    streaming state — the custom-stateful-operator shape
    (applyInPandasWithState): Arrow-batched groups, schema-declared state,
    update-mode emission each micro-batch."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=USER_OUTPUT_SCHEMA,
            stateStructType=USER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
