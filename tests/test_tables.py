"""Regression tests for the table loaders.

Round-1 postmortem: the driver's harness builds its own SparkSession (no
engine configs), and reading events.parquet — TIMESTAMP(NANOS) — threw
PARQUET_TYPE_ILLEGAL unless the session happened to be built by get_spark.
load_table must be self-sufficient on a bare session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfproject_msc_spark.sources.tables import load_table


def test_load_events_on_bare_session(spark, sf_dir):
    # newSession() shares the context but has its own SQL conf; unset the
    # legacy flag to simulate an externally-built session that never set it.
    bare = spark.newSession()
    try:
        bare.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass
    df = load_table(bare, sf_dir, "events")
    dtypes = dict(df.dtypes)
    # nanos vintage reads back as timestamp; micros vintage as timestamp_ntz
    assert dtypes["ts"] in ("timestamp", "timestamp_ntz")
    assert dtypes["ts_ns"] == "bigint"
    n = df.count()
    assert n > 0
    # ts round-trips: micros floor of the preserved nanos value
    micros = (
        F.unix_micros("ts")
        if dtypes["ts"] == "timestamp"
        else F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        )
    )
    bad = df.filter(micros != F.expr("ts_ns DIV 1000")).count()
    assert bad == 0


def test_money_rounding_half_ties(spark):
    """_money must round in exact decimal; a .955 sum is a double-cast trap
    (150873.955 as double is ...95499999…, which rounds DOWN to .95)."""
    import duckdb

    from rdfproject_msc_spark.registry import _money

    df = spark.createDataFrame(
        [("a", "150873.945"), ("a", "0.010")], "k string, v string"
    ).select("k", F.col("v").cast("decimal(18,4)").alias("v"))
    row = df.groupBy("k").agg(_money(F.col("v"), "m")).collect()[0]
    oracle = duckdb.sql(
        "SELECT CAST(round(CAST(150873.945 AS DECIMAL(18,4))"
        " + CAST(0.010 AS DECIMAL(18,4)), 2) AS DOUBLE)"
    ).fetchone()[0]
    assert row["m"] == oracle == 150873.96


def test_load_events_nanos_vintage(spark, tmp_path):
    """The r3-era TIMESTAMP(NANOS) vintage must keep loading even though
    the current driver testdata is micros TIMESTAMP_NTZ: synthesize a
    nanos parquet and assert exact ts_ns preservation (sub-microsecond
    digits intact) plus the micros re-exposure of ts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [1704067200123456789, 1704067200987654321],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([7, 8], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r.event_id: r.ts_ns for r in df.collect()}
    assert got == {1: 1704067200123456789, 2: 1704067200987654321}
    bad = df.filter(
        F.unix_micros("ts") != F.expr("ts_ns DIV 1000")
    ).count()
    assert bad == 0
