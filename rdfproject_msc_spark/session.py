"""SparkSession factory tuned for this engine.

Local-mode testing runs on local[N] (single JVM); the configs below are
chosen so the same code scales on a multi-executor cluster:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  replaces the reference's hand-pinned ``spark.default.parallelism=1``
  (PartitionQueryingSubject.java:56,76) with adaptive parallelism.
- shuffle.partitions sized to cores locally; on a real cluster this is
  overridden (AQE coalescing makes the initial number less critical).
- UTC session timezone so results hash-match the DuckDB oracle.
- Arrow enabled for the Pandas-UDF slow path (similarity/multimodal ops).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rdfproject_msc_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # NOTE: nanos-timestamp handling (events.parquet) lives in
        # sources.tables.load_table, which must work on ANY session —
        # including externally-built ones — so it is not configured here.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
