"""Mergeable distinct-count sketches (operators/sketches.py): exact bitmap
counts vs Spark's own countDistinct and a DuckDB twin, lossless shard
merges (the incremental-statistics contract), persisted-partial round
trips, HLL merge-equals-one-pass, and HLL accuracy bounds."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators import sketches as S


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_bitmap_exact_matches_count_distinct(events):
    got = {
        r["event_type"]: r["n_distinct"]
        for r in S.exact_distinct(events, ["event_type"], "user_id").collect()
    }
    want = {
        r["event_type"]: r["t"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("t"))
        .collect()
    }
    assert got == want


def test_bitmap_exact_matches_duckdb(events, sf_dir):
    got = {
        r["event_type"]: r["n_distinct"]
        for r in S.exact_distinct(events, ["event_type"], "user_id").collect()
    }
    want = {
        t: n
        for t, n in duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) FROM "
            f"read_parquet('{sf_dir}/events.parquet') GROUP BY event_type"
        ).fetchall()
    }
    assert got == want


def test_bitmap_handles_negative_and_huge_ids(spark):
    vals = [-(1 << 40), -5, -1, 0, 1, 5, 1 << 40]
    df = spark.createDataFrame(
        [(g, v) for g in ["a", "b"] for v in vals], "g string, v long"
    )
    got = dict(
        map(tuple, S.exact_distinct(df, ["g"], "v").collect())
    )
    assert got == {"a": len(vals), "b": len(vals)}


def test_bitmap_shard_merge_is_lossless(events):
    one_pass = sorted(
        map(
            tuple,
            S.exact_distinct(events, ["event_type"], "user_id").collect(),
        )
    )
    shards = [
        S.bitmap_partials(
            events.filter(F.col("event_id") % 3 == i),
            ["event_type"],
            "user_id",
        )
        for i in range(3)
    ]
    merged = S.bitmap_distinct_counts(S.bitmap_merge(*shards), ["event_type"])
    assert sorted(map(tuple, merged.collect())) == one_pass


def test_bitmap_partials_persist_roundtrip(events, spark, tmp_path):
    # the steady-state story: persist per-shard partials, merge later
    # without re-scanning the shard
    path = str(tmp_path / "bm_partials")
    S.bitmap_partials(events, ["event_type"], "user_id").write.parquet(path)
    merged = S.bitmap_distinct_counts(
        S.bitmap_merge(spark.read.parquet(path)), ["event_type"]
    )
    direct = S.exact_distinct(events, ["event_type"], "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bitmap_skips_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)], "g string, v long"
    )
    assert S.exact_distinct(df, ["g"], "v").head()["n_distinct"] == 2


def test_hll_merge_equals_one_pass(events):
    one_pass = sorted(
        map(tuple, S.hll_estimates(
            S.hll_partials(events, ["event_type"], "user_id")
        ).collect())
    )
    shards = [
        S.hll_partials(
            events.filter(F.col("event_id") % 2 == i),
            ["event_type"],
            "user_id",
        )
        for i in range(2)
    ]
    merged = sorted(
        map(tuple, S.hll_estimates(S.hll_merge(*shards)).collect())
    )
    assert merged == one_pass


def test_hll_accuracy_at_scale(spark):
    # 200k distinct values in one group: lgk=12 gives ~1.6% standard
    # error; pin 5%
    df = spark.range(0, 200_000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    est = S.hll_estimates(S.hll_partials(df, ["g"], "v")).head()[
        "approx_distinct"
    ]
    assert abs(est - 200_000) / 200_000 < 0.05


def test_hll_works_on_strings(spark):
    df = spark.range(0, 1000).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("user_"), F.col("id")).alias("v"),
    )
    est = S.hll_estimates(S.hll_partials(df, ["g"], "v")).head()[
        "approx_distinct"
    ]
    assert abs(est - 1000) / 1000 < 0.05
