"""Skew-robust exact top-N per key (operators/topn.py, r6).

The naive Window.partitionBy(key) top-N serializes a hot key through one
task; the salted two-stage form must produce the IDENTICAL exact result
while bounding every window partition — pinned here against the naive
form on a deliberately skewed fixture, plus determinism and the
plan-bounded stage-2 input property."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.topn import (
    quota_sample_per_key,
    top_n_per_key,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" holds 5000 rows, key "cold" 7, key "one" 1
    rows = [("hot", i, float(i % 997)) for i in range(5000)]
    rows += [("cold", 10_000 + i, float(i)) for i in range(7)]
    rows += [("one", 99_999, 5.0)]
    return spark.createDataFrame(
        rows, "k string, id long, score double"
    ).cache()


def _naive(df, n):
    w = Window.partitionBy("k").orderBy(F.col("score").desc(), F.col("id"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def test_salted_equals_naive_window(skewed):
    for n in (1, 3, 10):
        got = sorted(
            map(
                tuple,
                top_n_per_key(
                    skewed,
                    ["k"],
                    [F.col("score").desc(), F.col("id")],
                    n,
                    tiebreak_col="id",
                ).collect(),
            )
        )
        want = sorted(map(tuple, _naive(skewed, n).collect()))
        assert got == want and len(got) > 0
    # groups smaller than n return whole group
    one = top_n_per_key(
        skewed.filter(F.col("k") == "one"),
        ["k"],
        [F.col("score").desc(), F.col("id")],
        3,
        tiebreak_col="id",
    )
    assert one.count() == 1


def test_salted_is_deterministic(skewed):
    a = sorted(
        map(
            tuple,
            top_n_per_key(
                skewed, ["k"], [F.col("score").desc(), F.col("id")], 5, "id"
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            top_n_per_key(
                skewed.repartition(13),
                ["k"],
                [F.col("score").desc(), F.col("id")],
                5,
                "id",
            ).collect(),
        )
    )
    assert a == b


def test_stage2_input_is_bounded(skewed):
    """The scale property: stage 1 passes at most n × salts rows per key
    to the final window, independent of group size."""
    from rdfproject_msc_spark.operators.topn import top_n_per_key as t

    n, salts = 3, 8
    salt = F.crc32(F.col("id").cast("string")) % F.lit(salts)
    w1 = Window.partitionBy("k", salt).orderBy(
        F.col("score").desc(), F.col("id")
    )
    survivors = (
        skewed.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= n)
        .groupBy("k")
        .count()
        .collect()
    )
    assert all(r["count"] <= n * salts for r in survivors)
    # and the operator with those parameters still matches naive
    got = sorted(
        map(
            tuple,
            t(
                skewed,
                ["k"],
                [F.col("score").desc(), F.col("id")],
                n,
                "id",
                salts=salts,
            ).collect(),
        )
    )
    assert got == sorted(map(tuple, _naive(skewed, n).collect()))


def test_quota_sample_deterministic_and_capped(skewed):
    q = quota_sample_per_key(skewed, ["k"], 4, id_col="id")
    rows = q.collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r.k, []).append(r.id)
    assert len(per_key["hot"]) == 4
    assert len(per_key["cold"]) == 4
    assert len(per_key["one"]) == 1
    # the draw is a function of ids only — stable across partitionings
    q2 = quota_sample_per_key(skewed.repartition(7), ["k"], 4, id_col="id")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, q2.collect()))


def test_rejects_bad_params(skewed):
    with pytest.raises(ValueError, match="n must"):
        top_n_per_key(skewed, ["k"], [F.col("id")], 0, "id")
    with pytest.raises(ValueError, match="salts"):
        top_n_per_key(skewed, ["k"], [F.col("id")], 1, "id", salts=0)
