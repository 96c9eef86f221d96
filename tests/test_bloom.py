"""Bloom-filter membership pre-filter (operators/bloom.py): the guaranteed
invariants (zero false negatives, lossless union, bounded FP rate), the
composed decontamination path's bit-identity with the join-only plan, and
the plan shape the 100 TB story depends on (the probe is scan-side codegen
arithmetic — no extra exchange, no Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators import bloom, decontam


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def built(spark):
    df = spark.range(0, 3000).select(
        F.concat(F.lit("member_"), F.col("id")).alias("s")
    )
    bits, k = bloom.optimal_geometry(3000, 0.01)
    return df, bloom.bloom_build(df, "s", num_bits=bits, num_hashes=k)


def test_zero_false_negatives(built):
    df, bf = built
    assert df.filter(~bf.might_contain(F.col("s"))).count() == 0


def test_false_positive_rate_bounded(spark, built):
    _, bf = built
    probe = spark.range(0, 10_000).select(
        F.concat(F.lit("absent_"), F.col("id")).alias("s")
    )
    fp = probe.filter(bf.might_contain(F.col("s"))).count()
    # sized for 1%; allow 3x slack for hash variance
    assert fp / 10_000 < 0.03


def test_optimal_geometry_saturation(built):
    # an optimally-sized filter is ~half full (that is the optimum)
    _, bf = built
    assert 0.35 < bf.saturation < 0.65


def test_union_is_lossless(spark, built):
    df, bf = built
    half_a = df.filter(F.xxhash64("s") % 2 == 0)
    half_b = df.filter(F.xxhash64("s") % 2 != 0)
    bfa = bloom.bloom_build(
        half_a, "s", num_bits=bf.num_bits, num_hashes=bf.num_hashes
    )
    bfb = bloom.bloom_build(
        half_b, "s", num_bits=bf.num_bits, num_hashes=bf.num_hashes
    )
    assert bfa.union(bfb).words == bf.words


def test_union_rejects_geometry_mismatch(built):
    _, bf = built
    other = bloom.BloomFilter(128, 2, tuple([0, 0]))
    with pytest.raises(ValueError, match="different geometry"):
        bf.union(other)


def test_nulls_skipped_in_build(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "s string"
    )
    bf = bloom.bloom_build(df, "s", num_bits=256, num_hashes=3)
    assert (
        df.filter(F.col("s").isNotNull())
        .filter(~bf.might_contain(F.col("s")))
        .count()
        == 0
    )


def test_probe_works_inside_array_lambda(spark, built):
    # the decontam composition filters an ARRAY through the bloom before
    # exploding — pin that the probe column expression is lambda-safe
    _, bf = built
    df = spark.createDataFrame(
        [(["member_1", "nope_x", "member_2"],)], "a array<string>"
    )
    row = df.select(
        F.filter("a", lambda g: bf.might_contain(g)).alias("kept")
    ).head()
    assert "member_1" in row["kept"] and "member_2" in row["kept"]
    assert "nope_x" not in row["kept"]


@pytest.fixture(scope="module")
def decontam_pair(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 41 != 3)
    bench = docs.filter(F.col("doc_id") % 41 == 3)
    plain = decontam.ngram_contamination(corpus, bench, n=5, threshold=0.5)
    bloomed = decontam.ngram_contamination(
        corpus, bench, n=5, threshold=0.5, bloom_fpp=0.01
    )
    return plain, bloomed


def test_bloom_decontam_bit_identical(decontam_pair):
    plain, bloomed = decontam_pair
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bloomed.collect())
    )


def test_bloom_decontam_plan_shape(decontam_pair):
    plain, bloomed = decontam_pair
    p_plain, p_bloom = _plan(plain), _plan(bloomed)
    # the pre-filter adds NO exchange and keeps everything JVM-side
    assert p_bloom.count("Exchange") == p_plain.count("Exchange")
    assert "Python" not in p_bloom
    # corpus side: posexplode with the NULL sentinel, probed by a plain
    # codegen Filter ABOVE the generate (same stage, pre-shuffle) — NOT a
    # higher-order filter(ngs, ...) lambda sharing a projection with
    # size(ngs), the shape measured ~14x slower at 10x scale
    assert "Generate posexplode" in p_bloom
    assert "isnull(ng" in p_bloom  # sentinel kept by the probe filter
    # the probe (its xxhash64 position hashes) must not be evaluated
    # inside the generator's input expression — only in the Filter above
    for line in p_bloom.splitlines():
        if "Generate posexplode" in line:
            assert "xxhash64" not in line
