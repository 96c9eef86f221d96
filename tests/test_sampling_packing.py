"""Unit tests for dataset partitioning (operators/sampling.py) and sequence
packing (operators/packing.py) — the properties the registry oracle can't
express: stability under corpus growth, weight handling, and the exactness
of the two-phase prefix sum against the naive global window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators import packing, sampling


def _ids(spark, n):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_split_deterministic_and_stable_under_growth(spark):
    """A document's split must not change when the corpus grows — the
    property randomSplit/sampleBy lack."""
    small = sampling.with_split(_ids(spark, 200))
    big = sampling.with_split(_ids(spark, 1000))
    small_map = {r.doc_id: r.split for r in small.collect()}
    big_map = {r.doc_id: r.split for r in big.collect()}
    assert all(big_map[k] == v for k, v in small_map.items())


def test_split_weights_roughly_hold(spark):
    rows = dict(
        (r["split"], r["count"])
        for r in sampling.with_split(_ids(spark, 5000))
        .groupBy("split")
        .count()
        .collect()
    )
    assert set(rows) == {"train", "val", "test"}
    assert 0.75 < rows["train"] / 5000 < 0.85
    assert 0.07 < rows["val"] / 5000 < 0.13
    assert 0.07 < rows["test"] / 5000 < 0.13


def test_split_rejects_bad_weights(spark):
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.with_split(_ids(spark, 10), weights={"a": 0.5, "b": 0.4})


def test_stratified_flag_exact_count_per_stratum(spark):
    df = _ids(spark, 300).withColumn(
        "lang", (F.col("doc_id") % 3).cast("string")
    )
    out = sampling.with_stratified_flag(df, "lang", 25)
    per = dict(
        (r["lang"], r["n"])
        for r in out.filter("sampled")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert per == {"0": 25, "1": 25, "2": 25}
    # deterministic: same flags on a re-run
    again = sampling.with_stratified_flag(df, "lang", 25)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_pack_documents_matches_naive_global_window(spark):
    """The two-phase prefix sum must equal the naive global-order window
    bit-for-bit (the naive form is the spec; the two-phase form is the
    scale path)."""
    df = (
        spark.range(999)
        .withColumnRenamed("id", "doc_id")
        .withColumn("n_tok", (F.col("doc_id") * 37 % 211 + 1).cast("long"))
    )
    packed = packing.pack_documents(
        df, "n_tok", budget=500, bucket_size=64
    ).select("doc_id", "pack_id")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = df.select(
        "doc_id",
        (
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / F.lit(500)
        )
        .cast("long")
        .alias("pack_id"),
    )
    assert sorted(map(tuple, packed.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_pack_documents_budget_bound(spark):
    """Each pack's payload ≤ budget + max single doc (the static-packing
    guarantee); consecutive pack ids with no gaps."""
    df = (
        spark.range(500)
        .withColumnRenamed("id", "doc_id")
        .withColumn("n_tok", (F.col("doc_id") % 97 + 1).cast("long"))
    )
    stats = packing.pack_stats(
        packing.pack_documents(df, "n_tok", budget=300, bucket_size=50),
        "n_tok",
    ).collect()
    max_doc = 97
    assert all(r.n_tokens <= 300 + max_doc for r in stats)
    ids = sorted(r.pack_id for r in stats)
    assert ids == list(range(len(ids)))


def test_pack_documents_oversized_doc_gets_own_packs(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 5000), (2, 10)], "doc_id long, n_tok long"
    )
    out = {
        r.doc_id: r.pack_id
        for r in packing.pack_documents(
            df, "n_tok", budget=100, bucket_size=2
        ).collect()
    }
    # doc 1 starts in pack 0 (cum_before=10), doc 2 starts after 5010 tokens
    assert out[0] == 0 and out[1] == 0 and out[2] == 50


def test_pack_documents_rejects_bad_budget(spark):
    with pytest.raises(ValueError, match="positive"):
        packing.pack_documents(_ids(spark, 5), "doc_id", budget=0)
